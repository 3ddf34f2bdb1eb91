# Development targets (CPU-forced paths are safe on shared-TPU machines).

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

examples:
	@for ex in examples/*.py; do \
		echo "== $$ex"; JAX_PLATFORMS=cpu python $$ex || exit 1; \
	done

dryrun:
	python __graft_entry__.py 8

native:
	g++ -O3 -march=native -std=c++17 -shared -fPIC \
		suffix_tpu/native/csrc/saistpu.cpp -o suffix_tpu/native/csrc/libsaistpu.so
	python -c "from suffix_tpu import native; assert native._load_fastpath()"


.PHONY: test test-fast bench examples dryrun native
