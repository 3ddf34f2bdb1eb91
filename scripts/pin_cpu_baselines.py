"""Pin the per-class single-core CPU SA-IS baselines into ONE table.

Round 3 quoted different repeated-class CPU numbers in different
documents (ROADMAP 14.2 MB/s vs BENCH_r03 9.19 — a 40% swing in the
headline ratio). This script measures medians on an OTHERWISE IDLE box
and writes CPU_BASELINE.json at the repo root; bench.py, README and
ROADMAP quote THIS file. Re-run only on an idle machine:

    python scripts/pin_cpu_baselines.py
"""

from __future__ import annotations

import json
import pathlib
import platform
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))


def median_mbps(data: bytes, iters: int) -> tuple[float, list[float]]:
    from suffix_tpu import native

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        native.sais(data)
        times.append(time.perf_counter() - t0)
    return len(data) / float(np.median(times)) / 1e6, [
        round(len(data) / t / 1e6, 2) for t in times]


def main():
    from suffix_tpu import native
    from suffix_tpu.utils.textgen import text_corpus, corpus_stats

    native.sais(b"warm" * 64)
    fixture = (ROOT / "tests" / "fixtures"
               / "AP009048_100000.fasta").read_bytes()
    rng = np.random.default_rng(0xD4A)
    classes = {}

    dna4 = bytes(rng.integers(0, 4, size=1 << 22, dtype=np.uint8) + 97)
    classes["sais_4MiB_dna"] = median_mbps(dna4, 7)
    classes["sais_4MiB_repeated"] = median_mbps((fixture * 45)[:1 << 22], 7)
    classes["sais_100KB_fixture"] = median_mbps(fixture, 15)
    # The bench's near-repeated fixture verbatim (bench.py): 16 point
    # mutations over the tiled fixture, rng seed 1.
    mut = np.frombuffer((fixture * 45)[:1 << 22], np.uint8).copy()
    mut[np.random.default_rng(1).integers(0, 1 << 22, 16)] ^= 1
    classes["sais_4MiB_near_repeated"] = median_mbps(mut.tobytes(), 7)
    dna64 = bytes(rng.integers(0, 4, size=1 << 26, dtype=np.uint8) + 97)
    classes["sais_64MiB_dna"] = median_mbps(dna64, 3)
    text128 = text_corpus(1 << 27)
    stats = corpus_stats(text128)
    classes["sais_128MiB_text"] = median_mbps(text128.tobytes(), 3)
    classes["kasai_128MiB_text"] = None  # filled below

    sa = native.sais(text128.tobytes())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        native.kasai(text128.tobytes(), sa)
        times.append(time.perf_counter() - t0)
    classes["kasai_128MiB_text"] = (
        text128.size / float(np.median(times)) / 1e6,
        [round(text128.size / t / 1e6, 2) for t in times])

    out = {
        "methodology": "median of N runs of the native C++ SA-IS "
                       "(suffix_tpu/native, -O3 -march=native, one core) "
                       "on an idle box; all docs and bench ratios quote "
                       "these numbers",
        "host": platform.processor() or platform.machine(),
        "text_corpus_stats": stats,
        "classes": {
            k: {"median_MBps": round(v[0], 2), "runs_MBps": v[1]}
            for k, v in classes.items()
        },
    }
    (ROOT / "CPU_BASELINE.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
