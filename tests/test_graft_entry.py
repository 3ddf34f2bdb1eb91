"""Driver entry points (__graft_entry__): the multi-chip dryrun's
no-native LCP fallback must actually execute (it was dead-on-arrival in
round 3: an import of a function that didn't exist)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))


def test_dryrun_lcp_fallback_without_native(monkeypatch):
    import __graft_entry__ as ge
    from suffix_tpu import native

    monkeypatch.setattr(native, "available", lambda: False)
    # Small corpus + few repetition tiles: exercises every dryrun surface
    # (sharded build, stepped build, queries, LCP via the kasai_host
    # fallback) in seconds on the virtual CPU mesh.
    ge.dryrun_multichip(2, n_bytes=3072, rep_tiles=64)
