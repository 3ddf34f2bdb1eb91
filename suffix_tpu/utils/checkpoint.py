"""Index checkpoint / resume.

The reference's only (de)serialization hook is ``from_parts`` /
``into_parts`` (src/table.rs:102-127) — the user persists the parts
themselves. Here checkpointing is first-class: an index (text, table, and
optional LCP / multi-doc offsets) round-trips through one ``.npz`` file and
resumes without rebuilding, the direct analogue of the reference's
round-trip test (tests/tests.rs:170-179) at corpus scale.
"""

from __future__ import annotations

import numpy as np

FORMAT_VERSION = 1


def save_index(path: str, st, *, lcp: np.ndarray | None = None,
               doc_starts: np.ndarray | None = None,
               build_stats: dict | None = None) -> None:
    payload = {
        "format_version": np.int64(FORMAT_VERSION),
        "text": np.frombuffer(st.text_bytes(), dtype=np.uint8),
        "table": st.table(),
        "was_str": np.bool_(isinstance(st.text(), str)),
    }
    if lcp is not None:
        payload["lcp"] = np.asarray(lcp, dtype=np.uint32)
    if doc_starts is not None:
        payload["doc_starts"] = np.asarray(doc_starts, dtype=np.int64)
    if build_stats is not None:
        # Stored as one JSON line (utils/metrics.py schema) so `info`
        # can replay how a deployed index was built.
        from suffix_tpu.utils.metrics import stats_json

        payload["build_stats"] = np.frombuffer(
            stats_json(build_stats).encode("utf-8"), dtype=np.uint8)
    # Atomic: never leave a half-written index (np.savez appends .npz to
    # bare names, so the temp name keeps the suffix).
    import os

    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)


def load_index(path: str):
    from suffix_tpu.table import SuffixTable

    with np.load(path) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"index format {version} is newer than supported "
                             f"({FORMAT_VERSION})")
        text = z["text"].tobytes()
        table = z["table"]
        was_str = bool(z["was_str"])
        stats = (z["build_stats"].tobytes().decode("utf-8")
                 if "build_stats" in z else None)
    st = SuffixTable(text, table, _was_str=was_str)
    if stats is not None:
        import json

        st.build_stats = json.loads(stats)
    return st
