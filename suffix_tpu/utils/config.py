"""Framework configuration.

The reference's only "config" is a docopt usage string with a dead flag
(stree_cmd/src/main.rs:15-27). Here configuration is a small dataclass
consumed by the builders and the CLI — mesh shape, padding policy, query
batching, engine selection — no flag framework.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BuildConfig:
    """Construction-time knobs."""

    engine: str = "device"          # device | sais | native
    n_devices: int | None = None    # None = all visible devices (sharded path)
    sharded: bool = False           # use the mesh-sharded builder
    checkpoint_path: str | None = None
    resume: bool = False
    min_pad: int = 16               # smallest padded buffer


@dataclasses.dataclass(frozen=True)
class QueryConfig:
    """Query-engine knobs."""

    engine: str = "merge"           # merge | probe
    max_batch: int = 1 << 16        # queries per device dispatch
    pad_query_to: int = 8           # minimum padded query width


DEFAULT_BUILD = BuildConfig()
DEFAULT_QUERY = QueryConfig()


def build_index(text, config: BuildConfig = DEFAULT_BUILD):
    """Config-driven index construction (single entry point)."""
    from suffix_tpu.table import SuffixTable

    if config.sharded:
        from suffix_tpu.parallel.dist_build import (
            suffix_array_sharded,
            suffix_array_sharded_stepped,
        )
        from suffix_tpu.parallel.mesh import make_mesh
        from suffix_tpu.table import _as_bytes

        raw, was_str = _as_bytes(text)
        mesh = make_mesh(config.n_devices)
        if config.checkpoint_path:
            table = suffix_array_sharded_stepped(
                raw, mesh, checkpoint_path=config.checkpoint_path,
                resume=config.resume,
            )
        else:
            table = suffix_array_sharded(raw, mesh)
        return SuffixTable(raw, table, _was_str=was_str)
    return SuffixTable.new(text, engine=config.engine)
