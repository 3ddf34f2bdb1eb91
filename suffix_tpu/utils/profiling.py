"""Per-pass profiling and metrics.

The reference has no instrumentation (its own TODO:29-32 asks for
profiling). Here every construction/query phase can be timed with proper
device synchronization (`block_until_ready`), and an optional
`jax.profiler` trace can wrap a region for xprof inspection.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class PassMetrics:
    name: str
    seconds: float
    bytes_processed: int = 0

    @property
    def mb_per_s(self) -> float:
        return self.bytes_processed / max(self.seconds, 1e-12) / 1e6


@dataclass
class Profile:
    """Accumulates named pass timings; printable as a structured report."""

    passes: list[PassMetrics] = field(default_factory=list)

    @contextlib.contextmanager
    def span(self, name: str, bytes_processed: int = 0, sync=None):
        """Time a region; ``sync`` is an array (or pytree) to block on."""
        import jax

        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.passes.append(
            PassMetrics(name, time.perf_counter() - t0, bytes_processed)
        )

    def record(self, name: str, seconds: float, bytes_processed: int = 0):
        self.passes.append(PassMetrics(name, seconds, bytes_processed))

    def total_seconds(self) -> float:
        return sum(p.seconds for p in self.passes)

    def report(self) -> str:
        lines = [f"{'pass':<28} {'seconds':>10} {'MB/s':>10}"]
        for p in self.passes:
            rate = f"{p.mb_per_s:10.1f}" if p.bytes_processed else " " * 10
            lines.append(f"{p.name:<28} {p.seconds:>10.4f} {rate}")
        lines.append(f"{'TOTAL':<28} {self.total_seconds():>10.4f}")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps(
            [
                {"pass": p.name, "seconds": p.seconds, "bytes": p.bytes_processed}
                for p in self.passes
            ]
        )


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Wrap a region in a jax.profiler trace for xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_build(data: bytes):
    """Build an index with per-phase metrics; returns (SuffixTable, Profile)."""
    from suffix_tpu.table import SuffixTable

    prof = Profile()
    with prof.span("suffix_array.build", bytes_processed=len(data)):
        st = SuffixTable.new(data)
    with prof.span("device_upload"):
        st._ensure_device()
    return st, prof
