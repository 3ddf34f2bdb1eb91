"""Hybrid host/device routing parity.

On accelerator backends a device dispatch costs milliseconds; single
queries and tiny builds run on the host CPU instead (native SA-IS /
binary search) — matching the reference's nanosecond-scale latency on
its own microbenchmarks (tests/bench.rs:91-133). Both routes must be
bit-identical: same bounds, same unordered positions() slice semantics
(src/table.rs:223-259), same edge-case rejects (src/table.rs:228-235,
281-283).
"""

import numpy as np
import pytest

from suffix_tpu import SuffixTable
from suffix_tpu.table import AUTO_NATIVE_MAX
from suffix_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


QUERY_BATTERY = [
    "",  # empty query matches nothing (tests/tests.rs:100-126)
    "a",
    "an",
    "ana",
    "nana",
    "banana",
    "bananaz",  # longer than any suffix match
    "zzz",  # above every suffix
    "\x00",  # below every suffix
    "b" * 100,  # longer than the text
]


def _routes(text):
    host = SuffixTable.new(text, engine="native")
    host.query_route = "host"
    dev = SuffixTable.new(text)
    dev.query_route = "device"
    return host, dev


@pytest.mark.parametrize("text", ["banana", "", "a", "aa", "☃abc☃",
                                  "mississippi"])
def test_bounds_parity_small(text):
    host, dev = _routes(text)
    for q in QUERY_BATTERY:
        hs, hc = host._bounds_batch([q])
        ds, dc = dev._bounds_batch([q])
        assert int(hc[0]) == int(dc[0]), (text, q)
        if int(hc[0]):
            assert int(hs[0]) == int(ds[0]), (text, q)
        # Full surface parity on both routes.
        assert np.array_equal(sorted(host.positions(q).tolist()),
                              sorted(dev.positions(q).tolist()))
        assert host.contains(q) == dev.contains(q)
        assert host.count(q) == dev.count(q)


def test_positions_slice_semantics_host_route():
    # positions() is the UNORDERED table slice on both routes.
    host, dev = _routes("aaa")
    assert np.array_equal(host.positions("a"), dev.positions("a"))
    assert host.positions("a").tolist() == [2, 1, 0]


def test_bounds_parity_random(dna_10k):
    rng = np.random.default_rng(7)
    host, dev = _routes(dna_10k)
    data = np.frombuffer(dna_10k, np.uint8)
    queries = []
    for m in (1, 2, 7, 14, 19, 37, 64):  # spans merge/extended/probe tiers
        for _ in range(8):
            s = int(rng.integers(0, len(data) - m))
            queries.append(data[s : s + m].tobytes())
    queries += [b"NOTINTHERE", b"\xff\xff", b""]
    hs, hc = host._bounds_batch(queries)
    ds, dc = dev._bounds_batch(queries)
    assert np.array_equal(hc, np.asarray(dc)), "counts diverge"
    hit = np.asarray(hc) > 0
    assert np.array_equal(np.asarray(hs)[hit], np.asarray(ds)[hit])


def test_engine_auto_routes_and_matches(dna_10k):
    st_auto = SuffixTable.new(dna_10k, engine="auto")
    st_dev = SuffixTable.new(dna_10k, engine="device")
    assert np.array_equal(st_auto.table(), st_dev.table())
    assert len(dna_10k) <= AUTO_NATIVE_MAX  # small: took the native route


def test_query_route_auto_is_device_on_cpu_backend():
    # Tests pin the CPU backend (conftest), where dispatch is cheap:
    # "auto" must keep the device path so the JAX engines stay covered.
    st = SuffixTable.new("banana")
    assert st.query_route == "auto"
    assert not st._route_host(1)


def test_explicit_host_route_requires_no_device_state():
    st = SuffixTable.new("banana", engine="native")
    st.query_route = "host"
    assert st.contains("nan")
    assert st._dev_text is None  # never touched a device
