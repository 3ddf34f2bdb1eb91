"""Serving runtime: protocol correctness and request coalescing.

The JSONL protocol must answer with exactly the library's semantics
(positions = unordered SA slice, empty query matches nothing), and the
Batcher must merge concurrent submissions into shared dispatches without
mixing up per-request results.
"""

import base64
import json
import socket
import subprocess
import sys
import threading

import numpy as np
import pytest

from suffix_tpu import SuffixTable
from suffix_tpu.serve import Batcher, handle_request, serve_tcp


@pytest.fixture(scope="module")
def table():
    return SuffixTable.new(b"the quick brown fox was quick." * 20)


def test_handle_request_ops(table):
    r = handle_request(table, None, {"id": 7, "op": "count", "q": "quick"})
    assert r == {"id": 7, "result": 40}
    r = handle_request(table, None, {"op": "contains", "q": ["fox", "cat"]})
    assert r["result"] == [True, False]
    r = handle_request(table, None, {"op": "positions", "q": "zebra"})
    assert r["result"] == []
    r = handle_request(table, None, {"op": "positions", "q": "fox"})
    assert sorted(r["result"]) == [i for i in range(len(table.text_bytes()))
                                   if table.text_bytes()[i:i + 3] == b"fox"]
    r = handle_request(table, None, {"op": "any_position", "q": ["quick", ""]})
    hit, miss = r["result"]
    assert table.text_bytes()[hit:hit + 5] == b"quick"
    assert miss is None  # empty query matches nothing
    r = handle_request(table, None,
                       {"op": "count",
                        "q_b64": base64.b64encode(b"quick.").decode()})
    assert r["result"] == 20
    r = handle_request(table, None, {"op": "ping"})
    assert r["result"] == "pong"
    r = handle_request(table, None, {"op": "nope", "q": "x"})
    assert "unknown op" in r["error"]
    r = handle_request(table, None, {"op": "count"})
    assert "error" in r


def test_batcher_coalesces_and_demuxes(table):
    b = Batcher(table, max_batch=512, max_wait_ms=20.0)
    results = {}

    def client(i, queries):
        starts, counts = b.submit(queries)
        results[i] = (list(starts), list(counts))

    expect = {}
    threads = []
    for i in range(16):
        qs = [f"q{i}", "quick", "fox"][i % 2:]
        s, c = table._bounds_batch(qs)
        expect[i] = (list(s), list(c))
        threads.append(threading.Thread(target=client, args=(i, qs)))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    b.close()
    for i in expect:
        assert results[i][1] == expect[i][1], i
        # starts may differ only for zero-count queries
        for s_got, s_want, cnt in zip(results[i][0], expect[i][0],
                                      expect[i][1]):
            if cnt:
                assert s_got == s_want


def test_rejects_non_string_queries(table):
    r = handle_request(table, None, {"op": "count", "q": 3})
    assert "must be strings" in r["error"]
    r = handle_request(table, None, {"op": "count", "q": ["ok", 5]})
    assert "must be strings" in r["error"]
    r = handle_request(table, None, {"op": "count", "q_b64": [7]})
    assert "error" in r


def test_concurrent_single_queries_host_route(table):
    # The shared BoundsHandle must not cross results between threads.
    from suffix_tpu import native

    if not native.available():
        pytest.skip("native unavailable")
    st = SuffixTable.new(table.text_bytes(), engine="native")
    st.query_route = "host"
    queries = ["quick", "fox", "brown", "zebra", "the", "was quick."]
    expect = {q: st.count(q) for q in queries}
    errors = []

    def worker(q):
        for _ in range(300):
            if st.count(q) != expect[q]:
                errors.append(q)
                return

    threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors


def test_batcher_empty_submit(table):
    b = Batcher(table)
    s, c = b.submit([])
    assert len(s) == 0 and len(c) == 0
    b.close()


def test_tcp_server_explicit_port(table):
    # Pick a free port, then serve on it.
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    ready = threading.Event()
    b = Batcher(table, max_wait_ms=1.0)
    t = threading.Thread(
        target=serve_tcp, args=(table, port),
        kwargs={"batcher": b, "ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(timeout=10)
    with socket.create_connection(("127.0.0.1", port), timeout=10) as conn:
        f = conn.makefile("rw", encoding="utf-8")
        f.write(json.dumps({"id": 1, "op": "count", "q": "quick"}) + "\n")
        f.write(json.dumps({"id": 2, "op": "positions", "q": ["fox"]}) + "\n")
        f.write(json.dumps({"id": 3, "op": "quit"}) + "\n")
        f.flush()
        r1 = json.loads(f.readline())
        r2 = json.loads(f.readline())
        r3 = json.loads(f.readline())
    assert r1 == {"id": 1, "result": 40}
    assert r2["id"] == 2 and len(r2["result"][0]) == 20
    assert r3["result"] == "bye"
    b.close()


def test_stdio_server_subprocess(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_bytes(b"banana band bandana")
    reqs = "\n".join([
        json.dumps({"id": 1, "op": "count", "q": "ban"}),
        json.dumps({"id": 2, "op": "positions", "q": "ana"}),
        json.dumps({"id": 3, "op": "contains", "q": ["nd", "zz", ""]}),
        "not json",
        json.dumps({"id": 4, "op": "quit"}),
    ]) + "\n"
    proc = subprocess.run(
        [sys.executable, "-m", "suffix_tpu", "--platform", "cpu",
         "serve", "--file", str(corpus)],
        input=reqs, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert lines[0] == {"id": 1, "result": 3}
    assert sorted(lines[1]["result"]) == [1, 3, 16]
    assert lines[2]["result"] == [True, False, False]
    assert "bad json" in lines[3]["error"]
    assert lines[4]["result"] == "bye"
