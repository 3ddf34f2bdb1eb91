"""Array-native suffix tree — the TPU-first derivation of L3.

The pointer-object fold (tree/stree.py, mirroring the reference's
suffix_tree/src/lib.rs:392-505) walks ranks one at a time on the host,
which caps the tree at toy sizes. This module derives the SAME tree as
flat arrays in one jitted device program over (text, SA, LCP):

- Internal nodes are exactly the lcp-intervals of the LCP array: for
  every rank i with d = lcp[i] >= 1, the maximal interval [l, r] with
  ``lcp[l] < d``, ``min(lcp[l+1..r]) >= d``, ``lcp[r+1] < d`` is a node
  of path depth d. PSV/NSV (previous/next smaller value) give (l, r)
  per position by binary lifting over a sparse range-min table
  (log n vectorized rounds — no sequential stack); one 3-key sort
  dedups (l, d) pairs into node ids.
- The parent of node (l, d, r) is the interval of position
  p = argmax(lcp[l], lcp[r+1]) (the standard enhanced-suffix-array
  parent rule); leaves attach at depth max(lcp[i], lcp[i+1]).
- A suffix whose length equals its attachment depth terminates INSIDE
  that node (the reference fold's semantics for prefix suffixes —
  nodes carry terminal lists, see suffix_tree/src/lib.rs:421-441);
  every other rank is a leaf child.
- Label offsets reproduce the fold's byte-for-byte, including WHICH
  occurrence each internal label slices (the fold re-labels a node
  when a later rank splits its in-edge: offsets come from table[r]
  when the parent boundary is on the right, from table[rep-1]
  otherwise, rep = first position of the interval's lcp value).

The Node API stays available as a lazy view (ANode) over the arrays —
children dicts materialize per node on demand — so the dot renderer
(tree/dot.py) and every iterator family work unchanged. Structural and
dot-output equality with the host fold is pinned by tests/test_atree.py.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import numpy as np

from suffix_tpu.table import SuffixTable, _as_bytes


@functools.lru_cache(maxsize=None)
def _jnp():
    import jax  # deferred: host-only users never pay the import

    return jax, jax.numpy


def _tree_arrays_jit():
    jax, jnp = _jnp()

    @functools.partial(jax.jit, static_argnames=())
    def tree_arrays(t_pad, sa_pad, lcp_pad, n):
        """All tree arrays from (padded text, SA, LCP) in one program.

        lcp_pad carries -1 beyond rank n-1 so smaller-value searches
        stop at the text boundary. Returns per-position interval data,
        deduped node arrays and per-rank leaf/terminal data; padded
        slots carry sentinel ids (-2).
        """
        n_pad = lcp_pad.shape[0]
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        K = max(1, int(n_pad - 1).bit_length())

        # Sparse range-min table: mins[k][i] = min lcp over [i, i+2^k).
        mins = [lcp_pad]
        for k in range(1, K + 1):
            half = 1 << (k - 1)
            shifted = jnp.concatenate(
                [mins[-1][half:],
                 jnp.full((half,), jnp.int32(0x7FFFFFFF), jnp.int32)])
            mins.append(jnp.minimum(mins[-1], shifted))

        d = lcp_pad

        def rmin(k, pos):
            return jnp.take(mins[k], jnp.clip(pos, 0, n_pad - 1),
                            mode="clip")

        # NSV(i): first j > i with lcp[j] < lcp[i] (lcp pad = -1 bounds
        # the search at n). Binary lifting, all positions in lockstep.
        pos = idx + 1
        for k in range(K, -1, -1):
            step = 1 << k
            can = (pos + step <= n_pad) & (rmin(k, pos) >= d)
            pos = jnp.where(can, pos + step, pos)
        nsv = jnp.minimum(pos, n)

        # PSV(i): last j < i with lcp[j] < lcp[i] (lcp[0] = 0 bounds it).
        pos = idx
        for k in range(K, -1, -1):
            step = 1 << k
            can = (pos - step >= 0) & (rmin(k, pos - step) >= d)
            pos = jnp.where(can, pos - step, pos)
        psv = jnp.maximum(pos - 1, 0)

        # Interval keys per position (ranks 1..n-1 with depth >= 1).
        has_node = (idx >= 1) & (idx < n) & (d >= 1)
        l_key = jnp.where(has_node, psv, jnp.int32(n_pad))
        d_key = jnp.where(has_node, d, jnp.int32(n_pad))
        s_l, s_d, s_i = jax.lax.sort((l_key, d_key, idx), num_keys=3,
                                     is_stable=False)
        prev_l = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_l[:-1]])
        prev_d = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_d[:-1]])
        valid_row = s_l < n_pad
        first = valid_row & ((s_l != prev_l) | (s_d != prev_d))
        gid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
        m = jnp.sum(first.astype(jnp.int32))
        # Per-position node id, scattered back through the sort payload.
        pos2node = jnp.full((n_pad,), -2, jnp.int32).at[s_i].set(
            jnp.where(valid_row, gid_sorted, -2), mode="drop")
        # Deduped node arrays in (l, d) order: rep = first i of group
        # (3-key sort => minimal i lands on the `first` row). Non-first
        # rows scatter out of bounds and drop.
        node_slot = jnp.where(first, gid_sorted, jnp.int32(n_pad))

        def dedup(vals, fill=-2):
            out = jnp.full((n_pad,), fill, jnp.int32)
            return out.at[node_slot].set(vals, mode="drop")

        node_l = dedup(s_l)
        node_d = dedup(s_d)
        node_rep = dedup(s_i)
        node_valid = jnp.arange(n_pad, dtype=jnp.int32) < m
        node_r = jnp.where(
            node_valid,
            jnp.take(nsv, jnp.clip(node_rep, 0, n_pad - 1), mode="clip") - 1,
            -2)

        # Parent rule: d' = max(lcp[l], lcp[r+1]); parent = interval of
        # the boundary position attaining it (root when d' == 0).
        lcp_at = lambda p: jnp.take(lcp_pad, jnp.clip(p, 0, n_pad - 1),
                                    mode="clip")
        pl = jnp.where(node_valid, lcp_at(node_l), 0)
        r1 = jnp.clip(node_r + 1, 0, n_pad - 1)
        pr = jnp.where(node_valid & (node_r + 1 <= n - 1), lcp_at(r1), 0)
        dp = jnp.maximum(pl, pr)
        p_pos = jnp.where(pl >= pr, node_l, node_r + 1)
        node_parent = jnp.where(
            node_valid & (dp >= 1),
            jnp.take(pos2node, jnp.clip(p_pos, 0, n_pad - 1), mode="clip"),
            jnp.where(node_valid, -1, -2))

        # Fold-exact label offsets: occurrence = table[r] if the parent
        # boundary is on the right (a later rank re-split the in-edge),
        # else table[rep-1] (creation-time offsets).
        tbl = lambda p: jnp.take(sa_pad, jnp.clip(p, 0, n_pad - 1),
                                 mode="clip")
        occ = jnp.where(pr > pl, tbl(node_r), tbl(node_rep - 1))
        node_start = jnp.where(node_valid, occ + dp, 0)
        node_end = jnp.where(node_valid, occ + node_d, 0)

        # Per-rank attachment: depth max(lcp[i], lcp[i+1]).
        lcp_next = jnp.concatenate(
            [lcp_pad[1:], jnp.full((1,), -1, jnp.int32)])
        lcp_next = jnp.where(idx + 1 <= n - 1, lcp_next, 0)
        lcp_cur = jnp.where((idx >= 1) & (idx < n), lcp_pad, 0)
        rank_valid = idx < n
        d_leaf = jnp.maximum(lcp_cur, lcp_next)
        p_leaf = jnp.where(lcp_cur >= lcp_next, idx, idx + 1)
        leaf_parent = jnp.where(
            rank_valid & (d_leaf >= 1),
            jnp.take(pos2node, jnp.clip(p_leaf, 0, n_pad - 1), mode="clip"),
            jnp.where(rank_valid, -1, -2))
        suf_len = jnp.where(rank_valid, n - sa_pad, 0)
        is_term = rank_valid & (suf_len == d_leaf)
        leaf_start = jnp.where(rank_valid, sa_pad + d_leaf, 0)
        # Terminal suffix per node (at most one: equal-length suffixes
        # in one interval would be equal strings).
        term_slot = jnp.where(is_term & (leaf_parent >= 0), leaf_parent,
                              jnp.int32(n_pad))
        node_term = jnp.full((n_pad,), -1, jnp.int32).at[term_slot].set(
            jnp.where(is_term & (leaf_parent >= 0), sa_pad, -1),
            mode="drop")
        node_term = jnp.where(node_valid, node_term, -2)

        return dict(m=m, node_l=node_l, node_d=node_d, node_r=node_r,
                    node_rep=node_rep, node_parent=node_parent,
                    node_start=node_start, node_end=node_end,
                    node_term=node_term, leaf_parent=leaf_parent,
                    leaf_start=leaf_start, is_term=is_term)

    return tree_arrays


class ANode:
    """Lazy Node-compatible view over the tree arrays.

    Duck-types the pointer Node (tree/stree.py): parent, children (a
    real dict, materialized per node on demand and cached), suffixes,
    start/end, path_len, plus the 5 iterator families.
    """

    __slots__ = ("_t", "kind", "id", "_children")

    def __init__(self, tree: "ArraySuffixTree", kind: str, id: int):
        self._t = tree
        self.kind = kind  # "root" | "node" | "leaf"
        self.id = id
        self._children = None

    # -- identity ----------------------------------------------------------

    def __eq__(self, other):
        return (isinstance(other, ANode) and self._t is other._t
                and self.kind == other.kind and self.id == other.id)

    def __hash__(self):
        return hash((id(self._t), self.kind, self.id))

    # -- attributes mirrored from Node -------------------------------------

    @property
    def parent(self) -> Optional["ANode"]:
        t = self._t
        if self.kind == "root":
            return None
        pid = (int(t.node_parent[self.id]) if self.kind == "node"
               else int(t.leaf_parent[self.id]))
        return t._node(pid)

    @property
    def suffixes(self) -> list[int]:
        t = self._t
        if self.kind == "root":
            return [t.n]
        if self.kind == "node":
            term = int(t.node_term[self.id])
            return [term] if term >= 0 else []
        return [int(t.sa[self.id])]

    @property
    def start(self) -> int:
        t = self._t
        if self.kind == "root":
            return 0
        if self.kind == "node":
            return int(t.node_start[self.id])
        return int(t.leaf_start[self.id])

    @property
    def end(self) -> int:
        t = self._t
        if self.kind == "root":
            return 0
        if self.kind == "node":
            return int(t.node_end[self.id])
        return t.n

    @property
    def path_len(self) -> int:
        t = self._t
        if self.kind == "root":
            return 0
        if self.kind == "node":
            return int(t.node_d[self.id])
        return t.n - int(t.sa[self.id])

    @property
    def children(self) -> dict[int, "ANode"]:
        if self._children is None:
            self._children = self._t._children_of(self)
        return self._children

    # -- structure ---------------------------------------------------------

    def __len__(self) -> int:
        return self.end - self.start

    def is_root(self) -> bool:
        return self.kind == "root"

    def has_terminals(self) -> bool:
        return bool(self.suffixes)

    def depth(self) -> int:
        return sum(1 for _ in self.ancestors()) - 1

    # -- iterators ----------------------------------------------------------

    def child_nodes(self) -> Iterator["ANode"]:
        for k in sorted(self.children):
            yield self.children[k]

    def ancestors(self) -> Iterator["ANode"]:
        cur: Optional[ANode] = self
        while cur is not None:
            yield cur
            cur = cur.parent

    def preorder(self) -> Iterator["ANode"]:
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(list(node.child_nodes())))

    def leaves(self) -> Iterator["ANode"]:
        for nd in self.preorder():
            if len(nd) > 0 and nd.has_terminals():
                yield nd

    def suffix_indices(self) -> Iterator[int]:
        for leaf in self.leaves():
            yield from leaf.suffixes


class ArraySuffixTree:
    """Suffix tree held as flat arrays, built on device (see module doc).

    Exposes the same surface as tree/stree.py's SuffixTree: ``root()``,
    ``label(node)``, ``key(node)``, ``text()``, ``text_bytes()``,
    ``repr`` — so dot rendering and the iterator battery run unchanged.
    """

    def __init__(self, raw: bytes, was_str: bool, sa: np.ndarray,
                 arrays: dict):
        self._raw = raw
        self._was_str = was_str
        self.n = len(raw)
        self.sa = sa
        m = int(arrays["m"])
        self.m = m
        for name in ("node_l", "node_d", "node_r", "node_parent",
                     "node_start", "node_end", "node_term"):
            setattr(self, name, np.asarray(arrays[name], np.int32)[:m])
        self.leaf_parent = np.asarray(arrays["leaf_parent"],
                                      np.int32)[: self.n]
        self.leaf_start = np.asarray(arrays["leaf_start"],
                                     np.int32)[: self.n]
        self.is_term = np.asarray(arrays["is_term"], bool)[: self.n]
        self._root = ANode(self, "root", -1)
        self._edges = None  # lazy: (sorted keys, child kind/id arrays)

    # -- construction -------------------------------------------------------

    @classmethod
    def new(cls, text) -> "ArraySuffixTree":
        return cls.from_suffix_table(SuffixTable.new(text, engine="auto"))

    @classmethod
    def from_suffix_table(cls, st: SuffixTable) -> "ArraySuffixTree":
        jax, jnp = _jnp()
        from suffix_tpu.ops.padding import PAD, bucket_size

        raw = st.text_bytes()
        n = len(st)
        was_str = isinstance(st.text(), str)
        sa = st.table()
        if n == 0:
            return cls(raw, was_str, sa, dict(
                m=0, node_l=[], node_d=[], node_r=[], node_parent=[],
                node_start=[], node_end=[], node_term=[], node_rep=[],
                leaf_parent=[], leaf_start=[], is_term=[]))
        lcp = getattr(st, "_lcp_override", None)
        if lcp is None:
            lcp = st.lcp_lens()
        n_pad = bucket_size(n)
        t_pad = np.full((n_pad,), PAD, np.int32)
        t_pad[:n] = np.frombuffer(raw, np.uint8)
        sa_pad = np.zeros((n_pad,), np.int32)
        sa_pad[:n] = sa
        lcp_pad = np.full((n_pad,), -1, np.int32)
        lcp_pad[:n] = lcp
        arrays = _tree_arrays_jit()(jnp.asarray(t_pad), jnp.asarray(sa_pad),
                                    jnp.asarray(lcp_pad), jnp.int32(n))
        return cls(raw, was_str, sa, arrays)

    # -- SuffixTree surface --------------------------------------------------

    def text(self):
        return self._raw.decode("utf-8") if self._was_str else self._raw

    def text_bytes(self) -> bytes:
        return self._raw

    def root(self) -> ANode:
        return self._root

    def label(self, node: ANode) -> bytes:
        return self._raw[node.start : node.end]

    def key(self, node: ANode) -> int:
        return self.label(node)[0]

    def __repr__(self) -> str:
        lines = ["", "-----------------------------------------",
                 "SUFFIX TREE"]
        try:
            lines.append(f"text: {self.text()}")
        except UnicodeDecodeError:
            lines.append(f"text: {self._raw!r}")

        def walk(node: ANode, depth: int):
            if node.is_root():
                lines.append("ROOT")
            else:
                lines.append("  " * depth + repr(self.label(node)))
            for child in node.child_nodes():
                walk(child, depth + 1)

        walk(self._root, 0)
        lines.append("-----------------------------------------")
        return "\n".join(lines) + "\n"

    # -- edge index ----------------------------------------------------------

    def _ensure_edges(self):
        if self._edges is not None:
            return self._edges
        text = np.frombuffer(self._raw, np.uint8)
        # Internal-node edges: parent (-1 = root) -> node.
        pn = self.node_parent
        leaf_mask = (~self.is_term.astype(bool))
        lp = self.leaf_parent[leaf_mask]
        leaf_ids = np.flatnonzero(leaf_mask).astype(np.int32)
        e_parent = np.concatenate([pn, lp]).astype(np.int64)
        e_byte = np.concatenate([
            text[np.minimum(self.node_start, max(self.n - 1, 0))],
            text[np.minimum(self.leaf_start[leaf_mask],
                            max(self.n - 1, 0))],
        ]).astype(np.int64)
        e_kind = np.concatenate([
            np.zeros(self.m, np.int8), np.ones(leaf_ids.size, np.int8)])
        e_child = np.concatenate([
            np.arange(self.m, dtype=np.int32), leaf_ids])
        order = np.argsort(e_parent * 256 + e_byte, kind="stable")
        self._edges = (e_parent[order], e_byte[order], e_kind[order],
                       e_child[order])
        return self._edges

    def _children_of(self, node: ANode) -> dict[int, ANode]:
        e_parent, e_byte, e_kind, e_child = self._ensure_edges()
        pid = -1 if node.kind == "root" else node.id
        if node.kind == "leaf":
            return {}
        lo = np.searchsorted(e_parent, pid, side="left")
        hi = np.searchsorted(e_parent, pid, side="right")
        out: dict[int, ANode] = {}
        for j in range(lo, hi):
            kind = "leaf" if e_kind[j] else "node"
            out[int(e_byte[j])] = ANode(self, kind, int(e_child[j]))
        return out

    def _node(self, pid: int) -> ANode:
        return self._root if pid < 0 else ANode(self, "node", pid)
