"""Array-first routing topology: the device-consumable network form.

The reference walks dict-of-lists graphs reach-by-reach at run time
(``nhd_network.py`` + ``mc_reach.pyx``).  Here the network is preprocessed
once (host-side NumPy) into columnar arrays:

* per-node padded upstream index lists — the junction/within-reach
  upstream flow gather becomes K masked vector gathers;
* a *wavefront level* per node (longest path from a headwater, in node
  hops) — the level schedule that replaces the reference's recursive reach
  traversal: all nodes at level L are independent given levels < L, so the
  strict (``assume_short_ts=False``) mode runs one fused vector step per
  level, and the production short-timestep mode runs one step per timestep
  over all nodes at once.

Node = MC segment or collapsed waterbody (see ``graph.replace_waterbodies``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Mapping, Sequence

import numpy as np

TERMINAL = -1
NODE_MC = 0
NODE_RESERVOIR = 1


@dataclass(frozen=True)
class RoutingTopology:
    """Immutable columnar network topology.

    All index arrays refer to row positions (0..N-1); ``ids`` maps rows
    back to external feature ids.  Rows may be in any order — the level
    schedule, not row order, encodes the topology.
    """

    ids: np.ndarray          # int64 [N] external node ids (unique)
    downstream: np.ndarray   # int32 [N] row index of downstream node, -1 if terminal
    upstream: np.ndarray     # int32 [N, K] row indices of upstream nodes, -1 pad
    level: np.ndarray        # int32 [N] wavefront level (0 = headwater)
    node_type: np.ndarray    # int8  [N] NODE_MC | NODE_RESERVOIR

    @property
    def n_nodes(self) -> int:
        return int(self.ids.shape[0])

    @property
    def max_upstreams(self) -> int:
        return int(self.upstream.shape[1])

    @property
    def n_levels(self) -> int:
        return int(self.level.max()) + 1 if self.n_nodes else 0

    @cached_property
    def n_upstream(self) -> np.ndarray:
        return (self.upstream >= 0).sum(axis=1).astype(np.int32)

    @cached_property
    def index_of(self) -> dict:
        return {int(i): k for k, i in enumerate(self.ids)}

    @cached_property
    def level_nodes(self) -> np.ndarray:
        """[n_levels, max_width] row indices grouped by level, -1 padded.

        Only materialized for the strict within-timestep mode; width is the
        widest wavefront, so this is practical for event/regional domains
        (the production short-timestep mode never builds it).
        """
        order = np.argsort(self.level, kind="stable")
        counts = np.bincount(self.level, minlength=self.n_levels)
        width = int(counts.max()) if counts.size else 0
        out = np.full((self.n_levels, width), -1, np.int32)
        start = 0
        for lvl, c in enumerate(counts):
            out[lvl, :c] = order[start:start + c]
            start += c
        return out

    def level_chunks(self, width: int) -> np.ndarray:
        """[n_chunks, width] row indices, -1 padded, chunks never spanning
        levels.

        A memory-bounded alternative to ``level_nodes`` for deep/wide
        networks: the dense level matrix costs O(n_levels * widest_level)
        (CONUS: ~92 x ~1M), while chunking costs O(N + n_levels * width).
        Same-level nodes are independent, so splitting a level across
        consecutive scan steps preserves strict-mode semantics.
        """
        order = np.argsort(self.level, kind="stable")
        counts = np.bincount(self.level, minlength=self.n_levels)
        # never wider than the widest level (rounded up to the 128-lane
        # TPU vector width): deep narrow networks would otherwise pad
        # every row to `width` and waste most of each level step
        if counts.size:
            widest = int(counts.max())
            width = min(width, max(128, -(-widest // 128) * 128))
        chunks = []
        start = 0
        for c in counts:
            for off in range(0, int(c), width):
                chunk = order[start + off:start + min(off + width, c)]
                row = np.full(width, -1, np.int32)
                row[:chunk.size] = chunk
                chunks.append(row)
            start += c
        if not chunks:
            return np.full((1, width), -1, np.int32)
        return np.stack(chunks)

    @cached_property
    def reservoir_rows(self) -> np.ndarray:
        return np.flatnonzero(self.node_type == NODE_RESERVOIR).astype(np.int32)

    @cached_property
    def res_slot(self) -> np.ndarray:
        """[N] dense reservoir slot per row (-1 for MC nodes)."""
        slot = np.full(self.n_nodes, -1, np.int32)
        slot[self.reservoir_rows] = np.arange(self.reservoir_rows.size, dtype=np.int32)
        return slot

    def validate(self) -> None:
        n = self.n_nodes
        assert self.downstream.shape == (n,)
        assert self.level.shape == (n,)
        assert self.node_type.shape == (n,)
        assert np.unique(self.ids).size == n, "duplicate node ids"
        ds = self.downstream
        ok = ds >= 0
        # levels strictly increase downstream
        assert np.all(self.level[ds[ok]] > self.level[ok]), \
            "level schedule violates topology"
        # upstream lists are consistent with downstream pointers
        up = self.upstream
        for k in range(self.max_upstreams):
            col = up[:, k]
            m = col >= 0
            assert np.all(ds[col[m]] == np.flatnonzero(m)), \
                "upstream/downstream arrays disagree"


def build_topology(ids: Sequence[int], downstream_ids: Sequence[int],
                   node_type: Sequence[int] | None = None,
                   terminal_codes: Sequence[int] = (0,),
                   on_cycle: str = "raise",
                   row_order: str | None = None) -> RoutingTopology:
    """Build the columnar topology from parallel id/to-id arrays.

    ``downstream_ids`` entries that are terminal codes, or that reference
    ids outside ``ids`` (pruned-domain outflows), become terminal.

    ``on_cycle``: "raise" errors on circular networks; "drop" removes the
    nodes on cycles (nodes draining into a dropped cycle become terminal) —
    mirroring the reference, whose circular subnetworks have no tailwater
    and are never reached by ``organize_independent_networks`` (see the
    ``network_circulars`` fixture in ``test_nhd_network.py``).

    ``row_order``: None keeps input order; ``"postorder"`` relabels rows
    by a post-order DFS of the drainage forest so nearly every edge has
    row displacement 1 — the layout the banded upstream-sum plan wants
    (``routing/upstream_plan.py``).  Row order is internal: consumers map
    external ids through ``index_of``/``ids``.
    """
    ids = np.asarray(ids, np.int64)
    to = np.asarray(downstream_ids, np.int64)
    n = ids.size
    if np.unique(ids).size != n:
        raise ValueError("node ids must be unique")

    order = np.argsort(ids)
    sorted_ids = ids[order]
    pos = np.searchsorted(sorted_ids, to)
    pos_clipped = np.clip(pos, 0, n - 1)
    found = sorted_ids[pos_clipped] == to
    downstream = np.where(found, order[pos_clipped], TERMINAL).astype(np.int32)
    terminal_mask = np.isin(to, np.asarray(terminal_codes, np.int64))
    downstream[terminal_mask] = TERMINAL
    # self-loops (some datasets mark terminals as to == id)
    downstream[downstream == np.arange(n)] = TERMINAL

    nt = (np.asarray(node_type, np.int8) if node_type is not None
          else np.zeros(n, np.int8))

    if on_cycle == "drop":
        keep = _acyclic_mask(downstream)
        if not keep.all():
            import logging
            logging.getLogger(__name__).warning(
                "dropping %d nodes on circular networks", (~keep).sum())
            idx_map = np.full(n, -1, np.int64)
            idx_map[keep] = np.arange(int(keep.sum()))
            ids = ids[keep]
            old_ds = downstream[keep]
            downstream = np.where(old_ds >= 0, idx_map[old_ds],
                                  TERMINAL).astype(np.int32)
            nt = nt[keep]
            n = ids.size

    upstream = _invert_downstream(downstream, n)
    if row_order == "postorder":
        from troute_tpu.routing.upstream_plan import postorder
        order = postorder(downstream, upstream)
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        ids = ids[order]
        downstream = np.where(downstream[order] >= 0,
                              inv[np.maximum(downstream[order], 0)],
                              TERMINAL).astype(np.int32)
        nt = nt[order]
        upstream = _invert_downstream(downstream, n)
    elif row_order is not None:
        raise ValueError(f"unknown row_order {row_order!r}")
    level = _wavefront_levels(downstream, upstream)
    return RoutingTopology(ids=ids, downstream=downstream, upstream=upstream,
                           level=level, node_type=nt)


def _acyclic_mask(downstream: np.ndarray) -> np.ndarray:
    """True for nodes that can reach a terminal (not part of/above a cycle
    that drains nowhere).  Kahn peeling from the upstream side marks all
    DAG nodes; leftovers sit on cycles."""
    n = downstream.size
    indeg = np.zeros(n, np.int64)
    valid = downstream >= 0
    np.add.at(indeg, downstream[valid], 1)
    remaining = indeg.copy()
    stack = list(np.flatnonzero(remaining == 0))
    seen = np.zeros(n, bool)
    while stack:
        u = stack.pop()
        seen[u] = True
        d = downstream[u]
        if d >= 0:
            remaining[d] -= 1
            if remaining[d] == 0:
                stack.append(d)
    return seen


def from_connections(conn: Mapping, node_type: Mapping | None = None,
                     reservoir_ids: Sequence[int] = ()) -> RoutingTopology:
    """Build from a dict-of-lists connections graph (test/interop path)."""
    ids = sorted(conn.keys())
    down = []
    for i in ids:
        dsts = conn[i]
        if len(dsts) > 1:
            raise ValueError(f"node {i} has multiple downstream links")
        down.append(dsts[0] if dsts else -9999)
    res = set(reservoir_ids)
    nt = [NODE_RESERVOIR if i in res else NODE_MC for i in ids]
    if node_type is not None:
        nt = [node_type.get(i, t) for i, t in zip(ids, nt)]
    return build_topology(ids, down, nt, terminal_codes=(-9999,))


def _invert_downstream(downstream: np.ndarray, n: int) -> np.ndarray:
    """Padded [N, K] upstream lists from the downstream pointer array."""
    from troute_tpu import native
    up = native.invert_downstream(downstream)
    if up is not None:
        return up
    has_ds = downstream >= 0
    srcs = np.flatnonzero(has_ds).astype(np.int32)
    dsts = downstream[srcs]
    if srcs.size == 0:
        return np.full((n, 1), -1, np.int32)
    sort = np.argsort(dsts, kind="stable")
    srcs, dsts = srcs[sort], dsts[sort]
    indeg = np.bincount(dsts, minlength=n)
    k = int(indeg.max()) if indeg.size else 1
    k = max(k, 1)
    upstream = np.full((n, k), -1, np.int32)
    # position of each src within its destination's group
    group_start = np.concatenate([[0], np.cumsum(indeg)])[dsts]
    rank = np.arange(srcs.size) - group_start
    upstream[dsts, rank] = srcs
    return upstream


def _wavefront_levels(downstream: np.ndarray, upstream: np.ndarray) -> np.ndarray:
    """Longest-path-from-headwater level per node, via frontier sweeps.

    Native O(N+E) kernel when available; otherwise one vectorized NumPy
    sweep per level (CONUS depth ~2.2k sweeps, a one-time cost).
    """
    from troute_tpu import native
    lv = native.wavefront_levels(downstream)
    if lv is not None:
        return lv
    n = downstream.size
    indeg = (upstream >= 0).sum(axis=1).astype(np.int64)
    level = np.zeros(n, np.int32)
    remaining = indeg.copy()
    frontier = np.flatnonzero(remaining == 0)
    lvl = 0
    processed = 0
    while frontier.size:
        level[frontier] = lvl
        processed += frontier.size
        ds = downstream[frontier]
        ds = ds[ds >= 0]
        if ds.size:
            np.subtract.at(remaining, ds, 1)
            frontier = ds[remaining[ds] == 0]
            frontier = np.unique(frontier)
        else:
            frontier = np.empty(0, np.int64)
        lvl += 1
    if processed != n:
        raise ValueError("cycle detected in network")
    return level
