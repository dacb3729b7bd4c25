"""Domain decomposition of the river network across a device mesh.

The reference's only parallelism is a single-node joblib process pool over
independent basins / JIT subnetworks with pickled-array hand-off
(``compute.py:553-1396``).  Here the network is *sharded*: each device owns
a contiguous padded block of nodes, and the few junction edges that cross
device boundaries become a halo exchange (all-gather of exported boundary
flows over ICI) fused into the routing step — the
``flowveldepth_interorder`` dict replaced by device collectives.

Partitioning is by independent drainage basin (connected components of the
junction graph) with greedy size balancing; any explicit assignment can be
supplied instead (e.g. to split the Mississippi at mainstem points or to
force cut edges in tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from troute_tpu.network.topology import RoutingTopology


@dataclass(frozen=True)
class NetworkPartition:
    """Host-side index plan for a sharded network.

    Extended local array layout on each device: positions [0, n_local) are
    owned nodes, positions [n_local, n_local + n_halo) are halo slots
    holding imported remote upstream flows.
    """

    n_dev: int
    n_local: int
    n_halo: int
    n_export: int
    # [n_dev, n_local] global row held at each (device, slot); -1 pad
    global_row: np.ndarray
    # [N] owning device / local slot of each global row
    owner: np.ndarray
    local_slot: np.ndarray
    # [n_dev, n_local, K] upstream indices into the extended local array; -1 pad
    upstream_local: np.ndarray
    # [n_dev, n_export] local slots whose flow is exported (clamped 0 pad)
    export_slot: np.ndarray
    # [n_dev, n_halo] source (device, export position) for each halo slot
    halo_src_dev: np.ndarray
    halo_src_pos: np.ndarray
    # --- neighbor-exchange plan (ppermute rounds; SURVEY §2.4) ---
    # [n_rounds, n_pairs, 2] (src_dev, dst_dev) partial permutation per
    # round; -1 pad.  Each device sends/receives at most one message per
    # round (greedy edge coloring of the device communication digraph), so
    # rounds = max neighbor degree, and each message carries only that
    # pair's actual cut-edge values — unlike the all_gather fallback which
    # broadcasts every exported value to every device.
    perm_pairs: np.ndarray
    # [n_dev, n_rounds, W] local slots packed into the round's send buffer
    send_slot: np.ndarray
    # [n_dev, n_rounds, W] halo positions the received buffer lands in (-1 pad)
    recv_pos: np.ndarray
    # [n_dev, n_boundary] local rows with any remote upstream (-1 pad);
    # the rows recomputed after the exchange in the overlapped step
    boundary_rows: np.ndarray
    # --- per-shard banded upstream-sum plan (see routing/upstream_plan) ---
    # the interior upstream sum as masked shifts over local slots; in-shard
    # out-of-band edges ride a sparse remainder; halo-referencing rows are
    # the boundary rows, recomputed with the full gather after the exchange.
    # band_shifts is None when local slot order is too scattered to band.
    band_shifts: tuple | None = None
    band_masks: np.ndarray | None = None    # bool [n_dev, D, n_local]
    band_rem_dst: np.ndarray | None = None  # int32 [n_dev, E] (-1 pad)
    band_rem_src: np.ndarray | None = None  # int32 [n_dev, E]
    band_coverage: float = 0.0

    @property
    def cut_edges(self) -> int:
        return int((self.halo_src_dev >= 0).sum())


def _components(topo: RoutingTopology) -> np.ndarray:
    """Connected-component label per node (union along downstream edges)."""
    from troute_tpu import native
    labels = native.connected_components(topo.downstream)
    if labels is not None:
        return labels
    n = topo.n_nodes
    parent = np.arange(n)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for i in range(n):
        d = topo.downstream[i]
        if d >= 0:
            ra, rb = find(i), find(int(d))
            if ra != rb:
                parent[ra] = rb
    return np.array([find(i) for i in range(n)])


def greedy_basin_assignment(topo: RoutingTopology, n_dev: int) -> np.ndarray:
    """Assign whole basins to devices, largest first to the lightest bin."""
    comp = _components(topo)
    labels, counts = np.unique(comp, return_counts=True)
    order = np.argsort(-counts)
    load = np.zeros(n_dev, np.int64)
    comp_dev = {}
    for k in order:
        d = int(np.argmin(load))
        comp_dev[labels[k]] = d
        load[d] += counts[k]
    return np.array([comp_dev[c] for c in comp], np.int32)


def partition_network(topo: RoutingTopology, n_dev: int,
                      assignment: np.ndarray | None = None
                      ) -> NetworkPartition:
    """Build the sharded index plan.

    Args:
        assignment: optional [N] device id per node; defaults to greedy
            basin packing (zero cut edges when basins fit).
    """
    n = topo.n_nodes
    if assignment is None:
        assignment = greedy_basin_assignment(topo, n_dev)
    assignment = np.asarray(assignment, np.int32)

    counts = np.bincount(assignment, minlength=n_dev)
    n_local = max(int(counts.max()), 1)
    # align the per-shard extent to whole 8x128 tiles: unaligned node
    # counts leave every per-shard array (and the Pallas block grid)
    # ragged on TPU — measured 1.83e8 -> 2.02e8 seg-ts/s (+10%) on the
    # 1-device CONUS mesh at matched tenancy-probe readings (round 5).
    # Pad slots are ordinary invalid rows (global_row -1).
    n_local = -(-n_local // 1024) * 1024

    global_row = np.full((n_dev, n_local), -1, np.int64)
    local_slot = np.full(n, -1, np.int64)
    for d in range(n_dev):
        rows = np.flatnonzero(assignment == d)
        global_row[d, :rows.size] = rows
        local_slot[rows] = np.arange(rows.size)

    # find cut edges: upstream u (on dev(u)) feeding node v (on dev(v) != dev(u))
    exports: list[list[int]] = [[] for _ in range(n_dev)]   # local slots per dev
    export_pos: dict[tuple[int, int], int] = {}             # (dev, slot) -> pos
    imports: list[list[tuple[int, int]]] = [[] for _ in range(n_dev)]
    halo_of: dict[tuple[int, int], int] = {}                # (dev_v, global_u) -> halo idx

    K = topo.max_upstreams
    upstream_local = np.full((n_dev, n_local, K), -1, np.int64)
    for v in range(n):
        dv = int(assignment[v])
        sv = int(local_slot[v])
        for k in range(K):
            u = int(topo.upstream[v, k])
            if u < 0:
                continue
            du = int(assignment[u])
            if du == dv:
                upstream_local[dv, sv, k] = local_slot[u]
            else:
                su = int(local_slot[u])
                key = (du, su)
                if key not in export_pos:
                    export_pos[key] = len(exports[du])
                    exports[du].append(su)
                hkey = (dv, u)
                if hkey not in halo_of:
                    halo_of[hkey] = len(imports[dv])
                    imports[dv].append((du, export_pos[key]))
                upstream_local[dv, sv, k] = n_local + halo_of[hkey]

    n_export = max((len(e) for e in exports), default=0)
    n_halo = max((len(i) for i in imports), default=0)
    n_export = max(n_export, 1)
    n_halo = max(n_halo, 1)

    export_slot = np.zeros((n_dev, n_export), np.int64)
    halo_src_dev = np.full((n_dev, n_halo), -1, np.int64)
    halo_src_pos = np.zeros((n_dev, n_halo), np.int64)
    for d in range(n_dev):
        for p, s in enumerate(exports[d]):
            export_slot[d, p] = s
        for h, (sd, sp) in enumerate(imports[d]):
            halo_src_dev[d, h] = sd
            halo_src_pos[d, h] = sp

    # ---- neighbor-exchange plan ----
    # message (s -> d): the halo values device d imports from device s.
    # msg[(s, d)] = list of (src local slot on s, halo position on d)
    msgs: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for d in range(n_dev):
        for h, (sd, sp) in enumerate(imports[d]):
            msgs.setdefault((sd, d), []).append((exports[sd][sp], h))

    # greedy edge coloring: each round is a partial permutation
    rounds: list[dict[tuple[int, int], list]] = []
    for key, vals in sorted(msgs.items(),
                            key=lambda kv: -len(kv[1])):
        s, d = key
        placed = False
        for rnd in rounds:
            if all(ks != s for ks, _ in rnd) and \
                    all(kd != d for _, kd in rnd):
                rnd[key] = vals
                placed = True
                break
        if not placed:
            rounds.append({key: vals})

    n_rounds = len(rounds)
    W = max((len(v) for v in msgs.values()), default=0)
    n_pairs = max((len(r) for r in rounds), default=0)
    perm_pairs = np.full((n_rounds, max(n_pairs, 1), 2), -1, np.int64)
    send_slot = np.zeros((n_dev, n_rounds, max(W, 1)), np.int64)
    recv_pos = np.full((n_dev, n_rounds, max(W, 1)), -1, np.int64)
    for r, rnd in enumerate(rounds):
        for p, ((s, d), vals) in enumerate(sorted(rnd.items())):
            perm_pairs[r, p] = (s, d)
            for w, (slot, hpos) in enumerate(vals):
                send_slot[s, r, w] = slot
                recv_pos[d, r, w] = hpos

    # rows whose upstream list references any halo slot
    boundary = [np.flatnonzero((upstream_local[d] >= n_local).any(axis=1))
                for d in range(n_dev)]
    B = max((b.size for b in boundary), default=0)
    boundary_rows = np.full((n_dev, max(B, 1)), -1, np.int64)
    for d, b in enumerate(boundary):
        boundary_rows[d, :b.size] = b

    band = _banded_local_plans(upstream_local, n_local)

    return NetworkPartition(
        n_dev=n_dev, n_local=n_local, n_halo=n_halo, n_export=n_export,
        global_row=global_row, owner=assignment.astype(np.int64),
        local_slot=local_slot, upstream_local=upstream_local,
        export_slot=export_slot, halo_src_dev=halo_src_dev,
        halo_src_pos=halo_src_pos, perm_pairs=perm_pairs,
        send_slot=send_slot, recv_pos=recv_pos,
        boundary_rows=boundary_rows, **band)


def _banded_local_plans(upstream_local: np.ndarray, n_local: int,
                        max_shifts: int = 32,
                        max_remainder_frac: float = 0.25) -> dict:
    """Per-shard banded plan over IN-SHARD edges (local slot < n_local).

    Local slots preserve global row order within each device, so a
    postorder-labeled topology keeps almost every in-shard edge at slot
    displacement 1 even after balanced splitting; the few out-of-band
    edges become a sparse remainder.  Halo-referencing rows are excluded:
    they are the partition's boundary rows, recomputed with the full
    gather after the halo exchange.
    """
    n_dev, _, K = upstream_local.shape
    dsts, srcs, disps = [], [], []
    for d in range(n_dev):
        up = upstream_local[d]
        dst_l, src_l = [], []
        for k in range(K):
            col = up[:, k]
            m = (col >= 0) & (col < n_local)
            dst_l.append(np.flatnonzero(m))
            src_l.append(col[m])
        dst = np.concatenate(dst_l) if dst_l else np.zeros(0, np.int64)
        src = np.concatenate(src_l) if src_l else np.zeros(0, np.int64)
        dsts.append(dst)
        srcs.append(src)
        disps.append(dst - src)
    disp_all = np.concatenate(disps) if disps else np.zeros(0, np.int64)
    none = dict(band_shifts=None, band_masks=None, band_rem_dst=None,
                band_rem_src=None, band_coverage=0.0)
    if disp_all.size == 0:
        return dict(band_shifts=(),
                    band_masks=np.zeros((n_dev, 0, n_local), bool),
                    band_rem_dst=np.full((n_dev, 1), -1, np.int32),
                    band_rem_src=np.zeros((n_dev, 1), np.int32),
                    band_coverage=1.0)
    vals, counts = np.unique(disp_all, return_counts=True)
    top = np.argsort(counts)[::-1][:max_shifts]
    band_vals = vals[top]
    order = np.lexsort((band_vals, -counts[top]))
    shifts = tuple(int(band_vals[i]) for i in order)
    in_band_total = int(np.isin(disp_all, band_vals).sum())
    coverage = in_band_total / disp_all.size
    if 1.0 - coverage > max_remainder_frac:
        return none

    sarr = np.asarray(shifts, np.int64)
    ssort = np.argsort(sarr)
    sorted_s = sarr[ssort]
    D = len(shifts)
    masks = np.zeros((n_dev, D, n_local), bool)
    rem_d, rem_s = [], []
    for d in range(n_dev):
        dst, src, dd = dsts[d], srcs[d], disps[d]
        pos = np.clip(np.searchsorted(sorted_s, dd), 0, D - 1) if D else             np.zeros(dd.shape, np.int64)
        rank = np.where(sorted_s[pos] == dd, ssort[pos], D) if D else             np.full(dd.shape, 0, np.int64)
        inb = rank < D
        masks[d, rank[inb], dst[inb]] = True
        rem_d.append(dst[~inb])
        rem_s.append(src[~inb])
    E = max(1, max(r.size for r in rem_d))
    rdst = np.full((n_dev, E), -1, np.int32)
    rsrc = np.zeros((n_dev, E), np.int32)
    for d in range(n_dev):
        rdst[d, :rem_d[d].size] = rem_d[d]
        rsrc[d, :rem_s[d].size] = rem_s[d]
    return dict(band_shifts=shifts, band_masks=masks, band_rem_dst=rdst,
                band_rem_src=rsrc, band_coverage=coverage)


def scatter_to_shards(part: NetworkPartition, arr: np.ndarray,
                      fill=0.0) -> np.ndarray:
    """[N, ...] global array -> [n_dev, n_local, ...] padded shard layout."""
    out_shape = (part.n_dev, part.n_local) + arr.shape[1:]
    out = np.full(out_shape, fill, dtype=arr.dtype)
    mask = part.global_row >= 0
    out[mask] = arr[part.global_row[mask]]
    return out


def gather_from_shards(part: NetworkPartition, arr: np.ndarray) -> np.ndarray:
    """[n_dev, n_local, ...] shard layout -> [N, ...] global array."""
    n = part.owner.size
    out = np.zeros((n,) + arr.shape[2:], dtype=arr.dtype)
    mask = part.global_row >= 0
    out[part.global_row[mask]] = arr[mask]
    return out


def _tree_cut_parts_py(downstream: np.ndarray, cap: int) -> np.ndarray:
    """Pure-python fallback of ``native.tree_cut_parts`` (same algorithm:
    one topological pass cutting any child whose inclusion would push its
    parent's accumulated part past ``cap``)."""
    n = downstream.size
    indeg = np.zeros(n, np.int64)
    valid = downstream >= 0
    np.add.at(indeg, downstream[valid], 1)
    order = list(np.flatnonzero(indeg == 0))
    acc = np.ones(n, np.int64)
    cut = np.zeros(n, bool)
    head = 0
    while head < len(order):
        u = int(order[head])
        head += 1
        d = int(downstream[u])
        if acc[u] >= cap:
            cut[u] = True
        if d >= 0:
            if not cut[u]:
                if acc[d] + acc[u] > cap:
                    cut[u] = True
                else:
                    acc[d] += acc[u]
            indeg[d] -= 1
            if indeg[d] == 0:
                order.append(d)
    if len(order) != n:
        raise ValueError("cycle detected in network")
    part = np.full(n, -1, np.int32)
    nxt = 0
    for u in reversed(order):
        d = int(downstream[u])
        if cut[u] or d < 0:
            part[u] = nxt
            nxt += 1
        else:
            part[u] = part[d]
    return part


def balanced_assignment(topo: RoutingTopology, n_dev: int) -> np.ndarray:
    """Device assignment that SPLITS large basins with minimal cut edges.

    ``greedy_basin_assignment`` keeps basins whole, so one giant basin
    (the Mississippi is ~half of CONUS, ``doc/AGU_Poster.md:211-214``)
    caps scaling at 2x — the same wall the reference's by-network joblib
    pool hits.  Here the forest is first sliced into CONNECTED parts of
    size <= ~n/(4*n_dev) by cutting tree edges (``tree_cut_parts``: a
    forest in P connected parts costs exactly P - n_basins cuts, the
    minimum possible), then the parts — ordered by first row, so
    tree-adjacent parts are sequence-adjacent under the postorder row
    layout — are sliced into n_dev contiguous, load-balanced groups.
    Colocated neighbor parts keep their shared edges on-device, so the
    inter-device cut count stays O(n_dev), orders of magnitude below a
    subtree-recursion split (measured: 150k-node CONUS-statistics forest
    at 8 devices, 13,382 -> ~16 cut edges).
    """
    n = topo.n_nodes
    if n == 0:
        return np.zeros(0, np.int32)
    if n_dev <= 1:
        return np.zeros(n, np.int32)
    cap = max(1, -(-n // (4 * n_dev)))
    from troute_tpu import native
    part = native.tree_cut_parts(topo.downstream, cap)
    if part is None:
        part = _tree_cut_parts_py(np.asarray(topo.downstream), cap)
    p_count = int(part.max()) + 1
    sizes = np.bincount(part, minlength=p_count).astype(np.int64)
    first_row = np.full(p_count, n, np.int64)
    np.minimum.at(first_row, part, np.arange(n))
    order = np.argsort(first_row, kind="stable")
    part_dev = np.zeros(p_count, np.int32)
    dev, load = 0, 0
    remaining, rem_dev = n, n_dev
    for p in order:
        s = int(sizes[p])
        target = remaining / rem_dev
        # close this device when adding the part moves the load farther
        # from the running target than stopping short does
        if dev < n_dev - 1 and load > 0 \
                and (load + s) - target > target - load:
            remaining -= load
            rem_dev -= 1
            dev += 1
            load = 0
            target = remaining / rem_dev
        part_dev[p] = dev
        load += s
    return part_dev[part]
