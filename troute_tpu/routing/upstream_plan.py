"""Banded upstream-flow summation: masked shifts instead of gathers.

The junction/within-reach upstream flow sum is the reference's
``mc_reach.pyx:499-505`` (sum the previous-timestep flows of each node's
upstream neighbors).  The direct vector form — an advanced-index gather
over a padded ``[N, K]`` upstream list — is semantically perfect but
pathological on TPU: per-lane dynamic gathers run at HBM-latency speed
(~8 ns/element measured), so at CONUS scale (2.7M segments, ~2.7M edges)
ONE upstream sum costs ~80 ms while the entire fused MC step costs ~7 ms.

This module replaces the gather with a *banded* formulation.  Write each
edge as a row displacement ``d = row(downstream) - row(upstream)``.  Then

    up_sum = sum_d  shift(q, d) * mask_d   (+ sparse remainder)

where ``mask_d`` marks the rows with an upstream at displacement ``d``.
Each term is a static slice plus a masked add — pure VPU traffic at
HBM-streaming speed (~0.1 ms per term at CONUS scale), so the sum costs
~D bandwidth passes instead of ~N latency-bound fetches.

The plan covers the most frequent displacements with masks and routes the
rest through a small gather+scatter remainder.  Band quality is a
property of ROW ORDER: in a post-order DFS of the drainage forest every
non-junction node's single upstream sits at displacement 1 (children are
emitted immediately before their parent, subtrees contiguous), and a
junction's *last* child also sits at displacement 1 — only the earlier
children of junctions (~0.3 edges/node on CONUS-statistics networks) jump
farther, by the sizes of intervening sibling subtrees (mostly small
tributaries).  ``build_topology(..., row_order="postorder")`` produces
that layout; the production network builder uses it.

Measured on one v5e chip (CONUS-scale synthetic, 24 fused MC steps):
gather path 2.17 s, banded path 0.18 s — the banded sum reduces the
upstream-sum share from ~12x the kernel cost to ~9% of it.

(A K-step VMEM-resident blocked Pallas kernel — params loaded once per
K timesteps — was also studied and measured out: the in-kernel junction
exchange needs per-step per-lane gathers at ~1.4 us per (8,128) gather
or one-hot matmuls whose operand streaming exceeds the parameter traffic
saved.  The banded formulation keeps the exchange at XLA level where it
is a bandwidth op, which is strictly better on this toolchain.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_SHIFTS = 32
# remainder edges cost ~2 latency-bound memory ops each (gather + scatter);
# past ~20% of edges the banded form loses its advantage over the gather
MAX_REMAINDER_FRAC = 0.20


@dataclass(frozen=True)
class UpstreamPlan:
    """Host-side banded summation plan for one padded network layout.

    ``masks[i]`` marks rows whose upstream at displacement ``shifts[i]``
    exists; remainder edges are (dst, src) row pairs handled by a sparse
    gather + scatter-add.  ``upstream_sorted`` is the input ``[N, K]``
    upstream list with each node's columns reordered to the plan's
    accumulation order (band rank, then remainder) so the banded sum and
    the reference gather sum add in the same order (bit-identical apart
    from unordered scatter duplicates, which only occur for nodes with
    two or more remainder edges).
    """

    n_pad: int
    shifts: tuple[int, ...]        # static band displacements
    masks: np.ndarray              # bool [D, n_pad]
    rem_dst: np.ndarray            # int32 [E_rem]
    rem_src: np.ndarray            # int32 [E_rem]
    coverage: float                # fraction of edges in the band
    upstream_sorted: np.ndarray    # int32 [N, K]


def postorder(downstream: np.ndarray, upstream: np.ndarray) -> np.ndarray:
    """Post-order DFS of the drainage forest: children before parents,
    subtrees contiguous.  Returns [N] new position -> original row.

    Native kernel when available (the Python DFS costs ~6 s at CONUS
    scale vs ~50 ms native); both produce the identical order
    (tailwaters ascending, children in upstream-column order)."""
    from troute_tpu import native
    nat = native.postorder_forest(downstream, upstream)
    if nat is not None:
        return nat
    n = downstream.shape[0]
    order = np.empty(n, np.int64)
    pos = 0
    visited = np.zeros(n, bool)
    tails = np.flatnonzero(np.asarray(downstream) < 0)
    up = np.asarray(upstream)
    for t in tails:
        stack = [(int(t), 0)]
        while stack:
            v, ci = stack[-1]
            kids = up[v]
            while ci < kids.shape[0] and (kids[ci] < 0
                                          or visited[kids[ci]]):
                ci += 1
            if ci < kids.shape[0]:
                stack[-1] = (v, ci + 1)
                stack.append((int(kids[ci]), 0))
            else:
                stack.pop()
                visited[v] = True
                order[pos] = v
                pos += 1
    assert pos == n, "drainage graph must be a forest (no cycles)"
    return order


def build_upstream_plan(upstream: np.ndarray, n_pad: int,
                        max_shifts: int = MAX_SHIFTS,
                        max_remainder_frac: float = MAX_REMAINDER_FRAC
                        ) -> UpstreamPlan | None:
    """Build the banded plan for an ``[N, K]`` padded upstream list.

    Returns None when the row order is too scattered for banding (more
    than ``max_remainder_frac`` of edges outside the ``max_shifts`` most
    frequent displacements) — callers then keep the gather form.
    """
    up = np.asarray(upstream)
    n, kup = up.shape
    dst_all, src_all = [], []
    for k in range(kup):
        col = up[:, k]
        m = col >= 0
        dst_all.append(np.flatnonzero(m))
        src_all.append(col[m].astype(np.int64))
    dst = np.concatenate(dst_all) if dst_all else np.zeros(0, np.int64)
    src = np.concatenate(src_all) if src_all else np.zeros(0, np.int64)
    n_edges = dst.size
    if n_edges == 0:
        return UpstreamPlan(
            n_pad=n_pad, shifts=(), masks=np.zeros((0, n_pad), bool),
            rem_dst=np.zeros(0, np.int32), rem_src=np.zeros(0, np.int32),
            coverage=1.0, upstream_sorted=up.astype(np.int32))

    disp = dst - src
    vals, counts = np.unique(disp, return_counts=True)
    top = np.argsort(counts)[::-1][:max_shifts]
    band_vals = vals[top]
    band_set = set(int(v) for v in band_vals)
    in_band = np.isin(disp, band_vals)
    coverage = float(in_band.sum()) / n_edges
    if 1.0 - coverage > max_remainder_frac:
        return None

    # deterministic band order: by descending frequency, ties by value
    order = np.lexsort((band_vals, -counts[top]))
    shifts = tuple(int(band_vals[i]) for i in order)

    masks = np.zeros((len(shifts), n_pad), bool)
    for i, d in enumerate(shifts):
        masks[i, dst[disp == d]] = True
    rem_dst = dst[~in_band].astype(np.int32)
    rem_src = src[~in_band].astype(np.int32)

    # per-node column order matching the banded accumulation order
    shift_arr = np.asarray(shifts, np.int64)
    ssort = np.argsort(shift_arr)
    sorted_shifts = shift_arr[ssort]

    def rank_lookup(d):
        if not shifts:
            return np.full(d.shape, 0, np.int64)
        pos = np.clip(np.searchsorted(sorted_shifts, d), 0,
                      len(shifts) - 1)
        return np.where(sorted_shifts[pos] == d, ssort[pos], len(shifts))

    key = np.full(up.shape, np.iinfo(np.int64).max, np.int64)
    for k in range(kup):
        col = up[:, k]
        m = col >= 0
        d = np.flatnonzero(m) - col[m]
        key[m, k] = rank_lookup(d)
    ksort = np.argsort(key, axis=1, kind="stable")
    up_sorted = np.take_along_axis(up, ksort, axis=1)
    return UpstreamPlan(
        n_pad=n_pad, shifts=shifts, masks=masks,
        rem_dst=rem_dst, rem_src=rem_src, coverage=coverage,
        upstream_sorted=up_sorted.astype(np.int32))


def device_op(plan: "UpstreamPlan") -> "UpstreamOp":
    """Stage a plan's arrays on device as a jit-friendly callable."""
    import jax.numpy as jnp

    return UpstreamOp(jnp.asarray(plan.masks),
                      jnp.asarray(plan.rem_dst),
                      jnp.asarray(plan.rem_src),
                      plan.shifts)


class UpstreamOp:
    """Device-side banded upstream sum; a pytree whose ``shifts`` are
    static aux data, so it can ride through ``jax.jit`` arguments."""

    def __init__(self, masks, rem_dst, rem_src, shifts):
        self.masks = masks
        self.rem_dst = rem_dst
        self.rem_src = rem_src
        self.shifts = tuple(shifts)

    @property
    def n_pad(self) -> int:
        return int(self.masks.shape[1])

    def __call__(self, q):
        return banded_upstream_sum(q, self.masks, self.shifts,
                                   self.rem_dst, self.rem_src)

    def tree_flatten(self):
        return (self.masks, self.rem_dst, self.rem_src), self.shifts

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


def _register():
    import jax

    jax.tree_util.register_pytree_node_class(UpstreamOp)


_register()


def banded_upstream_sum(q, masks, shifts: tuple[int, ...],
                        rem_dst=None, rem_src=None,
                        padded_remainder: bool = False):
    """[n_pad] upstream-flow sum via masked shifts (see module docstring).

    ``q`` is the padded flow vector, ``masks``/``rem_*`` device arrays
    from an ``UpstreamPlan``, ``shifts`` the plan's static displacement
    tuple.  All shapes static; no per-lane gathers except the (small)
    remainder.  ``padded_remainder`` marks -1-padded remainder arrays
    (the per-shard plans pad to a device-uniform width; see
    ``partition._banded_local_plans``).
    """
    import jax
    import jax.numpy as jnp

    n = q.shape[0]
    up = jnp.zeros_like(q)
    if shifts:
        lo = max(max(shifts), 0)
        hi = max(-min(shifts), 0)
        qx = q
        if lo or hi:
            qx = jnp.concatenate([jnp.zeros(lo, q.dtype), q,
                                  jnp.zeros(hi, q.dtype)])
        for i, d in enumerate(shifts):
            sh = jax.lax.dynamic_slice(qx, (lo - d,), (n,))
            up = up + jnp.where(masks[i], sh, 0.0)
    if rem_dst is not None and rem_dst.shape[0]:
        if padded_remainder:
            vals = jnp.where(rem_dst >= 0, q[jnp.maximum(rem_src, 0)], 0.0)
            up = up.at[jnp.where(rem_dst >= 0, rem_dst, n)].add(
                vals, mode="drop")
        else:
            up = up.at[rem_dst].add(q[rem_src])
    return up
