"""Diffusive domain assembly: reach lists + geometry -> padded device arrays.

The reference marshals this in ``diffusive_utils_v02.diffusive_input_data_v02``
(frnw matrix, per-node geometry maps, qlat/boundary maps).  Here reaches are
right-aligned into [R, C] arrays and the corrector wavefront levels are
precomputed from the mainstem reach tree.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from troute_tpu.diffusive.solver import DiffusiveDomain
from troute_tpu.diffusive.xsection import build_xsec_tables


def build_domain(reach_nodes: Sequence[dict], ds_reach: Sequence[int],
                 qlat_series: np.ndarray, dt_qlat: float,
                 trib_series: np.ndarray, dt_trib: float,
                 dtini_given: float, dtype=jnp.float64,
                 natural_xsec: dict | None = None,
                 db_depth: np.ndarray | None = None,
                 dt_db: float = 3600.0) -> DiffusiveDomain:
    """Assemble a DiffusiveDomain.

    Args:
        reach_nodes: per reach, dict of 1-D node arrays
            (z, dx, bo, traps, tw, twcc, mann, manncc); ``dx[i]`` is the
            distance from node i to node i+1 (last entry ignored)
        ds_reach: downstream reach index per reach (-1 = tailwater)
        qlat_series: [n_t, R, C_ragged-aligned?] — pass per-reach node qlat
            as a [n_t] x reach list via the same right-aligned layout:
            [n_t, R, C] (caller aligns), or None for zeros
        trib_series: [n_t, R] tributary inflow at each reach head
        db_depth: [R, n_db] observed water-depth series (m) at tailwater
            bottom nodes (coastal dsbc_option == 1); NaN rows use the
            normal-depth boundary. None -> normal depth everywhere.
        dt_db: boundary series timestep (s), series starting at t = 0
    """
    R = len(reach_nodes)
    ncomp = np.array([len(r["z"]) for r in reach_nodes], np.int32)
    C = int(ncomp.max())
    head_col = (C - ncomp).astype(np.int32)

    def right_align(key, fill):
        out = np.full((R, C), fill, np.float64)
        for j, r in enumerate(reach_nodes):
            out[j, C - ncomp[j]:] = r[key]
        return out

    z = right_align("z", 0.0)
    dx = right_align("dx", 1.0)
    # pad dx so padded columns don't produce zero divisions
    dx = np.where(dx <= 0, 1.0, dx)
    bo = right_align("bo", 1.0)
    traps = right_align("traps", 1.0)
    tw = right_align("tw", 3.0)
    twcc = right_align("twcc", 9.0)
    mann = right_align("mann", 0.05)
    manncc = right_align("manncc", 0.1)

    if natural_xsec is None and z.size >= 2048:
        # big synthetic domains: build the table on-device (fused XLA, no
        # multi-GB host temporaries — this VM faults fresh pages at
        # ~10 MB/s — and on TPU the table never crosses the tunnel)
        from troute_tpu.diffusive.xsection import build_xsec_tables_jax
        tab, z_adj = build_xsec_tables_jax(z, bo, traps, tw, twcc, mann,
                                           manncc, dx, dtype=dtype)
    else:
        tab, z_adj = build_xsec_tables(z, bo, traps, tw, twcc, mann,
                                       manncc, dx)

    if natural_xsec:
        # override nodes that carry surveyed bathymetry (reference: natural
        # tables replace the synthetic trapezoid wholesale,
        # readXsection_natural_mann_vertices + the uniform-flow column pass)
        from troute_tpu.diffusive.solver import SO_LLM
        from troute_tpu.diffusive.xsection import build_xsec_table_natural
        for (ri, ni), (xb, zb, nb) in natural_xsec.items():
            col = C - ncomp[ri] + ni
            t_nat, z_datum = build_xsec_table_natural(xb, zb, nb)
            tab[ri, col] = t_nat
            z_adj[ri, col] = z_datum
        # recompute uniform-flow col 9 with the adjusted datums
        slope = np.zeros((R, C))
        if C > 1:
            slope[:, :-1] = (z_adj[:, :-1] - z_adj[:, 1:]) \
                / np.maximum(dx[:, :-1], 1e-12)
            slope[:, -1] = (z_adj[:, -2] - z_adj[:, -1]) \
                / np.maximum(dx[:, -2], 1e-12)
        slope = np.maximum(slope, SO_LLM)
        for (ri, ni) in natural_xsec:
            col = C - ncomp[ri] + ni
            tab[ri, col, 9] = tab[ri, col, 4] * np.sqrt(slope[ri, col])

    valid = np.zeros((R, C), bool)
    for j in range(R):
        valid[j, C - ncomp[j]:] = True

    ds = np.asarray(ds_reach, np.int32)
    # upstream lists
    K = max(1, int(np.bincount(ds[ds >= 0], minlength=R).max()
                   if (ds >= 0).any() else 1))
    up = np.full((R, K), -1, np.int32)
    fill = np.zeros(R, np.int32)
    for j, d in enumerate(ds):
        if d >= 0:
            up[d, fill[d]] = j
            fill[d] += 1

    # corrector node schedule: reach r starts after its downstream reach
    # has finished its full node chain; one node per reach per global step
    start = np.zeros(R, np.int64)

    def _start(j):
        d = ds[j]
        if d < 0:
            return 0
        return _start(d) + int(ncomp[d])

    for j in range(R):
        start[j] = _start(j)
    D = int((start + ncomp).max())
    bwd_active = np.zeros((D, R), bool)
    bwd_col = np.zeros((D, R), np.int32)
    for j in range(R):
        for k in range(int(ncomp[j])):
            bwd_active[start[j] + k, j] = True
            bwd_col[start[j] + k, j] = C - 1 - k

    if qlat_series is None:
        qlat_series = np.zeros((2, R, C))
    # duplicate the first row: the reference's qlat time array starts with
    # the first value held constant over [t0, t0+dt] (diffusive.f90:494-499)
    qlat_series = np.concatenate([qlat_series[:1], qlat_series], axis=0)
    if trib_series is None:
        trib_series = np.zeros((2, R))

    return DiffusiveDomain(
        z=jnp.asarray(z_adj, dtype),
        dx=jnp.asarray(dx, dtype),
        ncomp=jnp.asarray(ncomp),
        head_col=jnp.asarray(head_col),
        valid=jnp.asarray(valid),
        xsec=jnp.asarray(tab, dtype),
        ds_reach=jnp.asarray(ds),
        up_reaches=jnp.asarray(up),
        bwd_active=jnp.asarray(bwd_active),
        bwd_col=jnp.asarray(bwd_col),
        trib_q=jnp.asarray(trib_series, dtype),
        dt_trib=float(dt_trib),
        qlat=jnp.asarray(qlat_series, dtype),
        dt_qlat=float(dt_qlat),
        dtini_given=float(dtini_given),
        db_depth=(None if db_depth is None
                  else jnp.asarray(db_depth, dtype)),
        dt_db=float(dt_db),
        xsec_min=jnp.asarray(tab.min(axis=-1), dtype),
    )
