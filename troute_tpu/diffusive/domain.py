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
                 dt_db: float = 3600.0,
                 nel_uniform: int | None = None) -> DiffusiveDomain:
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
        nel_uniform: when set, attach uniform-elevation-grid resampled
            tables of this resolution (``solver.attach_uniform_tables``)
            — the jacobi corrector's fast path; None = exact 501-entry
            lookups (reference parity)
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

    dom = DiffusiveDomain(
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
    if nel_uniform:
        from troute_tpu.diffusive.solver import attach_uniform_tables
        dom = attach_uniform_tables(dom, nel_u=int(nel_uniform))
    return dom


def _extend_series(arr, n_t: int):
    """Pad a time series to n_t rows by continuing the last segment's
    slope — ``_interp_series`` extrapolates out-of-range along the last
    segment, so the extended series interpolates/extrapolates to exactly
    the same values everywhere."""
    if arr.shape[0] >= n_t:
        return arr
    if arr.shape[0] >= 2:
        slope = arr[-1] - arr[-2]
    else:
        slope = jnp.zeros_like(arr[-1])
    k = jnp.arange(1, n_t - arr.shape[0] + 1, dtype=arr.dtype)
    shape = (-1,) + (1,) * (arr.ndim - 1)
    tail = arr[-1][None] + k.reshape(shape) * slope[None]
    return jnp.concatenate([jnp.asarray(arr), tail], axis=0)


def stack_domains(doms: Sequence[DiffusiveDomain]) -> "DiffusiveDomain":
    """Stack B independent domains into one batched domain ([B, R, C]
    node arrays) for ``run_diffusive_batched``.

    Domains are padded to common shapes: reaches right-aligned, so extra
    columns pad on the LEFT (edge-copied geometry/tables keep every
    lookup finite; ``valid`` stays False); extra reaches duplicate the
    last real reach with ``valid`` all-False and ``ds_reach``=-1, so
    they never contribute to junction sums or the CFL max.  Time series
    pad by last-segment extrapolation (value-preserving under
    ``_interp_series``).  The scalar timesteps (dt_qlat/dt_trib/dt_db/
    dtini_given) and dtype must match across domains.

    All padding/stacking is jnp — arrays already on device (e.g. xsec
    tables built on-TPU by ``build_xsec_tables_jax``) stay there; a host
    round-trip through the tunneled TPU runtime costs minutes per 10 MB.
    """
    if not doms:
        raise ValueError("stack_domains needs at least one domain")
    d0 = doms[0]
    for d in doms[1:]:
        for f in ("dt_trib", "dt_qlat", "dtini_given", "dt_db"):
            if getattr(d, f) != getattr(d0, f):
                raise ValueError(f"domains disagree on {f}")
        if d.z.dtype != d0.z.dtype:
            raise ValueError("domains disagree on dtype")
    C = max(int(d.n_cols) for d in doms)
    R = max(int(d.n_reaches) for d in doms)
    K = max(d.up_reaches.shape[1] for d in doms)
    D = max(d.bwd_active.shape[0] for d in doms)
    n_tq = max(d.trib_q.shape[0] for d in doms)
    n_ql = max(d.qlat.shape[0] for d in doms)
    any_db = any(d.db_depth is not None for d in doms)
    n_db = max((d.db_depth.shape[1] for d in doms
                if d.db_depth is not None), default=0)
    dtype = d0.z.dtype

    def pad(d: DiffusiveDomain) -> dict:
        dC = C - int(d.n_cols)
        dR = R - int(d.n_reaches)

        def edge_rc(a, extra_axes=0):
            # [R, C, ...]: left-pad columns with the edge copy, then
            # duplicate the last reach for the row pad
            w = ((0, dR), (dC, 0)) + ((0, 0),) * extra_axes
            return jnp.pad(jnp.asarray(a), w, mode="edge")

        def pad_r(a, fill, axis=0):
            w = [(0, 0)] * a.ndim
            w[axis] = (0, dR)
            return jnp.pad(jnp.asarray(a), w, constant_values=fill)

        valid = jnp.pad(jnp.asarray(d.valid), ((0, dR), (dC, 0)),
                        constant_values=False)
        xsec = edge_rc(d.xsec, extra_axes=2)
        if d.db_depth is not None:
            db = jnp.asarray(d.db_depth, dtype)
            db = jnp.pad(db, ((0, dR), (0, n_db - db.shape[1])),
                         mode="edge")
        elif any_db:
            db = jnp.full((R, n_db), jnp.nan, dtype)
        else:
            db = None
        qlat = _extend_series(jnp.asarray(d.qlat), n_ql)
        qlat = jnp.pad(qlat, ((0, 0), (0, dR), (dC, 0)), mode="edge")
        return dict(
            z=edge_rc(d.z), dx=edge_rc(d.dx),
            ncomp=pad_r(jnp.asarray(d.ncomp), 1),
            head_col=jnp.pad(jnp.asarray(d.head_col) + dC, (0, dR),
                             constant_values=C - 1),
            valid=valid, xsec=xsec,
            ds_reach=pad_r(jnp.asarray(d.ds_reach), -1),
            up_reaches=jnp.pad(jnp.asarray(d.up_reaches),
                               ((0, dR), (0, K - d.up_reaches.shape[1])),
                               constant_values=-1),
            bwd_active=jnp.pad(jnp.asarray(d.bwd_active),
                               ((0, D - d.bwd_active.shape[0]), (0, dR)),
                               constant_values=False),
            bwd_col=jnp.pad(jnp.asarray(d.bwd_col) + dC,
                            ((0, D - d.bwd_col.shape[0]), (0, dR)),
                            constant_values=C - 1),
            trib_q=pad_r(_extend_series(jnp.asarray(d.trib_q), n_tq),
                         0.0, axis=1),
            qlat=qlat, db_depth=db,
            xsec_min=xsec.min(axis=-1),
        )

    padded = [pad(d) for d in doms]

    def stk(key, out_dtype=None):
        if padded[0][key] is None:
            return None
        a = jnp.stack([p[key] for p in padded])
        return a.astype(out_dtype if out_dtype is not None else dtype)

    out = DiffusiveDomain(
        z=stk("z"), dx=stk("dx"),
        ncomp=stk("ncomp", jnp.int32), head_col=stk("head_col", jnp.int32),
        valid=stk("valid", bool), xsec=stk("xsec"),
        ds_reach=stk("ds_reach", jnp.int32),
        up_reaches=stk("up_reaches", jnp.int32),
        bwd_active=stk("bwd_active", bool), bwd_col=stk("bwd_col", jnp.int32),
        trib_q=stk("trib_q"), dt_trib=d0.dt_trib,
        qlat=stk("qlat"), dt_qlat=d0.dt_qlat,
        dtini_given=d0.dtini_given,
        db_depth=stk("db_depth"), dt_db=d0.dt_db,
        xsec_min=stk("xsec_min"),
    )
    if any(d.utab is not None for d in doms):
        # uniform tables are re-derived post-stack (padding a resampled
        # grid would shift its lo/step; re-resampling is exact and cheap)
        from troute_tpu.diffusive.solver import attach_uniform_tables
        nel_u = max(d.utab.shape[-1] for d in doms if d.utab is not None)
        out = attach_uniform_tables(out, nel_u=nel_u)
    return out


def stack_states(sts, doms: Sequence[DiffusiveDomain], C: int, R: int):
    """Stack per-domain DiffusiveStates to match ``stack_domains``
    padding (edge-copied values at padded nodes are never read back
    through the ``valid`` mask)."""
    from troute_tpu.diffusive.solver import DiffusiveState

    def pad_state(s, d):
        dC = C - int(d.n_cols)
        dR = R - int(d.n_reaches)

        def e(a):
            return jnp.pad(jnp.asarray(a), ((0, dR), (dC, 0)), mode="edge")

        return dict(q=e(s.q), y=e(s.y), qpx=e(s.qpx), celerity=e(s.celerity),
                    diffusivity=e(s.diffusivity), t=jnp.asarray(s.t))

    ps = [pad_state(s, d) for s, d in zip(sts, doms)]
    dtype = sts[0].q.dtype
    return DiffusiveState(
        q=jnp.stack([p["q"] for p in ps]).astype(dtype),
        y=jnp.stack([p["y"] for p in ps]).astype(dtype),
        qpx=jnp.stack([p["qpx"] for p in ps]).astype(dtype),
        celerity=jnp.stack([p["celerity"] for p in ps]).astype(dtype),
        diffusivity=jnp.stack(
            [p["diffusivity"] for p in ps]).astype(dtype),
        t=jnp.stack([p["t"] for p in ps]).astype(dtype),
    )
