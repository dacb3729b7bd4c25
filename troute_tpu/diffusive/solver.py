"""Batched Crank-Nicolson diffusive-wave solver (JAX).

Reproduces the reference's Tulane diffusive core
(``kernel/diffusive/diffusive.f90:diffnw``, ``:75-940``) as fused vector
steps over ALL mainstem reaches at once, in a padded ``[R, C]`` layout:

* reaches are **right-aligned**: node i of a reach with ``ncomp`` nodes
  lives at column ``C - ncomp + i``.  This makes both the forward
  elimination (predictor) and the downstream-up substitution start at a
  uniform column for every reach, so the per-reach sequential recurrences
  become lane-parallel scans over the node axis.
* the predictor (``mesh_diffusive_forward``) is *fully reach-parallel*: the
  eei/ffi/exi/fxi double sweep never reads the current-step upstream
  inflow — junction hand-off only overwrites the head-node discharge after
  the sweep, so one vector pass handles the whole domain with a gather for
  junction inflows.
* the corrector (``mesh_diffusive_backward``) chains water-surface
  elevations downstream-to-upstream through junctions, which is a wavefront
  over the *reach tree* (typically a handful of levels for NWM mainstems):
  a masked scan over reverse levels, each level solving all its reaches'
  node chains with a vectorized Newton/bisection (``rtsafe``) per node.
* adaptive internal timestep from the global CFL bound
  (``calculateDT``), driven host-side (the step returns max celerity/dx).

Double precision, like the reference solver.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# solver parameters (reference defaults, diffusive_utils_v02.py:742-753)
CFL = 0.95
C_LLM = 0.5
D_LLM = 10.0
D_ULM = 10000.0
Q_LLM = 0.02831
SO_LLM = 0.0001
THETA = 1.0
DTINI_DIVISOR = 10.0

COL_ELEV, COL_AREA, COL_PERI, COL_RADI, COL_CONV, COL_TOPW = 0, 1, 2, 3, 4, 5
COL_I1, COL_DPDA, COL_DKDA, COL_UNIFORM, COL_SKK = 6, 7, 8, 9, 10

# columns of the resampled uniform-elevation-grid table (``utab``) — the
# ones the jacobi corrector fetches per Newton iteration / hydraulics pass
UCOL_CONV, UCOL_DKDA, UCOL_TOPW, UCOL_SKK = 0, 1, 2, 3
NEL_UNIFORM = 128

# predictor form: "assoc" (associative scans, O(log C) depth — default)
# or "seq" (C-step sequential scans, the direct reference vectorization)
_PREDICTOR_MODE = os.environ.get("TROUTE_DIFF_PREDICTOR", "assoc")


class DiffusiveDomain(NamedTuple):
    """Static domain arrays (device).  [R, C] node arrays right-aligned."""

    z: jax.Array            # bed elevation (notch-adjusted datum)
    dx: jax.Array           # [R, C] dx[i] = length node i -> i+1 (pad 1.0)
    ncomp: jax.Array        # int32 [R]
    head_col: jax.Array     # int32 [R] = C - ncomp
    valid: jax.Array        # bool [R, C]
    xsec: jax.Array         # [R, C, 11, nel]
    ds_reach: jax.Array     # int32 [R] downstream mainstem reach (-1 = TW)
    up_reaches: jax.Array   # int32 [R, K] upstream mainstem reaches (-1 pad)
    # corrector node schedule: at global step k, reach r (where active)
    # processes node column col[k, r] — one node per reach per step, ordered
    # so every node runs after its downstream dependency (including the
    # junction hand-up from the downstream reach's head node)
    bwd_active: jax.Array   # bool [D, R]
    bwd_col: jax.Array      # int32 [D, R]
    trib_q: jax.Array       # [n_tq, R] tributary inflow series per reach head
    dt_trib: float          # tributary series timestep (s)
    qlat: jax.Array         # [n_ql, R, C] lateral inflow series
    dt_qlat: float          # qlat series timestep (s)
    dtini_given: float      # routing dt (s)
    # coastal downstream boundary (dsbc_option == 1, diffusive.f90:537-549,
    # 719-728): observed water-depth series at tailwater bottom nodes.
    # None -> normal-depth boundary everywhere (dsbc_option == 2); NaN rows
    # fall back to normal depth per-reach (the reference refuses option 1
    # when the series has gaps, diffusive_utils_v02.py:642)
    db_depth: jax.Array | None = None   # [R, n_db] depth (m), NaN = no data
    dt_db: float = 3600.0               # boundary series timestep (s)
    # [R, C, 11] per-column table minima: the reference's r_interpol
    # (diffusive.f90:2581-2585) returns min(y) for below-range lookups —
    # hit at perched junctions where a reach bottom sits above the
    # downstream head's surface.  None -> computed on the fly.
    xsec_min: jax.Array | None = None
    # Uniform-elevation-grid resampled table (``attach_uniform_tables``):
    # the jacobi corrector's per-Newton-iteration fetches become pure
    # index arithmetic + short one-hot passes over nel_u entries instead
    # of searches + passes over the 501-entry non-uniform grid — the
    # memory traffic that bounds diffusive throughput on TPU (per-lane
    # gathers being poison, one-hot passes are the only fetch).  None ->
    # exact 501-entry lookups everywhere (reference parity mode).
    utab: jax.Array | None = None        # [R, C, 4, nel_u] CONV/DKDA/TOPW/SKK
    ugrid_lo: jax.Array | None = None    # [R, C] grid bottom elevation
    # [R, C] sqrt-space spacing: knot k sits at lo + (k*step)^2
    # (_ugrid_bracket) — fine near the bed where the curves bend, coarse
    # in the floodplain where they are near-linear
    ugrid_step: jax.Array | None = None
    utab_min: jax.Array | None = None    # [R, C, 4] below-range values

    @property
    def n_reaches(self):
        return self.z.shape[0]

    @property
    def n_cols(self):
        return self.z.shape[1]


class DiffusiveState(NamedTuple):
    q: jax.Array            # [R, C] discharge
    y: jax.Array            # [R, C] water-surface elevation
    qpx: jax.Array          # [R, C] dQ/dx term
    celerity: jax.Array     # [R, C]
    diffusivity: jax.Array  # [R, C]
    t: jax.Array            # model time (s since t0)


def _interp_series(series, dt_series, t, start_offset=0.0):
    """Linear interpolation of a [n_t, ...] series at time t (seconds),
    with first/last-segment linear extrapolation out of range like the
    reference's ``intp_y`` (diffusive.f90:2671-2699) — the tributary
    series is genuinely read one dt past its end on the final step
    (``tf0 = t + dtini``, :677)."""
    n = series.shape[0]
    pos = (t - start_offset) / dt_series
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    w = pos - i0
    return series[i0] * (1.0 - w) + series[i0 + 1] * w



def _fetch_last(arr, idx):
    """``arr[..., nel]`` fetched at per-lane index ``idx[...]``.

    On TPU the per-lane dynamic gather lowers poorly (slow, and large
    domains crash the tunneled worker); a one-hot masked reduction is a
    fused full-column sweep instead, and bit-exact (exactly one nonzero
    term per lane).  CPU keeps the native gather.
    """
    if jax.default_backend() == "cpu":
        return jnp.take_along_axis(arr, idx[..., None], -1)[..., 0]
    k = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
    sel = k == idx[..., None]
    return jnp.where(sel, arr, jnp.zeros_like(arr)).sum(-1)


def _ugrid_bracket(lo, step, x, nel_u):
    """Bracket (idx, w) on the sqrt-STRETCHED grid, pure arithmetic.

    Knots sit at el_k = lo + (k*step)^2 — uniform in sqrt(el - lo) — so
    the spacing grows linearly with depth: the operating region (a few
    metres above the bed) gets 8-16x finer sampling than a plain uniform
    grid over the full 2*hbf*timesDepth elevation range, where the
    conveyance/topwidth curves have all their curvature (error scales
    with local-spacing^2).  The index is floor(sqrt(x - lo)/step); the
    weight is linear IN ELEVATION between the bracketing knots, like
    ``r_interpol``.
    """
    pos = jnp.sqrt(jnp.maximum(x - lo, 0.0)) / step
    idx = jnp.clip(jnp.floor(pos), 0, nel_u - 2).astype(jnp.int32)
    fidx = idx.astype(x.dtype)
    e1 = lo + (fidx * step) ** 2
    e2 = lo + ((fidx + 1.0) * step) ** 2
    w = (x - e1) / jnp.maximum(e2 - e1, 1e-30)
    return idx, w


def _uinterp(utab, lo, step, x, cols, umin):
    """Stretched-grid linear interpolation with r_interpol edge semantics.

    ``utab`` [..., n_ucols, nel_u] node tables resampled at the
    sqrt-stretched knots (see ``_ugrid_bracket``); ``lo``/``step``/``x``
    [...]; ``cols`` the UCOL_* indices to fetch.  The bracket index is
    pure arithmetic (no search) and the two bracket reads collapse into
    ONE weighted one-hot pass per column: sel = (k==idx)·(1-w) +
    (k==idx+1)·w sums to the interpolated value, and above-range lanes
    (w > 1 at idx = nel_u-2) extrapolate along the last segment exactly
    like the reference ``r_interpol`` (diffusive.f90:2553-2594).
    Below-range lanes return the column minimum, also per r_interpol.
    """
    nel_u = utab.shape[-1]
    idx, w = _ugrid_bracket(lo, step, x, nel_u)
    k = jax.lax.broadcasted_iota(jnp.int32, x.shape + (nel_u,), x.ndim)
    sel = jnp.where(k == idx[..., None], 1.0 - w[..., None], 0.0) \
        + jnp.where(k == idx[..., None] + 1, w[..., None], 0.0)
    below = x < lo
    out = []
    for c in cols:
        v = (sel * utab[..., c, :]).sum(-1)
        out.append(jnp.where(below, umin[..., c], v))
    return out


_UCOLS_SRC = (COL_CONV, COL_DKDA, COL_TOPW, COL_SKK)


@functools.partial(jax.jit, static_argnames=("nel_u_",))
def _resample_uniform(tab, nel_u_):
    """One chunk of ``attach_uniform_tables``: resample the hot columns
    of [r, C, n_cols, nel] exact tables onto sqrt-stretched uniform
    grids.  Module-level jit: a per-call closure would recompile on
    every ``build_domain`` (measured 0.34 s/call on the Laura domain)."""
    cols = _UCOLS_SRC
    el = tab[:, :, COL_ELEV, :]                      # [r, C, nel]
    nel = el.shape[-1]
    lo = el[..., 0]
    hi = el[..., -1]
    # sqrt-stretched knots: el_k = lo + (k*step)^2 (see _ugrid_bracket)
    step = jnp.sqrt(hi - lo) / (nel_u_ - 1)
    tgt = lo[..., None] + (step[..., None]
                           * jnp.arange(nel_u_, dtype=tab.dtype)) ** 2
    # exact bracket on the original (sorted) grid: compare-all, then
    # one-hot fetches XLA fuses (no [.., nel_u, nel] materialization;
    # per-lane gathers are poison off-CPU)
    idx = jnp.clip(
        (el[..., None, :] <= tgt[..., None]).sum(-1) - 1,
        0, nel - 2)                                  # [r, C, nel_u]

    def fetch(v, i):
        if jax.default_backend() == "cpu":
            return jnp.take_along_axis(v, i, -1)
        k = jax.lax.broadcasted_iota(jnp.int32, i.shape + (nel,),
                                     i.ndim)
        return jnp.where(k == i[..., None], v[..., None, :],
                         0.0).sum(-1)

    idx2 = jnp.minimum(idx + 1, nel - 1)
    g1 = fetch(el, idx)
    g2 = fetch(el, idx2)
    w = (tgt - g1) / jnp.where(g2 != g1, g2 - g1, 1.0)
    outs = []
    for c in cols:
        v = tab[:, :, c, :]
        v1 = fetch(v, idx)
        v2 = fetch(v, idx2)
        outs.append(v1 + (v2 - v1) * w)
    ut = jnp.stack(outs, axis=-2)                    # [r, C, 4, nel_u]
    umin = jnp.stack([tab[:, :, c, :].min(-1) for c in cols], -1)
    return ut, lo, step, umin


def attach_uniform_tables(dom: DiffusiveDomain,
                          nel_u: int = NEL_UNIFORM,
                          chunk: int = 256) -> DiffusiveDomain:
    """Resample the hot table columns onto per-node uniform elevation
    grids (device-side, chunked over reaches so no [.., nel_u, nel]
    broadcast ever exceeds a few hundred MB).

    The resampled table is a piecewise-linear re-sampling of the original
    piecewise-linear table: the only error is grid resolution (measured
    accuracy study in ``tests/test_diffusive_uniform.py`` / docs).  The
    grid spans the original table's full elevation range.
    """
    xs = dom.xsec
    batched = xs.ndim == 5
    if batched:
        B, R, C = xs.shape[:3]
        xs2 = xs.reshape(B * R, *xs.shape[2:])
    else:
        R, C = xs.shape[:2]
        xs2 = xs
    n_rows = xs2.shape[0]
    dtype = xs.dtype

    if jax.default_backend() != "cpu":
        chunk = min(chunk, 64)
    uts, los, steps, umins = [], [], [], []
    for s in range(0, n_rows, chunk):
        t, lo, st, um = _resample_uniform(xs2[s:s + chunk], int(nel_u))
        uts.append(t)
        los.append(lo)
        steps.append(st)
        umins.append(um)
    utab = jnp.concatenate(uts).astype(dtype)
    lo = jnp.concatenate(los).astype(dtype)
    step = jnp.concatenate(steps).astype(dtype)
    umin = jnp.concatenate(umins).astype(dtype)
    if batched:
        utab = utab.reshape(B, R, C, len(_UCOLS_SRC), nel_u)
        lo = lo.reshape(B, R, C)
        step = step.reshape(B, R, C)
        umin = umin.reshape(B, R, C, len(_UCOLS_SRC))
    return dom._replace(utab=utab, ugrid_lo=lo, ugrid_step=step,
                        utab_min=umin)


def _table_interp(xsec, xcol, ycol, x):
    """Linear table interpolation per node: xsec [R, C, 11, nel], x [R, C]."""
    xarr = xsec[:, :, xcol, :]
    yarr = xsec[:, :, ycol, :]
    idx = jnp.sum(xarr <= x[..., None], axis=-1) - 1
    idx = jnp.clip(idx, 0, xarr.shape[-1] - 2)
    x1 = _fetch_last(xarr, idx)
    x2 = _fetch_last(xarr, idx + 1)
    y1 = _fetch_last(yarr, idx)
    y2 = _fetch_last(yarr, idx + 1)
    denom = jnp.where(x2 != x1, x2 - x1, 1.0)
    return y1 + (y2 - y1) * (x - x1) / denom


def _table_interp_sq_depth(xsec, ycol, z, y_elev):
    """Conveyance-style interpolation against squared depth
    (reference ``mesh_diffusive_backward``, diffusive.f90:1437-1443)."""
    el = xsec[:, :, COL_ELEV, :]
    yarr = xsec[:, :, ycol, :]
    xarr = (el - z[..., None]) ** 2
    x = (y_elev - z) ** 2
    idx = jnp.sum(xarr <= x[..., None], axis=-1) - 1
    idx = jnp.clip(idx, 0, xarr.shape[-1] - 2)
    x1 = _fetch_last(xarr, idx)
    x2 = _fetch_last(xarr, idx + 1)
    y1 = _fetch_last(yarr, idx)
    y2 = _fetch_last(yarr, idx + 1)
    denom = jnp.where(x2 != x1, x2 - x1, 1.0)
    return y1 + (y2 - y1) * (x - x1) / denom


def _hermite_coeffs(cour2, dxm):
    a1 = 3.0 * cour2 ** 2 - 2.0 * cour2 ** 3
    a2 = 1.0 - a1
    a3 = (cour2 ** 2 - cour2 ** 3) * dxm
    a4 = (-cour2 + 2.0 * cour2 ** 2 - cour2 ** 3) * dxm
    b1 = (6.0 * cour2 - 6.0 * cour2 ** 2) / (-dxm)
    b2 = -b1
    b3 = -(2.0 * cour2 - 3.0 * cour2 ** 2)
    b4 = -(-1.0 + 4.0 * cour2 - 3.0 * cour2 ** 2)
    dd1 = (6.0 - 12.0 * cour2) / dxm ** 2
    dd2 = -dd1
    dd3 = (2.0 - 6.0 * cour2) / dxm
    dd4 = (4.0 - 6.0 * cour2) / dxm
    h1 = 12.0 / dxm ** 3
    h2 = -h1
    h3 = 6.0 / dxm ** 2
    h4 = h3
    return (a1, a2, a3, a4), (b1, b2, b3, b4), (dd1, dd2, dd3, dd4), \
        (h1, h2, h3, h4)


def _forward_elim_coeffs(dom: DiffusiveDomain, st: DiffusiveState, dtini):
    """All CN-Hermite forward-elimination row coefficients in ONE fused
    [R, C-1] pass (slot j holds node column i = j+1) — ``row()`` of the
    sequential predictor vectorized over the node axis.  Same formulas as
    the reference per-node loop (diffusive.f90:1164-1231)."""
    oldQ, qpx = st.q, st.qpx
    dxm = dom.dx[:, :-1]
    cour = dtini / dxm
    cour2 = jnp.abs(st.celerity[:, 1:]) * cour
    A, B, D, H = _hermite_coeffs(cour2, dxm)
    alpha = dom.dx[:, 1:] / dxm
    alpha = alpha.at[:, -1].set(1.0)          # i == C-1 rule
    qL, qR = oldQ[:, :-1], oldQ[:, 1:]
    pL, pR = qpx[:, :-1], qpx[:, 1:]
    qy = A[0] * qL + A[1] * qR + A[2] * pL + A[3] * pR
    qxy = B[0] * qL + B[1] * qR + B[2] * pL + B[3] * pR
    qxxy = D[0] * qL + D[1] * qR + D[2] * pL + D[3] * pR
    qxxxy = H[0] * qL + H[1] * qR + H[2] * pL + H[3] * pR
    dif = st.diffusivity[:, 1:]
    ppi = -THETA * dif * dtini / dxm ** 2 \
        * 2.0 / (alpha * (alpha + 1.0)) * alpha
    qqi = 1.0 - ppi * (alpha + 1.0) / alpha
    rri = ppi / alpha
    ssi = qy + dtini * dif * (1.0 - THETA) * qxxy
    sxi = qxy + dtini * dif * (1.0 - THETA) * qxxxy
    return ppi, qqi, rri, ssi, sxi


def _linear_scan(a, b, init, reverse=False):
    """Cumulative first-order linear recurrence along axis 1.

    Forward (default): ``v_j = a_j * v_{j-1} + b_j`` with ``v`` before
    slot 0 equal to ``init``; reverse: ``v_j = a_j * v_{j+1} + b_j`` with
    ``v`` past the last slot equal to ``init``.  O(log C) depth via
    ``associative_scan`` of the transform pairs (a, b)."""
    def combine(x, y):
        xa, xb = x
        ya, yb = y
        return ya * xa, ya * xb + yb

    ca, cb = jax.lax.associative_scan(combine, (a, b), axis=1,
                                      reverse=reverse)
    init = jnp.asarray(init)
    if init.ndim == 1:
        init = init[:, None]
    return ca * init + cb


def _forward_elim_assoc(dom: DiffusiveDomain, st: DiffusiveState, dtini):
    """eei/ffi/exi/fxi [R, C] via associative scans: O(log C) depth
    instead of C sequential rows.  Exactly the sequential recurrences
    re-associated (rounding differs at ~eps — see
    tests/test_diffusive_predictor.py).

    The eei/exi recurrences are Möbius maps
    ``v_i = -rri_i / (ppi_i v_{i-1} + qqi_i)`` — composed as homogeneous
    2x2 transforms on (num, den), normalized per compose so f32 products
    never overflow (the map is projective; scale cancels in num/den).
    Each row holds ONE right-aligned reach, so there is at most one head
    reset per row (a constant map) and everything left of it is padding.
    Given eei/exi, the denominators are elementwise and the ffi/fxi and
    backward-substitution recurrences become first-order linear scans.
    """
    R, C = dom.n_reaches, dom.n_cols
    dtype = st.q.dtype
    ppi, qqi, rri, ssi, sxi = _forward_elim_coeffs(dom, st, dtini)
    cols = jnp.arange(1, C)[None, :]
    is_head = dom.head_col[:, None] == cols
    # Padding columns (left of the head) MUST be identity transforms:
    # their coefficients are garbage (state pads are never consumed and
    # drift across steps), and although the head reset is a constant map,
    # composing it with an inf pad entry yields 0*inf = NaN which
    # contaminates the whole cumulative product.  The sequential scan
    # tolerates pad garbage because where() discards it at the head; the
    # associative form has to neutralize it before composing.
    is_pad = cols < dom.head_col[:, None]

    zero = jnp.zeros_like(ppi)
    one = jnp.ones_like(ppi)

    def mobius_vals(init_val):
        elems = (jnp.where(is_pad, one, zero),
                 jnp.where(is_pad | is_head,
                           jnp.where(is_pad, zero, init_val), -rri),
                 jnp.where(is_pad | is_head, zero, ppi),
                 jnp.where(is_pad | is_head, one, qqi))

        def combine(a, b):
            a00, a01, a10, a11 = a
            b00, b01, b10, b11 = b
            c00 = b00 * a00 + b01 * a10
            c01 = b00 * a01 + b01 * a11
            c10 = b10 * a00 + b11 * a10
            c11 = b10 * a01 + b11 * a11
            s = jnp.maximum(jnp.maximum(jnp.abs(c00), jnp.abs(c01)),
                            jnp.maximum(jnp.abs(c10), jnp.abs(c11)))
            s = jnp.where(s > 0.0, s, 1.0)
            return c00 / s, c01 / s, c10 / s, c11 / s

        c00, c01, c10, c11 = jax.lax.associative_scan(combine, elems,
                                                      axis=1)
        num = c00 * init_val + c01
        den = c10 * init_val + c11
        den = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
        return num / den

    eei_v = mobius_vals(1.0)
    exi_v = mobius_vals(0.0)

    ones_col = jnp.ones((R, 1), dtype)
    zeros_col = jnp.zeros((R, 1), dtype)
    eei_prev = jnp.concatenate([ones_col, eei_v[:, :-1]], axis=1)
    exi_prev = jnp.concatenate([zeros_col, exi_v[:, :-1]], axis=1)
    den1 = ppi * eei_prev + qqi
    den2 = ppi * exi_prev + qqi
    den1 = jnp.where(jnp.abs(den1) > 1e-30, den1, 1e-30)
    den2 = jnp.where(jnp.abs(den2) > 1e-30, den2, 1e-30)
    # pads: constant-0 maps (bounded; the head reset already isolates
    # valid columns — pads just must never contribute inf to a compose)
    dead = is_pad | is_head
    af = jnp.where(dead, zero, -ppi / den1)
    bf = jnp.where(dead, zero, ssi / den1)
    ax = jnp.where(dead, zero, -ppi / den2)
    bx = jnp.where(dead, zero, sxi / den2)
    ffi_v = _linear_scan(af, bf, jnp.zeros((R,), dtype))
    fxi_v = _linear_scan(ax, bx, jnp.zeros((R,), dtype))

    eei = jnp.concatenate([ones_col, eei_v], axis=1)
    ffi = jnp.concatenate([zeros_col, ffi_v], axis=1)
    exi = jnp.concatenate([zeros_col, exi_v], axis=1)
    fxi = jnp.concatenate([zeros_col, fxi_v], axis=1)
    return eei, ffi, exi, fxi


def predictor_seq(dom: DiffusiveDomain, st: DiffusiveState, dtini, t):
    """One forward (discharge) step for all reaches; returns qp, qpx_new.

    Sequential-scan form (C-step forward elimination + C-step backward
    substitution) — the direct vectorization of the reference per-node
    loops, kept as the executable spec the associative form is tested
    against."""
    R, C = dom.n_reaches, dom.n_cols
    oldQ, qpx = st.q, st.qpx

    def row(i, prev):
        """CN-Hermite forward-elimination row at node column i (all reaches).

        prev = (eei, ffi, exi, fxi) at column i-1.
        """
        dxm = dom.dx[:, i - 1]
        cour = dtini / dxm
        cour2 = jnp.abs(st.celerity[:, i]) * cour
        A, B, D, H = _hermite_coeffs(cour2, dxm)
        alpha = jnp.where(i == C - 1, 1.0, dom.dx[:, i] / dxm)

        qy = A[0] * oldQ[:, i - 1] + A[1] * oldQ[:, i] \
            + A[2] * qpx[:, i - 1] + A[3] * qpx[:, i]
        qxy = B[0] * oldQ[:, i - 1] + B[1] * oldQ[:, i] \
            + B[2] * qpx[:, i - 1] + B[3] * qpx[:, i]
        qxxy = D[0] * oldQ[:, i - 1] + D[1] * oldQ[:, i] \
            + D[2] * qpx[:, i - 1] + D[3] * qpx[:, i]
        qxxxy = H[0] * oldQ[:, i - 1] + H[1] * oldQ[:, i] \
            + H[2] * qpx[:, i - 1] + H[3] * qpx[:, i]

        ppi = -THETA * st.diffusivity[:, i] * dtini / dxm ** 2 \
            * 2.0 / (alpha * (alpha + 1.0)) * alpha
        qqi = 1.0 - ppi * (alpha + 1.0) / alpha
        rri = ppi / alpha
        ssi = qy + dtini * st.diffusivity[:, i] * (1.0 - THETA) * qxxy
        sxi = qxy + dtini * st.diffusivity[:, i] * (1.0 - THETA) * qxxxy

        eei_p, ffi_p, exi_p, fxi_p = prev
        den1 = ppi * eei_p + qqi
        den2 = ppi * exi_p + qqi
        den1 = jnp.where(jnp.abs(den1) > 1e-30, den1, 1e-30)
        den2 = jnp.where(jnp.abs(den2) > 1e-30, den2, 1e-30)
        eei = -rri / den1
        ffi = (ssi - ppi * ffi_p) / den1
        exi = -rri / den2
        fxi = (sxi - ppi * fxi_p) / den2
        return eei, ffi, exi, fxi, (ssi, sxi)

    def scan_fwd(carry, i):
        eei_p, ffi_p, exi_p, fxi_p = carry
        eei, ffi, exi, fxi, _ = row(i, (eei_p, ffi_p, exi_p, fxi_p))
        # at each reach's head column the recurrence (re)initializes
        is_head = dom.head_col == i
        eei = jnp.where(is_head, 1.0, eei)
        ffi = jnp.where(is_head, 0.0, ffi)
        exi = jnp.where(is_head, 0.0, exi)
        fxi = jnp.where(is_head, 0.0, fxi)
        new = (eei, ffi, exi, fxi)
        return new, new

    ones = jnp.ones((R,), oldQ.dtype)
    zeros = jnp.zeros((R,), oldQ.dtype)
    init = (ones, zeros, zeros, zeros)
    # unrolled: C is ~16; per-iteration TPU loop overhead on tiny [R]
    # rows otherwise dominates the (trivial) row arithmetic
    _, rows = jax.lax.scan(scan_fwd, init, jnp.arange(1, C), unroll=True)
    # assemble [R, C]: column 0 rows are the init values
    eei = jnp.concatenate([ones[:, None], rows[0].T], axis=1)
    ffi = jnp.concatenate([zeros[:, None], rows[1].T], axis=1)
    exi = jnp.concatenate([zeros[:, None], rows[2].T], axis=1)
    fxi = jnp.concatenate([zeros[:, None], rows[3].T], axis=1)
    # reaches whose head is column 0 need init there (already ones/zeros)
    return _predictor_tail(dom, st, dtini, t, eei, ffi, exi, fxi,
                           assoc=False)


def _predictor_tail(dom: DiffusiveDomain, st: DiffusiveState, dtini, t,
                    eei, ffi, exi, fxi, assoc: bool):
    """Ghost-node row, backward substitution, and junction hand-off —
    shared by the sequential and associative predictor forms."""
    R, C = dom.n_reaches, dom.n_cols
    oldQ, qpx = st.q, st.qpx

    # ghost-node row beyond the last column (reference :1233-1283)
    i = C - 1
    dxm = dom.dx[:, i - 1]
    cour = dtini / dxm
    cour2 = jnp.abs(st.celerity[:, i - 1]) * cour
    A, B, D, H = _hermite_coeffs(cour2, dxm)
    qy = A[0] * oldQ[:, i] + A[1] * oldQ[:, i - 1] \
        + A[2] * qpx[:, i] + A[3] * qpx[:, i - 1]
    qxy = B[0] * oldQ[:, i] + B[1] * oldQ[:, i - 1] \
        + B[2] * qpx[:, i] + B[3] * qpx[:, i - 1]
    qxxy = D[0] * oldQ[:, i] + D[1] * oldQ[:, i - 1] \
        + D[2] * qpx[:, i] + D[3] * qpx[:, i - 1]
    qxxxy = H[0] * oldQ[:, i] + H[1] * oldQ[:, i - 1] \
        + H[2] * qpx[:, i] + H[3] * qpx[:, i - 1]
    ppi = -THETA * st.diffusivity[:, i] * dtini / dxm ** 2 * 2.0 / 2.0
    qqi = 1.0 - ppi * 2.0
    rri = ppi
    ssi = qy + dtini * st.diffusivity[:, i - 1] * (1.0 - THETA) * qxxy
    sxi = qxy + dtini * st.diffusivity[:, i - 1] * (1.0 - THETA) * qxxxy
    den1 = ppi * eei[:, i] + qqi
    den2 = ppi * exi[:, i] + qqi
    den1 = jnp.where(jnp.abs(den1) > 1e-30, den1, 1e-30)
    den2 = jnp.where(jnp.abs(den2) > 1e-30, den2, 1e-30)
    eei_g = -rri / den1
    ffi_g = (ssi - ppi * ffi[:, i]) / den1
    exi_g = -rri / den2
    fxi_g = (sxi - ppi * fxi[:, i]) / den2
    del eei_g, exi_g  # ghost coefficients beyond the last node are unused
    qp_ghost = oldQ[:, i - 1]
    qpx_ghost = jnp.zeros_like(qp_ghost)

    qp_last = eei[:, i] * qp_ghost + ffi[:, i]
    qpx_last = exi[:, i] * qpx_ghost + fxi[:, i]

    # backward substitution, uniform from the last column
    if assoc:
        qp_body = _linear_scan(eei[:, :C - 1], ffi[:, :C - 1], qp_last,
                               reverse=True)
        qpx_body = _linear_scan(exi[:, :C - 1], fxi[:, :C - 1], qpx_last,
                                reverse=True)
        qp = jnp.concatenate([qp_body, qp_last[:, None]], axis=1)
        qpx_new = jnp.concatenate([qpx_body, qpx_last[:, None]], axis=1)
    else:
        def scan_bwd(carry, i):
            qp_next, qpx_next = carry
            qp_i = eei[:, i] * qp_next + ffi[:, i]
            qpx_i = exi[:, i] * qpx_next + fxi[:, i]
            return (qp_i, qpx_i), (qp_i, qpx_i)

        (_, _), (qp_rows, qpx_rows) = jax.lax.scan(
            scan_bwd, (qp_last, qpx_last), jnp.arange(C - 2, -1, -1),
            unroll=True)
        qp = jnp.concatenate([qp_rows[::-1].T, qp_last[:, None]], axis=1)
        qpx_new = jnp.concatenate([qpx_rows[::-1].T, qpx_last[:, None]],
                                  axis=1)

    # junction hand-off: head-node inflow = sum of upstream mainstem bottom
    # discharges (this step) + tributary series + total reach lateral flow.
    # The reference clamps qp at q_llm before the downstream reach reads it
    # (diffusive.f90:1321-1330 runs before the next reach's :663-681), so
    # gather the clamped bottom values.
    up = dom.up_reaches
    bottoms = qp[:, C - 1]
    bottoms = jnp.where(jnp.abs(bottoms) < Q_LLM, Q_LLM, bottoms)
    q_usrch = jnp.where(up >= 0, bottoms[jnp.maximum(up, 0)], 0.0).sum(axis=1)
    tf0 = t + dtini
    q_trib = _interp_series(dom.trib_q, dom.dt_trib, tf0)
    ql_now = _interp_series(dom.qlat, dom.dt_qlat, t, start_offset=0.0)
    # sum of lateral flow over interior nodes (reference applies the whole
    # reach's qlat at the head, :1152-1168,1318-1320)
    interior = dom.valid & (jnp.arange(C)[None, :] > dom.head_col[:, None]) \
        & (jnp.arange(C)[None, :] < C - 1)
    allqlat = jnp.where(interior, ql_now * dom.dx, 0.0).sum(axis=1)
    head_ql = ql_now[jnp.arange(R), dom.head_col] \
        * dom.dx[jnp.arange(R), dom.head_col]
    new_head_q = q_usrch + q_trib + head_ql + allqlat

    qp = qp.at[jnp.arange(R), dom.head_col].set(new_head_q)
    qp = jnp.where(jnp.abs(qp) < Q_LLM, Q_LLM, qp)
    return qp, qpx_new


def predictor(dom: DiffusiveDomain, st: DiffusiveState, dtini, t):
    """One forward (discharge) step for all reaches; returns qp, qpx_new.

    Default form: the forward elimination runs as associative scans
    (O(log C) depth, all row coefficients in one fused pass) — same math
    as ``predictor_seq``, re-associated; the sequential form's 2C rows of
    tiny [R] elementwise ops are latency-bound on TPU.
    ``TROUTE_DIFF_PREDICTOR=seq`` restores the sequential-scan form."""
    if _PREDICTOR_MODE != "assoc":
        return predictor_seq(dom, st, dtini, t)
    eei, ffi, exi, fxi = _forward_elim_assoc(dom, st, dtini)
    return _predictor_tail(dom, st, dtini, t, eei, ffi, exi, fxi,
                           assoc=True)



def _vsearch_right():
    """vmapped searchsorted(side="right") with a backend-suited method:
    "scan" is fastest for the CPU wavefront's few active lanes, but on
    TPU it lowers to an nel-step sequential loop per Newton iteration —
    "compare_all" is one fused vector compare+sum.  The computed index is
    exact either way (bit-identical downstream)."""
    method = "scan" if jax.default_backend() == "cpu" else "compare_all"
    return jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right", method=method))


def _rtsafe_vec(xsec, rr, cur_col, ds_col, y_ds_elev, q_cur, q_ds, z_cur,
                z_ds, dx_cur, y_old_depth, active=None, grids=None,
                ugrids=None, y_norm=None):
    """Vectorized Newton/bisection depth solve
    (reference ``rtsafe``/``funcd_diffdepth``, diffusive.f90:1568-1711).

    ``y_norm`` (optional [lanes] normal DEPTH) skips the exact-table
    uniform-flow lookup: it depends only on ``q_cur``, which is constant
    across a substep's fixed-point sweeps, so the jacobi correctors hoist
    it out of the sweep loop (one [P, nel] pass per substep instead of
    one per column per sweep).

    ``xsec`` is the full [R, C, 11, nel] table; ``cur_col``/``ds_col`` are
    per-reach node columns.  Only [R, nel] elevation/uniform-flow grids are
    materialized; the other columns are fetched pointwise at the searched
    bracket — the per-step memory traffic is what bounds the corrector's
    sequential node scan, so full-table gathers are avoided.

    ``active`` (bool [R], optional) marks lanes whose result is consumed;
    inactive lanes start converged so the early-exit while loop is paced
    by real work only (the node wavefront typically has 1-3 active
    reaches per step).

    ``ugrids`` (uniform-table fast path, see ``attach_uniform_tables``):
    (lo_cur, step_cur, utab_cur [P, 4, nel_u], umin_cur [P, 4], lo_ds,
    step_ds, uconv_ds [P, nel_u], uconv_min_ds [P]) — the per-Newton-
    iteration conveyance/dKdA/topwidth fetches become index arithmetic +
    nel_u-length one-hot passes instead of 501-entry searches; only the
    once-per-solve normal-depth lookup still reads the exact table.
    """

    vsearch = _vsearch_right()

    # columns fetched per Newton iteration: with extended ``grids`` (the
    # jacobi caller) the [P, nel] column rows are materialized ONCE per
    # substep and bracket values become fused one-hot reads — per-lane
    # 4-D advanced-index gathers per iteration are very slow on TPU
    col_grid = {}
    if grids is not None:
        col_grid[(0, COL_ELEV)] = grids[0]
        if len(grids) > 3:
            col_grid.update({(0, COL_CONV): grids[3],
                             (0, COL_DKDA): grids[4],
                             (0, COL_TOPW): grids[5],
                             (1, COL_CONV): grids[6]})

    def pt(which, col_of, c, idx):
        """(y1, y2) bracket values of table column c at grid idx;
        ``which``: 0 = current node, 1 = downstream node."""
        g = col_grid.get((which, c))
        if g is not None:
            return (_fetch_last(g, idx),
                    _fetch_last(g, jnp.minimum(idx + 1, g.shape[-1] - 1)))
        return (xsec[rr, col_of, c, idx],
                xsec[rr, col_of, c, jnp.minimum(idx + 1, xsec.shape[-1] - 1)])

    def tab(which, col_of, grid, ycol, x):
        """O(log nel) interpolation of column ``ycol`` against ``grid``."""
        idx = jnp.clip(vsearch(grid, x) - 1, 0, grid.shape[-1] - 2)
        x1 = _fetch_last(grid, idx)
        x2 = _fetch_last(grid, idx + 1)
        y1, y2 = pt(which, col_of, ycol, idx)
        den = jnp.where(x2 != x1, x2 - x1, 1.0)
        return y1 + (y2 - y1) * (x - x1) / den

    y_ds = jnp.maximum(y_ds_elev - z_ds, 0.005)
    slope = jnp.maximum((z_cur - z_ds) / dx_cur, SO_LLM)

    if ugrids is not None:
        (ulo, ustep, ucur, umin_cur, ulo_ds, ustep_ds, uconv_ds,
         uconv_min_ds) = ugrids
        conv_ds = _uinterp(uconv_ds[:, None, :], ulo_ds, ustep_ds,
                           y_ds + z_ds, (0,), uconv_min_ds[:, None])[0]
    else:
        # the [R, nel] elevation/uniform grids are loop-invariant across
        # jacobi sweeps — callers may precompute them once (``grids``)
        el_ds_grid = (grids[1] if grids is not None
                      else xsec[rr, ds_col, COL_ELEV, :])
        conv_ds = tab(1, ds_col, el_ds_grid, COL_CONV, y_ds + z_ds)
    sf_ds = jnp.abs(q_ds) * q_ds / jnp.maximum(conv_ds, 1e-12) ** 2

    el_grid = (grids[0] if grids is not None
               else xsec[rr, cur_col, COL_ELEV, :])

    def f_df(y_cur):
        """Diffusive-momentum residual + derivative; one elevation-grid
        search shared by the conveyance/dKdA/topwidth interpolations."""
        elv = y_cur + z_cur
        if ugrids is not None:
            conv, dkda, topw = _uinterp(
                ucur, ulo, ustep, elv,
                (UCOL_CONV, UCOL_DKDA, UCOL_TOPW), umin_cur)
            conv = jnp.maximum(conv, 1e-12)
        else:
            idx = jnp.clip(vsearch(el_grid, elv) - 1, 0,
                           el_grid.shape[-1] - 2)
            x1 = _fetch_last(el_grid, idx)
            x2 = _fetch_last(el_grid, idx + 1)
            w = (elv - x1) / jnp.where(x2 != x1, x2 - x1, 1.0)
            c1, c2 = pt(0, cur_col, COL_CONV, idx)
            conv = jnp.maximum(c1 + (c2 - c1) * w, 1e-12)
            k1, k2 = pt(0, cur_col, COL_DKDA, idx)
            dkda = k1 + (k2 - k1) * w
            t1, t2 = pt(0, cur_col, COL_TOPW, idx)
            topw = t1 + (t2 - t1) * w

        sf_cur = jnp.abs(q_cur) * q_cur / conv ** 2
        f = y_cur - y_ds + slope * dx_cur \
            - 0.5 * (sf_cur + sf_ds) * dx_cur
        df = 1.0 + (jnp.abs(q_cur) * q_cur / conv ** 3) * dx_cur * topw * dkda
        return f, df

    if y_norm is None:
        uni_grid = (grids[2] if grids is not None
                    else xsec[rr, cur_col, COL_UNIFORM, :])
        elv_norm = tab(0, cur_col, uni_grid, COL_ELEV, jnp.abs(q_cur))
        y_norm = elv_norm - z_cur
    x1 = 0.5 * (y_norm + y_old_depth) * 0.1
    x2 = 0.5 * (y_norm + y_old_depth) * 2.0

    fl, _ = f_df(x1)
    fh, _ = f_df(x2)
    no_bracket = ((fl > 0) & (fh > 0)) | ((fl < 0) & (fh < 0))

    xl = jnp.where(fl < 0, x1, x2)
    xh = jnp.where(fl < 0, x2, x1)
    root = 0.5 * (x1 + x2)
    dxold = jnp.abs(x2 - x1)
    dxx = dxold
    f, df = f_df(root)
    done = jnp.zeros_like(root, bool) if active is None else ~active

    def body(carry):
        k, root, xl, xh, dxold, dxx, f, df, done = carry
        use_bisect = (((root - xh) * df - f) * ((root - xl) * df - f) > 0.0) \
            | (jnp.abs(2.0 * f) > jnp.abs(dxold * df))
        dxold_n = dxx
        dxx_bis = 0.5 * (xh - xl)
        root_bis = xl + dxx_bis
        dxx_newt = f / jnp.where(df != 0.0, df, 1.0)
        root_newt = root - dxx_newt
        root_n = jnp.where(use_bisect, root_bis, root_newt)
        dxx_n = jnp.where(use_bisect, dxx_bis, dxx_newt)
        stalled = jnp.where(use_bisect, xl == root_n, root == root_n)
        conv_now = jnp.abs(dxx_n) < 1e-4
        f_n, df_n = f_df(root_n)
        xl_n = jnp.where(f_n < 0, root_n, xl)
        xh_n = jnp.where(f_n < 0, xh, root_n)

        new_done = done | stalled | conv_now
        root = jnp.where(done, root, root_n)
        xl = jnp.where(done, xl, xl_n)
        xh = jnp.where(done, xh, xh_n)
        dxold = jnp.where(done, dxold, dxold_n)
        dxx = jnp.where(done, dxx, dxx_n)
        f = jnp.where(done, f, f_n)
        df = jnp.where(done, df, df_n)
        return k + 1, root, xl, xh, dxold, dxx, f, df, new_done

    _, root, *_, done = jax.lax.while_loop(
        lambda c: (c[0] < 40) & ~jnp.all(c[-1]), body,
        (jnp.int32(0), root, xl, xh, dxold, dxx, f, df, done))
    # unconverged or unbracketed -> normal depth (reference fallback)
    root = jnp.where(no_bracket | ~done, y_norm, root)
    root = jnp.where(fl == 0.0, x1, root)
    root = jnp.where(fh == 0.0, x2, root)
    return root


def _col_interp(xs_col, z_col, xcol, ycol, x, squared=False):
    """Per-node table interpolation: xs_col [R, 11, nel], x [R].

    ``squared=True`` interpolates against squared depth like the reference
    conveyance lookup (``mesh_diffusive_backward``, diffusive.f90:1437).
    """
    if squared:
        xarr = (xs_col[:, COL_ELEV, :] - z_col[:, None]) ** 2
        x = (x - z_col) ** 2
    else:
        xarr = xs_col[:, xcol, :]
    yarr = xs_col[:, ycol, :]
    idx = jnp.clip(jnp.sum(xarr <= x[:, None], axis=-1) - 1, 0,
                   xarr.shape[-1] - 2)
    x1 = _fetch_last(xarr, idx)
    x2 = _fetch_last(xarr, idx + 1)
    y1 = _fetch_last(yarr, idx)
    y2 = _fetch_last(yarr, idx + 1)
    den = jnp.where(x2 != x1, x2 - x1, 1.0)
    return y1 + (y2 - y1) * (x - x1) / den


MINDEPTH_NSTAB = 0.1    # diffusive.f90:264


def _tailwater_elevation(dom: DiffusiveDomain, qp, t_next, dtype,
                         signed_q=False):
    """[R] bottom-boundary elevation per reach: the coastal observed-depth
    series where present (dsbc_option == 1, time-interpolated with linear
    end extrapolation like the reference intp_y, diffusive.f90:2671-2699),
    normal depth otherwise.  ``signed_q`` reproduces the reference's
    *initialization* lookup which passes the signed discharge
    (diffusive.f90:554) where the time loop passes ``abs`` (:733)."""
    C = dom.n_cols
    q_bot = qp[:, C - 1] if signed_q else jnp.abs(qp[:, C - 1])
    elv_norm_bot = _col_interp(
        dom.xsec[:, C - 1], dom.z[:, C - 1], COL_UNIFORM, COL_ELEV, q_bot)
    if dom.db_depth is None:
        return elv_norm_bot
    n_db = dom.db_depth.shape[1]
    tarr = jnp.arange(n_db, dtype=dtype) * dom.dt_db
    i0 = jnp.clip(jnp.searchsorted(tarr, t_next, side="right") - 1,
                  0, max(n_db - 2, 0))
    t1 = tarr[i0]
    t2 = tarr[jnp.minimum(i0 + 1, n_db - 1)]
    w = jnp.where(t2 != t1, (t_next - t1) / jnp.where(t2 != t1,
                                                      t2 - t1, 1.0), 0.0)
    depth_db = (dom.db_depth[:, i0] * (1.0 - w)
                + dom.db_depth[:, jnp.minimum(i0 + 1, n_db - 1)] * w)
    z_bot = dom.z[:, C - 1]
    y_coastal = jnp.maximum(depth_db + z_bot, MINDEPTH_NSTAB + z_bot)
    return jnp.where(jnp.isfinite(depth_db), y_coastal, elv_norm_bot)


def corrector(dom: DiffusiveDomain, st: DiffusiveState, qp, dtini_min,
              t_next=0.0, init_mode=False):
    """Depth/WSE sweep over the flattened global node wavefront.

    One scan step processes at most ONE node per reach (the schedule in
    ``dom.bwd_active``/``bwd_col``), so total sequential depth equals the
    longest downstream node path — the same critical path the reference's
    reach-by-reach recursion walks, but with all parallel branches solved
    simultaneously.  Returns (newY, celerity, diffusivity) [R, C].

    ``init_mode`` reproduces the reference initialization sweep
    (diffusive.f90:563-571): the rtsafe warm start is the reach's flat
    bottom depth instead of the previous timestep's surface, and the
    tailwater lookup uses the signed discharge.
    """
    R, C = dom.n_reaches, dom.n_cols
    oldY = st.y
    dtype = qp.dtype
    rr = jnp.arange(R)

    def gather_cols(arr, col):
        """arr [R, C(, ...)] -> [R(, ...)] at per-reach column."""
        return arr[rr, col]

    y_tw_const = _tailwater_elevation(dom, qp, t_next, dtype,
                                      signed_q=init_mode)
    xmin = (dom.xsec_min if dom.xsec_min is not None
            else dom.xsec.min(axis=-1))

    vsearch = _vsearch_right()

    def node_step(carry, xs):
        newY, cel2, dif2, wdepth = carry
        active, col = xs
        safe = jnp.clip(col, 0, C - 1)

        # bottom boundary when entering a reach (col == C-1):
        # junction -> downstream reach head elevation; tailwater -> normal
        # depth (dsbc_option == 2) or the coastal series (option 1)
        ds = dom.ds_reach
        ds_head_col = dom.head_col[jnp.maximum(ds, 0)]
        y_junc = newY[jnp.maximum(ds, 0), ds_head_col]
        y_bot = jnp.where(ds >= 0, y_junc, y_tw_const)
        entering = active & (safe == C - 1)
        newY = newY.at[rr, C - 1].set(
            jnp.where(entering, y_bot, newY[:, C - 1]))
        # flat-depth warm start for init_mode (reference :566-569)
        wdepth = jnp.where(entering, y_bot - dom.z[:, C - 1], wdepth)

        # hydraulics at the scheduled node: pointwise table fetches at a
        # shared squared-depth grid search (reference interpolates
        # conveyance against depth^2, diffusive.f90:1437)
        z_i = gather_cols(dom.z, safe)
        y_i = gather_cols(newY, safe)
        q_i = gather_cols(qp, safe)
        el_i = dom.xsec[rr, safe, COL_ELEV, :]          # [R, nel]
        nel = el_i.shape[-1]
        xmin_i = xmin[rr, safe]                          # [R, 11]

        def interp_at(grid, x, c):
            """r_interpol semantics (diffusive.f90:2553-2594): linear in
            range, last-segment extrapolation above, min(column) below."""
            idx = jnp.clip(vsearch(grid, x) - 1, 0, nel - 2)
            g1 = _fetch_last(grid, idx)
            g2 = _fetch_last(grid, idx + 1)
            w = (x - g1) / jnp.where(g2 != g1, g2 - g1, 1.0)
            v1 = dom.xsec[rr, safe, c, idx]
            v2 = dom.xsec[rr, safe, c, idx + 1]
            return jnp.where(x < grid[:, 0], xmin_i[:, c],
                             v1 + (v2 - v1) * w)

        # conveyance interpolates against squared depth (reference
        # diffusive.f90:1437); topwidth/skk against elevation
        d2_grid = (el_i - z_i[:, None]) ** 2
        co = jnp.maximum(interp_at(d2_grid, (y_i - z_i) ** 2, COL_CONV),
                         1e-12)
        bo = jnp.maximum(interp_at(el_i, y_i, COL_TOPW), 1e-12)
        sk = interp_at(el_i, y_i, COL_SKK)
        sfi = q_i * jnp.abs(q_i) / co ** 2

        cel_i = (5.0 / 3.0) * jnp.abs(sfi) ** 0.3 \
            * jnp.abs(q_i) ** 0.4 / bo ** 0.4 \
            / (1.0 / jnp.maximum(sk, 1e-12)) ** 0.6
        # C_ulm uses dx(i-1) except at the reach HEAD node which uses its
        # own dx (reference i>1 test, diffusive.f90:1487-1491); head_col
        # comparison, not column 0, or short reaches read padded dx
        dx_ref = jnp.where(safe > dom.head_col,
                           gather_cols(dom.dx, jnp.maximum(safe - 1, 0)),
                           gather_cols(dom.dx, safe))
        cel_i = jnp.minimum(cel_i, CFL * dx_ref / dtini_min)
        dif_i = jnp.abs(q_i) / 2.0 / bo / jnp.maximum(jnp.abs(sfi), 1e-12)

        cel2 = cel2.at[rr, safe].set(jnp.where(active, cel_i,
                                               gather_cols(cel2, safe)))
        dif2 = dif2.at[rr, safe].set(jnp.where(active, dif_i,
                                               gather_cols(dif2, safe)))

        # depth at the upstream neighbor via Newton/bisection
        up_col = jnp.maximum(safe - 1, 0)
        solve_mask = active & (safe > 0) & (safe - 1 >= dom.head_col)
        y_old_depth = (wdepth if init_mode
                       else gather_cols(oldY, up_col)
                       - gather_cols(dom.z, up_col))
        y_up = _rtsafe_vec(
            dom.xsec, rr, up_col, safe, y_i,
            gather_cols(qp, up_col), q_i,
            gather_cols(dom.z, up_col), z_i,
            gather_cols(dom.dx, up_col),
            y_old_depth,
            active=solve_mask)
        elev_up = jnp.minimum(y_up + gather_cols(dom.z, up_col), 1.0e5)
        newY = newY.at[rr, up_col].set(
            jnp.where(solve_mask, elev_up, gather_cols(newY, up_col)))
        return (newY, cel2, dif2, wdepth), None

    cel2_0 = jnp.zeros((R, C), dtype)
    dif2_0 = jnp.zeros((R, C), dtype)
    (newY, cel2, dif2, _), _ = jax.lax.scan(
        node_step, (st.y, cel2_0, dif2_0, jnp.zeros((R,), dtype)),
        (dom.bwd_active, dom.bwd_col))

    # reach-average celerity/diffusivity (reference :1540-1551)
    nvalid = jnp.maximum(dom.valid.sum(axis=1), 1)
    cel_mean = jnp.where(dom.valid, cel2, 0.0).sum(axis=1) / nvalid
    dif_mean = jnp.where(dom.valid, dif2, 0.0).sum(axis=1) / nvalid
    cel_mean = jnp.maximum(cel_mean, C_LLM)
    dif_mean = jnp.clip(dif_mean, D_LLM, D_ULM)
    celerity = jnp.broadcast_to(cel_mean[:, None], (R, C))
    diffusivity = jnp.broadcast_to(dif_mean[:, None], (R, C))
    return newY, celerity, diffusivity


def corrector_jacobi(dom: DiffusiveDomain, st: DiffusiveState, qp,
                     dtini_min, t_next=0.0, tol=1e-6, init_mode=False):
    """Fixed-point (Jacobi) form of the depth sweep.

    The wavefront corrector substitutes node depths bottom-up along a
    lower-triangular chain — inherently sequential (D scan steps).  Here
    every interior node solves its rtsafe relation against the PREVIOUS
    iterate's downstream value, all nodes at once; iterating converges to
    the same chain solution (exactly after D sweeps; with the previous
    timestep's surface as warm start, typically in a handful).  Each sweep
    is one fully-vectorized solve over all nodes — the op count no longer
    scales with network depth, which is what bounds the wavefront mode on
    long mainstems.
    """
    R, C = dom.n_reaches, dom.n_cols
    dtype = qp.dtype
    y_tw_const = _tailwater_elevation(dom, qp, t_next, dtype,
                                      signed_q=init_mode)

    # Flattened interior lanes: cur node (r, c), downstream node (r, c+1).
    # Every per-lane view is a STATIC slice + reshape ([:, :-1] = current,
    # [:, 1:] = downstream): the equivalent advanced-index forms
    # (xsec[rrf, curf, ...]) lower to per-lane dynamic gathers on TPU
    # (~8 ns/element — ~120 ms per [P, 501] grid at mainstem scale),
    # which dominated the whole corrector.
    P = R * (C - 1)

    def cur(a):
        return a[:, :C - 1].reshape((P,) + a.shape[2:])

    def dsv(a):
        return a[:, 1:].reshape((P,) + a.shape[2:])

    rrf = jnp.repeat(jnp.arange(R), C - 1)
    curf = jnp.tile(jnp.arange(C - 1), R)
    dsf = curf + 1
    interior = (jnp.arange(C - 1)[None, :]
                >= dom.head_col[:, None]).reshape(P)

    ds = dom.ds_reach
    ds_head_col = dom.head_col[jnp.maximum(ds, 0)]
    z_cur = cur(dom.z)
    z_ds = dsv(dom.z)
    q_cur = cur(qp)
    q_ds = dsv(qp)
    dx_cur = cur(dom.dx)
    y_old_depth = cur(st.y) - z_cur
    max_sweeps = int(dom.bwd_active.shape[0]) + 2
    xs_elev = dom.xsec[:, :, COL_ELEV, :]
    if dom.utab is not None:
        # uniform-table fast path: only the exact grids the once-per-solve
        # normal-depth lookup needs are materialized at [P, nel]; every
        # per-Newton-iteration fetch runs on the [P, 4, nel_u] resampled
        # tables (index arithmetic, no search)
        grids = (cur(xs_elev),
                 None,
                 cur(dom.xsec[:, :, COL_UNIFORM, :]))
        ugrids = (cur(dom.ugrid_lo), cur(dom.ugrid_step),
                  cur(dom.utab), cur(dom.utab_min),
                  dsv(dom.ugrid_lo), dsv(dom.ugrid_step),
                  dsv(dom.utab[:, :, UCOL_CONV, :]),
                  dsv(dom.utab_min[:, :, UCOL_CONV]))
    else:
        grids = (cur(xs_elev),
                 dsv(xs_elev),
                 cur(dom.xsec[:, :, COL_UNIFORM, :]),
                 cur(dom.xsec[:, :, COL_CONV, :]),
                 cur(dom.xsec[:, :, COL_DKDA, :]),
                 cur(dom.xsec[:, :, COL_TOPW, :]),
                 dsv(dom.xsec[:, :, COL_CONV, :]))
        ugrids = None

    # Normal depth per node (reference's uniform-flow warm start /
    # fallback): depends only on ``qp`` and the tables, both constant
    # across a substep's sweeps — computed ONCE here instead of once per
    # column per sweep (the exact [P, nel] uniform-flow pass was the
    # dominant fixed cost of the GS sweep loop).  Bit-identical to the
    # in-solve lookup (same ``tab`` arithmetic).
    vsearch_n = _vsearch_right()
    uni_g, el_g = grids[2], grids[0]
    q_abs = jnp.abs(q_cur)
    n_idx = jnp.clip(vsearch_n(uni_g, q_abs) - 1, 0, uni_g.shape[-1] - 2)
    nx1 = _fetch_last(uni_g, n_idx)
    nx2 = _fetch_last(uni_g, n_idx + 1)
    ny1 = _fetch_last(el_g, n_idx)
    ny2 = _fetch_last(el_g, n_idx + 1)
    elv_norm_flat = ny1 + (ny2 - ny1) * (q_abs - nx1) \
        / jnp.where(nx2 != nx1, nx2 - nx1, 1.0)
    y_norm_flat = elv_norm_flat - z_cur
    y_norm_cols = y_norm_flat.reshape(R, C - 1)

    # Convergence floor: ``tol`` (1e-6 m) is unreachable in f32 once
    # surface elevations sit at O(100 m) — eps(100 m) ~ 7.6e-6 — so
    # without a floor every substep runs the sweep loop to the
    # max_sweeps cap (measured: the f32 bench spent its whole budget
    # there).  The iterate is converged once its changes fall below a
    # few ulps of the largest surface value — the fixed point at the
    # dtype's own resolution (~0.1 mm at f32/100 m).
    eps4 = 4.0 * jnp.asarray(jnp.finfo(dtype).eps, dtype)

    def sweep(carry):
        y, _delta, _ymax, k = carry
        y_junc = y[jnp.maximum(ds, 0), ds_head_col]
        y_bot = jnp.where(ds >= 0, y_junc, y_tw_const)
        y1 = jnp.concatenate([y[:, :C - 1], y_bot[:, None]], axis=1)
        # init_mode warm start: the reach's (current-iterate) flat bottom
        # depth, like the reference init sweep (diffusive.f90:566-569).
        # The uniform fast path warm-starts each sweep's Newton from the
        # CURRENT iterate instead of the previous substep's surface: the
        # first sweep is identical (the iterate starts at st.y), later
        # sweeps bracket progressively tighter around the fixed point, so
        # the per-sweep Newton converges in a couple of iterations.  The
        # fixed point itself is unchanged (the bracket always contains
        # the same root); exact mode keeps the reference's previous-
        # timestep warm start verbatim.
        if init_mode:
            y_old = jnp.repeat(y_bot - dom.z[:, C - 1], C - 1)
        elif ugrids is not None:
            y_old = jnp.maximum(cur(y1) - z_cur, 0.005)
        else:
            y_old = y_old_depth
        y_up = _rtsafe_vec(
            dom.xsec, rrf, curf, dsf, dsv(y1), q_cur, q_ds,
            z_cur, z_ds, dx_cur, y_old, active=interior,
            grids=grids, ugrids=ugrids, y_norm=y_norm_flat)
        elev_up = jnp.minimum(y_up + z_cur, 1.0e5)
        new_vals = jnp.where(interior, elev_up, cur(y1))
        y2 = jnp.concatenate([new_vals.reshape(R, C - 1), y1[:, -1:]],
                             axis=1)
        delta = jnp.max(jnp.where(dom.valid, jnp.abs(y2 - y), 0.0))
        ymax = jnp.max(jnp.where(dom.valid, jnp.abs(y2), 0.0))
        return y2, delta, ymax, k + 1

    def sweep_gs(carry):
        """Uniform fast-path sweep: Gauss-Seidel WITHIN each reach
        (columns solved C-2 -> 0, each against the just-updated
        downstream node — exactly the reference's sequential in-reach
        substitution, ``mesh_diffusive_backward``), Jacobi only ACROSS
        junctions (a reach bottom reads the downstream reach's head from
        the previous sweep).  Per chain the in-reach solve is EXACT in
        one pass (triangular substitution), so convergence needs
        ~reach-tree-depth sweeps instead of ~node-chain-length —
        measured ~5x fewer sweeps at mainstem scale.  Same fixed point
        as ``sweep``: only the iteration order differs."""
        y, _delta, _ymax, k = carry
        y_junc = y[jnp.maximum(ds, 0), ds_head_col]
        y_bot = jnp.where(ds >= 0, y_junc, y_tw_const)
        ynew = jnp.concatenate([y[:, :C - 1], y_bot[:, None]], axis=1)
        (ulo, ustep, ucur_t, umin_t, ulo_d, ustep_d, uconv_d,
         uconv_min_d) = ugrids

        def pick(a, i):
            return a.reshape(R, C - 1, *a.shape[1:])[:, i]

        for i in range(C - 2, -1, -1):
            active_i = i >= dom.head_col
            if init_mode:
                y_old_i = y_bot - dom.z[:, C - 1]
            else:
                y_old_i = jnp.maximum(ynew[:, i] - dom.z[:, i], 0.005)
            col_ugrids = (pick(ulo, i), pick(ustep, i), pick(ucur_t, i),
                          pick(umin_t, i), pick(ulo_d, i),
                          pick(ustep_d, i), pick(uconv_d, i),
                          pick(uconv_min_d, i))
            col_grids = (pick(grids[0], i), None, pick(grids[2], i))
            y_up = _rtsafe_vec(
                dom.xsec, rrf[:R], curf[:R], dsf[:R], ynew[:, i + 1],
                qp[:, i], qp[:, i + 1], dom.z[:, i], dom.z[:, i + 1],
                dom.dx[:, i], y_old_i, active=active_i,
                grids=col_grids, ugrids=col_ugrids,
                y_norm=y_norm_cols[:, i])
            elev_i = jnp.minimum(y_up + dom.z[:, i], 1.0e5)
            newcol = jnp.where(active_i, elev_i, ynew[:, i])
            ynew = ynew.at[:, i].set(newcol)
        delta = jnp.max(jnp.where(dom.valid, jnp.abs(ynew - y), 0.0))
        ymax = jnp.max(jnp.where(dom.valid, jnp.abs(ynew), 0.0))
        return ynew, delta, ymax, k + 1

    def sweep_cond(c):
        tol_eff = jnp.maximum(jnp.asarray(tol, dtype), eps4 * c[2])
        return (c[3] < max_sweeps) & (c[1] > tol_eff)

    # Junction-head linearized-propagation acceleration (the diffusive
    # analog of engine.RoutingConfig.strict_accel — the GS sweep solves
    # each reach exactly given its bottom BC, so the iteration is a
    # fixed point on the [R] head-elevation vector, one junction level
    # per sweep) was built and MEASURED OUT (2026-08-20, same-session
    # A/B on one v5e, bench shape [2048,16] f32/u128): 2.40e6 plain vs
    # 2.17e6 accelerated seg-ts/s.  Unlike MC strict (16 sweeps/step at
    # the f32 floor), the substep-warm-started corrector already
    # converges in a few sweeps, and the accel's per-sweep [R]
    # head gathers/scatter + extra while-carries cost more than the
    # saved sweeps.  Do not re-attempt without evidence of a
    # sweep-bound regime (e.g. cold starts or much deeper reach trees).
    #
    # Fused-Pallas-substep probe (VERDICT r4 #7, measured 2026-08-21,
    # benchmarks/probe_diffusive_substep.py, warm in-jit fori loops at
    # [2048, 16] f32/u128 on one v5e): predictor 3.34 ms, corrector
    # 5.45 ms, full substep 8.59 ms == their exact sum — XLA composes
    # the two stages with ZERO overhead, so there is no region-level
    # fusion left to win; the cost sits INSIDE the stages as per-op
    # launch overhead on 128 KB arrays (substep traffic floor ~0.7 ms:
    # one 131 MB normal-depth exact-grid pass + ~3 sweeps x ~3 Newton
    # iters x ~50 MB one-hot table reads — the substep runs ~12x above
    # it).  A whole-substep Pallas kernel is the only structure that
    # could collapse that, and it is TOOLCHAIN-BLOCKED: production
    # diffusive must run inside the single-dispatch adaptive
    # ``while_loop`` (host-stepping pays ~30 ms tunnel RTT per substep
    # against this 8.6 ms body), and pallas_call inside lax scans/loops
    # hangs the remote Mosaic compiler (the documented reason the
    # K-step VMEM MC kernel died).  Dead end on this toolchain; revisit
    # only if Pallas-in-loop compiles on a future stack.
    newY, _, _, _ = jax.lax.while_loop(
        sweep_cond, sweep_gs if ugrids is not None else sweep,
        (st.y, jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype),
         jnp.int32(0)))

    # hydraulics at every valid node (identical formulas to the wavefront
    # mode's node step), then reach-mean celerity/diffusivity — again all
    # flat STATIC reshapes, never per-lane gathers
    z_a = dom.z.reshape(R * C)
    y_a = newY.reshape(R * C)
    q_a = qp.reshape(R * C)
    if dom.utab is not None:
        lo_a = dom.ugrid_lo.reshape(R * C)
        st_a = dom.ugrid_step.reshape(R * C)
        ut_a = dom.utab.reshape(R * C, *dom.utab.shape[2:])
        um_a = dom.utab_min.reshape(R * C, -1)
        bo, sk = _uinterp(ut_a, lo_a, st_a, y_a, (UCOL_TOPW, UCOL_SKK),
                          um_a)
        bo = jnp.maximum(bo, 1e-12)
        # conveyance interpolates against SQUARED depth (reference
        # diffusive.f90:1437): the bracket index is still elevation
        # arithmetic (the grid is monotone in depth), only the weight
        # moves to d^2 space; within the 1-cm notch (bracket depth < 0,
        # where d^2 is non-monotone) fall back to the linear weight
        nel_u = ut_a.shape[-1]
        idx, w_lin = _ugrid_bracket(lo_a, st_a, y_a, nel_u)
        fidx = idx.astype(y_a.dtype)
        d1 = (lo_a - z_a) + (fidx * st_a) ** 2
        d2v = (lo_a - z_a) + ((fidx + 1.0) * st_a) ** 2
        den = d2v ** 2 - d1 ** 2
        depth = y_a - z_a
        w_sq = jnp.where((d1 >= 0.0) & (den > 1e-30),
                         (depth ** 2 - d1 ** 2)
                         / jnp.where(den > 1e-30, den, 1.0), w_lin)
        k_io = jax.lax.broadcasted_iota(jnp.int32, y_a.shape + (nel_u,), 1)
        sel = jnp.where(k_io == idx[:, None], 1.0 - w_sq[:, None], 0.0) \
            + jnp.where(k_io == idx[:, None] + 1, w_sq[:, None], 0.0)
        co = (sel * ut_a[:, UCOL_CONV, :]).sum(-1)
        co = jnp.where(y_a < lo_a, um_a[:, UCOL_CONV], co)
        co = jnp.maximum(co, 1e-12)
    else:
        el_a = dom.xsec[:, :, COL_ELEV, :].reshape(R * C, -1)
        nel = el_a.shape[-1]
        xmin = (dom.xsec_min if dom.xsec_min is not None
                else dom.xsec.min(axis=-1))
        xmin_a = xmin.reshape(R * C, -1)
        vsearch = _vsearch_right()

        def interp_at(grid, x, c):
            """r_interpol semantics — see the wavefront corrector."""
            idx = jnp.clip(vsearch(grid, x) - 1, 0, nel - 2)
            g1 = _fetch_last(grid, idx)
            g2 = _fetch_last(grid, idx + 1)
            w = (x - g1) / jnp.where(g2 != g1, g2 - g1, 1.0)
            v = dom.xsec[:, :, c, :].reshape(R * C, -1)
            v1 = _fetch_last(v, idx)
            v2 = _fetch_last(v, jnp.minimum(idx + 1, nel - 1))
            return jnp.where(x < grid[:, 0], xmin_a[:, c],
                             v1 + (v2 - v1) * w)

        d2_grid = (el_a - z_a[:, None]) ** 2
        co = jnp.maximum(interp_at(d2_grid, (y_a - z_a) ** 2, COL_CONV),
                         1e-12)
        bo = jnp.maximum(interp_at(el_a, y_a, COL_TOPW), 1e-12)
        sk = interp_at(el_a, y_a, COL_SKK)
    sfi = q_a * jnp.abs(q_a) / co ** 2
    cel_a = (5.0 / 3.0) * jnp.abs(sfi) ** 0.3 \
        * jnp.abs(q_a) ** 0.4 / bo ** 0.4 \
        / (1.0 / jnp.maximum(sk, 1e-12)) ** 0.6
    # same head-node dx rule as the wavefront mode (diffusive.f90:1487-1491)
    colA = jnp.tile(jnp.arange(C), R)
    dx_prev = jnp.concatenate([dom.dx[:, :1], dom.dx[:, :-1]],
                              axis=1).reshape(R * C)
    dx_ref = jnp.where(colA > jnp.repeat(dom.head_col, C),
                       dx_prev, dom.dx.reshape(R * C))
    cel_a = jnp.minimum(cel_a, CFL * dx_ref / dtini_min)
    dif_a = jnp.abs(q_a) / 2.0 / bo / jnp.maximum(jnp.abs(sfi), 1e-12)
    cel2 = cel_a.reshape(R, C)
    dif2 = dif_a.reshape(R, C)

    nvalid = jnp.maximum(dom.valid.sum(axis=1), 1)
    cel_mean = jnp.where(dom.valid, cel2, 0.0).sum(axis=1) / nvalid
    dif_mean = jnp.where(dom.valid, dif2, 0.0).sum(axis=1) / nvalid
    cel_mean = jnp.maximum(cel_mean, C_LLM)
    dif_mean = jnp.clip(dif_mean, D_LLM, D_ULM)
    celerity = jnp.broadcast_to(cel_mean[:, None], (R, C))
    diffusivity = jnp.broadcast_to(dif_mean[:, None], (R, C))
    return newY, celerity, diffusivity


@functools.partial(jax.jit, static_argnames=("dtini_min", "corrector_mode"))
def diffusive_step(dom: DiffusiveDomain, st: DiffusiveState, dtini,
                   dtini_min: float, corrector_mode: str = "wavefront"):
    """One internal CN timestep: predictor + corrector + CFL info."""
    qp, qpx_new = predictor(dom, st, dtini, st.t)
    corr = corrector_jacobi if corrector_mode == "jacobi" else corrector
    newY, celerity, diffusivity = corr(dom, st, qp, dtini_min,
                                       t_next=st.t + dtini)
    new_state = DiffusiveState(q=qp, y=newY, qpx=qpx_new, celerity=celerity,
                               diffusivity=diffusivity, t=st.t + dtini)
    # max celerity/dx over valid interior nodes, for the next adaptive dt
    interior = dom.valid & (jnp.arange(dom.n_cols)[None, :] < dom.n_cols - 1)
    cel_dx = jnp.where(interior, celerity / dom.dx, 0.0)
    max_cel_dx = jnp.maximum(cel_dx.max(), 1e-12)
    return new_state, max_cel_dx


@functools.partial(jax.jit, static_argnames=("dtini_min", "corrector_mode"))
def initialize_state(dom: DiffusiveDomain, q_init, dtini_min: float,
                     corrector_mode: str = "wavefront"):
    """Reference initialization (diffusive.f90:530-582): tailwater bottoms
    at normal depth (signed-q lookup, :554) or the coastal series at t=0,
    junction hand-up downstream-to-upstream, flat-depth rtsafe warm start,
    then one backward sweep.  ``iniq`` is NOT clamped at q_llm — the
    reference passes it through raw (:362-364).

    Jitted: the eager form dispatches each traced op over the (tunneled)
    device link individually — measured 88 s for a [2048, 16] f32 init
    that runs in ~1 s compiled."""
    R, C = dom.n_reaches, dom.n_cols
    dtype = q_init.dtype
    q = jnp.asarray(q_init, dtype)
    # seed surface at normal depth (only padded columns keep this; every
    # valid node is overwritten by the init sweep)
    elv_norm = _table_interp(dom.xsec, COL_UNIFORM, COL_ELEV, jnp.abs(q))
    st = DiffusiveState(
        q=q, y=elv_norm, qpx=jnp.zeros((R, C), dtype),
        celerity=jnp.ones((R, C), dtype),
        diffusivity=jnp.full((R, C), 10.0, dtype),
        t=jnp.asarray(0.0, dtype))
    corr = corrector_jacobi if corrector_mode == "jacobi" else corrector
    newY, celerity, diffusivity = corr(dom, st, q, dtini_min,
                                       t_next=0.0, init_mode=True)
    return st._replace(y=newY, celerity=celerity, diffusivity=diffusivity)


def _run_device_impl(dom: DiffusiveDomain, st: DiffusiveState, t_final,
                     save_interval: float, dtini_min: float,
                     corrector_mode: str, n_saves: int, t_start):
    """The whole adaptive time loop as ONE compiled ``while_loop`` — a
    single dispatch regardless of internal step count (the host-stepped
    form pays per-step dispatch latency, which dominates on a tunneled
    TPU)."""
    dtype = st.q.dtype
    R, C = dom.n_reaches, dom.n_cols
    eps = 1e-6

    def cond(carry):
        st, _, _, _ = carry
        return st.t < t_final - eps

    def body(carry):
        st, max_cel_dx, qs, ys = carry
        dtini = CFL / max_cel_dx
        a = jnp.floor(st.t / save_interval)
        b = jnp.floor((st.t + dtini) / save_interval)
        dtini = jnp.where(b > a, (a + 1.0) * save_interval - st.t, dtini)
        dtini = jnp.minimum(dtini, t_final - st.t)
        dtini = jnp.maximum(dtini, 1e-3)

        qp, qpx_new = predictor(dom, st, dtini, st.t)
        corr = corrector_jacobi if corrector_mode == "jacobi" \
            else corrector
        newY, celerity, diffusivity = corr(dom, st, qp, dtini_min,
                                           t_next=st.t + dtini)
        st2 = DiffusiveState(q=qp, y=newY, qpx=qpx_new, celerity=celerity,
                             diffusivity=diffusivity, t=st.t + dtini)
        interior = dom.valid & (jnp.arange(C)[None, :] < C - 1)
        cel_dx = jnp.where(interior, celerity / dom.dx, 0.0)
        mcd = jnp.maximum(cel_dx.max(), 1e-12)

        # save at interval boundaries (slot k holds t_start+(k+1)*interval)
        ratio = st2.t / save_interval
        hit = jnp.abs(ratio - jnp.round(ratio)) < 1e-6 / save_interval
        start_slots = jnp.round(t_start / save_interval).astype(jnp.int32)
        slot = jnp.clip(jnp.round(ratio).astype(jnp.int32) - 1
                        - start_slots, 0, n_saves - 1)
        qs = qs.at[slot].set(jnp.where(hit, st2.q, qs[slot]))
        ys = ys.at[slot].set(jnp.where(hit, st2.y, ys[slot]))
        return st2, mcd, qs, ys

    qs0 = jnp.zeros((n_saves, R, C), dtype)
    ys0 = jnp.zeros((n_saves, R, C), dtype)
    # maxCelerity=1 / minDx initial CFL state (reference :613-614)
    interior0 = dom.valid & (jnp.arange(C)[None, :] < C - 1)
    mcd0 = 1.0 / jnp.min(jnp.where(interior0, dom.dx, jnp.inf))
    st, mcd, qs, ys = jax.lax.while_loop(
        cond, body, (st, jnp.asarray(mcd0, dtype), qs0, ys0))
    # guarantee the final slot reflects the final state (t_final may not
    # land exactly on an interval boundary after float accumulation)
    qs = qs.at[n_saves - 1].set(st.q)
    ys = ys.at[n_saves - 1].set(st.y)
    return st, qs, ys


_run_device = functools.partial(
    jax.jit, static_argnames=("save_interval", "dtini_min",
                              "corrector_mode", "n_saves"))(_run_device_impl)


def _domain_axes(dom: DiffusiveDomain) -> DiffusiveDomain:
    """vmap ``in_axes`` spec for a batched [B, ...] DiffusiveDomain:
    arrays map over axis 0, the shared scalar timesteps broadcast."""
    u = None if dom.utab is None else 0
    return DiffusiveDomain(
        z=0, dx=0, ncomp=0, head_col=0, valid=0, xsec=0, ds_reach=0,
        up_reaches=0, bwd_active=0, bwd_col=0, trib_q=0, dt_trib=None,
        qlat=0, dt_qlat=None, dtini_given=None,
        db_depth=(None if dom.db_depth is None else 0), dt_db=None,
        xsec_min=(None if dom.xsec_min is None else 0),
        utab=u, ugrid_lo=u, ugrid_step=u, utab_min=u)


@functools.partial(
    jax.jit, static_argnames=("save_interval", "dtini_min",
                              "corrector_mode", "n_saves"))
def _run_device_batched(dom: DiffusiveDomain, st: DiffusiveState, t_final,
                        save_interval: float, dtini_min: float,
                        corrector_mode: str, n_saves: int, t_start):
    def one(d, s):
        return _run_device_impl(d, s, t_final, save_interval, dtini_min,
                                corrector_mode, n_saves, t_start)

    state_axes = DiffusiveState(q=0, y=0, qpx=0, celerity=0,
                                diffusivity=0, t=0)
    return jax.vmap(one, in_axes=(_domain_axes(dom), state_axes))(dom, st)


@functools.partial(
    jax.jit, static_argnames=("dtini_min", "corrector_mode"))
def initialize_state_batched(dom: DiffusiveDomain, q_init,
                             dtini_min: float,
                             corrector_mode: str = "wavefront"):
    """``initialize_state`` vmapped over a batched [B, R, C] domain."""
    def one(d, q):
        return initialize_state(d, q, dtini_min, corrector_mode)

    return jax.vmap(one, in_axes=(_domain_axes(dom), 0))(dom, q_init)


def shard_batched_domains(dom: DiffusiveDomain, st: DiffusiveState,
                          mesh, axis: str | None = None):
    """Distribute batched [B, ...] domain lanes over a device mesh.

    Tailwater domains are fully independent (the reference runs one
    ``diffnw`` call per domain), so the batch axis shards with no
    cross-device communication at all: lanes are padded to a multiple of
    the device count (replicating lane 0 — discarded on read-back) and
    every array is placed with the batch axis over ``mesh``.  The
    batched while_loop's continue-condition becomes the only collective
    (a scalar any-reduce XLA inserts).  Returns (dom, st, n_real_lanes);
    trim outputs to ``[:n_real_lanes]``.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n_dev = int(np.prod(mesh.devices.shape))
    b = int(dom.z.shape[0])
    pad = (-b) % n_dev
    spec = NamedSharding(mesh,
                         PartitionSpec(axis or mesh.axis_names[0]))

    def prep(a):
        if not isinstance(a, (jax.Array, np.ndarray)):
            return a
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate(
                [a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
        return jax.device_put(a, spec)

    return jax.tree.map(prep, dom), jax.tree.map(prep, st), b


# float64 diffusive programs above this reach count FAULT the tunneled
# TPU worker (measured: R=1024 runs, R=2048 kills the worker process —
# f64 is emulated on TPU, doubling the program, and the per-lane table
# fetches inside the while_loop hit a toolchain fault at that size).
F64_OFFCPU_MAX_R = 1024


def _domain_platforms(dom: DiffusiveDomain) -> set:
    """Device platforms the domain's arrays are committed to."""
    try:
        return {d.platform for d in dom.z.devices()}
    except Exception:
        return {jax.default_backend()}


def guard_f64_domain(platforms: set, dtype, n_reaches: int):
    """Refuse reference-precision f64 diffusive runs that would fault the
    tunneled TPU worker (VERDICT r4 #5: the crash needs a guard with an
    actionable message, not a dead worker).  The CLI never reaches this:
    it routes oversized pinned-f64 domains to the host CPU backend.
    At/below the bound TPU f64 stays — measured 1.87e4 seg-ts/s at
    R=1024 vs 5.9e3 on one CPU core (2026-08-21), i.e. the emulated-f64
    TPU still beats a core 3x; the CPU fallback is a safety valve."""
    if dtype != jnp.float64 or "cpu" in platforms:
        return
    if n_reaches > F64_OFFCPU_MAX_R:
        raise RuntimeError(
            f"float64 diffusive domain with {n_reaches} reaches on "
            f"{sorted(platforms)}: f64 programs above R="
            f"{F64_OFFCPU_MAX_R} fault the tunneled TPU worker (known "
            "toolchain fault; f64 is emulated on TPU).  Options: "
            "(a) run reference-precision f64 on CPU — place the domain "
            "arrays on a CPU device (the CLI does this automatically "
            "for diffusive_dtype: float64), or (b) use the TPU fast "
            "path (diffusive_dtype: float32 with diffusive_table_nel: "
            "128 — accuracy study in tests/test_diffusive_uniform.py).")


def run_diffusive_batched(dom: DiffusiveDomain, st: DiffusiveState,
                          t_final: float, save_interval: float,
                          corrector_mode: str = "wavefront"):
    """Route B independent diffusive domains in one dispatch.

    ``dom``/``st`` carry a leading batch axis on every array field
    ([B, R, C] node arrays — see ``domain.stack_domains``).  Each domain
    runs its OWN adaptive-CFL time loop, exactly like the reference,
    which calls ``diffnw`` once per tailwater domain so each gets an
    independent ``calculateDT`` (diffusive.f90:942-991) — a merged
    single-[R, C] domain instead couples every tailwater to the global
    most-restrictive dt.  The batched ``while_loop`` runs until the
    slowest domain finishes; finished lanes hold their state (JAX's
    batching rule selects old carries where the lane condition is
    false), so results are identical to running each domain alone.

    All domains must share ``save_interval``, the series timesteps, and
    a common start time.  Returns (final batched state, saves) with
    saves = [(t, q[B, R, C], y[B, R, C]), ...] at save-interval
    boundaries; padded reaches/columns (``valid`` False) carry garbage
    — mask before use.
    """
    guard_f64_domain(_domain_platforms(dom), dom.z.dtype,
                     int(dom.z.shape[0]) * int(dom.z.shape[1]))
    dtini_min = float(dom.dtini_given) / DTINI_DIVISOR
    t0 = np.asarray(st.t)
    t_start = float(t0.reshape(-1)[0])
    if not np.allclose(t0, t_start):
        raise ValueError("batched domains must share a start time")
    n_saves = int(round((t_final - t_start) / save_interval))
    if n_saves <= 0:
        return st, []
    dtype = st.q.dtype
    st, qs, ys = _run_device_batched(
        dom, st, jnp.asarray(t_final, dtype), float(save_interval),
        dtini_min, corrector_mode, n_saves, jnp.asarray(t_start, dtype))
    saves = [(t_start + (k + 1) * save_interval, qs[:, k], ys[:, k])
             for k in range(n_saves)]
    return st, saves


def run_diffusive(dom: DiffusiveDomain, st: DiffusiveState, t_final: float,
                  save_interval: float, corrector_mode: str = "wavefront",
                  dispatch: str = "auto"):
    """Adaptive time loop (reference ``calculateDT`` logic).

    ``corrector_mode``: "wavefront" (sequential node sweep, reference
    parity) or "jacobi" (depth-independent fixed-point iteration — much
    faster on long mainstems, converged to 1e-6).

    ``dispatch``: "host" drives one jitted step per internal dt (fastest
    per-step on CPU); "device" compiles the whole loop into ONE dispatch
    (a tunneled/remote TPU pays seconds of RTT per dispatch, so the
    host-stepped form is pathological there); "auto" picks device off-CPU.

    Returns (final state, saved [(t, q, y), ...] at save-interval
    boundaries).
    """
    if dispatch == "auto":
        dispatch = "host" if jax.default_backend() == "cpu" else "device"
    guard_f64_domain(_domain_platforms(dom), dom.z.dtype,
                     int(dom.z.shape[0]))
    dtini_min = float(dom.dtini_given) / DTINI_DIVISOR
    t_start = float(st.t)
    if dispatch == "device":
        n_saves = int(round((t_final - t_start) / save_interval))
        if n_saves <= 0:
            return st, []
        dtype = st.q.dtype
        st, qs, ys = _run_device(dom, st, jnp.asarray(t_final, dtype),
                                 float(save_interval), dtini_min,
                                 corrector_mode, n_saves,
                                 jnp.asarray(t_start, dtype))
        saves = [(t_start + (k + 1) * save_interval, qs[k], ys[k])
                 for k in range(n_saves)]
        return st, saves

    t = t_start
    saves = []
    # maxCelerity=1 / minDx initial CFL state (reference :613-614)
    interior0 = np.asarray(dom.valid) \
        & (np.arange(dom.n_cols)[None, :] < dom.n_cols - 1)
    max_cel_dx = 1.0 / float(
        np.where(interior0, np.asarray(dom.dx), np.inf).min())
    eps = 1e-6
    while t < t_final - eps:
        dtini = CFL / max_cel_dx
        a = int(np.floor(t / save_interval))
        b = int(np.floor((t + dtini) / save_interval))
        if b > a:
            dtini = (a + 1) * save_interval - t
        dtini = min(dtini, t_final - t)
        dtini = max(dtini, 1e-3)
        st, mcd = diffusive_step(dom, st, jnp.asarray(dtini, st.q.dtype),
                                 dtini_min, corrector_mode=corrector_mode)
        max_cel_dx = float(mcd)
        t += dtini
        if abs(t % save_interval) < 1e-6 or abs(
                t % save_interval - save_interval) < 1e-6 \
                or t >= t_final - eps:
            saves.append((t, st.q, st.y))
    return st, saves
