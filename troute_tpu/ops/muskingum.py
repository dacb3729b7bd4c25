"""Vectorized Muskingum-Cunge segment kernel (JAX).

Reproduces the NWM Muskingum-Cunge solver semantics (reference:
``src/kernel/muskingum/MCsingleSegStime_f2py_NOLOOP.f90:8-186`` —
``muskingcungenwm`` with its ``secant2_h``/``courant``/``hydraulic_geometry``
helpers) as a single fused, maskable vector op over an arbitrary batch of
segments.  The reference solves one segment per call inside a Cython reach
loop; here every lane of the input arrays is an independent segment solved
simultaneously on the VPU, with the secant iteration expressed as a masked
``lax.while_loop`` whose per-lane early-exit/retry logic exactly mirrors the
reference's ``do while``/``goto 110`` control flow (including the
search-space expansion retries and the aliased-output quirks of the Fortran:
the interval-1 X formula reads the *previous* iteration's ``Qj_0`` and the
interval-2 X formula reads the interval-1 call's ``C1..C4``).

All math is carried out in the caller-selected dtype (float32 by default,
matching the reference's single precision — ``varPrecision.f90:5``).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

MINDEPTH = 0.01
MAXITER_INIT = 100
MAX_TRIES = 4

# x**(2/3) / x**(5/3) formulation for the secant hot loop.  XLA's generic
# pow carries edge-case select chains and does not share the internal
# log(x) between pow(x, 2/3) and pow(x, 5/3); a single log + exp with
# x**(5/3) = x**(2/3) * x halves the transcendental count per trip.
# Values agree with pow to ~1 ulp (x >= 0 everywhere these are used;
# exp((2/3)*log(0)) = exp(-inf) = 0 matches pow(0, 2/3)).
#
# Default is "pow": in f32 the ~1-ulp difference can flip the secant
# exit iteration, and on the reference test distribution's extreme tail
# (s0 > 1, ql ~ 5e4) one flipped lane landed 2x off the f64 truth where
# the pow path stayed close — the bit-compatible formulation is the safe
# production default.  Set TROUTE_MC_POW=explog to trade that tail risk
# for fewer transcendentals per secant trip (gain unmeasured: the shared
# TPU was unreachable when this was benched; re-measure before enabling).
_POW_MODE = os.environ.get("TROUTE_MC_POW", "pow")


def _p23(x):
    """x ** (2/3) for x >= 0."""
    if _POW_MODE == "pow":
        return x ** (2.0 / 3.0)
    return jnp.exp((2.0 / 3.0) * jnp.log(x))


def _p23_p53(x):
    """(x ** (2/3), x ** (5/3)) for x >= 0 from one log."""
    if _POW_MODE == "pow":
        return x ** (2.0 / 3.0), x ** (5.0 / 3.0)
    p23 = jnp.exp((2.0 / 3.0) * jnp.log(x))
    return p23, p23 * x


class MCOutput(NamedTuple):
    """Per-segment outputs of one Muskingum-Cunge timestep."""

    qdc: jax.Array     # discharge at segment outlet, current timestep (m3/s)
    velc: jax.Array    # mean velocity (m/s)
    depthc: jax.Array  # flow depth (m)
    ck: jax.Array      # kinematic celerity (m/s) — diagnostic
    cn: jax.Array      # Courant number — diagnostic
    X: jax.Array       # Muskingum weighting coefficient — diagnostic


class _Geometry(NamedTuple):
    twl: jax.Array
    h_lt: jax.Array
    h_gt: jax.Array
    area: jax.Array
    areac: jax.Array
    wp: jax.Array
    wpc: jax.Array
    r: jax.Array


def _hydraulic_geometry(h, bfd, bw, twcc, z):
    """Trapezoidal main channel + rectangular compound (overbank) section.

    Mirrors ``hydraulic_geometry`` (reference ``.f90:374-444``), including
    the NWM 3.0 exception: above bankfull with zero floodplain width, the
    trapezoid extends upward instead of spilling.
    """
    twl = bw + 2.0 * z * h
    h_gt = jnp.maximum(h - bfd, 0.0)
    h_lt = jnp.minimum(bfd, h)
    extend_up = (h_gt > 0.0) & (twcc <= 0.0)
    h_gt = jnp.where(extend_up, 0.0, h_gt)
    h_lt = jnp.where(extend_up, h, h_lt)

    area = (bw + h_lt * z) * h_lt
    wp = bw + 2.0 * h_lt * jnp.sqrt(1.0 + z * z)
    areac = twcc * h_gt
    wpc = jnp.where(h_gt > 0.0, twcc + 2.0 * h_gt, 0.0)
    r = (area + areac) / jnp.maximum(wp + wpc, jnp.finfo(h.dtype).tiny)
    return _Geometry(twl, h_lt, h_gt, area, areac, wp, wpc, r)


def _celerity(geom, h, bfd, bw, twcc, z, n, ncc, s0):
    """Kinematic celerity Ck (reference ``.f90:248-268``)."""
    sqrt_s0 = jnp.sqrt(s0)
    r23, r53 = _p23_p53(geom.r)
    # in-channel celerity (dQ/dA for the trapezoid), guarded for h<=0
    denom_ch = bw + 2.0 * h * z
    ck_chan = (sqrt_s0 / n) * (
        (5.0 / 3.0) * r23
        - (2.0 / 3.0) * r53
        * (2.0 * jnp.sqrt(1.0 + z * z) / jnp.maximum(denom_ch, jnp.finfo(h.dtype).tiny))
    )
    # overbank: area-weighted blend of channel and floodplain celerities
    denom_bf = bw + 2.0 * bfd * z
    ck_bf = (sqrt_s0 / n) * (
        (5.0 / 3.0) * r23
        - (2.0 / 3.0) * r53
        * (2.0 * jnp.sqrt(1.0 + z * z) / jnp.maximum(denom_bf, jnp.finfo(h.dtype).tiny))
    )
    safe_ncc = jnp.where(ncc > 0.0, ncc, 1.0)
    ck_fp = (sqrt_s0 / safe_ncc) * (5.0 / 3.0) * _p23(jnp.maximum(h - bfd, 0.0))
    area_tot = geom.area + geom.areac
    safe_area = jnp.maximum(area_tot, jnp.finfo(h.dtype).tiny)
    ck_over = (ck_bf * geom.area + ck_fp * geom.areac) / safe_area

    overbank = (h > bfd) & (twcc > 0.0) & (ncc > 0.0)
    ck = jnp.where(overbank, ck_over, jnp.where(h > 0.0, ck_chan, 0.0))
    return jnp.maximum(0.0, ck)


def _secant2_h(h, interval, qj_in, c_in, qup, quc, qdp, ql,
               z, bw, bfd, twcc, s0, n, ncc, dt, dx):
    """One residual evaluation (reference ``secant2_h``, ``.f90:198-334``).

    ``qj_in`` is the value held in the caller's aliased Qj slot on entry
    (used by the interval-1 X formula); ``c_in`` is the (C1, C2, C3, C4)
    tuple from the preceding interval-1 call (used by the interval-2 X
    formula).  Returns (Qj, C1, C2, C3, C4, X).
    """
    dtype = h.dtype
    tiny = jnp.finfo(dtype).tiny
    geom = _hydraulic_geometry(h, bfd, bw, twcc, z)
    ck = _celerity(geom, h, bfd, bw, twcc, z, n, ncc, s0)

    km = jnp.where(ck > 0.0, jnp.maximum(dt, dx / jnp.maximum(ck, tiny)), dt)

    # X weighting: numerator differs by interval (aliased-output semantics)
    if interval == 1:
        numer = qj_in
        lo = jnp.asarray(0.0, dtype)
    else:
        c1_in, c2_in, c3_in, c4_in = c_in
        numer = c1_in * qup + c2_in * quc + c3_in * qdp + c4_in
        lo = jnp.asarray(0.25, dtype)

    overbank = (h > bfd) & (twcc > 0.0) & (ncc > 0.0) & (ck > 0.0)
    width = jnp.where(overbank, twcc, geom.twl)
    denom = 2.0 * width * s0 * ck * dx
    x_formula = 0.5 * (1.0 - numer / jnp.where(denom != 0.0, denom, 1.0))
    x_clipped = jnp.minimum(0.5, jnp.maximum(lo, x_formula))
    x = jnp.where(ck > 0.0, x_clipped, jnp.asarray(0.5, dtype))

    d = km * (1.0 - x) + dt / 2.0
    safe_d = jnp.where(d != 0.0, d, 1.0)
    c1 = (km * x + dt / 2.0) / safe_d
    c2 = (dt / 2.0 - km * x) / safe_d
    c3 = (km * (1.0 - x) - dt / 2.0) / safe_d
    c4 = (ql * dt) / safe_d

    if interval == 2:
        # channel-loss clamp (only applied on the lower-interval call)
        base = c1 * qup + c2 * quc + c3 * qdp
        c4 = jnp.where((c4 < 0.0) & (jnp.abs(c4) > base), -base, c4)

    wp_tot = geom.wp + geom.wpc
    n_eff = (geom.wp * n + geom.wpc * ncc) / jnp.maximum(wp_tot, tiny)
    q_manning = (1.0 / jnp.maximum(n_eff, tiny)) * (geom.area + geom.areac) \
        * _p23(geom.r) * jnp.sqrt(s0)
    qj = jnp.where(
        wp_tot > 0.0,
        (c1 * qup + c2 * quc + c3 * qdp + c4) - q_manning,
        jnp.asarray(0.0, dtype),
    )
    return qj, c1, c2, c3, c4, x


class _SecantState(NamedTuple):
    h: jax.Array
    h_0: jax.Array
    qj0_slot: jax.Array   # caller's aliased Qj_0 (set by interval-1 calls)
    c1: jax.Array
    c2: jax.Array
    c3: jax.Array
    c4: jax.Array
    x: jax.Array
    rerror: jax.Array
    aerror: jax.Array
    it: jax.Array
    maxiter: jax.Array
    tries: jax.Array
    active: jax.Array   # int32 0/1 (bool vectors can't be carried through
                        # Mosaic while loops)


def muskingum_cunge(qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc, cs, s0,
                    depthp, dt, *, max_trips: int | None = None) -> MCOutput:
    """Route one timestep of Muskingum-Cunge for a batch of segments.

    All arguments are broadcast-compatible arrays (one lane per segment);
    ``dt`` may be scalar.  ``velp`` is not an input: the reference kernel
    never reads it (``mc_reach.pyx:734`` hard-codes it to 0).

    ``max_trips`` optionally caps the total secant trips (parity mode runs
    the full reference schedule, up to 100 + 4 retries of 125..200).
    """
    args = jnp.broadcast_arrays(qup, quc, qdp, ql, dx, bw, tw, twcc, n,
                                ncc, cs, s0, depthp)
    out = solve_block(*args, dt=dt, max_trips=max_trips)
    return MCOutput(*out)


def solve_block(qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc, cs, s0,
                depthp, dt, max_trips: int | None = None):
    """Core solve on same-shaped arrays (also the Pallas per-block body).

    Returns the tuple (qdc, velc, depthc, ck, cn, X).  The caller
    guarantees all arrays share one shape; the single ``while_loop`` exits
    when *every* lane in this batch has converged, so callers wanting
    early exit should hand in small blocks (see ``muskingum_pallas``).
    """
    dtype = jnp.result_type(qup)
    dt = jnp.asarray(dt, dtype)

    z = jnp.where(cs == 0.0, jnp.asarray(1.0, dtype), 1.0 / jnp.where(cs == 0.0, 1.0, cs))
    bfd = jnp.where(
        bw > tw,
        bw / 0.00001,
        jnp.where(bw == tw, bw / (2.0 * z), (tw - bw) / (2.0 * z)),
    )

    depthc0 = jnp.maximum(depthp, 0.0)
    h_init = depthc0 * 1.33 + MINDEPTH
    h0_init = depthc0 * 0.67
    has_flow = (ql > 0.0) | (qup > 0.0) | (quc > 0.0) | (qdp > 0.0)

    zero = jnp.zeros_like(h_init)
    state = _SecantState(
        h=h_init,
        h_0=h0_init,
        qj0_slot=zero,
        c1=zero, c2=zero, c3=zero, c4=zero, x=zero,
        rerror=jnp.full_like(h_init, 1.0),
        aerror=jnp.full_like(h_init, MINDEPTH),
        it=jnp.zeros(h_init.shape, jnp.int32),
        maxiter=jnp.full(h_init.shape, MAXITER_INIT, jnp.int32),
        tries=jnp.zeros(h_init.shape, jnp.int32),
        active=has_flow.astype(jnp.int32),
    )

    def secant_args(h, interval, qj_in, c_in):
        return _secant2_h(h, interval, qj_in, c_in, qup, quc, qdp, ql,
                          z, bw, bfd, twcc, s0, n, ncc, dt, dx)

    def body(st: _SecantState) -> _SecantState:
        # top-of-loop check (reference do-while condition, .f90:83)
        active = st.active == 1
        run = active & (st.rerror > 0.01) & (st.aerror >= MINDEPTH) \
            & (st.it <= st.maxiter)
        finished_loop = active & ~run

        qj0_new, c1a, c2a, c3a, c4a, _x1 = secant_args(st.h_0, 1, st.qj0_slot, None)
        qj_new, c1b, c2b, c3b, c4b, x2 = secant_args(
            st.h, 2, None, (c1a, c2a, c3a, c4a))

        diff = qj0_new - qj_new
        h_1 = jnp.where(diff != 0.0, st.h - (qj_new * (st.h_0 - st.h)) / jnp.where(diff != 0.0, diff, 1.0), st.h)
        h_1 = jnp.where(h_1 < 0.0, st.h, h_1)
        rerr = jnp.where(st.h > 0.0, jnp.abs((h_1 - st.h) / jnp.where(st.h > 0.0, st.h, 1.0)), 0.0)
        aerr = jnp.where(st.h > 0.0, jnp.abs(h_1 - st.h), jnp.asarray(0.9, dtype))
        h0_n = jnp.maximum(0.0, st.h)
        h_n = jnp.maximum(0.0, h_1)
        it_n = st.it + 1

        # apply iteration results on lanes that ran
        h = jnp.where(run, h_n, st.h)
        h_0 = jnp.where(run, h0_n, st.h_0)
        qj0_slot = jnp.where(run, qj0_new, st.qj0_slot)
        c1 = jnp.where(run, c1b, st.c1)
        c2 = jnp.where(run, c2b, st.c2)
        c3 = jnp.where(run, c3b, st.c3)
        c4 = jnp.where(run, c4b, st.c4)
        x = jnp.where(run, x2, st.x)
        rerror = jnp.where(run, rerr, st.rerror)
        aerror = jnp.where(run, aerr, st.aerror)
        it = jnp.where(run, it_n, st.it)

        # label-111 logic: loop exited either via the top check or the
        # small-depth break (.f90:120-122)
        small_h = run & (h < MINDEPTH)
        at_111 = finished_loop | small_h
        hit_max = at_111 & (it >= st.maxiter)
        retry = hit_max & (st.tries + 1 <= MAX_TRIES)

        tries = jnp.where(hit_max, st.tries + 1, st.tries)
        h = jnp.where(retry, h * 1.33, h)
        h_0 = jnp.where(retry, h_0 * 0.67, h_0)
        maxiter = jnp.where(retry, st.maxiter + 25, st.maxiter)
        it = jnp.where(retry, 0, it)
        still_active = active & ~(at_111 & ~retry)

        return _SecantState(h, h_0, qj0_slot, c1, c2, c3, c4, x,
                            rerror, aerror, it, maxiter, tries,
                            still_active.astype(jnp.int32))

    if max_trips is None:
        st = jax.lax.while_loop(lambda s: jnp.any(s.active == 1), body, state)
    else:
        # fast mode: cap total secant trips (body is a no-op on inactive lanes)
        st, _ = jax.lax.while_loop(
            lambda c: jnp.any(c[0].active == 1) & (c[1] < max_trips),
            lambda c: (body(c[0]), c[1] + 1),
            (state, jnp.asarray(0, jnp.int32)),
        )
    h = st.h

    # final discharge (reference .f90:149-161)
    qmc = st.c1 * qup + st.c2 * quc + st.c3 * qdp + st.c4
    base = st.c1 * qup + st.c2 * quc + st.c3 * qdp
    big_loss = (st.c4 < 0.0) & (jnp.abs(st.c4) > base)
    qdc_neg = jnp.where(
        big_loss,
        jnp.zeros_like(qmc),
        jnp.maximum(st.c1 * qup + st.c2 * quc + st.c4,
                    st.c1 * qup + st.c3 * qdp + st.c4),
    )
    qdc = jnp.where(qmc < 0.0, qdc_neg, qmc)

    # velocity from the legacy hydraulic-radius formula (.f90:163-169)
    twl = bw + 2.0 * z * h
    r_leg = (h * (bw + twl) / 2.0) / (
        bw + 2.0 * jnp.sqrt(((twl - bw) / 2.0) ** 2.0 + h ** 2.0))
    velc = (1.0 / n) * _p23(r_leg) * jnp.sqrt(s0)

    qdc = jnp.where(has_flow, qdc, 0.0)
    velc = jnp.where(has_flow, velc, 0.0)
    depthc = jnp.where(has_flow, h, 0.0)
    x_out = jnp.where(has_flow, st.x, 0.0)

    # Courant diagnostics, always computed from the final h (.f90:183,342-367)
    geom = _hydraulic_geometry(h, bfd, bw, twcc, z)
    sqrt_s0 = jnp.sqrt(s0)
    tiny = jnp.finfo(dtype).tiny
    denom_lt = bw + 2.0 * geom.h_lt * z
    r23_f, r53_f = _p23_p53(geom.r)
    ck_ch = (sqrt_s0 / n) * (
        (5.0 / 3.0) * r23_f
        - (2.0 / 3.0) * r53_f
        * (2.0 * jnp.sqrt(1.0 + z * z) / jnp.maximum(denom_lt, tiny)))
    safe_ncc = jnp.where(ncc > 0.0, ncc, 1.0)
    ck_fp = (sqrt_s0 / safe_ncc) * (5.0 / 3.0) * _p23(geom.h_gt)
    area_tot = geom.area + geom.areac
    ck = jnp.maximum(
        0.0,
        jnp.where(area_tot > 0.0,
                  (ck_ch * geom.area + ck_fp * geom.areac)
                  / jnp.maximum(area_tot, tiny),
                  0.0),
    )
    cn = ck * (dt / dx)

    return qdc, velc, depthc, ck, cn, x_out
