"""The routing engine: level-scheduled, fully-vectorized time stepping.

Replaces the reference's Cython network loop
(``mc_reach.pyx:compute_network_structured``) with ``lax.scan`` over
timesteps of fused vector updates:

* **short-timestep mode** (``assume_short_ts=True`` — the NWM production
  configuration): every node's timestep-t state depends only on t-1 state
  (``quc == qup``; within-reach chaining also reads only previous-timestep
  flows), so the entire network — all 2.7M CONUS segments — advances in ONE
  masked vector step per timestep.  No wavefront needed at all.
* **strict mode** (``assume_short_ts=False``): the current-timestep upstream
  flow ``quc`` couples nodes within a timestep.  An inner ``lax.scan`` over
  wavefront levels reproduces the reference's reach-by-reach sequencing at
  node granularity: all nodes of level L update together reading the
  current-timestep buffer written by levels < L.

Reservoirs (collapsed waterbody nodes) and streamflow-nudging DA run as
masked vector ops inside the same scan — no per-object host code.

Semantics parity notes (vs ``mc_reach.pyx``):
- ``qup`` = sum of upstream flows at t-1; ``quc`` = sum at t (or t-1 in
  short mode) — identical treatment for junctions and within-reach links,
  which is exactly what the reference's per-reach kernel does
  (``mc_reach.pyx:499-505,133-138``).
- lateral inflow column index = (t-1) // qts_subdivisions
  (``mc_reach.pyx:723``).
- reservoirs receive inflow == upstream flow sum; the levelpool previous
  inflow equals the current inflow (``bind_lp.f90:71-72``).
- gage DA nudging follows ``simple_da.pyx:21-89`` with exponential decay.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from troute_tpu.network.topology import NODE_RESERVOIR, RoutingTopology
from troute_tpu.ops.levelpool import LevelpoolParams, levelpool_step
from troute_tpu.ops.muskingum import muskingum_cunge
from troute_tpu.ops.reservoir_da import (
    GreatLakesDAState, HybridDAState, RfcDAState,
    typed_reservoir_dispatch)


class ChannelParams(NamedTuple):
    """Columnar per-node MC channel geometry [N]; values at reservoir rows
    are ignored (masked)."""

    dx: jax.Array
    bw: jax.Array
    tw: jax.Array
    twcc: jax.Array
    n: jax.Array
    ncc: jax.Array
    cs: jax.Array
    s0: jax.Array

    @classmethod
    def from_arrays(cls, dtype=jnp.float32, **kw):
        return cls(**{k: jnp.asarray(v, dtype) for k, v in kw.items()})


class NetworkArrays(NamedTuple):
    """Device-resident topology index arrays."""

    upstream: jax.Array      # int32 [N, K], -1 padded
    is_reservoir: jax.Array  # bool [N]
    res_rows: jax.Array      # int32 [n_res] node rows of reservoirs
    level_nodes: jax.Array | None  # int32 [n_levels, W], -1 padded (strict mode)
    # banded upstream-sum plan (routing/upstream_plan.py) — replaces the
    # [N, K] gather (latency-bound on TPU: ~80 ms/step at CONUS scale)
    # with masked shifts (~0.6 ms/step); None falls back to the gather
    uplan: object | None = None


class GageDA(NamedTuple):
    """Streamflow-nudging data assimilation inputs."""

    rows: jax.Array            # int32 [n_gages] node rows with gages
    obs: jax.Array             # f32 [nts+1, n_gages], NaN where missing;
                               # column t aligns with timestep t
    lastobs_val: jax.Array     # f32 [n_gages] last obs before t0 (NaN if none)
    lastobs_time: jax.Array    # f32 [n_gages] obs time in sec rel. to t0 (<=0)
    decay_coeff: float         # minutes


class ReservoirDAData(NamedTuple):
    """Pre-staged reservoir DA inputs, one lane per reservoir slot.

    ``wbody_type`` codes follow the reference (``reservoir_index`` files):
    1 = plain levelpool, 2 = USGS hybrid persistence, 3 = USACE hybrid
    persistence, 4 = CONUS RFC forecast, 5 = Alaska glacier RFC,
    6 = Great Lake (climatology + obs persistence, no levelpool).
    """

    wbody_type: jax.Array          # int32 [n_res]
    hybrid_obs: jax.Array          # [n_res, n_hobs] (NaN = missing)
    hybrid_obs_time: jax.Array     # [n_hobs] seconds since t0
    hybrid_state0: HybridDAState   # [n_res] lanes
    rfc_series: jax.Array          # [n_res, n_counts]
    rfc_counts: jax.Array          # int32 [n_res]
    rfc_use: jax.Array             # bool [n_res]
    rfc_timestep: jax.Array        # [n_res] seconds
    rfc_persist_seconds: jax.Array  # [n_res]
    rfc_state0: RfcDAState
    gl_obs: jax.Array              # [n_res, n_gobs]
    gl_obs_time: jax.Array         # [n_res, n_gobs]
    gl_climatology: jax.Array      # [n_res, 12]
    gl_state0: GreatLakesDAState
    month_idx: jax.Array           # int32 [nts+1] calendar month-1 per step
    obs_lookback_hours: float = 48.0

    @classmethod
    def inactive(cls, n_res: int, nts: int, dtype=jnp.float32):
        """All-levelpool placeholder (no DA)."""
        n = max(n_res, 1)
        f = lambda *s: jnp.zeros(s, dtype)
        return cls(
            wbody_type=jnp.ones(n, jnp.int32),
            hybrid_obs=jnp.full((n, 1), jnp.nan, dtype),
            hybrid_obs_time=jnp.zeros(1, dtype),
            hybrid_state0=HybridDAState(
                persisted_outflow=jnp.full(n, jnp.nan, dtype),
                update_time=f(n), persistence_index=f(n),
                persistence_update_time=f(n)),
            rfc_series=f(n, 1), rfc_counts=jnp.zeros(n, jnp.int32),
            rfc_use=jnp.zeros(n, bool), rfc_timestep=jnp.ones(n, dtype),
            rfc_persist_seconds=f(n),
            rfc_state0=RfcDAState(timeseries_idx=jnp.zeros(n, jnp.int32),
                                  update_time=f(n)),
            gl_obs=jnp.full((n, 1), jnp.nan, dtype),
            gl_obs_time=jnp.zeros((n, 1), dtype),
            gl_climatology=f(n, 12),
            gl_state0=GreatLakesDAState(
                assimilated_outflow=jnp.full(n, jnp.nan, dtype),
                assimilated_time=f(n), update_time=f(n)),
            month_idx=jnp.zeros(nts + 1, jnp.int32))


class RoutingConfig(NamedTuple):
    dt: float
    nts: int
    qts_subdivisions: int = 1
    assume_short_ts: bool = False
    return_courant: bool = False
    # "xla": one network-wide while_loop (best for small domains / strict
    # mode); "pallas": TPU blocked kernel with per-block secant early exit
    # (production choice at scale — see ops/muskingum_pallas.py)
    kernel: str = "xla"
    # strict mode only: replace the sequential level scan with a
    # fixed-point iteration — full-network fused sweeps where quc comes
    # from the previous iterate.  quc perturbations decay geometrically
    # down-reach, so it converges in O(10) sweeps regardless of network
    # depth (the level scan is O(depth) sequential steps — 2,218 for
    # full-res CONUS).  Converges to the level-scan solution; the iterate
    # delta under-bounds the residual by the coupling's contraction
    # factor (~1e-7 agreement at the 1e-9 default on 300-segment chains,
    # tests/test_engine.py) — far inside the kernel's own 1% secant
    # tolerance
    strict_iterative: bool = False
    strict_tol: float = 1e-9
    strict_max_sweeps: int = 64
    # route_stepped strict mode: sweeps compiled per host-polled chunk.
    # Measured on one v5e, CONUS-scale warm (16 sweeps/step to the dtype
    # floor; 16-sublane Pallas blocks): chunk 2 -> 4.0e6, 4 -> 6.5e6,
    # 8 -> 9.8e6, 16 -> 1.23e7 seg-ts/s — fewer host polls beat the
    # wasted sweeps past convergence at every measured size
    strict_sweep_chunk: int = 16
    # route_stepped strict mode: iterate with Gauss-Seidel column sweeps
    # (chains resolve strict_gs_cols lanes per sweep instead of 1 — see
    # _strict_gs_sweep_kernel) when the banded plan allows it; the
    # committed state always comes from one standard Jacobi sweep at the
    # converged iterate, so final semantics are identical.
    # Measured on one v5e at CONUS scale (2.73M lanes, 4-step windows,
    # fetch-forced, 2026-08-20): GS cuts sweeps exactly as designed
    # (32 -> 7 per step at C=16) but each GS sweep costs ~4.8x a Jacobi
    # sweep (58 ms vs 12 ms: 16 SERIALIZED column solves — per-launch
    # overhead and the cols[c-d] dependency chain dominate; traffic is
    # identical) -> net wash (6.7e6 vs 7.0e6 seg-ts/s).  Default stays
    # False on TPU; the flag remains for depth-bound regimes (cold
    # starts, f64 deep chains) where the sweep reduction dominates —
    # tests/test_strict_gs.py pins both parity and the sweep-count win.
    strict_gs: bool = False
    strict_gs_cols: int = 16
    # route_stepped strict mode: linearized-propagation acceleration.
    # The Jacobi sweep's iteration matrix is M = g .* U (per-lane MC
    # gain dq_dc/dq_uc times the upstream-sum operator U) — strictly
    # triangular over the drainage DAG, so each expensive nonlinear
    # sweep propagates the residual exactly ONE edge, and no affine
    # recombination of iterates (Anderson/Chebyshev) can beat M^k e0
    # per sweep.  The residual can, however, be propagated many edges
    # CHEAPLY: near the fixed point q* - q_k ~ sum_j M^j (q_k -
    # q_{k-1}), and each M application is one banded upstream sum times
    # the per-lane gain — no secant solve.  _strict_sweep_kernel fuses
    # `strict_accel_lin` such terms between consecutive sweeps of one
    # compiled chunk (see its docstring for the gain estimator);
    # convergence is still judged only on true-sweep deltas and the
    # committed state always comes from a true sweep, so the fixed
    # point and final semantics are unchanged — only the sweep count
    # drops.  Measured on one v5e (CONUS-scale warm strict windows,
    # same-session best-of-4, 2026-08-20): plain 16 sweeps/step 1.45e7
    # seg-ts/s; accel 8 sweeps/step 2.42e7 (1.67x); lin 4 vs 8 vs 12
    # within noise (2.42/2.31/2.34e7), lin 24 measurably slower
    # (2.05e7); chunk 7 under-converges (14 sweeps via two chunks,
    # 1.54e7) — 8 is the warm convergence floor, so the chunk matches
    # it.  Requires the banded plan (a gather-form linear term would
    # cost ~80 ms/iter at CONUS scale); gated off under strict_gs.
    # Default "auto": ON for the host-stepped production drivers
    # (route_stepped and the sharded stepped driver), OFF for the
    # in-scan XLA forms (route() and the in-scan sharded driver) — the
    # two in-scan engines are each other's ulp-level cross-check
    # (tests/test_cli.py sharded-matches-default), and that invariant
    # only holds when both follow the SAME iteration trajectory: any
    # trajectory change lands f32 trickle lanes on different secant
    # branches and compounds O(tol_eff) per step on small active flows
    # (measured ~1% after 24 LowerColorado steps).  Explicit True/False
    # overrides apply to every driver.
    strict_accel: bool | str = "auto"
    strict_accel_lin: int = 8
    strict_accel_chunk: int = 8
    # route_stepped strict mode: block-granular ACTIVE-SET sweeping
    # (VERDICT r4 #2) — MEASURED DEAD END in the production accel
    # regime; default stays OFF.  The machinery is real and correct
    # (ops/muskingum_pallas._mc_block_kernel_skip: per-sweep flags on
    # drives that moved more than tol_eff/4 since a block's last
    # executed solve; quiescent blocks pass through previous outputs
    # under pl.when; the chunk's final sweep always runs fully so the
    # committed state is a true sweep) and tests pin its semantics, but
    # three measured effects kill the win at CONUS scale (one v5e,
    # 2026-08-20, benchmarks/probe_strict_active.py +
    # bench_strict_skip.py):
    #  1. the accel deliberately propagates residual globally between
    #     sweeps, so sweeps 1-4 of ~8 are 100% active (5: 8%, 6: 2%,
    #     8+: 0%) — Amdahl caps the skip win at ~1.6x before costs;
    #  2. the exact-commit final sweep recomputes coasting lanes, whose
    #     corrections land above tol via f32 secant branch flips, so
    #     convergence needs MORE sweeps (measured 7-8 -> 11-18/step);
    #  3. without the exact commit, committed lanes deviate ~15x the
    #     tolerance (measured 1.9e-4 abs f32) — breaks the 1e-9 strict
    #     contract.
    # Interleaved paired windows: skip OFF 1.35e7 seg-ts/s, ON 1.09e7.
    # NOT the dead straggler-compaction idea (no permutation, no
    # gathers) — but dead for the same underlying reason: the accel
    # already harvests the residual-front structure.  Explicit True
    # remains available for depth-bound non-accel regimes.
    strict_block_skip: bool | str = "auto"   # auto == False (see above)


def mc_linear_gain(ck, x, dx, dt, dtype, q_new=None, g_prev=None,
                   quc=None, quc_prev=None):
    """Per-lane linear gain dq_dc/dq_uc for the strict accelerators.

    Analytic fixed-depth partial C2 = (dt/2 - Km X)/(Km(1-X) + dt/2),
    Km = max(dt, dx/ck) (ops/muskingum.py:169-174, reference
    ``MCsingleSegStime_f2py_NOLOOP.f90``), blended with the measured
    lane response g = (G_k - G_{k-1})/(u_k - u_{k-1}) when the last two
    sweeps' outputs/drives are supplied — the empirical estimate
    includes the secant's depth feedback the fixed-depth C2 misses
    (measured: C2-only captures ~half the coupling) and stays valid
    across accel jumps since each lane's output is a pure function of
    its upstream sum.  Kept only where the drive is resolvable and the
    ratio is a contraction; C2 elsewhere."""
    import jax.numpy as jnp

    tiny = jnp.finfo(dtype).tiny
    dt_ = jnp.asarray(dt, dtype)
    km = jnp.where(ck > 0.0,
                   jnp.maximum(dt_, dx / jnp.maximum(ck, tiny)), dt_)
    den = km * (1.0 - x) + dt_ / 2.0
    gain = (dt_ / 2.0 - km * x) / jnp.where(den != 0.0, den, 1.0)
    if q_new is not None:
        du = quc - quc_prev
        floor = 16.0 * jnp.finfo(dtype).eps * (jnp.abs(quc) + 1.0)
        g_emp = (q_new - g_prev) / jnp.where(jnp.abs(du) > floor, du, 1.0)
        ok = (jnp.abs(du) > floor) & jnp.isfinite(g_emp) \
            & (jnp.abs(g_emp) < 1.0)
        gain = jnp.where(ok, g_emp, gain)
    return gain


def accel_gain(ck, x, dx, dt, dtype, q_new, g_prev, quc, quc_prev,
               emp_ok):
    """Gain estimate for one accelerator insertion (shared by the three
    strict accelerators — ``route()``'s while body, the host-polled
    ``_strict_sweep_kernel`` and the sharded sweep fn).

    ``emp_ok`` says whether (``g_prev``, ``quc_prev``) really are the
    previous sweep's response pair (k >= 1): a Python bool at trace-time
    sweep indices, a traced bool inside ``while_loop`` (selected
    lane-wise).  When not, the analytic fixed-depth C2 alone is used —
    at k = 0 the drive would be vs the previous TIMESTEP's sums, not a
    sweep response.  Callers still zero the gain on reservoir / gage
    (and, sharded, boundary) lanes, which differ structurally per
    driver."""
    if emp_ok is False or g_prev is None:
        return mc_linear_gain(ck, x, dx, dt, dtype)
    g_emp = mc_linear_gain(ck, x, dx, dt, dtype, q_new=q_new,
                           g_prev=g_prev, quc=quc, quc_prev=quc_prev)
    if emp_ok is True:
        return g_emp
    return jnp.where(emp_ok, g_emp,
                     mc_linear_gain(ck, x, dx, dt, dtype))


def apply_linear_accel(q_new, dq, gain, sum_fn, n_terms: int):
    """Linearized-propagation jump: q* ~ q_new + sum_{j=1..n} (g.*U)^j dq
    with U applied by ``sum_fn`` (the driver's upstream-sum form) — the
    shared core of the three strict accelerators (see
    ``RoutingConfig.strict_accel``).  Clamped at zero like the sweeps'
    own output."""
    acc = q_new
    lin = dq
    for _ in range(int(n_terms)):
        lin = gain * sum_fn(lin)
        acc = acc + lin
    return jnp.maximum(acc, 0.0)


def _accel_enabled(cfg: "RoutingConfig", stepped: bool) -> bool:
    """Resolve ``strict_accel`` ("auto" -> ON for the host-stepped
    production drivers, OFF for the in-scan XLA forms, which serve as
    each other's same-trajectory ulp-level cross-check — see the
    RoutingConfig comment)."""
    v = cfg.strict_accel
    if v == "auto":
        return stepped
    return bool(v)


class RoutingState(NamedTuple):
    """Scan carry."""

    q: jax.Array             # [N] flow at current step
    depth: jax.Array         # [N] depth (MC) / water elevation (reservoir)
    res_elev: jax.Array      # [n_res] reservoir water elevation
    lastobs_val: jax.Array   # [n_gages]
    lastobs_time: jax.Array  # [n_gages]
    hybrid: HybridDAState | None = None
    rfc: RfcDAState | None = None
    gl: GreatLakesDAState | None = None


def network_arrays_from_topology(topo: RoutingTopology,
                                 need_levels: bool,
                                 level_chunk_width: int | None = None,
                                 upstream_plan: bool = True
                                 ) -> NetworkArrays:
    """``level_chunk_width`` bounds the strict-mode schedule's row width
    (memory O(N) instead of O(levels x widest level)); None keeps one row
    per level.  ``upstream_plan`` builds the banded upstream-sum plan
    (kept when it covers enough edges; see ``routing/upstream_plan.py``)."""
    if need_levels:
        if level_chunk_width is not None:
            levels = jnp.asarray(topo.level_chunks(level_chunk_width))
        else:
            levels = jnp.asarray(topo.level_nodes)
    else:
        levels = None
    upstream = np.asarray(topo.upstream)
    uop = None
    if upstream_plan:
        from troute_tpu.routing.upstream_plan import (build_upstream_plan,
                                                      device_op)
        n_pad = -(-topo.n_nodes // 1024) * 1024
        plan = build_upstream_plan(upstream, n_pad)
        if plan is not None:
            upstream = plan.upstream_sorted
            uop = device_op(plan)
    return NetworkArrays(
        upstream=jnp.asarray(upstream),
        is_reservoir=jnp.asarray(topo.node_type == NODE_RESERVOIR),
        res_rows=jnp.asarray(topo.reservoir_rows),
        level_nodes=levels,
        uplan=uop,
    )


def _upstream_sum(q: jax.Array, upstream: jax.Array) -> jax.Array:
    """[N] sum of q over each node's (padded) upstream list."""
    safe = jnp.maximum(upstream, 0)
    vals = q[safe]
    return jnp.where(upstream >= 0, vals, 0.0).sum(axis=1)


def _upstream_sum_net(q: jax.Array, net: NetworkArrays) -> jax.Array:
    """Full-network upstream sum: banded plan when available for this
    padded length, else the [N, K] gather."""
    if net.uplan is not None and q.shape[0] == net.uplan.n_pad:
        return net.uplan(q)
    return _upstream_sum(q, net.upstream)


def _apply_nudging(q, t_seconds, da: GageDA, lastobs_val, lastobs_time,
                   obs_t):
    """Vectorized ``simple_da`` (reference ``simple_da.pyx:21-89``)."""
    model = q[da.rows]
    have_obs = ~jnp.isnan(obs_t)

    minutes = (t_seconds - lastobs_time) / 60.0
    weight = jnp.exp(jnp.abs(minutes) / -da.decay_coeff)
    shift = (lastobs_val - model) * weight
    no_memory = jnp.isnan(obs_t) & jnp.isnan(lastobs_val)

    replaced = jnp.where(have_obs, obs_t,
                         jnp.where(no_memory, model, model + shift))
    nudge = jnp.where(have_obs, obs_t - model,
                      jnp.where(no_memory, 0.0, shift))
    new_val = jnp.where(have_obs, obs_t, lastobs_val)
    new_time = jnp.where(have_obs, t_seconds, lastobs_time)

    q = q.at[da.rows].set(replaced)
    return q, nudge, new_val, new_time


def route(net: NetworkArrays, chan: ChannelParams,
          res_params: LevelpoolParams, cfg: RoutingConfig,
          q0: jax.Array, depth0: jax.Array, res_elev0: jax.Array,
          qlat: jax.Array, da: GageDA | None = None,
          res_da: ReservoirDAData | None = None):
    """Route the full network for ``cfg.nts`` timesteps.

    Args:
        q0, depth0: [N] initial flow / depth (reservoir rows: initial
            outflow / initial elevation)
        res_elev0: [n_res] initial reservoir water elevations
        qlat: [n_qlat_cols, N] lateral inflows, column (t-1)//qts_subdivisions
        da: optional gage nudging inputs

    Returns:
        dict with 'flowveldepth' [nts, N, 3] (q, vel, depth-or-elev),
        'nudge' [nts, n_gages] (if da), 'courant' [nts, N, 3] (if enabled),
        and the final RoutingState.

    The computation runs under one module-level ``jax.jit`` with every
    array as an ARGUMENT: tracing the scan eagerly would close over the
    network arrays as jaxpr constants, so each CLI invocation (fresh
    arrays, same shapes) would recompile the whole program (measured
    1.2 s of a 1.6 s warm Laura run).  Only the strict level-scan's
    gage/reservoir level tables are built host-side here.
    """
    if not cfg.assume_short_ts and not cfg.strict_iterative:
        # which wavefront level each gage / reservoir row lives at
        if net.level_nodes is None:
            raise ValueError("strict mode requires NetworkArrays.level_nodes")
        ln_np = np.asarray(net.level_nodes)
        rows_np = (np.asarray(da.rows)
                   if da is not None and int(da.rows.shape[0]) > 0
                   else np.zeros(0, np.int64))
        gla = np.zeros((ln_np.shape[0], rows_np.size), bool)
        for gi, r in enumerate(rows_np):
            lvl = np.nonzero((ln_np == r).any(axis=1))[0]
            gla[lvl, gi] = True
        gage_level_active = jnp.asarray(gla)
        n_res_static = int(net.res_rows.shape[0])
        rla = np.zeros((ln_np.shape[0], max(n_res_static, 1)), bool)
        for si, r in enumerate(np.asarray(net.res_rows)):
            lvl = np.nonzero((ln_np == r).any(axis=1))[0]
            rla[lvl, si] = True
        res_level_active = jnp.asarray(rla)
    else:
        gage_level_active = None
        res_level_active = None
    return _route_jit(net, chan, res_params, q0, depth0, res_elev0,
                      qlat, da, res_da, gage_level_active,
                      res_level_active, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _route_jit(net: NetworkArrays, chan: ChannelParams,
               res_params: LevelpoolParams,
               q0: jax.Array, depth0: jax.Array, res_elev0: jax.Array,
               qlat: jax.Array, da: GageDA | None,
               res_da: ReservoirDAData | None,
               gage_level_active, res_level_active, cfg: RoutingConfig):
    # Pad the node axis to a multiple of 1024 (8 sublanes x 128 lanes):
    # unaligned gathers compile pathologically on TPU (minutes vs ~1s) and
    # the Pallas kernel wants whole tiles.  Pad rows are isolated no-flow
    # nodes; outputs are sliced back before returning.
    n_real = q0.shape[0]
    pad = (-n_real) % 1024
    if pad:
        pad1 = lambda a, fill=0.0: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        q0, depth0 = pad1(q0), pad1(depth0)
        chan = ChannelParams(*[pad1(c, 1.0) for c in chan])
        qlat = jnp.concatenate(
            [qlat, jnp.zeros((qlat.shape[0], pad), qlat.dtype)], axis=1)
        net = net._replace(
            upstream=jnp.concatenate(
                [net.upstream,
                 jnp.full((pad, net.upstream.shape[1]), -1, jnp.int32)]),
            is_reservoir=jnp.concatenate(
                [net.is_reservoir, jnp.zeros(pad, bool)]))

    dtype = q0.dtype
    n = q0.shape[0]
    have_da = da is not None and int(da.rows.shape[0]) > 0
    if not have_da:
        da = GageDA(rows=jnp.zeros((0,), jnp.int32),
                    obs=jnp.full((1, 0), jnp.nan, dtype),
                    lastobs_val=jnp.zeros((0,), dtype),
                    lastobs_time=jnp.zeros((0,), dtype),
                    decay_coeff=120.0)

    dt = jnp.asarray(cfg.dt, dtype)
    res_mask = net.is_reservoir

    if not cfg.assume_short_ts and not cfg.strict_iterative \
            and net.level_nodes is None:
        raise ValueError("strict mode requires NetworkArrays.level_nodes")

    # keep reservoir arrays non-empty so strict-mode gathers stay in bounds
    if int(net.res_rows.shape[0]) == 0:
        res_params = LevelpoolParams(
            *[jnp.ones((1,), dtype) for _ in LevelpoolParams._fields])
        res_elev0 = jnp.zeros((1,), dtype)

    have_res_da = res_da is not None
    if res_da is None:
        res_da = ReservoirDAData.inactive(int(res_elev0.shape[0]), cfg.nts,
                                          dtype)

    def mc_all(qup, quc, q_prev, d_prev, ql_t):
        if cfg.kernel == "pallas":
            from troute_tpu.ops.muskingum_pallas import muskingum_cunge_pallas
            return muskingum_cunge_pallas(
                qup, quc, q_prev, ql_t, chan.dx, chan.bw, chan.tw,
                chan.twcc, chan.n, chan.ncc, chan.cs, chan.s0, d_prev,
                float(cfg.dt), with_diagnostics=cfg.return_courant)
        out = muskingum_cunge(qup, quc, q_prev, ql_t, chan.dx, chan.bw,
                              chan.tw, chan.twcc, chan.n, chan.ncc,
                              chan.cs, chan.s0, d_prev, dt)
        return out

    def typed_dispatch(elev_prev, inflow, hyb_in, rfc_in, gl_in, now,
                       month_i):
        """Levelpool + per-type reservoir DA on all [n_res] lanes; mirrors
        the reference's dispatch (``mc_reach.pyx:507-717``).  Returns
        (outflow, elev, d_scatter, hyb, rfc, gl)."""
        lp_out, lp_elev = levelpool_step(elev_prev, inflow, inflow,
                                         jnp.zeros_like(inflow), dt,
                                         res_params)
        if not have_res_da:
            return lp_out, lp_elev, lp_elev, hyb_in, rfc_in, gl_in
        return typed_reservoir_dispatch(
            res_da.wbody_type, res_da.hybrid_obs, res_da.hybrid_obs_time,
            hyb_in, res_da.rfc_series, res_da.rfc_counts, res_da.rfc_use,
            res_da.rfc_timestep, res_da.rfc_persist_seconds, rfc_in,
            res_da.gl_obs, res_da.gl_obs_time, res_da.gl_climatology,
            gl_in, res_da.obs_lookback_hours,
            elev_prev, inflow, lp_out, lp_elev, now, month_i,
            res_params.area, res_params.max_depth,
            res_params.orifice_elev, dt)

    def reservoirs(q_new, d_new, inflow_all, state: RoutingState, now,
                   month_i):
        """Run all reservoirs via ``typed_dispatch`` and scatter outflow
        and elevation into the node arrays."""
        if int(net.res_rows.shape[0]) == 0:
            return q_new, d_new, state.res_elev, state.hybrid, state.rfc, \
                state.gl
        inflow = inflow_all[net.res_rows]
        outflow, elev, d_scatter, hyb, rfc, gl = typed_dispatch(
            state.res_elev, inflow, state.hybrid, state.rfc, state.gl,
            now, month_i)
        q_new = q_new.at[net.res_rows].set(outflow)
        d_new = d_new.at[net.res_rows].set(d_scatter)
        return q_new, d_new, elev, hyb, rfc, gl

    def step_short(state: RoutingState, xs):
        t, qlat_col, obs_t, month_i = xs
        ql_t = qlat[qlat_col]
        up_prev = _upstream_sum_net(state.q, net)
        now = t.astype(dtype) * dt

        out = mc_all(up_prev, up_prev, state.q, state.depth, ql_t)
        q_new = jnp.where(res_mask, state.q, out.qdc)
        v_new = jnp.where(res_mask, 0.0, out.velc)
        d_new = jnp.where(res_mask, state.depth, out.depthc)
        q_new, d_new, res_elev, hyb, rfc, gl = reservoirs(
            q_new, d_new, up_prev, state, now, month_i)

        if have_da:
            q_new, nudge, lo_val, lo_time = _apply_nudging(
                q_new, now, da, state.lastobs_val, state.lastobs_time,
                obs_t)
        else:
            nudge = jnp.zeros((0,), dtype)
            lo_val, lo_time = state.lastobs_val, state.lastobs_time

        new_state = RoutingState(q_new, d_new, res_elev, lo_val, lo_time,
                                 hyb, rfc, gl)
        ys = {"fvd": jnp.stack([q_new, v_new, d_new], axis=-1),
              "nudge": nudge}
        if cfg.return_courant:
            ys["courant"] = jnp.stack([out.cn, out.ck, out.X], axis=-1)
        return new_state, ys

    def step_strict(state: RoutingState, xs):
        t, qlat_col, obs_t, month_i = xs
        ql_t = qlat[qlat_col]
        up_prev = _upstream_sum_net(state.q, net)
        t_seconds = t.astype(dtype) * dt

        # Current-timestep buffer, written level by level.  Levels < L are
        # final when level L reads them; the initial value is never read
        # because every upstream neighbor is at a strictly lower level.
        # Gage nudging applies inside the level scan — the reference nudges
        # a gage reach before downstream reaches compute within the same
        # timestep, so level L+1 must see the nudged value.
        def level_body(carry, level_xs):
            rows, gage_active, res_active = level_xs
            (q_cur, v_cur, d_cur, res_elev, lo_val, lo_time, nudge_acc,
             courant, hyb_s, rfc_s, gl_s) = carry
            valid = rows >= 0
            safe_rows = jnp.maximum(rows, 0)

            quc_rows = _upstream_sum(q_cur, net.upstream[safe_rows])
            qup_rows = up_prev[safe_rows]
            out = muskingum_cunge(
                qup_rows, quc_rows, state.q[safe_rows],
                ql_t[safe_rows], chan.dx[safe_rows], chan.bw[safe_rows],
                chan.tw[safe_rows], chan.twcc[safe_rows], chan.n[safe_rows],
                chan.ncc[safe_rows], chan.cs[safe_rows], chan.s0[safe_rows],
                state.depth[safe_rows], dt)

            is_res_row = res_mask[safe_rows]
            q_rows = jnp.where(is_res_row, q_cur[safe_rows], out.qdc)
            v_rows = jnp.where(is_res_row, 0.0, out.velc)
            d_rows = jnp.where(is_res_row, d_cur[safe_rows], out.depthc)

            scatter_rows = jnp.where(valid, safe_rows, q_cur.shape[0])
            q_cur = q_cur.at[scatter_rows].set(q_rows, mode="drop")
            v_cur = v_cur.at[scatter_rows].set(v_rows, mode="drop")
            d_cur = d_cur.at[scatter_rows].set(d_rows, mode="drop")

            # reservoirs whose level is this chunk: full typed dispatch
            # (levelpool + DA, mc_reach.pyx:507-717) committed lane-wise —
            # downstream levels then read the assimilated outflow
            if n_res_static:
                inflow_res = _upstream_sum(q_cur,
                                           net.upstream[net.res_rows])
                outflow, elev, d_scatter, hyb_n, rfc_n, gl_n = \
                    typed_dispatch(res_elev, inflow_res, hyb_s, rfc_s,
                                   gl_s, t_seconds, month_i)
                res_elev = jnp.where(res_active, elev, res_elev)
                q_cur = q_cur.at[net.res_rows].set(
                    jnp.where(res_active, outflow, q_cur[net.res_rows]))
                d_cur = d_cur.at[net.res_rows].set(
                    jnp.where(res_active, d_scatter,
                              d_cur[net.res_rows]))
                if have_res_da:
                    sel = lambda new, old: jax.tree.map(
                        lambda a, b: jnp.where(res_active, a, b), new, old)
                    hyb_s = sel(hyb_n, hyb_s)
                    rfc_s = sel(rfc_n, rfc_s)
                    gl_s = sel(gl_n, gl_s)

            # nudge the gages that live at this level (row-local: full-[N]
            # masks per level step would dominate the scan)
            if have_da:
                q_nudged, nudge, val_n, time_n = _apply_nudging(
                    q_cur, t_seconds, da, lo_val, lo_time, obs_t)
                at_rows = jnp.where(gage_active, q_nudged[da.rows],
                                    q_cur[da.rows])
                q_cur = q_cur.at[da.rows].set(at_rows)
                lo_val = jnp.where(gage_active, val_n, lo_val)
                lo_time = jnp.where(gage_active, time_n, lo_time)
                nudge_acc = jnp.where(gage_active, nudge, nudge_acc)

            if cfg.return_courant:
                c_rows = jnp.stack([out.cn, out.ck, out.X], axis=-1)
                courant = courant.at[scatter_rows].set(c_rows, mode="drop")
            return (q_cur, v_cur, d_cur, res_elev, lo_val, lo_time,
                    nudge_acc, courant, hyb_s, rfc_s, gl_s), None

        courant0 = (jnp.zeros((n, 3), dtype) if cfg.return_courant
                    else jnp.zeros((0,), dtype))
        n_g = da.rows.shape[0]
        (q_new, v_new, d_new, res_elev, lo_val, lo_time, nudge, courant,
         hyb, rfc, gl), _ = \
            jax.lax.scan(
                level_body,
                (state.q, jnp.zeros_like(state.q), state.depth,
                 state.res_elev, state.lastobs_val, state.lastobs_time,
                 jnp.zeros((n_g,), dtype), courant0, state.hybrid,
                 state.rfc, state.gl),
                (net.level_nodes, gage_level_active, res_level_active))

        new_state = RoutingState(q_new, d_new, res_elev, lo_val, lo_time,
                                 hyb, rfc, gl)
        ys = {"fvd": jnp.stack([q_new, v_new, d_new], axis=-1),
              "nudge": nudge}
        if cfg.return_courant:
            ys["courant"] = courant
        return new_state, ys

    def step_strict_iter(state: RoutingState, xs):
        """Fixed-point form of the strict step: sweep the fused
        full-network kernel with quc from the previous iterate until the
        current-step flows stop changing, then materialize outputs from
        the converged flows.  Matches the level scan to ``strict_tol``
        (exactly, in at most network-depth sweeps) — same within-step
        semantics: reservoirs see current-step upstream inflows and gage
        nudging feeds downstream segments of the same step."""
        t, qlat_col, obs_t, month_i = xs
        ql_t = qlat[qlat_col]
        up_prev = _upstream_sum_net(state.q, net)
        now = t.astype(dtype) * dt

        def sweep_once(q_est, quc=None):
            if quc is None:
                quc = _upstream_sum_net(q_est, net)
            out = muskingum_cunge(up_prev, quc, state.q, ql_t, chan.dx,
                                  chan.bw, chan.tw, chan.twcc, chan.n,
                                  chan.ncc, chan.cs, chan.s0, state.depth,
                                  dt)
            q_new = jnp.where(res_mask, state.q, out.qdc)
            v_new = jnp.where(res_mask, 0.0, out.velc)
            d_new = jnp.where(res_mask, state.depth, out.depthc)
            q_new, d_new, res_elev, hyb, rfc, gl = reservoirs(
                q_new, d_new, quc, state, now, month_i)
            if have_da:
                q_new, nudge, lo_val, lo_time = _apply_nudging(
                    q_new, now, da, state.lastobs_val, state.lastobs_time,
                    obs_t)
            else:
                nudge = jnp.zeros((0,), dtype)
                lo_val, lo_time = state.lastobs_val, state.lastobs_time
            return (q_new, v_new, d_new, res_elev, lo_val, lo_time, nudge,
                    hyb, rfc, gl, out)

        # Convergence floor: ``strict_tol`` is an absolute |dq| bound the
        # dtype may not be able to resolve (f32 eps at q ~ 1e6 is ~0.12,
        # five orders above 1e-9), so the iterate is also converged once
        # its changes fall below a few ulps of the largest flow — the
        # fixed point at the dtype's own resolution.
        eps4 = 4.0 * jnp.asarray(jnp.finfo(dtype).eps, dtype)

        # linearized-propagation acceleration inside the while body (the
        # same scheme as _strict_sweep_kernel — see RoutingConfig
        # .strict_accel): each iteration is one true sweep plus
        # strict_accel_lin cheap linear terms.  The accel jump is
        # skipped (lax.select) once delta nears the tolerance so the
        # exit iterate is a plain sweep result; the post-loop commit
        # sweep then matches the unaccelerated contract to O(tol).
        use_accel_iter = (_accel_enabled(cfg, stepped=False)
                          and cfg.strict_accel_lin > 0)

        def body(carry):
            q_est, _d, _qm, k, g_prev, u_prev = carry
            quc = _upstream_sum_net(q_est, net)
            sw = sweep_once(q_est, quc)
            q_new, out = sw[0], sw[10]
            dq = q_new - q_est
            delta = jnp.max(jnp.abs(dq))
            qmax = jnp.max(jnp.abs(q_new))
            q_next = q_new
            if use_accel_iter:
                # inside while_loop k is traced, so the empirical
                # estimate is gated lane-wise on k >= 1 (at k=0 the
                # drive du is vs the previous TIMESTEP's sums — not a
                # sweep response — and must not be used)
                gain = accel_gain(out.ck, out.X, chan.dx, dt, dtype,
                                  q_new, g_prev, quc, u_prev,
                                  emp_ok=(k >= 1))
                gain = jnp.where(res_mask, 0.0, gain)
                if have_da:
                    gain = gain.at[da.rows].set(0.0)
                acc = apply_linear_accel(
                    q_new, dq, gain, lambda v: _upstream_sum_net(v, net),
                    cfg.strict_accel_lin)
                tol = jnp.maximum(jnp.asarray(cfg.strict_tol, dtype),
                                  eps4 * qmax)
                q_next = jnp.where(delta > 4.0 * tol, acc, q_new)
            return q_next, delta, qmax, k + 1, q_new, quc

        def cond(c):
            tol = jnp.maximum(jnp.asarray(cfg.strict_tol, dtype),
                              eps4 * c[2])
            return (c[3] < cfg.strict_max_sweeps) & (c[1] > tol)

        q_fp, _, _, _, _, _ = jax.lax.while_loop(
            cond, body, (state.q, jnp.asarray(jnp.inf, dtype),
                         jnp.asarray(0.0, dtype), jnp.int32(0),
                         state.q, up_prev))

        (q_new, v_new, d_new, res_elev, lo_val, lo_time, nudge, hyb, rfc,
         gl, out) = sweep_once(q_fp)
        new_state = RoutingState(q_new, d_new, res_elev, lo_val, lo_time,
                                 hyb, rfc, gl)
        ys = {"fvd": jnp.stack([q_new, v_new, d_new], axis=-1),
              "nudge": nudge}
        if cfg.return_courant:
            ys["courant"] = jnp.stack([out.cn, out.ck, out.X], axis=-1)
        return new_state, ys

    n_res_static = int(net.res_rows.shape[0])

    ts = jnp.arange(1, cfg.nts + 1, dtype=jnp.int32)
    qlat_cols = ((ts - 1) // cfg.qts_subdivisions).astype(jnp.int32)
    # observation column t aligned with timestep t; NaN once past the series
    n_obs_t = da.obs.shape[0]
    obs_idx = jnp.minimum(ts, n_obs_t - 1) if n_obs_t > 0 else ts * 0
    obs_seq = jnp.where(
        (ts < n_obs_t)[:, None],
        da.obs[obs_idx] if n_obs_t > 0 else jnp.zeros((cfg.nts, 0), dtype),
        jnp.nan)

    month_seq = res_da.month_idx[ts] if res_da.month_idx.shape[0] > cfg.nts \
        else jnp.zeros(cfg.nts, jnp.int32)

    state0 = RoutingState(
        q=q0, depth=depth0, res_elev=res_elev0,
        lastobs_val=da.lastobs_val, lastobs_time=da.lastobs_time,
        hybrid=res_da.hybrid_state0, rfc=res_da.rfc_state0,
        gl=res_da.gl_state0)

    if cfg.assume_short_ts:
        step = step_short
    elif cfg.strict_iterative:
        step = step_strict_iter
    else:
        step = step_strict
    final_state, ys = jax.lax.scan(step, state0,
                                   (ts, qlat_cols, obs_seq, month_seq))

    if pad:
        ys["fvd"] = ys["fvd"][:, :n_real]
        if cfg.return_courant:
            ys["courant"] = ys["courant"][:, :n_real]
        final_state = final_state._replace(
            q=final_state.q[:n_real], depth=final_state.depth[:n_real])

    out = {"flowveldepth": ys["fvd"], "nudge": ys["nudge"],
           "state": final_state}
    if cfg.return_courant:
        out["courant"] = ys["courant"]
    return out


def _upstream_sum_stepped(q, upstream, uplan):
    """Per-node upstream flow sums for the stepped drivers (banded plan
    when available, masked gather otherwise)."""
    if uplan is not None and q.shape[0] == uplan.n_pad:
        return uplan(q)
    vals = q[jnp.maximum(upstream, 0)]
    return jnp.where(upstream >= 0, vals, 0.0).sum(axis=1)


def _one_short_step(q, depth, res_elev, lo_val, lo_time, ql_t, obs_t,
                    t_seconds, upstream, chan: ChannelParams,
                    res_params: LevelpoolParams, is_res, res_rows,
                    gage_rows, decay_coeff, dt, res_da=None,
                    da_states=None, month_i=None, return_courant=False,
                    uplan=None, quc=None, active_rows=None, prev=None,
                    want_raw=False):
    """Body of one short-timestep routing step (Pallas MC + reservoirs +
    nudging, optional typed reservoir DA); traced inside the jitted
    single/multi-step kernels.

    ``quc`` (current-timestep upstream sums) defaults to the
    previous-timestep sums — the ``assume_short_ts`` approximation
    (``mc_reach.pyx:499-505`` with quc=qup).  The strict fixed-point
    driver passes the sweep iterate's sums instead; reservoirs then see
    current-step inflows, like ``route()``'s strict modes."""
    dtype = q.dtype
    up_prev = _upstream_sum_stepped(q, upstream, uplan)
    if quc is None:
        quc = up_prev

    from troute_tpu.ops.muskingum_pallas import muskingum_cunge_pallas
    out = muskingum_cunge_pallas(
        up_prev, quc, q, ql_t, chan.dx, chan.bw, chan.tw, chan.twcc,
        chan.n, chan.ncc, chan.cs, chan.s0, depth, float(dt),
        with_diagnostics=return_courant, active_rows=active_rows,
        prev=prev)
    # cn/ck/X diagnostics straight from the kernel, like the reference hot
    # loop (MCsingleSegStime_f2py_NOLOOP.f90:342-367) and route()'s modes
    courant = (jnp.stack([out.cn, out.ck, out.X], axis=-1)
               if return_courant else None)

    q_new = jnp.where(is_res, q, out.qdc)
    v_new = jnp.where(is_res, 0.0, out.velc)
    d_new = jnp.where(is_res, depth, out.depthc)

    if res_rows.shape[0]:
        inflow = quc[res_rows]
        lp_out, lp_elev = levelpool_step(res_elev, inflow, inflow,
                                         jnp.zeros_like(inflow),
                                         jnp.asarray(dt, dtype), res_params)
        if res_da is not None:
            hyb_s, rfc_s, gl_s = da_states
            outflow, elev, d_scat, hyb_s, rfc_s, gl_s = \
                typed_reservoir_dispatch(
                    res_da.wbody_type, res_da.hybrid_obs,
                    res_da.hybrid_obs_time, hyb_s, res_da.rfc_series,
                    res_da.rfc_counts, res_da.rfc_use, res_da.rfc_timestep,
                    res_da.rfc_persist_seconds, rfc_s, res_da.gl_obs,
                    res_da.gl_obs_time, res_da.gl_climatology, gl_s,
                    res_da.obs_lookback_hours, res_elev, inflow, lp_out,
                    lp_elev, t_seconds, month_i, res_params.area,
                    res_params.max_depth, res_params.orifice_elev,
                    jnp.asarray(dt, dtype))
            da_states = (hyb_s, rfc_s, gl_s)
        else:
            outflow, elev, d_scat = lp_out, lp_elev, lp_elev
        q_new = q_new.at[res_rows].set(outflow)
        d_new = d_new.at[res_rows].set(d_scat)
        res_elev = elev

    nudge = jnp.zeros((gage_rows.shape[0],), dtype)
    if gage_rows.shape[0]:
        da = GageDA(rows=gage_rows, obs=obs_t[None], lastobs_val=lo_val,
                    lastobs_time=lo_time, decay_coeff=decay_coeff)
        q_new, nudge, lo_val, lo_time = _apply_nudging(
            q_new, t_seconds, da, lo_val, lo_time, obs_t)

    res = (q_new, v_new, d_new, res_elev, lo_val, lo_time, nudge,
           da_states, courant)
    return res + (out,) if want_raw else res


@functools.partial(jax.jit, static_argnames=("decay_coeff", "dt"))
def _stepped_kernel(q, depth, res_elev, lo_val, lo_time, ql_t, obs_t,
                    t_seconds, upstream, chan: ChannelParams,
                    res_params: LevelpoolParams, is_res, res_rows,
                    gage_rows, decay_coeff, dt, uplan=None):
    """One short-timestep routing step as a pure jitted function.

    The Pallas MC kernel cannot currently live inside ``lax.scan`` on this
    toolchain (Mosaic-in-scan compile hang), so production stepping drives
    compiled steps from the host.  All arrays are arguments — closing over
    network-sized constants bakes them into the compile payload.
    """
    return _one_short_step(q, depth, res_elev, lo_val, lo_time, ql_t,
                           obs_t, t_seconds, upstream, chan, res_params,
                           is_res, res_rows, gage_rows, decay_coeff,
                           dt, uplan=uplan)[:7]


@functools.partial(jax.jit,
                   static_argnames=("decay_coeff", "dt", "k_steps",
                                    "qts", "collect", "return_courant"))
def _stepped_kernel_multi(q, depth, res_elev, lo_val, lo_time, qlat,
                          obs, t0_idx, upstream,
                          chan: ChannelParams,
                          res_params: LevelpoolParams, is_res, res_rows,
                          gage_rows, decay_coeff, dt, k_steps, qts,
                          collect, res_da=None, da_states=None,
                          month_idx=None, return_courant=False,
                          uplan=None):
    """``k_steps`` short timesteps unrolled in ONE compiled program (a
    Python loop, not ``lax.scan`` — see the Mosaic note above).  Amortizes
    the per-dispatch host/tunnel latency that otherwise dominates the
    production stepper's wall time.

    The per-step forcing/observation/month rows are sliced from the FULL
    device-resident tables in-jit (``t0_idx`` is the window's first
    timestep): building the [k, N] blocks host-side cost 2-3 extra
    tunnel round trips per window (measured ~18% of a warm CONUS
    window, round 5).
    """
    dtype = q.dtype
    n_obs_t = obs.shape[0]
    fvds, nudges, courants = [], [], []
    for k in range(k_steps):
        t_idx = t0_idx + jnp.int32(k)
        t_seconds = t_idx.astype(dtype) * jnp.asarray(dt, dtype)
        col = (t_idx - 1) // qts
        ql_t = jax.lax.dynamic_index_in_dim(qlat, col, 0, keepdims=False)
        if obs.shape[1]:
            oc = jnp.clip(t_idx, 0, n_obs_t - 1)
            obs_t = jax.lax.dynamic_index_in_dim(obs, oc, 0,
                                                 keepdims=False)
            obs_t = jnp.where(t_idx < n_obs_t, obs_t, jnp.nan)
        else:
            obs_t = jnp.zeros((0,), dtype)
        month_i = (jax.lax.dynamic_index_in_dim(
                       month_idx,
                       jnp.clip(t_idx, 0, month_idx.shape[0] - 1), 0,
                       keepdims=False)
                   if res_da is not None else None)
        (q, v, depth, res_elev, lo_val, lo_time, nudge,
         da_states, courant) = _one_short_step(
            q, depth, res_elev, lo_val, lo_time, ql_t, obs_t,
            t_seconds, upstream, chan, res_params, is_res, res_rows,
            gage_rows, decay_coeff, dt, res_da=res_da,
            da_states=da_states, month_i=month_i,
            return_courant=return_courant, uplan=uplan)
        nudges.append(nudge)
        if collect:
            fvds.append(jnp.stack([q, v, depth], axis=-1))
            if return_courant:
                courants.append(courant)
    fvd = jnp.stack(fvds) if collect else None
    cour = jnp.stack(courants) if courants else None
    return (q, depth, res_elev, lo_val, lo_time, fvd, jnp.stack(nudges),
            da_states, cour)


@functools.partial(jax.jit,
                   static_argnames=("decay_coeff", "dt", "n_sweeps",
                                    "return_courant", "accel_lin"))
def _strict_sweep_kernel(q_est, q, depth, res_elev, lo_val, lo_time,
                         ql_t, obs_t, t_seconds, upstream,
                         chan: ChannelParams,
                         res_params: LevelpoolParams, is_res, res_rows,
                         gage_rows, decay_coeff, dt, n_sweeps,
                         res_da=None, da_states=None, month_i=None,
                         return_courant=False, uplan=None,
                         accel_lin=0, gain0=None, skip_tol=None):
    """``n_sweeps`` fixed-point sweeps of ONE strict timestep in one
    compiled program (cf. ``route()``'s ``step_strict_iter``, which runs
    the same iteration as a device-side ``while_loop`` with the XLA MC
    kernel).  Here the Pallas block kernel is legal (top-level call, not
    inside scan), so each sweep pays only per-block secant cost.  The
    previous-timestep state (q, depth, reservoir/DA state) is fixed
    across sweeps; only the current-step iterate ``q_est`` — and with it
    the current-step upstream sums feeding quc, reservoir inflows and
    downstream-of-gage nudging — updates.  Returns the last sweep's
    outputs plus ``delta`` = max |q_new - q_est| of that sweep and
    ``qmax`` = max |q| of the final iterate, which the host polls for
    convergence (exact after network-depth sweeps: the dependency is
    triangular; ``qmax`` sets the dtype-resolution convergence floor).

    ``accel_lin > 0`` enables fused linearized-propagation acceleration
    (see ``RoutingConfig.strict_accel``): between consecutive sweeps
    (never after the final one, so the returned outputs and ``delta``
    always come from a true sweep) the iterate jumps by the geometric
    series ``sum_j (g .* U)^j dq`` truncated at ``accel_lin`` terms —
    each term one banded upstream sum times the per-lane gain, no
    secant solve.  The gain is refreshed every sweep from the lanes'
    measured response ``g = (G_k - G_{k-1}) / (u_k - u_{k-1})`` (valid
    across accel jumps since each lane's output is a pure function of
    its upstream sum), which captures the secant's depth feedback; it
    falls back to the analytic fixed-depth partial dq_dc/dq_uc = C2 =
    (dt/2 - Km X)/(Km(1-X) + dt/2), Km = max(dt, dx/ck)
    (ops/muskingum.py:169-174) where the drive is unresolvable, and is
    zeroed on reservoir and gage lanes.  Everything runs in ONE
    compiled program — measured essential on the tunneled chip, where
    per-dispatch latency had eaten the sweep savings of a host-side
    alternating form."""
    from troute_tpu.ops.muskingum_pallas import block_active_lanes

    dtype = q_est.dtype
    compute_gain = accel_lin > 0
    delta = jnp.asarray(jnp.inf, dtype)
    v = d = courant = nudge = None
    quc_prev = g_prev = gain = None
    quc_ref = prev_raw = None
    res_elev_c, lo_val_c, lo_time_c, da_states_c = (res_elev, lo_val,
                                                    lo_time, da_states)
    for k in range(n_sweeps):
        quc = _upstream_sum_stepped(q_est, upstream, uplan)
        # block-granular active-set sweeping (strict_block_skip): a
        # block none of whose lanes' drives moved more than skip_tol
        # since its LAST EXECUTED solve skips the secant; quc_ref holds
        # each lane's drive at that solve, so staleness stays bounded
        # by skip_tol however many sweeps a block coasts.  The chunk's
        # LAST sweep always runs fully — the committed state (and the
        # polled delta) must come from a true sweep, like the accel
        # path; without it, stale committed lanes deviated ~15x the
        # tolerance through secant branch flips (measured f32)
        active_rows = None
        if skip_tol is not None and 1 <= k < n_sweeps - 1:
            active_rows = jnp.abs(quc - quc_ref) > skip_tol
        (q_new, v, d, res_elev_c, lo_val_c, lo_time_c, nudge,
         da_states_c, courant, prev_raw) = _one_short_step(
            q, depth, res_elev, lo_val, lo_time, ql_t, obs_t, t_seconds,
            upstream, chan, res_params, is_res, res_rows, gage_rows,
            decay_coeff, dt, res_da=res_da, da_states=da_states,
            month_i=month_i,
            return_courant=(return_courant
                            or (compute_gain and k < n_sweeps - 1)),
            uplan=uplan, quc=quc, active_rows=active_rows, prev=prev_raw,
            want_raw=True)
        if skip_tol is not None:
            if active_rows is None:
                quc_ref = quc
            else:
                ran = block_active_lanes(active_rows)
                quc_ref = jnp.where(ran, quc, quc_ref)
        dq = q_new - q_est
        delta = jnp.max(jnp.abs(dq))
        q_est = q_new
        if compute_gain and k < n_sweeps - 1:
            gain = accel_gain(courant[:, 1], courant[:, 2], chan.dx, dt,
                              dtype, q_new, g_prev, quc, quc_prev,
                              emp_ok=(k >= 1))
            if k == 0 and gain0 is not None:
                # cross-timestep gain carry: the previous step's
                # empirical gain beats the analytic C2 for the first
                # insertion (gains drift slowly between warm steps)
                gain = jnp.where(jnp.isfinite(gain0)
                                 & (jnp.abs(gain0) < 1.0), gain0, gain)
            gain = jnp.where(is_res, 0.0, gain)
            if gage_rows.shape[0]:
                gain = gain.at[gage_rows].set(0.0)
            # insert after every sweep incl. the first (k=0 runs on the
            # analytic C2 alone): in-jit linear terms are ~0.04 ms each
            # at CONUS scale (measured — XLA fuses the banded shifts),
            # so an extra insertion is worth it even when it only
            # shaves a fraction of a sweep
            q_est = apply_linear_accel(
                q_est, dq, gain,
                lambda v: _upstream_sum_stepped(v, upstream, uplan),
                accel_lin)
        if compute_gain:
            quc_prev, g_prev = quc, q_new
    out = (q_est, v, d, res_elev_c, lo_val_c, lo_time_c, nudge,
           da_states_c, courant if return_courant else None, delta,
           jnp.max(jnp.abs(q_est)))
    if compute_gain:
        out = out + (gain,)   # for the driver's cross-timestep carry
    return out


@functools.partial(jax.jit,
                   static_argnames=("decay_coeff", "dt", "n_sweeps",
                                    "shifts", "col_width"))
def _strict_gs_sweep_kernel(q_est, q, depth, res_elev, lo_val, lo_time,
                            ql_t, obs_t, t_seconds, upstream,
                            chan: ChannelParams,
                            res_params: LevelpoolParams, is_res, res_rows,
                            gage_rows, decay_coeff, dt, n_sweeps,
                            shifts, col_width, masks, rem_dst, rem_src,
                            res_da=None, da_states=None, month_i=None):
    """``n_sweeps`` GAUSS-SEIDEL fixed-point sweeps of one strict timestep.

    The Jacobi sweep (``_strict_sweep_kernel``) propagates current-step
    coupling ONE edge per sweep, so warm CONUS steps sit at a ~16-sweep
    f32 influence horizon.  Here the padded postorder layout [N] is
    viewed as [N/C, C] rows (C = ``col_width``) and each sweep runs C
    sequential column updates, vectorized over the N/C rows:

    * same-row sources (band shift d <= c) read THIS sweep's freshly
      solved columns — chains resolve C lanes per sweep instead of 1;
    * cross-row band sources (d > c), the sparse remainder, and the
      reservoir lanes read the previous iterate (Jacobi) — at the fixed
      point old == new, so the mixed splitting has exactly the strict
      fixed point of the Jacobi form (parity-tested).

    Reservoir outflows update once per sweep from the old iterate's
    inflows (candidate DA states discarded, like the Jacobi sweep);
    nudging applies per column so downstream columns see nudged values,
    like the Jacobi iterate which carries nudged q.  The committed state
    comes from one standard ``_strict_sweep_kernel`` sweep at the
    converged iterate, so final semantics (v/depth/DA/nudge bookkeeping)
    are shared with the Jacobi path.  Strict semantics:
    ``mc_reach.pyx:492-800``."""
    from troute_tpu.ops.muskingum_pallas import muskingum_cunge_pallas

    dtype = q.dtype
    N = q.shape[0]
    C = col_width
    R = N // C
    D = len(shifts)
    to2d = lambda a: a.reshape(R, C)
    from troute_tpu.routing.upstream_plan import banded_upstream_sum
    up_prev = banded_upstream_sum(q, masks, shifts, rem_dst, rem_src)
    up_prev2d = to2d(up_prev)
    chan2d = jax.tree.map(to2d, chan)
    q2d, depth2d, ql2d = to2d(q), to2d(depth), to2d(ql_t)
    is_res2d = to2d(is_res)
    masks2d = masks.reshape(D, R, C)
    lo = max(shifts) if shifts else 0

    n_gage = int(gage_rows.shape[0])
    if n_gage:
        gmask2d = to2d(jnp.zeros(N, bool).at[gage_rows].set(True))
        scat = lambda v, fill: to2d(
            jnp.full(N, fill, dtype).at[gage_rows].set(v))
        obs2d = scat(obs_t, jnp.nan)
        lov2d = scat(lo_val, jnp.nan)
        lot2d = scat(lo_time, 0.0)

    n_res = int(res_rows.shape[0])
    delta = jnp.asarray(jnp.inf, dtype)
    for _ in range(n_sweeps):
        q_old = q_est
        # reservoir Jacobi pre-pass: outflows from the old iterate's sums
        if n_res:
            up_res = upstream[res_rows]
            vals = jnp.where(up_res >= 0,
                             q_old[jnp.maximum(up_res, 0)], 0.0)
            inflow = vals.sum(axis=1)
            lp_out, lp_elev = levelpool_step(
                res_elev, inflow, inflow, jnp.zeros_like(inflow),
                jnp.asarray(dt, dtype), res_params)
            if res_da is not None:
                hyb_s, rfc_s, gl_s = da_states
                outflow = typed_reservoir_dispatch(
                    res_da.wbody_type, res_da.hybrid_obs,
                    res_da.hybrid_obs_time, hyb_s, res_da.rfc_series,
                    res_da.rfc_counts, res_da.rfc_use,
                    res_da.rfc_timestep, res_da.rfc_persist_seconds,
                    rfc_s, res_da.gl_obs, res_da.gl_obs_time,
                    res_da.gl_climatology, gl_s,
                    res_da.obs_lookback_hours, res_elev, inflow, lp_out,
                    lp_elev, t_seconds, month_i, res_params.area,
                    res_params.max_depth, res_params.orifice_elev,
                    jnp.asarray(dt, dtype))[0]
            else:
                outflow = lp_out
            overlay2d = to2d(jnp.zeros(N, dtype).at[res_rows].set(outflow))
        # cross-row band sources + sparse remainder from the old iterate
        qx = jnp.concatenate([jnp.zeros((lo,), dtype), q_old]) if lo \
            else q_old
        shifted_old = [
            to2d(jax.lax.dynamic_slice(qx, (lo - d,), (N,)))
            for d in shifts]
        rem = jnp.zeros(N, dtype)
        if rem_dst.shape[0]:
            rem = rem.at[rem_dst].add(q_old[rem_src])
        rem2d = to2d(rem)

        cols = []
        for c in range(C):
            quc_col = rem2d[:, c]
            for di, d in enumerate(shifts):
                src = cols[c - d] if d <= c else shifted_old[di][:, c]
                quc_col = quc_col + jnp.where(masks2d[di, :, c], src, 0.0)
            ch = jax.tree.map(lambda a: a[:, c], chan2d)
            out = muskingum_cunge_pallas(
                up_prev2d[:, c], quc_col, q2d[:, c], ql2d[:, c], ch.dx,
                ch.bw, ch.tw, ch.twcc, ch.n, ch.ncc, ch.cs, ch.s0,
                depth2d[:, c], float(dt), with_diagnostics=False)
            col_q = jnp.where(is_res2d[:, c],
                              overlay2d[:, c] if n_res else q2d[:, c],
                              out.qdc)
            if n_gage:
                obs_c, lov_c, lot_c = (obs2d[:, c], lov2d[:, c],
                                       lot2d[:, c])
                minutes = (t_seconds - lot_c) / 60.0
                weight = jnp.exp(jnp.abs(minutes) / -decay_coeff)
                shift_v = (lov_c - col_q) * weight
                have_obs = ~jnp.isnan(obs_c)
                no_mem = jnp.isnan(obs_c) & jnp.isnan(lov_c)
                replaced = jnp.where(
                    have_obs, obs_c,
                    jnp.where(no_mem, col_q, col_q + shift_v))
                col_q = jnp.where(gmask2d[:, c], replaced, col_q)
            cols.append(col_q)
        q_new = jnp.stack(cols, axis=1).reshape(N)
        delta = jnp.max(jnp.abs(q_new - q_old))
        q_est = q_new
    return q_est, delta, jnp.max(jnp.abs(q_est))


def route_stepped(net: NetworkArrays, chan: ChannelParams,
                  res_params: LevelpoolParams, cfg: RoutingConfig,
                  q0, depth0, res_elev0, qlat, da: GageDA | None = None,
                  res_da: ReservoirDAData | None = None,
                  collect: bool = True):
    """Host-driven production routing (short-timestep + Pallas kernel).

    Semantically identical to ``route(..., assume_short_ts=True)``; one
    compiled step per timestep instead of a device-side scan.  Returns the
    same dict; 'flowveldepth' is [nts, N, 3] (stacked on device) when
    ``collect`` else None.

    Strict mode (``assume_short_ts=False``) is supported in its
    fixed-point form (``cfg.strict_iterative``): each timestep runs
    host-polled sweep dispatches of ``_strict_sweep_kernel`` until the
    iterate's max |dq| falls below ``cfg.strict_tol`` (or
    ``cfg.strict_max_sweeps``), matching ``route()``'s
    ``step_strict_iter`` semantics with the Pallas per-block secant
    instead of the network-wide XLA while_loop.  The committed iterate
    may trail ``step_strict_iter``'s by up to one sweep chunk past
    convergence (chunk-granular detection), i.e. by O(strict_tol) in the
    values — parity-tested at 1e-9.
    """
    if not cfg.assume_short_ts and not cfg.strict_iterative:
        raise ValueError(
            "route_stepped supports short-timestep mode and the "
            "strict fixed-point mode (strict_iterative=True); the "
            "level-scan strict form lives in route()")
    dtype = q0.dtype
    n_real = q0.shape[0]
    pad = (-n_real) % 1024
    if pad:
        pad1 = lambda a, fill=0.0: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        q0, depth0 = pad1(q0), pad1(depth0)
        chan = ChannelParams(*[pad1(c, 1.0) for c in chan])
        qlat = jnp.concatenate(
            [qlat, jnp.zeros((qlat.shape[0], pad), qlat.dtype)], axis=1)
        net = net._replace(
            upstream=jnp.concatenate(
                [net.upstream,
                 jnp.full((pad, net.upstream.shape[1]), -1, jnp.int32)]),
            is_reservoir=jnp.concatenate(
                [net.is_reservoir, jnp.zeros(pad, bool)]))

    have_da = da is not None and int(da.rows.shape[0]) > 0
    gage_rows = da.rows if have_da else jnp.zeros((0,), jnp.int32)
    lo_val = da.lastobs_val if have_da else jnp.zeros((0,), dtype)
    lo_time = da.lastobs_time if have_da else jnp.zeros((0,), dtype)
    decay = da.decay_coeff if have_da else 120.0
    n_obs_t = da.obs.shape[0] if have_da else 0

    q, depth, res_elev = q0, depth0, res_elev0
    da_states = (None if res_da is None else
                 (res_da.hybrid_state0, res_da.rfc_state0,
                  res_da.gl_state0))
    fvd_blocks = []
    nudge_blocks = []
    courant_blocks = []

    if not cfg.assume_short_ts:
        # Strict fixed-point stepping: one timestep at a time, sweeps in
        # compiled chunks, host polls the scalar delta between chunks.
        # Warm-started iterates converge in a handful of sweeps, so the
        # common cost is one chunk (+1 scalar round-trip) per timestep.
        SWEEPS = max(int(cfg.strict_sweep_chunk), 1)
        n_obs_t = da.obs.shape[0] if have_da else 0
        sweep_counts = []
        q_prev_step = None      # q at t-1 / t-2: extrapolated warm start
        q_prev2 = None
        uplan = net.uplan
        C_gs = int(cfg.strict_gs_cols)
        use_gs = (cfg.strict_gs and uplan is not None
                  and len(uplan.shifts) > 0
                  and all(s > 0 for s in uplan.shifts)
                  and q.shape[0] == uplan.n_pad
                  and q.shape[0] % C_gs == 0)
        # linearized-propagation acceleration (see RoutingConfig): needs
        # the banded plan so each linear term is a bandwidth op
        use_accel = (_accel_enabled(cfg, stepped=True) and not use_gs
                     and uplan is not None
                     and q.shape[0] == uplan.n_pad
                     and cfg.strict_accel_lin > 0)
        # block-granular active-set sweeping: measured dead end in the
        # production accel regime, so "auto" resolves OFF (see the
        # RoutingConfig.strict_block_skip ledger entry); explicit True
        # enables it.  skip_tol needs a qmax estimate, so the first
        # chunk of a run sweeps fully and later chunks use the latest
        # polled tolerance.
        use_skip = cfg.strict_block_skip is True and not use_gs
        tol_latest = None
        # each GS sweep advances chains C_gs lanes (vs 1 for Jacobi), so
        # a few sweeps reach the dtype floor — poll in small chunks
        GS_CHUNK = max(1, SWEEPS // 8)
        gain_carry = None      # accel: last empirical gain, carried
        sw_adapt = max(2, int(cfg.strict_accel_chunk))
        sw_streak = 0
        sw_fail = None
        for t in range(1, cfg.nts + 1):
            ql_t = qlat[(t - 1) // cfg.qts_subdivisions]
            if have_da:
                obs_t = (da.obs[min(t, n_obs_t - 1)]
                         if t < n_obs_t else
                         jnp.full((da.obs.shape[1],), jnp.nan, dtype))
            else:
                obs_t = jnp.zeros((0,), dtype)
            month_i = (res_da.month_idx[min(t, res_da.month_idx.shape[0]
                                            - 1)]
                       if res_da is not None else None)
            t_seconds = jnp.asarray(t * cfg.dt, dtype)
            # extrapolated warm start: flows evolve smoothly between
            # timesteps, so a quadratic extrapolation 3q_{t-1} -
            # 3q_{t-2} + q_{t-3} starts ~O(dt^3) from the fixed point
            # (linear 2q-q_prev for the second step, plain carry for
            # the first).  Any start converges to the same fixed point;
            # only the sweep count changes.
            if q_prev_step is None:
                q_est = q
            elif q_prev2 is None:
                q_est = jnp.maximum(2.0 * q - q_prev_step, 0.0)
            else:
                q_est = jnp.maximum(3.0 * (q - q_prev_step) + q_prev2,
                                    0.0)
            total = 0
            eps4 = 4.0 * float(jnp.finfo(dtype).eps)
            if use_gs:
                # GS iteration to the fixed point (reserving one sweep of
                # the cap for the standard commit sweep below)
                while total < cfg.strict_max_sweeps - 1:
                    chunk = min(GS_CHUNK, cfg.strict_max_sweeps - 1 - total)
                    q_est, delta, qmax = _strict_gs_sweep_kernel(
                        q_est, q, depth, res_elev, lo_val, lo_time, ql_t,
                        obs_t, t_seconds, net.upstream, chan, res_params,
                        net.is_reservoir, net.res_rows, gage_rows, decay,
                        cfg.dt, n_sweeps=chunk, shifts=uplan.shifts,
                        col_width=C_gs, masks=uplan.masks,
                        rem_dst=uplan.rem_dst, rem_src=uplan.rem_src,
                        res_da=res_da, da_states=da_states,
                        month_i=month_i)
                    total += chunk
                    # one blocking transfer for both poll scalars (each
                    # float() is its own device->host round trip, and
                    # tunnel round trips are ~tens of ms)
                    dm = np.asarray(jnp.stack([delta, qmax]))
                    tol_eff = max(cfg.strict_tol, eps4 * float(dm[1]))
                    if float(dm[0]) <= tol_eff:
                        break
                # committed state from ONE standard sweep at the converged
                # iterate — identical final semantics to the Jacobi path
                (q_est, v, d, res_elev_c, lo_val_c, lo_time_c, nudge_t,
                 da_states_c, cour_t, delta, qmax) = _strict_sweep_kernel(
                    q_est, q, depth, res_elev, lo_val, lo_time, ql_t,
                    obs_t, t_seconds, net.upstream, chan, res_params,
                    net.is_reservoir, net.res_rows, gage_rows, decay,
                    cfg.dt, n_sweeps=1, res_da=res_da,
                    da_states=da_states, month_i=month_i,
                    return_courant=cfg.return_courant, uplan=net.uplan)
                total += 1
            else:
                # accelerated chunks fuse linear propagation between
                # sweeps (accel_lin>0) and converge in ~half the
                # sweeps, so they poll in smaller chunks.  The warm
                # convergence floor varies by regime (measured 7 with
                # the quadratic warm start + gain carry, 8 without),
                # so the first-chunk size adapts: after 3 consecutive
                # one-chunk convergences try one sweep fewer; a size
                # that ever needs a second chunk is never revisited
                # (sweep counts are monotone in regime difficulty, and
                # a miss costs a full extra chunk).
                SW = (sw_adapt if use_accel else SWEEPS)
                LIN = int(cfg.strict_accel_lin) if use_accel else 0
                first_chunk = min(SW, cfg.strict_max_sweeps)
                while True:
                    # never exceed the configured cap: the tail chunk
                    # shrinks so sweep counts match step_strict_iter's
                    # k < cap exactly.  After a first-chunk miss the
                    # iterate is near-converged, so tails poll in small
                    # chunks of 3 instead of paying a full chunk again
                    sw_t = SW if (not use_accel or total == 0) else 3
                    chunk = min(sw_t, cfg.strict_max_sweeps - total)
                    accel_k = LIN if chunk >= 3 else 0
                    skip_t = (jnp.asarray(0.25 * tol_latest, dtype)
                              if use_skip and tol_latest is not None
                              else None)
                    res_k = _strict_sweep_kernel(
                        q_est, q, depth, res_elev, lo_val, lo_time, ql_t,
                        obs_t, t_seconds, net.upstream, chan, res_params,
                        net.is_reservoir, net.res_rows, gage_rows, decay,
                        cfg.dt, n_sweeps=chunk, res_da=res_da,
                        da_states=da_states, month_i=month_i,
                        return_courant=cfg.return_courant,
                        uplan=net.uplan, accel_lin=accel_k,
                        gain0=(gain_carry if accel_k else None),
                        skip_tol=skip_t)
                    (q_est, v, d, res_elev_c, lo_val_c, lo_time_c,
                     nudge_t, da_states_c, cour_t, delta,
                     qmax) = res_k[:11]
                    if accel_k:
                        # cross-timestep carry: warm steps' gains drift
                        # slowly, so the next step's first insertion
                        # reuses this chunk's last empirical gain
                        gain_carry = res_k[11]
                    total += chunk
                    # dtype-resolution floor: see step_strict_iter — f32
                    # cannot resolve strict_tol-sized |dq| on large
                    # flows.  Both poll scalars ride ONE blocking
                    # transfer (separate float() calls are separate
                    # tunnel round trips at ~tens of ms each).
                    dm = np.asarray(jnp.stack([delta, qmax]))
                    tol_eff = max(cfg.strict_tol, eps4 * float(dm[1]))
                    tol_latest = tol_eff
                    if float(dm[0]) <= tol_eff \
                            or total >= cfg.strict_max_sweeps:
                        break
                if use_accel:
                    if total <= first_chunk:
                        sw_streak += 1
                        if sw_streak >= 3 and sw_adapt > 3 \
                                and (sw_fail is None
                                     or sw_adapt - 1 > sw_fail):
                            sw_adapt -= 1
                            sw_streak = 0
                    else:
                        sw_fail = first_chunk
                        sw_adapt = min(first_chunk + 1,
                                       cfg.strict_max_sweeps)
                        sw_streak = 0
            sweep_counts.append(total)
            q_prev2 = q_prev_step
            q_prev_step = q
            q, depth, res_elev = q_est, d, res_elev_c
            lo_val, lo_time, da_states = lo_val_c, lo_time_c, da_states_c
            if collect:
                fvd_blocks.append(
                    jnp.stack([q, v, d], axis=-1)[None, :n_real])
                nudge_blocks.append(nudge_t[None])
                if cfg.return_courant:
                    courant_blocks.append(cour_t[None, :n_real])

        hyb, rfc, gl = da_states if da_states is not None else (None,) * 3
        state = RoutingState(q=q[:n_real], depth=depth[:n_real],
                             res_elev=res_elev, lastobs_val=lo_val,
                             lastobs_time=lo_time, hybrid=hyb, rfc=rfc,
                             gl=gl)
        out = {"state": state, "flowveldepth": None, "nudge": None,
               "strict_sweeps": sweep_counts}
        if collect:
            out["flowveldepth"] = jnp.concatenate(fvd_blocks)
            out["nudge"] = jnp.concatenate(nudge_blocks)
            if cfg.return_courant:
                out["courant"] = jnp.concatenate(courant_blocks)
        return out

    # K timesteps per dispatch: each host->device dispatch rides the
    # (tunnel) latency once for K compiled steps.  K trades compile size
    # for dispatch amortization; the tail reuses a smaller unroll.
    K = 24
    obs_full = da.obs if have_da else jnp.zeros((1, 0), dtype)
    t = 1
    while t <= cfg.nts:
        k = min(K, cfg.nts - t + 1)
        (q, depth, res_elev, lo_val, lo_time, fvd_b, nudge_b,
         da_states, cour_b) = _stepped_kernel_multi(
                q, depth, res_elev, lo_val, lo_time, qlat, obs_full,
                jnp.int32(t), net.upstream, chan, res_params,
                net.is_reservoir, net.res_rows, gage_rows, decay, cfg.dt,
                k_steps=k, qts=cfg.qts_subdivisions, collect=collect,
                res_da=res_da, da_states=da_states,
                month_idx=(res_da.month_idx if res_da is not None
                           else None),
                return_courant=cfg.return_courant, uplan=net.uplan)
        if collect:
            fvd_blocks.append(fvd_b[:, :n_real])
            nudge_blocks.append(nudge_b)
            if cfg.return_courant:
                courant_blocks.append(cour_b[:, :n_real])
        t += k

    hyb, rfc, gl = da_states if da_states is not None else (None,) * 3
    state = RoutingState(q=q[:n_real], depth=depth[:n_real],
                         res_elev=res_elev, lastobs_val=lo_val,
                         lastobs_time=lo_time, hybrid=hyb, rfc=rfc, gl=gl)
    out = {"state": state, "flowveldepth": None, "nudge": None}
    if collect:
        out["flowveldepth"] = jnp.concatenate(fvd_blocks)
        out["nudge"] = jnp.concatenate(nudge_blocks)
        if cfg.return_courant:
            out["courant"] = jnp.concatenate(courant_blocks)
    return out
