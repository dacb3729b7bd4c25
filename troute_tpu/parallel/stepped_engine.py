"""Host-stepped multi-device routing: shard_map + Pallas MC + ppermute halo.

The in-scan sharded engine (``sharded_engine.route_sharded``) runs the
plain XLA secant inside ``lax.scan`` because the Pallas block kernel
cannot live inside scan on this toolchain (Mosaic-in-scan compile hang —
see ``routing/engine.route_stepped``).  That costs ~8x per chip vs the
single-device stepped path (BENCH_r03: 2.57e7 vs 2.12e8 seg-ts/s).

This driver lifts the ``route_stepped`` pattern onto the device mesh:
ONE jitted ``shard_map`` program unrolls K short timesteps (a Python
loop, legal for Pallas), each step =

    banded local upstream sums  ->  Pallas block-secant MC solve
    (overlapped with the per-round ``ppermute`` halo exchange)
    ->  boundary-row recompute  ->  reservoirs / typed DA / nudging

and the host drives one dispatch per K steps — exactly
``engine._stepped_kernel_multi`` with a neighbor halo exchange added.

Numerics match ``route_stepped`` exactly: the same Pallas kernel solves
every row (per-lane results are block-composition independent — masked
updates freeze converged lanes), and per-shard banded plans use the same
displacement-frequency ordering as the global plan, so on a 1-device
mesh the result is bit-identical to the single-device stepped path.
Across cuts, boundary rows are recomputed from the full upstream-column
gather in original column order, like the in-scan engine.

Replaces: the reference's by-subnetwork joblib scheduler
(``compute.py:553-907``) at production rate on TPU meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.ops.muskingum_pallas import muskingum_cunge_pallas
from troute_tpu.ops.reservoir_da import (
    GreatLakesDAState, HybridDAState, RfcDAState)
from troute_tpu.parallel.sharded_engine import (
    AXIS, ShardedInputs, ShardedResDA, ShardedRunResult, apply_local_nudge,
    input_specs, make_exchange, make_interior_sum, reservoir_update,
    zero_da_states)
from troute_tpu.routing.engine import (ChannelParams, accel_gain,
                                       apply_linear_accel)


@functools.lru_cache(maxsize=64)
def _make_block_fn(mesh: Mesh, k_steps: int, dt: float, qts: int,
                   decay_coeff: float, exchange: str,
                   band_shifts: tuple | None, perms: tuple,
                   collect: bool, has_boundary: bool, have_res_da: bool,
                   lookback: float, rda_treedef):
    """Build (and cache) the jitted K-step shard_map program for one
    static configuration; jit itself handles shape re-tracing."""

    def device_fn(q, depth, res_elev, lo_val, lo_time, hyb, rfc, gl,
                  t0_idx, upstream_local, export_slot, halo_src_dev,
                  halo_src_pos, perm_pairs, send_slot, recv_pos,
                  boundary_rows, valid, is_res, res_slots, chan,
                  res_params, q0_unused, depth0_unused, res_elev0_unused,
                  qlat, gage_slot, gage_index, gage_obs, gage_lo_val,
                  gage_lo_time, band_masks, band_rem_dst, band_rem_src,
                  *rda_flat):
        sq = lambda a: a[0]                # drop the size-1 device axis
        dtype = q.dtype
        dt_ = jnp.asarray(dt, dtype)
        q, depth, res_elev = sq(q), sq(depth), sq(res_elev)
        lo_val, lo_time = sq(lo_val), sq(lo_time)
        das = tuple(jax.tree.map(sq, s) for s in (hyb, rfc, gl))
        up = sq(upstream_local)
        n_local = q.shape[0]
        n_halo = int(sq(halo_src_dev).shape[0])
        chan_l = jax.tree.map(sq, chan)
        res_params_l = jax.tree.map(sq, res_params)
        qlat_l = qlat[:, 0]                # [n_cols, n_local]
        gage_slot_l, gage_obs_l = sq(gage_slot), sq(gage_obs)
        res_slots_l = sq(res_slots)
        valid_l, is_res_l = sq(valid), sq(is_res)
        b_rows = sq(boundary_rows)

        if have_res_da:
            rda_d = jax.tree.unflatten(rda_treedef, rda_flat)
            rda_d = jax.tree.map(sq, rda_d)
            rda = ShardedResDA(obs_lookback_hours=lookback, **rda_d)
        else:
            rda = None

        interior_sum = make_interior_sum(
            up, n_local, band_shifts, sq(band_masks), sq(band_rem_dst),
            sq(band_rem_src))
        exchange_halo = make_exchange(
            exchange, perms, n_halo, dtype, sq(export_slot),
            sq(send_slot), sq(recv_pos), sq(halo_src_dev),
            sq(halo_src_pos))

        def mc(up_prev, quc, qdp, ql, ch, dp):
            return muskingum_cunge_pallas(
                up_prev, quc, qdp, ql, ch.dx, ch.bw, ch.tw, ch.twcc,
                ch.n, ch.ncc, ch.cs, ch.s0, dp, dt,
                with_diagnostics=False)

        # boundary-row plan: static per run, gathered once per dispatch
        if has_boundary:
            safe_b = jnp.maximum(b_rows, 0)
            up_b = up[safe_b]              # [B, K] ext indices
            chan_b = jax.tree.map(lambda a: a[safe_b], chan_l)
            scat_b = jnp.where(b_rows >= 0, safe_b, n_local)

        def one_step(q, depth, res_elev, lo_val, lo_time, das, t_idx):
            col = (t_idx - 1) // qts
            ql_t = jax.lax.dynamic_index_in_dim(qlat_l, col, 0,
                                                keepdims=False)
            # interior pass first: the big Pallas solve has no data
            # dependency on the collective, so XLA can overlap it with
            # the sparse per-round ppermutes
            up_prev = interior_sum(q)
            out = mc(up_prev, up_prev, q, ql_t, chan_l, depth)
            qdc, velc, depthc = out.qdc, out.velc, out.depthc

            if has_boundary:
                q_ext = jnp.concatenate([q, exchange_halo(q)])
                vals_b = jnp.where(up_b >= 0,
                                   q_ext[jnp.maximum(up_b, 0)], 0.0)
                up_prev_b = vals_b.sum(axis=1)
                out_b = mc(up_prev_b, up_prev_b, q[safe_b], ql_t[safe_b],
                           chan_b, depth[safe_b])
                qdc = qdc.at[scat_b].set(out_b.qdc, mode="drop")
                velc = velc.at[scat_b].set(out_b.velc, mode="drop")
                depthc = depthc.at[scat_b].set(out_b.depthc, mode="drop")
                up_prev = up_prev.at[scat_b].set(up_prev_b, mode="drop")

            q_new = jnp.where(valid_l & ~is_res_l, qdc, q)
            v_new = jnp.where(valid_l & ~is_res_l, velc, 0.0)
            d_new = jnp.where(valid_l & ~is_res_l, depthc, depth)

            t_seconds = t_idx.astype(dtype) * dt_
            q_new, d_new, res_elev, das = reservoir_update(
                q_new, d_new, res_elev, up_prev, res_slots_l,
                res_params_l, rda, das, t_idx, t_seconds, dt_)
            q_new, nudge, lo_val, lo_time = apply_local_nudge(
                q_new, gage_slot_l, gage_obs_l, lo_val, lo_time, t_idx,
                t_seconds, decay_coeff)
            return q_new, v_new, d_new, res_elev, lo_val, lo_time, das, \
                nudge

        fvds, nudges = [], []
        for j in range(k_steps):
            t_idx = t0_idx + jnp.int32(j)
            (q, v, depth, res_elev, lo_val, lo_time, das,
             nudge) = one_step(q, depth, res_elev, lo_val, lo_time, das,
                               t_idx)
            nudges.append(nudge)
            if collect:
                fvds.append(jnp.stack([q, v, depth], axis=-1))

        add1 = lambda a: a[None]
        hyb_f, rfc_f, gl_f = (jax.tree.map(add1, s) for s in das)
        fvd = jnp.stack(fvds)[None] if collect else \
            jnp.zeros((1, 0, n_local, 3), dtype)
        return ShardedRunResult(
            fvd=fvd, nudge=jnp.stack(nudges)[None], q=q[None],
            depth=depth[None], res_elev=res_elev[None],
            lo_val=lo_val[None], lo_time=lo_time[None],
            hyb=hyb_f, rfc=rfc_f, gl=gl_f)

    if int(np.prod(mesh.devices.shape)) == 1 and not has_boundary:
        # degenerate single-device mesh with no cross-shard edges: the
        # body contains no collectives, and running it as a PLAIN jit
        # skips shard_map's partitioning overhead — measured 2.14e8 ->
        # 4.88e8 seg-ts/s on the 1-dev CONUS mesh at matched
        # tenancy-probe readings (round 5; the multi-device path is
        # unchanged and the result stays bit-identical: same program
        # body, same inputs)
        return jax.jit(device_fn)
    da_specs = (
        HybridDAState(*[P(AXIS)] * len(HybridDAState._fields)),
        RfcDAState(*[P(AXIS)] * len(RfcDAState._fields)),
        GreatLakesDAState(*[P(AXIS)] * len(GreatLakesDAState._fields)))
    in_specs = (P(AXIS),) * 5 + da_specs + (P(),) + tuple(input_specs())
    if have_res_da:
        n_rda = rda_treedef.num_leaves
        in_specs = in_specs + (P(AXIS),) * n_rda
    out_specs = ShardedRunResult(
        fvd=P(AXIS), nudge=P(AXIS), q=P(AXIS), depth=P(AXIS),
        res_elev=P(AXIS), lo_val=P(AXIS), lo_time=P(AXIS),
        hyb=da_specs[0], rfc=da_specs[1], gl=da_specs[2])
    fn = jax.shard_map(device_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _make_strict_sweep_fn(mesh: Mesh, n_sweeps: int, dt: float, qts: int,
                          decay_coeff: float, exchange: str,
                          band_shifts: tuple | None, perms: tuple,
                          have_res_da: bool, lookback: float,
                          rda_treedef, accel_lin: int = 0):
    """Jitted shard_map program: ``n_sweeps`` strict fixed-point sweeps
    of ONE timestep with a per-sweep halo exchange of the iterate and the
    Pallas block secant (cf. ``sharded_engine.local_step_strict``, which
    runs the same iteration in-scan with the XLA kernel, and
    ``engine._strict_sweep_kernel``, the single-device form).  Returns
    the last sweep's outputs plus the globally-reduced (``lax.pmax``)
    delta and qmax the host polls for convergence.

    ``accel_lin > 0``: fused linearized-propagation acceleration between
    sweeps (see ``engine._strict_sweep_kernel``), SHARD-LOCAL — the gain
    is zeroed on boundary rows (their upstream lanes live on other
    shards, whose residual is unknown between exchanges), so the linear
    terms propagate within the shard and cross-shard coupling still
    advances one halo exchange per true sweep: Gauss-accelerated within
    shards, Jacobi across them.  Cuts true-sweep count — and with it the
    number of per-sweep collective rounds, the term that dominates on
    real pods.  Memoized (lru_cache) so chunk re-dispatches reuse the
    traced program."""

    def device_fn(q_est, q, depth, res_elev, lo_val, lo_time, hyb, rfc,
                  gl, t_idx, upstream_local, export_slot, halo_src_dev,
                  halo_src_pos, perm_pairs, send_slot, recv_pos,
                  boundary_rows, valid, is_res, res_slots, chan,
                  res_params, q0_unused, depth0_unused, res_elev0_unused,
                  qlat, gage_slot, gage_index, gage_obs, gage_lo_val,
                  gage_lo_time, band_masks, band_rem_dst, band_rem_src,
                  *rda_flat):
        sq = lambda a: a[0]
        dtype = q.dtype
        dt_ = jnp.asarray(dt, dtype)
        q_est, q, depth, res_elev = (sq(q_est), sq(q), sq(depth),
                                     sq(res_elev))
        lo_val, lo_time = sq(lo_val), sq(lo_time)
        das = tuple(jax.tree.map(sq, s) for s in (hyb, rfc, gl))
        up = sq(upstream_local)
        n_local = q.shape[0]
        n_halo = int(sq(halo_src_dev).shape[0])
        chan_l = jax.tree.map(sq, chan)
        res_params_l = jax.tree.map(sq, res_params)
        valid_l, is_res_l = sq(valid), sq(is_res)
        b_rows = sq(boundary_rows)
        res_slots_l = sq(res_slots)
        qlat_l = qlat[:, 0]
        gage_slot_l, gage_obs_l = sq(gage_slot), sq(gage_obs)
        if have_res_da:
            rda_d = jax.tree.map(sq, jax.tree.unflatten(rda_treedef,
                                                        rda_flat))
            rda = ShardedResDA(obs_lookback_hours=lookback, **rda_d)
        else:
            rda = None

        interior_sum = make_interior_sum(
            up, n_local, band_shifts, sq(band_masks), sq(band_rem_dst),
            sq(band_rem_src))
        exchange_halo = make_exchange(
            exchange, perms, n_halo, dtype, sq(export_slot),
            sq(send_slot), sq(recv_pos), sq(halo_src_dev),
            sq(halo_src_pos))
        safe_b = jnp.maximum(b_rows, 0)
        up_b = up[safe_b]
        scat_b = jnp.where(b_rows >= 0, safe_b, n_local)

        def sums_full(qv):
            """True upstream sums incl. cross-shard neighbors."""
            upv = interior_sum(qv)
            q_ext = jnp.concatenate([qv, exchange_halo(qv)])
            vals_b = jnp.where(up_b >= 0, q_ext[jnp.maximum(up_b, 0)],
                               0.0)
            return upv.at[scat_b].set(vals_b.sum(axis=1), mode="drop")

        col = (t_idx - 1) // qts
        ql_t = jax.lax.dynamic_index_in_dim(qlat_l, col, 0,
                                            keepdims=False)
        t_seconds = t_idx.astype(dtype) * dt_
        up_prev = sums_full(q)

        delta = qmax = jnp.asarray(jnp.inf, dtype)
        v_new = d_new = nudge = None
        res_elev_c, lo_val_c, lo_time_c, das_c = (res_elev, lo_val,
                                                  lo_time, das)
        quc_prev = g_prev = None
        for k in range(n_sweeps):
            want_diag = accel_lin > 0 and k < n_sweeps - 1
            quc = sums_full(q_est)
            out = muskingum_cunge_pallas(
                up_prev, quc, q, ql_t, chan_l.dx, chan_l.bw, chan_l.tw,
                chan_l.twcc, chan_l.n, chan_l.ncc, chan_l.cs, chan_l.s0,
                depth, dt, with_diagnostics=want_diag)
            q_new = jnp.where(valid_l & ~is_res_l, out.qdc, q)
            v_new = jnp.where(valid_l & ~is_res_l, out.velc, 0.0)
            d_new = jnp.where(valid_l & ~is_res_l, out.depthc, depth)
            q_new, d_new, res_elev_c, das_c = reservoir_update(
                q_new, d_new, res_elev, quc, res_slots_l, res_params_l,
                rda, das, t_idx, t_seconds, dt_)
            q_new, nudge, lo_val_c, lo_time_c = apply_local_nudge(
                q_new, gage_slot_l, gage_obs_l, lo_val, lo_time, t_idx,
                t_seconds, decay_coeff)
            dq = q_new - q_est
            delta = jax.lax.pmax(jnp.max(jnp.abs(dq)), AXIS)
            qmax = jax.lax.pmax(jnp.max(jnp.abs(q_new)), AXIS)
            q_est = q_new
            if want_diag:
                # shard-local linearized propagation (see docstring and
                # engine.accel_gain for the gain estimator)
                gain = accel_gain(out.ck, out.X, chan_l.dx, dt, dtype,
                                  q_new, g_prev, quc, quc_prev,
                                  emp_ok=(k >= 1))
                gain = jnp.where(valid_l & ~is_res_l, gain, 0.0)
                gain = gain.at[scat_b].set(0.0, mode="drop")
                gain = gain.at[jnp.where(gage_slot_l >= 0,
                                         jnp.maximum(gage_slot_l, 0),
                                         n_local)].set(0.0, mode="drop")
                q_est = apply_linear_accel(q_est, dq, gain, interior_sum,
                                           accel_lin)
            quc_prev, g_prev = quc, q_new

        add1 = lambda a: a[None]
        hyb_c, rfc_c, gl_c = (jax.tree.map(add1, s) for s in das_c)
        fvd = jnp.stack([q_est, v_new, d_new], axis=-1)[None, None]
        res = ShardedRunResult(
            fvd=fvd, nudge=nudge[None, None], q=q_est[None],
            depth=d_new[None], res_elev=res_elev_c[None],
            lo_val=lo_val_c[None], lo_time=lo_time_c[None],
            hyb=hyb_c, rfc=rfc_c, gl=gl_c)
        return res, delta, qmax

    da_specs = (
        HybridDAState(*[P(AXIS)] * len(HybridDAState._fields)),
        RfcDAState(*[P(AXIS)] * len(RfcDAState._fields)),
        GreatLakesDAState(*[P(AXIS)] * len(GreatLakesDAState._fields)))
    in_specs = (P(AXIS),) * 6 + da_specs + (P(),) + tuple(input_specs())
    if have_res_da:
        in_specs = in_specs + (P(AXIS),) * rda_treedef.num_leaves
    out_res = ShardedRunResult(
        fvd=P(AXIS), nudge=P(AXIS), q=P(AXIS), depth=P(AXIS),
        res_elev=P(AXIS), lo_val=P(AXIS), lo_time=P(AXIS),
        hyb=da_specs[0], rfc=da_specs[1], gl=da_specs[2])
    fn = jax.shard_map(device_fn, mesh=mesh,
                       in_specs=in_specs,
                       out_specs=(out_res, P(), P()),
                       check_vma=False)
    return jax.jit(fn)


def route_sharded_strict_stepped(mesh: Mesh, inp: ShardedInputs,
                                 dt: float, nts: int,
                                 qts_subdivisions: int = 1,
                                 res_da: ShardedResDA | None = None,
                                 decay_coeff: float = 120.0,
                                 exchange: str = "neighbor",
                                 band_shifts: tuple | None = None,
                                 strict_tol: float = 1e-9,
                                 strict_max_sweeps: int = 64,
                                 sweep_chunk: int = 8,
                                 accel_lin: int = 8,
                                 collect: bool = True) -> ShardedRunResult:
    """STRICT production multi-device routing: host-polled fixed-point
    sweeps of the Pallas block kernel with a per-sweep ppermute halo
    exchange — ``engine.route_stepped``'s strict form lifted onto the
    device mesh (the in-scan ``route_sharded(strict=True)`` remains the
    CPU-mesh form).  Warm-started with the 2q_{t-1}-q_{t-2} linear
    extrapolation; converges on the globally-pmax'ed |dq| with the
    dtype-resolution floor, exactly like the single-device driver."""
    dtype = inp.q0.dtype
    perm_np = np.asarray(inp.perm_pairs)
    perms = tuple(
        tuple((int(s), int(d)) for s, d in perm_np[r] if s >= 0)
        for r in range(perm_np.shape[0]))
    have_res_da = res_da is not None
    rda_args, rda_treedef, lookback = (), None, 48.0
    if have_res_da:
        lookback = float(res_da.obs_lookback_hours)
        rda_dict = {k: v for k, v in res_da._asdict().items()
                    if k != "obs_lookback_hours"}
        rda_flat, rda_treedef = jax.tree.flatten(rda_dict)
        rda_args = tuple(rda_flat)

    R = int(inp.res_slots.shape[-1])
    n_dev = int(np.prod(mesh.devices.shape))
    if have_res_da:
        hyb, rfc, gl = res_da.hyb0, res_da.rfc0, res_da.gl0
    else:
        rep = lambda a: jnp.broadcast_to(a, (n_dev,) + a.shape)
        hyb, rfc, gl = (jax.tree.map(rep, s)
                        for s in zero_da_states(R, dtype))

    q, depth, res_elev = inp.q0, inp.depth0, inp.res_elev0
    lo_val, lo_time = inp.gage_lo_val, inp.gage_lo_time
    eps4 = 4.0 * float(jnp.finfo(dtype).eps)
    fvd_steps, nudge_steps = [], []
    res = None
    q_prev_step = q_prev2 = None
    use_accel = accel_lin > 0 and band_shifts is not None
    # adaptive first-chunk size + quadratic warm start, exactly like
    # engine.route_stepped's accel driver (see the controller comments
    # there): descend after 3 one-chunk convergences, never revisit a
    # missed size, poll near-converged tails in chunks of 3
    sw_adapt = max(sweep_chunk, 1)
    sw_streak = 0
    sw_fail = None
    for t in range(1, nts + 1):
        if q_prev_step is None:
            q_est = q
        elif q_prev2 is None:
            q_est = jnp.maximum(2.0 * q - q_prev_step, 0.0)
        else:
            q_est = jnp.maximum(3.0 * (q - q_prev_step) + q_prev2, 0.0)
        total = 0
        first_chunk = min(sw_adapt, strict_max_sweeps)
        while True:
            sw_t = first_chunk if (not use_accel or total == 0) else 3
            chunk = min(max(sw_t, 1), strict_max_sweeps - total)
            fn = _make_strict_sweep_fn(
                mesh, chunk, float(dt), int(qts_subdivisions),
                float(decay_coeff), exchange, band_shifts, perms,
                have_res_da, lookback, rda_treedef,
                accel_lin=(int(accel_lin) if use_accel
                           and chunk >= 3 else 0))
            res, delta, qmax = fn(q_est, q, depth, res_elev, lo_val,
                                  lo_time, hyb, rfc, gl, jnp.int32(t),
                                  *inp, *rda_args)
            q_est = res.q
            total += chunk
            # one blocking transfer for both poll scalars (separate
            # float() calls are separate tunnel round trips)
            dm = np.asarray(jnp.stack([delta, qmax]))
            tol_eff = max(strict_tol, eps4 * float(dm[1]))
            if float(dm[0]) <= tol_eff or total >= strict_max_sweeps:
                break
        if use_accel:
            if total <= first_chunk:
                sw_streak += 1
                if sw_streak >= 3 and sw_adapt > 3 \
                        and (sw_fail is None or sw_adapt - 1 > sw_fail):
                    sw_adapt -= 1
                    sw_streak = 0
            else:
                sw_fail = first_chunk
                sw_adapt = min(first_chunk + 1, strict_max_sweeps)
                sw_streak = 0
        q_prev2 = q_prev_step
        q_prev_step = q
        q, depth, res_elev = res.q, res.depth, res.res_elev
        lo_val, lo_time = res.lo_val, res.lo_time
        hyb, rfc, gl = res.hyb, res.rfc, res.gl
        if collect:
            fvd_steps.append(res.fvd)
        nudge_steps.append(res.nudge)

    fvd = jnp.concatenate(fvd_steps, axis=1) if collect else None
    nudge = jnp.concatenate(nudge_steps, axis=1)
    return res._replace(fvd=fvd, nudge=nudge)


def route_sharded_stepped(mesh: Mesh, inp: ShardedInputs, dt: float,
                          nts: int, qts_subdivisions: int = 1,
                          res_da: ShardedResDA | None = None,
                          decay_coeff: float = 120.0,
                          exchange: str = "neighbor",
                          band_shifts: tuple | None = None,
                          k_steps: int = 24,
                          collect: bool = True) -> ShardedRunResult:
    """Production multi-device routing (short-timestep + Pallas kernel).

    Same contract as ``sharded_engine.route_sharded`` in short-timestep
    mode (the strict fixed-point form stays on the in-scan driver);
    semantically identical, ~8x faster per chip on TPU.  ``k_steps``
    trades compile size for dispatch amortization, exactly like
    ``engine.route_stepped``'s K.
    """
    dtype = inp.q0.dtype
    perm_np = np.asarray(inp.perm_pairs)     # replicated spec: always
    perms = tuple(                           # fully addressable
        tuple((int(s), int(d)) for s, d in perm_np[r] if s >= 0)
        for r in range(perm_np.shape[0]))
    ba = inp.boundary_rows
    if getattr(ba, "is_fully_addressable", True):
        has_boundary = bool((np.asarray(ba) >= 0).any())
    else:
        # multi-process mesh: boundary_rows is sharded across hosts, and
        # this is a static compile flag that MUST agree on every process
        # — take the conservative global truth (the fix-up is a no-op on
        # devices whose rows are all -1 padding)
        has_boundary = True
    have_res_da = res_da is not None

    rda_args = ()
    rda_treedef = None
    lookback = 48.0
    if have_res_da:
        lookback = float(res_da.obs_lookback_hours)
        rda_dict = {k: v for k, v in res_da._asdict().items()
                    if k != "obs_lookback_hours"}
        rda_flat, rda_treedef = jax.tree.flatten(rda_dict)
        rda_args = tuple(rda_flat)

    R = int(inp.res_slots.shape[-1])
    n_dev = int(np.prod(mesh.devices.shape))
    if have_res_da:
        das = (res_da.hyb0, res_da.rfc0, res_da.gl0)
    else:
        multiproc = any(d.process_index != jax.process_index()
                        for d in mesh.devices.flat)

        def rep(a):
            full = np.broadcast_to(np.asarray(a), (n_dev,) + a.shape)
            if not multiproc:
                return jnp.asarray(full)
            from jax.sharding import NamedSharding
            sh = NamedSharding(mesh, P(AXIS))
            return jax.make_array_from_callback(full.shape, sh,
                                                lambda idx: full[idx])
        das = tuple(jax.tree.map(rep, s) for s in zero_da_states(R, dtype))

    q, depth, res_elev = inp.q0, inp.depth0, inp.res_elev0
    lo_val, lo_time = inp.gage_lo_val, inp.gage_lo_time
    hyb, rfc, gl = das
    fvd_blocks, nudge_blocks = [], []
    res = None
    t = 1
    while t <= nts:
        k = min(k_steps, nts - t + 1)
        fn = _make_block_fn(mesh, k, float(dt), int(qts_subdivisions),
                            float(decay_coeff), exchange, band_shifts,
                            perms, collect, has_boundary, have_res_da,
                            lookback, rda_treedef)
        res = fn(q, depth, res_elev, lo_val, lo_time, hyb, rfc, gl,
                 jnp.int32(t), *inp, *rda_args)
        q, depth, res_elev = res.q, res.depth, res.res_elev
        lo_val, lo_time = res.lo_val, res.lo_time
        hyb, rfc, gl = res.hyb, res.rfc, res.gl
        if collect:
            fvd_blocks.append(res.fvd)
        nudge_blocks.append(res.nudge)
        t += k

    fvd = (fvd_blocks[0] if len(fvd_blocks) == 1 else
           jnp.concatenate(fvd_blocks, axis=1)) if collect else None
    nudge = (nudge_blocks[0] if len(nudge_blocks) == 1 else
             jnp.concatenate(nudge_blocks, axis=1))
    return res._replace(fvd=fvd, nudge=nudge)
