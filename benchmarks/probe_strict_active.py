"""Per-sweep active-block histogram for the strict fixed point at CONUS
scale (VERDICT r4 #2 evidence): for each sweep of a warm strict
timestep, how many 2048-lane Pallas blocks saw their INPUT (the
upstream-sum drive quc) move by more than the convergence tolerance
since the previous sweep?  A block whose drive did not move produces
bit-identical outputs (the kernel is a pure function of its inputs), so
those blocks can skip the secant solve entirely.

Run on the TPU:  python benchmarks/probe_strict_active.py [accel_lin]
"""
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_troute_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import CONUS_SEGMENTS, channel_params, force, synthetic_conus
from troute_tpu.network.topology import build_topology
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.ops.muskingum_pallas import muskingum_cunge_pallas
from troute_tpu.routing.engine import (ChannelParams, RoutingConfig,
                                       _upstream_sum_stepped, accel_gain,
                                       apply_linear_accel,
                                       network_arrays_from_topology,
                                       route_stepped)

ACCEL_LIN = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BLK = 2048
N_SWEEPS = 16


@functools.partial(jax.jit, static_argnames=("n_sweeps", "accel_lin", "dt"))
def probe_sweeps(q_start, q, depth, ql_t, upstream, chan, is_res, uplan,
                 n_sweeps, accel_lin, dt):
    dtype = q.dtype
    up_prev = _upstream_sum_stepped(q, upstream, uplan)
    eps4 = 4.0 * jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tol = jnp.maximum(1e-9, eps4 * jnp.max(jnp.abs(q)))

    q_est = q_start
    quc_prev = None
    g_prev = None
    counts, deltas = [], []
    npad = q.shape[0]
    for k in range(n_sweeps):
        quc = _upstream_sum_stepped(q_est, upstream, uplan)
        if quc_prev is not None:
            moved = jnp.abs(quc - quc_prev) > tol
            act = moved.reshape(-1, BLK).any(axis=1)
            counts.append(act.sum())
        out = muskingum_cunge_pallas(
            up_prev, quc, q, ql_t, chan.dx, chan.bw, chan.tw, chan.twcc,
            chan.n, chan.ncc, chan.cs, chan.s0, depth, dt,
            with_diagnostics=(accel_lin > 0 and k < n_sweeps - 1))
        q_new = jnp.where(is_res, q, out.qdc)
        dq = q_new - q_est
        deltas.append(jnp.max(jnp.abs(dq)))
        q_prev_iter = q_est
        q_est = q_new
        if accel_lin > 0 and k < n_sweeps - 1:
            gain = accel_gain(out.ck, out.X, chan.dx, dt, dtype, q_new,
                              g_prev, quc, quc_prev, emp_ok=(k >= 1))
            gain = jnp.where(is_res, 0.0, gain)
            q_est = apply_linear_accel(
                q_est, dq, gain,
                lambda v: _upstream_sum_stepped(v, upstream, uplan),
                accel_lin)
        quc_prev, g_prev = quc, q_new
    return jnp.stack(counts), jnp.stack(deltas), tol


def main():
    n = CONUS_SEGMENTS
    dt = 300.0
    rng = np.random.default_rng(1)
    t0 = time.time()
    ids, down = synthetic_conus(n)
    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    chan = ChannelParams(**{k: jnp.asarray(v)
                            for k, v in channel_params(n, rng).items()})
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), jnp.float32)
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), jnp.float32)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)

    # reach the warm regime: relax the random initial state with cheap
    # short-mode windows first (the bench's strict leg starts from a
    # state that has already evolved through ~300 short-mode steps),
    # then a few strict steps with the production driver
    cfg_s = RoutingConfig(dt=dt, nts=24, qts_subdivisions=12,
                         assume_short_ts=True, kernel="pallas")
    t0 = time.time()
    q_w, d_w = q0, d0
    for _ in range(6):
        o = route_stepped(net, chan, lp, cfg_s, q_w, d_w,
                          jnp.zeros(1, jnp.float32), qlat, None,
                          collect=False)
        q_w, d_w = o["state"].q, o["state"].depth
    force(q_w, d_w)
    print(f"short-mode relax 144 steps: {time.time()-t0:.1f}s",
          file=sys.stderr)
    cfg = RoutingConfig(dt=dt, nts=6, qts_subdivisions=3,
                        assume_short_ts=False, strict_iterative=True,
                        kernel="pallas")
    t0 = time.time()
    out = route_stepped(net, chan, lp, cfg, q_w, d_w,
                        jnp.zeros(1, jnp.float32), qlat, None,
                        collect=False)
    q_w, d_w = out["state"].q, out["state"].depth
    force(q_w, d_w)
    print(f"warm-up 6 strict steps: {time.time()-t0:.1f}s "
          f"(sweeps {out['strict_sweeps']})", file=sys.stderr)

    # pad like route_stepped does
    pad = (-n) % 1024
    pad1 = lambda a, fill=0.0: jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
    q_p, d_p = pad1(q_w), pad1(d_w)
    chan_p = ChannelParams(*[pad1(c, 1.0) for c in chan])
    up_p = jnp.concatenate(
        [net.upstream, jnp.full((pad, net.upstream.shape[1]), -1,
                                jnp.int32)])
    is_res_p = jnp.concatenate([net.is_reservoir, jnp.zeros(pad, bool)])
    ql_t = pad1(qlat[0])

    npad = int(q_p.shape[0])
    n_blocks = (npad + BLK - 1) // BLK
    for accel_lin in (ACCEL_LIN, 0):
        t0 = time.time()
        counts, deltas, tol = probe_sweeps(
            q_p, q_p, d_p, ql_t, up_p, chan_p, is_res_p, net.uplan,
            n_sweeps=N_SWEEPS, accel_lin=accel_lin, dt=dt)
        cn = np.asarray(counts)
        dl = np.asarray(deltas)
        print(f"\naccel_lin={accel_lin}  ({time.time()-t0:.1f}s, "
              f"{n_blocks} blocks, tol={float(tol):.3e})")
        print("sweep  active-blocks  frac     max|dq|")
        print(f"  1    {n_blocks:8d}     1.000    {dl[0]:.3e}   (first "
              "sweep: all inputs changed)")
        for k in range(cn.size):
            print(f"  {k+2:<4d} {int(cn[k]):8d}     "
                  f"{int(cn[k])/n_blocks:.3f}    {dl[k+1]:.3e}")


if __name__ == "__main__":
    main()
