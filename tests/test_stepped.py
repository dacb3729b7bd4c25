"""route_stepped (host-driven Pallas production path) must match the
scan-based engine exactly in short-timestep mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from troute_tpu.network.topology import from_connections
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.routing.engine import (
    ChannelParams, GageDA, RoutingConfig, network_arrays_from_topology,
    route, route_stepped)

from test_engine import CONN, LAKE, LAKE_ID, _setup, _run_engine


def test_stepped_matches_scan():
    nts, dt = 24, 300.0
    ids, chan, q0, depth0, qlat, gages = _setup(nts)

    out_scan, idx = _run_engine(ids, chan, q0, depth0, qlat, gages, nts, dt,
                                short=True, dtype=jnp.float64)

    # rebuild the same arrays for the stepped path
    topo = from_connections(CONN, reservoir_ids=[LAKE_ID])
    net = network_arrays_from_topology(topo, need_levels=False)
    dtype = jnp.float64
    perm = topo.ids

    def col(name, default=1.0):
        return jnp.asarray([chan[int(i)].get(name, default)
                            if int(i) != LAKE_ID else default
                            for i in perm], dtype)

    cp = ChannelParams(dx=col("dx"), bw=col("bw"), tw=col("tw"),
                       twcc=col("twcc"), n=col("n"), ncc=col("ncc"),
                       cs=col("cs"), s0=col("s0"))
    lp = LevelpoolParams(*[jnp.asarray([LAKE[k]], dtype) for k in (
        "area", "max_depth", "orifice_area", "orifice_coeff",
        "orifice_elev", "weir_coeff", "weir_elev", "weir_length",
        "dam_length")])
    q0_arr = jnp.asarray([q0[int(i)] for i in perm], dtype)
    d0_arr = jnp.asarray([depth0[int(i)] for i in perm], dtype)
    n_cols = len(next(iter(qlat.values())))
    qlat_arr = jnp.asarray(
        np.stack([np.array([qlat[int(i)][c] for i in perm])
                  for c in range(n_cols)]), dtype)
    da = GageDA(rows=jnp.asarray([idx[r] for r in gages["rows"]], jnp.int32),
                obs=jnp.asarray(gages["obs"], dtype),
                lastobs_val=jnp.asarray(gages["lastobs_val"], dtype),
                lastobs_time=jnp.asarray(gages["lastobs_time"], dtype),
                decay_coeff=gages["decay_coeff"])
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    out_step = route_stepped(net, cp, lp, cfg, q0_arr, d0_arr,
                             jnp.asarray([LAKE["elev0"]], dtype), qlat_arr,
                             da)

    # identical math modulo rare f32 secant path flips — in f64 exact
    np.testing.assert_allclose(
        np.asarray(out_step["flowveldepth"]),
        np.asarray(out_scan["flowveldepth"]), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_step["nudge"]), np.asarray(out_scan["nudge"]),
        rtol=1e-9, atol=1e-12)


def test_stepped_returns_courant():
    """return_courant on the production stepped driver emits cn/ck/X
    matching the xla scan engine (reference computes the diagnostics in
    the hot kernel in ALL modes, MCsingleSegStime_f2py_NOLOOP.f90:342-367)."""
    nts, dt = 24, 300.0
    ids, chan, q0, depth0, qlat, _ = _setup(nts)
    out_scan, idx = _run_engine(ids, chan, q0, depth0, qlat, None, nts, dt,
                                short=True, dtype=jnp.float64,
                                return_courant=True)

    topo = from_connections(CONN, reservoir_ids=[LAKE_ID])
    net = network_arrays_from_topology(topo, need_levels=False)
    dtype = jnp.float64
    perm = topo.ids

    def col(name, default=1.0):
        return jnp.asarray([chan[int(i)].get(name, default)
                            if int(i) != LAKE_ID else default
                            for i in perm], dtype)

    cp = ChannelParams(dx=col("dx"), bw=col("bw"), tw=col("tw"),
                       twcc=col("twcc"), n=col("n"), ncc=col("ncc"),
                       cs=col("cs"), s0=col("s0"))
    lp = LevelpoolParams(*[jnp.asarray([LAKE[k]], dtype) for k in (
        "area", "max_depth", "orifice_area", "orifice_coeff",
        "orifice_elev", "weir_coeff", "weir_elev", "weir_length",
        "dam_length")])
    q0_arr = jnp.asarray([q0[int(i)] for i in perm], dtype)
    d0_arr = jnp.asarray([depth0[int(i)] for i in perm], dtype)
    n_cols = len(next(iter(qlat.values())))
    qlat_arr = jnp.asarray(
        np.stack([np.array([qlat[int(i)][c] for i in perm])
                  for c in range(n_cols)]), dtype)
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True, return_courant=True)
    out_step = route_stepped(net, cp, lp, cfg, q0_arr, d0_arr,
                             jnp.asarray([LAKE["elev0"]], dtype), qlat_arr)

    cour = out_step.get("courant")
    assert cour is not None and cour.shape == (nts, topo.n_nodes, 3)
    np.testing.assert_allclose(np.asarray(cour),
                               np.asarray(out_scan["courant"]),
                               rtol=1e-9, atol=1e-12)


def test_stepped_reservoir_da_matches_scan():
    """route_stepped with typed reservoir DA (the production TPU path)
    matches route()'s device-side scan exactly."""
    import numpy as np

    from troute_tpu.network.topology import from_connections
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, ReservoirDAData, RoutingConfig,
        network_arrays_from_topology, route, route_stepped)

    nts, dt = 8, 300.0
    dtype = jnp.float32
    conn = {1: [2], 2: [901], 901: [3], 3: []}
    topo = from_connections(conn, reservoir_ids=[901])
    n = topo.n_nodes
    rng = np.random.default_rng(3)
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(
        dx=jnp.asarray(rng.uniform(800, 2500, n), dtype),
        bw=jnp.asarray(rng.uniform(3, 15, n), dtype),
        tw=jnp.asarray(rng.uniform(20, 50, n), dtype),
        twcc=jnp.asarray(rng.uniform(70, 160, n), dtype),
        n=jnp.full(n, 0.05, dtype), ncc=jnp.full(n, 0.1, dtype),
        cs=jnp.asarray(rng.uniform(0.4, 1.2, n), dtype),
        s0=jnp.asarray(rng.uniform(0.002, 0.015, n), dtype))
    lp = LevelpoolParams(*[jnp.asarray([v], dtype) for v in
                           (2.0, 12.0, 1.2, 0.1, 8.0, 0.4, 11.0, 12.0,
                            10.0)])
    hobs = np.full((1, 30), np.nan)
    hobs[0, 2:20] = rng.uniform(3, 9, 18)
    res_da = ReservoirDAData.inactive(1, nts, dtype)._replace(
        wbody_type=jnp.asarray([2], jnp.int32),
        hybrid_obs=jnp.asarray(hobs, dtype),
        hybrid_obs_time=jnp.asarray(np.arange(30) * 900.0, dtype))
    q0 = jnp.asarray(rng.uniform(1, 4, n), dtype)
    d0 = jnp.asarray(rng.uniform(0.1, 0.5, n), dtype)
    d0 = d0.at[topo.index_of[901]].set(10.5)
    elev0 = jnp.asarray([10.5], dtype)
    qlat = jnp.asarray(rng.uniform(0.2, 2.0, (6, n)), dtype)

    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True, kernel="pallas")
    out_scan = route(net, cp, lp, cfg, q0, d0, elev0, qlat, None, res_da)
    out_step = route_stepped(net, cp, lp, cfg, q0, d0, elev0, qlat, None,
                             res_da)
    np.testing.assert_array_equal(np.asarray(out_scan["flowveldepth"]),
                                  np.asarray(out_step["flowveldepth"]))
    np.testing.assert_array_equal(
        np.asarray(out_scan["state"].hybrid.persisted_outflow),
        np.asarray(out_step["state"].hybrid.persisted_outflow))

    # strict fixed-point form: host-stepped Pallas sweeps vs route()'s
    # device-side while_loop (typed reservoir DA sees current-step
    # upstream inflows in both)
    cfg_strict = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                               assume_short_ts=False,
                               strict_iterative=True, kernel="pallas")
    out_dev = route(net, cp, lp, cfg_strict, q0, d0, elev0, qlat, None,
                    res_da)
    out_host = route_stepped(net, cp, lp, cfg_strict, q0, d0, elev0,
                             qlat, None, res_da)
    np.testing.assert_allclose(np.asarray(out_dev["flowveldepth"]),
                               np.asarray(out_host["flowveldepth"]),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_dev["state"].hybrid.persisted_outflow),
        np.asarray(out_host["state"].hybrid.persisted_outflow),
        rtol=2e-6, atol=1e-6)


def test_strict_floor_converges_large_flows_f32():
    """f32 strict runs on large flows must converge by the
    dtype-resolution floor, not grind to strict_max_sweeps: an absolute
    |dq| of strict_tol (1e-9) is unrepresentable at q ~ 1e6 in f32
    (eps*q ~ 0.12), so pre-floor every step burned the full sweep cap."""
    n = 64
    conn = {i: [i + 1] for i in range(1, n)}
    conn[n] = []
    rng = np.random.default_rng(9)
    topo = from_connections(conn)
    dtype = jnp.float32
    cp = ChannelParams(
        dx=jnp.asarray(rng.uniform(500, 3000, n), dtype),
        bw=jnp.asarray(rng.uniform(2, 20, n), dtype),
        tw=jnp.asarray(rng.uniform(25, 60, n), dtype),
        twcc=jnp.asarray(rng.uniform(80, 200, n), dtype),
        n=jnp.full((n,), 0.055, dtype), ncc=jnp.full((n,), 0.11, dtype),
        cs=jnp.asarray(rng.uniform(0.3, 1.5, n), dtype),
        s0=jnp.asarray(rng.uniform(0.001, 0.02, n), dtype))
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    # operational-scale flows: ~1e6 m3/s mainstem, consistent depth guess
    q0 = jnp.asarray(rng.uniform(8e5, 1.2e6, n), dtype)
    d0 = jnp.asarray(rng.uniform(40.0, 60.0, n), dtype)
    qlat = jnp.asarray(rng.uniform(10.0, 100.0, (2, n)), dtype)
    cfg = RoutingConfig(dt=300.0, nts=4, qts_subdivisions=2,
                        assume_short_ts=False, strict_iterative=True,
                        kernel="pallas")
    net = network_arrays_from_topology(topo, need_levels=False)
    out = route_stepped(net, cp, lp, cfg, q0, d0, jnp.zeros((1,), dtype),
                        qlat, None)
    assert np.isfinite(np.asarray(out["flowveldepth"])).all()
    sweeps = out["strict_sweeps"]
    assert len(sweeps) == 4
    # every step must stop short of the cap (floor-converged)
    assert all(s < cfg.strict_max_sweeps for s in sweeps), sweeps


def test_strict_accel_zero_forcing_stays_zero():
    """Zero forcing + zero initial state through the accelerated strict
    driver must produce exactly zero flows — the empirical-gain ratio is
    0/0 on every lane (du below the resolvability floor), which must
    fall back to the analytic gain, never NaN-poison the iterate."""
    n = 64
    conn = {i: [i + 1] for i in range(1, n)}
    conn[n] = []
    from troute_tpu.network.topology import from_connections
    topo = from_connections(conn)
    dtype = jnp.float32
    rng = np.random.default_rng(2)
    cp = ChannelParams(
        dx=jnp.asarray(rng.uniform(500, 3000, n), dtype),
        bw=jnp.asarray(rng.uniform(2, 20, n), dtype),
        tw=jnp.asarray(rng.uniform(25, 60, n), dtype),
        twcc=jnp.asarray(rng.uniform(80, 200, n), dtype),
        n=jnp.full((n,), 0.055, dtype), ncc=jnp.full((n,), 0.11, dtype),
        cs=jnp.asarray(rng.uniform(0.3, 1.5, n), dtype),
        s0=jnp.asarray(rng.uniform(0.001, 0.02, n), dtype))
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    z = jnp.zeros((n,), dtype)
    qlat = jnp.zeros((2, n), dtype)
    cfg = RoutingConfig(dt=300.0, nts=4, qts_subdivisions=2,
                        assume_short_ts=False, strict_iterative=True,
                        kernel="pallas", strict_accel=True)
    net = network_arrays_from_topology(topo, need_levels=False)
    out = route_stepped(net, cp, lp, cfg, z, z, jnp.zeros((1,), dtype),
                        qlat, None)
    fvd = np.asarray(out["flowveldepth"])
    assert np.isfinite(fvd).all()
    np.testing.assert_array_equal(fvd[:, :, 0], 0.0)


def test_strict_linear_accel_matches_plain_with_fewer_sweeps():
    """The linearized-propagation accelerator (strict_accel) must reach
    the same strict fixed point as the plain Jacobi sweep loop — the
    accelerated iterate is only a warm start; convergence is judged on
    true sweeps — while spending measurably fewer nonlinear sweeps
    (CONUS-scale measurement in RoutingConfig notes)."""
    rng = np.random.default_rng(4)
    n = 4096
    ids = np.arange(1, n + 1, dtype=np.int64)
    idx = np.arange(n)
    hop = rng.integers(1, 5, n)
    j = np.minimum(idx + hop, n - 1)
    down = ids[j]
    down[idx == n - 1] = 0
    from troute_tpu.network.topology import build_topology
    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    assert net.uplan is not None    # accel requires the banded plan
    dtype = jnp.float32
    cp = ChannelParams(
        dx=jnp.asarray(rng.uniform(500, 3000, n), dtype),
        bw=jnp.asarray(rng.uniform(2, 20, n), dtype),
        tw=jnp.asarray(rng.uniform(25, 60, n), dtype),
        twcc=jnp.asarray(rng.uniform(80, 200, n), dtype),
        n=jnp.full((n,), 0.055, dtype), ncc=jnp.full((n,), 0.11, dtype),
        cs=jnp.asarray(rng.uniform(0.3, 1.5, n), dtype),
        s0=jnp.asarray(rng.uniform(0.001, 0.02, n), dtype))
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), dtype)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), dtype)
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), dtype)
    z1 = jnp.zeros((1,), dtype)

    # warm the state (production strict runs start from a routed state)
    cfg_w = RoutingConfig(dt=300.0, nts=12, qts_subdivisions=6,
                          assume_short_ts=True, kernel="pallas")
    out_w = route_stepped(net, cp, lp, cfg_w, q0, d0, z1, qlat, None,
                          collect=False)
    q_w, d_w = out_w["state"].q, out_w["state"].depth

    base = dict(dt=300.0, nts=4, qts_subdivisions=2,
                assume_short_ts=False, strict_iterative=True,
                kernel="pallas")
    out_p = route_stepped(net, cp, lp, RoutingConfig(
        **base, strict_accel=False), q_w, d_w, z1, qlat, None)
    out_a = route_stepped(net, cp, lp, RoutingConfig(
        **base, strict_accel=True), q_w, d_w, z1, qlat, None)
    # same fixed point within the convergence floor (4*eps*max|q| in f32)
    np.testing.assert_allclose(np.asarray(out_a["flowveldepth"]),
                               np.asarray(out_p["flowveldepth"]),
                               rtol=1e-5, atol=1e-5)
    s_plain = sum(out_p["strict_sweeps"])
    s_accel = sum(out_a["strict_sweeps"])
    assert s_accel < s_plain, (s_accel, s_plain)
    # warm junction-rich regime: expect ~2x or better (measured 16 -> 5)
    assert s_accel <= 0.75 * s_plain, (s_accel, s_plain)


def test_pallas_skip_kernel_semantics():
    """Active-set kernel contract: an inactive block writes through the
    previous outputs bit-exactly; an active block matches the plain
    kernel bit-exactly (ops/muskingum_pallas._mc_block_kernel_skip)."""
    from troute_tpu.ops.muskingum_pallas import (LANE, DEFAULT_SUBLANES,
                                                 muskingum_cunge_pallas)
    rng = np.random.default_rng(7)
    blk = DEFAULT_SUBLANES * LANE
    n = 2 * blk                      # exactly two blocks
    dtype = jnp.float32
    a = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, n), dtype)
    args = dict(qup=a(0, 5), quc=a(0, 5), qdp=a(0, 5), ql=a(0.01, 1),
                dx=a(500, 3000), bw=a(2, 20), tw=a(25, 60),
                twcc=a(80, 200), n=jnp.full((n,), 0.055, dtype),
                ncc=jnp.full((n,), 0.11, dtype), cs=a(0.3, 1.5),
                s0=a(0.001, 0.02), depthp=a(0.05, 0.8))
    full = muskingum_cunge_pallas(*args.values(), 300.0)
    # 'prev' distinct from the real solution so pass-through is visible
    prev = full._replace(qdc=full.qdc + 7.0, velc=full.velc + 7.0,
                         depthc=full.depthc + 7.0)
    active = jnp.concatenate([jnp.ones(blk, bool), jnp.zeros(blk, bool)])
    out = muskingum_cunge_pallas(*args.values(), 300.0,
                                 active_rows=active, prev=prev)
    np.testing.assert_array_equal(np.asarray(out.qdc[:blk]),
                                  np.asarray(full.qdc[:blk]))
    np.testing.assert_array_equal(np.asarray(out.qdc[blk:]),
                                  np.asarray(prev.qdc[blk:]))
    np.testing.assert_array_equal(np.asarray(out.depthc[blk:]),
                                  np.asarray(prev.depthc[blk:]))
    # a single moved lane activates its whole block
    active1 = active.at[blk + 5].set(True)
    out1 = muskingum_cunge_pallas(*args.values(), 300.0,
                                  active_rows=active1, prev=prev)
    np.testing.assert_array_equal(np.asarray(out1.qdc),
                                  np.asarray(full.qdc))


def test_strict_block_skip_matches_full_sweeps():
    """Block-granular active-set sweeping (strict_block_skip) must reach
    the same strict fixed point as full sweeping: skipped blocks' drives
    moved at most tol_eff/4 since their last executed solve, so the
    committed state deviates by O(skip_tol) at most."""
    rng = np.random.default_rng(11)
    n = 4096
    ids = np.arange(1, n + 1, dtype=np.int64)
    idx = np.arange(n)
    hop = rng.integers(1, 5, n)
    j = np.minimum(idx + hop, n - 1)
    down = ids[j]
    down[idx == n - 1] = 0
    from troute_tpu.network.topology import build_topology
    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    dtype = jnp.float32
    cp = ChannelParams(
        dx=jnp.asarray(rng.uniform(500, 3000, n), dtype),
        bw=jnp.asarray(rng.uniform(2, 20, n), dtype),
        tw=jnp.asarray(rng.uniform(25, 60, n), dtype),
        twcc=jnp.asarray(rng.uniform(80, 200, n), dtype),
        n=jnp.full((n,), 0.055, dtype), ncc=jnp.full((n,), 0.11, dtype),
        cs=jnp.asarray(rng.uniform(0.3, 1.5, n), dtype),
        s0=jnp.asarray(rng.uniform(0.001, 0.02, n), dtype))
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), dtype)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), dtype)
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), dtype)
    z1 = jnp.zeros((1,), dtype)
    cfg_w = RoutingConfig(dt=300.0, nts=12, qts_subdivisions=6,
                          assume_short_ts=True, kernel="pallas")
    out_w = route_stepped(net, cp, lp, cfg_w, q0, d0, z1, qlat, None,
                          collect=False)
    q_w, d_w = out_w["state"].q, out_w["state"].depth

    base = dict(dt=300.0, nts=4, qts_subdivisions=2,
                assume_short_ts=False, strict_iterative=True,
                kernel="pallas")
    out_f = route_stepped(net, cp, lp, RoutingConfig(
        **base, strict_block_skip=False), q_w, d_w, z1, qlat, None)
    out_s = route_stepped(net, cp, lp, RoutingConfig(
        **base, strict_block_skip=True), q_w, d_w, z1, qlat, None)
    # the committed state always comes from a true final sweep, but the
    # ITERATE PATH differs, so convergence can stop at a different point
    # inside the tolerance band: agreement is convergence-floor-scale
    # (f32 floor 4*eps*max|q| ~ 1e-5 here; measured 1 lane in 49k at
    # 3e-5 rel after 4 steps), not ulp-level
    np.testing.assert_allclose(np.asarray(out_s["flowveldepth"]),
                               np.asarray(out_f["flowveldepth"]),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(out_s["flowveldepth"])).all()
