"""Host-stepped sharded driver (parallel/stepped_engine.py) tests.

The stepped driver is the production multi-chip path (Pallas block
kernel + per-step ppermute halo); these tests pin it to the in-scan
sharded engine and the single-device engine on the 8-device virtual CPU
mesh, including forced cross-device cuts, gage nudging, typed reservoir
DA, and multi-dispatch chunking (k_steps < nts exercising the host loop
and the tail-block compile).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from test_sharded import (
    CONN, ELEV0, LAKE_ROWVALS, _global_setup, _single_device_run)
from troute_tpu.network.topology import from_connections
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.parallel.partition import partition_network
from troute_tpu.parallel.sharded_engine import (
    build_sharded_inputs, route_sharded, shard_reservoir_da)
from troute_tpu.parallel.stepped_engine import route_sharded_stepped
from troute_tpu.routing.engine import (
    ChannelParams, GageDA, ReservoirDAData, RoutingConfig,
    network_arrays_from_topology, route)


@pytest.mark.parametrize("k_steps,exchange", [(24, "neighbor"),
                                              (5, "neighbor"),
                                              (24, "allgather")])
def test_stepped_matches_single_device(k_steps, exchange):
    """Forced-cut stepped driver vs the single-device engine; k_steps=5
    exercises multi-dispatch carry hand-off and the tail block; the
    allgather leg pins the fallback exchange mechanism."""
    nts, dt = 24, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    ref = _single_device_run(topo, chan, q0, depth0, qlat_cols, nts, dt,
                             dtype)

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    assert part.cut_edges > 0
    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0,
        {lake_row: ELEV0}, qlat_cols, dtype=dtype)
    res = route_sharded_stepped(mesh, inp, dt, nts, qts_subdivisions=4,
                                band_shifts=part.band_shifts,
                                k_steps=k_steps, exchange=exchange)
    fvd_sh = np.asarray(res.fvd)
    for d in range(n_dev):
        for j in range(part.n_local):
            g = part.global_row[d, j]
            if g < 0:
                continue
            np.testing.assert_allclose(fvd_sh[d, :, j], ref[:, g],
                                       rtol=1e-9, atol=1e-12,
                                       err_msg=f"node row {g}")


def test_stepped_matches_scan_with_gage_nudging():
    """Stepped vs in-scan sharded engine with gage DA on forced cuts:
    final states and nudge series must agree to fixed-point tolerance
    (both run identical math; the secant implementations differ only in
    blocking)."""
    nts, dt = 24, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    rng = np.random.default_rng(5)
    gage_nodes = [3, 8, 22]
    gage_rows = np.asarray([topo.index_of[g] for g in gage_nodes])
    obs = np.full((nts + 1, len(gage_nodes)), np.nan, np.float64)
    obs[2:10, 0] = rng.uniform(5, 9, 8)
    obs[5:20, 1] = rng.uniform(2, 4, 15)
    obs[1:, 2] = rng.uniform(1, 2, nts)
    lo_val = np.asarray([np.nan, 3.0, np.nan])
    lo_time = np.asarray([0.0, -600.0, 0.0])

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0, {lake_row: ELEV0},
        qlat_cols, dtype=dtype, gage_rows=gage_rows, gage_obs=obs,
        gage_lo_val=lo_val, gage_lo_time=lo_time)

    res_scan = route_sharded(mesh, inp, dt, nts, qts_subdivisions=4,
                             band_shifts=part.band_shifts)
    res_step = route_sharded_stepped(mesh, inp, dt, nts,
                                     qts_subdivisions=4,
                                     band_shifts=part.band_shifts)
    np.testing.assert_allclose(np.asarray(res_step.fvd),
                               np.asarray(res_scan.fvd),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_step.nudge),
                               np.asarray(res_scan.nudge),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_step.lo_val),
                               np.asarray(res_scan.lo_val),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_step.lo_time),
                               np.asarray(res_scan.lo_time), atol=1e-9)


def test_strict_stepped_matches_strict_scan():
    """The strict host-stepped sharded driver (per-sweep halo, Pallas,
    host-polled convergence) agrees with the in-scan strict engine at
    fixed-point tolerance on a forced-cut partition with gage DA."""
    from troute_tpu.parallel.stepped_engine import (
        route_sharded_strict_stepped)

    nts, dt = 6, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    rng = np.random.default_rng(5)
    gage_rows = np.asarray([topo.index_of[g] for g in (3, 22)])
    obs = np.full((nts + 1, 2), np.nan, np.float64)
    obs[2:5, 0] = rng.uniform(5, 9, 3)
    obs[1:, 1] = rng.uniform(1, 2, nts)
    lo_val = np.asarray([np.nan, 3.0])
    lo_time = np.asarray([0.0, -600.0])

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0, {lake_row: ELEV0},
        qlat_cols, dtype=dtype, gage_rows=gage_rows, gage_obs=obs,
        gage_lo_val=lo_val, gage_lo_time=lo_time)

    res_scan = route_sharded(mesh, inp, dt, nts, qts_subdivisions=2,
                             band_shifts=part.band_shifts, strict=True)
    res_step = route_sharded_strict_stepped(
        mesh, inp, dt, nts, qts_subdivisions=2,
        band_shifts=part.band_shifts)
    np.testing.assert_allclose(np.asarray(res_step.fvd),
                               np.asarray(res_scan.fvd),
                               rtol=2e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_step.nudge),
                               np.asarray(res_scan.nudge),
                               rtol=2e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_step.lo_val),
                               np.asarray(res_scan.lo_val),
                               rtol=2e-7, atol=1e-7)


def test_in_scan_strict_accel_opt_in_same_fixed_point():
    """The in-scan sharded strict driver's opt-in accelerator
    (accel_lin>0; OFF by default so the ulp-level cross-check with the
    single-device engine holds) converges to the same strict fixed
    point: f64, forced cuts, per-sweep halo exchange — agreement to
    ~fixed-point tolerance."""
    nts, dt = 6, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    assert part.band_shifts is not None
    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0, {lake_row: ELEV0},
        qlat_cols, dtype=dtype)
    res_p = route_sharded(mesh, inp, dt, nts, qts_subdivisions=2,
                          band_shifts=part.band_shifts, strict=True)
    res_a = route_sharded(mesh, inp, dt, nts, qts_subdivisions=2,
                          band_shifts=part.band_shifts, strict=True,
                          accel_lin=8)
    np.testing.assert_allclose(np.asarray(res_a.fvd),
                               np.asarray(res_p.fvd),
                               rtol=1e-6, atol=1e-7)


def test_route_sharded_global_stepped_driver():
    """The CLI glue (route_sharded_global) with driver='stepped' — the
    TPU production selection — returns the same full output contract as
    the in-scan driver."""
    from troute_tpu.parallel.sharded_engine import route_sharded_global

    nts, dt = 12, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    parm = LAKE_ROWVALS
    elev0 = jnp.asarray([ELEV0], dtype)
    outs = {}
    for drv in ("scan", "stepped"):
        outs[drv] = route_sharded_global(
            mesh, topo, chan, parm, cfg, q0, depth0, elev0, qlat_cols,
            part=part, dtype=dtype, driver=drv)
    np.testing.assert_allclose(outs["stepped"]["flowveldepth"],
                               outs["scan"]["flowveldepth"],
                               rtol=1e-9, atol=1e-12)
    for name in ("q", "depth", "res_elev"):
        np.testing.assert_allclose(
            np.asarray(getattr(outs["stepped"]["state"], name)),
            np.asarray(getattr(outs["scan"]["state"], name)),
            rtol=1e-9, atol=1e-12, err_msg=name)


def test_stepped_typed_reservoir_da():
    """Typed reservoir DA (persistence + Great Lakes) through the stepped
    driver matches the single-device engine."""
    nts, dt = 24, 300.0
    dtype = jnp.float64
    conn = {1: [2], 2: [901], 901: [3], 3: [4], 4: [],
            10: [903], 903: [11], 11: [4]}
    rng = np.random.default_rng(9)
    topo = from_connections(conn, reservoir_ids=[901, 903])
    n = topo.n_nodes
    chan = dict(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    q0 = rng.uniform(0.5, 5.0, n)
    depth0 = rng.uniform(0.05, 0.8, n)
    parm = np.array([[2.0, 12.0, 1.2, 0.1, 8.0, 0.4, 11.0, 12.0, 10.0],
                     [500.0, 50.0, 1.0, 0.1, 10.0, 0.4, 45.0, 100.0,
                      10.0]])
    lake_rows = {int(topo.ids[r]): int(r) for r in topo.reservoir_rows}
    elev_by_row = {lake_rows[901]: 10.5, lake_rows[903]: 40.0}
    for lk, e in ((901, 10.5), (903, 40.0)):
        q0[lake_rows[lk]] = 2.0
        depth0[lake_rows[lk]] = e
    qlat_cols = rng.uniform(0.1, 2.0, (6, n))

    n_res = topo.reservoir_rows.size
    hobs = np.full((n_res, 20), np.nan)
    gobs = np.full((n_res, 20), np.nan)
    gtime = np.zeros((n_res, 20))
    clim = np.zeros((n_res, 12))
    wt = np.ones(n_res, np.int32)
    for s, r in enumerate(topo.reservoir_rows):
        if int(topo.ids[r]) == 901:
            wt[s] = 2
            hobs[s] = rng.uniform(3, 9, 20)
        else:
            wt[s] = 6
            gobs[s] = rng.uniform(800, 1200, 20)
            gtime[s] = np.arange(20) * 3600.0
            clim[s] = rng.uniform(500, 900, 12)
    res_da = ReservoirDAData.inactive(n_res, nts, dtype)._replace(
        wbody_type=jnp.asarray(wt),
        hybrid_obs=jnp.asarray(hobs, dtype),
        hybrid_obs_time=jnp.asarray(np.arange(20) * 900.0, dtype),
        gl_obs=jnp.asarray(gobs, dtype),
        gl_obs_time=jnp.asarray(gtime, dtype),
        gl_climatology=jnp.asarray(clim, dtype),
        month_idx=jnp.full(nts + 1, 7, jnp.int32))

    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, dtype) for k, v in chan.items()})
    lp = LevelpoolParams(*[jnp.asarray(parm[:, i], dtype) for i in range(9)])
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    elev0 = jnp.asarray([elev_by_row[int(r)]
                         for r in topo.reservoir_rows], dtype)
    ref = np.asarray(route(net, cp, lp, cfg, jnp.asarray(q0, dtype),
                           jnp.asarray(depth0, dtype), elev0,
                           jnp.asarray(qlat_cols, dtype), None,
                           res_da)["flowveldepth"])

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(n) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    assert part.cut_edges > 0
    inp = build_sharded_inputs(part, topo, chan, parm, q0, depth0,
                               elev_by_row, qlat_cols, dtype=dtype)
    rda_sh = shard_reservoir_da(part, topo, res_da,
                                np.asarray(inp.res_slots), dtype=dtype)
    res = route_sharded_stepped(mesh, inp, dt, nts, qts_subdivisions=4,
                                band_shifts=part.band_shifts,
                                res_da=rda_sh, k_steps=7)
    fvd_sh = np.asarray(res.fvd)
    for d in range(n_dev):
        for j in range(part.n_local):
            g = part.global_row[d, j]
            if g < 0:
                continue
            np.testing.assert_allclose(fvd_sh[d, :, j], ref[:, g],
                                       rtol=1e-9, atol=1e-12,
                                       err_msg=f"row {g}")
