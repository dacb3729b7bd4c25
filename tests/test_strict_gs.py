"""Strict-mode Gauss-Seidel column sweeps (engine._strict_gs_sweep_kernel).

The GS iterate must converge to the SAME strict fixed point as the
Jacobi sweeps (mixed old/new-source splittings share fixed points), with
materially fewer sweeps on deep chains (chains resolve strict_gs_cols
lanes per sweep instead of 1).  The committed state always comes from one
standard Jacobi sweep at the converged iterate, so final bookkeeping
(v/depth/DA/nudge) is the shared code path.
"""

import numpy as np

import jax.numpy as jnp

from troute_tpu.network.topology import from_connections
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.routing.engine import (
    ChannelParams, GageDA, ReservoirDAData, RoutingConfig,
    network_arrays_from_topology, route, route_stepped)


def _chan(n, rng, dtype):
    return ChannelParams(
        dx=jnp.asarray(rng.uniform(800, 2500, n), dtype),
        bw=jnp.asarray(rng.uniform(3, 15, n), dtype),
        tw=jnp.asarray(rng.uniform(20, 50, n), dtype),
        twcc=jnp.asarray(rng.uniform(70, 160, n), dtype),
        n=jnp.full(n, 0.05, dtype), ncc=jnp.full(n, 0.1, dtype),
        cs=jnp.asarray(rng.uniform(0.4, 1.2, n), dtype),
        s0=jnp.asarray(rng.uniform(0.002, 0.015, n), dtype))


def test_gs_matches_level_scan_on_deep_chain_with_fewer_sweeps():
    """600-node chain, f64: GS strict == route() strict fixed point, and
    the GS sweep counts are well below the Jacobi counts."""
    n, nts, dt = 600, 4, 300.0
    dtype = jnp.float64
    conn = {i: [i + 1] for i in range(1, n)}
    conn[n] = []
    topo = from_connections(conn)
    rng = np.random.default_rng(2)
    net = network_arrays_from_topology(topo, need_levels=False)
    assert net.uplan is not None
    cp = _chan(n, rng, dtype)
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), dtype)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), dtype)
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), dtype)
    z1 = jnp.zeros(1, dtype)

    base = dict(dt=dt, nts=nts, qts_subdivisions=2,
                assume_short_ts=False, strict_iterative=True,
                kernel="pallas")
    ref = route(net, cp, lp,
                RoutingConfig(**base), q0, d0, z1, qlat, None)
    jac = route_stepped(net, cp, lp, RoutingConfig(**base), q0, d0, z1,
                        qlat, None)
    gs = route_stepped(net, cp, lp, RoutingConfig(**base, strict_gs=True),
                       q0, d0, z1, qlat, None)
    # the sweep delta under-bounds the residual by the coupling's
    # contraction factor (engine.py RoutingConfig notes): iterates from
    # different splittings agree to ~1e-6 at the 1e-9 sweep tolerance
    np.testing.assert_allclose(np.asarray(gs["flowveldepth"]),
                               np.asarray(ref["flowveldepth"]),
                               rtol=2e-6, atol=5e-7)
    np.testing.assert_allclose(np.asarray(gs["flowveldepth"]),
                               np.asarray(jac["flowveldepth"]),
                               rtol=2e-6, atol=5e-7)
    # the performance claim: C_gs-lane-per-sweep propagation
    assert sum(gs["strict_sweeps"]) < sum(jac["strict_sweeps"]), \
        (gs["strict_sweeps"], jac["strict_sweeps"])


def test_gs_matches_jacobi_with_reservoir_da_and_nudging():
    """Junction network + typed reservoir DA + gage nudging, f32: GS and
    Jacobi strict paths agree at fixed-point tolerance."""
    nts, dt = 6, 300.0
    dtype = jnp.float32
    conn = {1: [2], 2: [901], 901: [3], 3: [7], 4: [5], 5: [7],
            7: [8], 8: [9], 9: [],
            20: [21], 21: [22], 22: []}
    topo = from_connections(conn, reservoir_ids=[901])
    n = topo.n_nodes
    rng = np.random.default_rng(5)
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = _chan(n, rng, dtype)
    lp = LevelpoolParams(*[jnp.asarray([v], dtype) for v in
                           (2.0, 12.0, 1.2, 0.1, 8.0, 0.4, 11.0, 12.0,
                            10.0)])
    hobs = np.full((1, 30), np.nan)
    hobs[0, 2:20] = rng.uniform(3, 9, 18)
    res_da = ReservoirDAData.inactive(1, nts, dtype)._replace(
        wbody_type=jnp.asarray([2], jnp.int32),
        hybrid_obs=jnp.asarray(hobs, dtype),
        hybrid_obs_time=jnp.asarray(np.arange(30) * 900.0, dtype))
    gage_rows = np.asarray([topo.index_of[8], topo.index_of[21]])
    obs = np.full((nts + 1, 2), np.nan)
    obs[2:5, 0] = rng.uniform(3, 6, 3)
    obs[1:, 1] = rng.uniform(1, 2, nts)
    da = GageDA(rows=jnp.asarray(gage_rows),
                obs=jnp.asarray(obs, dtype),
                lastobs_val=jnp.asarray([np.nan, 2.5], dtype),
                lastobs_time=jnp.asarray([0.0, -900.0], dtype),
                decay_coeff=120.0)
    q0 = jnp.asarray(rng.uniform(1, 4, n), dtype)
    d0 = jnp.asarray(rng.uniform(0.1, 0.5, n), dtype)
    d0 = d0.at[topo.index_of[901]].set(10.5)
    elev0 = jnp.asarray([10.5], dtype)
    qlat = jnp.asarray(rng.uniform(0.2, 2.0, (3, n)), dtype)

    base = dict(dt=dt, nts=nts, qts_subdivisions=2,
                assume_short_ts=False, strict_iterative=True,
                kernel="pallas")
    jac = route_stepped(net, cp, lp, RoutingConfig(**base), q0, d0,
                        elev0, qlat, da, res_da)
    gs = route_stepped(net, cp, lp, RoutingConfig(**base, strict_gs=True),
                       q0, d0, elev0, qlat, da, res_da)
    np.testing.assert_allclose(np.asarray(gs["flowveldepth"]),
                               np.asarray(jac["flowveldepth"]),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs["nudge"]),
                               np.asarray(jac["nudge"]),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gs["state"].hybrid.persisted_outflow),
        np.asarray(jac["state"].hybrid.persisted_outflow),
        rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs["state"].res_elev),
                               np.asarray(jac["state"].res_elev),
                               rtol=2e-6, atol=1e-6)
