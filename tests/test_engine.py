"""End-to-end engine parity: vectorized JAX engine vs scalar reference
simulator on a synthetic multi-junction network with a reservoir and a
gage, in both timestep modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from troute_tpu.network import graph
from troute_tpu.network.topology import from_connections
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.routing.engine import (
    ChannelParams, GageDA, RoutingConfig, network_arrays_from_topology, route)

from reference_network import simulate_reference

# Synthetic network: two headwater branches joining above a reservoir,
# a mainstem below, plus an independent second basin.
#
#   1 -> 2 -> 3 ----\
#                    v
#   4 -> 5 ---------> 6 -> 900(lake) -> 7 -> 8(gage) -> 9
#   10 -> 11 -> 12   (independent basin)
CONN = {
    1: [2], 2: [3], 3: [6], 4: [5], 5: [6], 6: [900],
    900: [7], 7: [8], 8: [9], 9: [],
    10: [11], 11: [12], 12: [],
}
LAKE_ID = 900

LAKE = dict(area=1.5, max_depth=9.96, orifice_area=1.0, orifice_coeff=0.1,
            orifice_elev=7.733, weir_coeff=0.4, weir_elev=9.626,
            weir_length=10.0, dam_length=10.0, elev0=9.7)


def _setup(nts=36, with_gage=True, seed=3):
    rng = np.random.default_rng(seed)
    ids = sorted(CONN.keys())
    n = len(ids)
    chan = {}
    for i in ids:
        chan[i] = dict(
            dx=float(rng.uniform(500, 3000)), bw=float(rng.uniform(2, 20)),
            tw=float(rng.uniform(25, 60)), twcc=float(rng.uniform(80, 200)),
            n=0.055, ncc=0.11, cs=float(rng.uniform(0.3, 1.5)),
            s0=float(rng.uniform(0.001, 0.02)))
    q0 = {i: float(rng.uniform(0.5, 5.0)) for i in ids}
    depth0 = {i: float(rng.uniform(0.05, 0.8)) for i in ids}
    q0[LAKE_ID] = 1.0          # initial reservoir outflow
    depth0[LAKE_ID] = LAKE["elev0"]
    n_cols = nts // 4
    qlat = {i: rng.uniform(0.1, 3.0, n_cols) for i in ids}

    gages = None
    if with_gage:
        obs = np.full((nts + 1, 1), np.nan)
        obs[2:20, 0] = rng.uniform(5.0, 15.0, 18)   # obs stop at t=19
        gages = dict(rows=[8], obs=obs, lastobs_val=[np.nan],
                     lastobs_time=[np.nan], decay_coeff=120.0)
    return ids, chan, q0, depth0, qlat, gages


def _run_engine(ids, chan, q0, depth0, qlat, gages, nts, dt, short,
                dtype=jnp.float64, return_courant=False,
                strict_iterative=False, stepped=False):
    topo = from_connections(CONN, reservoir_ids=[LAKE_ID])
    net = network_arrays_from_topology(topo, need_levels=not short)
    perm = topo.ids  # row order
    idx = {int(i): k for k, i in enumerate(perm)}

    def col(name, default=1.0):
        return jnp.asarray([chan[int(i)].get(name, default) if int(i) != LAKE_ID
                            else default for i in perm], dtype)

    cp = ChannelParams(dx=col("dx"), bw=col("bw"), tw=col("tw"),
                       twcc=col("twcc"), n=col("n"), ncc=col("ncc"),
                       cs=col("cs"), s0=col("s0"))
    lp = LevelpoolParams(
        area=jnp.asarray([LAKE["area"]], dtype),
        max_depth=jnp.asarray([LAKE["max_depth"]], dtype),
        orifice_area=jnp.asarray([LAKE["orifice_area"]], dtype),
        orifice_coeff=jnp.asarray([LAKE["orifice_coeff"]], dtype),
        orifice_elev=jnp.asarray([LAKE["orifice_elev"]], dtype),
        weir_coeff=jnp.asarray([LAKE["weir_coeff"]], dtype),
        weir_elev=jnp.asarray([LAKE["weir_elev"]], dtype),
        weir_length=jnp.asarray([LAKE["weir_length"]], dtype),
        dam_length=jnp.asarray([LAKE["dam_length"]], dtype))

    q0_arr = jnp.asarray([q0[int(i)] for i in perm], dtype)
    d0_arr = jnp.asarray([depth0[int(i)] for i in perm], dtype)
    elev0 = jnp.asarray([LAKE["elev0"]], dtype)
    n_cols = len(next(iter(qlat.values())))
    qlat_arr = jnp.asarray(
        np.stack([np.array([qlat[int(i)][c] for i in perm])
                  for c in range(n_cols)]), dtype)

    da = None
    if gages is not None:
        da = GageDA(rows=jnp.asarray([idx[r] for r in gages["rows"]], jnp.int32),
                    obs=jnp.asarray(gages["obs"], dtype),
                    lastobs_val=jnp.asarray(gages["lastobs_val"], dtype),
                    lastobs_time=jnp.asarray(gages["lastobs_time"], dtype),
                    decay_coeff=gages["decay_coeff"])

    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=short,
                        return_courant=return_courant,
                        strict_iterative=strict_iterative,
                        kernel="pallas" if stepped else "xla")
    if stepped:
        from troute_tpu.routing.engine import route_stepped
        out = route_stepped(net, cp, lp, cfg, q0_arr, d0_arr, elev0,
                            qlat_arr, da)
    else:
        out = route(net, cp, lp, cfg, q0_arr, d0_arr, elev0, qlat_arr, da)
    return out, idx


@pytest.mark.parametrize("short", [True, False])
def test_engine_vs_reference(short):
    nts, dt = 36, 300.0
    ids, chan, q0, depth0, qlat, gages = _setup(nts)
    gages_copy = None
    if gages:
        gages_copy = dict(gages, lastobs_val=list(gages["lastobs_val"]),
                          lastobs_time=list(gages["lastobs_time"]))

    fvd_ref, nudge_ref = simulate_reference(
        CONN, chan, q0, depth0, qlat, nts, dt, qts_subdivisions=4,
        assume_short_ts=short,
        reservoirs={LAKE_ID: LAKE}, gages=gages_copy)

    out, idx = _run_engine(ids, chan, q0, depth0, qlat, gages, nts, dt, short)
    fvd = np.asarray(out["flowveldepth"])  # [nts, N, 3]

    for node in CONN:
        k = idx[node]
        got = fvd[:, k, :]
        want = fvd_ref[node][1:, :]
        np.testing.assert_allclose(
            got, want, rtol=1e-8, atol=1e-10,
            err_msg=f"node {node} ({'short' if short else 'strict'} mode)")

    nudge = np.asarray(out["nudge"])
    np.testing.assert_allclose(nudge, nudge_ref[1:], rtol=1e-8, atol=1e-10)


def test_mass_conservation_no_lake():
    """With flat geometry and no reservoir, total outflow volume over a long
    run approaches total lateral inflow volume (MC conserves mass)."""
    conn = {1: [2], 2: [3], 3: []}
    topo = from_connections(conn)
    net = network_arrays_from_topology(topo, need_levels=False)
    n = topo.n_nodes
    dtype = jnp.float64
    one = jnp.ones(n, dtype)
    cp = ChannelParams(dx=1000.0 * one, bw=10.0 * one, tw=30.0 * one,
                       twcc=90.0 * one, n=0.05 * one, ncc=0.1 * one,
                       cs=1.0 * one, s0=0.005 * one)
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    nts = 2000
    dt = 300.0
    ql_const = 1.0
    qlat = jnp.full((1, n), ql_const, dtype)
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=1,
                        assume_short_ts=True)
    out = route(net, cp, lp, cfg, jnp.zeros(n, dtype), jnp.zeros(n, dtype),
                jnp.zeros(1, dtype), qlat, None)
    q_outlet = np.asarray(out["flowveldepth"])[:, topo.index_of[3], 0]
    # steady state: outlet flow == 3 segments * 1 m3/s lateral
    assert q_outlet[-1] == pytest.approx(3.0, rel=1e-3)


def test_strict_mode_chunked_levels():
    """Chunked level scheduling (bounded-width strict mode) matches the
    dense per-level schedule exactly."""
    nts, dt = 24, 300.0
    ids, chan, q0, depth0, qlat, gages = _setup(nts)
    out_full, idx = _run_engine(ids, chan, q0, depth0, qlat, gages, nts, dt,
                                short=False)

    topo = from_connections(CONN, reservoir_ids=[LAKE_ID])
    net = network_arrays_from_topology(topo, need_levels=True,
                                       level_chunk_width=2)
    assert net.level_nodes.shape[1] == 2
    assert net.level_nodes.shape[0] > topo.n_levels  # levels got split
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
        np.stack([[qlat[int(i)][c] for i in perm] for c in range(n_cols)]),
        dtype)
    da = GageDA(rows=jnp.asarray([idx[r] for r in gages["rows"]], jnp.int32),
                obs=jnp.asarray(gages["obs"], dtype),
                lastobs_val=jnp.asarray(gages["lastobs_val"], dtype),
                lastobs_time=jnp.asarray(gages["lastobs_time"], dtype),
                decay_coeff=gages["decay_coeff"])
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=False)
    out_chunked = route(net, cp, lp, cfg, q0_arr, d0_arr,
                        jnp.asarray([LAKE["elev0"]], dtype), qlat_arr, da)
    np.testing.assert_allclose(
        np.asarray(out_chunked["flowveldepth"]),
        np.asarray(out_full["flowveldepth"]), rtol=1e-12, atol=1e-14)


def test_strict_iterative_matches_level_scan():
    """The fixed-point strict mode converges to the level-scan solution
    (reservoir + gage nudging in the same within-step coupling) — the
    depth-independent alternative for deep networks."""
    ids, chan, q0, depth0, qlat, gages = _setup(nts=24)
    ref, _ = _run_engine(ids, chan, q0, depth0, qlat, gages, 24, 300.0,
                         short=False)
    got, _ = _run_engine(ids, chan, q0, depth0, qlat, gages, 24, 300.0,
                         short=False, strict_iterative=True)
    np.testing.assert_allclose(np.asarray(got["flowveldepth"]),
                               np.asarray(ref["flowveldepth"]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["nudge"]),
                               np.asarray(ref["nudge"]),
                               rtol=1e-9, atol=1e-9)


def test_route_stepped_strict_matches_level_scan():
    """The host-stepped strict driver (fixed-point sweeps with the
    Pallas block kernel at jit top level — the production TPU form)
    converges to the level-scan strict solution with the full coupling:
    reservoir inflows and gage nudging see current-step upstream sums."""
    ids, chan, q0, depth0, qlat, gages = _setup(nts=24)
    ref, _ = _run_engine(ids, chan, q0, depth0, qlat, gages, 24, 300.0,
                         short=False)
    got, _ = _run_engine(ids, chan, q0, depth0, qlat, gages, 24, 300.0,
                         short=False, strict_iterative=True, stepped=True)
    np.testing.assert_allclose(np.asarray(got["flowveldepth"]),
                               np.asarray(ref["flowveldepth"]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["nudge"]),
                               np.asarray(ref["nudge"]),
                               rtol=1e-9, atol=1e-9)
    # final state hand-off fields must match too (run-set chaining)
    for f in ("q", "depth", "res_elev", "lastobs_val", "lastobs_time"):
        np.testing.assert_allclose(
            np.asarray(getattr(got["state"], f)),
            np.asarray(getattr(ref["state"], f)), rtol=1e-9, atol=1e-9)


def test_strict_iterative_deep_chain():
    """Depth independence: a 300-segment single chain (level scan = 300
    sequential steps/timestep) solved by the fixed point.  The iterate
    delta (strict_tol=1e-9) under-bounds the true residual by the
    contraction factor of the quc coupling — observed agreement ~1e-7
    relative on the longest chains."""
    from troute_tpu.network.topology import from_connections
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route)

    n = 300
    conn = {i: [i + 1] for i in range(1, n)}
    conn[n] = []
    rng = np.random.default_rng(4)
    topo = from_connections(conn)
    dtype = jnp.float64
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
    qlat = jnp.asarray(rng.uniform(0.1, 3.0, (3, n)), dtype)
    outs = {}
    for it in (False, True):
        cfg = RoutingConfig(dt=300.0, nts=12, qts_subdivisions=4,
                            assume_short_ts=False, strict_iterative=it)
        net = network_arrays_from_topology(topo, need_levels=not it)
        outs[it] = np.asarray(route(net, cp, lp, cfg, q0, d0,
                                    jnp.zeros((1,), dtype), qlat,
                                    None)["flowveldepth"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6,
                               atol=1e-8)


def test_strict_iterative_accel_opt_in_same_fixed_point():
    """route()'s while-loop linearized-propagation accelerator
    (strict_accel=True — 'auto' resolves OFF for the in-scan engine) is
    a trajectory change only: in f64 the accelerated and plain
    iterations converge to the same fixed point to ~the convergence
    tolerance.  Junction-rich forest so the accel's banded propagation
    actually crosses junctions."""
    from troute_tpu.network.topology import build_topology
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route)

    rng = np.random.default_rng(11)
    n = 3000
    ids = np.arange(1, n + 1, dtype=np.int64)
    idx = np.arange(n)
    j = np.minimum(idx + rng.integers(1, 5, n), n - 1)
    down = ids[j]
    down[idx == n - 1] = 0
    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    assert net.uplan is not None
    dtype = jnp.float64
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
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (3, n)), dtype)
    # warm the state first: cold random starts bind the 64-sweep cap on
    # junction-rich forests, and cap-bound UNconverged iterates are
    # trajectory-dependent by construction
    cfg_w = RoutingConfig(dt=300.0, nts=12, qts_subdivisions=6,
                          assume_short_ts=True)
    st = route(net, cp, lp, cfg_w, q0, d0, jnp.zeros((1,), dtype),
               qlat, None)["state"]
    outs = {}
    for accel in (False, True):
        cfg = RoutingConfig(dt=300.0, nts=8, qts_subdivisions=4,
                            assume_short_ts=False, strict_iterative=True,
                            strict_accel=accel)
        outs[accel] = np.asarray(route(net, cp, lp, cfg, st.q, st.depth,
                                       jnp.zeros((1,), dtype), qlat,
                                       None)["flowveldepth"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6,
                               atol=1e-7)


def test_route_does_not_recompile_across_calls():
    """The CLI builds FRESH (same-shape) arrays every invocation; route()
    must hit the jit cache, not re-trace/re-compile.  Eager-scan tracing
    used to close over the network arrays as jaxpr constants, costing a
    full recompile per call (measured 1.2 s of a 1.6 s warm Laura run —
    round-5 fix; see _route_jit)."""
    from troute_tpu.routing.engine import _route_jit

    ids, chan, q0, depth0, qlat, gages = _setup(with_gage=False)
    _route_jit._clear_cache()
    outs = []
    for _ in range(2):
        # fresh arrays each call, like a fresh CLI invocation
        out, _idx = _run_engine(ids, chan, dict(q0), dict(depth0),
                                {k: v.copy() for k, v in qlat.items()},
                                None, nts=8, dt=300.0, short=True)
        outs.append(out)
    assert _route_jit._cache_size() == 1, _route_jit._cache_size()
    np.testing.assert_array_equal(
        np.asarray(outs[0]["flowveldepth"]),
        np.asarray(outs[1]["flowveldepth"]))
