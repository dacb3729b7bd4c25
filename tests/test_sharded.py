"""Multi-device sharded routing tests on the 8-device virtual CPU mesh.

Verifies that basin partitioning and forced-cut partitions (exercising the
halo exchange) reproduce the single-device engine exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from troute_tpu.network.topology import from_connections
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.parallel.partition import (
    gather_from_shards, greedy_basin_assignment, partition_network)
from troute_tpu.parallel.sharded_engine import (
    build_sharded_inputs, route_sharded, route_sharded_fvd)
from troute_tpu.routing.engine import (
    ChannelParams, RoutingConfig, network_arrays_from_topology, route)

# two independent basins plus a mainstem with junctions and a reservoir
CONN = {
    1: [2], 2: [3], 3: [6], 4: [5], 5: [6], 6: [900],
    900: [7], 7: [8], 8: [9], 9: [],
    10: [11], 11: [12], 12: [],
    20: [21], 21: [22], 22: [23], 23: [],
}
LAKE_ID = 900
LAKE_ROWVALS = np.array([[1.5, 9.96, 1.0, 0.1, 7.733, 0.4, 9.626, 10.0, 10.0]])
ELEV0 = 9.7


def _global_setup(seed=11):
    rng = np.random.default_rng(seed)
    topo = from_connections(CONN, reservoir_ids=[LAKE_ID])
    n = topo.n_nodes
    chan = dict(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    q0 = rng.uniform(0.5, 5.0, n)
    depth0 = rng.uniform(0.05, 0.8, n)
    lake_row = topo.index_of[LAKE_ID]
    q0[lake_row] = 1.0
    depth0[lake_row] = ELEV0
    qlat_cols = rng.uniform(0.1, 3.0, (6, n))
    return topo, chan, q0, depth0, qlat_cols, lake_row


def _single_device_run(topo, chan, q0, depth0, qlat_cols, nts, dt, dtype):
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, dtype) for k, v in chan.items()})
    lp = LevelpoolParams(*[jnp.asarray(LAKE_ROWVALS[:, i], dtype)
                           for i in range(9)])
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    out = route(net, cp, lp, cfg, jnp.asarray(q0, dtype),
                jnp.asarray(depth0, dtype), jnp.asarray([ELEV0], dtype),
                jnp.asarray(qlat_cols, dtype), None)
    return np.asarray(out["flowveldepth"])   # [nts, N, 3]


@pytest.mark.parametrize("forced_cut", [False, True])
def test_sharded_matches_single_device(forced_cut):
    nts, dt = 24, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    ref = _single_device_run(topo, chan, q0, depth0, qlat_cols, nts, dt, dtype)

    n_dev = 8
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devices), ("basin",))

    if forced_cut:
        # deliberately split basins mid-stream to exercise halo exchange
        assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    else:
        assignment = greedy_basin_assignment(topo, n_dev)
    part = partition_network(topo, n_dev, assignment)
    if forced_cut:
        assert part.cut_edges > 0, "forced cut must produce halo traffic"

    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0,
        {lake_row: ELEV0}, qlat_cols, dtype=dtype)
    fvd_sh = np.asarray(route_sharded_fvd(mesh, inp, dt, nts,
                                      qts_subdivisions=4))

    # reassemble global [nts, N, 3]
    got = np.stack([
        gather_from_shards(part, fvd_sh[:, t]) for t in range(nts)])
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_partition_shapes_and_coverage():
    topo, *_ = _global_setup()
    part = partition_network(topo, 4)
    rows = part.global_row[part.global_row >= 0]
    assert sorted(rows) == list(range(topo.n_nodes))
    # basin partition has no cut edges for these independent basins... unless
    # a basin was split; greedy keeps basins whole:
    assert part.cut_edges == 0


def test_sharded_with_gage_nudging():
    """Gage DA in the sharded engine matches the single-device engine,
    including gages on forced cross-device cuts."""
    from troute_tpu.routing.engine import GageDA

    nts, dt = 24, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    rng = np.random.default_rng(5)

    gage_nodes = [3, 8, 22]          # mid-chain, outlet, other basin
    gage_rows = np.asarray([topo.index_of[g] for g in gage_nodes])
    obs = np.full((nts + 1, len(gage_nodes)), np.nan, np.float64)
    obs[2:10, 0] = rng.uniform(5, 9, 8)
    obs[5:20, 1] = rng.uniform(2, 4, 15)      # gaps elsewhere -> decay
    obs[1:, 2] = rng.uniform(1, 2, nts)
    lo_val = np.asarray([np.nan, 3.0, np.nan])
    lo_time = np.asarray([0.0, -600.0, 0.0])

    da = GageDA(rows=jnp.asarray(gage_rows),
                obs=jnp.asarray(obs, dtype),
                lastobs_val=jnp.asarray(lo_val, dtype),
                lastobs_time=jnp.asarray(lo_time, dtype),
                decay_coeff=120.0)
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, dtype) for k, v in chan.items()})
    lp = LevelpoolParams(*[jnp.asarray(LAKE_ROWVALS[:, i], dtype)
                           for i in range(9)])
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    ref = np.asarray(route(net, cp, lp, cfg, jnp.asarray(q0, dtype),
                           jnp.asarray(depth0, dtype),
                           jnp.asarray([ELEV0], dtype),
                           jnp.asarray(qlat_cols, dtype),
                           da)["flowveldepth"])

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    assert part.cut_edges > 0
    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0, {lake_row: ELEV0},
        qlat_cols, dtype=dtype, gage_rows=gage_rows, gage_obs=obs,
        gage_lo_val=lo_val, gage_lo_time=lo_time)
    fvd_sh = np.asarray(route_sharded_fvd(mesh, inp, dt, nts,
                                      qts_subdivisions=4))
    for d in range(n_dev):
        for j in range(part.n_local):
            g = part.global_row[d, j]
            if g < 0:
                continue
            np.testing.assert_allclose(fvd_sh[d, :, j], ref[:, g],
                                       rtol=0, atol=1e-12,
                                       err_msg=f"node row {g}")


def test_sharded_typed_reservoir_da():
    """Typed reservoir DA (persistence + Great Lakes) in the sharded
    engine matches the single-device engine bit-exactly."""
    from troute_tpu.ops.reservoir_da import (
        GreatLakesDAState, HybridDAState, RfcDAState)
    from troute_tpu.parallel.sharded_engine import shard_reservoir_da
    from troute_tpu.routing.engine import ReservoirDAData

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
    q0[lake_rows[901]] = 2.0
    depth0[lake_rows[901]] = 10.5
    q0[lake_rows[903]] = 2.0
    depth0[lake_rows[903]] = 40.0
    qlat_cols = rng.uniform(0.1, 2.0, (6, n))

    n_res = topo.reservoir_rows.size
    hobs = np.full((n_res, 20), np.nan)
    gobs = np.full((n_res, 20), np.nan)
    gtime = np.zeros((n_res, 20))
    clim = np.zeros((n_res, 12))
    wt = np.ones(n_res, np.int32)
    for s, r in enumerate(topo.reservoir_rows):
        lk = int(topo.ids[r])
        if lk == 901:
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
    rda_sh = shard_reservoir_da(part, topo, res_da, np.asarray(inp.res_slots),
                                dtype=dtype)
    fvd_sh = np.asarray(route_sharded_fvd(mesh, inp, dt, nts,
                                      qts_subdivisions=4, res_da=rda_sh))
    for d in range(n_dev):
        for j in range(part.n_local):
            g = part.global_row[d, j]
            if g < 0:
                continue
            np.testing.assert_allclose(fvd_sh[d, :, j], ref[:, g],
                                       rtol=0, atol=1e-12,
                                       err_msg=f"row {g}")


def test_neighbor_exchange_plan_and_equivalence():
    """The ppermute plan covers every cut edge exactly once, each round is
    a partial permutation, and the neighbor path is bit-identical to the
    all_gather path (which is itself bit-exact vs the single device)."""
    nts, dt = 12, 300.0
    dtype = jnp.float64
    topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
    n_dev = 8
    assignment = (np.arange(topo.n_nodes) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    assert part.cut_edges > 0

    # plan properties: every halo slot is delivered by exactly one
    # (round, message) entry, and each round's pairs form a partial
    # permutation (each device sends <= 1 and receives <= 1)
    delivered = np.zeros((n_dev, part.n_halo), np.int64)
    for d in range(n_dev):
        for r in range(part.recv_pos.shape[1]):
            for pos in part.recv_pos[d, r]:
                if pos >= 0:
                    delivered[d, pos] += 1
    expected = (part.halo_src_dev >= 0).astype(np.int64)
    np.testing.assert_array_equal(delivered, expected)
    for r in range(part.perm_pairs.shape[0]):
        pairs = [(s, d) for s, d in part.perm_pairs[r] if s >= 0]
        srcs = [s for s, _ in pairs]
        dsts = [d for _, d in pairs]
        assert len(set(srcs)) == len(srcs)
        assert len(set(dsts)) == len(dsts)
    # neighbor traffic is sized by actual cut edges, not devices x exports
    W = part.send_slot.shape[-1]
    n_rounds = part.perm_pairs.shape[0]
    assert n_rounds * W <= n_dev * part.n_export, \
        "neighbor plan should not exceed all_gather traffic"

    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devices), ("basin",))
    inp = build_sharded_inputs(
        part, topo, chan, LAKE_ROWVALS, q0, depth0,
        {lake_row: ELEV0}, qlat_cols, dtype=dtype)
    fvd_nb = np.asarray(route_sharded_fvd(mesh, inp, dt, nts,
                                      qts_subdivisions=4,
                                      exchange="neighbor"))
    fvd_ag = np.asarray(route_sharded_fvd(mesh, inp, dt, nts,
                                      qts_subdivisions=4,
                                      exchange="allgather"))
    np.testing.assert_array_equal(fvd_nb, fvd_ag)


@pytest.mark.parametrize("mode", ["short", "strict"])
def test_route_sharded_global_full_contract(mode):
    """``route_sharded_global`` reproduces ``route()``'s full output
    contract — flowveldepth, nudge magnitudes, and the final RoutingState
    (flows, depths, reservoir elevations, lastobs, typed-DA states) — so
    the CLI can swap engines per run set.  ``strict`` runs the
    fixed-point within-step coupling with a per-sweep halo exchange
    (every node on a different device here — maximal cut edges) against
    the single-device ``step_strict_iter``; both converge the iterate to
    1e-9, so agreement is to fixed-point tolerance rather than exact."""
    from troute_tpu.ops.reservoir_da import HybridDAState
    from troute_tpu.parallel.sharded_engine import route_sharded_global
    from troute_tpu.routing.engine import GageDA, ReservoirDAData

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
    for lk in (901, 903):
        q0[lake_rows[lk]] = 2.0
        depth0[lake_rows[lk]] = elev_by_row[lake_rows[lk]]
    qlat_cols = rng.uniform(0.1, 2.0, (6, n))

    n_res = topo.reservoir_rows.size
    hobs = np.full((n_res, 20), np.nan)
    wt = np.ones(n_res, np.int32)
    for s, r in enumerate(topo.reservoir_rows):
        if int(topo.ids[r]) == 901:
            wt[s] = 2
            hobs[s] = rng.uniform(3, 9, 20)
    res_da = ReservoirDAData.inactive(n_res, nts, dtype)._replace(
        wbody_type=jnp.asarray(wt),
        hybrid_obs=jnp.asarray(hobs, dtype),
        hybrid_obs_time=jnp.asarray(np.arange(20) * 900.0, dtype),
        month_idx=jnp.full(nts + 1, 7, jnp.int32))

    gage_rows = np.asarray([topo.index_of[3], topo.index_of[11]])
    obs = np.full((nts + 1, 2), np.nan)
    obs[2:12, 0] = rng.uniform(5, 9, 10)
    obs[1:, 1] = rng.uniform(1, 2, nts)
    da = GageDA(rows=jnp.asarray(gage_rows), obs=jnp.asarray(obs, dtype),
                lastobs_val=jnp.asarray([np.nan, 3.0], dtype),
                lastobs_time=jnp.asarray([0.0, -600.0], dtype),
                decay_coeff=120.0)

    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, dtype) for k, v in chan.items()})
    lp = LevelpoolParams(*[jnp.asarray(parm[:, i], dtype) for i in range(9)])
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=(mode == "short"),
                        strict_iterative=(mode == "strict"))
    tol = dict(rtol=0, atol=1e-12) if mode == "short" \
        else dict(rtol=1e-8, atol=1e-8)
    elev0 = jnp.asarray([elev_by_row[int(r)]
                         for r in topo.reservoir_rows], dtype)
    ref = route(net, cp, lp, cfg, jnp.asarray(q0, dtype),
                jnp.asarray(depth0, dtype), elev0,
                jnp.asarray(qlat_cols, dtype), da, res_da)

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    assignment = (np.arange(n) % n_dev).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    got = route_sharded_global(mesh, topo, chan, parm, cfg, q0, depth0,
                               elev0, qlat_cols, da=da, res_da=res_da,
                               part=part, dtype=dtype)

    np.testing.assert_allclose(got["flowveldepth"],
                               np.asarray(ref["flowveldepth"]), **tol)
    np.testing.assert_allclose(got["nudge"], np.asarray(ref["nudge"]),
                               **tol)
    rs, gs = ref["state"], got["state"]
    for name in ("q", "depth", "res_elev", "lastobs_val", "lastobs_time"):
        np.testing.assert_allclose(np.asarray(getattr(gs, name)),
                                   np.asarray(getattr(rs, name)),
                                   err_msg=name, **tol)
    for tree_name in ("hybrid", "rfc", "gl"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), **tol),
            getattr(gs, tree_name), getattr(rs, tree_name))


def test_balanced_assignment_splits_large_basin():
    """``balanced_assignment`` splits a single large basin into ~equal
    device loads at subtree boundaries (the Mississippi problem the
    reference's by-network pool cannot split, AGU_Poster.md:211-214)."""
    from troute_tpu.parallel.partition import balanced_assignment

    # one basin: a 64-node mainstem with a tributary every 4th node
    conn = {i: [i + 1] for i in range(64)}
    conn[64] = []
    for i in range(0, 64, 4):
        conn[1000 + i] = [i]
    topo = from_connections(conn)
    n_dev = 8
    a = balanced_assignment(topo, n_dev)
    assert (a >= 0).all()
    loads = np.bincount(a, minlength=n_dev)
    assert loads.sum() == topo.n_nodes
    assert loads.max() <= -(-topo.n_nodes // n_dev) + 1
    part = partition_network(topo, n_dev, a)
    # subtree splitting keeps cuts sparse: a few per device boundary,
    # not O(network width)
    assert 0 < part.cut_edges <= 3 * n_dev
    # and the routed result stays exact
    rng = np.random.default_rng(3)
    n = topo.n_nodes
    chan = dict(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    q0 = rng.uniform(0.5, 5.0, n)
    depth0 = rng.uniform(0.05, 0.8, n)
    qlat_cols = rng.uniform(0.1, 3.0, (6, n))
    nts, dt = 12, 300.0
    dtype = jnp.float64
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, dtype) for k, v in chan.items()})
    lp = LevelpoolParams(*[jnp.ones((1,), dtype)] * 9)
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    ref = np.asarray(route(net, cp, lp, cfg, jnp.asarray(q0, dtype),
                           jnp.asarray(depth0, dtype),
                           jnp.zeros((1,), dtype),
                           jnp.asarray(qlat_cols, dtype),
                           None)["flowveldepth"])
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    inp = build_sharded_inputs(part, topo, chan, None, q0, depth0, {},
                               qlat_cols, dtype=dtype)
    fvd_sh = np.asarray(route_sharded_fvd(mesh, inp, dt, nts,
                                          qts_subdivisions=4))
    from troute_tpu.parallel.partition import gather_from_shards
    got = gather_from_shards(part, fvd_sh.transpose(0, 2, 1, 3))
    got = got.transpose(1, 0, 2)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_sharded_banded_upstream_plan():
    """Per-shard banded upstream sums (partition._banded_local_plans):
    neighbor and allgather stay bit-identical to each other, match the
    gather-form sharded run to f64 roundoff, and match the single-device
    engine."""
    from troute_tpu.network.topology import build_topology

    nts, dt = 12, 300.0
    dtype = jnp.float64
    rng = np.random.default_rng(23)
    n = 3000
    ids = np.arange(1, n + 1, dtype=np.int64)
    down = np.zeros(n, np.int64)
    for i in range(n - 1):
        down[i] = 0 if rng.random() < 0.03 \
            else ids[min(i + int(rng.integers(1, 7)), n - 1)]
    topo = build_topology(ids, down, row_order="postorder")
    chan = dict(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    q0 = rng.uniform(0.5, 5.0, n)
    depth0 = rng.uniform(0.05, 0.8, n)
    qlat_cols = rng.uniform(0.1, 3.0, (3, n))

    n_dev = 8
    # contiguous ranges + 3% random kicks to force scattered cut edges
    assignment = np.minimum(np.arange(n) * n_dev // n, n_dev - 1)
    kick = rng.uniform(size=n) < 0.03
    assignment = np.where(kick, (assignment + 1) % n_dev,
                          assignment).astype(np.int32)
    part = partition_network(topo, n_dev, assignment)
    assert part.cut_edges > 50
    assert part.band_shifts is not None and len(part.band_shifts) >= 1
    assert part.band_coverage > 0.8
    assert 1 in part.band_shifts            # postorder chains

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("basin",))
    inp = build_sharded_inputs(part, topo, chan, None, q0, depth0, {},
                               qlat_cols, dtype=dtype)
    kw = dict(qts_subdivisions=4)
    fvd_nb = np.asarray(route_sharded_fvd(
        mesh, inp, dt, nts, exchange="neighbor",
        band_shifts=part.band_shifts, **kw))
    fvd_ag = np.asarray(route_sharded_fvd(
        mesh, inp, dt, nts, exchange="allgather",
        band_shifts=part.band_shifts, **kw))
    np.testing.assert_array_equal(fvd_nb, fvd_ag)

    fvd_gather = np.asarray(route_sharded_fvd(
        mesh, inp, dt, nts, exchange="neighbor", band_shifts=None, **kw))
    np.testing.assert_allclose(fvd_nb, fvd_gather, rtol=1e-12, atol=1e-12)

    ref = _single_device_run(topo, chan, q0, depth0, qlat_cols, nts, dt,
                             dtype)
    for d in range(n_dev):
        for j in range(part.n_local):
            g = part.global_row[d, j]
            if g < 0:
                continue
            np.testing.assert_allclose(fvd_nb[d, :, j], ref[:, g],
                                       rtol=1e-11, atol=1e-11,
                                       err_msg=f"row {g}")


def test_exchange_scaling_flat_per_device():
    """Halo-exchange scaling (SURVEY §2.4 north star): as device count
    grows, per-device compute shrinks ~1/D while the per-device exchange
    plan stays bounded — the structural property behind flat per-device
    cost.  Wall time on the virtual CPU mesh is meaningless (one physical
    socket), so the assertion is on the exchange plan itself: message
    rounds x width per device must not grow with D, and halo traffic
    stays a tiny fraction of per-device work."""
    from troute_tpu.network.topology import build_topology
    from troute_tpu.parallel.partition import balanced_assignment

    # CONUS-statistics synthetic forest (same generator shape as bench.py):
    # one dominant basin (~45%), heavy-tailed rest
    rng = np.random.default_rng(7)
    n = 150_000
    n_basins = 800
    ids = np.arange(1, n + 1, dtype=np.int64)
    idx = np.arange(n)
    majors = np.array([0.45, 0.06, 0.05, 0.035, 0.03])
    sizes = (majors * n).astype(np.int64)
    small = rng.lognormal(0.0, 1.2, n_basins - sizes.size)
    rest = n - sizes.sum()
    small = np.maximum((small / small.sum() * rest).astype(np.int64), 1)
    sizes = np.concatenate([sizes, small])
    sizes[-1] += n - sizes.sum()
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    basin_of = np.searchsorted(bounds, idx, side="right") - 1
    basin_end = bounds[basin_of + 1] - 1
    hop = rng.integers(1, 5, n)
    j = np.minimum(idx + hop, basin_end)
    down = ids[j]
    down[idx == basin_end] = 0
    topo = build_topology(ids, down, row_order="postorder")

    stats = {}
    for n_dev in (2, 4, 8):
        part = partition_network(
            topo, n_dev, assignment=balanced_assignment(topo, n_dev))
        rounds = part.perm_pairs.shape[0]
        width = part.send_slot.shape[2] if part.send_slot.ndim == 3 else 0
        per_dev_msgs = rounds * width          # values moved per exchange
        stats[n_dev] = dict(n_local=part.n_local, halo=part.n_halo,
                            rounds=rounds, per_dev_msgs=per_dev_msgs,
                            cut=part.cut_edges)
        # compute shrinks with D (tree-cut parts balance the big basin)
        assert part.n_local <= 1.25 * (-(-n // n_dev)), stats
        # total cuts stay O(n_dev): connected parts cost P - basins cuts
        # and contiguous slicing colocates neighbors (measured: 0/1/3)
        assert part.cut_edges <= 4 * n_dev, stats
        # per-device exchange is trivially marginal vs per-device compute
        assert per_dev_msgs <= 0.01 * part.n_local, stats

    # per-device exchange volume must not grow linearly with D
    assert stats[8]["per_dev_msgs"] <= max(4 * stats[2]["per_dev_msgs"], 64), \
        stats
