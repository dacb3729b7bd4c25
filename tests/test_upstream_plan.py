"""Banded upstream-sum plan: exactness vs the gather form, postorder row
layout, and engine integration (see ``routing/upstream_plan.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from troute_tpu.network.topology import build_topology
from troute_tpu.routing.upstream_plan import (
    banded_upstream_sum, build_upstream_plan, device_op, postorder)


def random_forest(n, rng, span=6):
    """Random drainage forest in a scrambled row order (so displacements
    are arbitrary, including negative)."""
    ids = np.arange(1, n + 1, dtype=np.int64)
    down = np.zeros(n, np.int64)
    # forward hops in id space, a few tailwaters
    for i in range(n):
        if i + 1 >= n or rng.random() < 0.05:
            down[i] = 0
        else:
            down[i] = ids[min(i + int(rng.integers(1, span + 1)), n - 1)]
    perm = rng.permutation(n)
    return ids[perm], down[perm]


def gather_sum(q, upstream):
    safe = np.maximum(upstream, 0)
    return np.where(upstream >= 0, q[safe], 0.0).sum(axis=1)


def test_plan_matches_gather_exactly():
    rng = np.random.default_rng(7)
    ids, down = random_forest(3000, rng)
    topo = build_topology(ids, down)
    n_pad = -(-topo.n_nodes // 1024) * 1024
    plan = build_upstream_plan(np.asarray(topo.upstream), n_pad,
                               max_shifts=8, max_remainder_frac=1.0)
    assert plan is not None
    assert plan.rem_dst.size > 0, "test should exercise the remainder path"
    q = np.zeros(n_pad)
    q[:topo.n_nodes] = rng.uniform(0.1, 100.0, topo.n_nodes)
    got = np.asarray(banded_upstream_sum(
        jnp.asarray(q), jnp.asarray(plan.masks), plan.shifts,
        jnp.asarray(plan.rem_dst), jnp.asarray(plan.rem_src)))
    want = gather_sum(q[:topo.n_nodes], np.asarray(topo.upstream))
    np.testing.assert_allclose(got[:topo.n_nodes], want, rtol=0, atol=1e-9)
    assert not got[topo.n_nodes:].any()

    # sorted upstream list is a per-node permutation of the original
    up0 = np.sort(np.asarray(topo.upstream), axis=1)
    up1 = np.sort(np.asarray(plan.upstream_sorted), axis=1)
    np.testing.assert_array_equal(up0, up1)


def test_postorder_layout_is_band_friendly():
    rng = np.random.default_rng(3)
    ids, down = random_forest(5000, rng)
    topo = build_topology(ids, down, row_order="postorder")
    topo.validate()
    up = np.asarray(topo.upstream)
    # postorder: every non-junction edge and every junction's last child
    # sit at displacement 1 -> d=1 dominates
    dst, src = [], []
    for k in range(up.shape[1]):
        col = up[:, k]
        m = col >= 0
        dst.append(np.flatnonzero(m))
        src.append(col[m])
    disp = np.concatenate(dst) - np.concatenate(src)
    assert (disp > 0).all(), "postorder edges must point backward"
    frac_d1 = (disp == 1).sum() / disp.size
    assert frac_d1 > 0.5
    n_pad = -(-topo.n_nodes // 1024) * 1024
    plan = build_upstream_plan(up, n_pad)
    assert plan is not None and plan.coverage > 0.9


def test_postorder_preserves_network():
    rng = np.random.default_rng(11)
    ids, down = random_forest(800, rng)
    t0 = build_topology(ids, down)
    t1 = build_topology(ids, down, row_order="postorder")
    # same id -> same downstream id
    for t in (t0, t1):
        pass
    ds0 = {int(t0.ids[i]): (int(t0.ids[d]) if (d := t0.downstream[i]) >= 0
                            else 0) for i in range(t0.n_nodes)}
    ds1 = {int(t1.ids[i]): (int(t1.ids[d]) if (d := t1.downstream[i]) >= 0
                            else 0) for i in range(t1.n_nodes)}
    assert ds0 == ds1


def test_scattered_order_returns_none():
    rng = np.random.default_rng(5)
    ids, down = random_forest(4000, rng, span=200)
    topo = build_topology(ids, down)
    plan = build_upstream_plan(np.asarray(topo.upstream),
                               -(-topo.n_nodes // 1024) * 1024,
                               max_shifts=4, max_remainder_frac=0.05)
    assert plan is None


def test_engine_uses_plan_and_matches_gather():
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route,
        route_stepped)

    rng = np.random.default_rng(9)
    ids, down = random_forest(2500, rng)
    topo = build_topology(ids, down, row_order="postorder")
    n = topo.n_nodes
    net_p = network_arrays_from_topology(topo, need_levels=False)
    assert net_p.uplan is not None
    net_g = network_arrays_from_topology(topo, need_levels=False,
                                         upstream_plan=False)
    chan = ChannelParams.from_arrays(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), jnp.float32)
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), jnp.float32)
    z1 = jnp.zeros(1, jnp.float32)
    cfg = RoutingConfig(dt=300.0, nts=6, qts_subdivisions=3,
                        assume_short_ts=True)

    out_p = route(net_p, chan, lp, cfg, q0, d0, z1, qlat)
    out_g = route(net_g, chan, lp, cfg, q0, d0, z1, qlat)
    # not bit-identical: XLA's [N, K] axis-reduce associates in its own
    # order while the banded form accumulates in shift order — single-ulp
    # f32 differences on junction lanes
    np.testing.assert_allclose(np.asarray(out_p["flowveldepth"]),
                               np.asarray(out_g["flowveldepth"]),
                               rtol=1e-4, atol=1e-5)

    out_s = route_stepped(net_p, chan, lp,
                          cfg._replace(kernel="pallas"), q0, d0, z1, qlat)
    np.testing.assert_allclose(np.asarray(out_s["flowveldepth"]),
                               np.asarray(out_g["flowveldepth"]),
                               rtol=2e-5, atol=2e-5)


def test_strict_iterative_with_plan():
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route)

    rng = np.random.default_rng(13)
    ids, down = random_forest(1200, rng)
    topo = build_topology(ids, down, row_order="postorder")
    n = topo.n_nodes
    net_p = network_arrays_from_topology(topo, need_levels=True)
    chan = ChannelParams.from_arrays(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), jnp.float32)
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), jnp.float32)
    z1 = jnp.zeros(1, jnp.float32)
    strict = RoutingConfig(dt=300.0, nts=4, qts_subdivisions=2,
                           assume_short_ts=False)
    out_scan = route(net_p, chan, lp, strict, q0, d0, z1, qlat)
    out_iter = route(net_p, chan, lp,
                     strict._replace(strict_iterative=True),
                     q0, d0, z1, qlat)
    np.testing.assert_allclose(np.asarray(out_iter["flowveldepth"]),
                               np.asarray(out_scan["flowveldepth"]),
                               rtol=1e-4, atol=1e-4)
