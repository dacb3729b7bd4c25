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
