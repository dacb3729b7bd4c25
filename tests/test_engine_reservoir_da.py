"""Engine-level reservoir DA parity: network with USGS-hybrid, RFC, and
Great-Lake typed reservoirs vs the scalar reference simulator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from troute_tpu.network.topology import from_connections
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.ops.reservoir_da import (
    GreatLakesDAState, HybridDAState, RfcDAState)
from troute_tpu.routing.engine import (
    ChannelParams, ReservoirDAData, RoutingConfig,
    network_arrays_from_topology, route)

from reference_network import simulate_reference

#   1 -> 2 -> 901(usgs hybrid) -> 3 -> 4
#   5 -> 6 -> 902(rfc) -> 7 -> 4
#   8 -> 903(great lake) -> 9 -> 4 -> 10
CONN = {
    1: [2], 2: [901], 901: [3], 3: [4],
    5: [6], 6: [902], 902: [7], 7: [4],
    8: [903], 903: [9], 9: [4],
    4: [10], 10: [],
}
LAKES = {
    901: dict(wbody_type=2, area=2.0, max_depth=12.0, orifice_area=1.2,
              orifice_coeff=0.1, orifice_elev=8.0, weir_coeff=0.4,
              weir_elev=11.0, weir_length=12.0, dam_length=10.0, elev0=10.5),
    902: dict(wbody_type=4, area=3.0, max_depth=20.0, orifice_area=1.5,
              orifice_coeff=0.12, orifice_elev=14.0, weir_coeff=0.4,
              weir_elev=18.5, weir_length=15.0, dam_length=10.0, elev0=17.0),
    903: dict(wbody_type=6, area=500.0, max_depth=50.0, orifice_area=1.0,
              orifice_coeff=0.1, orifice_elev=10.0, weir_coeff=0.4,
              weir_elev=45.0, weir_length=100.0, dam_length=10.0,
              elev0=40.0),
}


def test_engine_reservoir_da_vs_reference():
    nts, dt = 48, 300.0
    rng = np.random.default_rng(21)
    ids = sorted(CONN.keys())

    chan = {i: dict(dx=float(rng.uniform(800, 2500)),
                    bw=float(rng.uniform(3, 15)),
                    tw=float(rng.uniform(20, 50)),
                    twcc=float(rng.uniform(70, 160)), n=0.05, ncc=0.1,
                    cs=float(rng.uniform(0.4, 1.2)),
                    s0=float(rng.uniform(0.002, 0.015))) for i in ids}
    q0 = {i: float(rng.uniform(1, 4)) for i in ids}
    depth0 = {i: float(rng.uniform(0.1, 0.6)) for i in ids}
    for lk, p in LAKES.items():
        q0[lk] = 2.0
        depth0[lk] = p["elev0"]
    qlat = {i: rng.uniform(0.2, 2.0, nts // 4) for i in ids}

    # hybrid obs: 15-min series with gaps
    n_hobs = 30
    hobs_time = np.arange(n_hobs) * 900.0
    hobs = rng.uniform(3, 12, n_hobs)
    hobs[8:14] = np.nan
    LAKES[901]["obs"] = hobs
    LAKES[901]["obs_time"] = hobs_time

    # rfc series
    n_counts = 40
    series = rng.uniform(5, 25, n_counts)
    series[12] = -3.0
    LAKES[902].update(series=series, total_counts=n_counts, use_rfc=True,
                      da_step=3600.0, persist_seconds=11 * 86400.0,
                      ts_idx0=2)

    # great-lake obs + climatology
    n_gobs = 20
    gobs_time = np.arange(n_gobs) * 3600.0
    gobs = rng.uniform(800, 1200, n_gobs)
    gobs[3:6] = np.nan
    clim = rng.uniform(500, 900, 12)
    LAKES[903].update(obs=gobs, obs_time=gobs_time, month_idx=7,
                      climatology=clim)

    fvd_ref, _ = simulate_reference(
        CONN, chan, q0, depth0, qlat, nts, dt, qts_subdivisions=4,
        assume_short_ts=True, reservoirs=LAKES, gages=None)

    # ---- engine ----
    dtype = jnp.float64
    topo = from_connections(CONN, reservoir_ids=list(LAKES))
    net = network_arrays_from_topology(topo, need_levels=False)
    perm = topo.ids
    idx = topo.index_of

    def col(name):
        return jnp.asarray([chan[int(i)][name] if int(i) not in LAKES
                            else 1.0 for i in perm], dtype)

    cp = ChannelParams(dx=col("dx"), bw=col("bw"), tw=col("tw"),
                       twcc=col("twcc"), n=col("n"), ncc=col("ncc"),
                       cs=col("cs"), s0=col("s0"))

    res_rows = topo.reservoir_rows
    n_res = res_rows.size
    lake_of_slot = [int(topo.ids[r]) for r in res_rows]
    parm = np.zeros((n_res, 9))
    for s, lk in enumerate(lake_of_slot):
        p = LAKES[lk]
        parm[s] = [p["area"], p["max_depth"], p["orifice_area"],
                   p["orifice_coeff"], p["orifice_elev"], p["weir_coeff"],
                   p["weir_elev"], p["weir_length"], 0.9]
    lp = LevelpoolParams.from_array(jnp.asarray(parm, dtype))

    wtypes = jnp.asarray([LAKES[lk]["wbody_type"] for lk in lake_of_slot],
                         jnp.int32)
    h_obs = np.full((n_res, n_hobs), np.nan)
    for s, lk in enumerate(lake_of_slot):
        if LAKES[lk]["wbody_type"] in (2, 3):
            h_obs[s] = LAKES[lk]["obs"]
    rfc_series = np.zeros((n_res, n_counts))
    rfc_counts = np.zeros(n_res, np.int32)
    rfc_use = np.zeros(n_res, bool)
    rfc_ts0 = np.zeros(n_res, np.int32)
    for s, lk in enumerate(lake_of_slot):
        if LAKES[lk]["wbody_type"] in (4, 5):
            rfc_series[s] = LAKES[lk]["series"]
            rfc_counts[s] = LAKES[lk]["total_counts"]
            rfc_use[s] = LAKES[lk]["use_rfc"]
            rfc_ts0[s] = LAKES[lk]["ts_idx0"]
    g_obs = np.full((n_res, n_gobs), np.nan)
    g_time = np.zeros((n_res, n_gobs))
    g_clim = np.zeros((n_res, 12))
    for s, lk in enumerate(lake_of_slot):
        if LAKES[lk]["wbody_type"] == 6:
            g_obs[s] = LAKES[lk]["obs"]
            g_time[s] = LAKES[lk]["obs_time"]
            g_clim[s] = LAKES[lk]["climatology"]

    res_da = ReservoirDAData(
        wbody_type=wtypes,
        hybrid_obs=jnp.asarray(h_obs, dtype),
        hybrid_obs_time=jnp.asarray(hobs_time, dtype),
        hybrid_state0=HybridDAState(
            persisted_outflow=jnp.full(n_res, jnp.nan, dtype),
            update_time=jnp.zeros(n_res, dtype),
            persistence_index=jnp.zeros(n_res, dtype),
            persistence_update_time=jnp.zeros(n_res, dtype)),
        rfc_series=jnp.asarray(rfc_series, dtype),
        rfc_counts=jnp.asarray(rfc_counts),
        rfc_use=jnp.asarray(rfc_use),
        rfc_timestep=jnp.full(n_res, 3600.0, dtype),
        rfc_persist_seconds=jnp.full(n_res, 11 * 86400.0, dtype),
        rfc_state0=RfcDAState(timeseries_idx=jnp.asarray(rfc_ts0),
                              update_time=jnp.zeros(n_res, dtype)),
        gl_obs=jnp.asarray(g_obs, dtype),
        gl_obs_time=jnp.asarray(g_time, dtype),
        gl_climatology=jnp.asarray(g_clim, dtype),
        gl_state0=GreatLakesDAState(
            assimilated_outflow=jnp.full(n_res, jnp.nan, dtype),
            assimilated_time=jnp.zeros(n_res, dtype),
            update_time=jnp.zeros(n_res, dtype)),
        month_idx=jnp.full(nts + 1, 7, jnp.int32))

    q0_arr = jnp.asarray([q0[int(i)] for i in perm], dtype)
    d0_arr = jnp.asarray([depth0[int(i)] for i in perm], dtype)
    elev0 = jnp.asarray([LAKES[lk]["elev0"] for lk in lake_of_slot], dtype)
    n_cols = nts // 4
    qlat_arr = jnp.asarray(
        np.stack([[qlat[int(i)][c] for i in perm] for c in range(n_cols)]),
        dtype)

    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=True)
    out = route(net, cp, lp, cfg, q0_arr, d0_arr, elev0, qlat_arr, None,
                res_da)
    fvd = np.asarray(out["flowveldepth"])

    for node in CONN:
        got = fvd[:, idx[node], :]
        want = fvd_ref[node][1:, :]
        np.testing.assert_allclose(
            got, want, rtol=1e-8, atol=1e-10, err_msg=f"node {node}")


def test_engine_reservoir_da_strict_mode():
    """Typed reservoir DA also dispatches inside the strict (within-
    timestep) level scan — downstream nodes read assimilated outflows in
    the same step, matching the scalar reference simulator."""
    nts, dt = 48, 300.0
    rng = np.random.default_rng(77)
    ids = sorted(CONN.keys())

    chan = {i: dict(dx=float(rng.uniform(800, 2500)),
                    bw=float(rng.uniform(3, 15)),
                    tw=float(rng.uniform(20, 50)),
                    twcc=float(rng.uniform(70, 160)), n=0.05, ncc=0.1,
                    cs=float(rng.uniform(0.4, 1.2)),
                    s0=float(rng.uniform(0.002, 0.015))) for i in ids}
    q0 = {i: float(rng.uniform(1, 4)) for i in ids}
    depth0 = {i: float(rng.uniform(0.1, 0.6)) for i in ids}
    for lk, p in LAKES.items():
        q0[lk] = 2.0
        depth0[lk] = p["elev0"]
    qlat = {i: rng.uniform(0.2, 2.0, nts // 4) for i in ids}

    n_hobs = 30
    hobs_time = np.arange(n_hobs) * 900.0
    hobs = rng.uniform(3, 12, n_hobs)
    hobs[8:14] = np.nan
    LAKES[901]["obs"] = hobs
    LAKES[901]["obs_time"] = hobs_time
    n_counts = 40
    series = rng.uniform(5, 25, n_counts)
    LAKES[902].update(series=series, total_counts=n_counts, use_rfc=True,
                      da_step=3600.0, persist_seconds=11 * 86400.0,
                      ts_idx0=2)
    n_gobs = 20
    gobs_time = np.arange(n_gobs) * 3600.0
    gobs = rng.uniform(800, 1200, n_gobs)
    clim = rng.uniform(500, 900, 12)
    LAKES[903].update(obs=gobs, obs_time=gobs_time, month_idx=7,
                      climatology=clim)

    fvd_ref, _ = simulate_reference(
        CONN, chan, q0, depth0, qlat, nts, dt, qts_subdivisions=4,
        assume_short_ts=False, reservoirs=LAKES, gages=None)

    dtype = jnp.float64
    topo = from_connections(CONN, reservoir_ids=list(LAKES))
    net = network_arrays_from_topology(topo, need_levels=True)
    perm = topo.ids
    idx = topo.index_of

    def col(name):
        return jnp.asarray([chan[int(i)][name] if int(i) not in LAKES
                            else 1.0 for i in perm], dtype)

    cp = ChannelParams(dx=col("dx"), bw=col("bw"), tw=col("tw"),
                       twcc=col("twcc"), n=col("n"), ncc=col("ncc"),
                       cs=col("cs"), s0=col("s0"))
    lake_of_slot = [int(topo.ids[r]) for r in topo.reservoir_rows]
    n_res = len(lake_of_slot)
    parm = np.zeros((n_res, 9))
    for s, lk in enumerate(lake_of_slot):
        p = LAKES[lk]
        parm[s] = [p["area"], p["max_depth"], p["orifice_area"],
                   p["orifice_coeff"], p["orifice_elev"], p["weir_coeff"],
                   p["weir_elev"], p["weir_length"], p["dam_length"]]
    lp = LevelpoolParams(*[jnp.asarray(parm[:, i], dtype)
                           for i in range(9)])

    wtypes = np.asarray([LAKES[lk]["wbody_type"] for lk in lake_of_slot],
                        np.int32)
    h_obs = np.full((n_res, n_hobs), np.nan)
    rfc_series = np.zeros((n_res, n_counts))
    rfc_counts = np.zeros(n_res, np.int32)
    rfc_use = np.zeros(n_res, bool)
    rfc_ts0 = np.zeros(n_res, np.int32)
    g_obs = np.full((n_res, n_gobs), np.nan)
    g_time = np.zeros((n_res, n_gobs))
    g_clim = np.zeros((n_res, 12))
    for s, lk in enumerate(lake_of_slot):
        t = LAKES[lk]["wbody_type"]
        if t in (2, 3):
            h_obs[s] = LAKES[lk]["obs"]
        elif t in (4, 5):
            rfc_series[s, :] = LAKES[lk]["series"]
            rfc_counts[s] = LAKES[lk]["total_counts"]
            rfc_use[s] = LAKES[lk]["use_rfc"]
            rfc_ts0[s] = LAKES[lk]["ts_idx0"]
        elif t == 6:
            g_obs[s] = LAKES[lk]["obs"]
            g_time[s] = LAKES[lk]["obs_time"]
            g_clim[s] = LAKES[lk]["climatology"]

    res_da = ReservoirDAData(
        wbody_type=jnp.asarray(wtypes),
        hybrid_obs=jnp.asarray(h_obs, dtype),
        hybrid_obs_time=jnp.asarray(hobs_time, dtype),
        hybrid_state0=HybridDAState(
            persisted_outflow=jnp.full(n_res, jnp.nan, dtype),
            update_time=jnp.zeros(n_res, dtype),
            persistence_index=jnp.zeros(n_res, dtype),
            persistence_update_time=jnp.zeros(n_res, dtype)),
        rfc_series=jnp.asarray(rfc_series, dtype),
        rfc_counts=jnp.asarray(rfc_counts),
        rfc_use=jnp.asarray(rfc_use),
        rfc_timestep=jnp.full(n_res, 3600.0, dtype),
        rfc_persist_seconds=jnp.full(n_res, 11 * 86400.0, dtype),
        rfc_state0=RfcDAState(timeseries_idx=jnp.asarray(rfc_ts0),
                              update_time=jnp.zeros(n_res, dtype)),
        gl_obs=jnp.asarray(g_obs, dtype),
        gl_obs_time=jnp.asarray(g_time, dtype),
        gl_climatology=jnp.asarray(g_clim, dtype),
        gl_state0=GreatLakesDAState(
            assimilated_outflow=jnp.full(n_res, jnp.nan, dtype),
            assimilated_time=jnp.zeros(n_res, dtype),
            update_time=jnp.zeros(n_res, dtype)),
        month_idx=jnp.full(nts + 1, 7, jnp.int32))

    q0_arr = jnp.asarray([q0[int(i)] for i in perm], dtype)
    d0_arr = jnp.asarray([depth0[int(i)] for i in perm], dtype)
    elev0 = jnp.asarray([LAKES[lk]["elev0"] for lk in lake_of_slot], dtype)
    n_cols = nts // 4
    qlat_arr = jnp.asarray(
        np.stack([[qlat[int(i)][c] for i in perm] for c in range(n_cols)]),
        dtype)

    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=4,
                        assume_short_ts=False)
    out = route(net, cp, lp, cfg, q0_arr, d0_arr, elev0, qlat_arr, None,
                res_da)
    fvd = np.asarray(out["flowveldepth"])

    for node in CONN:
        got = fvd[:, idx[node], :]
        want = fvd_ref[node][1:, :]
        np.testing.assert_allclose(
            got, want, rtol=1e-7, atol=1e-9, err_msg=f"node {node}")
