"""Full-domain oracle parity: the production engine vs the scalar
reference simulator on the real LowerColorado AnA domain.

This runs the ENTIRE 10.9k-node NHD network for the full 288-step AnA
window with streamflow nudging + typed reservoir DA (USGS/USACE hybrid
persistence + RFC forecast) through both the vectorized JAX engine and
``tests/reference_network.simulate_reference`` (the executable spec of
``mc_reach.pyx:164-845``), and asserts f64 agreement at ~1e-9 — so the
production path is oracle-verified end to end, not only on the 12-node
fixture (tests/test_engine.py) or via the ~10%-median NWM CHRTOUT
comparison (tests/test_parity.py, state-dominated)."""

import glob
from pathlib import Path

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

import pandas as pd

from troute_tpu.cli import assemble_gage_da, assemble_reservoir_da
from troute_tpu.config import load_config
from troute_tpu.io.forcing import read_qlat_chrtout
from troute_tpu.network.builder import build_network
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.routing.engine import (
    ChannelParams, RoutingConfig, network_arrays_from_topology, route)

from reference_network import simulate_reference

REF = Path("/root/reference/test/LowerColorado_TX")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference domain not available")

N_FILES = 24          # 24 hourly CHRTOUT files -> 288 x 300 s steps
DT = 300.0
QTS = 12


def _assemble(tmp_path):
    """Load the AnA config and assemble exactly what main_v04 would."""
    cfg = yaml.safe_load(open(REF / "test_AnA_V4_NHD.yaml"))
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["nts"] = N_FILES * QTS
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(REF / "domain/RouteLink.nc")
    sp["mask_file_path"] = str(REF / "domain/coastal_subset.txt")
    cfg["network_topology_parameters"]["waterbody_parameters"]["level_pool"][
        "level_pool_waterbody_parameter_file_path"] = \
        str(REF / "domain/LAKEPARM.nc")
    cfg["compute_parameters"]["restart_parameters"] = {
        "start_datetime": "2021-08-23_13:00"}
    dap = cfg["compute_parameters"]["data_assimilation_parameters"]
    dap["usgs_timeslices_folder"] = str(REF / "usgs_TimeSlice")
    dap["usace_timeslices_folder"] = str(REF / "usace_TimeSlice")
    dap["reservoir_da"]["reservoir_parameter_file"] = \
        str(REF / "domain/reservoir_index_AnA.nc")
    dap["reservoir_da"]["reservoir_rfc_da"] = {
        "reservoir_rfc_forecasts": True,
        "reservoir_rfc_forecasts_time_series_path": str(REF / "rfc_TimeSeries"),
        "reservoir_rfc_forecasts_lookback_hours": 48,
        "reservoir_rfc_forecasts_offset_hours": 28,
        "reservoir_rfc_forecast_persist_days": 11,
    }
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    cfgo = load_config(p)
    base = p.parent
    built = build_network(cfgo, base)
    nts = N_FILES * QTS
    t0 = pd.to_datetime("2021-08-23 13:00")
    dtype = jnp.float64
    da = assemble_gage_da(cfgo, built, base, t0, nts, DT, dtype)
    res_da = assemble_reservoir_da(cfgo, built, base, t0, nts, DT, dtype)
    files = sorted(glob.glob(str(REF / "channel_forcing/*.CHRTOUT_DOMAIN1")))
    ql = read_qlat_chrtout(files[:N_FILES], built.topo.ids)
    return built, da, res_da, ql, nts


def _oracle_inputs(built, da, res_da, ql):
    """Convert the assembled engine arrays into the scalar simulator's
    dict-of-node-ids form (same values, so parity isolates the math)."""
    topo = built.topo
    ids = topo.ids
    conn = {int(ids[k]): ([int(ids[d])] if (d := int(topo.downstream[k])) >= 0
                          else []) for k in range(topo.n_nodes)}
    keys = dict(dx="dx", bw="bw", tw="tw", twcc="twcc",
                n="n", ncc="ncc", cs="cs", s0="s0")
    chan = {int(ids[k]): {ck: float(built.chan[sk][k])
                          for ck, sk in keys.items()}
            for k in range(topo.n_nodes)}
    q0 = {int(ids[k]): float(built.q0[k]) for k in range(topo.n_nodes)}
    depth0 = {int(ids[k]): float(built.depth0[k])
              for k in range(topo.n_nodes)}
    qlat = {int(ids[k]): np.asarray(ql[:, k], np.float64)
            for k in range(topo.n_nodes)}

    reservoirs = {}
    wtypes = np.asarray(res_da.wbody_type) if res_da is not None else None
    for s, row in enumerate(topo.reservoir_rows):
        lk = int(ids[row])
        p = built.res_params[s]
        d = dict(area=float(p[0]), max_depth=float(p[1]),
                 orifice_area=float(p[2]), orifice_coeff=float(p[3]),
                 orifice_elev=float(p[4]), weir_coeff=float(p[5]),
                 weir_elev=float(p[6]), weir_length=float(p[7]),
                 dam_length=10.0, elev0=float(built.res_elev0[s]))
        if wtypes is not None:
            wt = int(wtypes[s])
            d["wbody_type"] = wt
            if wt in (2, 3):
                d["obs"] = np.asarray(res_da.hybrid_obs, np.float64)[s]
                d["obs_time"] = np.asarray(res_da.hybrid_obs_time, np.float64)
            elif wt in (4, 5):
                d["use_rfc"] = bool(np.asarray(res_da.rfc_use)[s])
                d["series"] = np.asarray(res_da.rfc_series, np.float64)[s]
                d["total_counts"] = int(np.asarray(res_da.rfc_counts)[s])
                d["da_step"] = float(np.asarray(res_da.rfc_timestep)[s])
                d["persist_seconds"] = float(
                    np.asarray(res_da.rfc_persist_seconds)[s])
                d["ts_idx0"] = int(
                    np.asarray(res_da.rfc_state0.timeseries_idx)[s])
                d["update_time0"] = float(
                    np.asarray(res_da.rfc_state0.update_time)[s])
        reservoirs[lk] = d

    gages = None
    if da is not None:
        gages = dict(
            rows=[int(ids[r]) for r in np.asarray(da.rows)],
            obs=np.asarray(da.obs, np.float64),
            lastobs_val=list(np.asarray(da.lastobs_val, np.float64)),
            lastobs_time=list(np.asarray(da.lastobs_time, np.float64)),
            decay_coeff=float(da.decay_coeff))
    return conn, chan, q0, depth0, qlat, reservoirs, gages


def test_lowercolorado_ana_engine_matches_oracle(tmp_path):
    built, da, res_da, ql, nts = _assemble(tmp_path)
    topo = built.topo
    dtype = jnp.float64

    # --- engine (production assembly, f64, xla kernel) ---
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, dtype)
                          for k, v in built.chan.items()})
    lp = LevelpoolParams.from_array(jnp.asarray(built.res_params, dtype))
    rcfg = RoutingConfig(dt=DT, nts=nts, qts_subdivisions=QTS,
                         assume_short_ts=True)
    out = route(net, cp, lp, rcfg,
                jnp.asarray(built.q0, dtype), jnp.asarray(built.depth0, dtype),
                jnp.asarray(built.res_elev0, dtype), jnp.asarray(ql, dtype),
                da, res_da)
    fvd = np.asarray(out["flowveldepth"])          # [nts, N, 3]
    assert fvd.shape == (nts, topo.n_nodes, 3)

    # sanity: typed DA is genuinely active in this run (the coastal subset
    # carries no type-2/3 lakes — hybrid persistence is oracle-verified on
    # the synthetic fixture in tests/test_engine_reservoir_da.py)
    wtypes = np.asarray(res_da.wbody_type)
    assert (wtypes == 4).any() and np.asarray(res_da.rfc_use).any(), \
        "expected active RFC-forecast reservoirs"
    assert da is not None and np.isfinite(np.asarray(da.obs)).any()

    # --- scalar oracle on identical inputs ---
    conn, chan, q0, depth0, qlat, reservoirs, gages = _oracle_inputs(
        built, da, res_da, ql)
    fvd_ref, nudge_ref = simulate_reference(
        conn, chan, q0, depth0, qlat, nts, DT, qts_subdivisions=QTS,
        assume_short_ts=True, reservoirs=reservoirs, gages=gages)

    want = np.empty_like(fvd)
    for k in range(topo.n_nodes):
        want[:, k, :] = fvd_ref[int(topo.ids[k])][1:]
    np.testing.assert_allclose(fvd, want, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out["nudge"]), nudge_ref[1:],
                               rtol=1e-9, atol=1e-9)
