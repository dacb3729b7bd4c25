"""BMI adapter tests: standalone stepping and two-instance domain-split
coupling (reference ``test/BMI/bmi_upper_example.yaml`` +
``bmi_lower_example.yaml`` pattern)."""

import numpy as np
import pytest

from troute_tpu.bmi import BmiTrouteTpu


def _push_network(bmi, ids, toids, n):
    bmi.set_value("segment_id", np.asarray(ids, np.int64))
    bmi.set_value("segment_toid", np.asarray(toids, np.int64))
    one = np.ones(n)
    bmi.set_value("dx", 1500.0 * one)
    bmi.set_value("bw", 8.0 * one)
    bmi.set_value("tw", 24.0 * one)
    bmi.set_value("twcc", 72.0 * one)
    bmi.set_value("n", 0.05 * one)
    bmi.set_value("ncc", 0.1 * one)
    bmi.set_value("cs", 0.8 * one)
    bmi.set_value("s0", 0.004 * one)


def test_bmi_metadata_and_step():
    bmi = BmiTrouteTpu()
    bmi.initialize()
    assert bmi.get_component_name().startswith("troute_tpu")
    assert "segment_id" in bmi.get_input_var_names()
    assert "channel_exit_water_x-section__volume_flow_rate" in \
        bmi.get_output_var_names()

    ids = [1, 2, 3, 4]
    _push_network(bmi, ids, [2, 3, 4, 0], 4)
    bmi.set_value("land_surface_water_source__volume_flow_rate",
                  np.full(4, 1.5))
    bmi.update()
    q = bmi.get_value("channel_exit_water_x-section__volume_flow_rate")
    assert q.shape == (4,)
    assert np.isfinite(q).all() and q.max() > 0
    assert bmi.get_current_time() == bmi.get_time_step()

    for _ in range(40):
        bmi.update()
    q = bmi.get_value("channel_exit_water_x-section__volume_flow_rate")
    # steady state: outlet approaches the 4 * 1.5 lateral total
    assert q[-1] == pytest.approx(6.0, rel=0.05)


def test_bmi_domain_split():
    """Upper instance's outlet flows feed the lower instance via
    upstream_fvd — results match a single whole-domain instance."""
    dt = 300.0
    n_steps = 30

    # whole domain: chain 1..6
    whole = BmiTrouteTpu()
    whole.initialize()
    _push_network(whole, [1, 2, 3, 4, 5, 6], [2, 3, 4, 5, 6, 0], 6)
    whole.set_value("land_surface_water_source__volume_flow_rate",
                    np.full(6, 1.0))

    upper = BmiTrouteTpu()
    upper.initialize()
    _push_network(upper, [1, 2, 3], [2, 3, 999, ], 3)
    upper.set_value("land_surface_water_source__volume_flow_rate",
                    np.full(3, 1.0))

    lower = BmiTrouteTpu()
    lower.initialize()
    # boundary node 3 is included in the lower domain as a passthrough
    # carrying the upper instance's outlet flow
    _push_network(lower, [3, 4, 5, 6], [4, 5, 6, 0], 4)
    lower.set_value("land_surface_water_source__volume_flow_rate",
                    np.asarray([0.0, 1.0, 1.0, 1.0]))

    for k in range(n_steps):
        t = (k + 1) * dt
        whole.update_until(t)
        upper.update_until(t)
        q_up = upper.get_value(
            "channel_exit_water_x-section__volume_flow_rate")
        lower.set_value("upstream_id", np.asarray([3], np.int64))
        lower.set_value("upstream_fvd", np.asarray([[q_up[-1], 0.0, 0.0]]))
        lower.update_until(t)

    q_whole = whole.get_value(
        "channel_exit_water_x-section__volume_flow_rate")
    q_split = lower.get_value(
        "channel_exit_water_x-section__volume_flow_rate")
    # outlet flows agree closely (boundary hand-off lags one step, so
    # allow a small tolerance rather than exact equality)
    assert q_split[-1] == pytest.approx(q_whole[-1], rel=0.05)


def test_bmi_strict_mode(tmp_path):
    """A config with ``assume_short_ts: False`` routes through the strict
    fixed-point engine (the reference BMI honors the config's coupling,
    ``troute_model.py:138-347``): within one timestep, downstream
    segments see current-step upstream flows, so a chain outlet responds
    immediately — in short-ts mode the response lags one step per hop."""
    import yaml

    cfgp = tmp_path / "bmi_strict.yaml"
    yaml.safe_dump({"compute_parameters": {
        "assume_short_ts": False,
        "forcing_parameters": {"dt": 300.0, "nts": 8},
    }}, open(cfgp, "w"))

    outs = {}
    for name, path in (("strict", str(cfgp)), ("short", "")):
        bmi = BmiTrouteTpu()
        bmi.initialize(path)
        _push_network(bmi, [1, 2, 3, 4], [2, 3, 4, 0], 4)
        bmi.set_value("land_surface_water_source__volume_flow_rate",
                      np.full(4, 2.0))
        bmi.update()
        outs[name] = bmi.get_value(
            "channel_exit_water_x-section__volume_flow_rate")
    assert np.isfinite(outs["strict"]).all()
    # the couplings genuinely differ...
    assert not np.allclose(outs["strict"], outs["short"])
    # ...and the strict BMI result equals the strict engine on the same
    # network (fixed-point form, one 300 s step, cold start)
    import jax.numpy as jnp
    from troute_tpu.network.topology import from_connections
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route)
    topo = from_connections({1: [2], 2: [3], 3: [4], 4: []})
    net = network_arrays_from_topology(topo, need_levels=True)
    one = jnp.ones(4, jnp.float32)
    cp = ChannelParams(dx=1500.0 * one, bw=8.0 * one, tw=24.0 * one,
                       twcc=72.0 * one, n=0.05 * one, ncc=0.1 * one,
                       cs=0.8 * one, s0=0.004 * one)
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    cfg = RoutingConfig(dt=300.0, nts=1, qts_subdivisions=1,
                        assume_short_ts=False)
    out = route(net, cp, lp, cfg, 0.0 * one, 0.0 * one,
                jnp.zeros((1,), jnp.float32),
                jnp.full((1, 4), 2.0, jnp.float32), None)
    order = np.argsort(np.asarray(topo.ids))
    q_ref = np.asarray(out["flowveldepth"])[0, order, 0]
    np.testing.assert_allclose(outs["strict"], q_ref, rtol=1e-5, atol=1e-7)


def test_bmi_reservoir_levelpool_golden():
    """Standalone reservoir BMI reproduces the levelpool golden run
    (reference test_compute_kernel.py::test_lp_run fixture)."""
    from troute_tpu.bmi.bmi_reservoirs import BmiReservoir
    from test_levelpool import (EXPECTED_FINAL_ELEVATION,
                                EXPECTED_FINAL_OUTFLOW, INFLOWS, LP,
                                ROUTING_PERIOD)

    bmi = BmiReservoir()
    bmi.initialize()
    bmi.set_value("LkArea", [LP["lake_area"]])
    bmi.set_value("LkMxE", [LP["max_depth"]])
    bmi.set_value("OrificeA", [LP["orifice_area"]])
    bmi.set_value("OrificeC", [LP["orifice_coefficient"]])
    bmi.set_value("OrificeE", [LP["orifice_elevation"]])
    bmi.set_value("WeirC", [LP["weir_coefficient"]])
    bmi.set_value("WeirE", [LP["weir_elevation"]])
    bmi.set_value("WeirL", [LP["weir_length"]])
    bmi.set_value("dam_length", [LP["dam_length"]])
    bmi.set_value("lake_surface__elevation", [LP["water_elevation"]])
    bmi.set_value("res_type", [1])
    bmi.set_value("time_step", [ROUTING_PERIOD])

    for q in INFLOWS:
        bmi.set_value("lake_water~incoming__volume_flow_rate", [float(q)])
        bmi.update()
    out = bmi.get_value("lake_water~outgoing__volume_flow_rate")[0]
    elev = bmi.get_value("lake_surface__elevation")[0]
    assert out == pytest.approx(EXPECTED_FINAL_OUTFLOW, rel=1e-4)
    assert elev == pytest.approx(EXPECTED_FINAL_ELEVATION, rel=1e-5)


def test_bmi_reservoir_rfc():
    """RFC-type reservoir in the standalone BMI follows the forecast."""
    from troute_tpu.bmi.bmi_reservoirs import BmiReservoir

    series = np.linspace(10.0, 20.0, 30)
    bmi = BmiReservoir()
    bmi.initialize()
    for k, v in dict(LkArea=15.0, LkMxE=9.96, OrificeA=1.0, OrificeC=0.1,
                     OrificeE=7.733, WeirC=0.4, WeirE=9.626, WeirL=10.0,
                     dam_length=10.0, res_type=4, time_step=300.0).items():
        bmi.set_value(k, [v])
    bmi.set_value("lake_surface__elevation", [9.7])
    bmi.set_value("rfc_timeseries_discharges", series)
    bmi.set_value("synthetic_flag", np.zeros(30))
    bmi.set_value("rfc_total_counts", [30])
    bmi.set_value("rfc_da_timestep", [3600.0])
    bmi.set_value("rfc_timeseries_idx", [2])
    bmi.set_value("lake_water~incoming__volume_flow_rate", [12.0])
    bmi.update()
    out = bmi.get_value("lake_water~outgoing__volume_flow_rate")[0]
    # outflow comes from the forecast series, not levelpool
    assert out == pytest.approx(series[3], rel=1e-9)


def test_bmi_from_files_hybrid_coastal(tmp_path):
    """Config-driven BMI (reference troute_model: network from files) with
    hybrid diffusive routing and coastal depth pushed as transport arrays
    (reference run_BMI_Coastal.py pattern, troute_model.py:171-201)."""
    from pathlib import Path

    import yaml

    REF = Path("/root/reference/test/HurricaneLaura")
    if not REF.exists():
        pytest.skip("reference domain not available")
    cfg = yaml.safe_load(open(REF / "troute_UnitTest_noRS.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(REF / "domain/RouteLink_NWMv2.1.nc")
    sp["mask_file_path"] = \
        str(REF / "domain/unit_test_noRS/coastal_subset.txt")
    cfg["network_topology_parameters"]["waterbody_parameters"]["level_pool"][
        "level_pool_waterbody_parameter_file_path"] = \
        str(REF / "domain/LAKEPARM_NWMv2.1.nc")
    rp = cfg["compute_parameters"]["restart_parameters"]
    rp["wrf_hydro_channel_restart_file"] = \
        str(REF / "restart/HYDRO_RST.2020-08-26_00:00_DOMAIN1")
    rp["wrf_hydro_channel_ID_crosswalk_file"] = \
        str(REF / "domain/RouteLink_NWMv2.1.nc")
    rp["wrf_hydro_waterbody_restart_file"] = \
        str(REF / "restart/HYDRO_RST.2020-08-26_00:00_DOMAIN1")
    rp["wrf_hydro_waterbody_ID_crosswalk_file"] = \
        str(REF / "domain/LAKEPARM_NWMv2.1.nc")
    rp["start_datetime"] = "2020-08-26_00:00"
    hp = cfg["compute_parameters"]["hybrid_parameters"]
    hp["diffusive_domain"] = \
        str(REF / "domain/unit_test_noRS/coastal_domain.yaml")
    hp["topobathy_domain"] = str(REF / "domain/final_diffusive_natural_xs.nc")
    hp["run_refactored_network"] = False
    hp.pop("coastal_boundary_domain", None)
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    fp.pop("coastal_boundary_input_file", None)
    fp["nts"] = 36
    cfg["compute_parameters"]["data_assimilation_parameters"] = {}
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    def run(coastal):
        bmi = BmiTrouteTpu()
        bmi.initialize(str(p))
        ids = bmi.get_value("segment_id")
        bmi.set_value("land_surface_water_source__volume_flow_rate",
                      np.full(ids.size, 0.3))
        if coastal:
            bmi.set_value("depthArray_coastal", np.full(6, 4.0))
            bmi.set_value("timeArray_coastal", np.arange(6) * 3600.0)
            bmi.set_value("nTimes_coastal", np.array([6]))
            bmi.set_value("stationArray_coastal",
                          np.array([5781901], np.int64))
            bmi.set_value("nStations_coastal", np.array([1]))
            bmi.set_value("coastal_timeRef", np.zeros(1))
        for h in (1, 2, 3):
            bmi.update_until(h * 3600.0)
        q = bmi.get_value("channel_exit_water_x-section__volume_flow_rate")
        d = bmi.get_value("channel_water__mean_depth")
        k = int(np.where(ids == 5781901)[0][0])
        assert np.isfinite(q).all() and np.isfinite(d).all()
        return float(q[k]), float(d[k])

    q_no, d_no = run(False)
    q_co, d_co = run(True)
    # a 4 m downstream pool backwaters the tailwater: flow throttled,
    # solution clearly different from the normal-depth boundary
    assert q_co < q_no - 0.1
    assert abs(d_co - d_no) > 0.05
