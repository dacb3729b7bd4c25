"""DA-forcing BMI: stages TimeSlice/RFC/lastobs/restart inputs as flat
transport arrays (reference bmi_DAforcing.py + model_DAforcing.py)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from troute_tpu.bmi import codec
from troute_tpu.bmi.bmi_daforcing import BmiDAforcing

REF = Path("/root/reference/test/LowerColorado_TX")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference domain not available")


def test_codec_roundtrip():
    df = pd.DataFrame(
        np.arange(6, dtype=float).reshape(2, 3),
        index=["08158000", "0815900A"],
        columns=pd.date_range("2021-08-23", periods=3, freq="15min"))
    t0 = pd.Timestamp("2021-08-23")
    secs, nd, codes, lens, ns = codec.time_stations_from_df(df, t0)
    assert nd == 3 and ns == 2
    flat = codec.flatten_array(df)
    back = codec.df_from_arrays(flat, secs, codes, lens, t0)
    assert list(back.index) == list(df.index)
    np.testing.assert_allclose(back.to_numpy(), df.to_numpy())
    assert (back.columns == df.columns).all()


@pytest.fixture()
def da_config(tmp_path):
    cfg = {
        "compute_parameters": {
            "restart_parameters": {"start_datetime": "2021-08-23_13:00"},
            "forcing_parameters": {"dt": 300, "nts": 12},
            "data_assimilation_parameters": {
                "usgs_timeslices_folder": str(REF / "usgs_TimeSlice"),
                "usace_timeslices_folder": str(REF / "usace_TimeSlice"),
                "timeslice_lookback_hours": 24,
                "qc_threshold": 1.0,
                "streamflow_da": {"streamflow_nudging": True},
                "reservoir_da": {
                    "reservoir_persistence_da": {
                        "reservoir_persistence_usgs": True,
                        "reservoir_persistence_usace": True},
                    "reservoir_rfc_da": {
                        "reservoir_rfc_forecasts": True,
                        "reservoir_rfc_forecasts_time_series_path":
                            str(REF / "rfc_TimeSeries"),
                        "reservoir_rfc_forecasts_offset_hours": 28},
                },
            },
        },
        "network_topology_parameters": {
            "supernetwork_parameters": {
                "geo_file_path": str(REF / "domain/RouteLink.nc")}},
        "output_parameters": {},
    }
    p = tmp_path / "da_cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    return p


def test_daforcing_initialize_real_data(da_config):
    bmi = BmiDAforcing()
    bmi.initialize(str(da_config))

    n_st = int(bmi.get_value("nStations_usgs")[0])
    n_dt = int(bmi.get_value("nDates_usgs")[0])
    assert n_st > 0 and n_dt > 0
    flat = bmi.get_value("usgs_Array")
    assert flat.size == n_st * n_dt

    # reassemble and sanity-check the observations
    t0 = pd.Timestamp("2021-08-23 13:00")
    df = codec.df_from_arrays(
        flat, bmi.get_value("datesSecondsArray_usgs"),
        bmi.get_value("stationArray_usgs"),
        bmi.get_value("stationStringLengthArray_usgs"), t0)
    assert all(len(s) > 0 for s in df.index)
    vals = df.to_numpy()
    assert np.nanmax(vals) > 0
    # observations cover the lookback window up to after t0
    assert df.columns[0] >= t0 - pd.Timedelta(hours=25)

    # RFC rows staged
    n_rfc = bmi.get_value("rfc_totalCounts").size
    assert n_rfc > 0
    gages = codec.decode_strings(
        bmi.get_value("rfc_StationId_array"),
        bmi.get_value("rfc_StationId_stringLengths"))
    assert len(gages) == n_rfc
    disc = bmi.get_value("rfc_discharges").reshape(n_rfc, -1)
    assert np.isfinite(disc).all()

    # reservoir obs staged at 15-min
    assert int(bmi.get_value("nStations_reservoir_usgs")[0]) > 0
    assert bmi.get_value("usgs_reservoir_Array").size > 0

    assert bmi.get_component_name().startswith("DAforcing")
    assert "usgs_Array" in bmi.get_output_var_names()


def test_daforcing_writes_lite_restart(da_config, tmp_path):
    out = tmp_path / "lr"
    out.mkdir()
    cfg = yaml.safe_load(open(da_config))
    cfg["output_parameters"] = {
        "lite_restart": {"lite_restart_output_directory": str(out)}}
    p = da_config.parent / "da_cfg2.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    bmi = BmiDAforcing()
    bmi.initialize(str(p))
    q0 = np.array([[1.0, 2.0, 0.5], [3.0, 4.0, 0.7]])
    bmi.set_value("q0", q0.flatten())
    bmi.set_value("q0_ids", np.array([101, 102]))
    bmi.set_value("write_lite_restart", np.ones(1))
    bmi.update()
    files = list(out.glob("channel_restart_*"))
    assert len(files) == 1
    from troute_tpu.io.restart import read_lite_restart
    df = read_lite_restart(files[0])
    np.testing.assert_allclose(
        df.loc[101, ["qu0", "qd0", "h0"]].to_numpy(np.float64),
        [1.0, 2.0, 0.5])
    assert "time" in df.columns  # reference read_lite_restart needs it
    # flag reset after write
    assert int(bmi.get_value("write_lite_restart")[0]) == 0


def test_coupled_daforcing_to_routing(da_config):
    """Full BMI coupling: DAforcing stages real LowerColorado USGS obs;
    the routing BMI consumes the transport arrays and nudges the gaged
    segment to the observations (reference run-with-BMI pattern,
    test/LowerColorado_TX_v4/run_with_BMI.py)."""
    from troute_tpu.bmi import BmiTrouteTpu

    daf = BmiDAforcing()
    daf.initialize(str(da_config))
    n_st = int(daf.get_value("nStations_usgs")[0])
    assert n_st > 0
    stations = codec.decode_strings(
        daf.get_value("stationArray_usgs"),
        daf.get_value("stationStringLengthArray_usgs"))
    t0 = pd.Timestamp("2021-08-23 13:00")
    obs_df = codec.df_from_arrays(
        daf.get_value("usgs_Array"),
        daf.get_value("datesSecondsArray_usgs"),
        daf.get_value("stationArray_usgs"),
        daf.get_value("stationStringLengthArray_usgs"), t0)
    # pick a station with data just after t0
    window = obs_df.loc[:, obs_df.columns >= t0]
    counts = window.notna().sum(axis=1)
    station = counts.idxmax()
    assert counts.max() > 3

    # tiny chain 1->2->3; gage sits on segment 2
    rt = BmiTrouteTpu()
    rt.initialize()
    ids = [1, 2, 3]
    rt.set_value("segment_id", np.asarray(ids, np.int64))
    rt.set_value("segment_toid", np.asarray([2, 3, 0], np.int64))
    one = np.ones(3)
    for k, val in (("dx", 1500.0), ("bw", 8.0), ("tw", 24.0),
                   ("twcc", 72.0), ("n", 0.05), ("ncc", 0.1),
                   ("cs", 0.8), ("s0", 0.004)):
        rt.set_value(k, val * one)
    rt.set_value("land_surface_water_source__volume_flow_rate",
                 np.full(3, 0.5))

    # wire DAforcing -> routing transport (dates re-based to run t0)
    secs = daf.get_value("datesSecondsArray_usgs") \
        - (t0 - pd.Timestamp(t0)).total_seconds()
    rt.set_value("usgs_gage_observation__volume_flow_rate",
                 daf.get_value("usgs_Array"))
    rt.set_value("datesSecondsArray_usgs", secs.astype(np.float64))
    rt.set_value("stationArray_usgs", daf.get_value("stationArray_usgs"))
    rt.set_value("stationStringLengthArray_usgs",
                 daf.get_value("stationStringLengthArray_usgs"))
    codes, lens = codec.encode_strings([station])
    rt.set_value("gage_segment_id", np.asarray([2], np.int64))
    rt.set_value("gage_stationArray", codes)
    rt.set_value("gage_stationStringLengthArray", lens)

    rt.update_until(3600.0)
    q = rt.get_value("channel_exit_water_x-section__volume_flow_rate")
    assert np.isfinite(q).all()
    # gaged segment pinned to the observation at t=1h (within nudge/decay
    # behavior the replacement is exact when obs exists at the step)
    col = obs_df.columns[np.argmin(np.abs(
        (obs_df.columns - (t0 + pd.Timedelta(hours=1))).total_seconds()))]
    expect = obs_df.loc[station, col]
    if np.isfinite(expect):
        assert q[1] == pytest.approx(expect, rel=1e-3)
    # lastobs handed back through the transport arrays
    assert rt.get_value("lastObs_discharge").size == 1
    lo = float(rt.get_value("lastObs_discharge")[0])
    assert np.isfinite(lo) and lo > 0
