"""HYFeatures (NextGen geopackage) network path tests on the reference
unit-test domain — sqlite-based geopackage reading, wb/nex edge chaining,
NEXOUT forcing mapping, and an end-to-end CLI run."""

from pathlib import Path

import numpy as np
import pytest
import yaml

from troute_tpu.network.hyfeatures import (
    read_geopkg, read_lake_attributes, read_qlat_nexout)

REF = Path("/root/reference/test/unit_test_hyfeature")
GPKG = REF / "domain/gauge_01069700.gpkg"

pytestmark = pytest.mark.skipif(not GPKG.exists(),
                                reason="reference domain not available")


def test_read_geopkg():
    rl, nexus_of_wb, wb_ds_nexus, hyf_da = read_geopkg(GPKG)
    assert rl.ids.tolist() == [10236, 10237, 10245]
    # wb-10245 -> nex-10236 -> wb-10236 -> nex-10237 -> wb-10237 -> out
    down = dict(zip(rl.ids.tolist(), rl.downstream.tolist()))
    assert down[10245] == 10236
    assert down[10236] == 10237
    assert down[10237] not in rl.ids          # terminal
    assert rl.gages[rl.ids.tolist().index(10237)] == "01069700"
    assert nexus_of_wb[10236] == 10236
    assert rl.channel["dx"][0] > 1000


def test_nexout_forcing_mapping():
    rl, nexus_of_wb, wb_ds_nexus, hyf_da = read_geopkg(GPKG)
    files = sorted((REF / "channel_forcing").glob("*NEXOUT.csv"))[:2]
    ql = read_qlat_nexout(files, rl.ids, nexus_of_wb)
    assert ql.shape == (2, 3)
    assert np.isfinite(ql).all()


def test_cli_end_to_end_hyfeatures(tmp_path):
    from troute_tpu.cli import main_v04

    cfg = yaml.safe_load(open(REF / "unittest_hyfeature.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(GPKG)
    cfg["network_topology_parameters"]["waterbody_parameters"]["level_pool"][
        "level_pool_waterbody_parameter_file_path"] = str(GPKG)
    cfg["compute_parameters"]["hybrid_parameters"] = {
        "run_hybrid_routing": False}
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["nexus_input_folder"] = str(REF / "channel_forcing")
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    fp["nts"] = 24
    cfg["compute_parameters"]["data_assimilation_parameters"] = {}
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    res = main_v04(["-f", str(p)])
    fvd = res["fvd"]
    assert fvd.shape == (24, 3, 3)
    assert np.isfinite(fvd).all()
    # flow accumulates down the wb chain wherever forcing is nonzero
    assert fvd[-1, :, 0].max() >= 0


def _write_new_format_gpkg(path, lake4_id=901.0):
    """Synthetic NEW-generation hydrofabric: flowpaths.toid linkage, a
    ``network`` layer carrying hl_uri/hydroseq gage tags, and a ``lakes``
    layer keyed by hl_link with the outlet wb in ``id`` (the format
    HYFeaturesNetwork.py:369-703 consumes; the shipped unit-test gpkg is
    the older edge-list generation)."""
    import sqlite3

    chain = [("wb-1", "nex-1"), ("wb-2", "nex-2"), ("wb-3", "nex-3"),
             ("wb-4", "nex-4"), ("wb-5", "nex-5"), ("wb-6", "nex-6"),
             ("wb-7", "tnx-9999999")]
    nexus = [("nex-1", "wb-2"), ("nex-2", "wb-3"), ("nex-3", "wb-4"),
             ("nex-4", "wb-5"), ("nex-5", "wb-6"), ("nex-6", "wb-7")]
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE flowpaths (fid INTEGER, id TEXT, toid TEXT)")
    con.executemany("INSERT INTO flowpaths VALUES (NULL, ?, ?)", chain)
    con.execute("CREATE TABLE nexus "
                "(fid INTEGER, id TEXT, toid TEXT, hl_uri TEXT)")
    con.executemany("INSERT INTO nexus VALUES (NULL, ?, ?, NULL)", nexus)
    con.execute(
        "CREATE TABLE flowpath_attributes (fid INTEGER, id TEXT,"
        " rl_NHDWaterbodyComID TEXT, MusK REAL, MusX REAL, n REAL, So REAL,"
        " ChSlp REAL, BtmWdth REAL, nCC REAL, TopWdthCC REAL, TopWdth REAL,"
        " length_m REAL)")
    wb_of = {"wb-4": str(int(lake4_id)), "wb-6": "347987"}
    for wb, _ in chain:
        con.execute("INSERT INTO flowpath_attributes VALUES "
                    "(NULL, ?, ?, 3600, 0.2, 0.05, 0.002, 0.6, 8, 0.1,"
                    " 120, 30, 1800)", (wb, wb_of.get(wb)))
    # network layer: gage 05587450 appears on wb-2 AND wb-3 (hydroseq picks
    # the furthest downstream); wb-4 carries both a USGS and a NID (USACE)
    # designation for lake 901 (usgs type 2 must win, reference :683-695)
    con.execute("CREATE TABLE network "
                "(fid INTEGER, id TEXT, hl_uri TEXT, hydroseq REAL)")
    con.executemany(
        "INSERT INTO network VALUES (NULL, ?, ?, ?)",
        [("wb-1", None, 5.0),
         ("wb-2", "Gages-05587450", 10.0),
         ("wb-3", "Gages-05587450", 20.0),
         ("wb-4", "Gages-07355860", 30.0),
         ("wb-4", "NID-TX01234", 30.0),
         ("wb-5", None, 40.0), ("wb-6", None, 50.0),
         ("wb-7", None, 60.0)])
    con.execute(
        "CREATE TABLE lakes (fid INTEGER, id TEXT, hl_link REAL,"
        " Dam_Length REAL, ifd REAL, LkArea REAL, LkMxE REAL,"
        " OrificeA REAL, OrificeC REAL, OrificeE REAL, WeirC REAL,"
        " WeirE REAL, WeirL REAL)")
    for wb, lake in (("wb-4", lake4_id), ("wb-6", 347987.0)):
        con.execute("INSERT INTO lakes VALUES "
                    "(NULL, ?, ?, 10, 0.9, 1.5, 9.96, 1.0, 0.1, 7.733,"
                    " 0.4, 9.626, 10.0)", (wb, lake))
    con.commit()
    con.close()


def _write_timeslice(path, stamp, gages, values):
    import h5py

    n = len(gages)
    with h5py.File(path, "w") as f:
        f.create_dataset("stationId", data=np.array(
            [list(f"{g:<15}") for g in gages], "S1"))
        f.create_dataset("time", data=np.array(
            [list(stamp) for _ in gages], "S1"))
        f.create_dataset("discharge",
                         data=np.asarray(values, np.float32))
        f.create_dataset("discharge_quality",
                         data=np.full(n, 100, np.int16))


def _write_rfc_series(path, discharges, observed=115):
    import h5py

    n = len(discharges)
    with h5py.File(path, "w") as f:
        f.create_dataset("discharges",
                         data=np.asarray([discharges], np.float32))
        f.create_dataset("synthetic_values", data=np.zeros((1, n), np.int8))
        f.create_dataset("totalCounts", data=np.array([n], np.int16))
        f.create_dataset("observedCounts",
                         data=np.array([observed], np.int16))
        f.create_dataset("forecastCounts",
                         data=np.array([n - observed], np.int16))
        f.create_dataset("timeSteps", data=np.array([3600], np.int32))


def test_new_format_gpkg_da_crosswalks(tmp_path):
    """Gage/lake crosswalks derived from the new-format geopackage's
    network layer (HYFeaturesNetwork.py:606-703): hydroseq dedup, USGS over
    USACE typing, RFC predefined-table filter."""
    g = tmp_path / "domain.gpkg"
    _write_new_format_gpkg(g)
    rl, nexus_of_wb, wb_ds, da = read_geopkg(g)

    assert rl.ids.tolist() == [1, 2, 3, 4, 5, 6, 7]
    down = dict(zip(rl.ids.tolist(), rl.downstream.tolist()))
    assert down == {1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 0}
    # gage 05587450 lands on wb-3 (higher hydroseq), not wb-2
    assert da.gages == {3: "05587450", 4: "07355860"}
    assert rl.gages[2] == "05587450" and rl.gages[1] == ""
    assert da.usgs_lake_gage == {901: "07355860"}
    assert da.usace_lake_gage == {901: "TX01234"}
    assert da.rfc_lake_gage == {347987: "KNFC1"}     # predefined table
    # waterbody membership column
    assert rl.waterbody[3] == 901 and rl.waterbody[5] == 347987


@pytest.mark.parametrize("lake4_id", [901.0, 2.0])
def test_new_format_gpkg_ana_da_end_to_end(tmp_path, lake4_id):
    """v4-style AnA with persistence + RFC reservoir DA and streamflow
    nudging running from the geopackage ALONE (no reservoir parameter
    NetCDF): types from gpkg crosswalks, obs from synthetic TimeSlices,
    RFC series from a synthetic forecast file.

    ``lake4_id=2.0`` collides with segment wb-2's id, forcing the
    reference's synthetic +9.99e11 waterbody offset
    (HYFeaturesNetwork.py:477-504) — the DA crosswalks must follow the
    offset or the lake silently loses its USGS persistence typing."""
    import pandas as pd
    import yaml as _yaml

    from troute_tpu.cli import main_v04

    g = tmp_path / "domain.gpkg"
    _write_new_format_gpkg(g, lake4_id=lake4_id)
    t0 = pd.Timestamp("2021-08-23 13:00")

    # hourly NEXOUT forcing for 12 x 300 s steps
    forcing = tmp_path / "forcing"
    forcing.mkdir()
    for h in range(2):
        stamp = (t0 + pd.Timedelta(hours=h)).strftime("%Y%m%d%H%M")
        pd.DataFrame({"feature_id": [1, 2, 3, 4, 5, 6],
                      stamp: [0.5] * 6}
                     ).set_index("feature_id").to_csv(
            forcing / f"{stamp}NEXOUT.csv")

    # 15-min USGS TimeSlices covering the window: nudging gage + lake gage
    ts_dir = tmp_path / "usgs_ts"
    ts_dir.mkdir()
    for k in range(9):
        t = t0 + pd.Timedelta(minutes=15 * k)
        stamp = t.strftime("%Y-%m-%d_%H:%M:%S")
        _write_timeslice(ts_dir / f"{stamp}.15min.usgsTimeSlice.ncdf",
                         stamp, ["05587450", "07355860"], [4.5, 6.0])

    rfc_dir = tmp_path / "rfc_ts"
    rfc_dir.mkdir()
    rfc_stamp = (t0 + pd.Timedelta(hours=28)).floor("h").strftime(
        "%Y-%m-%d_%H")
    _write_rfc_series(
        rfc_dir / f"{rfc_stamp}.60min.KNFC1.RFCTimeSeries.ncdf",
        np.linspace(8, 12, 289))

    cfg = {
        "network_topology_parameters": {
            "supernetwork_parameters": {
                "geo_file_path": str(g), "network_type": "HYFeaturesNetwork"},
            "waterbody_parameters": {
                "break_network_at_waterbodies": True,
                "level_pool": {
                    "level_pool_waterbody_parameter_file_path": str(g)}},
        },
        "compute_parameters": {
            "parallel_compute_method": "serial",
            "compute_kernel": "V02-structured",
            "assume_short_ts": True,
            "restart_parameters": {
                "start_datetime": t0.strftime("%Y-%m-%d_%H:%M")},
            "forcing_parameters": {
                "nts": 12, "dt": 300, "qts_subdivisions": 12,
                "nexus_input_folder": str(forcing),
                "qlat_file_pattern_filter": "*NEXOUT*"},
            "data_assimilation_parameters": {
                "usgs_timeslices_folder": str(ts_dir),
                "streamflow_da": {"streamflow_nudging": True,
                                  "gage_segID": "link"},
                "reservoir_da": {
                    "reservoir_persistence_da": {
                        "reservoir_persistence_usgs": True,
                        "reservoir_persistence_usace": True},
                    "reservoir_rfc_da": {
                        "reservoir_rfc_forecasts": True,
                        "reservoir_rfc_forecasts_time_series_path":
                            str(rfc_dir),
                        "reservoir_rfc_forecasts_lookback_hours": 28,
                        "reservoir_rfc_forecasts_offset_hours": 28,
                        "reservoir_rfc_forecast_persist_days": 11}},
            },
        },
        "output_parameters": {},
    }
    p = tmp_path / "cfg.yaml"
    _yaml.safe_dump(cfg, open(p, "w"))
    res = main_v04(["-f", str(p)])

    fvd, ids = res["fvd"], res["ids"]
    assert np.isfinite(fvd).all()
    pos = {int(s): k for k, s in enumerate(ids)}
    # lake rows are reported under their OUTLET link ids (wb-4 for lake
    # 901, wb-6 for lake 347987), reference waterbody output convention
    # reservoir typing from the gpkg alone: lake 901 -> USGS hybrid
    # persistence (type 2, obs 6.0 m3/s), lake 347987 -> RFC forecast
    # hybrid persistence holds the observed outflow at lake 901
    np.testing.assert_allclose(fvd[-1, pos[4], 0], 6.0, rtol=1e-3)
    # RFC forecast discharge at lake 347987 comes from the series:
    # timeseries_idx = observedCounts(115) - offset(28) = 87 ->
    # linspace(8,12,289)[87..88] ~ 9.21-9.24 (io/rfc.py idx rule)
    q_rfc = fvd[-1, pos[6], 0]
    assert 9.0 <= q_rfc <= 9.5, q_rfc
    # streamflow nudging pinned wb-3 to the 4.5 m3/s observations
    np.testing.assert_allclose(fvd[-1, pos[3], 0], 4.5, rtol=1e-3)


def test_stream_output_mask_and_types(tmp_path):
    """stream_output with wb/nex mask (reference mask_output.yaml format,
    nhd_io.py:2237-2347) and csv output type."""
    from troute_tpu.cli import main_v04

    rl, nexus_of_wb, wb_ds_nexus, hyf_da = read_geopkg(GPKG)
    wbs = rl.ids.tolist()
    # pick a nexus fed by at least one wb
    nex = next(iter({v for v in wb_ds_nexus.values()}))
    members = [w for w, nx in wb_ds_nexus.items() if nx == nex]

    cfg = yaml.safe_load(open(REF / "unittest_hyfeature.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(GPKG)
    cfg["network_topology_parameters"]["waterbody_parameters"]["level_pool"][
        "level_pool_waterbody_parameter_file_path"] = str(GPKG)
    cfg["compute_parameters"]["hybrid_parameters"] = {
        "run_hybrid_routing": False}
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["nexus_input_folder"] = str(REF / "channel_forcing")
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    fp["nts"] = 24
    cfg["compute_parameters"]["data_assimilation_parameters"] = {}
    mask = {"wb": [int(wbs[0])], "nex": [int(nex)]}
    mask_p = tmp_path / "mask.yaml"
    yaml.safe_dump(mask, open(mask_p, "w"))
    cfg["output_parameters"] = {"stream_output": {
        "stream_output_directory": str(tmp_path / "out"),
        "stream_output_type": ".csv",
        "stream_output_time": 2.0,
        "stream_output_internal_frequency": 60,
        "mask_output": str(mask_p)}}
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    res = main_v04(["-f", str(p)])

    csvs = sorted((tmp_path / "out").glob("*.csv"))
    assert len(csvs) == 1     # 2h simulated, 2h per file
    import pandas as pd
    df = pd.read_csv(csvs[0], index_col=0)
    # one masked wb row + one nexus row (ids may coincide numerically in
    # this tiny domain; Type disambiguates)
    pairs = set(zip(df.index.astype(int), df["Type"]))
    assert (int(wbs[0]), "wb") in pairs
    assert (int(nex), "nex") in pairs
    # nexus flow = sum of member wb flows at the same times
    fvd, ids = res["fvd"], res["ids"]
    pos = {int(s): k for k, s in enumerate(ids)}
    expect = sum(fvd[23, pos[m], 0] for m in members if m in pos)
    nex_row = df[(df.index.astype(int) == int(nex))
                 & (df["Type"] == "nex")].iloc[0]
    qvals = [v for c, v in nex_row.items() if str(c).endswith("_q")]
    assert qvals, f"no q columns found: {list(df.columns)[:4]}"
    np.testing.assert_allclose(float(qvals[-1]), expect, rtol=1e-6)
