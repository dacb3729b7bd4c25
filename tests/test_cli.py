"""End-to-end CLI test on the reference LowerColorado domain (NHD,
MC + levelpool + streamflow nudging DA), exercising the full pipeline:
config -> network build -> forcing sets -> routing -> DA -> outputs."""

from pathlib import Path

import numpy as np
import pytest
import yaml

import h5py

from troute_tpu.cli import build_forcing_sets, main_v04

REF = Path("/root/reference/test/LowerColorado_TX")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference domain not available")


@pytest.fixture()
def lc_config(tmp_path):
    cfg = yaml.safe_load(open(REF / "test_AnA_V4_NHD.yaml"))
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["nts"] = 36
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(REF / "domain/RouteLink.nc")
    sp["mask_file_path"] = str(REF / "domain/coastal_subset.txt")
    cfg["network_topology_parameters"]["waterbody_parameters"]["level_pool"][
        "level_pool_waterbody_parameter_file_path"] = \
        str(REF / "domain/LAKEPARM.nc")
    cfg["compute_parameters"]["restart_parameters"][
        "wrf_hydro_channel_ID_crosswalk_file"] = \
        str(REF / "domain/RouteLink.nc")
    dap = cfg["compute_parameters"]["data_assimilation_parameters"]
    dap["usgs_timeslices_folder"] = str(REF / "usgs_TimeSlice")
    dap["usace_timeslices_folder"] = str(REF / "usace_TimeSlice")
    dap["reservoir_da"]["reservoir_parameter_file"] = \
        str(REF / "domain/reservoir_index_AnA.nc")
    dap["reservoir_da"]["reservoir_rfc_da"] = {
        "reservoir_rfc_forecasts": True,
        "reservoir_rfc_forecasts_time_series_path":
            str(REF / "rfc_TimeSeries"),
        "reservoir_rfc_forecasts_lookback_hours": 48,
        "reservoir_rfc_forecasts_offset_hours": 28,
        "reservoir_rfc_forecast_persist_days": 11,
    }
    cfg["output_parameters"] = {
        "csv_output": {"csv_output_folder": str(tmp_path / "out")},
        "stream_output": {"stream_output_directory": str(tmp_path / "out")},
        "chanobs_output": {"chanobs_output_directory": str(tmp_path / "out")},
    }
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    return p


def test_cli_end_to_end(lc_config, tmp_path):
    res = main_v04(["-f", str(lc_config)])
    fvd = res["fvd"]
    assert fvd.shape == (36, 10907, 3)
    assert np.isfinite(fvd).all()
    assert fvd[:, :, 0].min() >= 0.0

    # outputs written and readable
    out = tmp_path / "out"
    ncs = sorted(out.glob("*.nc"))
    # 1 chanobs + one stream-output file per simulated hour (reference
    # stream_output_time=1h default), rows at the 60-min internal frequency
    stream = [p for p in ncs if "troute_output" in p.name]
    assert len(stream) == 3 and len(ncs) == 4
    with h5py.File(next(p for p in ncs if "chanobs" in p.name)) as f:
        # reference layout: [time, feature_id] (nhd_io.py:630-636)
        assert f["streamflow"].shape == (36, 76)
    with h5py.File(stream[0]) as f:
        assert f["flow"].shape == (10907, 1)
        assert np.isfinite(f["flow"][...]).all()
    assert len(list(out.glob("*.csv"))) == 1

    # warm state is returned for the next loop
    qf, df, ef = res["final_state"]
    assert qf.shape == (10907,) and np.isfinite(ef).all()


def test_cli_courant_on_stepped_pallas_path(lc_config, tmp_path):
    """return_courant with the pallas kernel (the production stepped
    driver) emits per-step cn/ck/X like the reference hot loop does in
    every mode (MCsingleSegStime_f2py_NOLOOP.f90:342-367)."""
    cfg = yaml.safe_load(open(lc_config))
    cfg["compute_parameters"]["compute_kernel"] = "pallas"
    cfg["compute_parameters"]["return_courant"] = True
    cfg["compute_parameters"]["forcing_parameters"]["nts"] = 12
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg_courant.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    res = main_v04(["-f", str(p)])
    cour = res["courant"]
    assert cour is not None and cour.shape == (12, 10907, 3)
    assert np.isfinite(cour).all()
    assert (cour[:, :, 1] >= 0).all()        # celerity ck


def test_forcing_set_grouping():
    files = [f"f{i}" for i in range(24)]
    sets = build_forcing_sets(files, dt=300.0, qts_subdivisions=12, nts=288,
                              max_loop_size_hrs=12)
    # 12 hrs / (300s * 12 subdivisions) = 12 files per set
    assert [len(s["qlat_files"]) for s in sets] == [12, 12]
    assert [s["nts"] for s in sets] == [144, 144]
    # nts caps the last set
    sets = build_forcing_sets(files, 300.0, 12, 200, 12)
    assert [s["nts"] for s in sets] == [144, 56]


def test_cli_hydro_rst_append_and_logging(lc_config, tmp_path):
    """HYDRO_RST append output (reference nhd_io.write_hydro_rst) +
    log_parameters handling (log file + kernelTalks pre-run dump)."""
    import shutil

    # stage a WRF restart whose Restart_Time falls inside the run window
    rst_dir = tmp_path / "wrf_restarts"
    rst_dir.mkdir()
    dst = rst_dir / "HYDRO_RST.2021-08-23_14:00_DOMAIN1"
    shutil.copy(REF / "restart/HYDRO_RST.2021-08-23_12:00_DOMAIN1", dst)
    with h5py.File(dst, "a") as f:
        f.attrs["Restart_Time"] = np.bytes_("2021-08-23_14:00:00")

    cfg = yaml.safe_load(open(lc_config))
    cfg["output_parameters"]["wrf_hydro_restart_output"] = {
        "wrf_hydro_channel_restart_source_directory": str(rst_dir)}
    cfg["log_parameters"] = {"showtiming": True, "log_level": "INFO",
                             "log_directory": str(tmp_path / "logs")}
    p = tmp_path / "cfg_rst.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    from troute_tpu.cli import main_v04
    res = main_v04(["-f", str(p)])
    assert str(dst) in [str(w) for w in res["written"]]

    with h5py.File(dst) as f:
        q = f["qlink1_troute"][...]
        h = f["hlink_troute"][...]
        link = f["link"][...] if "link" in f else None
    assert np.isfinite(q).all() and q.max() > 0
    # values match the simulated fvd at step t0+1h for a known segment
    fvd, ids = res["fvd"], res["ids"]
    with h5py.File(REF / "domain/RouteLink.nc") as f:
        order = f["link"][...]
    k = 11  # t0 + 12*300s = 1 h
    row_of = {int(s): i for i, s in enumerate(ids)}
    checked = 0
    for pos, seg in enumerate(order[:2000]):
        r = row_of.get(int(seg))
        if r is not None and fvd[k, r, 0] > 0:
            np.testing.assert_allclose(q[pos], fvd[k, r, 0], rtol=1e-6)
            checked += 1
            if checked > 5:
                break
    assert checked > 0

    logs = tmp_path / "logs"
    assert (logs / "troute_tpu.log").exists()
    talk = (logs / "kernelTalks.log").read_text()
    assert "assume_short_ts" in talk and "dt: 300" in talk


def test_cli_parity_check(lc_config, tmp_path):
    """Config-driven WRF-Hydro parity check (build_tests.parity_check):
    compares simulated flow vs CHRTOUT validation data at a node."""
    cfg = yaml.safe_load(open(lc_config))
    # find a segment that exists in the domain and has CHRTOUT data
    with h5py.File(REF / "domain/RouteLink.nc") as f:
        links = f["link"][...]
    mask = np.loadtxt(REF / "domain/coastal_subset.txt", dtype=np.int64)
    node = int(mask[10])
    cfg["output_parameters"]["wrf_hydro_parity_check"] = {
        "parity_check_input_folder": str(REF / "channel_forcing"),
        "parity_check_compare_node": node,
    }
    p = tmp_path / "cfg_parity.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    from troute_tpu.cli import main_v04
    res = main_v04(["-f", str(p)])
    stats = res["parity"]
    assert stats is not None and stats["n"] > 0
    assert np.isfinite(stats["rmse"])
    assert stats["label"] == f"node {node}"


def test_cli_v3_config(tmp_path):
    """The reference's v3 CI config (test_AnA.yaml, run with -V3) works
    through the permissive schema, including its hybrid diffusive domain."""
    import os

    for d in ("domain", "channel_forcing", "restart", "usgs_TimeSlice",
              "usace_TimeSlice", "rfc_TimeSeries"):
        os.symlink(REF / d, tmp_path / d)
    cfg = yaml.safe_load(open(REF / "test_AnA.yaml"))
    cfg["compute_parameters"]["forcing_parameters"]["nts"] = 12
    # skip the (slow, 4 m-segment) diffusive mainstem in the smoke test;
    # the full hybrid path is covered by the HurricaneLaura tests
    cfg["compute_parameters"]["hybrid_parameters"]["run_hybrid_routing"] = \
        False
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg3.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    from troute_tpu.cli import main_v04
    res = main_v04(["-f", str(p), "-V3"])
    assert res["fvd"].shape[0] == 12
    assert np.isfinite(res["fvd"]).all()

    # the v3 reservoir-DA keys must actually engage DA.  The coastal
    # subset has no USGS/USACE-typed lakes (persistence DA is inert here,
    # as in the reference), but 12 RFC-typed lakes — so flip the v3-era
    # rfc block (waterbody_parameters.rfc, normalized into
    # reservoir_da.reservoir_rfc_da) on and expect changed outflows
    cfg_rfc = yaml.safe_load(open(p))
    cfg_rfc["network_topology_parameters"]["waterbody_parameters"]["rfc"][
        "reservoir_rfc_forecasts"] = True
    p2 = tmp_path / "cfg3_rfc.yaml"
    yaml.safe_dump(cfg_rfc, open(p2, "w"))
    res_rfc = main_v04(["-f", str(p2), "-V3"])
    rows = res["built"].topo.reservoir_rows
    assert rows.size > 0
    q_lp = res["fvd"][:, rows, 0]
    q_rfc = res_rfc["fvd"][:, rows, 0]
    assert not np.allclose(q_rfc, q_lp)


def test_cli_chrtout_append(lc_config, tmp_path):
    """CHRTOUT append output (reference nhd_io.write_chrtout): flow at
    every qts-th step written into copies of the forcing CHRTOUT files."""
    import shutil

    src_dir = tmp_path / "chrtout"
    src_dir.mkdir()
    forcing = sorted((REF / "channel_forcing").glob("*.CHRTOUT_DOMAIN1"))
    # the run uses hourly files starting after t0=13:00
    for f in forcing[:6]:
        shutil.copy(f, src_dir / f.name)

    cfg = yaml.safe_load(open(lc_config))
    cfg["output_parameters"]["chrtout_output"] = {
        "wrf_hydro_channel_output_source_folder": str(src_dir)}
    p = tmp_path / "cfg_chrt.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    from troute_tpu.cli import main_v04
    res = main_v04(["-f", str(p)])

    # 36 steps / qts 12 -> 3 files appended
    appended = [f for f in sorted(src_dir.iterdir())
                if "streamflow_troute" in h5py.File(f)]
    assert len(appended) == 3
    with h5py.File(appended[0]) as f:
        q = f["streamflow_troute"][...]
        fids = f["feature_id"][...]
    fvd, ids = res["fvd"], res["ids"]
    pos = {int(s): k for k, s in enumerate(ids)}
    checked = 0
    for i, s in enumerate(fids[:3000]):
        r = pos.get(int(s))
        if r is not None and fvd[11, r, 0] > 0:
            np.testing.assert_allclose(q[i], fvd[11, r, 0], rtol=1e-6)
            checked += 1
    assert checked > 10


def test_cli_multiple_run_sets(lc_config, tmp_path):
    """Splitting the horizon into run sets (max_loop_size) with warm-state
    hand-off and DA clock re-basing must match the single-set run
    (reference run-set loop, __main__.py:195-294 + mc_reach.pyx:822-836)."""
    import copy

    base_cfg = yaml.safe_load(open(lc_config))

    def run(max_hours, tag):
        cfg = copy.deepcopy(base_cfg)
        cfg["compute_parameters"]["forcing_parameters"]["max_loop_size"] = \
            max_hours
        cfg["output_parameters"] = {}
        p = tmp_path / f"cfg_{tag}.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        from troute_tpu.cli import main_v04
        return main_v04(["-f", str(p)])

    one = run(24.0, "one")       # 36 steps in a single set
    split = run(1.0, "split")    # 3 sets of 12 steps
    assert one["fvd"].shape == split["fvd"].shape == (36, 10907, 3)
    np.testing.assert_allclose(split["fvd"], one["fvd"], rtol=1e-6,
                               atol=1e-6)


def test_cli_chanobs_filepath_appends_across_run_sets(lc_config, tmp_path):
    """A configured chanobs_filepath is a fixed file consecutive forecast
    cycles append to along the unlimited time axis (reference
    output.py:529-542 -> nhd_io.write_chanobs create-or-append,
    nhd_io.py:645-667)."""
    import copy

    base_cfg = yaml.safe_load(open(lc_config))
    cfg = copy.deepcopy(base_cfg)
    cfg["compute_parameters"]["forcing_parameters"]["max_loop_size"] = 1.0
    cfg["output_parameters"] = {
        "chanobs_output": {
            "chanobs_output_directory": str(tmp_path / "out2"),
            "chanobs_filepath": "chanobs.nc",
        },
    }
    p = tmp_path / "cfg_chanobs.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    res = main_v04(["-f", str(p)])
    fvd = res["fvd"]
    with h5py.File(tmp_path / "out2" / "chanobs.nc") as f:
        q = f["time"].shape[0]
        assert q == 36                       # 3 run sets x 12 steps appended
        assert f["streamflow"].shape[0] == 36
        assert np.all(np.diff(f["time"][...]) == 5)   # 300 s in minutes
        flows = f["streamflow"][...]
    assert np.isfinite(flows).all()
    # the appended rows are the per-set gage flows in order
    assert fvd.shape[0] == 36


def test_cli_explicit_forcing_sets(lc_config, tmp_path):
    """qlat_forcing_sets: pre-enumerated run sets match the globbed path
    (reference AbstractNetwork.py:747)."""
    import copy

    base_cfg = yaml.safe_load(open(lc_config))
    files = sorted(p.name for p in (REF / "channel_forcing").iterdir()
                   if "CHRTOUT_DOMAIN1" in p.name)[:3]

    cfg = copy.deepcopy(base_cfg)
    cfg["compute_parameters"]["forcing_parameters"]["qlat_forcing_sets"] = [
        {"qlat_files": files[:2], "nts": 24},
        {"qlat_files": files[2:], "nts": 12},
    ]
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg_sets.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    from troute_tpu.cli import main_v04
    res = main_v04(["-f", str(p)])

    cfg2 = copy.deepcopy(base_cfg)
    cfg2["output_parameters"] = {}
    p2 = tmp_path / "cfg_glob.yaml"
    yaml.safe_dump(cfg2, open(p2, "w"))
    ref = main_v04(["-f", str(p2)])

    assert res["fvd"].shape == ref["fvd"].shape == (36, 10907, 3)
    np.testing.assert_allclose(res["fvd"], ref["fvd"], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["short", "strict"])
def test_cli_sharded_matches_default(lc_config, tmp_path, mode):
    """`parallel_compute_method: sharded` routes the LowerColorado AnA
    (full DA: nudging + persistence reservoirs) over the 8-device CPU
    mesh via the balanced basin-splitting partition and matches the
    single-device engine bit-for-bit, including warm final state.  The
    strict variant (assume_short_ts: False + strict_iterative) runs the
    per-sweep-exchange fixed point on both sides."""
    cfg = yaml.safe_load(open(lc_config))
    cfg["compute_parameters"]["forcing_parameters"]["nts"] = 24
    if mode == "strict":
        cfg["compute_parameters"]["assume_short_ts"] = False
        cfg["compute_parameters"]["strict_iterative"] = True
    cfg["output_parameters"] = {}
    p0 = tmp_path / "cfg_single.yaml"
    yaml.safe_dump(cfg, open(p0, "w"))
    ref = main_v04(["-f", str(p0)])

    cfg["compute_parameters"]["parallel_compute_method"] = "sharded"
    p1 = tmp_path / "cfg_sharded.yaml"
    yaml.safe_dump(cfg, open(p1, "w"))
    import jax
    assert len(jax.devices()) >= 8
    got = main_v04(["-f", str(p1)])

    # ulp-level f32 tolerance: the single-device engine sums upstream
    # flows with the banded plan (shift-rank order) while shards sum
    # local+halo gathers — same values, different association.  This
    # same-trajectory cross-check is why strict_accel="auto" resolves
    # OFF for both in-scan engines (engine.RoutingConfig): an
    # accelerated trajectory on either side lands f32 trickle lanes on
    # different secant branches and this ulp bar becomes unreachable.
    np.testing.assert_allclose(got["fvd"], ref["fvd"], rtol=2e-5,
                               atol=1e-7)
    for a, b in zip(got["final_state"], ref["final_state"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_cli_test_output_pickle_and_courant_csv(lc_config, tmp_path):
    """`test_output` pickles the reference-shaped flowveldepth frame
    (index = link ids, flat (timestep, q|v|d) tuple columns,
    output.py:320-322) and return_courant adds courant_*.csv next to the
    fvd csv (output.py:452-470)."""
    cfg = yaml.safe_load(open(lc_config))
    cfg["compute_parameters"]["forcing_parameters"]["nts"] = 12
    cfg["compute_parameters"]["return_courant"] = True
    cfg["output_parameters"] = {
        "csv_output": {"csv_output_folder": str(tmp_path / "out")},
        "test_output": str(tmp_path / "out" / "fvd_test.pkl"),
    }
    p = tmp_path / "cfg_test_output.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    res = main_v04(["-f", str(p)])

    import pandas as pd
    df = pd.read_pickle(tmp_path / "out" / "fvd_test.pkl")
    assert df.shape == (10907, 12 * 3)
    assert df.columns[0] == (0, "q") and df.columns[-1] == (11, "d")
    np.testing.assert_allclose(df[(3, "q")].values,
                               res["fvd"][3, :, 0], rtol=1e-6)
    cour_csv = list((tmp_path / "out").glob("courant_*.csv"))
    assert len(cour_csv) == 1
    cdf = pd.read_csv(cour_csv[0], index_col=0)
    assert cdf.shape == (10907, 12 * 3)
    # row keys must match the fvd csv's (waterbody rows under their
    # OUTLET link ids, not lake ids) so the two outputs join
    fvd_csv = list((tmp_path / "out").glob("flowveldepth_*.csv"))[0]
    fdf = pd.read_csv(fvd_csv, index_col=0)
    assert cdf.index.tolist() == fdf.index.tolist()
    assert cdf.index.tolist() == df.index.tolist()   # and the test pickle


def test_cli_async_prefetch_matches_sync(lc_config, tmp_path):
    """Async forcing prefetch (the pipelining the reference's
    main_v03_async did via asyncio executors, __main__.py:1995-2115)
    reads run set s+1 while set s routes — results must be identical to
    the synchronous loop."""
    import asyncio
    import copy

    base_cfg = yaml.safe_load(open(lc_config))

    def mk(tag, **fp_extra):
        cfg = copy.deepcopy(base_cfg)
        cfg["compute_parameters"]["forcing_parameters"]["max_loop_size"] = 1.0
        cfg["compute_parameters"]["forcing_parameters"].update(fp_extra)
        cfg["output_parameters"] = {}
        p = tmp_path / f"cfg_{tag}.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        return p

    from troute_tpu.cli import main_v03_async, main_v04
    sync = main_v04(["-f", str(mk("sync"))])
    pre = main_v04(["-f", str(mk("pre", async_prefetch=True))])
    np.testing.assert_array_equal(pre["fvd"], sync["fvd"])

    # the async entry point (coroutine, like the reference's)
    res = asyncio.run(main_v03_async(["-f", str(mk("async"))]))
    np.testing.assert_array_equal(res["fvd"], sync["fvd"])


def test_cli_restart_cycling_across_invocations(lc_config, tmp_path):
    """The operational AnA cycle: invocation N+1 warm-starts from the
    files invocation N wrote (lite channel/waterbody restart +
    nudgingLastObs), reference write __main__.py:270-277 / read
    AbstractNetwork.py:673-735.  With state fully file-carried
    (streamflow nudging + plain levelpool; persistence/RFC reservoir DA
    is cycle-local in the reference — re-derived from TimeSlice files
    each invocation, not restart-carried — so it is off here), a
    24-step + 12-step chained pair must reproduce the continuous
    36-step run.  Also exercises mid-folder start: cycle 2 begins at
    the third forcing file (AbstractNetwork.py:856-869 derives the file
    list FROM t0)."""
    import copy

    base_cfg = yaml.safe_load(open(lc_config))
    base_cfg["compute_parameters"]["data_assimilation_parameters"][
        "reservoir_da"] = {
        "reservoir_persistence_da": {"reservoir_persistence_usgs": False,
                                     "reservoir_persistence_usace": False},
        "reservoir_rfc_da": {"reservoir_rfc_forecasts": False},
    }

    def run(tag, cfg):
        p = tmp_path / f"cfg_{tag}.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        return main_v04(["-f", str(p)])

    cont_cfg = copy.deepcopy(base_cfg)
    cont_cfg["output_parameters"] = {}
    cont = run("cont", cont_cfg)

    # ---- cycle 1: 24 steps, write warm-state files ----
    state_dir = tmp_path / "state"
    c1 = copy.deepcopy(base_cfg)
    c1["compute_parameters"]["forcing_parameters"]["nts"] = 24
    c1["compute_parameters"]["data_assimilation_parameters"][
        "streamflow_da"]["lastobs_output_folder"] = str(state_dir)
    c1["output_parameters"] = {
        "lite_restart": {"lite_restart_output_directory": str(state_dir)}}
    r1 = run("c1", c1)
    assert r1["fvd"].shape[0] == 24

    chan = state_dir / "channel_restart_202108231500"
    wb = state_dir / "waterbody_restart_202108231500"
    lo = state_dir / "nudgingLastObs.2021-08-23_15:00:00.nc"
    assert chan.exists() and wb.exists() and lo.exists()

    # ---- cycle 2: restart from cycle 1's files, 12 steps ----
    c2 = copy.deepcopy(base_cfg)
    c2["compute_parameters"]["forcing_parameters"]["nts"] = 12
    rp2 = c2["compute_parameters"]["restart_parameters"]
    rp2["start_datetime"] = "2021-08-23_15:00"
    rp2["lite_channel_restart_file"] = str(chan)
    rp2["lite_waterbody_restart_file"] = str(wb)
    c2["compute_parameters"]["data_assimilation_parameters"][
        "streamflow_da"]["lastobs_file"] = str(lo)
    c2["output_parameters"] = {}
    r2 = run("c2", c2)
    assert r2["fvd"].shape[0] == 12

    fvd = np.concatenate([r1["fvd"], r2["fvd"]])
    assert fvd.shape == cont["fvd"].shape
    np.testing.assert_allclose(fvd, cont["fvd"], rtol=1e-6, atol=1e-6)


def test_cli_qlat_input_file_and_const(lc_config, tmp_path):
    """Fileless forcing fallbacks (reference NHDNetwork.py:388-397):
    a qlat_input_file CSV reproduces the CHRTOUT-folder run exactly,
    and qlat_const routes without any forcing files at all."""
    import copy

    import pandas as pd

    from troute_tpu.io.forcing import read_qlat_chrtout

    base_cfg = yaml.safe_load(open(lc_config))

    # CSV with the same values the folder run reads from CHRTOUT
    folder = REF / "channel_forcing"
    files = sorted(p for p in folder.iterdir()
                   if "CHRTOUT_DOMAIN1" in p.name)[:3]
    with h5py.File(files[0]) as f:
        ids = np.asarray(f["feature_id"][...], np.int64)
    ql = read_qlat_chrtout(files, ids)          # [3, N] incl. bucket terms
    csv_path = tmp_path / "qlat.csv"
    pd.DataFrame(ql.T, index=ids).to_csv(csv_path)

    cfg = copy.deepcopy(base_cfg)
    fpar = cfg["compute_parameters"]["forcing_parameters"]
    del fpar["qlat_input_folder"]
    fpar["qlat_input_file"] = str(csv_path)
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg_csv.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    res = main_v04(["-f", str(p)])

    ref_cfg = copy.deepcopy(base_cfg)
    ref_cfg["output_parameters"] = {}
    p2 = tmp_path / "cfg_folder.yaml"
    yaml.safe_dump(ref_cfg, open(p2, "w"))
    ref = main_v04(["-f", str(p2)])

    assert res["fvd"].shape == ref["fvd"].shape == (36, 10907, 3)
    np.testing.assert_allclose(res["fvd"], ref["fvd"], rtol=1e-6, atol=1e-6)

    # constant fallback: no forcing files anywhere
    cfg = copy.deepcopy(base_cfg)
    fpar = cfg["compute_parameters"]["forcing_parameters"]
    del fpar["qlat_input_folder"]
    fpar["qlat_const"] = 0.25
    cfg["output_parameters"] = {}
    p3 = tmp_path / "cfg_const.yaml"
    yaml.safe_dump(cfg, open(p3, "w"))
    res_c = main_v04(["-f", str(p3)])
    fvd = res_c["fvd"]
    assert fvd.shape == (36, 10907, 3)
    assert np.isfinite(fvd).all()
    # constant inflow everywhere: (nearly) all segments carry positive
    # flow — reservoir outlets may still sit at ~0 outflow after 3 h
    assert (fvd[-1, :, 0] > 0).mean() > 0.9
