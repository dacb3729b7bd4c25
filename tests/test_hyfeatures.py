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
    rl, nexus_of_wb, wb_ds_nexus = read_geopkg(GPKG)
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
    rl, nexus_of_wb, wb_ds_nexus = read_geopkg(GPKG)
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


def test_stream_output_mask_and_types(tmp_path):
    """stream_output with wb/nex mask (reference mask_output.yaml format,
    nhd_io.py:2237-2347) and csv output type."""
    from troute_tpu.cli import main_v04

    rl, nexus_of_wb, wb_ds_nexus = read_geopkg(GPKG)
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
