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
    rl, nexus_of_wb = read_geopkg(GPKG)
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
    rl, nexus_of_wb = read_geopkg(GPKG)
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
