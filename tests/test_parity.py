"""Parity vs actual NWM output (CHRTOUT validation data).

The reference ships LowerColorado CHRTOUT files produced by the operational
NWM — real reference-model output.  A direct allclose is not attainable in
this repo's data: the shipped HYDRO_RST restart predates this RouteLink
version (11,141 vs 11,248 rows; the reference CI itself leaves it commented
out), so antecedent state differs — trunk rivers carry weeks of baseflow
memory that a 23-hour cold-start window cannot reproduce, and the drought
flows make relative errors at gaged trunk points state-dominated (verified:
disabling our DA changes nothing, so the difference is initial state, not
assimilation).

What IS checkable and guarded here: after an 18-hour spin-up, the great
majority of (small, fast-equilibrating) segments match the NWM output —
median relative error ~10% domain-wide.  Kernel-level parity is separately
established by the scalar-oracle and golden-value tests.
"""

import glob
from pathlib import Path

import numpy as np
import pytest
import yaml

from troute_tpu.cli import main_v04
from troute_tpu.parity import parity_check, read_chrtout_streamflow

REF = Path("/root/reference/test/LowerColorado_TX")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference domain not available")


def test_parity_vs_nwm_chrtout(tmp_path):
    cfg = yaml.safe_load(open(REF / "test_AnA_V4_NHD.yaml"))
    fp = cfg["compute_parameters"]["forcing_parameters"]
    files = sorted(glob.glob(str(REF / "channel_forcing/*.CHRTOUT_DOMAIN1")))
    fp["nts"] = len(files) * 12
    fp["max_loop_size"] = 100
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
    dap["reservoir_da"]["reservoir_parameter_file"] = \
        str(REF / "domain/reservoir_index_AnA.nc")
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    res = main_v04(["-f", str(p)])
    fvd, ids = res["fvd"], res["ids"]

    hours = list(range(17, 26))   # spun-up window
    ref_q = read_chrtout_streamflow([files[h + 1] for h in hours], ids)
    sim_q = np.stack([fvd[12 * (h + 1) - 1, :, 0] for h in hours])
    seg = res["built"].segment_rows
    stats = parity_check(sim_q[:, seg], ref_q[:, seg])
    assert stats["n"] > 90_000
    # measured 2026-08: median 0.103, p90 0.952 — asserted with margin so
    # real-output parity can only improve, never silently regress
    assert stats["median_rel_err"] < 0.13, stats
    assert stats["p90_rel_err"] < 1.15, stats
