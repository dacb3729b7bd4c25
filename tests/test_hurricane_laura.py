"""HurricaneLaura unit-test domain: hybrid MC + diffusive with NATURAL
cross-sections (surveyed bathymetry lookup tables) and a matching
WRF-Hydro restart — the reference's coastal diffusive test configuration
(``troute_UnitTest_noRS.yaml``)."""

from pathlib import Path

import numpy as np
import pytest
import yaml

REF = Path("/root/reference/test/HurricaneLaura")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference domain not available")


def test_natural_xsec_table_from_real_bathymetry():
    from troute_tpu.io.netcdf import NetCDFFile
    from troute_tpu.diffusive.xsection import build_xsec_table_natural

    with NetCDFFile(REF / "domain/final_diffusive_natural_xs.nc") as f:
        links = f.read("link").astype(np.int64)
        x = f.read("xid_d")
        z = f.read("z")
        n = f.read("n")
    link0 = links[0]
    sel = links == link0
    tab, z0 = build_xsec_table_natural(x[sel], z[sel], n[sel])
    assert tab.shape == (11, 501)
    assert z0 == pytest.approx(z[sel].min())
    assert np.all(np.diff(tab[1]) >= 0)          # area monotone
    assert np.all(np.diff(tab[4]) >= -1e-9)      # conveyance smoothed
    assert np.isfinite(tab).all()
    assert tab[10].min() > 0                      # composite 1/n positive


def test_laura_hybrid_natural_end_to_end(tmp_path):
    from troute_tpu.cli import main_v04

    cfg = yaml.safe_load(open(REF / "troute_UnitTest_noRS.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(REF / "domain/RouteLink_NWMv2.1.nc")
    sp["mask_file_path"] = str(REF / "domain/unit_test_noRS/coastal_subset.txt")
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
    hp["coastal_boundary_domain"] = \
        str(REF / "domain/unit_test_noRS/coastal_boundary_domain.yaml")
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    fp["coastal_boundary_input_file"] = \
        str(REF / "channel_forcing/schout_1.nc")
    fp["nts"] = 12
    cfg["compute_parameters"]["data_assimilation_parameters"] = {}
    cfg["output_parameters"] = {}
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    res = main_v04(["-f", str(p)])
    assert np.isfinite(res["fvd"]).all()
    d = res["diffusive"]
    assert d is not None and np.isfinite(d["q"]).all()
    assert d["depth"].min() > 0


def _rs_config(tmp_path, refac: bool):
    cfg = yaml.safe_load(open(REF / "troute_UnitTest_RS.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(REF / "domain/RouteLink_NWMv2.1.nc")
    sp["mask_file_path"] = str(REF / "domain/unit_test_RS/coastal_subset.txt")
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
    hp["diffusive_domain"] = str(REF / "domain/unit_test_RS/coastal_domain.yaml")
    hp["topobathy_domain"] = str(REF / "domain/final_diffusive_natural_xs.nc")
    hp["run_refactored_network"] = refac
    hp["refactored_domain"] = \
        str(REF / "domain/unit_test_RS/refactored_coastal_domain.yaml")
    hp["refactored_topobathy_domain"] = \
        str(REF / "domain/refac_final_diffusive_natural_xs.nc")
    hp.pop("coastal_boundary_domain", None)
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["qlat_input_folder"] = str(REF / "channel_forcing")
    fp.pop("coastal_boundary_input_file", None)
    fp["nts"] = 12
    cfg["compute_parameters"]["data_assimilation_parameters"] = {}
    cfg["output_parameters"] = {}
    p = tmp_path / f"cfg_{refac}.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    return p


def test_laura_refactored_network(tmp_path):
    """run_refactored_network: diffusive solve on the refactored links,
    results crosswalked back to the unrefactored mainstem segments by
    length fraction (legacy diffusive_utils.py:555-788 semantics; the
    reference's own v02 refactored branch references undefined arrays)."""
    from troute_tpu.cli import main_v04

    res = main_v04(["-f", str(_rs_config(tmp_path, False))])
    res_r = main_v04(["-f", str(_rs_config(tmp_path, True))])
    d, dr = res["diffusive"], res_r["diffusive"]
    # unrefactored run carries all 3 mainstem segs; refactored crosswalks
    # back to the rlink members (trib 1622701 is upstream boundary only)
    assert sorted(d["ids"].tolist()) == [1622701, 1622703, 1622721]
    assert sorted(dr["ids"].tolist()) == [1622703, 1622721]
    assert np.isfinite(dr["q"]).all() and np.isfinite(dr["depth"]).all()
    assert dr["depth"].min() > 0
    # flows on the shared segments agree within the resampled-geometry
    # tolerance (same forcing, different cross-section source)
    for s in (1622703, 1622721):
        k, kr = (list(d["ids"]).index(s), list(dr["ids"]).index(s))
        assert abs(d["q"][-1, k] - dr["q"][-1, kr]) < 0.5


def test_parquet_topobathy_equivalent(tmp_path):
    """The HYFeatures parquet topobathy variant loads identically to the
    NetCDF format (AbstractRouting.py:388-401 'wb-' prefixed hy_id)."""
    import pandas as pd

    from troute_tpu.io.netcdf import NetCDFFile

    src = REF / "domain/final_diffusive_natural_xs.nc"
    with NetCDFFile(src) as f:
        links = f.read("link").astype(np.int64)
        df = pd.DataFrame({
            "hy_id": [f"wb-{s}" for s in links],
            "xid_d": np.asarray(f.read("xid_d"), np.float64),
            "z": np.asarray(f.read("z"), np.float64),
            "n": np.asarray(f.read("n"), np.float64)})
    pq = tmp_path / "topobathy.parquet"
    df.to_parquet(pq)

    import yaml as _yaml
    from troute_tpu.config import load_config
    from troute_tpu.routing.hybrid import HybridDomain
    cfg = _yaml.safe_load(open(REF / "troute_UnitTest_noRS.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(REF / "domain/RouteLink_NWMv2.1.nc")
    sp["mask_file_path"] = \
        str(REF / "domain/unit_test_noRS/coastal_subset.txt")
    cfg["compute_parameters"]["hybrid_parameters"]["diffusive_domain"] = \
        str(REF / "domain/unit_test_noRS/coastal_domain.yaml")
    p = tmp_path / "cfg.yaml"
    _yaml.safe_dump(cfg, open(p, "w"))
    c = load_config(p)

    h1 = HybridDomain(c, tmp_path)
    n1 = h1.load_topobathy(src)
    h2 = HybridDomain(c, tmp_path)
    n2 = h2.load_topobathy(pq)
    assert n1 == n2 > 0
    for key in h1.natural_xsec:
        for a, b in zip(h1.natural_xsec[key], h2.natural_xsec[key]):
            np.testing.assert_array_equal(a, b)


def test_laura_hybrid_sharded_matches_single_device(tmp_path):
    """The full hybrid configuration (MC + natural-xsec diffusive
    mainstems) on a multi-device mesh: MC routes sharded over 8 CPU
    devices with the basin-splitting partition, tributary series feed the
    diffusive solver, and everything matches the single-device run
    bit-for-bit (VERDICT: sharded hybrid; reference coupling
    compute.py:1740-1884)."""
    from troute_tpu.cli import main_v04

    p = _rs_config(tmp_path, refac=False)
    ref = main_v04(["-f", str(p)])

    cfg = yaml.safe_load(open(p))
    cfg["compute_parameters"]["parallel_compute_method"] = "sharded"
    p2 = tmp_path / "cfg_sharded.yaml"
    yaml.safe_dump(cfg, open(p2, "w"))
    got = main_v04(["-f", str(p2)])

    np.testing.assert_array_equal(got["fvd"], ref["fvd"])
    d_ref, d_got = ref["diffusive"], got["diffusive"]
    assert d_ref is not None and d_got is not None
    np.testing.assert_array_equal(d_got["ids"], d_ref["ids"])
    np.testing.assert_array_equal(d_got["q"], d_ref["q"])
    np.testing.assert_array_equal(d_got["depth"], d_ref["depth"])


def test_laura_two_tailwater_batched_matches_merged(tmp_path):
    """Splitting the mainstem chain into two independent tailwater trees
    (drop the middle link from the diffusive domain — it stays in the MC
    network and feeds the lower tree as a tributary) exercises the
    batched per-tailwater path.  ``diffusive_batching: auto`` runs each
    tree with its own adaptive dt (the reference's per-domain diffnw);
    "never" keeps the merged coupled-dt domain — the two must agree to
    transient-trajectory tolerance and share ids/shapes exactly."""
    import jax
    from troute_tpu.cli import main_v04
    from troute_tpu.io.routelink import read_routelink

    dd = yaml.safe_load(
        open(REF / "domain/unit_test_noRS/coastal_domain.yaml"))
    (tw, spec), = dd.items()
    links = [int(x)
             for x in (spec["links"] if isinstance(spec, dict) else spec)]
    rl = read_routelink(
        REF / "domain/RouteLink_NWMv2.1.nc", None,
        np.loadtxt(REF / "domain/unit_test_noRS/coastal_subset.txt",
                   dtype=np.int64, ndmin=1))
    conn = dict(zip(rl.ids.tolist(), rl.downstream.tolist()))
    ls = set(links)
    depth = {}

    def _depth(x):
        if x not in depth:
            d = conn.get(x)
            depth[x] = 0 if d not in ls else _depth(d) + 1
        return depth[x]

    for x in links:
        _depth(x)
    mid = next(x for x in links if depth[x] == max(depth.values()) // 2)
    two_tw = {tw: {"links": [x for x in links if x != mid]}}
    dd_path = tmp_path / "two_tailwaters.yaml"
    yaml.safe_dump(two_tw, open(dd_path, "w"))

    def run(batching, pcm=None):
        cfg = yaml.safe_load(open(REF / "troute_UnitTest_noRS.yaml"))
        if pcm:
            cfg["compute_parameters"]["parallel_compute_method"] = pcm
        sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
        sp["geo_file_path"] = str(REF / "domain/RouteLink_NWMv2.1.nc")
        sp["mask_file_path"] = \
            str(REF / "domain/unit_test_noRS/coastal_subset.txt")
        cfg["network_topology_parameters"]["waterbody_parameters"][
            "level_pool"]["level_pool_waterbody_parameter_file_path"] = \
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
        hp["diffusive_domain"] = str(dd_path)
        hp["topobathy_domain"] = \
            str(REF / "domain/final_diffusive_natural_xs.nc")
        hp["run_refactored_network"] = False
        hp["diffusive_batching"] = batching
        hp.pop("coastal_boundary_domain", None)
        fp = cfg["compute_parameters"]["forcing_parameters"]
        fp["qlat_input_folder"] = str(REF / "channel_forcing")
        fp.pop("coastal_boundary_input_file", None)
        fp["nts"] = 12
        cfg["compute_parameters"]["data_assimilation_parameters"] = {}
        cfg["output_parameters"] = {}
        p = tmp_path / f"cfg_{batching}_{pcm}.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        return main_v04(["-f", str(p)])

    got = run("auto")
    ref = run("never")

    # sharded run: MC over the mesh AND the two tailwater lanes spread
    # over the same mesh (shard_batched_domains); agrees with the
    # single-device batched run to f64 ulp level
    shd = run("auto", pcm="sharded")
    np.testing.assert_array_equal(shd["diffusive"]["ids"],
                                  got["diffusive"]["ids"])
    np.testing.assert_allclose(shd["diffusive"]["q"],
                               got["diffusive"]["q"],
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(shd["diffusive"]["depth"],
                               got["diffusive"]["depth"],
                               rtol=1e-10, atol=1e-10)
    d_got, d_ref = got["diffusive"], ref["diffusive"]
    assert d_got is not None and d_ref is not None
    np.testing.assert_array_equal(d_got["ids"], d_ref["ids"])
    assert len(d_got["ids"]) == len(links) - 1
    assert np.isfinite(d_got["q"]).all() and np.isfinite(d_got["depth"]).all()
    assert d_got["depth"].min() > 0
    # independent vs coupled adaptive dt: same physics, different
    # internal step trajectories (measured ~2% transient drift on this
    # 4 m-segment chain; the hard bit-exactness check — batched lane ==
    # solo domain — lives in tests/test_diffusive_batched.py)
    np.testing.assert_allclose(d_got["q"], d_ref["q"], rtol=1e-1)
    np.testing.assert_allclose(d_got["depth"], d_ref["depth"], rtol=1e-1)
    # MC side identical (diffusive does not feed back into MC); the
    # trailing columns of fvd are the appended diffusive mainstems
    n_ms = len(d_got["ids"])
    np.testing.assert_array_equal(got["fvd"][:, :-n_ms],
                                  ref["fvd"][:, :-n_ms])


def test_laura_uniform_table_fast_path_matches_exact(tmp_path):
    """TPU-production-default accuracy study on REAL Laura bathymetry.

    Runs the exact configuration the TPU backend defaults to
    (``diffusive_dtype: float32`` + ``diffusive_table_nel: 128`` — the
    uniform stretched-grid tables and in-reach GS sweep) against the
    reference-precision run (float64, exact 501-entry tables) on the
    natural-xsec coastal domain with a coastal boundary series, and
    asserts the same quantile budget as the synthetic study
    (tests/test_diffusive_uniform.py): median/p99/max relative flow
    error and median depth error."""
    from troute_tpu.cli import main_v04

    def run(nel, dtype="float64"):
        cfg = yaml.safe_load(open(REF / "troute_UnitTest_noRS.yaml"))
        sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
        sp["geo_file_path"] = str(REF / "domain/RouteLink_NWMv2.1.nc")
        sp["mask_file_path"] = \
            str(REF / "domain/unit_test_noRS/coastal_subset.txt")
        cfg["network_topology_parameters"]["waterbody_parameters"][
            "level_pool"]["level_pool_waterbody_parameter_file_path"] = \
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
        hp["topobathy_domain"] = \
            str(REF / "domain/final_diffusive_natural_xs.nc")
        hp["run_refactored_network"] = False
        hp["coastal_boundary_domain"] = \
            str(REF / "domain/unit_test_noRS/coastal_boundary_domain.yaml")
        hp["diffusive_table_nel"] = nel      # 0 -> exact tables
        hp["diffusive_dtype"] = dtype
        fp = cfg["compute_parameters"]["forcing_parameters"]
        fp["qlat_input_folder"] = str(REF / "channel_forcing")
        fp["coastal_boundary_input_file"] = \
            str(REF / "channel_forcing/schout_1.nc")
        fp["nts"] = 12
        cfg["compute_parameters"]["data_assimilation_parameters"] = {}
        cfg["output_parameters"] = {}
        p = tmp_path / f"cfg_nel{nel}.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        return main_v04(["-f", str(p)])["diffusive"]

    exact = run(0)                 # reference-precision parity config
    fast = run(128, "float32")     # the TPU production default
    assert np.isfinite(fast["q"]).all() and fast["depth"].min() > 0
    dq = np.abs(fast["q"] - exact["q"]) \
        / np.maximum(np.abs(exact["q"]), 1.0)
    dd = np.abs(fast["depth"] - exact["depth"])
    # short real-bathymetry transient: flows within a few %, depths cm
    assert np.median(dq) < 1e-2, np.median(dq)
    assert np.quantile(dq, 0.99) < 5e-2, np.quantile(dq, 0.99)
    assert dq.max() < 0.15, dq.max()
    assert np.median(dd) < 0.02, np.median(dd)
    assert np.quantile(dd, 0.99) < 0.10, np.quantile(dd, 0.99)
