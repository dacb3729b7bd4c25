"""Config-schema round-trip over every reference control file.

The reference's own config test deserializes every yaml one level under
``test/`` through its pydantic model (``troute-config/test/test_config.py:
13-21``); this is the same contract against our schema, extended to the
six NWM operational configs.
"""

from pathlib import Path

import pytest

from troute_tpu.config import load_config

REF_TEST = Path("/root/reference/test")

pytestmark = pytest.mark.skipif(not REF_TEST.exists(),
                                reason="reference test dir not available")


def _control_files():
    # same glob depth as the reference test: control files live one level
    # under test/, domain/crosswalk yamls live deeper and are excluded
    files = sorted(REF_TEST.glob("*/*.yaml"))
    files += sorted(REF_TEST.glob("operational_configurations/*.yaml"))
    return sorted(set(files))


@pytest.mark.parametrize("file", _control_files(), ids=lambda p: p.name)
def test_reference_config_round_trip(file):
    cfg = load_config(file)
    # every control file carries the core blocks our CLI routes from
    assert cfg.compute_parameters is not None
    fp = cfg.compute_parameters.forcing_parameters
    assert fp.dt > 0 and fp.qts_subdivisions >= 1


def test_v3_reservoir_da_keys_normalized():
    """v3 DA keys reach the v4 shapes main_v04 reads (reference
    input.py:427-560 consumes the flat v3 names; normalize_v3_keys maps
    them so a -V3 run gets reservoir DA and lastobs warm start)."""
    cfg = load_config(REF_TEST / "LowerColorado_TX/test_AnA.yaml")
    rda = cfg.compute_parameters.data_assimilation_parameters.reservoir_da
    pda = rda.reservoir_persistence_da
    assert pda is not None
    assert pda.reservoir_persistence_usgs is True
    assert pda.reservoir_persistence_usace is True
    # gage_lakeID_crosswalk_file is the v3 name of the reservoir
    # parameter (reservoir_index) file
    assert rda.reservoir_parameter_file == "domain/reservoir_index_AnA.nc"
    # geo_file_type -> network_type
    sp = cfg.network_topology_parameters.supernetwork_parameters
    assert sp.network_type == "NHDNetwork"

    cfg = load_config(REF_TEST / "HurricaneLaura/test_AnA.yaml")
    sda = cfg.compute_parameters.data_assimilation_parameters.streamflow_da
    # wrf_hydro_lastobs_file -> lastobs_file
    assert sda.lastobs_file == \
        "lastobs/nudgingLastObs.2020-06-01_12:00:00.nc"
    rda = cfg.compute_parameters.data_assimilation_parameters.reservoir_da
    # waterbody_parameters.rfc block -> reservoir_rfc_da
    assert rda.reservoir_rfc_da is not None
    assert rda.reservoir_rfc_da.reservoir_rfc_forecasts is False
    assert rda.reservoir_rfc_da.reservoir_rfc_forecasts_lookback_hours == 48
    assert rda.reservoir_parameter_file == "domain/reservoir_index_AnA.nc"


def test_v4_configs_untouched_by_v3_normalization():
    """A v4 config's explicit reservoir_da block wins over any v3-era
    keys (normalize_v3_keys only fills absent v4 keys)."""
    cfg = load_config(REF_TEST / "LowerColorado_TX/test_AnA_V4_NHD.yaml")
    rda = cfg.compute_parameters.data_assimilation_parameters.reservoir_da
    assert rda.reservoir_parameter_file == "domain/reservoir_index_AnA.nc"
    assert rda.reservoir_persistence_da.reservoir_persistence_usgs is True


def test_v3_null_reservoir_da_still_engages_rfc_block(tmp_path):
    """An explicitly-null ``reservoir_da:`` mapping (children commented
    out) must not drop the waterbody_parameters.rfc block: the reference
    v3 path reads rfc independently of reservoir_da presence
    (preprocess.py:293-303)."""
    p = tmp_path / "cfg.yaml"
    p.write_text("""
network_topology_parameters:
    supernetwork_parameters:
        geo_file_path: domain/RouteLink.nc
    waterbody_parameters:
        rfc:
            reservoir_parameter_file: domain/reservoir_index.nc
            reservoir_rfc_forecasts: True
            reservoir_rfc_forecasts_time_series_path: rfc_TimeSeries/
compute_parameters:
    forcing_parameters:
        dt: 300
    data_assimilation_parameters:
        reservoir_da:
""")
    cfg = load_config(p, v3=True)
    rda = cfg.compute_parameters.data_assimilation_parameters.reservoir_da
    assert rda is not None
    assert rda.reservoir_rfc_da.reservoir_rfc_forecasts is True
    assert rda.reservoir_parameter_file == "domain/reservoir_index.nc"


def test_v3_rfc_block_param_file_precedence(tmp_path):
    """Reference v3 precedence: when an rfc block exists, its
    reservoir_parameter_file wins over gage_lakeID_crosswalk_file — even
    clobbering it with None (preprocess.py:294-299)."""
    p = tmp_path / "cfg.yaml"
    p.write_text("""
network_topology_parameters:
    supernetwork_parameters:
        geo_file_path: domain/RouteLink.nc
    waterbody_parameters:
        rfc:
            reservoir_rfc_forecasts: False
compute_parameters:
    forcing_parameters:
        dt: 300
    data_assimilation_parameters:
        reservoir_da:
            gage_lakeID_crosswalk_file: domain/reservoir_index.nc
            reservoir_persistence_usgs: True
            crosswalk_usgs_gage_field: my_gage_col
""")
    cfg = load_config(p, v3=True)
    rda = cfg.compute_parameters.data_assimilation_parameters.reservoir_da
    # strict v3: the rfc block carries no param file -> clobbered to None
    assert rda.reservoir_parameter_file is None
    # flat crosswalk field overrides reach the synthesized persistence
    # block (reference reads them off the flat v3 block,
    # preprocess.py:315-318)
    pda = rda.reservoir_persistence_da
    assert pda.crosswalk_usgs_gage_field == "my_gage_col"
    # permissive (mixed) mode keeps the crosswalk-derived file instead
    cfg2 = load_config(p)
    rda2 = cfg2.compute_parameters.data_assimilation_parameters.reservoir_da
    assert rda2.reservoir_parameter_file == "domain/reservoir_index.nc"


def test_v4_gate_skips_v3_normalization(tmp_path):
    """v3=False loads v4-only, like the reference main_v04 (which never
    reads waterbody_parameters.rfc or flat reservoir_da keys)."""
    p = tmp_path / "cfg.yaml"
    p.write_text("""
network_topology_parameters:
    supernetwork_parameters:
        geo_file_path: domain/RouteLink.nc
        geo_file_type: NHDNetwork
    waterbody_parameters:
        rfc:
            reservoir_rfc_forecasts: True
compute_parameters:
    forcing_parameters:
        dt: 300
    data_assimilation_parameters:
        reservoir_da:
""")
    cfg = load_config(p, v3=False)
    dap = cfg.compute_parameters.data_assimilation_parameters
    assert dap.reservoir_da is None or dap.reservoir_da.reservoir_rfc_da \
        is None
