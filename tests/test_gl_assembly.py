"""Great Lakes DA assembly on the real Canadian (WSC) TimeSlice files and
Lake Ontario CSV, feeding the (already-tested) GL DA engine op."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from troute_tpu.da_assembly import (assemble_gl_inputs,
                                    read_lake_ontario_outflow)
from troute_tpu.network.gl_constants import GL_CLIMATOLOGY, climatology_for
from troute_tpu.ops.reservoir_da import GreatLakesDAState, great_lakes_da

V4 = Path("/root/reference/test/LowerColorado_TX_v4")

pytestmark = pytest.mark.skipif(not V4.exists(),
                                reason="reference v4 data not available")


def test_lake_ontario_csv():
    t0 = pd.Timestamp("2024-04-23")
    vals, secs = read_lake_ontario_outflow(
        V4 / "domain/cleaned_lakeOntario.csv", t0)
    assert vals.size > 100
    assert np.all(np.diff(secs) >= 0)
    assert 1000 < np.median(vals) < 12000   # plausible outflows (m3/s)


def test_gl_inputs_from_canadian_timeslices():
    t0 = pd.Timestamp("2024-04-23")
    files = sorted((V4 / "Canadian_timeslices").glob("*.ncdf"))[:8]
    # pick a station actually present in the files
    import h5py
    with h5py.File(files[0]) as f:
        st = [b"".join(r).decode().strip() for r in f["stationId"][...]]
    gage = next(s for s in st if s)
    gl = assemble_gl_inputs({4800006: gage}, t0, canada_files=files,
                            lake_ontario_csv=V4 /
                            "domain/cleaned_lakeOntario.csv")
    assert 4800006 in gl and 4800007 in gl
    obs, times, clim = gl[4800006]
    assert clim.shape == (12,)
    np.testing.assert_array_equal(clim, GL_CLIMATOLOGY[2])

    # drive the engine op with the assembled Ontario inputs
    vals, secs, clim7 = gl[4800007]
    state = GreatLakesDAState(
        assimilated_outflow=jnp.asarray([jnp.nan]),
        assimilated_time=jnp.asarray([0.0]),
        update_time=jnp.asarray([0.0]))
    out, state = great_lakes_da(
        state, jnp.asarray([vals]), jnp.asarray([secs]), now=300.0,
        month_idx=3, climatology=jnp.asarray([clim7]))
    assert np.isfinite(float(out[0])) and float(out[0]) > 0


def test_climatology_lookup():
    assert climatology_for(4800002)[0] == 1946
    assert climatology_for(123) is None

def test_cli_assemble_reservoir_da_great_lakes():
    """CLI DA assembly marks GL lakes type 6 and stages obs + climatology
    without needing a reservoir parameter file (reference great_lake class,
    DataAssimilation.py:710)."""
    from types import SimpleNamespace

    from troute_tpu.cli import assemble_reservoir_da
    from troute_tpu.config.schema import (
        DataAssimilationParameters, ReservoirDAParameters,
        ReservoirPersistenceDA)
    from troute_tpu.network.topology import from_connections

    conn = {1: [4800007], 4800007: [2], 2: []}
    topo = from_connections(conn, reservoir_ids=[4800007])
    built = SimpleNamespace(topo=topo)
    dap = DataAssimilationParameters(
        canada_timeslices_folder="Canadian_timeslices",
        LakeOntario_outflow="domain/cleaned_lakeOntario.csv",
        reservoir_da=ReservoirDAParameters(
            reservoir_persistence_da=ReservoirPersistenceDA(
                reservoir_persistence_greatLake=True)))
    cfg = SimpleNamespace(compute_parameters=SimpleNamespace(
        data_assimilation_parameters=dap))

    t0 = pd.Timestamp("2024-04-23")
    res_da = assemble_reservoir_da(cfg, built, V4, t0, nts=24, dt=300.0,
                                   dtype=jnp.float64)
    assert res_da is not None
    assert int(res_da.wbody_type[0]) == 6
    clim = np.asarray(res_da.gl_climatology[0])
    np.testing.assert_array_equal(clim, GL_CLIMATOLOGY[3])
    # Ontario CSV obs staged (all from 2011-2012, so far in the past
    # relative to 2024 -> large negative times, finite values)
    obs = np.asarray(res_da.gl_obs[0])
    assert np.isfinite(obs).sum() > 1000
    # month index covers the run window (April)
    assert int(res_da.month_idx[0]) == 3


def test_cli_assemble_reservoir_da_gl_disabled():
    """Without the greatLake switch (and no parameter file) -> no DA."""
    from types import SimpleNamespace

    from troute_tpu.cli import assemble_reservoir_da
    from troute_tpu.config.schema import (
        DataAssimilationParameters, ReservoirDAParameters,
        ReservoirPersistenceDA)
    from troute_tpu.network.topology import from_connections

    topo = from_connections({1: [4800007], 4800007: [2], 2: []},
                            reservoir_ids=[4800007])
    built = SimpleNamespace(topo=topo)
    dap = DataAssimilationParameters(
        reservoir_da=ReservoirDAParameters(
            reservoir_persistence_da=ReservoirPersistenceDA(
                reservoir_persistence_greatLake=False)))
    cfg = SimpleNamespace(compute_parameters=SimpleNamespace(
        data_assimilation_parameters=dap))
    assert assemble_reservoir_da(cfg, built, V4, pd.Timestamp("2024-04-23"),
                                 nts=24, dt=300.0, dtype=jnp.float64) is None
