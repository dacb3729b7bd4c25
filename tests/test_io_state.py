"""Round-trip tests for warm-state I/O: nudgingLastObs NetCDF and lite
restarts must be readable back by this framework AND structurally match
the reference formats (nhd_io.py:1433-1500, 1737-1773) so AnA cycling and
cross-framework resume work.
"""

import numpy as np
import pandas as pd
import pytest

from troute_tpu.io.output import write_lastobs_nc
from troute_tpu.io.restart import (read_lastobs_file, read_lite_restart,
                                   write_lite_restart)


def test_lastobs_roundtrip(tmp_path):
    t0 = pd.Timestamp("2023-04-02 07:00:00")
    gages = ["08117995", "08111111", "0099999X"]
    # offsets relative to the model time at output: one recent, one stale,
    # one never-observed (NaN)
    offsets = np.array([-300.0, -86400.0, np.nan])
    discharge = np.array([12.5, 3.25, np.nan])

    p = tmp_path / "nudgingLastObs.2023-04-02_07:00:00.nc"
    write_lastobs_nc(p, gages, offsets, discharge, t0)

    gids, disch, offs = read_lastobs_file(p)
    assert list(gids) == gages
    np.testing.assert_allclose(disch[:2], discharge[:2])
    assert np.isnan(disch[2])
    # timestamps are written to 1 s resolution
    np.testing.assert_allclose(offs[:2], offsets[:2], atol=1.0)
    # never-observed lanes carry offset 0 (reference fillna(0))
    assert offs[2] == 0.0


def test_lastobs_reference_schema(tmp_path):
    """The file must carry the reference variable names/dtypes
    (lastobs_df_output, nhd_io.py:1737-1773): stationId |S15, time |S19
    char timestamps on (stationIdInd, timeInd), discharge on the same
    dims, global modelTimeAtOutput."""
    import h5py

    t0 = pd.Timestamp("2023-04-02 07:00:00")
    p = tmp_path / "lo.nc"
    write_lastobs_nc(p, ["08117995"], np.array([-600.0]),
                     np.array([7.0]), t0)
    with h5py.File(p, "r") as f:
        assert f["stationId"].dtype == np.dtype("S15")
        assert f["time"].dtype == np.dtype("S19")
        assert f["time"].shape == (1, 1)
        assert f["discharge"].shape == (1, 1)
        assert f["time"][0, 0] == b"2023-04-02_06:50:00"
        mt = f.attrs["modelTimeAtOutput"]
        mt = mt.decode() if isinstance(mt, bytes) else str(mt)
        assert mt == "2023-04-02_07:00:00"


def test_lite_restart_roundtrip(tmp_path):
    ts = pd.Timestamp("2023-04-02 13:00:00")
    q0 = pd.DataFrame({"qu0": [1.0, 2.0], "qd0": [1.0, 2.0],
                       "h0": [0.3, 0.4]}, index=[101, 102])
    wb = pd.DataFrame({"qd0": [5.0], "h0": [9.1]}, index=[9000])
    chan_p, wb_p = write_lite_restart(tmp_path, ts, q0, wb)

    chan = read_lite_restart(chan_p)
    wbr = read_lite_restart(wb_p)
    # the reference's read_lite_restart requires a `time` column
    # (nhd_io.py:1453: df['time'].iloc[0])
    assert chan["time"].iloc[0] == ts
    assert wbr["time"].iloc[0] == ts
    np.testing.assert_allclose(chan["qd0"].to_numpy(), [1.0, 2.0])
    np.testing.assert_allclose(wbr["h0"].to_numpy(), [9.1])
    # the caller's frames must not be mutated
    assert "time" not in q0.columns and "time" not in wb.columns
