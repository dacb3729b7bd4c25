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


def _write_chrtout_like(path, fids, arrays, times=None):
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("feature_id", data=np.asarray(fids, np.int64))
        for name, arr in arrays.items():
            f.create_dataset(name, data=np.asarray(arr, np.float64))
        if times is not None:
            f.create_dataset("time", data=np.asarray(times, np.float64))


def test_read_qlat_wrf_hydro_mf_multitime(tmp_path):
    """WRF-Hydro output multifile qlat (reference
    nhd_io.get_ql_from_wrf_hydro_mf, nhd_io.py:437-512): files carry
    [time, N] variables, concatenate along time ordered by the time
    coordinate, value_col preferred over the bucket+runoff sum."""
    from troute_tpu.io.forcing import (read_qlat_chrtout,
                                       read_qlat_wrf_hydro_mf)

    fids = [30, 10, 20]
    # file 2 written first but holds LATER times -> must sort after file 1
    f1 = tmp_path / "b_CHRTOUT"
    f2 = tmp_path / "a_CHRTOUT"
    _write_chrtout_like(
        f1, fids, {"q_lateral": [[3.0, 1.0, 2.0], [6.0, 4.0, 5.0]],
                   # distractor variables must lose to q_lateral here
                   "qBucket": [[9.0] * 3] * 2,
                   "qSfcLatRunoff": [[9.0] * 3] * 2},
        times=[100.0, 200.0])
    _write_chrtout_like(
        f2, fids, {"q_lateral": [[9.0, 7.0, 8.0]]}, times=[300.0])

    seg = np.array([10, 20, 30, 99])          # 99 absent -> 0
    ql = read_qlat_wrf_hydro_mf([f2, f1], seg)
    assert ql.shape == (3, 4)
    np.testing.assert_allclose(ql[0], [1.0, 2.0, 3.0, 0.0])
    np.testing.assert_allclose(ql[1], [4.0, 5.0, 6.0, 0.0])
    np.testing.assert_allclose(ql[2], [7.0, 8.0, 9.0, 0.0])

    # the generic CHRTOUT reader auto-delegates on 2-D variables
    ql2 = read_qlat_chrtout([f2, f1], seg)
    np.testing.assert_allclose(ql2, ql)


def test_read_qlat_wrf_hydro_mf_bucket_fallback(tmp_path):
    """Without value_col, the mf reader sums qBucket + qSfcLatRunoff
    (reference nhd_io.py:488-492)."""
    from troute_tpu.io.forcing import read_qlat_wrf_hydro_mf

    f1 = tmp_path / "CHRTOUT0"
    _write_chrtout_like(f1, [1, 2], {"qBucket": [[0.5, 1.5]],
                                     "qSfcLatRunoff": [[0.25, 0.75]]})
    ql = read_qlat_wrf_hydro_mf([f1], np.array([1, 2]))
    np.testing.assert_allclose(ql, [[0.75, 2.25]])


def test_chanobs_append(tmp_path):
    """write_chanobs_nc appends along the unlimited time axis when the
    file exists (reference nhd_io.write_chanobs, nhd_io.py:645-667)."""
    import h5py

    from troute_tpu.io.output import write_chanobs_nc

    t0 = pd.Timestamp("2021-08-23 13:00:00")
    fvd = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    p = tmp_path / "chanobs.nc"
    write_chanobs_nc(p, ["a", "b", "c"], [11, 22, 33], fvd, t0, 300.0)
    t1 = t0 + pd.Timedelta(seconds=600)
    write_chanobs_nc(p, ["a", "b", "c"], [11, 22, 33], fvd + 100.0, t1,
                     300.0)
    with h5py.File(p) as f:
        assert f["streamflow"].shape == (4, 3)
        q = f["streamflow"][...]
        t = f["time"][...]
    np.testing.assert_allclose(q[:2, 0], [0.0, 9.0])
    np.testing.assert_allclose(q[2:, 0], [100.0, 109.0])
    # contiguous 5-minute stamps across the append boundary
    assert np.all(np.diff(t) == 5)


def test_build_obs_array_rejects_gage_overflow():
    """A crosswalk/observation-count mismatch must fail loudly, not drop
    gages (VERDICT r3 weak #6)."""
    import pytest

    from troute_tpu.io.timeslice import build_obs_array

    obs = pd.DataFrame(np.ones((3, 4)), index=["g1", "g2", "g3"])
    ok = build_obs_array(obs, {}, n_gages=3, nts=3)
    assert ok.shape == (4, 3)
    with pytest.raises(ValueError, match="refusing to silently drop"):
        build_obs_array(obs, {}, n_gages=2, nts=3)
