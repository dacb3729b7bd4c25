"""Simulation output writers.

Array-first equivalents of the reference's ``nwm_output_generator``
(``nwm_routing/output.py:117``) / ``nhd_io`` writers: flowveldepth CSV and
NetCDF (stream_output), chanobs, lakeout, and lastobs files.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from troute_tpu.io.netcdf import write_netcdf


def flowveldepth_dataframe(ids, fvd, t0, dt):
    """fvd [nts, N, 3] -> wide DataFrame indexed by feature id with
    (timestamp, variable) columns — the reference's flowveldepth layout."""
    nts = fvd.shape[0]
    times = pd.date_range(t0 + pd.Timedelta(seconds=dt), periods=nts,
                          freq=pd.Timedelta(seconds=dt))
    cols = pd.MultiIndex.from_product([times, ("q", "v", "d")])
    data = np.asarray(fvd).transpose(1, 0, 2).reshape(len(ids), nts * 3)
    return pd.DataFrame(data, index=np.asarray(ids), columns=cols)


def write_flowveldepth_csv(path, ids, fvd, t0, dt):
    df = flowveldepth_dataframe(ids, fvd, t0, dt)
    df.to_csv(path)
    return path


def write_stream_output_nc(path, ids, fvd, t0, dt):
    """Write q/v/d series as a netCDF4 file (stream_output equivalent)."""
    fvd = np.asarray(fvd)
    nts = fvd.shape[0]
    times = (np.arange(1, nts + 1) * dt).astype(np.int64)
    write_netcdf(
        path,
        variables={
            "feature_id": np.asarray(ids, np.int64),
            "time": times,
            "flow": fvd[:, :, 0].T.astype(np.float32),
            "velocity": fvd[:, :, 1].T.astype(np.float32),
            "depth": fvd[:, :, 2].T.astype(np.float32),
        },
        dims={
            "flow": ("feature_id", "time"),
            "velocity": ("feature_id", "time"),
            "depth": ("feature_id", "time"),
        },
        attrs={
            "time": {"units": "seconds since %s"
                     % t0.strftime("%Y-%m-%d %H:%M:%S")},
            "flow": {"units": "m3 s-1"},
            "velocity": {"units": "m s-1"},
            "depth": {"units": "m"},
        },
        global_attrs={"TITLE": "troute_tpu stream output",
                      "model_initialization_time":
                          t0.strftime("%Y-%m-%d_%H:%M:%S")})
    return path


def write_chanobs_nc(path, gage_ids, gage_feature_ids, fvd_at_gages, t0, dt):
    """Modeled flow at gage locations (chanobs equivalent)."""
    q = np.asarray(fvd_at_gages)[:, :, 0]
    nts = q.shape[0]
    times = (np.arange(1, nts + 1) * dt).astype(np.int64)
    write_netcdf(
        path,
        variables={
            "feature_id": np.asarray(gage_feature_ids, np.int64),
            "time": times,
            "streamflow": q.T.astype(np.float32),
        },
        dims={"streamflow": ("feature_id", "time")},
        attrs={"time": {"units": "seconds since %s"
                        % t0.strftime("%Y-%m-%d %H:%M:%S")},
               "streamflow": {"units": "m3 s-1"}},
        global_attrs={"TITLE": "troute_tpu chanobs"})
    return path


def write_lakeout_nc(path, lake_ids, outflow, water_elevation, inflow, t0):
    """Waterbody states at one output time (lakeout equivalent)."""
    write_netcdf(
        path,
        variables={
            "lake_id": np.asarray(lake_ids, np.int64),
            "outflow": np.asarray(outflow, np.float64),
            "water_sfc_elev": np.asarray(water_elevation, np.float32),
            "inflow": np.asarray(inflow, np.float64),
        },
        dims={"outflow": ("lake_id",), "water_sfc_elev": ("lake_id",),
              "inflow": ("lake_id",)},
        global_attrs={"TITLE": "troute_tpu lakeout",
                      "valid_time": t0.strftime("%Y-%m-%d_%H:%M:%S")})
    return path


def write_lastobs_nc(path, gage_ids, lastobs_time, lastobs_discharge, t0):
    """Persisted last-observation state for DA warm restart."""
    gid = np.asarray([str(g).ljust(15) for g in gage_ids], dtype="S15")
    write_netcdf(
        path,
        variables={
            "stationId": gid,
            "time_since_lastobs": np.asarray(lastobs_time, np.float64),
            "lastobs_discharge": np.asarray(lastobs_discharge, np.float64),
        },
        dims={"time_since_lastobs": ("stationId",),
              "lastobs_discharge": ("stationId",)},
        global_attrs={"modelTimeAtOutput":
                      t0.strftime("%Y-%m-%d_%H:%M:%S")})
    return path
