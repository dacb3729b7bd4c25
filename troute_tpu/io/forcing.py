"""Lateral-inflow (qlat) forcing readers.

Equivalents of ``nhd_io.get_ql_from_chrtout`` / ``get_ql_from_csv``:
lateral inflow per segment per forcing interval, as a [n_times, N] array
aligned to a segment-id index.
"""

from __future__ import annotations

import numpy as np

from troute_tpu.io.netcdf import NetCDFFile


def read_qlat_chrtout(files, segment_ids: np.ndarray,
                      index_col: str = "feature_id",
                      value_col: str = "q_lateral",
                      gw_bucket_col: str = "qBucket",
                      runoff_col: str = "qSfcLatRunoff") -> np.ndarray:
    """qlat [n_files, N] from CHRTOUT files, aligned to ``segment_ids``.

    Lateral inflow = gw_bucket_col + runoff_col when both are present, else
    the ``value_col`` variable (reference ``nhd_io.py:397-435``; column
    names configurable via forcing_parameters qlat_file_* keys).
    """
    segment_ids = np.asarray(segment_ids, np.int64)
    out = np.zeros((len(files), segment_ids.size), np.float32)
    for t, path in enumerate(files):
        with NetCDFFile(path) as f:
            fids = f.read(index_col).astype(np.int64)
            names = f.variables
            if gw_bucket_col in names and runoff_col in names:
                ql = f.read(gw_bucket_col) + f.read(runoff_col)
            else:
                ql = f.read(value_col)
        order = np.argsort(fids)
        pos = np.searchsorted(fids[order], segment_ids)
        pos = np.clip(pos, 0, fids.size - 1)
        hit = fids[order][pos] == segment_ids
        vals = np.asarray(ql, np.float64)[order][pos]
        out[t] = np.where(hit, vals, 0.0).astype(np.float32)
    return out


def read_qlat_csv(path, segment_ids: np.ndarray) -> np.ndarray:
    """qlat [n_times, N] from a CSV indexed by segment id (cols = times)."""
    import pandas as pd

    df = pd.read_csv(path, index_col=0)
    df.index = df.index.astype(np.int64)
    df = df.reindex(np.asarray(segment_ids, np.int64)).fillna(0.0)
    return df.to_numpy(np.float32).T
