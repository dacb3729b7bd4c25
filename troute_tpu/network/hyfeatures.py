"""HYFeatures (NextGen hydrofabric) network reading.

Equivalent of the reference's ``HYFeaturesNetwork`` geopackage path
(``HYFeaturesNetwork.py:33-120,369-520``) without geopandas: a GeoPackage
is SQLite, and the routing layers (flowpaths, flowpath_attributes,
flowpath_edge_list, lake_attributes) are attribute tables — read directly
with the stdlib ``sqlite3``.

HYFeatures id semantics: flowpaths are ``wb-<n>``, junction points are
``nex-<n>`` (or ``tnx-``/terminal codes); the edge list chains
wb -> nex -> wb.  Lateral inflows arrive per *nexus* (NEXOUT files) and
apply to the flowpath downstream of that nexus.
"""

from __future__ import annotations

import sqlite3
from pathlib import Path

import numpy as np

from troute_tpu.io.routelink import RouteLinkData


def _num(s) -> int:
    """'wb-1234' / 'nex-77' / 'tnx-1000000' -> numeric id."""
    if isinstance(s, (int, np.integer)):
        return int(s)
    return int(str(s).split("-")[-1])


def read_geopkg(path):
    """Load routing tables from a HYFeatures geopackage.

    Returns (RouteLinkData, nexus_of_wb {wb id: upstream nexus id}).
    """
    con = sqlite3.connect(path)
    try:
        attrs = con.execute(
            "SELECT id, rl_gages, rl_NHDWaterbodyComID, MusK, MusX, n, So,"
            " ChSlp, BtmWdth, nCC, TopWdthCC, TopWdth, length_m"
            " FROM flowpath_attributes").fetchall()
        edges = con.execute(
            "SELECT id, toid FROM flowpath_edge_list").fetchall()
        try:
            lakes = con.execute(
                "SELECT id, toid, Dam_Length, ifd, LkArea, LkMxE, OrificeA,"
                " OrificeC, OrificeE, WeirC, WeirE, WeirL"
                " FROM lake_attributes").fetchall()
        except sqlite3.OperationalError:
            lakes = []
    finally:
        con.close()

    # edge maps: wb -> nex and nex -> wb
    wb_to_nex: dict[str, str] = {}
    nex_to_wb: dict[str, str] = {}
    for src, dst in edges:
        s, d = str(src), str(dst)
        if s.startswith("wb"):
            wb_to_nex[s] = d
        else:
            nex_to_wb[s] = d

    ids, down, gages = [], [], []
    chan = {k: [] for k in ("dx", "bw", "tw", "twcc", "n", "ncc", "cs",
                            "s0")}
    for (fid, rl_gages, rl_wb, musk, musx, mann, so, chslp, btmw, ncc,
         topwcc, topw, length) in attrs:
        ids.append(_num(fid))
        nex = wb_to_nex.get(str(fid))
        ds_wb = nex_to_wb.get(nex) if nex else None
        down.append(_num(ds_wb) if ds_wb else 0)
        gages.append(str(rl_gages).strip()
                     if rl_gages not in (None, "", "None") else "")
        chan["dx"].append(length or 1.0)
        chan["bw"].append(btmw or 1.0)
        chan["tw"].append(topw or 3.0)
        chan["twcc"].append(topwcc or 9.0)
        chan["n"].append(mann or 0.05)
        chan["ncc"].append(ncc or 0.1)
        chan["cs"].append(chslp or 1.0)
        chan["s0"].append(max(so or 1e-4, 1e-5))

    wb = np.full(len(ids), -9999, np.int64)
    rl = RouteLinkData(
        ids=np.asarray(ids, np.int64),
        downstream=np.asarray(down, np.int64),
        channel={k: np.asarray(v, np.float32) for k, v in chan.items()},
        waterbody=wb, waterbody_null=-9999,
        gages=np.asarray(gages, dtype=object),
        alt=None)

    nexus_of_wb = {}
    for nex, wb_id in nex_to_wb.items():
        nexus_of_wb[_num(wb_id)] = _num(nex)
    # wb -> its DOWNSTREAM nexus (the reference's output-mask nexus_dict
    # groups flowpaths by toid, HYFeaturesNetwork.py:450)
    wb_downstream_nexus = {_num(w): _num(nx) for w, nx in wb_to_nex.items()}
    return rl, nexus_of_wb, wb_downstream_nexus


def read_lake_attributes(path):
    """Lake parameter table from the geopackage, in the reference's
    levelpool column order.  Returns (lake_ids [M], params [M, 9])."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT id, LkArea, LkMxE, OrificeA, OrificeC, OrificeE,"
            " WeirC, WeirE, WeirL, ifd FROM lake_attributes").fetchall()
    except sqlite3.OperationalError:
        rows = []
    finally:
        con.close()
    if not rows:
        return np.zeros(0, np.int64), np.zeros((0, 9))
    lake_ids = np.asarray([_num(r[0]) for r in rows], np.int64)
    params = np.asarray([[float(x or 0.0) for x in r[1:]] for r in rows])
    return lake_ids, params


def read_qlat_nexout(files, segment_ids, nexus_of_wb, binary_folder=None):
    """qlat [n_files, N] from NEXOUT CSVs: each file has one time column of
    nexus discharges; a nexus's flow becomes lateral inflow to the
    flowpath directly downstream of it.

    ``binary_folder``: when set, the per-file CSVs are converted once into
    one parquet table keyed by file stem and reread from there on
    subsequent runs (reference ``nex_files_to_binary``,
    hyfeature_network_utilities.py:452 — NEXOUT csv parsing dominates
    repeat-run forcing time at scale).
    """
    import pandas as pd

    segment_ids = np.asarray(segment_ids, np.int64)
    nex_col = np.asarray(
        [nexus_of_wb.get(int(s), -1) for s in segment_ids], np.int64)

    frames = None
    if binary_folder is not None:
        from pathlib import Path
        binary_folder = Path(binary_folder)
        binary_folder.mkdir(parents=True, exist_ok=True)
        cache = binary_folder / "nexout.parquet"
        stems = [Path(f).name for f in files]
        if cache.exists():
            tbl = pd.read_parquet(cache)
            if all(s in tbl.columns for s in stems):
                frames = {s: tbl[s] for s in stems}
        if frames is None:
            cols = {}
            for f in files:
                df = pd.read_csv(f, index_col=0)
                cols[Path(f).name] = df.iloc[:, 0]
            tbl = pd.DataFrame(cols)
            tbl.to_parquet(cache)
            frames = cols

    out = np.zeros((len(files), segment_ids.size), np.float32)
    for t, f in enumerate(files):
        if frames is not None:
            from pathlib import Path
            series = frames[Path(f).name]
        else:
            df = pd.read_csv(f, index_col=0)
            series = df.iloc[:, 0]
        vals = series.reindex(nex_col).to_numpy(np.float64)
        out[t] = np.where(np.isfinite(vals), vals, 0.0)
    return out
