"""Network assembly: config + domain files -> device-ready arrays.

The array-first equivalent of the reference's ``NHDNetwork`` construction
(``NHDNetwork.py:117-345`` + ``AbstractNetwork.__init__``): read RouteLink,
apply the domain mask, collapse waterbodies to lake nodes, build the
columnar topology, assemble channel/reservoir parameter arrays and the gage
crosswalk, and resolve warm-start state.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from troute_tpu.config.schema import Config
from troute_tpu.io.routelink import (RouteLinkData, read_lakeparm,
                                     read_routelink)
from troute_tpu.io.restart import (
    read_wrf_hydro_channel_restart, read_wrf_hydro_waterbody_restart)
from troute_tpu.network import graph
from troute_tpu.network.topology import (
    NODE_RESERVOIR, RoutingTopology, build_topology)


@dataclass
class BuiltNetwork:
    """Everything the engine needs, in topology row order."""

    topo: RoutingTopology
    chan: dict                   # {dx..s0: float32 [N]} (lake rows: benign)
    res_params: np.ndarray       # [n_res, 9] levelpool params incl. ifd col 8
    res_elev0: np.ndarray        # [n_res] initial water elevation
    res_outflow0: np.ndarray     # [n_res] initial outflow
    q0: np.ndarray               # [N] initial flow (qd0)
    qu0: np.ndarray              # [N] initial upstream flow (legacy)
    depth0: np.ndarray           # [N] initial depth / lake elevation
    gage_rows: np.ndarray        # int32 [n_gages] topo rows with gages
    gage_ids: np.ndarray         # str  [n_gages]
    lake_crosswalk: dict         # lake id -> outlet segment id
    segment_rows: np.ndarray     # rows that are MC segments
    nexus_of_wb: dict | None = None   # HYFeatures: wb id -> upstream nexus
    wb_downstream_nexus: dict | None = None  # HYFeatures: wb id -> downstream nexus
    hyf_da: object | None = None      # HYFeatures: HyfDAInfo gage crosswalks

    @property
    def n_nodes(self):
        return self.topo.n_nodes


def build_network(cfg: Config, base: Path,
                  exclude_ids=None) -> BuiltNetwork:
    """``exclude_ids``: segment ids carved out of the MC domain (the
    diffusive mainstem — reference ``AbstractRouting.update_routing_domain``,
    ``AbstractRouting.py:209-327``).

    Preprocessing cache: with
    ``network_topology_parameters.preprocessing_parameters`` the assembled
    network is pickled to / restored from disk (reference
    ``preprocess.py:534-590`` semantics), skipping graph construction on
    warm starts.
    """
    import pickle

    base = Path(base)
    ntp = cfg.network_topology_parameters
    pp = getattr(ntp, "preprocessing_parameters", None)
    cache_path = None
    if pp is not None and (pp.use_preprocessed_data or pp.preprocess_only) \
            and (pp.preprocess_output_folder or pp.preprocess_source_file):
        if pp.use_preprocessed_data and pp.preprocess_source_file:
            src_path = base / pp.preprocess_source_file
            if src_path.exists():
                with open(src_path, "rb") as f:
                    return pickle.load(f)
        cache_path = base / (pp.preprocess_output_folder or ".") \
            / f"{pp.preprocess_output_filename}.pkl"
        if pp.use_preprocessed_data and cache_path.exists():
            with open(cache_path, "rb") as f:
                return pickle.load(f)
    sp = ntp.supernetwork_parameters
    wbp = ntp.waterbody_parameters

    columns = sp.columns.model_dump() if sp.columns else None
    mask_ids = None
    if sp.mask_file_path:
        mask_ids = np.loadtxt(base / sp.mask_file_path, dtype=np.int64,
                              ndmin=1)
    geo = base / sp.geo_file_path
    nexus_of_wb = None
    wb_ds_nexus = None
    hyf_da = None
    is_hyfeatures = str(geo).endswith(".gpkg")
    if is_hyfeatures:
        from troute_tpu.network.hyfeatures import read_geopkg
        rl, nexus_of_wb, wb_ds_nexus, hyf_da = read_geopkg(geo, columns)
        if mask_ids is not None:
            keep = np.isin(rl.ids, mask_ids)
            rl = RouteLinkData(
                ids=rl.ids[keep], downstream=rl.downstream[keep],
                channel={k: v[keep] for k, v in rl.channel.items()},
                waterbody=rl.waterbody[keep],
                waterbody_null=rl.waterbody_null, gages=rl.gages[keep],
                alt=None)
    else:
        rl = read_routelink(geo, columns, mask_ids)
    if sp.synthetic_wb_segments:
        # disambiguate synthetic coastal reservoir segment ids
        # (reference AbstractNetwork.set_synthetic_wb_segments:425-441:
        # only the key column is offset)
        ids = rl.ids.copy()
        fix = np.isin(ids, np.asarray(sp.synthetic_wb_segments, np.int64))
        ids[fix] = ids[fix] + np.int64(sp.synthetic_wb_id_offset)
        rl = RouteLinkData(ids=ids, downstream=rl.downstream,
                           channel=rl.channel, waterbody=rl.waterbody,
                           waterbody_null=rl.waterbody_null, gages=rl.gages,
                           alt=rl.alt)
    if exclude_ids is not None:
        keep = ~np.isin(rl.ids, np.asarray(list(exclude_ids), np.int64))
        rl = RouteLinkData(
            ids=rl.ids[keep], downstream=rl.downstream[keep],
            channel={k: v[keep] for k, v in rl.channel.items()},
            waterbody=rl.waterbody[keep], waterbody_null=rl.waterbody_null,
            gages=rl.gages[keep],
            alt=rl.alt[keep] if rl.alt is not None else None)

    # waterbody mapping (only when simulating waterbodies)
    waterbodies: dict[int, int] = {}
    lake_params = None
    if wbp.break_network_at_waterbodies and wbp.level_pool:
        lp_file = wbp.level_pool.level_pool_waterbody_parameter_file_path
        if is_hyfeatures:
            from troute_tpu.io.routelink import LakeParmData
            from troute_tpu.network.hyfeatures import read_lake_attributes
            lids, parms, outlet_wb = read_lake_attributes(
                base / (lp_file or sp.geo_file_path))
            if outlet_wb is not None:
                # new-format lakes layer: hl_link lake ids with the outlet
                # wb flowpath in 'id'; lake ids colliding with segment ids
                # get the reference's synthetic offset
                # (HYFeaturesNetwork.py:477-504)
                seg_set = set(int(s) for s in rl.ids)
                remap = {int(l): (int(l) + int(9.99e11)
                                  if int(l) in seg_set else int(l))
                         for l in lids}
                lids = np.asarray([remap[int(l)] for l in lids], np.int64)
                if hyf_da is not None:
                    # DA crosswalks are keyed by lake id too — follow the
                    # same synthetic offset or assemble_reservoir_da's
                    # type_of/gage_of lookups (keyed by topo node id)
                    # silently miss offset lakes
                    rekey = lambda d: {remap.get(int(k), int(k)): v
                                       for k, v in d.items()}
                    hyf_da = hyf_da._replace(
                        usgs_lake_gage=rekey(hyf_da.usgs_lake_gage),
                        usace_lake_gage=rekey(hyf_da.usace_lake_gage),
                        rfc_lake_gage=rekey(hyf_da.rfc_lake_gage))
                known = set(lids.tolist())
                for lk, wb_seg in outlet_wb.items():
                    lk = remap.get(int(lk), int(lk))
                    if lk in known and int(wb_seg) in seg_set:
                        waterbodies[int(wb_seg)] = lk
                # member segments via the waterbody attribute column
                wb_mask = rl.waterbody != rl.waterbody_null
                for seg, lake in zip(rl.ids[wb_mask], rl.waterbody[wb_mask]):
                    lk = remap.get(int(lake), int(lake))
                    if lk in known:
                        waterbodies[int(seg)] = lk
            else:
                known = set(lids.tolist())
                # old-format gpkg lakes are flowpaths themselves
                # (wb id == lake id)
                for seg in rl.ids:
                    if int(seg) in known:
                        waterbodies[int(seg)] = int(seg)
            lake_params = LakeParmData(lake_ids=lids, params=parms)
        else:
            wb_mask = rl.waterbody != rl.waterbody_null
            lake_ids_in_domain = set(
                np.unique(rl.waterbody[wb_mask]).tolist())
            lake_params = read_lakeparm(
                base / lp_file, wbp.level_pool.level_pool_waterbody_id,
                lake_ids_in_domain)
            known = set(lake_params.lake_ids.tolist())
            for seg, lake in zip(rl.ids[wb_mask], rl.waterbody[wb_mask]):
                if int(lake) in known:
                    waterbodies[int(seg)] = int(lake)

    # connections with terminal handling: explicit terminal code plus
    # off-domain pointers
    terminals = {sp.terminal_code} | (
        set(rl.downstream.tolist()) - set(rl.ids.tolist()))
    conn = graph.extract_connections(rl.ids.tolist(), rl.downstream.tolist(),
                                     terminals)
    lake_crosswalk: dict = {}
    if waterbodies:
        conn, lake_crosswalk = graph.replace_waterbodies(conn, waterbodies)

    # columnar topology from the collapsed graph
    node_ids = np.fromiter(conn.keys(), np.int64, len(conn))
    down = np.full(node_ids.size, -9999, np.int64)
    for i, nid in enumerate(node_ids):
        dsts = conn[int(nid)]
        if dsts:
            down[i] = dsts[0]
    lake_set = set(lake_crosswalk)
    node_type = np.array(
        [NODE_RESERVOIR if int(i) in lake_set else 0 for i in node_ids],
        np.int8)
    # postorder rows: nearly every edge lands at row displacement 1, so
    # the engine's banded upstream-sum plan covers the network with a few
    # masked shifts instead of a latency-bound gather (upstream_plan.py)
    topo = build_topology(node_ids, down, node_type,
                          terminal_codes=(-9999,), on_cycle="drop",
                          row_order="postorder")

    n = topo.n_nodes
    row_of = topo.index_of
    seg_pos = {int(s): k for k, s in enumerate(rl.ids)}

    # channel parameters in row order (benign defaults on lake rows)
    chan = {k: np.ones(n, np.float32) for k in
            ("dx", "bw", "tw", "twcc", "n", "ncc", "cs", "s0")}
    for k in chan:
        src = rl.channel[k]
        for nid in node_ids:
            p = seg_pos.get(int(nid))
            if p is not None:
                chan[k][row_of[int(nid)]] = src[p]

    # reservoir parameter block in topo.reservoir_rows order
    res_rows = topo.reservoir_rows
    n_res = res_rows.size
    res_params = np.ones((max(n_res, 1), 9), np.float64)
    if n_res and lake_params is not None:
        lake_pos = {int(i): k for k, i in enumerate(lake_params.lake_ids)}
        for slot, row in enumerate(res_rows):
            lake_id = int(topo.ids[row])
            res_params[slot] = lake_params.params[lake_pos[lake_id]]

    # initial conditions (cold start default)
    q0 = np.zeros(n, np.float32)
    qu0 = np.zeros(n, np.float32)
    depth0 = np.zeros(n, np.float32)
    res_elev0 = np.full(max(n_res, 1), np.nan, np.float32)
    res_outflow0 = np.zeros(max(n_res, 1), np.float32)

    rp = cfg.compute_parameters.restart_parameters
    if rp.lite_channel_restart_file:
        from troute_tpu.io.restart import read_lite_restart
        df = read_lite_restart(base / rp.lite_channel_restart_file)
        for sid, r_ in df.iterrows():
            r = row_of.get(int(sid))
            if r is not None:
                qu0[r] = r_.get("qu0", 0.0)
                q0[r] = r_.get("qd0", 0.0)
                depth0[r] = r_.get("h0", 0.0)
    if rp.lite_waterbody_restart_file and n_res:
        from troute_tpu.io.restart import read_lite_restart
        df = read_lite_restart(base / rp.lite_waterbody_restart_file)
        lake_slot = {int(topo.ids[r]): s for s, r in enumerate(res_rows)}
        for lid, r_ in df.iterrows():
            s = lake_slot.get(int(lid))
            if s is not None:
                res_elev0[s] = r_.get("h0", np.nan)
                res_outflow0[s] = r_.get("qd0", 0.0)
    if rp.wrf_hydro_channel_restart_file:
        ids_r, qu, qd, h = read_wrf_hydro_channel_restart(
            base / rp.wrf_hydro_channel_restart_file,
            base / (rp.wrf_hydro_channel_ID_crosswalk_file
                    or sp.geo_file_path))
        for i, sid in enumerate(ids_r):
            r = row_of.get(int(sid))
            if r is not None:
                qu0[r], q0[r], depth0[r] = qu[i], qd[i], h[i]
    if rp.wrf_hydro_waterbody_restart_file and n_res:
        lids, resht, qlakeo = read_wrf_hydro_waterbody_restart(
            base / rp.wrf_hydro_waterbody_restart_file,
            base / (rp.wrf_hydro_waterbody_ID_crosswalk_file or ""))
        lake_slot = {int(topo.ids[r]): s for s, r in enumerate(res_rows)}
        for i, lid in enumerate(lids):
            s = lake_slot.get(int(lid))
            if s is not None:
                res_elev0[s] = resht[i]
                res_outflow0[s] = qlakeo[i]

    # cold-start elevation where no restart value
    # (reference levelpool_structs.c:97-106)
    if n_res:
        cold = (res_params[:n_res, 4]
                + (res_params[:n_res, 1] - res_params[:n_res, 4])
                * res_params[:n_res, 8])
        nanmask = ~np.isfinite(res_elev0[:n_res])
        res_elev0[:n_res] = np.where(nanmask, cold, res_elev0[:n_res])
        # engine convention: lake rows carry outflow/elevation in q/depth
        for s, r in enumerate(res_rows):
            q0[r] = res_outflow0[s]
            depth0[r] = res_elev0[s]

    # gage crosswalk (segments only; reaches split at gages happens
    # implicitly at node granularity)
    gage_rows, gage_ids = [], []
    for k, sid in enumerate(rl.ids):
        g = rl.gages[k]
        if g and int(sid) in row_of:
            gage_rows.append(row_of[int(sid)])
            gage_ids.append(g)

    seg_rows = np.flatnonzero(topo.node_type == 0).astype(np.int32)

    built = BuiltNetwork(
        topo=topo, chan=chan, res_params=res_params,
        res_elev0=res_elev0, res_outflow0=res_outflow0,
        q0=q0, qu0=qu0, depth0=depth0,
        gage_rows=np.asarray(gage_rows, np.int32),
        gage_ids=np.asarray(gage_ids, dtype=object),
        lake_crosswalk=lake_crosswalk, segment_rows=seg_rows,
        nexus_of_wb=nexus_of_wb,
        wb_downstream_nexus=wb_ds_nexus, hyf_da=hyf_da)
    if cache_path is not None:
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump(built, f)
    return built
