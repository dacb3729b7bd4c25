"""Scalar reference network simulator (test oracle).

Replays the reference's Cython network time loop
(``mc_reach.pyx:compute_network_structured``, ``:492-800``) in slow scalar
Python on top of the scalar kernel oracles: reach-by-reach traversal in
topological order, within-reach upstream chaining, junction summation,
levelpool reservoirs, and gage nudging — the semantics the vectorized
engine must reproduce.
"""

from __future__ import annotations

import math

import numpy as np

from troute_tpu.network import graph
from reference_impl import (gl_da_ref, hybrid_da_ref, levelpool_ref,
                            muskingum_cunge_ref, rfc_da_ref)


def simulate_reference(conn, chan, q0, depth0, qlat, nts, dt,
                       qts_subdivisions=1, assume_short_ts=False,
                       reservoirs=None, gages=None, dtype=np.float64):
    """Simulate the network with reference semantics.

    Args:
        conn: downstream connections dict (waterbodies already collapsed)
        chan: {node_id: dict(dx, bw, tw, twcc, n, ncc, cs, s0)}
        q0, depth0: {node_id: float} initial flow / depth (reservoir rows:
            initial outflow / initial elevation)
        qlat: {node_id: array[n_cols]} lateral inflow columns
        reservoirs: {lake_id: dict(params..., elev0)} levelpool params with
            keys area, max_depth, orifice_area, orifice_coeff, orifice_elev,
            weir_coeff, weir_elev, weir_length, dam_length, elev0
        gages: optional dict(rows=[node ids], obs=array[nts+1, n_gages],
            lastobs_val=[...], lastobs_time=[...], decay_coeff=float)

    Returns:
        fvd: {node_id: array[nts+1, 3]} — row 0 is the initial condition
        nudge: array[nts+1, n_gages]
    """
    reservoirs = reservoirs or {}
    rconn = graph.reverse_network(conn)
    # with DA active the reference breaks reaches at gages too, so a gage is
    # always a reach tail (split_at_gages_waterbodies_and_junctions)
    gage_nodes = set(gages["rows"]) if gages else None
    reaches = graph.dfs_reach_decomposition(
        rconn, keep_going=graph.break_at_junction(
            rconn, gage_nodes=gage_nodes, waterbody_nodes=set(reservoirs)))

    fvd = {i: np.zeros((nts + 1, 3), dtype) for i in conn}
    for i in conn:
        fvd[i][0, 0] = q0.get(i, 0.0)
        fvd[i][0, 2] = depth0.get(i, 0.0)

    elev = {k: float(v["elev0"]) for k, v in reservoirs.items()}
    da_state = {}
    for k, v in reservoirs.items():
        wtype = v.get("wbody_type", 1)
        if wtype in (2, 3):
            da_state[k] = dict(persisted=np.nan, update_time=0.0,
                               p_idx=0.0, p_ut=0.0)
        elif wtype in (4, 5):
            da_state[k] = dict(ts_idx=int(v.get("ts_idx0", 0)),
                               update_time=float(v.get("update_time0", 0.0)))
        elif wtype == 6:
            da_state[k] = dict(assim_out=np.nan, assim_time=0.0,
                               update_time=0.0)

    n_gages = len(gages["rows"]) if gages else 0
    nudge = np.zeros((nts + 1, n_gages), dtype)
    lastobs_val = np.array(gages["lastobs_val"], dtype) if gages else np.zeros(0)
    lastobs_time = np.array(gages["lastobs_time"], dtype) if gages else np.zeros(0)
    gage_of_node = {}
    if gages:
        for gi, node in enumerate(gages["rows"]):
            gage_of_node[node] = gi

    for t in range(1, nts + 1):
        for reach in reaches:
            head = reach[0]
            ups = rconn[head]
            upstream_flows = sum(fvd[u][t, 0] for u in ups)
            prev_upstream = sum(fvd[u][t - 1, 0] for u in ups)
            if assume_short_ts:
                upstream_flows = prev_upstream

            if head in reservoirs:
                assert len(reach) == 1, "reservoir reaches are singletons"
                p = reservoirs[head]
                wtype = p.get("wbody_type", 1)
                elev_prev = elev[head]
                lp_out, lp_elev = levelpool_ref(
                    elev_prev, upstream_flows, upstream_flows, 0.0, dt,
                    p["area"], p["weir_elev"], p["max_depth"],
                    p["weir_coeff"], p["weir_length"], p["dam_length"],
                    p["orifice_elev"], p["orifice_coeff"],
                    p["orifice_area"], dtype=dtype)
                out, new_elev = lp_out, lp_elev
                now = t * dt
                if wtype in (2, 3):
                    st = da_state[head]
                    (out, st["persisted"], new_elev, st["update_time"],
                     st["p_idx"], st["p_ut"]) = hybrid_da_ref(
                        p["obs"], p["obs_time"], now, st["persisted"],
                        st["p_ut"], st["p_idx"], lp_out, upstream_flows,
                        dt, p["area"], p["max_depth"], p["orifice_elev"],
                        elev_prev, 48.0, st["update_time"])
                elif wtype in (4, 5):
                    st = da_state[head]
                    (out, new_elev, st["update_time"],
                     st["ts_idx"]) = rfc_da_ref(
                        p["use_rfc"], p["series"], st["ts_idx"],
                        p["total_counts"], dt, now, st["update_time"],
                        p["da_step"], p["persist_seconds"], wtype,
                        upstream_flows, elev_prev, lp_out, lp_elev,
                        p["area"] * 1e6, p["max_depth"])
                elif wtype == 6:
                    st = da_state[head]
                    (out, st["assim_out"], st["assim_time"],
                     st["update_time"]) = gl_da_ref(
                        p["obs"], p["obs_time"], st["assim_out"],
                        st["assim_time"], st["update_time"], now,
                        p["month_idx"], p["climatology"])
                    new_elev = elev_prev
                elev[head] = new_elev
                depth_out = 0.0 if wtype == 6 else new_elev
                fvd[head][t] = (out, 0.0, depth_out)
            else:
                qup = prev_upstream
                quc = upstream_flows
                for seg in reach:
                    c = chan[seg]
                    ql = qlat[seg][(t - 1) // qts_subdivisions]
                    qdp = fvd[seg][t - 1, 0]
                    depthp = fvd[seg][t - 1, 2]
                    qdc, velc, depthc, ck, cn, x = muskingum_cunge_ref(
                        dt, qup, quc, qdp, ql, c["dx"], c["bw"], c["tw"],
                        c["twcc"], c["n"], c["ncc"], c["cs"], c["s0"],
                        depthp, dtype=dtype)
                    fvd[seg][t] = (qdc, velc, depthc)
                    qup = qdp
                    quc = qdp if assume_short_ts else qdc

            # gage nudging after the reach completes (gage == reach tail)
            tail = reach[-1]
            gi = gage_of_node.get(tail)
            if gi is not None:
                obs_arr = gages["obs"]
                target = (obs_arr[t, gi] if t < obs_arr.shape[0]
                          else math.nan)
                model = fvd[tail][t, 0]
                if t < obs_arr.shape[0] and not math.isnan(target):
                    replaced = target
                    ndg = target - model
                    lastobs_time[gi] = t * dt
                    lastobs_val[gi] = target
                elif math.isnan(target) and math.isnan(lastobs_val[gi]):
                    replaced = model
                    ndg = 0.0
                else:
                    minutes = (t * dt - lastobs_time[gi]) / 60.0
                    weight = math.exp(abs(minutes) / -gages["decay_coeff"])
                    ndg = (lastobs_val[gi] - model) * weight
                    replaced = model + ndg
                fvd[tail][t, 0] = replaced
                nudge[t, gi] = ndg

    return fvd, nudge
