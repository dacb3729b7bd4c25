"""Command-line simulation driver.

Equivalent of the reference CLI orchestrator
(``troute-nwm/src/nwm_routing/__main__.py:main_v04``): parse the YAML
control file, build the network, assemble forcing run sets, run routing
with warm-state hand-off between sets, apply data assimilation, and emit
outputs — `python -m troute_tpu -f config.yaml`.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np
import pandas as pd

LOG = logging.getLogger("troute_tpu")


def build_forcing_sets(files, dt, qts_subdivisions, nts, max_loop_size_hrs):
    """Group qlat forcing files into run sets (reference
    ``AbstractNetwork.build_forcing_sets``, ``AbstractNetwork.py:742``)."""
    steps_per_file = qts_subdivisions
    files_per_set = max(
        1, int(max_loop_size_hrs * 3600 / (dt * steps_per_file)))
    total_steps = 0
    sets = []
    for i in range(0, len(files), files_per_set):
        chunk = files[i:i + files_per_set]
        n_steps = len(chunk) * steps_per_file
        if nts and total_steps + n_steps > nts:
            n_steps = nts - total_steps
            if n_steps <= 0:
                break
        sets.append({"qlat_files": chunk, "nts": n_steps})
        total_steps += n_steps
        if nts and total_steps >= nts:
            break
    return sets


def assemble_gage_da(cfg, built, base, t0, nts, dt, dtype):
    """Streamflow-nudging inputs from TimeSlice folders, or None."""
    import jax.numpy as jnp
    from troute_tpu.io.timeslice import get_obs_from_timeslices
    from troute_tpu.routing.engine import GageDA

    dap = cfg.compute_parameters.data_assimilation_parameters
    sda = dap.streamflow_da
    if not (sda and sda.streamflow_nudging and dap.usgs_timeslices_folder):
        return None
    if built.gage_rows.size == 0:
        return None

    folder = base / dap.usgs_timeslices_folder
    lookback = pd.Timedelta(hours=dap.timeslice_lookback_hours or 24)
    files = sorted(folder.glob("*.usgsTimeSlice.ncdf"))

    def _ts(f):
        return pd.to_datetime(f.name.split(".")[0],
                              format="%Y-%m-%d_%H:%M:%S")
    files = [f for f in files
             if t0 - lookback <= _ts(f) <= t0 + pd.Timedelta(seconds=nts * dt)]
    if not files:
        LOG.warning("streamflow DA enabled but no TimeSlice files in window")
        return None

    obs_df = get_obs_from_timeslices(
        built.gage_ids, files, qc_threshold=dap.qc_threshold or 1.0,
        interpolation_limit=dap.interpolation_limit_min or 59,
        frequency_secs=dt, t0=t0, nts=nts)
    if obs_df.empty:
        return None

    n_g = built.gage_rows.size
    obs = np.full((nts + 1, n_g), np.nan, np.float32)
    gage_pos = {g: i for i, g in enumerate(built.gage_ids)}
    for gage, row in obs_df.iterrows():
        gi = gage_pos.get(str(gage))
        if gi is None:
            continue
        vals = row.to_numpy(np.float64)
        m = min(vals.size, nts + 1)
        obs[:m, gi] = vals[:m]

    return GageDA(
        rows=jnp.asarray(built.gage_rows),
        obs=jnp.asarray(obs, dtype),
        lastobs_val=jnp.full((n_g,), jnp.nan, dtype),
        lastobs_time=jnp.full((n_g,), jnp.nan, dtype),
        decay_coeff=120.0)


def main_v04(argv=None) -> dict:
    """Run a full simulation; returns a results dict (also used by tests)."""
    import jax
    import jax.numpy as jnp
    from troute_tpu.config import load_config
    from troute_tpu.io.forcing import read_qlat_chrtout
    from troute_tpu.io.output import (
        write_chanobs_nc, write_flowveldepth_csv, write_lakeout_nc,
        write_lastobs_nc, write_stream_output_nc)
    from troute_tpu.network.builder import build_network
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route,
        route_stepped)

    parser = argparse.ArgumentParser(prog="troute_tpu")
    parser.add_argument("-f", "--custom-input-file", dest="config",
                        required=True)
    parser.add_argument("-V4", "--v4", action="store_true", default=True,
                        help="v4 config schema (default and only version)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    task_times = {"network_time": 0.0, "forcing_time": 0.0,
                  "route_time": 0.0, "output_time": 0.0}
    main_start = time.time()

    base = Path(args.config).parent
    cfg = load_config(args.config)
    fp = cfg.compute_parameters.forcing_parameters
    rp = cfg.compute_parameters.restart_parameters
    dt = float(fp.dt)
    qts = int(fp.qts_subdivisions)
    nts = int(fp.nts or 0)
    t0 = pd.to_datetime(rp.start_datetime, format="%Y-%m-%d_%H:%M") \
        if rp.start_datetime else pd.Timestamp("2000-01-01")

    # ---- network construction ----
    t_start = time.time()
    hyb = None
    exclude = None
    hp = cfg.compute_parameters.hybrid_parameters
    if hp.run_hybrid_routing and hp.diffusive_domain:
        # the diffusive solver runs in double precision like the reference
        jax.config.update("jax_enable_x64", True)
        from troute_tpu.routing.hybrid import HybridDomain
        hyb = HybridDomain(cfg, base)
        exclude = hyb.mainstem_set
        LOG.info("hybrid routing: %d mainstem segments in %d reaches",
                 len(hyb.mainstem_set), hyb.n_reaches)
    built = build_network(cfg, base, exclude_ids=exclude)
    topo = built.topo
    net = network_arrays_from_topology(topo, need_levels=False)
    dtype = jnp.float32
    cp = ChannelParams(**{k: jnp.asarray(v, dtype)
                          for k, v in built.chan.items()})
    lp = LevelpoolParams.from_array(jnp.asarray(built.res_params, dtype))
    task_times["network_time"] = time.time() - t_start
    LOG.info("network: %d nodes, %d waterbodies, %d gages (%.1fs)",
             built.n_nodes, topo.reservoir_rows.size, built.gage_rows.size,
             task_times["network_time"])

    # ---- forcing run sets ----
    t_start = time.time()
    qlat_folder = base / fp.qlat_input_folder
    pattern = (fp.qlat_file_pattern_filter or "*CHRTOUT_DOMAIN1").strip("*")
    files = sorted(f for f in qlat_folder.iterdir() if pattern in f.name)
    run_sets = build_forcing_sets(files, dt, qts, nts, fp.max_loop_size)
    task_times["forcing_time"] += time.time() - t_start

    # ---- data assimilation ----
    total_nts = sum(r["nts"] for r in run_sets)
    da = assemble_gage_da(cfg, built, base, t0, total_nts, dt, dtype)

    # ---- run-set loop with warm-state hand-off ----
    q0 = jnp.asarray(built.q0, dtype)
    d0 = jnp.asarray(built.depth0, dtype)
    elev0 = jnp.asarray(built.res_elev0, dtype)
    all_fvd = []
    step_offset = 0
    for s, run in enumerate(run_sets):
        t_start = time.time()
        ql = read_qlat_chrtout(run["qlat_files"], topo.ids)
        task_times["forcing_time"] += time.time() - t_start

        set_da = da
        if da is not None and step_offset:
            set_da = da._replace(obs=da.obs[step_offset:])
        t_start = time.time()
        rcfg = RoutingConfig(
            dt=dt, nts=run["nts"], qts_subdivisions=qts,
            assume_short_ts=cfg.compute_parameters.assume_short_ts,
            return_courant=cfg.compute_parameters.return_courant)
        out = route(net, cp, lp, rcfg, q0, d0, elev0,
                    jnp.asarray(ql, dtype), set_da)
        state = out["state"]
        q0, d0, elev0 = state.q, state.depth, state.res_elev
        if da is not None:
            da = da._replace(lastobs_val=state.lastobs_val,
                             lastobs_time=state.lastobs_time)
        all_fvd.append(np.asarray(out["flowveldepth"]))
        task_times["route_time"] += time.time() - t_start
        step_offset += run["nts"]
        LOG.info("run set %d/%d: %d steps (%.1fs)", s + 1, len(run_sets),
                 run["nts"], task_times["route_time"])

    fvd = np.concatenate(all_fvd) if all_fvd else np.zeros((0, built.n_nodes, 3))

    # ---- diffusive mainstem routing (hybrid coupling) ----
    diffusive_out = None
    if hyb is not None and fvd.shape[0]:
        t_start = time.time()
        from troute_tpu.diffusive.solver import initialize_state, run_diffusive
        from troute_tpu.io.forcing import read_qlat_chrtout

        total_steps = fvd.shape[0]
        # tributary MC flows at the boundary segments (prepend t0 state)
        trib_rows = np.array([topo.index_of[s] for s in hyb.trib_segments],
                             np.int64)
        trib_q = np.concatenate([
            built.q0[trib_rows][None, :],
            fvd[:, trib_rows, 0]])                      # [nts+1, n_trib]

        # mainstem lateral inflows straight from the forcing files
        all_files = [f for r in run_sets for f in r["qlat_files"]]
        ms_ids = np.asarray(sorted(hyb.mainstem_set), np.int64)
        ql_ms = read_qlat_chrtout(all_files, ms_ids)    # [n_files, M]
        qlat_rows = {int(s): ql_ms[:, k] for k, s in enumerate(ms_ids)}

        dom = hyb.build_diffusive_domain(
            qlat_rows, dt_qlat=dt * qts, trib_q=trib_q, dt_trib=dt,
            dtini=dt)
        q_init = jnp.asarray(
            np.maximum(np.broadcast_to(
                trib_q[0].sum() / max(dom.n_reaches, 1),
                (dom.n_reaches, dom.n_cols)), 0.1), jnp.float64)
        dst = initialize_state(dom, q_init, dtini_min=dt / 10.0)
        dst, saves = run_diffusive(dom, dst, t_final=total_steps * dt,
                                   save_interval=dt)
        q_seg, d_seg = hyb.saves_to_segments(saves, dom)
        diffusive_out = {"ids": np.asarray(list(q_seg.keys()), np.int64),
                         "q": np.stack(list(q_seg.values()), axis=1),
                         "depth": np.stack(list(d_seg.values()), axis=1)}
        task_times["route_time"] += time.time() - t_start
        LOG.info("diffusive mainstem: %d reaches, %d saves",
                 hyb.n_reaches, len(saves))

    # ---- outputs ----
    t_start = time.time()
    op = cfg.output_parameters
    written = []
    if op.csv_output and op.csv_output.get("csv_output_folder"):
        out_dir = base / op.csv_output["csv_output_folder"]
        out_dir.mkdir(parents=True, exist_ok=True)
        p = out_dir / f"flowveldepth_{t0.strftime('%Y%m%d%H%M')}.csv"
        written.append(write_flowveldepth_csv(p, topo.ids, fvd, t0, dt))
    if op.stream_output and op.stream_output.stream_output_directory:
        out_dir = base / op.stream_output.stream_output_directory
        out_dir.mkdir(parents=True, exist_ok=True)
        p = out_dir / f"troute_output_{t0.strftime('%Y%m%d%H%M')}.nc"
        written.append(write_stream_output_nc(p, topo.ids, fvd, t0, dt))
    if op.chanobs_output and op.chanobs_output.chanobs_output_directory \
            and built.gage_rows.size:
        out_dir = base / op.chanobs_output.chanobs_output_directory
        out_dir.mkdir(parents=True, exist_ok=True)
        p = out_dir / f"chanobs_{t0.strftime('%Y%m%d%H%M')}.nc"
        written.append(write_chanobs_nc(
            p, built.gage_ids, topo.ids[built.gage_rows],
            fvd[:, built.gage_rows], t0, dt))
    if op.lakeout_output and topo.reservoir_rows.size:
        out_dir = base / str(op.lakeout_output)
        out_dir.mkdir(parents=True, exist_ok=True)
        res_rows = topo.reservoir_rows
        p = out_dir / f"lakeout_{t0.strftime('%Y%m%d%H%M')}.nc"
        written.append(write_lakeout_nc(
            p, topo.ids[res_rows], np.asarray(q0)[res_rows],
            np.asarray(elev0), np.zeros(res_rows.size), t0))
    task_times["output_time"] = time.time() - t_start

    task_times["total_time"] = time.time() - main_start
    if cfg.log_parameters.showtiming:
        tt = task_times
        print("troute_tpu timing summary")
        print(f"  network build : {tt['network_time']:.2f} s")
        print(f"  forcing       : {tt['forcing_time']:.2f} s")
        print(f"  routing       : {tt['route_time']:.2f} s")
        print(f"  output        : {tt['output_time']:.2f} s")
        print(f"  total         : {tt['total_time']:.2f} s")

    return {"fvd": fvd, "ids": topo.ids, "built": built,
            "task_times": task_times, "written": written,
            "diffusive": diffusive_out,
            "final_state": (np.asarray(q0), np.asarray(d0),
                            np.asarray(elev0))}
