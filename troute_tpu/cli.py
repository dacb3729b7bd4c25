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
import re
import time
from pathlib import Path

import numpy as np
import pandas as pd

LOG = logging.getLogger("troute_tpu")


def _file_stamp(path):
    """Model time encoded in a forcing filename (``202108231300.CHRTOUT_…``
    / ``202108231300NEXOUT…`` — the reference derives run-set file lists
    from these stamps, ``AbstractNetwork.py:856-869``), or None."""
    m = re.match(r"(\d{12})", Path(path).name)
    if not m:
        return None
    try:
        return pd.to_datetime(m.group(1), format="%Y%m%d%H%M")
    except ValueError:
        return None


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

    # warm-start lastobs state from a nudgingLastObs file if provided
    lo_val = np.full(n_g, np.nan, np.float64)
    lo_time = np.full(n_g, np.nan, np.float64)
    if sda.lastobs_file:
        from troute_tpu.io.restart import read_lastobs_file
        gids, disch, offs = read_lastobs_file(base / sda.lastobs_file)
        pos = {g: i for i, g in enumerate(gids)}
        for gi, g in enumerate(built.gage_ids):
            k = pos.get(str(g))
            if k is not None and np.isfinite(disch[k]) \
                    and disch[k] > -9000 and np.isfinite(offs[k]):
                lo_val[gi] = disch[k]
                lo_time[gi] = offs[k]

    return GageDA(
        rows=jnp.asarray(built.gage_rows),
        obs=jnp.asarray(obs, dtype),
        lastobs_val=jnp.asarray(lo_val, dtype),
        lastobs_time=jnp.asarray(lo_time, dtype),
        decay_coeff=float(dap.da_decay_coefficient))


def assemble_reservoir_da(cfg, built, base, t0, nts, dt, dtype):
    """Reservoir persistence/RFC DA inputs from the reservoir parameter
    file + TimeSlice folders (reference ``PersistenceDA.__init__`` +
    ``_prep_reservoir_da_dataframes``), or None when disabled."""
    import jax.numpy as jnp
    from troute_tpu.io.netcdf import NetCDFFile
    from troute_tpu.io.timeslice import get_obs_from_timeslices
    from troute_tpu.ops.reservoir_da import HybridDAState
    from troute_tpu.routing.engine import ReservoirDAData

    from troute_tpu.network.gl_constants import (
        GL_CANADA_GAGES, GL_USGS_GAGES, GREAT_LAKE_IDS)

    dap = cfg.compute_parameters.data_assimilation_parameters
    rda = dap.reservoir_da
    if rda is None:
        return None
    pda = rda.reservoir_persistence_da
    use_usgs = bool(pda and pda.reservoir_persistence_usgs)
    use_usace = bool(pda and pda.reservoir_persistence_usace)
    use_gl = bool(pda and pda.reservoir_persistence_greatLake)
    rfc = rda.reservoir_rfc_da
    use_rfc = bool(rfc and rfc.reservoir_rfc_forecasts)
    if not (use_usgs or use_usace or use_rfc or use_gl):
        return None
    # usgs/usace/rfc typing comes from the parameter file (NHD) or the
    # geopackage-derived crosswalks (HYFeatures); the Great Lakes are
    # identified by their hardcoded ids (reference great_lake class
    # needs no parameter file, DataAssimilation.py:710)
    hyf_da = getattr(built, "hyf_da", None)
    if not rda.reservoir_parameter_file and not use_gl and hyf_da is None:
        return None
    res_rows = built.topo.reservoir_rows
    n_res = res_rows.size
    if n_res == 0:
        return None

    type_of, gage_of, rfc_gage_of = {}, {}, {}
    if rda.reservoir_parameter_file:
        usgs_gage_f = (pda.crosswalk_usgs_gage_field
                       if pda else "usgs_gage_id")
        usace_gage_f = (pda.crosswalk_usace_gage_field
                        if pda else "usace_gage_id")
        usgs_lake_f = (getattr(pda, "crosswalk_usgs_lakeID_field", None)
                       or "usgs_lake_id") if pda else "usgs_lake_id"
        usace_lake_f = (getattr(pda, "crosswalk_usace_lakeID_field", None)
                        or "usace_lake_id") if pda else "usace_lake_id"
        with NetCDFFile(base / rda.reservoir_parameter_file) as f:
            lake_ids = f.read("lake_id").astype(np.int64)
            res_type = f.read("reservoir_type").astype(np.int32)
            usgs_lakes = f.read(usgs_lake_f).astype(np.int64)
            usgs_gages = f.read_strings(usgs_gage_f)
            usace_lakes = f.read(usace_lake_f).astype(np.int64)
            usace_gages = f.read_strings(usace_gage_f)
            rfc_lakes = f.read("rfc_lake_id").astype(np.int64)
            rfc_gages = f.read_strings("rfc_gage_id")
        type_of = dict(zip(lake_ids.tolist(), res_type.tolist()))
        if use_usgs:
            gage_of.update({int(l): g for l, g in zip(usgs_lakes, usgs_gages)})
        if use_usace:
            gage_of.update({int(l): g
                            for l, g in zip(usace_lakes, usace_gages)})
        rfc_gage_of = {int(l): g for l, g in zip(rfc_lakes, rfc_gages)}
    elif hyf_da is not None:
        # HYFeatures: types/gages derived from the geopackage itself
        # (HYFeaturesNetwork.preprocess_data_assimilation:606-703).  Order
        # matters: USGS type 2 overwrites USACE type 3 for lakes carrying
        # both designations, and RFC type 4 last (reference :683-699)
        if use_usace:
            for lk, g in hyf_da.usace_lake_gage.items():
                type_of[int(lk)] = 3
                gage_of[int(lk)] = g
        if use_usgs:
            for lk, g in hyf_da.usgs_lake_gage.items():
                type_of[int(lk)] = 2
                gage_of[int(lk)] = g
        if use_rfc:
            for lk, g in hyf_da.rfc_lake_gage.items():
                type_of[int(lk)] = 4
                rfc_gage_of[int(lk)] = g

    wtypes = np.ones(n_res, np.int32)
    res_gages = {}
    rfc_slots = {}
    gl_lakes = {}
    for slot, row in enumerate(res_rows):
        lk = int(built.topo.ids[row])
        if use_gl and lk in GREAT_LAKE_IDS:
            wtypes[slot] = 6
            gl_lakes[slot] = lk
            continue
        t = type_of.get(lk, 1)
        if (t == 2 and use_usgs) or (t == 3 and use_usace):
            wtypes[slot] = t
            if lk in gage_of:
                res_gages[slot] = gage_of[lk]
        elif t in (4, 5) and use_rfc and lk in rfc_gage_of:
            wtypes[slot] = t
            rfc_slots[slot] = rfc_gage_of[lk]

    # assemble gage observations at 15-min resolution on [0, nts*dt]
    obs_freq = 900.0
    n_obs = int(nts * dt / obs_freq) + 1
    obs = np.full((n_res, n_obs), np.nan, np.float32)
    obs_time = np.arange(n_obs) * obs_freq
    lookback = pd.Timedelta(hours=dap.timeslice_lookback_hours or 24)

    def _window_files(folder, pattern):
        """TimeSlice files within [t0 - lookback, t0 + run length]."""
        if not folder:
            return []
        files = sorted((base / folder).glob(pattern))
        return [f for f in files
                if t0 - lookback
                <= pd.to_datetime(f.name.split(".")[0],
                                  format="%Y-%m-%d_%H:%M:%S")
                <= t0 + pd.Timedelta(seconds=nts * dt)]

    def _collect(folder, pattern, slots):
        if not slots:
            return
        files = _window_files(folder, pattern)
        if not files:
            return
        gids = np.asarray([res_gages[s] for s in slots])
        df = get_obs_from_timeslices(
            gids, files, qc_threshold=dap.qc_threshold or 1.0,
            interpolation_limit=dap.interpolation_limit_min or 59,
            frequency_secs=obs_freq, t0=t0, nts=n_obs - 1)
        if df.empty:
            return
        for slot in slots:
            g = res_gages[slot]
            if g in df.index:
                vals = df.loc[g].to_numpy(np.float64)[:n_obs]
                obs[slot, :vals.size] = vals

    usgs_slots = [s for s, g in res_gages.items() if wtypes[s] == 2]
    usace_slots = [s for s, g in res_gages.items() if wtypes[s] == 3]
    _collect(dap.usgs_timeslices_folder, "*.usgsTimeSlice.ncdf", usgs_slots)
    _collect(dap.usace_timeslices_folder, "*.usaceTimeSlice.ncdf",
             usace_slots)

    # RFC forecast series (reference preprocess_RFC_data)
    rfc_fields = {}
    if rfc_slots:
        from troute_tpu.io.rfc import preprocess_rfc_data
        from troute_tpu.ops.reservoir_da import RfcDAState
        loaded = {}
        for slot, gage in rfc_slots.items():
            r = preprocess_rfc_data(
                t0, rfc.reservoir_rfc_forecasts_offset_hours, gage,
                base / rfc.reservoir_rfc_forecasts_time_series_path, dt)
            if r is not None:
                loaded[slot] = r
            else:
                wtypes[slot] = 1    # no file -> plain levelpool
        if loaded:
            n_counts = max(r["series"].size for r in loaded.values())
            series = np.zeros((n_res, n_counts))
            counts = np.zeros(n_res, np.int32)
            userfc = np.zeros(n_res, bool)
            step = np.full(n_res, 3600.0)
            idx0 = np.zeros(n_res, np.int32)
            ut0 = np.zeros(n_res)
            for slot, r in loaded.items():
                series[slot, :r["series"].size] = r["series"]
                counts[slot] = r["total_counts"]
                userfc[slot] = r["use_rfc"]
                step[slot] = r["time_step_seconds"]
                idx0[slot] = r["timeseries_idx"]
                ut0[slot] = r["update_time"]
            rfc_fields = dict(
                rfc_series=jnp.asarray(series, dtype),
                rfc_counts=jnp.asarray(counts),
                rfc_use=jnp.asarray(userfc),
                rfc_timestep=jnp.asarray(step, dtype),
                rfc_persist_seconds=jnp.full(
                    n_res, rfc.reservoir_rfc_forecast_persist_days * 86400.0,
                    dtype),
                rfc_state0=RfcDAState(
                    timeseries_idx=jnp.asarray(idx0),
                    update_time=jnp.asarray(ut0, dtype)))

    # Great Lakes: obs from TimeSlice gages / Lake Ontario CSV with the
    # hardcoded monthly climatology as fallback (reference _create_GL_dfs)
    gl_fields = {}
    if gl_lakes:
        from troute_tpu.da_assembly import assemble_gl_inputs
        lake_gages = {}
        for lk in gl_lakes.values():
            if lk in GL_USGS_GAGES:
                lake_gages[lk] = GL_USGS_GAGES[lk]
            elif lk in GL_CANADA_GAGES:
                lake_gages[lk] = GL_CANADA_GAGES[lk]
        ontario = (base / dap.LakeOntario_outflow
                   if dap.LakeOntario_outflow
                   and 4800007 in gl_lakes.values() else None)
        gdata = assemble_gl_inputs(
            lake_gages, t0,
            usgs_files=_window_files(dap.usgs_timeslices_folder,
                                     "*.usgsTimeSlice.ncdf"),
            canada_files=_window_files(dap.canada_timeslices_folder,
                                       "*.wscTimeSlice.ncdf"),
            lake_ontario_csv=ontario)
        n_gobs = max([1] + [v.size for v, _, _ in gdata.values()])
        g_obs = np.full((n_res, n_gobs), np.nan)
        g_time = np.zeros((n_res, n_gobs))
        g_clim = np.zeros((n_res, 12))
        for slot, lk in gl_lakes.items():
            if lk not in gdata:
                continue
            v, tt, clim = gdata[lk]
            g_obs[slot, :v.size] = v
            g_time[slot, :tt.size] = tt
            g_clim[slot] = clim
        gl_fields = dict(gl_obs=jnp.asarray(g_obs, dtype),
                         gl_obs_time=jnp.asarray(g_time, dtype),
                         gl_climatology=jnp.asarray(g_clim, dtype))

    base_da = ReservoirDAData.inactive(n_res, nts, dtype)
    months = pd.date_range(t0, periods=nts + 1,
                           freq=pd.Timedelta(seconds=dt)).month - 1
    return base_da._replace(
        wbody_type=jnp.asarray(wtypes),
        hybrid_obs=jnp.asarray(obs, dtype),
        hybrid_obs_time=jnp.asarray(obs_time, dtype),
        hybrid_state0=HybridDAState(
            persisted_outflow=jnp.full(n_res, jnp.nan, dtype),
            update_time=jnp.zeros(n_res, dtype),
            persistence_index=jnp.zeros(n_res, dtype),
            persistence_update_time=jnp.zeros(n_res, dtype)),
        month_idx=jnp.asarray(np.asarray(months), jnp.int32),
        **rfc_fields, **gl_fields)


def _configure_logging(cfg, base):
    """Apply ``log_parameters`` (reference ``log_level_set``,
    nwm_routing/log_level_set.py:6-46): root level from ``log_level``,
    optional file handler + pre-run parameter dump under
    ``log_directory``."""
    lp = cfg.log_parameters
    level = getattr(logging, str(lp.log_level or "DEBUG").upper(),
                    logging.DEBUG)
    # level applies to this package's loggers; the root logger is only
    # touched when a log file is requested (keeps library use quiet)
    logging.getLogger("troute_tpu").setLevel(level)
    log_dir = getattr(lp, "log_directory", None)
    if not log_dir:
        return
    log_dir = base / str(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(log_dir / "troute_tpu.log")
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s"))
    logging.getLogger().addHandler(handler)
    # pre-run parameter dump (reference compute_log_mc "kernelTalks.log",
    # compute.py:298-506)
    cp = cfg.compute_parameters
    with open(log_dir / "kernelTalks.log", "w") as f:
        f.write("troute_tpu pre-run parameters\n")
        f.write(f"compute_kernel: {cp.compute_kernel}\n")
        f.write(f"parallel_compute_method: {cp.parallel_compute_method}\n")
        f.write(f"assume_short_ts: {cp.assume_short_ts}\n")
        f.write(f"return_courant: {cp.return_courant}\n")
        fp = cp.forcing_parameters
        f.write(f"dt: {fp.dt}\nnts: {fp.nts}\n"
                f"qts_subdivisions: {fp.qts_subdivisions}\n")
        hp = cp.hybrid_parameters
        f.write(f"run_hybrid_routing: {hp.run_hybrid_routing}\n")
        f.write(f"run_refactored_network: {hp.run_refactored_network}\n")


def main_v04(argv=None) -> dict:
    """Run a full simulation; returns a results dict (also used by tests)."""
    import jax
    import jax.numpy as jnp
    from troute_tpu.config import load_config
    from troute_tpu.io.forcing import read_qlat_chrtout
    from troute_tpu.io.output import (
        write_chanobs_nc, write_flowveldepth_csv, write_lakeout_nc,
        write_lastobs_nc)
    from troute_tpu.network.builder import build_network
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology, route,
        route_stepped)

    parser = argparse.ArgumentParser(prog="troute_tpu")
    parser.add_argument("-f", "--custom-input-file", dest="config",
                        required=True)
    parser.add_argument("-V4", "--v4", action="store_true", default=True,
                        help="v4 config schema (default)")
    parser.add_argument("-V3", "--v3", action="store_true",
                        help="accept a v3-era YAML (the permissive schema "
                             "reads v3 keys; reference test_AnA.yaml runs "
                             "unmodified)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("-a", "--async-io", action="store_true",
                        help="overlap run-set forcing reads with routing "
                             "(see forcing_parameters.async_prefetch)")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    task_times = {"network_time": 0.0, "forcing_time": 0.0,
                  "route_time": 0.0, "output_time": 0.0}
    main_start = time.time()

    base = Path(args.config).parent
    # -V3 engages reference-exact v3 key normalization; without it, v3
    # keys still map but with a logged warning (schema.load_config)
    cfg = load_config(args.config, v3=True if args.v3 else None)
    _configure_logging(cfg, base)
    fp = cfg.compute_parameters.forcing_parameters
    if args.async_io:
        fp.async_prefetch = True
    rp = cfg.compute_parameters.restart_parameters
    dt = float(fp.dt)
    qts = int(fp.qts_subdivisions)
    nts = int(fp.nts or 0)
    if rp.start_datetime:
        s = str(rp.start_datetime).replace("_", " ")
        t0 = pd.to_datetime(s)
    else:
        t0 = pd.Timestamp("2000-01-01")

    # ---- network construction ----
    t_start = time.time()
    hyb = None
    exclude = None
    hp = cfg.compute_parameters.hybrid_parameters
    hp_dtype_str, hp_nel = hp.resolved_diffusive()
    if hp.run_hybrid_routing and hp.diffusive_domain:
        if hp_dtype_str == "float64":
            # reference-precision diffusive needs x64 (the f32 TPU fast
            # path must NOT enable it: stray f64 scalars would leak into
            # the 32-bit MC Pallas kernel, which Mosaic rejects)
            jax.config.update("jax_enable_x64", True)
        from troute_tpu.routing.hybrid import HybridDomain
        hyb = HybridDomain(cfg, base)
        exclude = hyb.mainstem_set
        LOG.info("hybrid routing: %d mainstem segments in %d reaches",
                 len(hyb.mainstem_set), hyb.n_reaches)
        if hp.run_refactored_network and hp.refactored_domain \
                and hp.refactored_topobathy_domain:
            n_r = hyb.load_refactored(base / hp.refactored_domain,
                                      base / hp.refactored_topobathy_domain)
            LOG.info("refactored diffusive network: %d reaches", n_r)
        elif hp.use_natl_xsections and hp.topobathy_domain:
            n_nat = hyb.load_topobathy(base / hp.topobathy_domain)
            LOG.info("natural cross sections at %d nodes", n_nat)
        coastal_nc = fp.coastal_boundary_input_file
        if hp.coastal_boundary_domain and coastal_nc:
            nc_p = base / coastal_nc
            dom_p = base / hp.coastal_boundary_domain
            if nc_p.exists() and dom_p.exists():
                ok = hyb.load_coastal_boundary(nc_p, dom_p, t0)
                LOG.info("coastal downstream boundary: %s",
                         "active (dsbc_option=1)" if ok
                         else "no covered tailwater, using normal depth")
            else:
                LOG.warning("coastal boundary files missing (%s, %s); "
                            "falling back to normal-depth boundary",
                            nc_p, dom_p)
    built = build_network(cfg, base, exclude_ids=exclude)
    pp = cfg.network_topology_parameters.preprocessing_parameters
    if pp and pp.preprocess_only:
        # build + cache the network, then stop (reference
        # preprocess.py:509-533 early exit)
        LOG.info("preprocess_only: network cached, exiting")
        return {"fvd": np.zeros((0, built.n_nodes, 3)),
                "ids": np.asarray(built.topo.ids), "built": built,
                "task_times": task_times, "written": [], "parity": None,
                "courant": None, "diffusive": None, "final_state": None}
    topo = built.topo
    # the level-scan strict form needs the wavefront schedule; short-ts
    # and the fixed-point strict form don't
    need_levels = (not cfg.compute_parameters.assume_short_ts
                   and not bool(getattr(cfg.compute_parameters,
                                        "strict_iterative", False)))
    net = network_arrays_from_topology(topo, need_levels=need_levels)
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
    nexus_mode = built.nexus_of_wb is not None and bool(
        fp.nexus_input_folder or fp.qlat_input_folder)
    explicit_sets = getattr(fp, "qlat_forcing_sets", None)
    # no forcing folder at all -> single-CSV / constant qlat fallback
    # (reference NHDNetwork.build_qlateral_array, NHDNetwork.py:388-397)
    fileless_mode = (not explicit_sets and not fp.qlat_input_folder
                     and not fp.nexus_input_folder)
    if fileless_mode:
        nexus_mode = False
        run_sets = [{"qlat_files": [], "nts": int(nts or qts)}]
        task_times["forcing_time"] += time.time() - t_start
    elif explicit_sets:
        # pre-listed run sets (reference AbstractNetwork.py:747: the
        # forcing_parameters may enumerate qlat_files/nts per set)
        src_folder = fp.qlat_input_folder or fp.nexus_input_folder
        folder = base / src_folder if src_folder else base
        run_sets = [{"qlat_files": [folder / Path(f).name
                                    for f in s["qlat_files"]],
                     "nts": int(s.get("nts",
                                      len(s["qlat_files"]) * qts))}
                    for s in explicit_sets]
        task_times["forcing_time"] += time.time() - t_start
    elif nexus_mode:
        qlat_folder = base / (fp.nexus_input_folder or fp.qlat_input_folder)
        nex_pattern = getattr(fp, "nexus_file_pattern_filter",
                              None) or "*NEXOUT*"
        pattern = str(nex_pattern).strip("*")
    else:
        qlat_folder = base / fp.qlat_input_folder
        pattern = (fp.qlat_file_pattern_filter or "*CHRTOUT_DOMAIN1").strip("*")
    if not explicit_sets and not fileless_mode:
        files = sorted(f for f in qlat_folder.iterdir()
                       if pattern in f.name)
        # the reference derives the file list FROM t0 (filenames at
        # t0 + n*dt_qlat, AbstractNetwork.py:856-869) — a folder may hold
        # earlier hours (e.g. when resuming mid-folder from a restart);
        # drop files stamped before the start time
        if rp.start_datetime and files:
            in_window = [f for f in files if _file_stamp(f) is None
                         or _file_stamp(f) >= t0]
            if in_window and len(in_window) < len(files):
                LOG.info("forcing window: %d/%d files at or after %s",
                         len(in_window), len(files), t0)
                files = in_window
        run_sets = build_forcing_sets(files, dt, qts, nts,
                                      fp.max_loop_size)
        task_times["forcing_time"] += time.time() - t_start

    # ---- data assimilation ----
    total_nts = sum(r["nts"] for r in run_sets)
    da = assemble_gage_da(cfg, built, base, t0, total_nts, dt, dtype)
    res_da = assemble_reservoir_da(cfg, built, base, t0, total_nts, dt,
                                   dtype)
    if res_da is not None:
        n_hyb = int((np.asarray(res_da.wbody_type) > 1).sum())
        LOG.info("reservoir DA: %d hybrid-persistence reservoirs", n_hyb)

    # ---- run-set loop with warm-state hand-off ----
    q0 = jnp.asarray(built.q0, dtype)
    d0 = jnp.asarray(built.depth0, dtype)
    elev0 = jnp.asarray(built.res_elev0, dtype)
    all_fvd = []
    all_nudge = []
    all_courant = []
    shard_ctx = None   # (mesh, partition) once parallel_compute_method=sharded
    op = cfg.output_parameters
    written = []
    step_offset = 0
    def read_forcing(run):
        if not run["qlat_files"]:
            # qlat_input_file CSV or qlat_const constant (reference
            # NHDNetwork.py:388-397); short CSVs repeat their last row,
            # matching the engine's hold-last-forcing semantics
            n_rows = max(1, -(-run["nts"] // qts))
            if fp.qlat_input_file:
                from troute_tpu.io.forcing import read_qlat_csv
                ql = read_qlat_csv(base / fp.qlat_input_file, topo.ids)
                if ql.shape[0] < n_rows:
                    ql = np.concatenate(
                        [ql, np.repeat(ql[-1:], n_rows - ql.shape[0], 0)])
                return ql[:n_rows]
            return np.full((n_rows, topo.ids.size),
                           float(fp.qlat_const), np.float32)
        if nexus_mode:
            from troute_tpu.network.hyfeatures import read_qlat_nexout
            binary_dir = getattr(fp, "binary_nexus_file_folder", None)
            return read_qlat_nexout(run["qlat_files"], topo.ids,
                                    built.nexus_of_wb,
                                    binary_folder=(base / str(binary_dir)
                                                   if binary_dir else None))
        return read_qlat_chrtout(
            run["qlat_files"], topo.ids,
            index_col=fp.qlat_file_index_col,
            value_col=fp.qlat_file_value_col,
            gw_bucket_col=fp.qlat_file_gw_bucket_flux_col,
            runoff_col=fp.qlat_file_terrain_runoff_col)

    # async IO: read the NEXT run set's forcing on a worker thread while
    # the current set routes — the pipelining the reference's
    # main_v03_async did with asyncio executors (__main__.py:1995-2115)
    prefetch_pool = None
    next_forcing = None
    if getattr(fp, "async_prefetch", False) and len(run_sets) > 1:
        from concurrent.futures import ThreadPoolExecutor
        prefetch_pool = ThreadPoolExecutor(max_workers=1)

    for s, run in enumerate(run_sets):
        t_start = time.time()
        if next_forcing is not None:
            ql = next_forcing.result()
        else:
            ql = read_forcing(run)
        if prefetch_pool is not None and s + 1 < len(run_sets):
            next_forcing = prefetch_pool.submit(read_forcing,
                                                run_sets[s + 1])
        else:
            next_forcing = None
        task_times["forcing_time"] += time.time() - t_start

        set_da = da
        if da is not None and step_offset:
            set_da = da._replace(obs=da.obs[step_offset:])
        set_res_da = res_da
        if res_da is not None and step_offset:
            # re-base observation/update clocks to this run set's t0
            # (reference hand-off: mc_reach.pyx:822-836 subtracts the
            # elapsed seconds from all DA update-time state)
            off = step_offset * dt
            set_res_da = res_da._replace(
                hybrid_obs_time=res_da.hybrid_obs_time - off,
                gl_obs_time=res_da.gl_obs_time - off,
                month_idx=res_da.month_idx[step_offset:])
        t_start = time.time()
        ck = str(cfg.compute_parameters.compute_kernel).lower()
        if ck == "auto":
            # driver auto-selection by domain size (docs/USAGE.md):
            # small domains want the in-scan XLA engine (ONE dispatch
            # per run set — host-stepped dispatches dominate wall time
            # on a remote TPU: measured 288 ms/step on the Laura
            # hybrid), CONUS-scale domains want the host-stepped Pallas
            # block kernel (per-block secant early exit + banded plan)
            kernel = ("pallas" if topo.n_nodes >= 200_000
                      and jax.default_backend() != "cpu" else "xla")
        else:
            kernel = "pallas" if ck in ("pallas", "tpu") else "xla"
        rcfg = RoutingConfig(
            dt=dt, nts=run["nts"], qts_subdivisions=qts,
            assume_short_ts=cfg.compute_parameters.assume_short_ts,
            return_courant=cfg.compute_parameters.return_courant,
            kernel=kernel,
            strict_iterative=bool(getattr(cfg.compute_parameters,
                                          "strict_iterative", False)),
            strict_sweep_chunk=int(getattr(cfg.compute_parameters,
                                           "strict_sweep_chunk", 16)),
            strict_accel=getattr(cfg.compute_parameters,
                                 "strict_accel", "auto"),
            strict_accel_lin=int(getattr(cfg.compute_parameters,
                                         "strict_accel_lin", 8)),
            strict_accel_chunk=int(getattr(cfg.compute_parameters,
                                           "strict_accel_chunk", 8)))
        pcm = str(cfg.compute_parameters.parallel_compute_method or "")
        if pcm == "sharded" \
                and (rcfg.assume_short_ts or rcfg.strict_iterative) \
                and not rcfg.return_courant and len(jax.devices()) > 1:
            # multi-device domain decomposition (no reference analog —
            # its joblib pool is single-node, SURVEY §2.4): partition
            # once, then route each run set over the device mesh with
            # ppermute halo exchange
            from jax.sharding import Mesh
            from troute_tpu.parallel.partition import (
                balanced_assignment, partition_network)
            from troute_tpu.parallel.sharded_engine import (
                route_sharded_global)
            if shard_ctx is None:
                devs = jax.devices()
                part0 = partition_network(
                    topo, len(devs), balanced_assignment(topo, len(devs)))
                shard_ctx = (Mesh(np.array(devs), ("basin",)), part0)
                LOG.info("sharded routing: %d devices, %d nodes/device, "
                         "%d cut edges, %d exchange rounds", len(devs),
                         part0.n_local, part0.cut_edges,
                         part0.perm_pairs.shape[0])
            mesh_s, part_s = shard_ctx
            out = route_sharded_global(
                mesh_s, topo, built.chan, built.res_params, rcfg,
                np.asarray(q0), np.asarray(d0), np.asarray(elev0),
                np.asarray(ql, np.float64), da=set_da,
                res_da=set_res_da, part=part_s, dtype=dtype)
        elif kernel == "pallas" and (rcfg.assume_short_ts
                                     or rcfg.strict_iterative):
            # Pallas cannot live inside lax.scan (remote-compiler hang);
            # the host-stepped driver (24-step unrolled dispatches in
            # short mode, host-polled fixed-point sweeps in strict mode)
            # is the production TPU path
            out = route_stepped(net, cp, lp, rcfg, q0, d0, elev0,
                                jnp.asarray(ql, dtype), set_da, set_res_da)
        else:
            out = route(net, cp, lp, rcfg, q0, d0, elev0,
                        jnp.asarray(ql, dtype), set_da, set_res_da)
        state = out["state"]
        q0, d0, elev0 = state.q, state.depth, state.res_elev
        set_seconds = run["nts"] * dt
        if da is not None:
            da = da._replace(lastobs_val=state.lastobs_val,
                             lastobs_time=state.lastobs_time - set_seconds)
        if res_da is not None:
            hyb_state = state.hybrid._replace(
                update_time=state.hybrid.update_time - set_seconds,
                persistence_update_time=(
                    state.hybrid.persistence_update_time - set_seconds))
            rfc_state = state.rfc._replace(
                update_time=state.rfc.update_time - set_seconds)
            # Great Lakes state persists across run sets with its clocks
            # re-based, like the reference great_lake.update_after_compute
            # (DataAssimilation.py:751-791): keep assimilated outflows,
            # subtract the elapsed set seconds from the time state
            gl_state = state.gl._replace(
                assimilated_time=state.gl.assimilated_time - set_seconds,
                update_time=state.gl.update_time - set_seconds)
            res_da = res_da._replace(hybrid_state0=hyb_state,
                                     rfc_state0=rfc_state,
                                     gl_state0=gl_state)
        all_fvd.append(np.asarray(out["flowveldepth"]))
        if out.get("nudge") is not None and np.asarray(out["nudge"]).size:
            all_nudge.append(np.asarray(out["nudge"]))
        # lite restart at each run-set boundary (reference __main__.py:270)
        if op.lite_restart \
                and op.lite_restart.get("lite_restart_output_directory") \
                and s < len(run_sets) - 1:
            from troute_tpu.io.restart import write_lite_restart
            lr_dir = base / op.lite_restart["lite_restart_output_directory"]
            lr_dir.mkdir(parents=True, exist_ok=True)
            set_end = t0 + pd.Timedelta(
                seconds=(step_offset + run["nts"]) * dt)
            # reference new_q0 (AbstractNetwork.py:177-190) fills qu0 and
            # qd0 from the same final-flow column, so the restart carries
            # qu0 == qd0 — match that, not zeros
            lr_q0 = pd.DataFrame(
                {"qu0": np.asarray(q0), "qd0": np.asarray(q0),
                 "h0": np.asarray(d0)},
                index=np.asarray(topo.ids))
            lr_wb = None
            if topo.reservoir_rows.size:
                lr_wb = pd.DataFrame(
                    {"qd0": np.asarray(q0)[topo.reservoir_rows],
                     "h0": np.asarray(elev0)[:topo.reservoir_rows.size]},
                    index=np.asarray(topo.ids)[topo.reservoir_rows])
            written.extend(write_lite_restart(lr_dir, set_end, lr_q0,
                                              lr_wb))
        # per-set lastobs (reference passes lastobs_df into the output
        # generator each run set, __main__.py:319)
        lastobs_dir_set = (cfg.compute_parameters
                           .data_assimilation_parameters.streamflow_da
                           .lastobs_output_folder
                           if cfg.compute_parameters
                           .data_assimilation_parameters.streamflow_da
                           else None)
        if da is not None and lastobs_dir_set and s < len(run_sets) - 1:
            from troute_tpu.io.output import write_lastobs_nc
            lo_dir = base / lastobs_dir_set
            lo_dir.mkdir(parents=True, exist_ok=True)
            set_end = t0 + pd.Timedelta(
                seconds=(step_offset + run["nts"]) * dt)
            p = lo_dir / ("nudgingLastObs."
                          + set_end.strftime("%Y-%m-%d_%H:%M:%S") + ".nc")
            # state.lastobs_time is relative to the run set's START; the
            # file is stamped at the set END, so re-base the offsets the
            # same way the hand-off does (= da.lastobs_time)
            written.append(write_lastobs_nc(
                p, built.gage_ids,
                np.asarray(state.lastobs_time) - set_seconds,
                np.asarray(state.lastobs_val), set_end))
        if cfg.compute_parameters.return_courant \
                and out.get("courant") is not None:
            all_courant.append(np.asarray(out["courant"]))
        task_times["route_time"] += time.time() - t_start
        step_offset += run["nts"]
        LOG.info("run set %d/%d: %d steps (%.1fs)", s + 1, len(run_sets),
                 run["nts"], task_times["route_time"])

    if prefetch_pool is not None:
        prefetch_pool.shutdown(wait=False)

    fvd = np.concatenate(all_fvd) if all_fvd else np.zeros((0, built.n_nodes, 3))
    out_ids = np.asarray(topo.ids).copy()
    # waterbody rows are reported under their OUTLET link id (reference
    # _reindex_lake_to_link_id, output.py:255-256) so link-keyed outputs
    # (CHRTOUT/HYDRO_RST appends, parity) resolve them
    if built.lake_crosswalk:
        alias = {int(lk): int(out) for lk, out in built.lake_crosswalk.items()}
        for k, s in enumerate(out_ids):
            if int(s) in alias:
                out_ids[k] = alias[int(s)]

    # ---- diffusive mainstem routing (hybrid coupling) ----
    diffusive_out = None
    if hyb is not None and fvd.shape[0]:
        t_start = time.time()
        from troute_tpu.diffusive.solver import initialize_state, run_diffusive
        from troute_tpu.io.forcing import read_qlat_chrtout

        total_steps = fvd.shape[0]
        # tributary MC flows at the boundary segments (prepend t0 state)
        n_trib = len(hyb.trib_segments)
        trib_q = np.zeros((total_steps + 1, n_trib))
        missing = 0
        for k, s in enumerate(hyb.trib_segments):
            row = topo.index_of.get(int(s))
            if row is None:
                missing += 1
                continue
            trib_q[0, k] = built.q0[row]
            trib_q[1:, k] = fvd[:, row, 0]
        if missing:
            LOG.warning("%d diffusive tributaries missing from the MC "
                        "network (masked/collapsed); using zero inflow",
                        missing)

        # mainstem lateral inflows straight from the forcing files
        all_files = [f for r in run_sets for f in r["qlat_files"]]
        ms_ids = np.asarray(sorted(hyb.mainstem_set), np.int64)
        if all_files:
            ql_ms = read_qlat_chrtout(all_files, ms_ids)  # [n_files, M]
        else:
            # fileless forcing (qlat_input_file / qlat_const fallback);
            # mainstem segments are carved out of the MC topo, so align
            # by id against the CSV (or broadcast the constant) directly
            n_rows = sum(max(1, -(-r["nts"] // qts)) for r in run_sets)
            if fp.qlat_input_file:
                from troute_tpu.io.forcing import read_qlat_csv
                ql_ms = read_qlat_csv(base / fp.qlat_input_file, ms_ids)
                if ql_ms.shape[0] < n_rows:
                    ql_ms = np.concatenate(
                        [ql_ms, np.repeat(ql_ms[-1:],
                                          n_rows - ql_ms.shape[0], 0)])
                ql_ms = ql_ms[:n_rows]
            else:
                ql_ms = np.full((n_rows, ms_ids.size),
                                float(fp.qlat_const), np.float32)
        qlat_rows = {int(s): ql_ms[:, k] for k, s in enumerate(ms_ids)}

        diff_dtype = (jnp.float32 if hp_dtype_str == "float32"
                      else jnp.float64)
        groups = hyb.tailwater_groups()
        # pinned-f64 domains beyond the measured crash bound fall back
        # to the host CPU backend: f64 programs above that size FAULT
        # the tunneled TPU worker (solver.guard_f64_domain).  At or
        # below the bound, TPU f64 is kept — it is ~3x ONE CPU core at
        # R=1024 despite the emulation (measured 1.87e4 vs 5.9e3
        # seg-ts/s, 2026-08-21); the fallback is a safety valve, not a
        # speed win.
        import contextlib
        from troute_tpu.diffusive.solver import F64_OFFCPU_MAX_R
        use_batched = (str(getattr(hp, "diffusive_batching", "auto"))
                       != "never" and len(groups) > 1)
        eff_reaches = (len(groups) * max(len(g) for g in groups)
                       if use_batched else hyb.n_reaches)
        diff_on_cpu = (diff_dtype == jnp.float64
                       and jax.default_backend() != "cpu"
                       and eff_reaches > F64_OFFCPU_MAX_R)
        diff_ctx = (jax.default_device(jax.devices("cpu")[0])
                    if diff_on_cpu else contextlib.nullcontext())
        if diff_on_cpu:
            LOG.info("float64 diffusive domain (%d effective reaches) "
                     "exceeds the safe off-CPU size %d; routed to the "
                     "host CPU backend (f64 programs this large fault "
                     "the tunneled TPU worker)", eff_reaches,
                     F64_OFFCPU_MAX_R)
        q0val = float(trib_q[0].sum()) / max(hyb.n_reaches, 1)
        with diff_ctx:
            if str(getattr(hp, "diffusive_batching", "auto")) != "never" \
                    and len(groups) > 1:
                # one batch lane per tailwater tree: each runs its own
                # adaptive-dt loop, like the reference's per-domain diffnw
                from types import SimpleNamespace

                from troute_tpu.diffusive.domain import stack_domains
                from troute_tpu.diffusive.solver import (
                    initialize_state_batched, run_diffusive_batched)

                doms = [hyb.build_diffusive_domain(
                            qlat_rows, dt_qlat=dt * qts, trib_q=trib_q,
                            dt_trib=dt, dtini=dt, dtype=diff_dtype,
                            reach_idx=g, nel_uniform=hp_nel)
                        for g in groups]
                bdom = stack_domains(doms)
                B, Rb, Cb = bdom.z.shape
                q_init = jnp.maximum(
                    jnp.full((B, Rb, Cb), q0val, diff_dtype), 0.1)
                dst = initialize_state_batched(bdom, q_init,
                                               dtini_min=dt / 10.0)
                if shard_ctx is not None and not diff_on_cpu:
                    # sharded runs spread the independent tailwater lanes
                    # over the same device mesh as the MC routing
                    # (skipped for pinned f64, which stays on CPU)
                    from troute_tpu.diffusive.solver import (
                        shard_batched_domains)
                    bdom, dst, _ = shard_batched_domains(bdom, dst,
                                                         shard_ctx[0])
                dst, bsaves = run_diffusive_batched(
                    bdom, dst, t_final=total_steps * dt, save_interval=dt,
                    corrector_mode=hp.diffusive_corrector)
                # scatter lanes back into the merged [R, C] layout (every
                # group pads to the global max reach length, so lane rows
                # are already right-aligned at the merged width)
                R, C = hyb.n_reaches, Cb
                z_m = np.zeros((R, C))
                dx_m = np.ones((R, C))
                # one transfer for all groups' z/dx (per-group slices
                # cost a tunnel round trip each on remote TPU)
                zdx = np.asarray(jnp.stack([bdom.z, bdom.dx]))
                for g, gi in enumerate(groups):
                    z_m[gi] = zdx[0, g, :len(gi)]
                    dx_m[gi] = zdx[1, g, :len(gi)]
                # one stacked device->host transfer for every save (per-save
                # np.asarray costs a tunnel round trip each on remote TPU)
                qn_all, yn_all = HybridDomain._saves_to_host(bsaves)
                saves = []
                for k, (t_s, _, _) in enumerate(bsaves):
                    q_m = np.zeros((R, C))
                    y_m = np.zeros((R, C))
                    for g, gi in enumerate(groups):
                        q_m[gi] = qn_all[k, g, :len(gi)]
                        y_m[gi] = yn_all[k, g, :len(gi)]
                    saves.append((t_s, q_m, y_m))
                dom = SimpleNamespace(z=z_m, dx=dx_m, n_cols=C)
            else:
                dom = hyb.build_diffusive_domain(
                    qlat_rows, dt_qlat=dt * qts, trib_q=trib_q, dt_trib=dt,
                    dtini=dt, dtype=diff_dtype,
                    nel_uniform=hp_nel)
                q_init = jnp.maximum(
                    jnp.full((dom.n_reaches, dom.n_cols), q0val,
                             diff_dtype), 0.1)
                dst = initialize_state(dom, q_init, dtini_min=dt / 10.0)
                dst, saves = run_diffusive(
                    dom, dst, t_final=total_steps * dt, save_interval=dt,
                    corrector_mode=hp.diffusive_corrector)
        q_seg, d_seg = hyb.saves_to_segments(saves, dom)
        diffusive_out = {"ids": np.asarray(list(q_seg.keys()), np.int64),
                         "q": np.stack(list(q_seg.values()), axis=1),
                         "depth": np.stack(list(d_seg.values()), axis=1)}
        task_times["route_time"] += time.time() - t_start
        LOG.info("diffusive mainstem: %d reaches, %d saves",
                 hyb.n_reaches, len(saves))

        # merge mainstem results into the output table (reference
        # nwm_output_generator concatenates diffusive results into
        # flowveldepth, output.py:208-217)
        n_t = fvd.shape[0]
        dq = diffusive_out["q"][:n_t]
        dd = diffusive_out["depth"][:n_t]
        if dq.shape[0] < n_t:
            pad_rows = n_t - dq.shape[0]
            dq = np.concatenate([dq, np.repeat(dq[-1:], pad_rows, 0)])
            dd = np.concatenate([dd, np.repeat(dd[-1:], pad_rows, 0)])
        ms_fvd = np.stack([dq, np.zeros_like(dq), dd], axis=-1)
        fvd = np.concatenate([fvd, ms_fvd.astype(fvd.dtype)], axis=1)
        # keep the lake->outlet aliasing applied above for the MC rows
        out_ids = np.concatenate([out_ids, diffusive_out["ids"]])

    # ---- outputs ----
    t_start = time.time()
    def _subset(segments):
        """Restrict (ids, fvd) to requested segment ids (reference
        csv_output_segments / parquet_output_segments, output.py:198)."""
        if not segments:
            return out_ids, fvd
        keep = np.isin(out_ids, np.asarray(segments, np.int64))
        return out_ids[keep], fvd[:, keep]

    if op.csv_output and op.csv_output.get("csv_output_folder"):
        out_dir = base / op.csv_output["csv_output_folder"]
        out_dir.mkdir(parents=True, exist_ok=True)
        p = out_dir / f"flowveldepth_{t0.strftime('%Y%m%d%H%M')}.csv"
        sub_ids, sub_fvd = _subset(op.csv_output.get("csv_output_segments"))
        written.append(write_flowveldepth_csv(p, sub_ids, sub_fvd, t0, dt))
        if all_courant:
            # reference writes courant_*.csv beside the fvd csv when
            # return_courant is on (output.py:452-470)
            cour = np.concatenate(all_courant)
            cdf = pd.DataFrame(
                cour.transpose(1, 0, 2).reshape(cour.shape[1], -1),
                # same row keys as the fvd csv: waterbody rows under
                # their outlet link id
                index=out_ids[:cour.shape[1]],
                columns=[(t, v) for t in range(cour.shape[0])
                         for v in ("cn", "ck", "X")])
            pc = out_dir / f"courant_{t0.strftime('%Y%m%d%H%M')}.csv"
            cdf.to_csv(pc)
            written.append(pc)
    if op.test_output:
        # pickle of the full flowveldepth DataFrame in the reference's
        # test frame shape: index = segment ids (lakes under outlet link
        # ids), flat (timestep, 'q'|'v'|'d') tuple columns
        # (output.py:320-322, qvd_columns :209-211)
        tp = base / op.test_output
        tp.parent.mkdir(parents=True, exist_ok=True)
        tdf = pd.DataFrame(
            fvd.transpose(1, 0, 2).reshape(fvd.shape[1], -1),
            index=out_ids,
            columns=[(t, v) for t in range(fvd.shape[0])
                     for v in ("q", "v", "d")])
        tdf.to_pickle(tp)
        written.append(tp)
    if op.stream_output and op.stream_output.stream_output_directory:
        import yaml as _yaml

        from troute_tpu.io.output import write_stream_output
        so = op.stream_output
        mask_list = None
        mask_path = getattr(so, "mask_output", None)
        if mask_path and (base / str(mask_path)).exists():
            with open(base / str(mask_path)) as f:
                mask_list = _yaml.safe_load(f)
        nexus_members = None
        if built.wb_downstream_nexus:
            nexus_members = {}
            for wb, nx in built.wb_downstream_nexus.items():
                nexus_members.setdefault(int(nx), []).append(int(wb))
        nudge_arr = np.concatenate(all_nudge) if all_nudge else None
        written.extend(write_stream_output(
            base / so.stream_output_directory, out_ids, fvd, t0, dt,
            nudge=nudge_arr,
            nudge_ids=(topo.ids[built.gage_rows]
                       if built.gage_rows.size else None),
            output_type=so.stream_output_type or ".nc",
            file_hours=float(so.stream_output_time or 1.0),
            internal_frequency_min=so.stream_output_internal_frequency,
            mask_list=mask_list, nexus_members=nexus_members))
    if op.chanobs_output and op.chanobs_output.chanobs_output_directory \
            and built.gage_rows.size:
        out_dir = base / op.chanobs_output.chanobs_output_directory
        out_dir.mkdir(parents=True, exist_ok=True)
        # a configured chanobs_filepath is a FIXED file that consecutive
        # forecast cycles append to (reference output.py:529-542 +
        # nhd_io.write_chanobs create-or-append); otherwise one fresh
        # timestamped file per run
        if op.chanobs_output.chanobs_filepath:
            p = out_dir / op.chanobs_output.chanobs_filepath
            append = True
        else:
            p = out_dir / f"chanobs_{t0.strftime('%Y%m%d%H%M')}.nc"
            append = False
        written.append(write_chanobs_nc(
            p, built.gage_ids, topo.ids[built.gage_rows],
            fvd[:, built.gage_rows], t0, dt, append=append))
    if op.parquet_output and op.parquet_output.get("parquet_output_folder"):
        from troute_tpu.io.output import flowveldepth_dataframe
        out_dir = base / op.parquet_output["parquet_output_folder"]
        out_dir.mkdir(parents=True, exist_ok=True)
        sub_ids, sub_fvd = _subset(
            op.parquet_output.get("parquet_output_segments"))
        df = flowveldepth_dataframe(sub_ids, sub_fvd, t0, dt)
        df.columns = [f"{ts.isoformat()}_{v}" for ts, v in df.columns]
        p = out_dir / f"troute_output_{t0.strftime('%Y%m%d%H%M')}.parquet"
        df.to_parquet(p)
        written.append(p)
    if op.lite_restart and op.lite_restart.get("lite_restart_output_directory"):
        from troute_tpu.io.restart import write_lite_restart
        out_dir = base / op.lite_restart["lite_restart_output_directory"]
        out_dir.mkdir(parents=True, exist_ok=True)
        end_time = t0 + pd.Timedelta(seconds=total_nts * dt)
        # qu0 == qd0 per reference new_q0 (AbstractNetwork.py:177-190)
        q0_df = pd.DataFrame(
            {"qu0": np.asarray(q0), "qd0": np.asarray(q0),
             "h0": np.asarray(d0)},
            index=np.asarray(topo.ids))
        wb_df = None
        if topo.reservoir_rows.size:
            wb_df = pd.DataFrame(
                {"qd0": np.asarray(q0)[topo.reservoir_rows],
                 "h0": np.asarray(elev0)[:topo.reservoir_rows.size]},
                index=np.asarray(topo.ids)[topo.reservoir_rows])
        written.extend(write_lite_restart(out_dir, end_time, q0_df, wb_df))
    lastobs_dir = (cfg.compute_parameters.data_assimilation_parameters
                   .streamflow_da.lastobs_output_folder
                   if cfg.compute_parameters.data_assimilation_parameters
                   .streamflow_da else None) or op.lastobs_output
    if da is not None and lastobs_dir:
        from troute_tpu.io.output import write_lastobs_nc
        out_dir = base / lastobs_dir
        out_dir.mkdir(parents=True, exist_ok=True)
        end_time = t0 + pd.Timedelta(seconds=total_nts * dt)
        p = out_dir / ("nudgingLastObs."
                       + end_time.strftime("%Y-%m-%d_%H:%M:%S") + ".nc")
        written.append(write_lastobs_nc(
            p, built.gage_ids, np.asarray(da.lastobs_time),
            np.asarray(da.lastobs_val), end_time))
    chrto = op.chrtout_output
    if chrto and chrto.wrf_hydro_channel_output_source_folder:
        from troute_tpu.io.output import append_chrtout
        src = base / chrto.wrf_hydro_channel_output_source_folder
        files = [src / Path(f).name
                 for r in run_sets for f in r["qlat_files"]]
        files = [f for f in files if f.exists()]
        written.extend(append_chrtout(files, out_ids, fvd, qts))
    rsrto = op.wrf_hydro_restart_output or {}
    rst_src = (rsrto.get("wrf_hydro_channel_restart_source_directory")
               or rsrto.get("wrf_hydro_restart_dir"))
    if rst_src:
        from troute_tpu.io.restart import append_hydro_rst
        src = base / rst_src
        patt = rsrto.get("wrf_hydro_channel_restart_pattern_filter",
                         "HYDRO_RST.*")
        xwalk = rsrto.get("wrf_hydro_channel_ID_crosswalk_file") \
            or rp.wrf_hydro_channel_ID_crosswalk_file
        if xwalk:
            written.extend(append_hydro_rst(
                sorted(src.glob(patt)), out_ids, fvd, t0, dt,
                base / xwalk))
    if op.lakeout_output and topo.reservoir_rows.size and fvd.shape[0]:
        # one lakeout file per output hour (reference writes waterbody
        # states each qts-th step, output.py:231-258 + nhd_io:1775)
        out_dir = base / str(op.lakeout_output)
        out_dir.mkdir(parents=True, exist_ok=True)
        res_rows = topo.reservoir_rows
        up = topo.upstream[res_rows]             # [n_res, K]
        for step in range(qts - 1, fvd.shape[0], qts):
            prev_q = (fvd[step - 1, :, 0] if step > 0
                      else np.asarray(built.q0))
            vals = prev_q[np.maximum(up, 0)]
            inflow = np.where(up >= 0, vals, 0.0).sum(axis=1)
            stamp = t0 + pd.Timedelta(seconds=(step + 1) * dt)
            p = out_dir / f"{stamp.strftime('%Y%m%d%H%M')}.LAKEOUT.nc"
            written.append(write_lakeout_nc(
                p, topo.ids[res_rows], fvd[step, res_rows, 0],
                fvd[step, res_rows, 2], inflow, stamp))
    # config-driven WRF-Hydro parity check (reference
    # build_tests.parity_check, build_tests.py:163-301)
    parity_stats = None
    pc = op.wrf_hydro_parity_check or {}
    if pc.get("parity_check_input_folder") \
            and pc.get("parity_check_compare_node"):
        from troute_tpu.parity import parity_check, read_chrtout_streamflow
        node = int(pc["parity_check_compare_node"])
        patt = pc.get("parity_check_file_pattern_filter",
                      "*CHRTOUT_DOMAIN1")
        vfiles = sorted((base / pc["parity_check_input_folder"]).rglob(patt))
        vfiles = [f for f in vfiles
                  if t0 < pd.to_datetime(f.name.split(".")[0],
                                         format="%Y%m%d%H%M")
                  <= t0 + pd.Timedelta(seconds=fvd.shape[0] * dt)]
        row = {int(s): k for k, s in enumerate(out_ids)}.get(node)
        if vfiles and row is not None:
            ref_q = read_chrtout_streamflow(vfiles, [node])[:, 0]
            stamps = [pd.to_datetime(f.name.split(".")[0],
                                     format="%Y%m%d%H%M") for f in vfiles]
            steps = [int(round((s - t0).total_seconds() / dt)) - 1
                     for s in stamps]
            sim_q = fvd[np.asarray(steps), row, 0]
            parity_stats = parity_check(sim_q[:, None], ref_q[:, None],
                                        label=f"node {node}")
            LOG.info("parity check at node %d: %s", node, parity_stats)
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

    return {"fvd": fvd, "ids": out_ids, "built": built,
            "task_times": task_times, "written": written,
            "parity": parity_stats,
            "courant": (np.concatenate(all_courant)
                        if all_courant else None),
            "diffusive": diffusive_out,
            "final_state": (np.asarray(q0), np.asarray(d0),
                            np.asarray(elev0))}


async def main_v03_async(argv=None) -> dict:
    """Async-pipelined simulation entry point.

    Mirrors the intent of the reference's ``main_v03_async``
    (``__main__.py:1892-2195``): run-set forcing reads execute on worker
    threads overlapped with routing.  (In the reference the async
    dispatch is commented out, ``__main__.py:2211-2217``; here it is
    live.)  Accepts the same configs as ``main_v04`` and returns its
    results dict.
    """
    import asyncio

    loop = asyncio.get_running_loop()
    argv = list(argv or [])
    if "-a" not in argv and "--async-io" not in argv:
        argv.append("--async-io")
    return await loop.run_in_executor(None, lambda: main_v04(argv))
