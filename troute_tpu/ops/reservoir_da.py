"""Vectorized reservoir data assimilation ops.

Reproduces the reference's per-reservoir Python DA callbacks as masked
vector ops over all reservoirs at once:

* hybrid (USGS/USACE) persistence DA —
  ``fast_reach/reservoir_hybrid_da.py:55-323``
* RFC forecast DA — ``fast_reach/reservoir_RFC_da.py:196-320``
* Great Lakes climatology/persistence DA — ``fast_reach/reservoir_GL_da.py``

All observation/forecast files are pre-staged into dense arrays host-side
(the reference already marshals them this way before entering its Cython
loop, ``compute.py:142-295``); the per-timestep update is pure device math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PERSISTENCE_LIMIT = 11
UPDATE_TIME_INTERVAL = 3600.0
PERSISTENCE_UPDATE_INTERVAL = 86400.0


class HybridDAState(NamedTuple):
    """Carry state for USGS/USACE persistence DA, one lane per reservoir."""

    persisted_outflow: jax.Array        # previously persisted outflow (cms)
    update_time: jax.Array              # next obs-search time (s since t0)
    persistence_index: jax.Array        # consecutive persisted cycles (f32)
    persistence_update_time: jax.Array  # next persistence-cycle time (s)


def hybrid_persistence_da(state: HybridDAState, obs, obs_time, now,
                          levelpool_outflow, inflow, routing_period,
                          lake_area, max_depth, orifice_elevation,
                          initial_water_elevation,
                          obs_lookback_hours=48.0):
    """One DA update for all hybrid-persistence reservoirs.

    Args:
        obs: [n_res, n_obs] gage observations (NaN = missing/poor quality)
        obs_time: [n_obs] observation times, seconds relative to t0
        now: scalar model time (s since t0)
        remaining args: [n_res] vectors / scalars

    Returns (outflow, new_water_elevation, new_state).
    """
    dtype = levelpool_outflow.dtype
    n_obs = obs.shape[1]
    idxs = jnp.arange(n_obs)

    initial_storage = (initial_water_elevation - orifice_elevation) \
        * (lake_area * 1e6)
    maximum_storage = (max_depth - orifice_elevation) * (lake_area * 1e6)

    # --- observation search (branch: now >= update_time) ---
    # nearest obs time not greater than update_time, then walk back to the
    # first non-NaN value
    t_diff = state.update_time[:, None] - obs_time[None, :]
    t_idx = jnp.argmin(jnp.where(t_diff >= 0, t_diff, jnp.inf), axis=1)
    elig = (idxs[None, :] <= t_idx[:, None]) & ~jnp.isnan(obs)
    pick = jnp.max(jnp.where(elig, idxs[None, :], -1), axis=1)
    found = pick >= 0
    safe_pick = jnp.maximum(pick, 0)
    obs_val = jnp.take_along_axis(obs, safe_pick[:, None], axis=1)[:, 0]
    t_obs = obs_time[safe_pick]
    lookback = state.update_time - t_obs
    stale = lookback > obs_lookback_hours * 3600.0

    searching = now >= state.update_time
    fresh = searching & found & ~stale

    bump_cycle = now >= state.persistence_update_time

    # persisted outflow selection
    persisted = jnp.where(fresh, obs_val, state.persisted_outflow)
    # branch B: not searching, persistence cycle boundary, limit reached
    limit_hit = (~searching) & bump_cycle \
        & (state.persistence_index > PERSISTENCE_LIMIT)
    persisted = jnp.where(limit_hit, levelpool_outflow, persisted)

    # persistence index bookkeeping
    p_idx = state.persistence_index
    p_idx = jnp.where(searching & ~fresh & bump_cycle, p_idx + 1, p_idx)
    p_idx = jnp.where(fresh, 1.0, p_idx)
    p_idx = jnp.where((~searching) & bump_cycle, state.persistence_index + 1,
                      p_idx)
    p_idx = jnp.where(limit_hit, 0.0, p_idx)

    p_ut = state.persistence_update_time
    adv_cycle = (searching & ~fresh & bump_cycle) | fresh \
        | ((~searching) & bump_cycle)
    p_ut = jnp.where(adv_cycle, p_ut + PERSISTENCE_UPDATE_INTERVAL, p_ut)

    # update_time advances whenever a (even stale) observation was found
    new_update_time = jnp.where(searching & found,
                                state.update_time + UPDATE_TIME_INTERVAL,
                                state.update_time)

    # NaN persisted value -> fall back to levelpool, reset index
    nan_persist = jnp.isnan(persisted)
    outflow = jnp.where(nan_persist, levelpool_outflow, persisted)
    p_idx = jnp.where(nan_persist, 0.0, p_idx)

    # --- storage-bounds corrections (reference
    # ``_modify_for_projected_storage``, uses the UNmodified assessment
    # outflow in the projection) ---
    assess = outflow
    out2 = jnp.where(assess < 0.0, 0.0, assess)
    projected = initial_storage + (inflow - assess) * routing_period
    max_reached = projected > maximum_storage
    # (the reference's minimum-storage branch never fires: min_storage == 0)
    out2 = jnp.where(projected <= 0.0, inflow, out2)
    out2 = jnp.maximum(out2, 0.0)
    out2 = jnp.where(max_reached & (out2 < levelpool_outflow),
                     levelpool_outflow, out2)

    delta = (inflow - out2) * routing_period
    new_elev = initial_water_elevation + delta / (lake_area * 1e6)

    new_state = HybridDAState(
        persisted_outflow=persisted.astype(dtype),
        update_time=new_update_time.astype(dtype),
        persistence_index=p_idx.astype(dtype),
        persistence_update_time=p_ut.astype(dtype))
    return out2, new_elev, new_state


class RfcDAState(NamedTuple):
    timeseries_idx: jax.Array   # int32 [n_res]
    update_time: jax.Array      # f32 [n_res]


def rfc_forecast_da(state: RfcDAState, time_series, total_counts, use_rfc,
                    da_time_step, persist_seconds, reservoir_type,
                    current_time, inflow, water_elevation,
                    levelpool_outflow, levelpool_water_elevation,
                    lake_area_m2, max_water_elevation, routing_period):
    """RFC forecast reservoir DA for all RFC lanes.

    Args:
        time_series: [n_res, n_counts] RFC discharge series
        reservoir_type: [n_res] 4 (CONUS RFC) or 5 (Alaska glacier)
        lake_area_m2: surface area in m^2 (the reference converts km2->m2
            at the call site, ``mc_reach.pyx:684``)

    Returns (outflow, new_water_elevation, new_state).
    """
    n_counts = time_series.shape[1]
    idxs = jnp.arange(n_counts)

    in_window = use_rfc & (current_time <= persist_seconds)
    advance = in_window & (current_time >= state.update_time) \
        & (state.timeseries_idx < total_counts)
    ts_idx = jnp.where(advance, state.timeseries_idx + 1,
                       state.timeseries_idx)
    update_time = jnp.where(advance, state.update_time + da_time_step,
                            state.update_time)

    safe_idx = jnp.clip(ts_idx, 0, n_counts - 1)
    ts_val = jnp.take_along_axis(time_series, safe_idx[:, None], axis=1)[:, 0]
    is_conus = reservoir_type == 4
    outflow = jnp.where(is_conus, ts_val, inflow + ts_val)

    # elevation is computed from the pre-backstop outflow (reference quirk:
    # a negative series value corrected by the walk-back does NOT redo the
    # elevation update, reservoir_RFC_da.py:250-296)
    new_elev = water_elevation + ((inflow - outflow) / lake_area_m2) \
        * routing_period
    new_elev = jnp.clip(new_elev, 0.0, max_water_elevation)

    # negative-outflow backstop: walk back (indices >= 1) for a
    # non-negative series value; reference stops at index 1
    neg = outflow < 0.0
    elig = (idxs[None, :] <= safe_idx[:, None]) & (idxs[None, :] >= 1) \
        & (time_series >= 0.0)
    back = jnp.max(jnp.where(elig, idxs[None, :], -1), axis=1)
    has_back = back >= 0
    back_val = jnp.take_along_axis(time_series,
                                   jnp.maximum(back, 0)[:, None], axis=1)[:, 0]
    outflow = jnp.where(neg & has_back, back_val, outflow)
    dead = neg & ~has_back
    outflow = jnp.where(dead, jnp.where(is_conus, levelpool_outflow, inflow),
                        outflow)
    new_elev = jnp.where(dead, levelpool_water_elevation, new_elev)

    # outside window / invalid: levelpool fallback
    outflow = jnp.where(in_window, outflow,
                        jnp.where(is_conus, levelpool_outflow, inflow))
    new_elev = jnp.where(in_window, new_elev, levelpool_water_elevation)

    return outflow, new_elev, RfcDAState(
        timeseries_idx=ts_idx.astype(jnp.int32),
        update_time=update_time.astype(state.update_time.dtype))


class GreatLakesDAState(NamedTuple):
    assimilated_outflow: jax.Array   # [n_gl]
    assimilated_time: jax.Array      # [n_gl]
    update_time: jax.Array           # [n_gl]


def great_lakes_da(state: GreatLakesDAState, obs, obs_time, now, month_idx,
                   climatology, persistence_limit_days=11.0):
    """Great Lakes persistence DA (reference ``reservoir_GL_da.py:6-130``).

    Args:
        obs: [n_gl, n_obs] observations; obs_time: [n_gl, n_obs]
        month_idx: scalar int (current month - 1, computed host-side)
        climatology: [n_gl, 12] monthly climatology outflows

    Returns (outflow, new_state).
    """
    n_obs = obs.shape[1]
    idxs = jnp.arange(n_obs)
    clim = climatology[:, month_idx]

    prev = jnp.where(jnp.isnan(state.assimilated_outflow), clim,
                     state.assimilated_outflow)

    # newest observation at or before `now`
    elig = (now - obs_time) >= 0
    pick = jnp.max(jnp.where(elig, idxs[None, :], -1), axis=1)
    found = pick >= 0
    safe = jnp.maximum(pick, 0)
    obs_val = jnp.take_along_axis(obs, safe[:, None], axis=1)[:, 0]
    t_obs = jnp.take_along_axis(obs_time, safe[:, None], axis=1)[:, 0]
    good = found & ~jnp.isnan(obs_val)
    lookback = now - t_obs
    limit_s = persistence_limit_days * 86400.0

    searching = now >= state.update_time
    take_obs = searching & good & (lookback <= limit_s)
    stale_obs = searching & good & (lookback > limit_s)

    outflow = jnp.where(searching,
                        jnp.where(take_obs, obs_val,
                                  jnp.where(stale_obs, clim, prev)),
                        jnp.where((now - state.assimilated_time) > limit_s,
                                  clim, prev))

    new_state = GreatLakesDAState(
        assimilated_outflow=jnp.where(take_obs, obs_val,
                                      state.assimilated_outflow),
        assimilated_time=jnp.where(take_obs, t_obs, state.assimilated_time),
        update_time=jnp.where(take_obs,
                              state.update_time + UPDATE_TIME_INTERVAL,
                              state.update_time))
    return outflow, new_state


def typed_reservoir_dispatch(wbody_type, hybrid_obs, hybrid_obs_time,
                             hyb_in, rfc_series, rfc_counts, rfc_use,
                             rfc_timestep, rfc_persist_seconds, rfc_in,
                             gl_obs, gl_obs_time, gl_climatology, gl_in,
                             obs_lookback_hours,
                             elev_prev, inflow, lp_out, lp_elev,
                             now, month_i, area, max_depth, orifice_elev,
                             dt):
    """Per-type reservoir DA selection on [n_res] lanes (the reference's
    ``compute_type`` dispatch, mc_reach.pyx:507-717).  Shared by the
    single-chip and sharded engines so the semantics cannot diverge.

    Returns (outflow, elev, d_scatter, hyb, rfc, gl).
    """
    outflow, elev = lp_out, lp_elev
    wt = wbody_type

    h_out, h_elev, hyb_n = hybrid_persistence_da(
        hyb_in, hybrid_obs, hybrid_obs_time, now, lp_out, inflow, dt,
        area, max_depth, orifice_elev, elev_prev, obs_lookback_hours)
    is_hyb = (wt == 2) | (wt == 3)
    outflow = jnp.where(is_hyb, h_out, outflow)
    elev = jnp.where(is_hyb, h_elev, elev)
    hyb = jax.tree.map(lambda new, old: jnp.where(is_hyb, new, old),
                       hyb_n, hyb_in)

    r_out, r_elev, rfc_n = rfc_forecast_da(
        rfc_in, rfc_series, rfc_counts, rfc_use, rfc_timestep,
        rfc_persist_seconds, wt, now, inflow, elev_prev, lp_out, lp_elev,
        area * 1.0e6, max_depth, dt)
    is_rfc = (wt == 4) | (wt == 5)
    outflow = jnp.where(is_rfc, r_out, outflow)
    elev = jnp.where(is_rfc, r_elev, elev)
    rfc = jax.tree.map(lambda new, old: jnp.where(is_rfc, new, old),
                       rfc_n, rfc_in)

    g_out, gl_n = great_lakes_da(gl_in, gl_obs, gl_obs_time, now, month_i,
                                 gl_climatology)
    is_gl = wt == 6
    outflow = jnp.where(is_gl, g_out, outflow)
    elev = jnp.where(is_gl, elev_prev, elev)
    gl = jax.tree.map(lambda new, old: jnp.where(is_gl, new, old),
                      gl_n, gl_in)

    d_scatter = jnp.where(is_gl, 0.0, elev)
    return outflow, elev, d_scatter, hyb, rfc, gl
