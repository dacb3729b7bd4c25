"""Reservoir DA op tests: vectorized ops vs scalar oracles over synthetic
observation scenarios (missing obs, stale obs, persistence limits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from troute_tpu.ops.reservoir_da import (
    GreatLakesDAState, HybridDAState, RfcDAState, great_lakes_da,
    hybrid_persistence_da, rfc_forecast_da)
from reference_impl import gl_da_ref, hybrid_da_ref, rfc_da_ref

DT = 300.0


def test_hybrid_da_trajectory():
    """Drive 240 steps with obs gaps; every step matches the oracle."""
    rng = np.random.default_rng(9)
    n_obs = 40
    obs_time = np.arange(n_obs) * 900.0  # 15-min obs
    obs = rng.uniform(5, 50, n_obs)
    obs[10:18] = np.nan          # data gap
    obs[30:] = np.nan            # obs end early -> persistence

    # vector state (single lane)
    state = HybridDAState(
        persisted_outflow=jnp.asarray([np.nan], jnp.float64),
        update_time=jnp.asarray([0.0], jnp.float64),
        persistence_index=jnp.asarray([0.0], jnp.float64),
        persistence_update_time=jnp.asarray([0.0], jnp.float64))
    # scalar state
    s_prev, s_ut, s_pidx, s_put = np.nan, 0.0, 0.0, 0.0

    area, max_depth, oe = 15.0, 9.96, 7.733
    elev_v = 9.7
    elev_s = 9.7
    fn = jax.jit(hybrid_persistence_da, static_argnames=("obs_lookback_hours",))

    for t in range(1, 241):
        now = t * DT
        lp_out = 10.0 + 0.01 * t
        inflow = 12.0 + 0.05 * t

        out_v, elev_vn, state = fn(
            state, jnp.asarray([obs]), jnp.asarray(obs_time), now,
            jnp.asarray([lp_out]), jnp.asarray([inflow]), DT,
            jnp.asarray([area]), jnp.asarray([max_depth]),
            jnp.asarray([oe]), jnp.asarray([elev_v]),
            obs_lookback_hours=48.0)

        out_s, s_prev, elev_sn, s_ut, s_pidx, s_put = hybrid_da_ref(
            obs, obs_time, now, s_prev, s_put, s_pidx, lp_out, inflow, DT,
            area, max_depth, oe, elev_s, 48.0, s_ut)

        assert float(out_v[0]) == pytest.approx(out_s, rel=1e-12, abs=1e-12), t
        assert float(elev_vn[0]) == pytest.approx(elev_sn, rel=1e-12), t
        assert float(state.update_time[0]) == pytest.approx(s_ut), t
        assert float(state.persistence_index[0]) == pytest.approx(s_pidx), t
        assert float(state.persistence_update_time[0]) == pytest.approx(s_put), t
        pv = float(state.persisted_outflow[0])
        assert (np.isnan(pv) and np.isnan(s_prev)) or \
            pv == pytest.approx(s_prev, rel=1e-12), t
        elev_v, elev_s = float(elev_vn[0]), elev_sn


def test_hybrid_persistence_limit_cycles():
    """With no obs at all, persistence decays to levelpool after 11 cycles."""
    n_lanes = 3
    obs = jnp.full((n_lanes, 4), jnp.nan, jnp.float64)
    obs_time = jnp.arange(4.0) * 900
    state = HybridDAState(
        persisted_outflow=jnp.asarray([20.0, np.nan, 30.0], jnp.float64),
        update_time=jnp.zeros(3, jnp.float64),
        persistence_index=jnp.asarray([12.0, 0.0, 1.0], jnp.float64),
        persistence_update_time=jnp.full(3, -1.0, jnp.float64))
    ones = jnp.ones(3, jnp.float64)
    out, elev, new_state = hybrid_persistence_da(
        state, obs, obs_time, 300.0, 5.0 * ones, 6.0 * ones, DT,
        15.0 * ones, 9.96 * ones, 7.7 * ones, 9.0 * ones)
    # lane 1 (NaN persisted) falls back to levelpool
    assert float(out[1]) == pytest.approx(5.0)
    assert float(new_state.persistence_index[1]) == 0.0


def test_rfc_da_trajectory():
    rng = np.random.default_rng(3)
    n_counts = 30
    series = rng.uniform(10, 100, n_counts)
    series[7] = -5.0    # bad value -> backstop walks back
    series[0:2] = -1.0  # early negatives

    state = RfcDAState(timeseries_idx=jnp.asarray([3], jnp.int32),
                       update_time=jnp.asarray([0.0], jnp.float64))
    s_idx, s_ut = 3, 0.0
    elev_v = elev_s = 8.0
    area_m2 = 15.0e6
    for t in range(1, 100):
        now = t * DT
        inflow = 20.0 + t * 0.1
        lp_out, lp_elev = 15.0, 7.9
        out_v, elev_vn, state = rfc_forecast_da(
            state, jnp.asarray([series]), jnp.asarray([n_counts], jnp.int32),
            jnp.asarray([True]), jnp.asarray([3600.0]),
            jnp.asarray([11 * 86400.0]), jnp.asarray([4], jnp.int32),
            now, jnp.asarray([inflow]), jnp.asarray([elev_v]),
            jnp.asarray([lp_out]), jnp.asarray([lp_elev]),
            jnp.asarray([area_m2]), jnp.asarray([9.96]), DT)
        out_s, elev_sn, s_ut, s_idx = rfc_da_ref(
            True, series, s_idx, n_counts, DT, now, s_ut, 3600.0,
            11 * 86400.0, 4, inflow, elev_s, lp_out, lp_elev, area_m2, 9.96)
        assert float(out_v[0]) == pytest.approx(out_s, rel=1e-12), t
        assert float(elev_vn[0]) == pytest.approx(elev_sn, rel=1e-12), t
        assert int(state.timeseries_idx[0]) == s_idx, t
        assert float(state.update_time[0]) == pytest.approx(s_ut), t
        elev_v, elev_s = float(elev_vn[0]), elev_sn


def test_rfc_type5_glacier():
    """Type 5 adds inflow to the series value."""
    series = np.array([5.0, 6.0, 7.0])
    state = RfcDAState(timeseries_idx=jnp.asarray([1], jnp.int32),
                       update_time=jnp.asarray([1e9], jnp.float64))
    out, elev, _ = rfc_forecast_da(
        state, jnp.asarray([series]), jnp.asarray([3], jnp.int32),
        jnp.asarray([True]), jnp.asarray([3600.0]), jnp.asarray([1e9]),
        jnp.asarray([5], jnp.int32), 300.0, jnp.asarray([10.0]),
        jnp.asarray([8.0]), jnp.asarray([4.0]), jnp.asarray([7.9]),
        jnp.asarray([1e6]), jnp.asarray([50.0]), DT)
    assert float(out[0]) == pytest.approx(10.0 + 6.0)


def test_gl_da_trajectory():
    rng = np.random.default_rng(4)
    n_obs = 20
    obs_time = np.arange(n_obs) * 3600.0
    obs = rng.uniform(100, 200, n_obs)
    obs[5:9] = np.nan
    clim = rng.uniform(50, 150, 12)

    state = GreatLakesDAState(
        assimilated_outflow=jnp.asarray([np.nan], jnp.float64),
        assimilated_time=jnp.asarray([0.0], jnp.float64),
        update_time=jnp.asarray([0.0], jnp.float64))
    s_out, s_time, s_ut = np.nan, 0.0, 0.0
    for t in range(1, 200):
        now = t * DT
        month = 5
        out_v, state = great_lakes_da(
            state, jnp.asarray([obs]), jnp.asarray([obs_time]), now, month,
            jnp.asarray([clim]))
        out_s, s_out, s_time, s_ut = gl_da_ref(
            obs, obs_time, s_out, s_time, s_ut, now, month, clim)
        assert float(out_v[0]) == pytest.approx(out_s, rel=1e-12), t
