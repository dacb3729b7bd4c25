"""Coastal downstream boundary (dsbc_option == 1): observed water-depth
timeseries at the diffusive tailwater (reference diffusive.f90:537-549,
719-728; inputs nhd_io.py:186, 1687-1733)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from troute_tpu.diffusive.domain import build_domain
from troute_tpu.diffusive.solver import (DTINI_DIVISOR, initialize_state,
                                         run_diffusive)

LAURA = Path("/root/reference/test/HurricaneLaura")


def _prism_reach(n_nodes=12, dx=1500.0, bo=20.0, traps=1.0, tw=60.0,
                 twcc=180.0, slope=5e-4):
    z = np.arange(n_nodes)[::-1] * dx * slope
    return dict(z=z, dx=np.full(n_nodes, dx), bo=np.full(n_nodes, bo),
                traps=np.full(n_nodes, traps), tw=np.full(n_nodes, tw),
                twcc=np.full(n_nodes, twcc), mann=np.full(n_nodes, 0.03),
                manncc=np.full(n_nodes, 0.06))


def test_coastal_boundary_pins_tailwater_elevation():
    """With a prescribed depth series the tailwater WSE follows it (e.g. a
    storm-surge ramp) instead of normal depth."""
    nts, dt, q_in = 48, 300.0, 150.0
    r = _prism_reach()
    n = len(r["z"])
    qlat = np.zeros((nts, 1, n))
    trib = np.full((nts, 1), q_in)

    # normal-depth run for the baseline tailwater depth
    dom2 = build_domain([r], [-1], qlat, dt, trib, dt, dt)
    q0 = jnp.full((1, dom2.n_cols), q_in, jnp.float64)
    st2 = initialize_state(dom2, q0, dtini_min=dt / DTINI_DIVISOR)
    st2, _ = run_diffusive(dom2, st2, t_final=4 * 3600.0, save_interval=dt)
    d_norm = float(st2.y[0, -1] - dom2.z[0, -1])

    # surge ramp: depth climbs from ~normal to normal + 3 m over 4 h
    n_db = 9
    dt_db = 1800.0
    surge = d_norm + np.linspace(0.0, 3.0, n_db)
    dom1 = build_domain([r], [-1], qlat, dt, trib, dt, dt,
                        db_depth=surge[None, :], dt_db=dt_db)
    st1 = initialize_state(dom1, q0, dtini_min=dt / DTINI_DIVISOR)
    st1, _ = run_diffusive(dom1, st1, t_final=4 * 3600.0, save_interval=dt)
    d_tw = float(st1.y[0, -1] - dom1.z[0, -1])
    # at t = 4 h the prescribed depth is surge[-1]
    assert abs(d_tw - surge[-1]) < 0.05
    # backwater: interior depths exceed the normal-depth run's
    assert float(st1.y[0, -2]) > float(st2.y[0, -2]) + 1.0
    assert np.isfinite(np.asarray(st1.q)).all()


def test_coastal_nan_row_falls_back_to_normal_depth():
    nts, dt, q_in = 24, 300.0, 150.0
    r = _prism_reach()
    n = len(r["z"])
    qlat = np.zeros((nts, 1, n))
    trib = np.full((nts, 1), q_in)
    db = np.full((1, 6), np.nan)
    dom1 = build_domain([r], [-1], qlat, dt, trib, dt, dt,
                        db_depth=db, dt_db=1800.0)
    dom2 = build_domain([r], [-1], qlat, dt, trib, dt, dt)
    q0 = jnp.full((1, dom1.n_cols), q_in, jnp.float64)
    st1 = initialize_state(dom1, q0, dtini_min=dt / DTINI_DIVISOR)
    st2 = initialize_state(dom2, q0, dtini_min=dt / DTINI_DIVISOR)
    st1, _ = run_diffusive(dom1, st1, t_final=3600.0, save_interval=dt)
    st2, _ = run_diffusive(dom2, st2, t_final=3600.0, save_interval=dt)
    np.testing.assert_allclose(np.asarray(st1.y), np.asarray(st2.y),
                               rtol=0, atol=1e-12)


def test_min_depth_clamp():
    """Prescribed depth below the stability floor is clamped to 0.1 m
    (diffusive.f90:264, mindepth_nstab)."""
    nts, dt, q_in = 24, 300.0, 20.0
    r = _prism_reach()
    n = len(r["z"])
    qlat = np.zeros((nts, 1, n))
    trib = np.full((nts, 1), q_in)
    db = np.full((1, 6), 0.01)   # 1 cm "observed" depth
    dom = build_domain([r], [-1], qlat, dt, trib, dt, dt,
                       db_depth=db, dt_db=1800.0)
    q0 = jnp.full((1, dom.n_cols), q_in, jnp.float64)
    st = initialize_state(dom, q0, dtini_min=dt / DTINI_DIVISOR)
    d_tw = float(st.y[0, -1] - dom.z[0, -1])
    assert abs(d_tw - 0.1) < 1e-9


@pytest.mark.skipif(not LAURA.exists(), reason="HurricaneLaura data absent")
def test_read_real_schism_file():
    from troute_tpu.io.coastal import (coastal_db_for_domain,
                                       read_coastal_boundary_domain,
                                       read_coastal_depth_series)
    domain = read_coastal_boundary_domain(
        LAURA / "domain/unit_test_noRS/coastal_boundary_domain.yaml")
    assert domain == {5781901: 0}
    base, dt_sec, series = read_coastal_depth_series(
        LAURA / "channel_forcing/schout_1.nc", domain)
    assert base == pd.Timestamp("2020-08-26")
    assert dt_sec == 3600.0
    s = series[5781901]
    assert s.size == 48           # 47 samples + extrapolated first column
    assert np.isfinite(s[2:]).all()
    # backward extrapolation rule (nhd_io.py:1733)
    np.testing.assert_allclose(s[0], 2 * s[1] - s[2])

    db, dt_db = coastal_db_for_domain(
        LAURA / "channel_forcing/schout_1.nc",
        LAURA / "domain/unit_test_noRS/coastal_boundary_domain.yaml",
        pd.Timestamp("2020-08-26 13:00"), [5781901], 3, {5781901: 1})
    assert dt_db == 3600.0
    assert db.shape[0] == 3
    assert np.isnan(db[0]).all() and np.isnan(db[2]).all()
    assert np.isfinite(db[1, :10]).all()
    # re-based: first column is the sample at 13:00 (index 13 of series)
    np.testing.assert_allclose(db[1, 0], s[13])
