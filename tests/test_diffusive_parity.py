"""Numerical parity: JAX diffusive solver vs the scalar reference oracle.

The oracle (``tests/reference_diffusive.py``) is a literal NumPy port of
``/root/reference/src/kernel/diffusive/diffusive.f90`` — these tests give
the diffusive solver the same oracle-backed standing the MC kernel has via
``tests/reference_impl.py``.

Stepping parity runs both sides on IDENTICAL tables (the solver's) so it
isolates the predictor/corrector/rtsafe/CFL math; table parity is asserted
separately (closed-form builder vs the reference polygon walk).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from troute_tpu.diffusive.domain import build_domain
from troute_tpu.diffusive.solver import (
    DTINI_DIVISOR, initialize_state, run_diffusive)
from troute_tpu.diffusive.xsection import build_xsec_tables

from tests.reference_diffusive import (
    ReferenceDiffusive, build_reference_tables, read_xsection)


def _prism_reach(n_nodes=8, dx=1800.0, bo=20.0, traps=1.0, tw=60.0,
                 twcc=180.0, mann=0.035, manncc=0.07, s0=0.0008, z0=100.0):
    z = z0 - s0 * dx * np.arange(n_nodes)
    ones = np.ones(n_nodes)
    return dict(z=z, dx=np.full(n_nodes, dx), bo=bo * ones,
                traps=traps * ones, tw=tw * ones, twcc=twcc * ones,
                mann=mann * ones, manncc=manncc * ones)


def _oracle_tables_from_domain(dom):
    """Slice the solver's [R, C, 11, nel] tables into the oracle's
    per-reach left-aligned lists so both sides step on identical data."""
    C = dom.n_cols
    ncomp = np.asarray(dom.ncomp)
    xsec = np.asarray(dom.xsec, np.float64)
    z = np.asarray(dom.z, np.float64)
    tabs = [xsec[j, C - ncomp[j]:].copy() for j in range(dom.n_reaches)]
    z_adj = [z[j, C - ncomp[j]:].copy() for j in range(dom.n_reaches)]
    return tabs, z_adj


def _compare_saves(dom, saves_jax, saves_ref, rtol, what=""):
    assert len(saves_jax) == len(saves_ref), \
        f"{what}: save count {len(saves_jax)} vs {len(saves_ref)}"
    C = dom.n_cols
    ncomp = np.asarray(dom.ncomp)
    for (t1, q1, y1), (t2, q2, y2) in zip(saves_jax, saves_ref):
        assert abs(t1 - t2) < 1e-6, f"{what}: t {t1} vs {t2}"
        for j in range(dom.n_reaches):
            s = slice(C - ncomp[j], C)
            np.testing.assert_allclose(
                np.asarray(q1)[j, s], q2[j], rtol=rtol, atol=rtol,
                err_msg=f"{what}: q reach {j} at t={t1}")
            np.testing.assert_allclose(
                np.asarray(y1)[j, s], y2[j], rtol=rtol, atol=rtol,
                err_msg=f"{what}: y reach {j} at t={t1}")


# ---------------------------------------------------------------------------
# cross-section tables: closed-form builder vs reference polygon walk

def test_xsec_tables_match_reference_walk():
    rng = np.random.default_rng(7)
    for _ in range(8):
        bo = rng.uniform(2.0, 60.0)
        tw = bo * rng.uniform(1.5, 4.0)
        twcc = tw * rng.uniform(1.2, 3.0)
        traps = rng.uniform(0.3, 3.0)
        mann = rng.uniform(0.02, 0.1)
        manncc = rng.uniform(0.04, 0.2)
        z0 = rng.uniform(-5.0, 500.0)
        ref_tab, ref_z = read_xsection(z0, bo, traps, tw, twcc, mann, manncc)
        got_tab, got_z = build_xsec_tables(
            np.full((1, 2), z0), np.full((1, 2), bo), np.full((1, 2), traps),
            np.full((1, 2), tw), np.full((1, 2), twcc),
            np.full((1, 2), mann), np.full((1, 2), manncc),
            np.full((1, 2), 1000.0))
        assert got_z[0, 0] == pytest.approx(ref_z, abs=1e-12)
        # all columns except 9 (uniform flow — needs neighbor slope, checked
        # through build_reference_tables below)
        for col in [0, 1, 2, 3, 4, 5, 6, 7, 8, 10]:
            np.testing.assert_allclose(
                got_tab[0, 0, col], ref_tab[col], rtol=1e-9, atol=1e-10,
                err_msg=f"table column {col}")


def test_uniform_flow_column_matches_reference():
    r = _prism_reach(n_nodes=4, s0=0.002)
    tabs, z_adj = build_reference_tables([r])
    got_tab, _ = build_xsec_tables(
        r["z"][None], r["bo"][None], r["traps"][None], r["tw"][None],
        r["twcc"][None], r["mann"][None], r["manncc"][None], r["dx"][None])
    for i in range(4):
        np.testing.assert_allclose(got_tab[0, i, 9], tabs[0][i, 9],
                                   rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# initialization parity

def _network_fixture(nts=36, dt=300.0, pulse=True):
    r1 = _prism_reach(n_nodes=6, z0=120.0)
    r2 = _prism_reach(n_nodes=5, bo=15.0, tw=45.0, twcc=135.0, z0=121.0)
    r3 = _prism_reach(n_nodes=8, bo=30.0, tw=90.0, twcc=270.0,
                      s0=5e-4, z0=111.5)
    reaches = [r1, r2, r3]
    ds = [2, 2, -1]
    qlat = np.zeros((nts, 3, 8))
    if pulse:
        qlat[4:12, 0, 5] = 0.04     # right-aligned col 5 = node 3 of r1
        qlat[6:10, 2, 4] = 0.02     # node 4 of r3
    trib = np.zeros((nts, 3))
    trib[:, 0] = 60.0 + (5.0 if pulse else 0.0) \
        * np.sin(np.arange(nts) / 5.0)
    trib[:, 1] = 40.0
    return reaches, ds, qlat, trib, dt


def test_initialize_matches_reference():
    reaches, ds, qlat, trib, dt = _network_fixture()
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt)
    tabs, z_adj = _oracle_tables_from_domain(dom)
    ref = ReferenceDiffusive(reaches, ds, qlat, dt, trib, dt, dt,
                             tabs=tabs, z_adj=z_adj)
    C = dom.n_cols
    ncomp = np.asarray(dom.ncomp)
    q0 = np.zeros((3, C))
    for j in range(3):
        q0[j, C - ncomp[j]:] = [60.0, 40.0, 100.0][j]
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR)
    ref_state = ref.initialize(q0)
    for j in range(3):
        s = slice(C - ncomp[j], C)
        np.testing.assert_allclose(
            np.asarray(st.y)[j, s], ref_state["old_y"][j],
            rtol=1e-9, atol=1e-9, err_msg=f"init y reach {j}")
        np.testing.assert_allclose(
            np.asarray(st.celerity)[j, s], ref_state["cel"][j],
            rtol=1e-9, atol=1e-9, err_msg=f"init celerity reach {j}")
        np.testing.assert_allclose(
            np.asarray(st.diffusivity)[j, s], ref_state["dif"][j],
            rtol=1e-9, atol=1e-9, err_msg=f"init diffusivity reach {j}")


# ---------------------------------------------------------------------------
# stepping parity (wavefront corrector == reference recursion, f64)

def test_single_reach_stepping_matches_reference():
    nts, dt = 24, 300.0
    r = _prism_reach(n_nodes=10)
    qlat = np.zeros((nts, 1, 10))
    qlat[3:9, 0, 5] = 0.03
    trib = np.full((nts, 1), 80.0)
    trib[:, 0] += 10.0 * np.sin(np.arange(nts) / 4.0)
    dom = build_domain([r], [-1], qlat, dt, trib, dt, dt)
    tabs, z_adj = _oracle_tables_from_domain(dom)
    ref = ReferenceDiffusive([r], [-1], qlat, dt, trib, dt, dt,
                             tabs=tabs, z_adj=z_adj)
    q0 = np.full((1, dom.n_cols), 80.0)
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR)
    ref_state = ref.initialize(q0)
    t_final = 2 * 3600.0
    st, saves = run_diffusive(dom, st, t_final=t_final, save_interval=dt,
                              corrector_mode="wavefront", dispatch="host")
    ref_saves = ref.run(ref_state, t_final, dt)
    _compare_saves(dom, saves, ref_saves, rtol=1e-8, what="single reach")


def test_network_stepping_matches_reference():
    reaches, ds, qlat, trib, dt = _network_fixture()
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt)
    tabs, z_adj = _oracle_tables_from_domain(dom)
    ref = ReferenceDiffusive(reaches, ds, qlat, dt, trib, dt, dt,
                             tabs=tabs, z_adj=z_adj)
    C = dom.n_cols
    ncomp = np.asarray(dom.ncomp)
    q0 = np.zeros((3, C))
    for j in range(3):
        q0[j, C - ncomp[j]:] = [60.0, 40.0, 100.0][j]
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR)
    ref_state = ref.initialize(q0)
    t_final = 2 * 3600.0
    st, saves = run_diffusive(dom, st, t_final=t_final, save_interval=dt,
                              corrector_mode="wavefront", dispatch="host")
    ref_saves = ref.run(ref_state, t_final, dt)
    _compare_saves(dom, saves, ref_saves, rtol=1e-8, what="network")
    # final celerity/diffusivity state too
    for j in range(3):
        assert float(st.celerity[j, C - 1]) == pytest.approx(
            ref_state["cel"][j][0], rel=1e-8)
        assert float(st.diffusivity[j, C - 1]) == pytest.approx(
            ref_state["dif"][j][0], rel=1e-8)


def test_coastal_boundary_stepping_matches_reference():
    """dsbc_option == 1: observed tailwater depth series drives the
    downstream boundary (reference diffusive.f90:537-549, 719-728)."""
    nts, dt = 24, 300.0
    r = _prism_reach(n_nodes=7, s0=3e-4, z0=10.0)
    qlat = np.zeros((nts, 1, 7))
    trib = np.full((nts, 1), 60.0)
    hours = np.arange(5)
    db = (2.5 + 0.8 * np.sin(hours / 2.0))[None, :]   # [1, 5] depth series
    dom = build_domain([r], [-1], qlat, dt, trib, dt, dt,
                       db_depth=db, dt_db=3600.0)
    tabs, z_adj = _oracle_tables_from_domain(dom)
    ref = ReferenceDiffusive([r], [-1], qlat, dt, trib, dt, dt,
                             tabs=tabs, z_adj=z_adj,
                             dsbc_option=1, db_depth=db, dt_db=3600.0)
    q0 = np.full((1, dom.n_cols), 60.0)
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR)
    ref_state = ref.initialize(q0)
    t_final = 2 * 3600.0
    st, saves = run_diffusive(dom, st, t_final=t_final, save_interval=dt,
                              corrector_mode="wavefront", dispatch="host")
    ref_saves = ref.run(ref_state, t_final, dt)
    _compare_saves(dom, saves, ref_saves, rtol=1e-8, what="coastal")


def test_oracle_tables_end_to_end():
    """End-to-end with the oracle building its OWN tables (the literal
    polygon walk): proves the closed-form tables + solver reproduce the
    full reference pipeline, not just the stepping.  Tolerance is looser
    because ~1e-12 table differences can flip rtsafe branch decisions
    (roots agree only to the 1e-4 xacc when iteration paths diverge)."""
    nts, dt = 24, 300.0
    r = _prism_reach(n_nodes=10)
    qlat = np.zeros((nts, 1, 10))
    trib = np.full((nts, 1), 80.0)
    dom = build_domain([r], [-1], qlat, dt, trib, dt, dt)
    ref = ReferenceDiffusive([r], [-1], qlat, dt, trib, dt, dt)  # own tables
    q0 = np.full((1, dom.n_cols), 80.0)
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR)
    ref_state = ref.initialize(q0)
    st, saves = run_diffusive(dom, st, t_final=3600.0, save_interval=dt,
                              corrector_mode="wavefront", dispatch="host")
    ref_saves = ref.run(ref_state, 3600.0, dt)
    _compare_saves(dom, saves, ref_saves, rtol=2e-4,
                   what="own-tables end-to-end")


# ---------------------------------------------------------------------------
# alternate execution modes vs the oracle

def test_jacobi_mode_matches_reference():
    """The fixed-point corrector converges to the reference chain solution
    (exact after <= depth sweeps, modulo the 1e-6 sweep tolerance)."""
    reaches, ds, qlat, trib, dt = _network_fixture()
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt)
    tabs, z_adj = _oracle_tables_from_domain(dom)
    ref = ReferenceDiffusive(reaches, ds, qlat, dt, trib, dt, dt,
                             tabs=tabs, z_adj=z_adj)
    C = dom.n_cols
    ncomp = np.asarray(dom.ncomp)
    q0 = np.zeros((3, C))
    for j in range(3):
        q0[j, C - ncomp[j]:] = [60.0, 40.0, 100.0][j]
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR,
                          corrector_mode="jacobi")
    ref_state = ref.initialize(q0)
    t_final = 3600.0
    st, saves = run_diffusive(dom, st, t_final=t_final, save_interval=dt,
                              corrector_mode="jacobi", dispatch="host")
    ref_saves = ref.run(ref_state, t_final, dt)
    _compare_saves(dom, saves, ref_saves, rtol=1e-4, what="jacobi")


def test_device_dispatch_matches_reference():
    nts, dt = 12, 300.0
    r = _prism_reach(n_nodes=6)
    qlat = np.zeros((nts, 1, 6))
    trib = np.full((nts, 1), 70.0)
    dom = build_domain([r], [-1], qlat, dt, trib, dt, dt)
    tabs, z_adj = _oracle_tables_from_domain(dom)
    ref = ReferenceDiffusive([r], [-1], qlat, dt, trib, dt, dt,
                             tabs=tabs, z_adj=z_adj)
    q0 = np.full((1, dom.n_cols), 70.0)
    st = initialize_state(dom, jnp.asarray(q0, jnp.float64),
                          dtini_min=dt / DTINI_DIVISOR)
    ref_state = ref.initialize(q0)
    st, saves = run_diffusive(dom, st, t_final=3600.0, save_interval=dt,
                              corrector_mode="wavefront", dispatch="device")
    ref_saves = ref.run(ref_state, 3600.0, dt)
    _compare_saves(dom, saves, ref_saves, rtol=1e-8, what="device dispatch")


def test_float32_tolerance_study():
    """Documented f32-vs-f64 accuracy bound for the TPU solve option
    (``hybrid_parameters.diffusive_dtype: float32``).

    Measured on the 48-step junction fixture: max relative discharge
    error ~3e-6, max water-surface-elevation error ~3e-5 m — orders of
    magnitude below gauge observational uncertainty, so the f32 solve is
    a safe TPU configuration (the f64 default keeps reference-precision
    parity; on TPU f64 is emulated at ~2x cost and caps domain size).
    The asserted bounds carry ~30x margin.
    """
    reaches, ds, qlat, trib, dt = _network_fixture(nts=48)
    out = {}
    for dtype in (jnp.float64, jnp.float32):
        dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt,
                           dtype=dtype)
        q0 = jnp.full((3, 8), 50.0, dtype)
        st = initialize_state(dom, q0, dt / 10.0, corrector_mode="jacobi")
        st, saves = run_diffusive(dom, st, t_final=48 * dt,
                                  save_interval=dt,
                                  corrector_mode="jacobi",
                                  dispatch="host")
        out[dtype] = saves
    v = np.asarray(dom.valid)
    max_rq = max_dy = 0.0
    for (_, q64, y64), (_, q32, y32) in zip(out[jnp.float64],
                                            out[jnp.float32]):
        q64, q32 = np.asarray(q64), np.asarray(q32)
        y64, y32 = np.asarray(y64), np.asarray(y32)
        rq = np.abs(q32 - q64)[v] / np.maximum(np.abs(q64[v]), 1e-6)
        max_rq = max(max_rq, rq.max())
        max_dy = max(max_dy, np.abs(y32 - y64)[v].max())
    assert max_rq < 1e-4, f"f32 discharge error {max_rq:.2e}"
    assert max_dy < 1e-3, f"f32 WSE error {max_dy:.2e} m"
