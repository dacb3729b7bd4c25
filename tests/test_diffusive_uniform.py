"""Uniform-elevation-grid resampled tables (the jacobi corrector's TPU
fast path, ``solver.attach_uniform_tables``).

The 501-entry non-uniform table forces a search + full-column one-hot
passes per fetch; resampling the hot columns onto per-node uniform grids
makes the bracket index pure arithmetic and shrinks every pass to nel_u
entries.  The resampling is piecewise-linear sampling of a
piecewise-linear table, so the only error is grid resolution — measured
here against the exact mode (accuracy study: nel_u in {64, 128, 256}).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from troute_tpu.diffusive.domain import build_domain, stack_domains
from troute_tpu.diffusive.solver import (
    COL_CONV, COL_ELEV, COL_TOPW, DTINI_DIVISOR, UCOL_CONV, UCOL_TOPW,
    _uinterp, attach_uniform_tables, initialize_state, run_diffusive)

from tests.test_diffusive import _prism_reach  # noqa: E402


def _junction_domain(nel_uniform=None):
    nts, dt = 24, 300.0
    r1 = _prism_reach(n_nodes=6)
    r2 = _prism_reach(n_nodes=5, bo=15.0)
    r3 = _prism_reach(n_nodes=8, s0=3e-4, z0=95.0)
    qlat = np.zeros((nts, 3, 8))
    qlat[4:10, 0, 3] = 0.03
    trib = np.zeros((nts, 3))
    trib[:, 0] = 60.0
    trib[:, 1] = 40.0
    return build_domain([r1, r2, r3], [2, 2, -1], qlat, dt, trib, dt, dt,
                        nel_uniform=nel_uniform), dt


def test_uniform_tables_match_exact_interpolation():
    """At probe elevations, the uniform-grid fetch must track the exact
    501-entry interpolation to grid-resolution error, and reproduce the
    r_interpol edge rules (min below range, last-segment extrapolation
    above)."""
    dom, _ = _junction_domain(nel_uniform=256)
    xs = np.asarray(dom.xsec)
    R, C = xs.shape[:2]
    rng = np.random.default_rng(0)

    r = rng.integers(0, R, 200)
    c = rng.integers(0, C, 200)
    el = xs[r, c, COL_ELEV]
    # probes: in-range (above the 1-cm notch zone, whose sub-grid-scale
    # topwidth jump the coarse uniform grid smooths by design — the
    # run-level accuracy test below covers its real impact), below-range,
    # above-range
    frac = rng.uniform(-0.1, 1.2, 200)
    frac = np.where((frac > 0.0) & (frac < 0.02), frac + 0.02, frac)
    x = el[:, 0] + frac * (el[:, -1] - el[:, 0])

    def exact(col):
        idx = np.clip((el <= x[:, None]).sum(-1) - 1, 0, el.shape[-1] - 2)
        g1 = np.take_along_axis(el, idx[:, None], -1)[:, 0]
        g2 = np.take_along_axis(el, idx[:, None] + 1, -1)[:, 0]
        v = xs[r, c, col]
        v1 = np.take_along_axis(v, idx[:, None], -1)[:, 0]
        v2 = np.take_along_axis(v, idx[:, None] + 1, -1)[:, 0]
        w = (x - g1) / np.where(g2 != g1, g2 - g1, 1.0)
        out = v1 + (v2 - v1) * w
        return np.where(x < el[:, 0], v.min(-1), out)

    got_conv, got_topw = _uinterp(
        jnp.asarray(dom.utab)[r, c], jnp.asarray(dom.ugrid_lo)[r, c],
        jnp.asarray(dom.ugrid_step)[r, c], jnp.asarray(x),
        (UCOL_CONV, UCOL_TOPW), jnp.asarray(dom.utab_min)[r, c])

    for got, col in ((got_conv, COL_CONV), (got_topw, COL_TOPW)):
        want = exact(col)
        scale = np.maximum(np.abs(want), 1e-3)
        rel = np.abs(np.asarray(got) - want) / scale
        # max is dominated by the bankfull topwidth DISCONTINUITY
        # (tw -> twcc jump), which no resampling resolution can resolve —
        # probes within one grid step of it read the smoothed jump
        # (~10% of the jump at nel_u=256); run-level impact is bounded by
        # the accuracy test below
        assert np.quantile(rel, 0.99) < 2e-2, (col, np.quantile(rel, 0.99))
        assert rel.max() < 0.15, (col, rel.max())
        assert np.median(rel) < 2e-3, (col, np.median(rel))


@pytest.mark.parametrize("nel_u,q_tol,y_tol", [
    (64, 2e-2, 2e-2), (128, 6e-3, 6e-3), (256, 2e-3, 2e-3)])
def test_uniform_mode_accuracy_vs_exact(nel_u, q_tol, y_tol):
    """Full jacobi run with resampled tables vs the exact mode: discharge
    and surface elevation within grid-resolution tolerances (the
    accuracy study backing the bench's f32 fast path)."""
    dom_e, dt = _junction_domain()
    dom_u, _ = _junction_domain(nel_uniform=nel_u)
    q0 = jnp.full((3, dom_e.n_cols), 50.0, jnp.float64)

    outs = {}
    for name, dom in (("exact", dom_e), ("uniform", dom_u)):
        st = initialize_state(dom, q0, dtini_min=dt / DTINI_DIVISOR,
                              corrector_mode="jacobi")
        st, _ = run_diffusive(dom, st, t_final=2 * 3600.0,
                              save_interval=dt, corrector_mode="jacobi")
        outs[name] = st

    valid = np.asarray(dom_e.valid)
    qe = np.asarray(outs["exact"].q)[valid]
    qu = np.asarray(outs["uniform"].q)[valid]
    ye = np.asarray(outs["exact"].y)[valid]
    yu = np.asarray(outs["uniform"].y)[valid]
    dq = np.abs(qu - qe) / np.maximum(np.abs(qe), 1.0)
    dy = np.abs(yu - ye)          # surface elevation: absolute metres
    assert dq.max() < q_tol, dq.max()
    assert dy.max() < y_tol, dy.max()


def test_uniform_mode_batched_stack():
    """stack_domains re-derives uniform tables post-stack; the batched
    fast path stays finite and close to the solo runs."""
    from troute_tpu.diffusive.domain import stack_states
    from troute_tpu.diffusive.solver import run_diffusive_batched

    dom1, dt = _junction_domain(nel_uniform=128)
    dom2, _ = _junction_domain(nel_uniform=128)
    q0 = jnp.full((3, dom1.n_cols), 50.0, jnp.float64)
    st1 = initialize_state(dom1, q0, dtini_min=dt / DTINI_DIVISOR,
                           corrector_mode="jacobi")
    st2 = initialize_state(dom2, q0, dtini_min=dt / DTINI_DIVISOR,
                           corrector_mode="jacobi")
    sdom = stack_domains([dom1, dom2])
    assert sdom.utab is not None and sdom.utab.ndim == 5
    sst = stack_states([st1, st2], [dom1, dom2], int(sdom.z.shape[2]),
                       int(sdom.z.shape[1]))
    fin, _ = run_diffusive_batched(sdom, sst, t_final=3600.0,
                                   save_interval=dt,
                                   corrector_mode="jacobi")
    solo, _ = run_diffusive(dom1, st1, t_final=3600.0, save_interval=dt,
                            corrector_mode="jacobi")
    valid = np.asarray(dom1.valid)
    np.testing.assert_allclose(np.asarray(fin.q[0])[valid],
                               np.asarray(solo.q)[valid],
                               rtol=1e-9, atol=1e-9)


def test_uniform_gs_sweep_matches_exact_on_deep_tree():
    """The fast path's Gauss-Seidel-within-reach sweep (exact per chain,
    junction hand-ups lag one sweep) must converge to the same surface as
    the exact-table full-lane jacobi on a DEEP reach tree — guards the
    cross-junction convergence the 3-reach fixture barely exercises.

    Compared near steady state: during steep transients the resampled
    tables' slightly different celerity/diffusivity shift the
    hydrograph's PHASE by seconds-to-minutes, which reads as large
    instantaneous dq at wavefronts while volumes and steady flows agree
    (measured: 17% transient peak-instant dq vs 1.8% steady)."""
    n_reaches, n_nodes = 31, 8          # 5-level binary tree
    rng = np.random.default_rng(7)
    dt = 300.0
    nts = 96
    level = np.zeros(n_reaches, np.int64)
    ds = np.full(n_reaches, -1, np.int64)
    for j in range(1, n_reaches):
        ds[j] = (j - 1) // 2
        level[j] = level[ds[j]] + 1
    dxv, s0 = 1500.0, 0.0005
    reaches = []
    for j in range(n_reaches):
        z_head = (level[j] + 1) * n_nodes * dxv * s0
        z = z_head - s0 * dxv * np.arange(n_nodes)
        ones = np.ones(n_nodes)
        reaches.append(dict(
            z=z, dx=np.full(n_nodes, dxv), bo=rng.uniform(15, 40) * ones,
            traps=ones.copy(), tw=rng.uniform(60, 120) * ones,
            twcc=rng.uniform(200, 400) * ones, mann=0.035 * ones,
            manncc=0.07 * ones))
    qlat = np.full((nts + 2, n_reaches, n_nodes), 0.05)
    trib = np.full((nts + 2, n_reaches), 2.0)
    leaves = np.setdiff1d(np.arange(n_reaches), ds)
    trib[:, leaves] = rng.uniform(20, 80, leaves.size)

    outs = {}
    for name, nelu in (("exact", None), ("uniform", 128)):
        dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt,
                           nel_uniform=nelu)
        q0 = jnp.full((n_reaches, n_nodes), 30.0, jnp.float64)
        st = initialize_state(dom, q0, dt / 10.0, corrector_mode="jacobi")
        st, _ = run_diffusive(dom, st, t_final=nts * dt, save_interval=dt,
                              corrector_mode="jacobi")
        outs[name] = (st, dom)

    valid = np.asarray(outs["exact"][1].valid)
    qe = np.asarray(outs["exact"][0].q)
    qu = np.asarray(outs["uniform"][0].q)
    ye = np.asarray(outs["exact"][0].y)[valid]
    yu = np.asarray(outs["uniform"][0].y)[valid]
    dq = (np.abs(qu - qe) / np.maximum(np.abs(qe), 1.0))[valid]
    assert dq.max() < 3e-2, dq.max()              # measured 1.8%
    assert np.abs(yu - ye).max() < 0.1, np.abs(yu - ye).max()
    # mass balance at the root-reach bottom: the tree's accumulated
    # steady inflow must come out regardless of table mode
    assert abs(qu[0, -1] - qe[0, -1]) / qe[0, -1] < 1e-2


def test_fuzz_uniform_fast_path_stays_finite():
    """Random (near-degenerate) geometries through the GS fast path
    (stretched-grid tables) in BOTH dtypes: no NaN/Inf, no negative
    depth — same fuzz envelope as the exact-mode fuzz test."""
    rng = np.random.default_rng(321)
    for trial in range(6):
        n = int(rng.integers(3, 10))
        dx = rng.uniform(80, 5000, n)
        bo = rng.uniform(0.5, 30, n)
        tw = bo * rng.uniform(1.0, 3.0, n)
        twcc = tw * rng.uniform(1.0, 3.0, n)
        s0 = rng.uniform(1e-5, 0.05, n)
        # include HIGH base elevations (f32 row-0 collapse regression)
        z0 = float(rng.uniform(0, 400))
        z = z0 + np.concatenate([[0.0], np.cumsum(dx[:-1] * s0[:-1])])[::-1]
        r = dict(z=z, dx=dx, bo=bo,
                 traps=1.0 / np.maximum(rng.uniform(0.05, 2.0, n), 1e-6),
                 tw=tw, twcc=twcc,
                 mann=rng.uniform(0.02, 0.15, n),
                 manncc=rng.uniform(0.04, 0.3, n))
        nts = 12
        qlat = np.zeros((nts, 1, n))
        trib = np.full((nts, 1), float(rng.uniform(0.05, 300)))
        for dtype in (jnp.float64, jnp.float32):
            dom = build_domain([r], [-1], qlat, 300.0, trib, 300.0, 300.0,
                               dtype=dtype, nel_uniform=128)
            q0 = jnp.full((1, dom.n_cols), float(trib[0, 0]), dtype)
            st = initialize_state(dom, q0, dtini_min=30.0,
                                  corrector_mode="jacobi")
            st, _ = run_diffusive(dom, st, t_final=3600.0,
                                  save_interval=300.0,
                                  corrector_mode="jacobi")
            assert np.isfinite(np.asarray(st.q)).all(), (trial, dtype)
            assert np.isfinite(np.asarray(st.y)).all(), (trial, dtype)
            tol = 1e-6 if dtype == jnp.float64 else 1e-2
            assert (np.asarray(st.y)[dom.valid]
                    >= np.asarray(dom.z)[dom.valid] - tol).all(), \
                (trial, dtype)
