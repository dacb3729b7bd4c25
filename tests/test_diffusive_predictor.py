"""Associative-scan predictor == sequential-scan predictor.

The default predictor re-associates the forward elimination / backward
substitution recurrences (``solver._forward_elim_assoc`` /
``_linear_scan``) into O(log C)-depth associative scans; ``predictor_seq``
keeps the direct C-step vectorization of the reference per-node loops
(diffusive.f90:1164-1283).  Both compute the same recurrences — only the
floating-point association differs — so f64 must agree to ~1e-10 on every
valid node, across ragged reach lengths (head resets), junctions, and
non-power-of-two C.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from troute_tpu.diffusive import solver
from troute_tpu.diffusive.domain import build_domain


def _random_network(rng, n_reaches, max_nodes, dt=300.0, nts=8):
    """Random tree of prism reaches with ragged node counts."""
    ds = np.full(n_reaches, -1, np.int64)
    for j in range(1, n_reaches):
        ds[j] = rng.integers(0, j)
    reaches = []
    for j in range(n_reaches):
        n = int(rng.integers(3, max_nodes + 1))
        dx = rng.uniform(800.0, 2500.0, n)
        s0 = rng.uniform(2e-4, 1e-3)
        z0 = 10.0 + 50.0 * (n_reaches - j)
        z = z0 - s0 * np.concatenate([[0.0], np.cumsum(dx[:-1])])
        ones = np.ones(n)
        reaches.append(dict(
            z=z, dx=dx,
            bo=rng.uniform(10, 40) * ones, traps=ones.copy(),
            tw=rng.uniform(50, 120) * ones,
            twcc=rng.uniform(150, 400) * ones,
            mann=0.035 * ones, manncc=0.07 * ones))
    C = max(len(r["z"]) for r in reaches)
    qlat = rng.uniform(0.0, 0.1, (nts, n_reaches, C))
    trib = rng.uniform(1.0, 60.0, (nts, n_reaches))
    return reaches, ds, qlat, trib, dt


def _random_state(rng, dom, dtype):
    R, C = dom.n_reaches, dom.n_cols
    return solver.DiffusiveState(
        q=jnp.asarray(rng.uniform(0.5, 80.0, (R, C)), dtype),
        y=jnp.asarray(np.asarray(dom.z) + rng.uniform(0.3, 4.0, (R, C)),
                      dtype),
        qpx=jnp.asarray(rng.normal(0.0, 1e-3, (R, C)), dtype),
        celerity=jnp.asarray(rng.uniform(0.3, 3.0, (R, C)), dtype),
        diffusivity=jnp.asarray(rng.uniform(10.0, 5000.0, (R, C)), dtype),
        t=jnp.asarray(150.0, dtype))


@pytest.mark.parametrize("n_reaches,max_nodes,seed", [
    (1, 9, 0),       # single reach
    (5, 8, 1),       # small tree, ragged lengths
    (17, 33, 2),     # non-power-of-two C, deeper tree
])
def test_assoc_predictor_matches_sequential_f64(n_reaches, max_nodes, seed):
    rng = np.random.default_rng(seed)
    reaches, ds, qlat, trib, dt = _random_network(rng, n_reaches, max_nodes)
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt)
    st = _random_state(rng, dom, jnp.float64)
    dtini = jnp.asarray(45.0, jnp.float64)

    eei_a, ffi_a, exi_a, fxi_a = solver._forward_elim_assoc(dom, st, dtini)
    qp_a, qpx_a = solver._predictor_tail(dom, st, dtini, st.t,
                                         eei_a, ffi_a, exi_a, fxi_a,
                                         assoc=True)
    qp_s, qpx_s = solver.predictor_seq(dom, st, dtini, st.t)

    valid = np.asarray(dom.valid)
    np.testing.assert_allclose(np.asarray(qp_a)[valid],
                               np.asarray(qp_s)[valid],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qpx_a)[valid],
                               np.asarray(qpx_s)[valid],
                               rtol=1e-8, atol=1e-10)


def test_assoc_predictor_matches_sequential_f32():
    """f32: products are normalized per compose, so the associative form
    stays finite and close to the sequential one even with large
    diffusivity (stiff ppi)."""
    rng = np.random.default_rng(7)
    reaches, ds, qlat, trib, dt = _random_network(rng, 9, 16)
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt,
                       dtype=jnp.float32)
    st = _random_state(rng, dom, jnp.float32)
    # stress: near-ULM diffusivity and short dx -> |ppi| ~ 1e4
    st = st._replace(diffusivity=jnp.full_like(st.diffusivity, 9999.0))
    dtini = jnp.asarray(300.0, jnp.float32)

    qp_s, qpx_s = solver.predictor_seq(dom, st, dtini, st.t)
    eei, ffi, exi, fxi = solver._forward_elim_assoc(dom, st, dtini)
    qp_a, qpx_a = solver._predictor_tail(dom, st, dtini, st.t,
                                         eei, ffi, exi, fxi, assoc=True)
    valid = np.asarray(dom.valid)
    assert np.isfinite(np.asarray(qp_a)[valid]).all()
    scale = np.abs(np.asarray(qp_s)[valid]).max()
    np.testing.assert_allclose(np.asarray(qp_a)[valid],
                               np.asarray(qp_s)[valid],
                               rtol=2e-4, atol=2e-4 * scale)


def test_default_predictor_is_assoc_and_steps_match():
    """The production entry (diffusive_step) with the default predictor
    agrees with a step driven by the sequential form at fp-noise level."""
    rng = np.random.default_rng(3)
    reaches, ds, qlat, trib, dt = _random_network(rng, 6, 10)
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt)
    q0 = np.full((dom.n_reaches, dom.n_cols), 25.0)
    st = solver.initialize_state(dom, jnp.asarray(q0, jnp.float64),
                                 dtini_min=dt / solver.DTINI_DIVISOR,
                                 corrector_mode="jacobi")
    dtini = jnp.asarray(60.0, jnp.float64)

    st_a, mcd_a = solver.diffusive_step(dom, st, dtini, dt / 10.0,
                                        corrector_mode="jacobi")

    qp_s, qpx_s = solver.predictor_seq(dom, st, dtini, st.t)
    qp_a, qpx_a = solver.predictor(dom, st, dtini, st.t)
    valid = np.asarray(dom.valid)
    np.testing.assert_allclose(np.asarray(qp_a)[valid],
                               np.asarray(qp_s)[valid],
                               rtol=1e-10, atol=1e-12)
    # and the step's q is the predictor's q (same clamps)
    np.testing.assert_allclose(np.asarray(st_a.q)[valid],
                               np.asarray(qp_a)[valid],
                               rtol=1e-10, atol=1e-12)
