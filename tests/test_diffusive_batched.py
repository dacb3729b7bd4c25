"""Batched independent diffusive domains ([B, R, C] vmap over the
single-dispatch device loop).

The reference runs ``diffnw`` once per tailwater domain, so every domain
gets its own adaptive ``calculateDT`` (diffusive.f90:942-991).  The
batched runner must therefore reproduce each domain's SOLO trajectory —
not the coupled-dt trajectory a merged single-[R, C] domain would give.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from troute_tpu.diffusive.domain import build_domain, stack_domains, \
    stack_states
from troute_tpu.diffusive.solver import (
    DTINI_DIVISOR, initialize_state, run_diffusive, run_diffusive_batched)


def _prism_reach(n_nodes=12, dx=1500.0, bo=20.0, traps=1.0, tw=60.0,
                 twcc=180.0, mann=0.035, manncc=0.07, s0=0.0008, z0=100.0):
    z = z0 - s0 * dx * np.arange(n_nodes)
    ones = np.ones(n_nodes)
    return dict(z=z, dx=np.full(n_nodes, dx), bo=bo * ones,
                traps=traps * ones, tw=tw * ones, twcc=twcc * ones,
                mann=mann * ones, manncc=manncc * ones)


def _domains(nts=36, dt=300.0):
    """Three heterogeneous domains: a short steep single reach, a long
    mild single reach (different C), and a 3-reach junction tree
    (different R) — distinct celerities force distinct adaptive-dt
    trajectories."""
    doms = []
    # steep + short
    r = _prism_reach(n_nodes=8, s0=0.004, dx=900.0)
    qlat = np.zeros((nts, 1, 8))
    trib = np.full((nts, 1), 90.0)
    trib[nts // 3:] = 140.0
    doms.append(build_domain([r], [-1], qlat, dt, trib, dt, dt))
    # mild + long
    r = _prism_reach(n_nodes=20, s0=0.0004, dx=2200.0, bo=35.0, tw=100.0)
    qlat = np.zeros((nts, 1, 20))
    qlat[4:12, 0, 6] = 0.04
    trib = np.full((nts, 1), 220.0)
    doms.append(build_domain([r], [-1], qlat, dt, trib, dt, dt))
    # junction tree
    r1 = _prism_reach(n_nodes=10, z0=120.0)
    r2 = _prism_reach(n_nodes=10, z0=121.0)
    r3 = _prism_reach(n_nodes=12, z0=100.0 - 0.0008 * 1500.0)
    qlat = np.zeros((nts, 3, 12))
    trib = np.zeros((nts, 3))
    trib[:, 0] = 60.0
    trib[:, 1] = 40.0
    doms.append(build_domain([r1, r2, r3], [2, 2, -1], qlat, dt, trib,
                             dt, dt))
    return doms


@pytest.mark.parametrize("mode", ["wavefront", "jacobi"])
def test_batched_matches_solo(mode):
    """Each lane of the batched run equals that domain routed alone
    through the same device-dispatch loop."""
    nts, dt = 36, 300.0
    doms = _domains(nts, dt)
    q0s = [jnp.full((d.n_reaches, d.n_cols), 80.0, jnp.float64)
           for d in doms]
    sts = [initialize_state(d, q0, dtini_min=dt / DTINI_DIVISOR,
                            corrector_mode=mode)
           for d, q0 in zip(doms, q0s)]
    t_final = nts * dt

    solo = [run_diffusive(d, s, t_final=t_final, save_interval=dt,
                          corrector_mode=mode, dispatch="device")
            for d, s in zip(doms, sts)]

    bdom = stack_domains(doms)
    B, R, C = bdom.z.shape
    assert (B, R, C) == (3, 3, 20)
    bst = stack_states(sts, doms, C, R)
    bfin, bsaves = run_diffusive_batched(bdom, bst, t_final=t_final,
                                         save_interval=dt,
                                         corrector_mode=mode)
    assert len(bsaves) == len(solo[0][1]) == nts

    for b, d in enumerate(doms):
        fin, saves = solo[b]
        dR, dC = d.n_reaches, d.n_cols
        v = np.asarray(d.valid)
        # final state, valid nodes only (padded lanes carry garbage)
        for fld in ("q", "y", "celerity", "diffusivity"):
            a = np.asarray(getattr(bfin, fld))[b, :dR, C - dC:]
            e = np.asarray(getattr(fin, fld))
            np.testing.assert_allclose(a[v], e[v], rtol=1e-12, atol=0,
                                       err_msg=f"{fld} lane {b}")
        assert float(bfin.t[b]) == pytest.approx(float(fin.t), abs=1e-6)
        # every save slot (lanes step at different internal dts, so this
        # checks the save bookkeeping survives the batched while_loop)
        for k in range(nts):
            _, qk, yk = bsaves[k]
            _, qe, ye = saves[k]
            np.testing.assert_allclose(
                np.asarray(qk)[b, :dR, C - dC:][v], np.asarray(qe)[v],
                rtol=1e-12, err_msg=f"q save {k} lane {b}")
            np.testing.assert_allclose(
                np.asarray(yk)[b, :dR, C - dC:][v], np.asarray(ye)[v],
                rtol=1e-12, err_msg=f"y save {k} lane {b}")


def test_batched_sharded_over_mesh():
    """Lanes sharded over the 8-device mesh reproduce the unsharded
    batched run to f64 ulp level (the partitioned program fuses
    differently, so last-bit equality isn't guaranteed) — tailwater
    domains are independent, so the batch axis partitions with no
    cross-device communication beyond the while_loop's
    continue-condition reduce."""
    import jax
    from jax.sharding import Mesh

    from troute_tpu.diffusive.solver import shard_batched_domains

    nts, dt = 24, 300.0
    doms = _domains(nts, dt)
    q0s = [jnp.full((d.n_reaches, d.n_cols), 80.0, jnp.float64)
           for d in doms]
    sts = [initialize_state(d, q0, dtini_min=dt / DTINI_DIVISOR,
                            corrector_mode="jacobi")
           for d, q0 in zip(doms, q0s)]
    t_final = nts * dt
    bdom = stack_domains(doms)
    B, R, C = bdom.z.shape
    bst = stack_states(sts, doms, C, R)
    ref_fin, ref_saves = run_diffusive_batched(
        bdom, bst, t_final=t_final, save_interval=dt,
        corrector_mode="jacobi")

    mesh = Mesh(np.array(jax.devices()[:8]), ("lane",))
    sdom, sst, b_real = shard_batched_domains(bdom, bst, mesh)
    assert b_real == B and sdom.z.shape[0] == 8
    got_fin, got_saves = run_diffusive_batched(
        sdom, sst, t_final=t_final, save_interval=dt,
        corrector_mode="jacobi")

    for fld in ("q", "y", "t"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_fin, fld))[:b_real],
            np.asarray(getattr(ref_fin, fld)), rtol=1e-12, atol=1e-12,
            err_msg=fld)
    for k in range(nts):
        np.testing.assert_allclose(np.asarray(got_saves[k][1])[:b_real],
                                   np.asarray(ref_saves[k][1]),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_saves[k][2])[:b_real],
                                   np.asarray(ref_saves[k][2]),
                                   rtol=1e-12, atol=1e-12)


def test_batched_adaptive_dt_is_per_domain():
    """A merged single-domain run couples dt across tailwaters; the
    batched run must NOT (reference semantics).  The steep short domain
    takes a different internal-step trajectory than the mild long one —
    verify the batch reproduces each solo answer even though a merged
    [R, C] domain (same reaches, ds_reach=-1 each) does not."""
    nts, dt = 24, 300.0
    doms = _domains(nts, dt)[:2]
    q0s = [jnp.full((d.n_reaches, d.n_cols), 80.0, jnp.float64)
           for d in doms]
    sts = [initialize_state(d, q0, dtini_min=dt / DTINI_DIVISOR)
           for d, q0 in zip(doms, q0s)]
    t_final = nts * dt
    solo = [run_diffusive(d, s, t_final=t_final, save_interval=dt,
                          dispatch="device")[1]
            for d, s in zip(doms, sts)]

    # merged: both tailwater trees in ONE [R, C] domain -> shared dt
    r_steep = _prism_reach(n_nodes=8, s0=0.004, dx=900.0)
    r_mild = _prism_reach(n_nodes=20, s0=0.0004, dx=2200.0, bo=35.0,
                          tw=100.0)
    qlat = np.zeros((nts, 2, 20))
    qlat[4:12, 1, 20 - 20 + 6] = 0.04
    trib = np.zeros((nts, 2))
    trib[:, 0] = 90.0
    trib[nts // 3:, 0] = 140.0
    trib[:, 1] = 220.0
    merged = build_domain([r_steep, r_mild], [-1, -1], qlat, dt, trib,
                          dt, dt)
    mq0 = jnp.full((2, merged.n_cols), 80.0, jnp.float64)
    mst = initialize_state(merged, mq0, dtini_min=dt / DTINI_DIVISOR)
    _, msaves = run_diffusive(merged, mst, t_final=t_final,
                              save_interval=dt, dispatch="device")

    bdom = stack_domains(doms)
    B, R, C = bdom.z.shape
    bst = stack_states(sts, doms, C, R)
    _, bsaves = run_diffusive_batched(bdom, bst, t_final=t_final,
                                      save_interval=dt)

    # compare the MILD domain mid-pulse (save slot 8): in the merged run
    # its dt is dragged down to the steep domain's CFL limit, shifting
    # the transient; the batched lane must match the solo trajectory
    k = 8
    v1 = np.asarray(doms[1].valid)
    q_solo = np.asarray(solo[1][k][1])[v1]
    q_batch = np.asarray(bsaves[k][1])[1, :1, C - doms[1].n_cols:][v1]
    q_merged = np.asarray(msaves[k][1])[1:2][
        np.asarray(merged.valid)[1:2]]
    np.testing.assert_allclose(q_batch, q_solo, rtol=1e-12)
    # the merged run is a (slightly) different trajectory — shared dt
    assert not np.allclose(q_merged, q_solo, rtol=1e-9)


def test_stack_series_extension_preserves_values():
    """Time-series padding must not change interpolated values."""
    from troute_tpu.diffusive.domain import _extend_series
    from troute_tpu.diffusive.solver import _interp_series
    rng = np.random.default_rng(3)
    s = rng.uniform(1.0, 5.0, (5, 2))
    e = _extend_series(s, 9)
    assert e.shape == (9, 2)
    for t in [0.0, 0.4, 1.9, 3.999, 4.0, 5.5, 7.2]:
        np.testing.assert_allclose(
            np.asarray(_interp_series(jnp.asarray(e), 1.0, t)),
            np.asarray(_interp_series(jnp.asarray(s), 1.0, t)),
            rtol=1e-12)
