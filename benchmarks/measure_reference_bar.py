"""Measure the reference performance bar (BASELINE.md "measured parity bar").

The reference's Fortran/Cython kernels cannot be compiled here (no
Fortran toolchain — see CLAUDE.md), so the bar is *bracketed*: the scalar
Python oracles in tests/ are numerically exact executable specs of the
reference math (tests/reference_impl.py, tests/reference_diffusive.py —
verified to 1e-9 against our solvers, which are verified against real NWM
outputs), and compiled Fortran on one CPU core runs the same scalar loops
30-300x faster than CPython (the conventional bracket for tight float
loops; we use 100x as the central estimate and report the full bracket).

Run on the CPU backend:  python benchmarks/measure_reference_bar.py

Outputs one JSON line with measured oracle/CPU-JAX throughputs and the
bracketed single-core Fortran estimates the TPU numbers are judged
against.  The other published anchor is the NWM operational fleet
average: ~7e6 routing calcs/s across all forecast configurations
(/root/reference/doc/AGU_Poster.md:50-63).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))   # oracle modules import bare

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

FORTRAN_FACTOR = (30.0, 100.0, 300.0)  # (low, central, high) vs CPython


def _diffusive_tree(n_reaches=8, n_nodes=16, nts=24, dt=300.0):
    rng = np.random.default_rng(2)
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
    n_t = nts + 2
    qlat = np.full((n_t, n_reaches, n_nodes), 0.05)
    trib = np.full((n_t, n_reaches), 2.0)
    leaves = np.setdiff1d(np.arange(n_reaches), ds)
    trib[:, leaves] = rng.uniform(20, 80, leaves.size)
    return reaches, ds, qlat, trib, dt, nts


def measure_diffusive():
    from tests.reference_diffusive import ReferenceDiffusive
    from troute_tpu.diffusive.domain import build_domain
    from troute_tpu.diffusive.solver import initialize_state, run_diffusive

    reaches, ds, qlat, trib, dt, nts = _diffusive_tree()
    n_seg = sum(len(r["z"]) for r in reaches)

    # scalar oracle (the executable spec of diffusive.f90)
    ref = ReferenceDiffusive(reaches, ds, qlat, dt, trib, dt, dt)
    q0 = np.full((len(reaches), 16), 30.0)
    state = ref.initialize(q0)
    t0 = time.time()
    ref.run(state, nts * dt, dt)
    t_oracle = time.time() - t0
    oracle_rate = n_seg * nts / t_oracle

    # CPU-JAX solver, f64 jacobi (the framework's own CPU fallback)
    dom = build_domain(reaches, ds, qlat, dt, trib, dt, dt)
    st = initialize_state(dom, jnp.full((len(reaches), 16), 30.0,
                                        jnp.float64),
                          dtini_min=dt / 10.0, corrector_mode="jacobi")
    run_diffusive(dom, st, t_final=nts * dt, save_interval=dt,
                  corrector_mode="jacobi")      # warm compile
    t0 = time.time()
    run_diffusive(dom, st, t_final=nts * dt, save_interval=dt,
                  corrector_mode="jacobi")
    cpu_jax_rate = n_seg * nts / (time.time() - t0)
    return oracle_rate, cpu_jax_rate


def measure_mc(n=4096, nts=24, dt=300.0):
    from tests.reference_network import simulate_reference
    from troute_tpu.network.topology import build_topology
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (ChannelParams, RoutingConfig,
                                           network_arrays_from_topology,
                                           route)

    rng = np.random.default_rng(1)
    ids = np.arange(1, n + 1, dtype=np.int64)
    hop = rng.integers(1, 5, n)
    down = np.where(ids + hop <= n, ids + hop, 0)
    conn = {int(i): ([int(d)] if d else []) for i, d in zip(ids, down)}
    chan_cols = dict(
        dx=rng.uniform(500, 3000, n), bw=rng.uniform(2, 20, n),
        tw=rng.uniform(25, 60, n), twcc=rng.uniform(80, 200, n),
        n=np.full(n, 0.055), ncc=np.full(n, 0.11),
        cs=rng.uniform(0.3, 1.5, n), s0=rng.uniform(0.001, 0.02, n))
    q0v = rng.uniform(0.5, 5.0, n)
    d0v = rng.uniform(0.05, 0.8, n)
    qlat_cols = rng.uniform(0.1, 2.0, (n, 2))

    chan_ref = {int(i): {k: float(v[j]) for k, v in chan_cols.items()}
                for j, i in enumerate(ids)}
    q0_ref = {int(i): float(q0v[j]) for j, i in enumerate(ids)}
    d0_ref = {int(i): float(d0v[j]) for j, i in enumerate(ids)}
    ql_ref = {int(i): qlat_cols[j] for j, i in enumerate(ids)}

    t0 = time.time()
    simulate_reference(conn, chan_ref, q0_ref, d0_ref, ql_ref, nts, dt,
                       qts_subdivisions=nts // 2, assume_short_ts=True)
    oracle_rate = n * nts / (time.time() - t0)

    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    cp = ChannelParams(**{k: jnp.asarray(v, jnp.float32)
                          for k, v in chan_cols.items()})
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=nts // 2,
                        assume_short_ts=True)
    args = (net, cp, lp, cfg, jnp.asarray(q0v, jnp.float32),
            jnp.asarray(d0v, jnp.float32), jnp.zeros(1, jnp.float32),
            jnp.asarray(qlat_cols.T, jnp.float32), None)
    out = route(*args)
    jax.block_until_ready(out["flowveldepth"])      # warm compile
    t0 = time.time()
    out = route(*args)
    jax.block_until_ready(out["flowveldepth"])
    cpu_jax_rate = n * nts / (time.time() - t0)
    return oracle_rate, cpu_jax_rate


def main():
    d_oracle, d_jax = measure_diffusive()
    m_oracle, m_jax = measure_mc()
    lo, mid, hi = FORTRAN_FACTOR
    print(json.dumps({
        "mc_oracle_python_seg_ts_per_s": round(m_oracle, 1),
        "mc_cpu_jax_seg_ts_per_s": round(m_jax, 1),
        "mc_fortran_1core_est": [round(m_oracle * f, 1) for f in (lo, mid, hi)],
        "diffusive_oracle_python_seg_ts_per_s": round(d_oracle, 1),
        "diffusive_cpu_jax_f64_seg_ts_per_s": round(d_jax, 1),
        "diffusive_fortran_1core_est": [round(d_oracle * f, 1)
                                        for f in (lo, mid, hi)],
        "nwm_fleet_avg_calcs_per_s": 7.0e6,
        "fortran_factor_bracket": list(FORTRAN_FACTOR),
    }))


if __name__ == "__main__":
    main()
