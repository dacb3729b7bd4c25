"""Where does the diffusive fast path's in-loop substep cost sit?
(VERDICT r4 #7 groundwork.)  Times, amortized inside one jit via
fori_loop at [2048, 16] f32 uniform-128 on the real chip:

  - predictor alone
  - corrector_jacobi alone (its internal sweep while_loop)
  - the full substep (predictor + corrector, as the production loop
    composes them)

Run:  python benchmarks/probe_diffusive_substep.py
"""
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_troute_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import force
from troute_tpu.diffusive.domain import build_domain
from troute_tpu.diffusive.solver import (DiffusiveState, corrector_jacobi,
                                         initialize_state, predictor)

K = 10
R, C = 2048, 16


def build():
    rng = np.random.default_rng(2)
    dt = 300.0
    n_t = 26
    level = np.zeros(R, np.int64)
    ds_reach = np.full(R, -1, np.int64)
    for j in range(1, R):
        ds_reach[j] = (j - 1) // 2
        level[j] = level[ds_reach[j]] + 1
    dx = 1500.0
    s0 = 0.0005
    reaches = []
    for j in range(R):
        z_head = (level[j] + 1) * C * dx * s0
        z = z_head - s0 * dx * np.arange(C)
        ones = np.ones(C)
        reaches.append(dict(
            z=z, dx=np.full(C, dx),
            bo=rng.uniform(15, 40) * ones, traps=ones.copy(),
            tw=rng.uniform(60, 120) * ones,
            twcc=rng.uniform(200, 400) * ones,
            mann=0.035 * ones, manncc=0.07 * ones))
    qlat = np.full((n_t, R, C), 0.05)
    trib = np.full((n_t, R), 2.0)
    leaves = np.setdiff1d(np.arange(R), ds_reach)
    trib[:, leaves] = rng.uniform(20, 80, leaves.size)
    dom = build_domain(reaches, ds_reach, qlat, dt, trib, dt, dt,
                       dtype=jnp.float32, nel_uniform=128)
    q0 = jnp.full((R, C), 30.0, jnp.float32)
    st = initialize_state(dom, q0, dt / 10.0, corrector_mode="jacobi")
    return dom, st


def main():
    dom, st = build()
    dtini = jnp.asarray(60.0, jnp.float32)
    dtini_min = 30.0

    # dom must be an ARGUMENT: closing over it ships the 700 MB xsec
    # table as a compile-payload constant (remote_compile HTTP 413)
    @jax.jit
    def pred_k(dom, st):
        def body(_, s):
            qp, qpx = predictor(dom, s, dtini, s.t)
            return s._replace(q=qp, qpx=qpx)
        return jax.lax.fori_loop(0, K, body, st)

    @jax.jit
    def corr_k(dom, st):
        def body(_, s):
            newY, cel, dif = corrector_jacobi(dom, s, s.q, dtini_min,
                                              t_next=s.t)
            return s._replace(y=newY, celerity=cel, diffusivity=dif)
        return jax.lax.fori_loop(0, K, body, st)

    @jax.jit
    def substep_k(dom, st):
        def body(_, s):
            qp, qpx = predictor(dom, s, dtini, s.t)
            newY, cel, dif = corrector_jacobi(dom, s, qp, dtini_min,
                                              t_next=s.t)
            return DiffusiveState(q=qp, y=newY, qpx=qpx, celerity=cel,
                                  diffusivity=dif, t=s.t)
        return jax.lax.fori_loop(0, K, body, st)

    for name, fn in (("predictor", pred_k), ("corrector", corr_k),
                     ("full substep", substep_k)):
        print(f"compiling {name}...", flush=True)
        t0 = time.time()
        out = fn(dom, st)
        force(out.q, out.y)
        print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
        best = np.inf
        for _ in range(4):
            t0 = time.time()
            out = fn(dom, st)
            force(out.q, out.y)
            best = min(best, time.time() - t0)
        print(f"{name}: {best/K*1000:.3f} ms/iter (K={K}, best total "
              f"{best:.3f}s)")


if __name__ == "__main__":
    main()
