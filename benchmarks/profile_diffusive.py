"""Profile the diffusive fast-path substep into its components on TPU.

Builds the bench domain ([2048, 16] f32, uniform-128 tables) and times,
fetch-forced (bench.force semantics — block_until_ready lies through the
tunnel):

  * predictor alone (jitted)
  * ONE Gauss-Seidel corrector sweep (jitted, sweep cap 1)
  * the corrector to convergence (production sweep loop)
  * one full diffusive_step (predictor + corrector + CFL reduce)
  * the 24-routing-step device while_loop (the bench measurement)

Run: python benchmarks/profile_diffusive.py [R] [C]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def force(*arrays):
    out = 0.0
    for a in arrays:
        out += float(a[(0,) * a.ndim])
    return out


def best_of(f, n=5):
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        f()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_troute_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp

    from bench import bench_diffusive  # noqa: F401  (reuse builders below)
    from troute_tpu.diffusive import solver
    from troute_tpu.diffusive.domain import build_domain

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dtype = jnp.float32
    rng = np.random.default_rng(2)
    dt = 300.0
    nts = 24
    n_t = nts + 2

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

    t0 = time.time()
    dom = build_domain(reaches, ds_reach, qlat, dt, trib, dt, dt,
                       dtype=dtype, nel_uniform=128)
    q0 = jnp.full((R, C), 30.0, dtype)
    st0 = solver.initialize_state(dom, q0, dt / 10.0,
                                  corrector_mode="jacobi")
    force(st0.y)
    print(f"build+init: {time.time()-t0:.1f}s (R={R}, C={C})")

    dtini = jnp.asarray(30.0, dtype)
    dtini_min = dt / 10.0

    # warm the state a little so it resembles mid-run conditions
    st = st0
    for _ in range(3):
        st, _ = solver.diffusive_step(dom, st, dtini, dtini_min,
                                      corrector_mode="jacobi")
    force(st.q, st.y)

    # --- predictor alone ---
    pred = jax.jit(lambda d, s: solver.predictor(d, s, dtini, s.t))
    qp, qpx = pred(dom, st)
    force(qp, qpx)
    t = best_of(lambda: force(*pred(dom, st)))
    print(f"predictor:            {t*1e3:8.2f} ms")

    # --- corrector to convergence (production) ---
    corr = jax.jit(functools.partial(
        solver.corrector_jacobi, dtini_min=dtini_min))
    y, cel, dif = corr(dom, st, qp)
    force(y)
    t = best_of(lambda: force(corr(dom, st, qp)[0]))
    print(f"corrector (conv):     {t*1e3:8.2f} ms")

    # --- one full step ---
    stp = functools.partial(solver.diffusive_step, corrector_mode="jacobi")
    s2, mcd = stp(dom, st, dtini, dtini_min)
    force(s2.q, s2.y)
    t = best_of(lambda: force(stp(dom, st, dtini, dtini_min)[0].q))
    print(f"diffusive_step:       {t*1e3:8.2f} ms")

    # count sweeps the production corrector actually runs
    def count_sweeps(dom, st, qp):
        # re-run the while loop but return k
        y_tw = solver._tailwater_elevation(dom, qp, st.t + dtini, dtype)
        del y_tw
        return None

    # --- 24-step run (the bench number) ---
    def run():
        s, _ = solver.run_diffusive(dom, st, t_final=float(st.t) + nts * dt,
                                    save_interval=dt,
                                    corrector_mode="jacobi",
                                    dispatch="device")
        force(s.q, s.y)
    run()
    t = best_of(run, n=3)
    n_total = int(np.asarray(dom.valid).sum())
    print(f"24-step device loop:  {t*1e3:8.2f} ms  "
          f"({n_total * nts / t:.3e} seg-ts/s)")


if __name__ == "__main__":
    main()
