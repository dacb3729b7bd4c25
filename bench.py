"""Benchmark: CONUS-scale routing throughput (MC + diffusive) on one chip.

Builds a synthetic river network with CONUS NWM statistics (2,729,077
segments, ~14.7k independent basins, junction-rich topology, CONUS
parameter distributions), routes it in production configuration
(``assume_short_ts=True``, dt=300 s, f32) on the default JAX backend (the
real TPU chip under the driver), and reports segment-timesteps/second.

Also benches the diffusive-wave solver on a CONUS-mainstem-scale
synthetic binary reach tree (2,048 reaches x 16 nodes, ~33k nodes — the
scale of the NWM Mainstems diffusive domain, ``doc/AGU_Poster.md:37-51``)
through the single-dispatch device loop, in f32 and in f64 (reference
precision; emulated on TPU).

Baseline: the reference publishes no absolute throughput; the only
operational number is the NWM production load of ~7e6 routing
calculations/second averaged across all forecast configurations
(``doc/AGU_Poster.md:50-63``).  ``vs_baseline`` is measured throughput
relative to that.
"""

import json
import sys
import time

import numpy as np


def force(*arrays):
    """Force completion by round-tripping a value derived from EVERY
    array in ONE device->host transfer.

    ``jax.block_until_ready`` through the tunneled TPU runtime returns
    early for some programs (measured: a 2.2 s dispatch reported "ready"
    in 7 ms), so honest timing must round-trip a value.  A separate
    ``float(a[0])`` per output costs one ~30 ms tunnel round trip EACH;
    combining one element of each output on device (the jitted sum
    depends on all input buffers, so fetching it proves every output
    completed) keeps the forcing honest at a single round trip.
    """
    return float(_force_combiner(*arrays))


def _make_force_combiner():
    import jax

    @jax.jit
    def f(*arrays):
        s = None
        for a in arrays:
            v = a.ravel()[0].astype("float32")
            s = v if s is None else s + v
        return s
    return f


_FORCE_FN = []    # deferred jit construction: bench legs run in
                  # subprocesses that must not touch the backend at import


def _force_combiner(*arrays):
    if not _FORCE_FN:
        _FORCE_FN.append(_make_force_combiner())
    return _FORCE_FN[0](*arrays)

CONUS_SEGMENTS = 2_729_077
CONUS_BASINS = 14_713
BASELINE_CALCS_PER_S = 7.0e6


def tenancy_probe():
    """Fixed reference kernel timing the chip's CURRENT contention state
    (VERDICT r4 #4): 64 chained 4096x4096 bf16 matmuls (~8.8e12 flops,
    ~45 ms at v5e bf16 peak), jitted once, fetch-forced, best of 3.
    The shared tunneled chip varies ~5x run-to-run; recording this at
    the start and end of every bench run makes 'tenancy or regression?'
    answerable when comparing BENCH_r{N} files: workload numbers should
    be compared at similar probe readings."""
    import jax
    import jax.numpy as jnp

    dim, iters = 4096, 64

    @jax.jit
    def f(x):
        return jax.lax.fori_loop(
            0, iters, lambda _, a: (a @ a) * (1.0 / dim), x)

    x = jnp.full((dim, dim), 1e-2, jnp.bfloat16)
    force(f(x))                    # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        force(f(x))
        best = min(best, time.time() - t0)
    return round(best, 4)


def synthetic_conus(n=CONUS_SEGMENTS, n_basins=CONUS_BASINS, span=4, seed=0):
    """Synthetic CONUS drainage forest.

    Basin sizes follow the real skew — the Mississippi drains ~45% of
    CONUS segments and a handful of other majors (Columbia, Colorado,
    Rio Grande, ...) another ~25% (``doc/AGU_Poster.md:211-214``: the
    largest basin is ~half the network, which is why by-network
    parallelism tops out at ~2x); the remaining ~14.7k coastal basins
    share the rest with lognormal sizes.  Within a basin, random forward
    hops of span<=4 give ~32% headwaters / ~26% junction segments,
    bracketing the NWM NHD+ ratios (1.03M junctions / 2.73M segments,
    ``doc/AGU_Poster.md:37-41``).
    """
    rng = np.random.default_rng(seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    idx = np.arange(n)
    majors = np.array([0.45, 0.06, 0.05, 0.035, 0.03, 0.02,
                       0.015, 0.012, 0.01, 0.008])
    sizes = (majors * n).astype(np.int64)
    n_small = n_basins - sizes.size
    small = rng.lognormal(0.0, 1.2, n_small)
    rest = n - sizes.sum()
    small = np.maximum((small / small.sum() * rest).astype(np.int64), 1)
    sizes = np.concatenate([sizes, small])
    sizes[-1] += n - sizes.sum()           # exact total
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    basin_of = np.searchsorted(bounds, idx, side="right") - 1
    basin_end = bounds[basin_of + 1] - 1
    hop = rng.integers(1, span + 1, n)
    j = np.minimum(idx + hop, basin_end)
    down = ids[j]
    down[idx == basin_end] = 0   # tailwaters
    return ids, down


def channel_params(n, rng):
    return dict(
        dx=rng.uniform(500, 3000, n).astype(np.float32),
        bw=rng.uniform(2, 20, n).astype(np.float32),
        tw=rng.uniform(25, 60, n).astype(np.float32),
        twcc=rng.uniform(80, 200, n).astype(np.float32),
        n=np.full(n, 0.055, np.float32),
        ncc=np.full(n, 0.11, np.float32),
        cs=rng.uniform(0.3, 1.5, n).astype(np.float32),
        s0=rng.uniform(0.001, 0.02, n).astype(np.float32))


def bench_diffusive(n_reaches=None, n_nodes=16, dtype_name="float64",
                    nel_uniform=None):
    """Diffusive seg-ts/s on a mainstem-scale synthetic binary reach tree.

    Throughput counts routing timesteps (dt=300 s over a 2 h window), the
    same accounting as the MC metric; the solver internally takes CFL-
    adaptive sub-steps.
    """
    import jax
    import jax.numpy as jnp
    from troute_tpu.diffusive.domain import build_domain
    from troute_tpu.diffusive.solver import initialize_state, run_diffusive

    if n_reaches is None:
        # f64 is emulated on TPU (double the program+memory footprint);
        # R=2048 f64 faults the tunneled worker, R=1024 runs fine
        n_reaches = 1024 if dtype_name == "float64" else 2048
    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    rng = np.random.default_rng(2)
    dt = 300.0
    nts = 24                     # 2 h window at routing dt
    n_t = nts + 2

    # binary tree of reaches: reach j drains to (j-1)//2, reach 0 = TW
    level = np.zeros(n_reaches, np.int64)
    ds_reach = np.full(n_reaches, -1, np.int64)
    for j in range(1, n_reaches):
        ds_reach[j] = (j - 1) // 2
        level[j] = level[ds_reach[j]] + 1
    dx = 1500.0
    s0 = 0.0005
    reaches = []
    for j in range(n_reaches):
        z_head = (level[j] + 1) * n_nodes * dx * s0
        z = z_head - s0 * dx * np.arange(n_nodes)
        ones = np.ones(n_nodes)
        reaches.append(dict(
            z=z, dx=np.full(n_nodes, dx),
            bo=rng.uniform(15, 40) * ones, traps=ones.copy(),
            tw=rng.uniform(60, 120) * ones, twcc=rng.uniform(200, 400) * ones,
            mann=0.035 * ones, manncc=0.07 * ones))
    qlat = np.full((n_t, n_reaches, n_nodes), 0.05)
    # tributary inflow at leaf heads; small contribution elsewhere
    trib = np.full((n_t, n_reaches), 2.0)
    leaves = np.setdiff1d(np.arange(n_reaches), ds_reach)
    trib[:, leaves] = rng.uniform(20, 80, leaves.size)

    t0 = time.time()
    dom = build_domain(reaches, ds_reach, qlat, dt, trib, dt, dt,
                       dtype=dtype, nel_uniform=nel_uniform)
    n_total = int(np.asarray(dom.valid).sum())
    q0 = jnp.full((n_reaches, n_nodes), 30.0, dtype)
    st0 = initialize_state(dom, q0, dt / 10.0, corrector_mode="jacobi")
    force(st0.y)
    print(f"diffusive[{dtype_name}] domain build+init: "
          f"{time.time()-t0:.1f}s (R={n_reaches}, C={n_nodes})",
          file=sys.stderr)

    def run():
        st, saves = run_diffusive(dom, st0, t_final=nts * dt,
                                  save_interval=dt,
                                  corrector_mode="jacobi",
                                  dispatch="device")
        force(st.q, st.y)
        return st

    t0 = time.time()
    st = run()
    print(f"diffusive[{dtype_name}] first run (compile+exec): "
          f"{time.time()-t0:.1f}s", file=sys.stderr)
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        st = run()
        best = min(best, time.time() - t0)
    assert np.isfinite(np.asarray(st.q)).all()
    assert np.isfinite(np.asarray(st.y)).all()
    seg_ts_per_s = n_total * nts / best
    print(f"diffusive[{dtype_name}] steady-state: {best:.3f}s for {nts} "
          f"routing steps -> {seg_ts_per_s:.3e} seg-ts/s", file=sys.stderr)
    return seg_ts_per_s


def _diffusive_subprocess(dtype_name: str, nel_uniform: int = 0):
    """Run one diffusive bench in a fresh process: f64 needs
    jax_enable_x64, which must not leak into the f32 MC Pallas kernel
    (Mosaic rejects stray f64 scalars in 32-bit kernels)."""
    import subprocess
    r = subprocess.run([sys.executable, __file__, "--diffusive", dtype_name,
                        str(nel_uniform)],
                       capture_output=True, text=True, timeout=1800)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        raise RuntimeError(f"diffusive bench subprocess failed: "
                           f"{r.stderr[-500:]}")
    return float(r.stdout.strip().splitlines()[-1])


def bench_sharded_1dev(net, topo, chan, cfg, q_w, d_w, qlats, n, nts):
    """The production multi-device driver (host-stepped shard_map +
    Pallas block kernel + ppermute halo, parallel/stepped_engine.py) on a
    1-device mesh of the real chip — de-risks the flagship sharded path
    on TPU hardware (multi-device coverage runs on the virtual CPU mesh)
    and records its per-chip throughput.  Asserts the final flows match
    the single-device stepped path: both sides run the SAME Pallas
    kernel and banded-plan ordering, so on a 1-device mesh the result is
    expected bit-identical.
    Replaces: the reference's by-subnetwork scheduler, compute.py:553-907.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from troute_tpu.parallel.partition import partition_network
    from troute_tpu.parallel.sharded_engine import build_sharded_inputs
    from troute_tpu.parallel.stepped_engine import route_sharded_stepped

    mesh = Mesh(np.array(jax.devices()[:1]), ("basin",))
    part = partition_network(topo, 1)
    inp = build_sharded_inputs(
        part, topo, chan, None, np.asarray(q_w), np.asarray(d_w), {},
        np.asarray(qlats[0], np.float32))

    def run():
        res = route_sharded_stepped(
            mesh, inp, cfg.dt, nts, qts_subdivisions=cfg.qts_subdivisions,
            band_shifts=part.band_shifts)
        force(res.q)
        return res

    res = run()
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        res = run()
        best = min(best, time.time() - t0)
    rate = n * nts / best
    print(f"sharded 1-dev TPU (stepped driver): {best:.3f}s for {nts} "
          f"steps -> {rate:.3e} seg-ts/s", file=sys.stderr)

    # consistency vs the single-device stepped path on the same inputs
    from troute_tpu.routing.engine import route_stepped
    from troute_tpu.ops.levelpool import LevelpoolParams
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    out = route_stepped(net, chan_params_dev(chan), lp, cfg, q_w, d_w,
                        jnp.zeros(1, jnp.float32), qlats[0], None,
                        collect=False)
    q_ref = out["state"].q
    # consistency on a sample of slots (a full 2.7M per-lane gather is a
    # latency-bound op; 8k rows decide the check just as well)
    rows = np.asarray(part.global_row[0])
    slots = np.linspace(0, rows.size - 1, 8192).astype(np.int64)
    slots = slots[rows[slots] >= 0]
    q_sh_s = res.q[0][jnp.asarray(slots)]
    q_ref_s = q_ref[jnp.asarray(rows[slots])]
    rel = float(jnp.max(jnp.abs(q_sh_s - q_ref_s)
                        / jnp.maximum(jnp.abs(q_ref_s), 1.0)))
    print(f"sharded-vs-stepped sampled max rel diff: {rel:.2e}",
          file=sys.stderr)
    # same kernel + same summation order on both sides (VERDICT r3 #2):
    # the bar is 1e-5; bit-exact is the expected result on 1 device
    assert rel < 1e-5, rel
    return rate, rel


def partition_scaling_stats(topo, step_ms_1dev):
    """8-way CONUS partition accounting + projected 8-chip efficiency
    (VERDICT r4 #3/#8; full N-sweep + CPU-mesh measured exchange share
    in benchmarks/multichip_scaling.py -> SCALING.json).  Assumptions:
    v5e ICI ~45 GB/s usable per link, ~1.5 us per small message."""
    from troute_tpu.parallel.partition import (balanced_assignment,
                                               partition_network)
    t0 = time.time()
    assign = balanced_assignment(topo, 8)
    part = partition_network(topo, 8, assign)
    sizes = np.bincount(assign, minlength=8)
    balance = float(sizes.max() / sizes.mean())
    assert balance <= 1.15, balance
    rounds = int(part.perm_pairs.shape[0])
    halo_vals = int((part.halo_src_dev >= 0).sum(axis=1).max())
    per_exchange_us = rounds * 1.5 + halo_vals * 4 / 45e3
    t_comp_us = step_ms_1dev * 1e3 / 8
    eff = t_comp_us / (t_comp_us + per_exchange_us)
    print(f"8-way partition: balance {balance:.3f}, "
          f"{part.cut_edges} cut edges, {rounds} ppermute rounds, "
          f"projected 8-chip efficiency {eff:.4f} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)
    return {
        "partition_8way_cut_edges": int(part.cut_edges),
        "partition_8way_balance_max_over_mean": round(balance, 4),
        "partition_8way_ppermute_rounds": rounds,
        "halo_bytes_per_step": int(part.cut_edges) * 4,
        "projected_8chip_efficiency": round(eff, 6),
    }


def chan_params_dev(chan):
    import jax.numpy as jnp
    from troute_tpu.routing.engine import ChannelParams
    return ChannelParams(**{k: jnp.asarray(v) for k, v in chan.items()})


def main():
    # diffusive legs run FIRST, in subprocesses, BEFORE this process
    # initializes the TPU runtime: two processes attached to the
    # tunneled chip contend (measured: 478 s build+init contended vs
    # ~20 s alone).  (name, dtype, nel_uniform): uniform-128 f32 is the
    # production fast path (hybrid_parameters.diffusive_table_nel;
    # accuracy study in tests/test_diffusive_uniform.py); exact-table
    # legs are the reference-parity modes.
    diff = {}
    for name, dtype_name, nelu in (
            ("f32_uniform128", "float32", 128),
            ("f64", "float64", 0),
            ("f32", "float32", 0)):
        try:
            diff[name] = round(_diffusive_subprocess(dtype_name, nelu), 1)
        except Exception as e:       # keep the headline metric robust
            print(f"diffusive[{name}] bench failed: {e!r}",
                  file=sys.stderr)
            diff[name] = None

    # real-domain hybrid (Laura natural bathymetry): TPU leg first (own
    # process, before this process attaches to the chip), then the CPU
    # consistency leg.  The LowerColorado_TX_v4 diffusive configs cannot
    # run here: their domain data (LowerColorado_NGEN_v201.gpkg,
    # diffusive_domain_hyf_v201.yaml) is absent from this checkout.
    laura_tpu = laura_cpu = laura_rel = None
    try:
        import tempfile
        ldir = tempfile.mkdtemp()
        laura_tpu = _laura_subprocess("tpu", f"{ldir}/tpu.npy")
        laura_cpu = _laura_subprocess("cpu", f"{ldir}/cpu.npy")
        a = np.load(f"{ldir}/tpu.npy")
        b = np.load(f"{ldir}/cpu.npy")
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1.0)
        laura_rel = float(np.median(rel))
        print(f"laura hybrid tpu-vs-cpu rel diff: median "
              f"{laura_rel:.2e}, max {rel.max():.2e}", file=sys.stderr)
        # same f32 program on both backends: differences are rounding-
        # mode/fusion-order only, amplified through the adaptive-dt loop
        assert laura_rel < 1e-2, laura_rel
    except Exception as e:
        print(f"laura hybrid bench failed: {e!r}", file=sys.stderr)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_troute_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from troute_tpu.network.topology import build_topology
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology,
        route_stepped)

    # contention calibration bracketing the on-chip legs (VERDICT r4 #4)
    try:
        probe_start = tenancy_probe()
        print(f"tenancy probe (start): {probe_start:.4f}s", file=sys.stderr)
    except Exception as e:
        print(f"tenancy probe failed: {e!r}", file=sys.stderr)
        probe_start = None

    n = CONUS_SEGMENTS
    nts = 24
    dt = 300.0
    rng = np.random.default_rng(1)

    t0 = time.time()
    ids, down = synthetic_conus(n)
    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    chan = channel_params(n, rng)
    cp = ChannelParams(**{k: jnp.asarray(v) for k, v in chan.items()})
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), jnp.float32)
    # a rotation of forcing windows: production AnA feeds fresh qlateral
    # every cycle, so each benchmark window gets different forcing
    qlats = [jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), jnp.float32)
             for _ in range(4)]
    print(f"preprocess+transfer: {time.time()-t0:.1f}s "
          f"(N={n}, depth={topo.n_levels})", file=sys.stderr)

    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=nts // 2,
                        assume_short_ts=True, kernel="pallas")

    zeros1 = jnp.zeros(1, jnp.float32)

    def run(q, d, qlat):
        out = route_stepped(net, cp, lp, cfg, q, d, zeros1, qlat, None)
        force(out["flowveldepth"], out["state"].q, out["state"].depth)
        return out

    t0 = time.time()
    out = run(q0, d0, qlats[0])
    print(f"first run (compile+exec): {time.time()-t0:.1f}s", file=sys.stderr)

    # Cold start: every rep re-routes the same random initial state (the
    # secant iterates ~10 trips/block on random depths — worst case).
    # The tunneled chip shows large run-to-run variance (shared
    # tenancy); each rep is tens of ms, so take the best of 10.
    best_cold = np.inf
    for _ in range(10):
        t0 = time.time()
        out = run(q0, d0, qlats[0])
        best_cold = min(best_cold, time.time() - t0)
    print(f"cold-start: {best_cold:.3f}s for {nts} steps -> "
          f"{n * nts / best_cold:.3e} segment-timesteps/s", file=sys.stderr)

    # Warm regime (the operational pattern): consecutive 24-step windows
    # of ONE continuous simulation, state handed forward and fresh
    # forcing each window — exactly how AnA cycles run (reference
    # __main__.py run-set loop).  Depths start each window converged, so
    # the secant exits in few trips.  This is the headline number; the
    # cold number above is the worst case.
    q_w, d_w = out["state"].q, out["state"].depth
    for i in range(3):                                   # warm-up windows
        out = run(q_w, d_w, qlats[(i + 1) % len(qlats)])
        q_w, d_w = out["state"].q, out["state"].depth
    best = np.inf
    for i in range(10):
        t0 = time.time()
        out = run(q_w, d_w, qlats[i % len(qlats)])
        best = min(best, time.time() - t0)
        q_w, d_w = out["state"].q, out["state"].depth
    # full finiteness check as a device-side reduction (a host transfer
    # of the 2.7M-element array takes minutes through the tunnel)
    assert bool(jnp.isfinite(out["state"].q).all()), \
        "non-finite flows in benchmark run"

    seg_ts_per_s = n * nts / best
    print(f"warm steady-state: {best:.3f}s for {nts} steps -> "
          f"{seg_ts_per_s:.3e} segment-timesteps/s", file=sys.stderr)

    # strict-mode production stepping (reference-exact within-step
    # coupling as host-polled fixed-point Pallas sweeps): warm regime.
    # 12-step windows (production AnA windows are 288 steps): the
    # adaptive chunk controller probes the sweep floor once per window,
    # so 4-step windows underreport steady state by ~25% (measured
    # 1.8e7 at 4 steps vs 2.4-2.6e7 at 12, 2026-08-20)
    strict = None
    try:
        nts_s = 12
        cfg_s = RoutingConfig(dt=dt, nts=nts_s, qts_subdivisions=2,
                              assume_short_ts=False, strict_iterative=True,
                              kernel="pallas")

        def run_strict(qs, ds, qlat_w):
            o = route_stepped(net, cp, lp, cfg_s, qs, ds, zeros1, qlat_w,
                              None)
            force(o["flowveldepth"], o["state"].q, o["state"].depth)
            return o

        t0 = time.time()
        o = run_strict(q_w, d_w, qlats[0])
        print(f"strict first run: {time.time()-t0:.1f}s", file=sys.stderr)
        qs, ds = o["state"].q, o["state"].depth
        best_s = np.inf
        for i in range(3):
            t0 = time.time()
            o = run_strict(qs, ds, qlats[i % len(qlats)])
            best_s = min(best_s, time.time() - t0)
            qs, ds = o["state"].q, o["state"].depth
        strict = round(n * nts_s / best_s, 1)
        print(f"strict warm: {best_s:.3f}s for {nts_s} steps -> "
              f"{strict:.3e} seg-ts/s", file=sys.stderr)
    except Exception as e:           # keep the headline metric robust
        print(f"strict bench failed: {e!r}", file=sys.stderr)

    # multi-device engine on a 1-device mesh of the real chip (VERDICT r2:
    # the sharded path must be exercised on TPU hardware, not only the
    # virtual CPU mesh)
    sharded, sharded_rel = None, None
    try:
        sharded, sharded_rel = bench_sharded_1dev(net, topo, chan, cfg,
                                                  q_w, d_w, qlats, n, nts)
        sharded = round(sharded, 1)
    except Exception as e:
        print(f"sharded 1-dev bench failed: {e!r}", file=sys.stderr)

    # real-domain end-to-end: the reference CI's LowerColorado AnA
    # (288 steps, MC + levelpool + nudging + persistence DA) via the CLI
    real = None
    try:
        real = bench_real_domain()
    except Exception as e:
        print(f"real-domain bench failed: {e!r}", file=sys.stderr)

    # multi-chip partition accounting + projected efficiency (host-side)
    part_stats = {}
    try:
        part_stats = partition_scaling_stats(topo, best / nts * 1e3)
    except Exception as e:
        print(f"partition stats failed: {e!r}", file=sys.stderr)

    try:
        probe_end = tenancy_probe()
        print(f"tenancy probe (end): {probe_end:.4f}s", file=sys.stderr)
    except Exception as e:
        print(f"tenancy probe failed: {e!r}", file=sys.stderr)
        probe_end = None

    # measured reference bar (BASELINE.md "measured parity bar"):
    # bracketed 1-core compiled-Fortran estimates from the scalar oracles
    DIFF_BAR_CENTRAL = 2.0e5      # benchmarks/measure_reference_bar.py
    MC_BAR_CENTRAL = 1.1e6
    d_fast = diff.get("f32_uniform128") or diff.get("f32") or 0.0
    print(json.dumps({
        "metric": "segment-timesteps/s per chip (MC short-ts, CONUS-scale synthetic, warm AnA regime)",
        "value": round(seg_ts_per_s, 1),
        "unit": "segment-timesteps/s",
        "vs_baseline": round(seg_ts_per_s / BASELINE_CALCS_PER_S, 3),
        "cold_start_seg_ts_per_s": round(n * nts / best_cold, 1),
        "strict_mode_seg_ts_per_s": strict,
        "strict_window_steps": 12,
        "tenancy_probe_start_s": probe_start,
        "tenancy_probe_end_s": probe_end,
        "sharded_1dev_tpu_seg_ts_per_s": sharded,
        "sharded_vs_stepped_max_rel_diff": sharded_rel,
        "diffusive_f32_uniform128_seg_ts_per_s": diff.get("f32_uniform128"),
        "diffusive_f64_seg_ts_per_s": diff.get("f64"),
        "diffusive_f32_seg_ts_per_s": diff.get("f32"),
        "diffusive_domain": "synthetic mainstem tree C=16, f32 R=2048 (~33k nodes) / f64 R=1024",
        "lowercolorado_ana_288step_s": real,
        "laura_hybrid_48step_tpu_s": laura_tpu,
        "laura_hybrid_48step_cpu_s": laura_cpu,
        "laura_hybrid_tpu_vs_cpu_median_rel": laura_rel,
        "vs_fortran_1core_mc": round(seg_ts_per_s / MC_BAR_CENTRAL, 1),
        "vs_fortran_1core_diffusive": (round(d_fast / DIFF_BAR_CENTRAL, 2)
                                       if d_fast else None),
        **part_stats,
    }))


def bench_laura_hybrid(platform: str, out_npy: str, nts: int = 48):
    """Hurricane Laura natural-bathymetry hybrid (MC + batched two-
    tailwater diffusive, real Gulf-coast xsec tables, coastal boundary
    series) end-to-end via the CLI — the full production hybrid
    configuration on a real domain (VERDICT r3 #4).  Runs pinned to the
    TPU-default diffusive config (f32 + uniform-128) on BOTH platforms so
    the cpu leg is a pure hardware-consistency check.  Saves the
    diffusive [q; depth] series to ``out_npy``; prints steady-state
    seconds on the last stdout line.
    Reference domain: /root/reference/test/HurricaneLaura/."""
    import pathlib
    import tempfile

    import jax
    import yaml

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from troute_tpu.cli import main_v04
    from troute_tpu.config.schema import HybridParameters

    # the backend-aware "auto" defaults must resolve to the fast path on
    # TPU and to reference-precision exact tables off-TPU (VERDICT r3 #3)
    resolved = HybridParameters().resolved_diffusive()
    expected = (("float32", 128) if jax.default_backend() == "tpu"
                else ("float64", None))
    assert resolved == expected, (resolved, expected)

    ref = pathlib.Path("/root/reference/test/HurricaneLaura")
    cfg = yaml.safe_load(open(ref / "troute_UnitTest_noRS.yaml"))
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(ref / "domain/RouteLink_NWMv2.1.nc")
    sp["mask_file_path"] = str(ref / "domain/unit_test_noRS/"
                                     "coastal_subset.txt")
    cfg["network_topology_parameters"]["waterbody_parameters"][
        "level_pool"]["level_pool_waterbody_parameter_file_path"] = \
        str(ref / "domain/LAKEPARM_NWMv2.1.nc")
    rp = cfg["compute_parameters"]["restart_parameters"]
    rp["wrf_hydro_channel_restart_file"] = \
        str(ref / "restart/HYDRO_RST.2020-08-26_00:00_DOMAIN1")
    rp["wrf_hydro_channel_ID_crosswalk_file"] = \
        str(ref / "domain/RouteLink_NWMv2.1.nc")
    rp["wrf_hydro_waterbody_restart_file"] = \
        str(ref / "restart/HYDRO_RST.2020-08-26_00:00_DOMAIN1")
    rp["wrf_hydro_waterbody_ID_crosswalk_file"] = \
        str(ref / "domain/LAKEPARM_NWMv2.1.nc")
    rp["start_datetime"] = "2020-08-26_00:00"
    hp = cfg["compute_parameters"]["hybrid_parameters"]
    hp["diffusive_domain"] = str(ref / "domain/unit_test_noRS/"
                                       "coastal_domain.yaml")
    hp["topobathy_domain"] = str(ref / "domain/"
                                       "final_diffusive_natural_xs.nc")
    hp["run_refactored_network"] = False
    hp["coastal_boundary_domain"] = \
        str(ref / "domain/unit_test_noRS/coastal_boundary_domain.yaml")
    hp["diffusive_dtype"] = "float32"
    hp["diffusive_table_nel"] = 128
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["qlat_input_folder"] = str(ref / "channel_forcing")
    fp["coastal_boundary_input_file"] = \
        str(ref / "channel_forcing/schout_1.nc")
    fp["nts"] = nts
    fp["max_loop_size"] = 100
    cfg["compute_parameters"]["data_assimilation_parameters"] = {}
    cfg["output_parameters"] = {}
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "cfg.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        out = main_v04(["-f", str(p)])           # warm-up (compile)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            out = main_v04(["-f", str(p)])
            best = min(best, time.time() - t0)
    diff = out["diffusive"]
    np.save(out_npy, np.stack([np.asarray(diff["q"], np.float64),
                               np.asarray(diff["depth"], np.float64)]))
    print(f"laura hybrid [{platform}] {nts}-step end-to-end: {best:.2f}s",
          file=sys.stderr)
    print(round(best, 2))


def _laura_subprocess(platform: str, out_npy: str):
    import subprocess
    r = subprocess.run([sys.executable, __file__, "--laura", platform,
                        out_npy], capture_output=True, text=True,
                       timeout=1800)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        raise RuntimeError(f"laura bench [{platform}] failed: "
                           f"{r.stderr[-500:]}")
    return float(r.stdout.strip().splitlines()[-1])


def bench_real_domain():
    """288-step LowerColorado AnA end-to-end via the CLI on the chip
    (compile excluded: one warm-up run, then best of 2).  Returns
    steady-state seconds, or None when the reference domain is absent."""
    import pathlib
    ref = pathlib.Path("/root/reference/test/LowerColorado_TX")
    if not ref.exists():
        return None
    import tempfile

    import yaml

    from troute_tpu.cli import main_v04

    cfg = yaml.safe_load(open(ref / "test_AnA_V4_NHD.yaml"))
    fp = cfg["compute_parameters"]["forcing_parameters"]
    fp["nts"] = 288
    fp["max_loop_size"] = 100
    fp["qlat_input_folder"] = str(ref / "channel_forcing")
    sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
    sp["geo_file_path"] = str(ref / "domain/RouteLink.nc")
    sp["mask_file_path"] = str(ref / "domain/coastal_subset.txt")
    cfg["network_topology_parameters"]["waterbody_parameters"][
        "level_pool"]["level_pool_waterbody_parameter_file_path"] = \
        str(ref / "domain/LAKEPARM.nc")
    cfg["compute_parameters"]["restart_parameters"][
        "wrf_hydro_channel_ID_crosswalk_file"] = str(ref /
                                                     "domain/RouteLink.nc")
    dap = cfg["compute_parameters"]["data_assimilation_parameters"]
    dap["usgs_timeslices_folder"] = str(ref / "usgs_TimeSlice")
    dap["usace_timeslices_folder"] = str(ref / "usace_TimeSlice")
    dap["reservoir_da"]["reservoir_parameter_file"] = \
        str(ref / "domain/reservoir_index_AnA.nc")
    cfg["output_parameters"] = {}
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "cfg.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        main_v04(["-f", str(p)])               # warm-up (compile)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            main_v04(["-f", str(p)])
            best = min(best, time.time() - t0)
    print(f"LowerColorado 288-step AnA end-to-end: {best:.2f}s",
          file=sys.stderr)
    return round(best, 2)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--laura":
        bench_laura_hybrid(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 3 and sys.argv[1] == "--diffusive":
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_troute_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if sys.argv[2] == "float64":
            jax.config.update("jax_enable_x64", True)
        nelu = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        print(bench_diffusive(dtype_name=sys.argv[2],
                              nel_uniform=nelu or None))
    else:
        main()
