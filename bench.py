"""Benchmark: CONUS-scale Muskingum-Cunge routing throughput on one chip.

Builds a synthetic river network with CONUS NWM statistics (2,729,077
segments, ~14.7k independent basins, junction-rich topology, CONUS
parameter distributions), routes it in production configuration
(``assume_short_ts=True``, dt=300 s, f32) on the default JAX backend (the
real TPU chip under the driver), and reports segment-timesteps/second.

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

CONUS_SEGMENTS = 2_729_077
CONUS_BASINS = 14_713
BASELINE_CALCS_PER_S = 7.0e6


def synthetic_conus(n=CONUS_SEGMENTS, n_basins=CONUS_BASINS, span=4, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    idx = np.arange(n)
    bounds = np.linspace(0, n, n_basins + 1).astype(np.int64)
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


def main():
    import jax
    import jax.numpy as jnp
    from troute_tpu.network.topology import build_topology
    from troute_tpu.ops.levelpool import LevelpoolParams
    from troute_tpu.routing.engine import (
        ChannelParams, RoutingConfig, network_arrays_from_topology,
        route_stepped)

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
    qlat = jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), jnp.float32)
    print(f"preprocess+transfer: {time.time()-t0:.1f}s "
          f"(N={n}, depth={topo.n_levels})", file=sys.stderr)

    cfg = RoutingConfig(dt=dt, nts=nts, qts_subdivisions=nts // 2,
                        assume_short_ts=True, kernel="pallas")

    zeros1 = jnp.zeros(1, jnp.float32)

    def run():
        out = route_stepped(net, cp, lp, cfg, q0, d0, zeros1, qlat, None)
        jax.block_until_ready(out["flowveldepth"])
        jax.block_until_ready(out["state"].q)
        return out

    t0 = time.time()
    out = run()
    print(f"first run (compile+exec): {time.time()-t0:.1f}s", file=sys.stderr)

    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = run()
        best = min(best, time.time() - t0)
    q_final = np.asarray(out["state"].q)
    assert np.isfinite(q_final).all(), "non-finite flows in benchmark run"

    seg_ts_per_s = n * nts / best
    print(f"steady-state: {best:.3f}s for {nts} steps -> "
          f"{seg_ts_per_s:.3e} segment-timesteps/s", file=sys.stderr)

    print(json.dumps({
        "metric": "segment-timesteps/s per chip (MC short-ts, CONUS-scale synthetic)",
        "value": round(seg_ts_per_s, 1),
        "unit": "segment-timesteps/s",
        "vs_baseline": round(seg_ts_per_s / BASELINE_CALCS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
