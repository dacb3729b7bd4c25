"""A/B the strict block-skip on the real chip: bench.py's strict leg
(12-step warm windows, CONUS-scale synthetic) with strict_block_skip
False vs True.  Usage: python benchmarks/bench_strict_skip.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_troute_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import (CONUS_SEGMENTS, channel_params, force, synthetic_conus,
                   tenancy_probe)
from troute_tpu.network.topology import build_topology
from troute_tpu.ops.levelpool import LevelpoolParams
from troute_tpu.routing.engine import (ChannelParams, RoutingConfig,
                                       network_arrays_from_topology,
                                       route_stepped)


def main():
    n = CONUS_SEGMENTS
    dt = 300.0
    rng = np.random.default_rng(1)
    t0 = time.time()
    ids, down = synthetic_conus(n)
    topo = build_topology(ids, down)
    net = network_arrays_from_topology(topo, need_levels=False)
    chan = ChannelParams(**{k: jnp.asarray(v)
                            for k, v in channel_params(n, rng).items()})
    lp = LevelpoolParams(*[jnp.ones((1,), jnp.float32)] * 9)
    q0 = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    d0 = jnp.asarray(rng.uniform(0.05, 0.8, n), jnp.float32)
    qlats = [jnp.asarray(rng.uniform(0.1, 2.0, (2, n)), jnp.float32)
             for _ in range(4)]
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)
    print(f"tenancy probe: {tenancy_probe():.4f}s", file=sys.stderr)

    # relax with short-mode windows like the bench does
    cfg_s = RoutingConfig(dt=dt, nts=24, qts_subdivisions=12,
                          assume_short_ts=True, kernel="pallas")
    q_w, d_w = q0, d0
    t0 = time.time()
    for i in range(6):
        o = route_stepped(net, chan, lp, cfg_s, q_w, d_w,
                          jnp.zeros(1, jnp.float32), qlats[i % 4], None,
                          collect=False)
        q_w, d_w = o["state"].q, o["state"].depth
    force(q_w, d_w)
    print(f"short-mode relax: {time.time()-t0:.1f}s", file=sys.stderr)

    nts_s = 12
    z1 = jnp.zeros(1, jnp.float32)
    cfgs = {skip: RoutingConfig(dt=dt, nts=nts_s, qts_subdivisions=2,
                                assume_short_ts=False,
                                strict_iterative=True, kernel="pallas",
                                strict_block_skip=skip)
            for skip in (False, True)}
    # compile/warm both variants, then interleave timed windows in pairs
    # (the shared chip's contention drifts between runs, so paired
    # alternation is the only honest comparison)
    qs, ds = q_w, d_w
    for skip in (False, True):
        o = route_stepped(net, chan, lp, cfgs[skip], qs, ds, z1,
                          qlats[0], None)
        force(o["flowveldepth"], o["state"].q, o["state"].depth)
        qs, ds = o["state"].q, o["state"].depth
    times = {False: [], True: []}
    sweeps = {False: None, True: None}
    for i in range(4):
        for skip in (False, True):
            t0 = time.time()
            o = route_stepped(net, chan, lp, cfgs[skip], qs, ds, z1,
                              qlats[i % 4], None)
            force(o["flowveldepth"], o["state"].q, o["state"].depth)
            times[skip].append(time.time() - t0)
            sweeps[skip] = o["strict_sweeps"]
            qs, ds = o["state"].q, o["state"].depth
    for skip in (False, True):
        ts = np.asarray(times[skip])
        best = ts.min()
        rate = n * nts_s / best
        print(f"skip={skip}: best {best:.3f}s / median {np.median(ts):.3f}s"
              f" per {nts_s} steps -> {rate:.3e} seg-ts/s "
              f"(sweeps {sweeps[skip]}; all {np.round(ts,3)})")
    print(f"tenancy probe: {tenancy_probe():.4f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
