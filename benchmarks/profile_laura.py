"""Phase-level wall-time profile of the Laura hybrid CLI run.

Wraps the hot phases (network build, forcing, MC routing, diffusive
domain build / init / run / readback) with timers and runs the same
configuration as bench.py's Laura leg.  Usage:

    python benchmarks/profile_laura.py tpu|cpu [nts]
"""
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import tempfile
import time

import numpy as np
import yaml

PLATFORM = sys.argv[1] if len(sys.argv) > 1 else "tpu"
NTS = int(sys.argv[2]) if len(sys.argv) > 2 else 48

import jax

if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

TIMES = {}


def timed(name):
    def deco(fn):
        @functools.wraps(fn)
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            TIMES[name] = TIMES.get(name, 0.0) + time.time() - t0
            return out
        return wrap
    return deco


import troute_tpu.cli as cli
import troute_tpu.routing.engine as engine
import troute_tpu.routing.hybrid as hybrid
import troute_tpu.diffusive.solver as solver
import troute_tpu.diffusive.domain as ddomain
import troute_tpu.network.builder as builder

engine.route_stepped = timed("mc route_stepped")(engine.route_stepped)
engine.route = timed("mc route")(engine.route)
cli.route_stepped = engine.route_stepped
cli.route = engine.route
hybrid.HybridDomain.__init__ = timed("hybrid domain preprocess")(
    hybrid.HybridDomain.__init__)
hybrid.HybridDomain.build_diffusive_domain = timed("diffusive build_domain")(
    hybrid.HybridDomain.build_diffusive_domain)
hybrid.HybridDomain.saves_to_segments = timed("saves_to_segments")(
    hybrid.HybridDomain.saves_to_segments)
solver.initialize_state_batched = timed("diffusive init")(
    solver.initialize_state_batched)
_orig_run_batched = solver.run_diffusive_batched


def run_batched_profiled(dom, st, **kw):
    t0 = time.time()
    st, saves = _orig_run_batched(dom, st, **kw)
    # force completion before crediting readback
    float(np.asarray(st.t).ravel()[0])
    TIMES["diffusive run (device)"] = TIMES.get(
        "diffusive run (device)", 0.0) + time.time() - t0
    t0 = time.time()
    saves = [(t, np.asarray(q), np.asarray(y)) for t, q, y in saves]
    TIMES["diffusive saves readback"] = TIMES.get(
        "diffusive saves readback", 0.0) + time.time() - t0
    return st, saves


solver.run_diffusive_batched = run_batched_profiled
builder.build_network = timed("network build")(builder.build_network)

ref = pathlib.Path("/root/reference/test/HurricaneLaura")
cfg = yaml.safe_load(open(ref / "troute_UnitTest_noRS.yaml"))
sp = cfg["network_topology_parameters"]["supernetwork_parameters"]
sp["geo_file_path"] = str(ref / "domain/RouteLink_NWMv2.1.nc")
sp["mask_file_path"] = str(ref / "domain/unit_test_noRS/coastal_subset.txt")
cfg["network_topology_parameters"]["waterbody_parameters"]["level_pool"][
    "level_pool_waterbody_parameter_file_path"] = \
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
hp["topobathy_domain"] = str(ref / "domain/final_diffusive_natural_xs.nc")
hp["run_refactored_network"] = False
hp["coastal_boundary_domain"] = \
    str(ref / "domain/unit_test_noRS/coastal_boundary_domain.yaml")
hp["diffusive_dtype"] = "float32"
hp["diffusive_table_nel"] = 128
fp = cfg["compute_parameters"]["forcing_parameters"]
fp["qlat_input_folder"] = str(ref / "channel_forcing")
fp["coastal_boundary_input_file"] = str(ref / "channel_forcing/schout_1.nc")
fp["nts"] = NTS
fp["max_loop_size"] = 100
cfg["compute_parameters"]["data_assimilation_parameters"] = {}
cfg["output_parameters"] = {}

with tempfile.TemporaryDirectory() as d:
    p = pathlib.Path(d) / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    t0 = time.time()
    cli.main_v04(["-f", str(p)])            # warm-up (compile)
    warm = time.time() - t0
    TIMES.clear()
    t0 = time.time()
    cli.main_v04(["-f", str(p)])
    total = time.time() - t0

print(f"\n=== Laura hybrid [{PLATFORM}] nts={NTS} ===")
print(f"warm-up (compile) run: {warm:.2f}s")
print(f"steady-state run:      {total:.2f}s")
acc = 0.0
for k, v in sorted(TIMES.items(), key=lambda kv: -kv[1]):
    print(f"  {k:28s} {v:7.3f}s")
    acc += v
print(f"  {'(unaccounted)':28s} {total-acc:7.3f}s")
