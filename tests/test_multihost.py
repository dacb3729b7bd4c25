"""True multi-process distributed routing: two processes form a global
8-device mesh via jax.distributed (Gloo CPU collectives standing in for
ICI/DCN); route_sharded runs with cross-process halo exchange and must
match the single-process engine exactly.  The reference has no multi-node
path at all (SURVEY §2.4: joblib is single-node)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r'''
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.experimental import multihost_utils

from test_sharded import CONN, LAKE_ID, LAKE_ROWVALS, ELEV0, _global_setup
from troute_tpu.parallel.partition import partition_network
from troute_tpu.parallel.sharded_engine import (
    build_sharded_inputs, place_global, route_sharded)
from troute_tpu.parallel.stepped_engine import route_sharded_stepped

assert jax.device_count() == 8 and jax.local_device_count() == 4

nts, dt = 24, 300.0
topo, chan, q0, depth0, qlat_cols, lake_row = _global_setup()
# forced mid-basin cuts -> halo traffic crosses the process boundary
assignment = (np.arange(topo.n_nodes) % 8).astype(np.int32)
part = partition_network(topo, 8, assignment)
assert part.cut_edges > 0
inp = build_sharded_inputs(part, topo, chan, LAKE_ROWVALS, q0, depth0,
                           {lake_row: ELEV0}, qlat_cols, dtype=jnp.float64)
mesh = Mesh(np.array(jax.devices()), ("basin",))
inp_g = place_global(mesh, inp)
fvd = route_sharded(mesh, inp_g, dt, nts, qts_subdivisions=4).fvd
full = np.asarray(multihost_utils.process_allgather(fvd, tiled=True))
# the production host-stepped driver over the same 2-process mesh: its
# host loop runs identically on every process (SPMD), with the
# cross-process ppermute halo inside each K-step dispatch
fvd_st = route_sharded_stepped(mesh, inp_g, dt, nts, qts_subdivisions=4,
                               band_shifts=part.band_shifts,
                               k_steps=10).fvd
full_st = np.asarray(multihost_utils.process_allgather(fvd_st, tiled=True))
if pid == 0:
    np.save(f"{outdir}/fvd_mp.npy", full)
    np.save(f"{outdir}/fvd_mp_stepped.npy", full_st)
    np.save(f"{outdir}/gnode.npy", part.global_row)
print(f"proc {pid} done", flush=True)
'''


def test_two_process_distributed_routing(tmp_path):
    port = socket.socket().getsockname()[1] or 0
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(k), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for k in (0, 1)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    fvd_mp = np.load(tmp_path / "fvd_mp.npy")     # [n_dev, nts, n_local, 3]
    global_node = np.load(tmp_path / "gnode.npy")

    # single-process ground truth
    import jax.numpy as jnp
    from test_sharded import _global_setup as gs, _single_device_run
    topo, chan, q0, depth0, qlat_cols, lake_row = gs()
    ref = _single_device_run(topo, chan, q0, depth0, qlat_cols, 24, 300.0,
                             jnp.float64)

    n_dev, nts, n_local, _ = fvd_mp.shape
    fvd_st = np.load(tmp_path / "fvd_mp_stepped.npy")
    for d in range(n_dev):
        for j in range(n_local):
            g = global_node[d, j]
            if g < 0:
                continue
            np.testing.assert_allclose(
                fvd_mp[d, :, j], ref[:, g], rtol=0, atol=1e-12,
                err_msg=f"dev {d} node {g}")
            np.testing.assert_allclose(
                fvd_st[d, :, j], ref[:, g], rtol=1e-9, atol=1e-12,
                err_msg=f"stepped dev {d} node {g}")
