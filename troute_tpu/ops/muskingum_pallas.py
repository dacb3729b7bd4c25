"""Pallas TPU kernel for the Muskingum-Cunge secant solve.

The plain XLA formulation (``ops/muskingum.py``) runs ONE ``while_loop``
across the whole network: a single slow-converging segment drags every lane
through the full retry schedule (up to ~760 trips at CONUS scale).  This
kernel tiles the network into VMEM blocks, each running its own while loop
with *per-block* early exit — a block of typical segments converges in a
handful of trips, so only the rare block containing a straggler iterates
long.  This mirrors how the reference pays the iteration cost only on the
offending segment (per-segment early exit in Fortran), recovered here at
block granularity to stay vectorized on the VPU.

The numerical body is shared with ``ops/muskingum.py`` (same functions, so
XLA and Pallas paths are bit-identical in exact arithmetic).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from troute_tpu.ops import muskingum as mc

LANE = 128
# 16 x 128 = 2048 segments per block.  Swept on one v5e (CONUS-scale
# warm AnA, 24-step dispatches, fetch-forced): 8 sublanes 0.337 s,
# 16 -> 0.290 s, 32 -> 0.291 s (4 did not finish compiling in 25 min) —
# grid-scheduling overhead outweighs the coarser per-block early exit.
# Per-lane results are block-size independent (converged lanes hold
# their values under the masked update).  TROUTE_MC_SUBLANES overrides.
DEFAULT_SUBLANES = int(os.environ.get("TROUTE_MC_SUBLANES", "16"))

_IN_NAMES = ("qup", "quc", "qdp", "ql", "dx", "bw", "tw", "twcc", "n",
             "ncc", "cs", "s0", "depthp")


def _mc_block_kernel(*refs, dt: float, n_out: int):
    in_refs = refs[:len(_IN_NAMES)]
    out_refs = refs[len(_IN_NAMES):]
    vals = [r[...] for r in in_refs]
    out = mc.solve_block(*vals, dt=jnp.asarray(dt, vals[0].dtype))
    for i in range(n_out):
        out_refs[i][...] = out[i]


@functools.partial(jax.jit, static_argnames=("dt", "block_sublanes",
                                             "n_out"))
def _mc_pallas_padded(args2d, dt: float, block_sublanes: int, n_out: int):
    m = args2d[0].shape[0]
    dtype = args2d[0].dtype
    grid = (m // block_sublanes,)
    bspec = pl.BlockSpec((block_sublanes, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((m, LANE), dtype) for _ in range(n_out))
    return pl.pallas_call(
        functools.partial(_mc_block_kernel, dt=dt, n_out=n_out),
        grid=grid,
        in_specs=[bspec] * len(_IN_NAMES),
        out_specs=tuple(bspec for _ in range(n_out)),
        out_shape=out_shapes,
        # run interpreted off-TPU so the same code path serves CPU tests
        interpret=jax.default_backend() != "tpu",
    )(*args2d)


def muskingum_cunge_pallas(qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc, cs,
                           s0, depthp, dt,
                           block_sublanes: int = DEFAULT_SUBLANES,
                           with_diagnostics: bool = True) -> mc.MCOutput:
    """Drop-in Pallas-backed equivalent of ``muskingum_cunge`` (1-D inputs).

    ``dt`` must be a static python float (it is baked into the kernel).
    ``with_diagnostics=False`` skips the ck/cn/X outputs (less HBM traffic
    for production routing).
    """
    args = (qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc, cs, s0, depthp)
    args = jnp.broadcast_arrays(*args)
    nseg = args[0].shape[0]
    blk = block_sublanes * LANE
    npad = (nseg + blk - 1) // blk * blk

    def pad2d(a):
        return jnp.pad(a, (0, npad - nseg)).reshape(npad // LANE, LANE)

    n_out = 6 if with_diagnostics else 3
    outs = _mc_pallas_padded(tuple(pad2d(a) for a in args), float(dt),
                             block_sublanes, n_out)
    flat = [o.reshape(npad)[:nseg] for o in outs]
    if not with_diagnostics:
        z = jnp.zeros_like(flat[0])
        flat = flat + [z, z, z]
    return mc.MCOutput(*flat)
