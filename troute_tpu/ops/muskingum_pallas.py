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


def _mc_block_kernel_skip(*refs, dt: float, n_out: int):
    """Active-set variant: blocks whose inputs did not move since their
    last executed solve skip the whole secant and write through the
    previous outputs (strict fixed-point sweeps — see
    ``RoutingConfig.strict_block_skip``).  ``refs[0]`` is the
    scalar-prefetched [n_blocks] activity vector (SMEM)."""
    active_ref = refs[0]
    in_refs = refs[1:1 + len(_IN_NAMES)]
    prev_refs = refs[1 + len(_IN_NAMES):1 + len(_IN_NAMES) + n_out]
    out_refs = refs[1 + len(_IN_NAMES) + n_out:]
    flag = active_ref[pl.program_id(0)]

    @pl.when(flag != 0)
    def _run():
        vals = [r[...] for r in in_refs]
        out = mc.solve_block(*vals, dt=jnp.asarray(dt, vals[0].dtype))
        for i in range(n_out):
            out_refs[i][...] = out[i]

    @pl.when(flag == 0)
    def _skip():
        for i in range(n_out):
            out_refs[i][...] = prev_refs[i][...]


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


@functools.partial(jax.jit, static_argnames=("dt", "block_sublanes",
                                             "n_out"))
def _mc_pallas_padded_skip(args2d, active_blk, prev2d, dt: float,
                           block_sublanes: int, n_out: int):
    m = args2d[0].shape[0]
    dtype = args2d[0].dtype
    grid = (m // block_sublanes,)
    bspec = pl.BlockSpec((block_sublanes, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    # whole activity vector in SMEM for every block (a few KB), indexed
    # by program_id in-kernel; rank-1 SMEM blocks must span a multiple
    # of 128 entries, so the vector is padded to that
    n_blk = int(active_blk.shape[0])
    n_blk_pad = (n_blk + 127) // 128 * 128
    active_pad = jnp.pad(active_blk, (0, n_blk_pad - n_blk))
    aspec = pl.BlockSpec((n_blk_pad,), lambda i: (0,),
                         memory_space=pltpu.SMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((m, LANE), dtype) for _ in range(n_out))
    return pl.pallas_call(
        functools.partial(_mc_block_kernel_skip, dt=dt, n_out=n_out),
        grid=grid,
        in_specs=[aspec] + [bspec] * (len(_IN_NAMES) + n_out),
        out_specs=tuple(bspec for _ in range(n_out)),
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(active_pad, *args2d, *prev2d)


def block_active_lanes(active_rows,
                       block_sublanes: int = DEFAULT_SUBLANES):
    """Expand per-lane 'input moved' flags to per-lane 'its block will
    run' flags — the same reduction ``muskingum_cunge_pallas`` applies,
    so callers can track which lanes' outputs a skip-mode call actually
    recomputed (e.g. to update their reference drive)."""
    nseg = active_rows.shape[0]
    blk = block_sublanes * LANE
    npad = (nseg + blk - 1) // blk * blk
    act = jnp.pad(active_rows, (0, npad - nseg))
    ab = act.reshape(npad // blk, blk).any(axis=1)
    return jnp.repeat(ab, blk)[:nseg]


def muskingum_cunge_pallas(qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc, cs,
                           s0, depthp, dt,
                           block_sublanes: int = DEFAULT_SUBLANES,
                           with_diagnostics: bool = True,
                           active_rows=None, prev=None) -> mc.MCOutput:
    """Drop-in Pallas-backed equivalent of ``muskingum_cunge`` (1-D inputs).

    ``dt`` must be a static python float (it is baked into the kernel).
    ``with_diagnostics=False`` skips the ck/cn/X outputs (less HBM traffic
    for production routing).

    ``active_rows`` ([nseg] bool) + ``prev`` (the previous sweep's
    MCOutput): active-set mode for strict fixed-point sweeps — a block
    none of whose lanes' inputs moved (``active_rows`` all False) skips
    the secant entirely and writes through ``prev``'s values for its
    lanes.  The caller guarantees ``active_rows`` marks every lane whose
    inputs changed since the sweep that produced ``prev``.
    """
    args = (qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc, cs, s0, depthp)
    args = jnp.broadcast_arrays(*args)
    nseg = args[0].shape[0]
    blk = block_sublanes * LANE
    npad = (nseg + blk - 1) // blk * blk

    def pad2d(a):
        return jnp.pad(a, (0, npad - nseg)).reshape(npad // LANE, LANE)

    n_out = 6 if with_diagnostics else 3
    if active_rows is not None:
        act = jnp.pad(active_rows, (0, npad - nseg))
        active_blk = act.reshape(npad // blk, blk).any(axis=1) \
            .astype(jnp.int32)
        prev_flat = (prev.qdc, prev.velc, prev.depthc,
                     prev.cn, prev.ck, prev.X)[:n_out]
        outs = _mc_pallas_padded_skip(
            tuple(pad2d(a) for a in args), active_blk,
            tuple(pad2d(p) for p in prev_flat), float(dt),
            block_sublanes, n_out)
    else:
        outs = _mc_pallas_padded(tuple(pad2d(a) for a in args), float(dt),
                                 block_sublanes, n_out)
    flat = [o.reshape(npad)[:nseg] for o in outs]
    if not with_diagnostics:
        z = jnp.zeros_like(flat[0])
        flat = flat + [z, z, z]
    return mc.MCOutput(*flat)
