"""troute_tpu — a TPU-native river-network channel-routing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NOAA-OWP
T-Route (the National Water Model channel router): Muskingum-Cunge explicit
routing, level-pool reservoirs with data assimilation, streamflow nudging,
and an implicit Crank-Nicolson diffusive-wave solver — all expressed as
vectorized, jit-compiled device ops over a columnar network representation
instead of the reference's per-reach Cython/Fortran traversal.

Design summary
--------------
* The river network is preprocessed (host-side NumPy) into a topological
  *level schedule*: padded index arrays in which every segment knows its
  wavefront level and its (padded) list of upstream segment indices.
* Routing executes as ``lax.scan`` over timesteps.  In NWM's production
  configuration (``assume_short_ts=True``) each timestep depends only on the
  previous one, so all segments advance in a single fused vector step.  In
  the strict configuration an inner scan over wavefront levels reproduces
  the reference's within-timestep upstream coupling exactly.
* Reservoirs, gage nudging and reservoir DA are fused masked vector ops —
  no per-object Python in the hot loop.
* Multi-host scaling shards segments over a ``jax.sharding.Mesh`` by
  sub-basin with halo exchange of junction boundary flows.

Reference parity: behavior is modeled on NOAA-OWP/T-Route (see SURVEY.md);
numerical kernels reproduce the reference math (e.g.
``src/kernel/muskingum/MCsingleSegStime_f2py_NOLOOP.f90``,
``src/kernel/reservoir/Level_Pool/module_levelpool.F``) in f32 for allclose
parity, but share no code with it.
"""

__version__ = "0.1.0"
