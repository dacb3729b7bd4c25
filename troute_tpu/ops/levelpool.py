"""Vectorized level-pool reservoir routing (JAX).

Reproduces ``LEVELPOOL_PHYSICS`` (reference
``src/kernel/reservoir/Level_Pool/module_levelpool.F:233-427``): storage
routing dH/dt = (I - Q(H))/A integrated with the 3-stage Runge-Kutta scheme
of Chow et al., with weir, orifice and overtop discharge terms.  The
reference routes one reservoir per Fortran object call inside the Cython
reach loop; here all reservoirs in the network advance in one fused masked
vector step per timestep.

Stage structure quirk faithfully preserved: the overtop branch in the three
RK stages tests the *initial* elevation H (not the staged elevation), while
the weir/orifice heads use the staged elevation; the final discharge is
evaluated at the updated elevation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

GRAVITY = 9.81


class LevelpoolParams(NamedTuple):
    """Per-reservoir parameters (one lane per waterbody).

    Matches the reference's waterbody parameter layout
    (``levelpool.pyx:35-82``: LkArea, LkMxE, OrificeA/C/E, WeirC/E/L, ifd)
    with elevations in meters AMSL and area in km^2.
    """

    area: jax.Array                 # lake surface area (km^2)
    max_depth: jax.Array            # elevation of maximum storage / overtop (m)
    orifice_area: jax.Array         # (m^2)
    orifice_coeff: jax.Array
    orifice_elev: jax.Array         # (m)
    weir_coeff: jax.Array
    weir_elev: jax.Array            # (m)
    weir_length: jax.Array          # (m)
    dam_length: jax.Array           # (m), reference hard-codes 10.0

    @classmethod
    def from_array(cls, wb: jax.Array) -> "LevelpoolParams":
        """Build from an [n_res, >=9] array in the reference column order
        (area, max_depth, orifice_area, orifice_coeff, orifice_elev,
        weir_coeff, weir_elev, weir_length, ifd, ...)."""
        return cls(
            area=wb[:, 0], max_depth=wb[:, 1], orifice_area=wb[:, 2],
            orifice_coeff=wb[:, 3], orifice_elev=wb[:, 4],
            weir_coeff=wb[:, 5], weir_elev=wb[:, 6], weir_length=wb[:, 7],
            dam_length=jnp.full_like(wb[:, 0], 10.0),
        )


def cold_start_elevation(p: LevelpoolParams, ifd: jax.Array) -> jax.Array:
    """WRF-Hydro cold-start rule (reference ``levelpool_structs.c:97-106``):
    orifice_elevation + (max_depth - orifice_elevation) * ifd."""
    return p.orifice_elev + (p.max_depth - p.orifice_elev) * ifd


def _discharge(h_weir, h_orifice, h_overtop_test, p: LevelpoolParams):
    """Discharge Q(H): orifice + weir (+ overtop above max storage)."""
    dtype = h_weir.dtype
    max_weir_depth = p.max_depth - p.weir_elev
    dh = jnp.minimum(h_weir - p.weir_elev, max_weir_depth)

    head = h_orifice - p.orifice_elev
    tmp1 = p.orifice_coeff * p.orifice_area * jnp.sqrt(
        2.0 * GRAVITY * jnp.maximum(head, 0.0))
    tmp2 = p.weir_coeff * p.weir_length * jnp.maximum(dh, 0.0) ** 1.5

    over = p.weir_coeff * (p.weir_length * p.dam_length) \
        * jnp.maximum(h_overtop_test - p.max_depth, 0.0) ** 1.5

    q = jnp.where(
        h_overtop_test > p.max_depth,
        tmp1 + tmp2 + over,
        jnp.where(
            dh > 0.0,
            tmp1 + tmp2,
            jnp.where(h_orifice > p.orifice_elev, tmp1, jnp.asarray(0.0, dtype)),
        ),
    )
    return q


def levelpool_step(H, qi0, qi1, ql, dt, p: LevelpoolParams):
    """Advance all reservoirs one routing period.

    Args:
        H: water elevation at start of step (m), [n_res]
        qi0: inflow at previous timestep (m3/s)
        qi1: inflow at current timestep (m3/s)
        ql: lateral inflow (m3/s) — the reference passes 0
        dt: routing period (s)
        p: reservoir parameters

    Returns:
        (outflow, new_H)
    """
    it = qi0
    itdt_3 = qi0 + (qi1 + ql - qi0) * 0.33
    itdt_2_3 = qi0 + (qi1 + ql - qi0) * 0.67
    sap = p.area * 1.0e6

    safe_sap = jnp.where(sap > 0.0, sap, 1.0)

    d1 = _discharge(H, H, H, p)
    dh1 = jnp.where(sap > 0.0, ((it - d1) / safe_sap) * dt, 0.0)

    h2 = H + dh1 / 3.0
    d2 = _discharge(h2, h2, H, p)
    dh2 = jnp.where(sap > 0.0, ((itdt_3 - d2) / safe_sap) * dt, 0.0)

    h3 = H + 0.667 * dh2
    d3 = _discharge(h3, h3, H, p)
    dh3 = jnp.where(sap > 0.0, ((itdt_2_3 - d3) / safe_sap) * dt, 0.0)

    H_new = H + dh1 / 4.0 + 0.75 * dh3
    outflow = _discharge(H_new, H_new, H_new, p)
    return outflow, H_new
