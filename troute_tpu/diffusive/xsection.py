"""Hydraulic cross-section lookup tables for the diffusive-wave solver.

The reference builds an 11-column table per node by walking a synthetic
compound-trapezoid polygon at ``nel`` discrete elevations
(``kernel/diffusive/diffusive.f90:readXsection``, ``:2093-2443``).  The
polygon IS a compound trapezoid, so here the same quantities are computed in
closed form, vectorized over all nodes at once (host NumPy, one-time
preprocessing):

columns (0-indexed here, 1-indexed in the reference):
  0 elevation  1 area  2 wetted perimeter  3 hydraulic radius
  4 conveyance (sum of left/main/right sub-sections)  5 top width
  6 first moment of area  7 dP/dA  8 dK/dA  9 uniform flow K*sqrt(S0)
  10 compound 1/n (Einstein-Horton composite)

Geometry quirks reproduced exactly:
* a 1-cm triangular notch is carved below the main-channel bed (the table's
  datum ``z`` is lowered by 0.01 m);
* the first 5 elevation rows resolve the notch; the rest spread
  ``2*bankfull`` above it; the first row is evaluated 1e-5 above the notch
  bottom;
* floodplain outer walls are wetted up to ``timesDepth*bankfull``; internal
  sub-section walls are not wetted;
* above bankfull the main channel walls turn vertical (width ``tw``).
"""

from __future__ import annotations

import numpy as np

NEL = 501
TIMES_DEPTH = 4.0


def _region_geometry(e, z, bo, traps, tw, twcc, hbf):
    """Area/perimeter/topwidth of the three sub-sections at elevation e.

    All inputs broadcast; returns arrays stacked on a leading axis of 3
    (left floodplain, main channel, right floodplain).
    """
    notch_depth = 0.01
    z_notch = z - notch_depth
    xc3 = (twcc - tw) / 2.0          # floodplain bench width (each side)

    # --- main channel (region 2): notch + trapezoid + vertical above bank
    d_notch = np.clip(e - z_notch, 0.0, notch_depth)
    frac = d_notch / notch_depth
    notch_area = 0.5 * (bo * frac) * d_notch
    notch_side = np.sqrt((bo / 2.0) ** 2 + notch_depth ** 2)
    notch_peri = 2.0 * notch_side * frac
    notch_topw = bo * frac

    d_trap = np.clip(e - z, 0.0, hbf)
    trap_area = bo * d_trap + traps * d_trap ** 2
    trap_peri = 2.0 * d_trap * np.sqrt(1.0 + traps ** 2)
    trap_topw_add = 2.0 * traps * d_trap   # width beyond bo

    d_above = np.maximum(e - (z + hbf), 0.0)
    above_area = tw * d_above

    in_notch = e <= z
    main_area = notch_area + trap_area + above_area
    main_peri = notch_peri + trap_peri     # vertical walls above bank are
    main_topw = np.where(in_notch, notch_topw, bo + trap_topw_add)
    #             ^ internal (not wetted) per the reference polygon walk

    # --- floodplains (regions 1 and 3): rectangular bench above bank top,
    # outer wall wetted up to timesDepth*hbf
    d_fp = np.maximum(e - (z + hbf), 0.0)
    wall = np.minimum(d_fp, (TIMES_DEPTH - 1.0) * hbf)
    fp_area = xc3 * d_fp
    fp_peri = np.where(d_fp > 0.0, xc3 + wall, 0.0)
    fp_topw = np.where(d_fp > 0.0, xc3, 0.0)

    area = np.stack([fp_area, main_area, fp_area])
    peri = np.stack([fp_peri, main_peri, fp_peri])
    topw = np.stack([fp_topw, main_topw, fp_topw])
    return area, peri, topw


def build_xsec_tables(z, bo, traps, tw, twcc, mann, manncc, dx,
                      so_llm=0.0001, nel=NEL):
    """Build lookup tables for all nodes.

    Args:
        z, bo, traps, tw, twcc, mann, manncc: [R, C] node geometry
            (z = bed elevation, bo = bottom width, traps = side slope
            dx/dy, tw = bankfull top width, twcc = floodplain width)
        dx: [R, C] downstream segment lengths (dx[:, -1] unused)

    Returns:
        (xsec_tab [R, C, 11, nel], z_adj [R, C]) where z_adj is the
        notch-lowered datum the solver must use.
    """
    R, C = np.shape(z)
    z = np.asarray(z, np.float64)
    hbf = (tw - bo) / (2.0 * traps)

    # elevation grid per node [R, C, nel]
    z_notch = z - 0.01
    el_range = 2.0 * hbf
    grid = np.zeros((R, C, nel))
    grid[..., 0] = z_notch
    for k in range(1, 5):
        grid[..., k] = z_notch + 0.01 * k / 4.0
    el_incr = el_range / (nel - 6.0)
    for k in range(5, nel):
        grid[..., k] = z + el_incr * (k - 4)

    # evaluate first row slightly above the notch bottom (reference quirk)
    eval_el = grid.copy()
    eval_el[..., 0] = z_notch + 1e-5

    e = np.moveaxis(eval_el, -1, 0)          # [nel, R, C]
    area3, peri3, topw3 = _region_geometry(
        e, z[None], bo[None], traps[None], tw[None], twcc[None], hbf[None])
    # area3 etc: [3, nel, R, C]

    with np.errstate(divide="ignore", invalid="ignore"):
        r3 = np.where(peri3 > 1e-10, area3 / peri3, 0.0)
        n3 = np.stack([np.broadcast_to(manncc, area3.shape[1:]),
                       np.broadcast_to(mann, area3.shape[1:]),
                       np.broadcast_to(manncc, area3.shape[1:])])
        conv3 = np.where(peri3 > 1e-10,
                         (1.0 / n3) * area3 * r3 ** (2.0 / 3.0), 0.0)

    area = area3.sum(axis=0)     # [nel, R, C]
    peri = peri3.sum(axis=0)
    topw = topw3.sum(axis=0)
    conv = conv3.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        radius = np.where(peri > 1e-10, area / peri, 0.0)

    # finite-difference dP/dA and dK/dA down the elevation grid
    dA = np.diff(area, axis=0)
    safe_dA = np.where(np.abs(dA) > 1e-12, dA, 1e-12)
    dPdA = np.concatenate([
        (peri[:1] / np.maximum(area[:1], 1e-12)),
        np.diff(peri, axis=0) / safe_dA])
    dKdA = np.concatenate([
        (conv[:1] / np.maximum(area[:1], 1e-12)),
        np.diff(conv, axis=0) / safe_dA])

    # first moment of area via midpoint accumulation (reference method)
    el = np.moveaxis(grid, -1, 0)
    centers = 0.5 * (el[1:] + el[:-1])
    first_moment = np.zeros_like(area)
    acc_a = dA
    for j in range(1, nel):
        first_moment[j] = ((acc_a[:j] * (el[j][None] - centers[:j]))
                           .sum(axis=0))

    # Einstein-Horton composite roughness
    peri_abs = np.abs(peri3)
    comp_mann = np.sqrt(
        (peri_abs[0] * manncc ** 2 + peri_abs[1] * mann ** 2
         + peri_abs[2] * manncc ** 2)
        / np.maximum(peri_abs.sum(axis=0), 1e-12))
    skk = 1.0 / comp_mann

    # uniform-flow column: K * sqrt(max(S0, so_llm)) with the slope of the
    # segment below (last node uses the slope above it) —
    # reference diffusive.f90:469-486
    slope = np.zeros((R, C))
    if C > 1:
        slope[:, :-1] = (z[:, :-1] - z[:, 1:]) / np.maximum(dx[:, :-1], 1e-12)
        slope[:, -1] = (z[:, -2] - z[:, -1]) / np.maximum(dx[:, -2], 1e-12)
    slope = np.maximum(slope, so_llm)
    uniform = conv * np.sqrt(slope)[None]

    tab = np.stack([el, area, peri, radius, conv, topw, first_moment,
                    dPdA, dKdA, uniform, np.broadcast_to(skk, area.shape)])
    # [11, nel, R, C] -> [R, C, 11, nel]
    tab = np.moveaxis(tab, (0, 1), (2, 3))
    return np.ascontiguousarray(tab), z_notch
