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

    # evaluate first row slightly above the notch bottom; the reference
    # ALSO stores the perturbed value in the elevation column
    # (el1(j,kkk) = el_now after the +0.00001, diffusive.f90:2296-2300,
    # :2368) — so eval_el is both the geometry argument and the stored grid
    eval_el = grid.copy()
    eval_el[..., 0] = z_notch + 1e-5

    e = np.moveaxis(eval_el, -1, 0)          # [nel, R, C]
    area3, peri3, topw3 = _region_geometry(
        e, z[None], bo[None], traps[None], tw[None], twcc[None], hbf[None])
    # area3 etc: [3, nel, R, C]

    # sub-section conveyance zeroed when peri <= TOLERANCE=1e-8
    # (reference diffusive.f90:2374-2377)
    with np.errstate(divide="ignore", invalid="ignore"):
        r3 = np.where(peri3 > 1e-8, area3 / peri3, 0.0)
        n3 = np.stack([np.broadcast_to(manncc, area3.shape[1:]),
                       np.broadcast_to(mann, area3.shape[1:]),
                       np.broadcast_to(manncc, area3.shape[1:])])
        conv3 = np.where(peri3 > 1e-8,
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

    # first moment of area via midpoint accumulation (reference method);
    # centers use the STORED (perturbed-row-0) elevations like el1
    el = np.moveaxis(eval_el, -1, 0)
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


def build_xsec_table_natural(x_bathy, z_bathy, mann_bathy, nel=NEL,
                             times_depth=TIMES_DEPTH):
    """Lookup table for one natural (surveyed bathymetry) cross-section.

    Reference ``readXsection_natural_mann_vertices``
    (``diffusive.f90:1756-2091``): piecewise-linear section between vertical
    end walls, Einstein-Horton composite roughness
    ``n_eq = (sum P_i n_i^1.5 / P)^(2/3)`` with wall roughness zeroed, and
    monotone smoothing of the conveyance and dK/dA curves.

    Args:
        x_bathy, z_bathy, mann_bathy: [n_sta] station/elevation/roughness

    Returns ([11, nel] table, z_datum) — columns as in
    ``build_xsec_tables`` (first moment/dPdA unset, matching the
    reference's natural path).
    """
    x = np.asarray(x_bathy, np.float64)
    x = x - x[0]
    z = np.asarray(z_bathy, np.float64)
    n = np.minimum(np.asarray(mann_bathy, np.float64), 0.15)

    el_min = z.min()
    el_max = z.max()
    el_range = (el_max - el_min) * times_depth
    wall_top = el_min + el_range + 1.0

    # vertices with vertical end walls; per-segment roughness = left vertex
    xv = np.concatenate([[x[0]], x, [x[-1]]])
    zv = np.concatenate([[wall_top], z, [wall_top]])
    nseg = xv.size - 1
    seg_mann = np.zeros(nseg)
    seg_mann[1:nseg] = n[:nseg - 1]
    seg_mann[0] = 0.0          # left wall
    seg_mann[nseg - 1] = 0.0   # right wall
    is_wall = np.zeros(nseg, bool)
    is_wall[0] = is_wall[-1] = True

    el = el_min + np.arange(nel) * (el_range / (nel - 1.0))
    el_eval = el.copy()
    el_eval[np.abs(el_eval - el_min) < 1e-8] += 1e-5
    e = el_eval[:, None]                       # [nel, 1]

    x1, x2 = xv[:-1][None], xv[1:][None]       # [1, nseg]
    z1, z2 = zv[:-1][None], zv[1:][None]
    lo = np.minimum(z1, z2)
    hi = np.maximum(z1, z2)
    dx_seg = x2 - x1
    dz = np.abs(z2 - z1)
    length = np.sqrt(dx_seg ** 2 + (z2 - z1) ** 2 + 1e-32)

    # wetted fraction of each segment at elevation e (clip at the waterline)
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.clip((e - lo) / np.where(hi > lo, hi - lo, 1.0), 0.0, 1.0)
        frac = np.where(hi <= lo, (e >= lo).astype(float), frac)
    wet_w = np.abs(dx_seg) * frac              # wetted horizontal extent
    wet_len = length * frac                    # wetted segment length
    # area under the waterline above the segment: trapezoid of the wetted part
    depth_lo = np.clip(e - lo, 0.0, None)
    depth_hi = np.clip(e - hi, 0.0, None)
    seg_area = 0.5 * (depth_lo + depth_hi) * np.abs(dx_seg) * \
        np.where(frac >= 1.0, 1.0, 0.0) \
        + np.where(frac < 1.0, 0.5 * depth_lo * wet_w, 0.0)

    area = seg_area.sum(axis=1)
    topw = wet_w.sum(axis=1)
    peri_seg = np.where(is_wall[None, :], 0.0, wet_len)
    peri = peri_seg.sum(axis=1)
    pmann = (peri_seg * seg_mann[None, :] ** 1.5).sum(axis=1)

    with np.errstate(divide="ignore", invalid="ignore"):
        radius = np.where(peri > 1e-10, area / peri, 0.0)
        n_eq = np.where(peri > 1e-10, (pmann / peri) ** (2.0 / 3.0), 1.0)
        n_eq = np.maximum(n_eq, 1e-6)
        conv = np.where(peri > 1e-10,
                        (1.0 / n_eq) * area * radius ** (2.0 / 3.0), 0.0)

    dA = np.diff(area)
    dkda = np.concatenate([
        [conv[0] / max(area[0], 1e-12)],
        np.diff(conv) / np.where(np.abs(dA) > 1e-12, dA, 1e-12)])

    conv = _monotone_smooth(el, conv)
    dkda = _monotone_smooth(el, dkda)

    tab = np.zeros((11, nel))
    tab[0] = el_eval
    tab[1] = area
    tab[2] = peri
    tab[3] = radius
    tab[4] = conv
    tab[5] = topw
    tab[8] = dkda
    tab[10] = 1.0 / n_eq
    return tab, el_min


def _monotone_smooth(el, v):
    """Reference's increasing-curve repair (diffusive.f90:1951-2014):
    where the curve dips, bridge linearly to the next larger value."""
    v = v.copy()
    nel = v.size
    iel = 1
    while iel < nel:
        if v[iel] <= v[iel - 1]:
            ii = iel
            while ii < nel - 1 and v[ii] < v[iel - 1]:
                ii += 1
            if ii >= nel - 1 and v[ii] < v[iel - 1]:
                v[ii] = 1.01 * v[iel - 1]
            slope = (v[ii] - v[iel - 1]) / max(el[ii] - el[iel - 1], 1e-12)
            for k in range(iel, ii):
                v[k] = v[iel - 1] + slope * (el[k] - el[iel - 1])
            iel = ii
        else:
            iel += 1
    return v
