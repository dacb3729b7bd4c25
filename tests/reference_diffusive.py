"""Scalar NumPy oracle for the diffusive-wave solver.

A literal, loop-by-loop port of the reference Tulane diffusive core
(``/root/reference/src/kernel/diffusive/diffusive.f90:diffnw``, ``:75-940``)
— the executable spec of the diffusive math, written in the same role as
``tests/reference_impl.py`` plays for the MC kernel.  Nothing here is
vectorized or optimized; fidelity to the Fortran control flow is the point.

Ported pieces (reference file:line):
  * interpolation helpers  ``locate``/``LInterpol``/``intp_y``/``r_interpol``
    (diffusive.f90:2553-2753) including the ``|x2-x1|<1e-4 -> midpoint``
    LInterpol quirk and r_interpol's below-range clamp to ``min(y)``
  * synthetic cross-section polygon walk ``readXsection``
    (diffusive.f90:2093-2443) + the uniform-flow column pass (:469-486)
  * predictor ``mesh_diffusive_forward`` (:1108-1355) with the ghost-node
    row's swapped operands and the post-substitution head overwrite
  * corrector ``mesh_diffusive_backward`` (:1357-1553) + ``rtsafe``/
    ``funcd_diffdepth`` (:1568-1711)
  * adaptive stepping ``calculateDT`` (:942-991) and the full time loop
    (:632-847) incl. the initial backward sweep (:530-582)

Topology convention: every row is a mainstem reach; tributary inflows are a
per-reach time series summed at the reach head (the reference enumerates
upstream tributary reaches and sums their interpolated ``qtrib`` series —
linear interpolation commutes with the sum, so a pre-summed series is
exactly equivalent).

Known reference quirk NOT replicated: the initial-condition clamp
``oldY(i,j) < oldY(ncomp, nlinks)`` (diffusive.f90:579) indexes the last
reach's column with the *current* reach's node count — undefined unless the
last reach is an already-initialized mainstem with at least that many
nodes.  It is a no-op whenever upstream water surfaces sit above the
tailwater bottom surface (every real domain); we omit it.
"""

from __future__ import annotations

import math

import numpy as np

GRAV = 9.81
TOLERANCE = 1e-8
NEL = 501
TIMES_DEPTH = 4.0


# ---------------------------------------------------------------------------
# interpolation helpers (diffusive.f90:2553-2753)

def locate(xx, x):
    """Bisection locate (diffusive.f90:2701-2753), 0-based return in
    [-1, n-1]: x between xx[j] and xx[j+1]; -1/n-1 mean out of range."""
    n = len(xx)
    ascnd = xx[n - 1] >= xx[0]
    jl, ju = -1, n
    while ju - jl > 1:
        jm = (ju + jl + 2) // 2 - 1   # Fortran (ju+jl)/2 with 1-based idx
        if ascnd == (x >= xx[jm]):
            jl = jm
        else:
            ju = jm
    if x == xx[0]:
        return 0
    if x == xx[n - 1]:
        return n - 2
    return jl


def lin_interpol(x1, y1, x2, y2, x):
    """LInterpol (diffusive.f90:2650-2669) incl. the small-denominator
    midpoint quirk."""
    if abs(x2 - x1) < 0.0001:
        return 0.5 * (y1 + y2)
    return (y2 - y1) / (x2 - x1) * (x - x1) + y1


def intp_y(xarr, yarr, x):
    """intp_y (diffusive.f90:2671-2699): locate + LInterpol with linear
    extrapolation past both ends."""
    n = len(xarr)
    irow = locate(xarr, x)
    if irow == -1:
        irow = 0
    if irow == n - 1:
        irow = n - 2
    return lin_interpol(xarr[irow], yarr[irow], xarr[irow + 1],
                        yarr[irow + 1], x)


def r_interpol(x, y, xrt):
    """r_interpol (diffusive.f90:2553-2594): linear scan in range, linear
    extrapolation above range, clamp to min(y) below range."""
    kk = len(x)
    if (xrt <= np.max(x)) and (xrt >= np.min(x)):
        for k in range(kk - 1):
            if (x[k] - xrt) * (x[k + 1] - xrt) <= 0.0:
                return (xrt - x[k]) / (x[k + 1] - x[k]) \
                    * (y[k + 1] - y[k]) + y[k]
        return y[kk - 1]
    if xrt >= np.max(x):
        return (xrt - x[kk - 2]) / (x[kk - 1] - x[kk - 2]) \
            * (y[kk - 1] - y[kk - 2]) + y[kk - 2]
    return np.min(y)


# ---------------------------------------------------------------------------
# synthetic cross-section table (readXsection, diffusive.f90:2093-2443)

def _cal_dist(x1, y1, x2, y2):
    return math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + 1e-32)


def read_xsection(z_g, bo_g, traps_g, tw_g, twcc_g, mann_main, manncc,
                  times_depth=TIMES_DEPTH, nel=NEL):
    """Literal polygon-walk port of readXsection for one node.

    Returns (tab[11, nel], z_adjusted) with 0-based columns:
      0 elev 1 area 2 peri 3 radius 4 conveyance 5 topwidth
      6 first moment 7 dP/dA 8 dK/dA 9 uniform (unset) 10 compound 1/n
    """
    lft_mann = manncc
    rgt_mann = manncc
    hbf = (tw_g - bo_g) / (2.0 * traps_g)

    # the 8 polygon vertices (diffusive.f90:2159-2199)
    xcs = np.zeros(8)
    ycs = np.zeros(8)
    xcs[0], ycs[0] = 0.0, z_g + times_depth * hbf
    xcs[1], ycs[1] = 0.0, z_g + hbf
    xcs[2], ycs[2] = (twcc_g - tw_g) / 2.0, z_g + hbf
    xcs[3], ycs[3] = xcs[2] + traps_g * hbf, z_g
    xcs[4], ycs[4] = xcs[3] + bo_g, z_g
    xcs[5], ycs[5] = xcs[4] + traps_g * hbf, z_g + hbf
    xcs[6], ycs[6] = twcc_g, z_g + hbf
    xcs[7], ycs[7] = xcs[6], z_g + times_depth * hbf

    el_min = ycs[1:7].min()
    el_max = ycs[1:7].max()
    el_range = (el_max - el_min) * 2.0
    wall_top = el_min + el_range + 1.0

    # three sub-section polygons (diffusive.f90:2225-2266)
    all_x = [np.zeros(5), np.zeros(7), np.zeros(5)]
    all_y = [np.zeros(5), np.zeros(7), np.zeros(5)]
    all_x[0][1:4] = xcs[0:3]
    all_y[0][1:4] = ycs[0:3]
    all_x[0][0], all_y[0][0] = xcs[0], wall_top
    all_x[0][4], all_y[0][4] = xcs[2], wall_top
    all_x[1][1:3] = xcs[2:4]
    all_y[1][1:3] = ycs[2:4]
    all_x[1][4:6] = xcs[4:6]
    all_y[1][4:6] = ycs[4:6]
    all_x[1][0], all_y[1][0] = xcs[2], wall_top
    all_x[1][6], all_y[1][6] = xcs[5], wall_top
    all_x[2][1:4] = xcs[5:8]
    all_y[2][1:4] = ycs[5:8]
    all_x[2][0], all_y[2][0] = all_x[2][1], wall_top
    all_x[2][4], all_y[2][4] = all_x[2][3], wall_top
    # the 1-cm notch below the main-channel bed (diffusive.f90:2265-2266)
    all_x[1][3] = (all_x[1][2] + all_x[1][4]) / 2.0
    all_y[1][3] = all_y[1][2] - 0.01

    el_min_adj = all_y[1][3]    # z_g - 0.01
    elev = np.zeros(nel)
    elev[0] = el_min_adj
    for k in range(1, 4):
        elev[k] = el_min_adj + 0.01 / 4.0 * k
    elev[4] = el_min_adj + 0.01
    el_incr = el_range / (nel - 6.0)
    for k in range(5, nel):
        elev[k] = elev[4] + el_incr * (k - 4)

    mann3 = [lft_mann, mann_main, rgt_mann]
    el1 = np.zeros((nel, 3))
    a1 = np.zeros((nel, 3))
    peri1 = np.zeros((nel, 3))
    conv1 = np.zeros((nel, 3))
    tpw1 = np.zeros((nel, 3))
    new_i1 = np.zeros((nel, 3))
    diff_area = np.zeros((nel, 3))

    for kkk in range(3):
        xs = all_x[kkk]
        ys = all_y[kkk]
        num = len(xs)
        rmann = mann3[kkk]
        for j in range(nel):
            el_now = elev[j]
            if abs(el_now - el_min_adj) < TOLERANCE:
                el_now = el_now + 0.00001
            # find wetted spans by sign crossings (diffusive.f90:2307-2321)
            i_starts, i_ends = [], []
            i_find = 0
            for i in range(num - 1):
                y1, y2 = ys[i], ys[i + 1]
                if el_now <= y1 and el_now > y2 and i_find == 0:
                    i_find = 1
                    i_starts.append(i)
                if el_now > y1 and el_now <= y2 and i_find == 1:
                    i_find = 0
                    i_ends.append(i)
            cal_area = cal_peri = cal_topw = 0.0
            for i_s, i_e in zip(i_starts, i_ends):
                x1, x2 = xs[i_s], xs[i_s + 1]
                y1, y2 = ys[i_s], ys[i_s + 1]
                x_start = x1 if y1 == y2 \
                    else x1 + (el_now - y1) / (y2 - y1) * (x2 - x1)
                x1, x2 = xs[i_e], xs[i_e + 1]
                y1, y2 = ys[i_e], ys[i_e + 1]
                x_end = x1 if y1 == y2 \
                    else x1 + (el_now - y1) / (y2 - y1) * (x2 - x1)
                cal_topw += x_end - x_start
                # area: edge triangles + interior trapezoids (:2353-2356)
                cal_area += abs(0.5 * (xs[i_s + 1] - x_start)
                                * (el_now - ys[i_s + 1]))
                for i in range(i_s + 1, i_e):
                    cal_area += abs(0.5 * (xs[i + 1] - xs[i])
                                    * (2 * el_now - ys[i] - ys[i + 1]))
                cal_area += abs(0.5 * (xs[i_e] - x_end)
                                * (el_now - ys[i_e]))
                # perimeter with first/last wall exclusions (:2358-2364)
                p = _cal_dist(x_start, el_now, xs[i_s + 1], ys[i_s + 1])
                for i in range(i_s + 1, i_e):
                    p += _cal_dist(xs[i], ys[i], xs[i + 1], ys[i + 1])
                p += _cal_dist(x_end, el_now, xs[i_e], ys[i_e])
                if i_s == 0:
                    p -= _cal_dist(x_start, el_now, xs[i_s + 1], ys[i_s + 1])
                if i_e == num - 2:
                    p -= _cal_dist(x_end, el_now, xs[i_e], ys[i_e])
                cal_peri += p

            el1[j, kkk] = el_now
            a1[j, kkk] = cal_area
            peri1[j, kkk] = cal_peri
            redi = cal_area / cal_peri if cal_peri != 0.0 else np.inf
            conv = 1.0 / rmann * cal_area * redi ** (2.0 / 3.0) \
                if cal_peri != 0.0 else 0.0
            if cal_peri <= TOLERANCE:
                conv = 0.0
            conv1[j, kkk] = conv
            tpw1[j, kkk] = cal_topw
            if j == 0:
                diff_area[j, kkk] = cal_area
            elif el_now <= ys.min():
                diff_area[j, kkk] = cal_area
            else:
                diff_area[j, kkk] = cal_area - a1[j - 1, kkk]
            # first moment accumulation (diffusive.f90:2394-2399)
            water_elev = el1[j, kkk]
            acc = 0.0
            for jj in range(1, j + 1):
                center = el1[jj, kkk] - (el1[jj, kkk] - el1[jj - 1, kkk]) * 0.5
                acc += diff_area[jj, kkk] * (water_elev - center)
            new_i1[j, kkk] = acc

    tab = np.zeros((11, nel))
    for j in range(nel):
        sum_a = a1[j].sum()
        sum_p = peri1[j].sum()
        sum_k = conv1[j].sum()
        if j == 0:
            dpda = sum_p / sum_a
            dkda = sum_k / sum_a
        else:
            da = sum_a - a1[j - 1].sum()
            dpda = (sum_p - peri1[j - 1].sum()) / da
            dkda = (sum_k - conv1[j - 1].sum()) / da
        comp_mann = math.sqrt(
            (abs(peri1[j, 0]) * lft_mann ** 2
             + abs(peri1[j, 1]) * mann_main ** 2
             + abs(peri1[j, 2]) * rgt_mann ** 2)
            / (abs(peri1[j, 0]) + abs(peri1[j, 1]) + abs(peri1[j, 2])))
        tab[0, j] = el1[j, 0]
        tab[1, j] = sum_a
        tab[2, j] = sum_p
        tab[3, j] = sum_a / sum_p
        tab[4, j] = sum_k
        tab[5, j] = abs(tpw1[j, 0]) + abs(tpw1[j, 1]) + abs(tpw1[j, 2])
        tab[6, j] = new_i1[j].sum()
        tab[7, j] = dpda
        tab[8, j] = dkda
        tab[10, j] = 1.0 / comp_mann
    return tab, el_min_adj


def build_reference_tables(reaches, so_llm=0.0001, nel=NEL):
    """Tables + adjusted z for all reaches; adds the uniform-flow column
    (diffusive.f90:469-486).  Returns (tabs, z_adj) as per-reach lists."""
    tabs, z_adj = [], []
    for r in reaches:
        ncomp = len(r["z"])
        rt = np.zeros((ncomp, 11, nel))
        zt = np.zeros(ncomp)
        for i in range(ncomp):
            rt[i], zt[i] = read_xsection(
                r["z"][i], r["bo"][i], r["traps"][i], r["tw"][i],
                r["twcc"][i], r["mann"][i], r["manncc"][i], nel=nel)
        tabs.append(rt)
        z_adj.append(zt)
    for rt, zt, r in zip(tabs, z_adj, reaches):
        ncomp = len(zt)
        for i in range(ncomp):
            if i < ncomp - 1:
                slope = (zt[i] - zt[i + 1]) / r["dx"][i]
            else:
                slope = (zt[i - 1] - zt[i]) / r["dx"][i - 1]
            slope = max(slope, so_llm)
            rt[i, 9] = rt[i, 4] * slope ** 0.5
    return tabs, z_adj


# ---------------------------------------------------------------------------
# the simulator

class ReferenceDiffusive:
    """Scalar reference simulator over mainstem reaches.

    Arrays are left-aligned per reach (node 0 = head).  ``qlat_series`` is
    [nts, R, Cmax] *right-aligned* like the solver's DiffusiveDomain (so
    test fixtures are shared verbatim); ``trib_series`` is [nts, R].
    """

    def __init__(self, reaches, ds_reach, qlat_series, dt_ql,
                 trib_series, dt_qtrib, dtini_given,
                 tabs=None, z_adj=None,
                 cfl=0.95, c_llm=0.5, d_llm=10.0, d_ulm=10000.0,
                 q_llm=0.02831, so_llm=0.0001, theta=1.0,
                 dtini_divisor=10.0, dsbc_option=2,
                 db_depth=None, dt_db=3600.0,
                 mindepth_nstab=0.1):
        self.R = len(reaches)
        self.ncomp = [len(r["z"]) for r in reaches]
        C = max(self.ncomp)
        self.C = C
        self.ds = list(ds_reach)
        self.dx = [np.asarray(r["dx"], float) for r in reaches]
        if tabs is None:
            tabs, z_adj = build_reference_tables(reaches, so_llm=so_llm)
        self.tab = tabs        # per reach: [ncomp, 11, nel]
        self.z = z_adj         # per reach: [ncomp] notch-adjusted
        self.cfl, self.c_llm = cfl, c_llm
        self.d_llm, self.d_ulm = d_llm, d_ulm
        self.q_llm, self.so_llm, self.theta = q_llm, so_llm, theta
        self.dtini_given = dtini_given
        self.dtini_min = dtini_given / dtini_divisor
        self.dsbc_option = dsbc_option
        self.mindepth_nstab = mindepth_nstab
        self.db_depth = db_depth
        self.dt_db = dt_db

        # right-aligned qlat -> left-aligned per reach [nts, ncomp]
        nts_ql = qlat_series.shape[0]
        self.qlat = [np.asarray(qlat_series[:, j, C - self.ncomp[j]:], float)
                     for j in range(self.R)]
        # time arrays in MINUTES like the Fortran (:494-527), t0 = 0
        self.tarr_ql = np.zeros(nts_ql + 1)
        for n in range(1, nts_ql + 1):
            self.tarr_ql[n] = dt_ql * n / 60.0
        self.trib = np.asarray(trib_series, float)
        nts_tr = self.trib.shape[0]
        self.tarr_qtrib = np.array([dt_qtrib * n / 60.0
                                    for n in range(nts_tr)])
        if db_depth is not None:
            n_db = np.asarray(db_depth).shape[-1]
            self.tarr_db = np.array([dt_db * n / 60.0 for n in range(n_db)])

        self.min_dx = min(float(d[:self.ncomp[j] - 1].min())
                          for j, d in enumerate(self.dx))
        # upstream mainstem reach ids per reach
        self.up = [[] for _ in range(self.R)]
        for j, d in enumerate(self.ds):
            if d >= 0:
                self.up[d].append(j)
        # reach processing orders: predictor upstream->downstream,
        # corrector downstream->upstream (frnw topological order)
        order = []
        seen = set()

        def visit(j):
            if j in seen:
                return
            for u in self.up[j]:
                visit(u)
            seen.add(j)
            order.append(j)

        for j in range(self.R):
            if self.ds[j] < 0:
                visit(j)
        self.pred_order = order
        self.corr_order = order[::-1]

    # -- table interpolation (intp_xsec_tab, diffusive.f90:1713-1748)
    def intp_tab(self, j, i, xcol, ycol, x):
        t = self.tab[j][i]
        n = t.shape[1]
        irow = locate(t[xcol], x)
        if irow == -1:
            irow = 0
        if irow == n - 1:
            irow = n - 2
        return lin_interpol(t[xcol, irow], t[ycol, irow],
                            t[xcol, irow + 1], t[ycol, irow + 1], x)

    def _lateral_flow(self, j, t_min):
        """Interpolate reach j's qlat at time t [min] (diffusive.f90:650-656).
        Node ncomp-1's qlat is untouched by the reference (only 1..ncomp-1
        are interpolated; the last is never used)."""
        nc = self.ncomp[j]
        lat = np.zeros(nc)
        q = self.qlat[j]
        nts = q.shape[0]
        for i in range(nc - 1):
            varr = np.concatenate([[q[0, i]], q[:, i]])
            lat[i] = intp_y(self.tarr_ql[:nts + 1], varr, t_min)
        return lat

    def _trib_at(self, j, t_min):
        return intp_y(self.tarr_qtrib, self.trib[:, j], t_min)

    def _db_elev_at(self, j, t_min):
        varr = np.asarray(self.db_depth[j], float) + self.z[j][-1]
        return intp_y(self.tarr_db, varr, t_min)

    # -- rtsafe + funcd (diffusive.f90:1555-1711)
    def _funcd(self, j, i, q_cur, q_ds, z_cur, z_ds, y_cur, y_ds):
        elv_ds = y_ds + z_ds
        conv_ds = self.intp_tab(j, i + 1, 0, 4, elv_ds)
        sf_ds = abs(q_ds) * q_ds / conv_ds ** 2
        elv_cur = y_cur + z_cur
        conv_cur = self.intp_tab(j, i, 0, 4, elv_cur)
        sf_cur = abs(q_cur) * q_cur / conv_cur ** 2
        slope = (self.z[j][i] - self.z[j][i + 1]) / self.dx[j][i]
        slope = max(slope, self.so_llm)
        f = y_cur - y_ds + slope * self.dx[j][i] \
            - 0.5 * (sf_cur + sf_ds) * self.dx[j][i]
        dkda = self.intp_tab(j, i, 0, 8, elv_cur)
        topw = self.intp_tab(j, i, 0, 5, elv_cur)
        df = 1.0 + (abs(q_cur) * q_cur / conv_cur ** 3) \
            * self.dx[j][i] * topw * dkda
        return f, df

    def _rtsafe(self, j, i, q_cur, q_ds, z_cur, z_ds, y_ds, old_y):
        elv_norm = self.intp_tab(j, i, 9, 0, abs(q_cur))
        y_norm = elv_norm - self.z[j][i]
        y_old = old_y[i] - self.z[j][i]
        x1 = 0.5 * (y_norm + y_old) * 0.1
        x2 = 0.5 * (y_norm + y_old) * 2.0
        fl, _ = self._funcd(j, i, q_cur, q_ds, z_cur, z_ds, x1, y_ds)
        fh, _ = self._funcd(j, i, q_cur, q_ds, z_cur, z_ds, x2, y_ds)
        if (fl > 0 and fh > 0) or (fl < 0 and fh < 0):
            return y_norm
        if fl == 0.0:
            return x1
        if fh == 0.0:
            return x2
        if fl < 0.0:
            xl, xh = x1, x2
        else:
            xh, xl = x1, x2
        root = 0.5 * (x1 + x2)
        dxold = abs(x2 - x1)
        dxx = dxold
        f, df = self._funcd(j, i, q_cur, q_ds, z_cur, z_ds, root, y_ds)
        for _ in range(40):
            if ((root - xh) * df - f) * ((root - xl) * df - f) > 0.0 \
                    or abs(2.0 * f) > abs(dxold * df):
                dxold = dxx
                dxx = 0.5 * (xh - xl)
                root = xl + dxx
                if xl == root:
                    return root
            else:
                dxold = dxx
                dxx = f / df
                temp = root
                root = root - dxx
                if temp == root:
                    return root
            if abs(dxx) < 1e-4:
                return root
            f, df = self._funcd(j, i, q_cur, q_ds, z_cur, z_ds, root, y_ds)
            if f < 0.0:
                xl = root
            else:
                xh = root
        return y_norm

    # -- predictor (mesh_diffusive_forward, diffusive.f90:1108-1355)
    def _forward(self, j, dtini, old_q, qpx, cel, dif, new_q1, lat):
        nc = self.ncomp[j]
        dx = self.dx[j]
        th = self.theta
        allqlat = 0.0
        for i in range(1, nc - 1):
            allqlat += lat[i] * dx[i]

        eei = np.zeros(nc)
        ffi = np.zeros(nc)
        exi = np.zeros(nc)
        fxi = np.zeros(nc)
        eei[0] = 1.0

        def hermite(cour2, dxm):
            a1 = 3.0 * cour2 ** 2 - 2.0 * cour2 ** 3
            a2 = 1.0 - a1
            a3 = (cour2 ** 2 - cour2 ** 3) * dxm
            a4 = (-cour2 + 2.0 * cour2 ** 2 - cour2 ** 3) * dxm
            b1 = (6.0 * cour2 - 6.0 * cour2 ** 2) / (-dxm)
            b2 = -b1
            b3 = -(2.0 * cour2 - 3.0 * cour2 ** 2)
            b4 = -(-1.0 + 4.0 * cour2 - 3.0 * cour2 ** 2)
            d1 = (6.0 - 12.0 * cour2) / dxm ** 2
            d2 = -d1
            d3 = (2.0 - 6.0 * cour2) / dxm
            d4 = (4.0 - 6.0 * cour2) / dxm
            h1 = 12.0 / dxm ** 3
            h2 = -h1
            h3 = 6.0 / dxm ** 2
            h4 = h3
            return (a1, a2, a3, a4), (b1, b2, b3, b4), \
                (d1, d2, d3, d4), (h1, h2, h3, h4)

        for i in range(1, nc):
            dxm = dx[i - 1]
            cour2 = abs(cel[i]) * dtini / dxm
            A, B, D, H = hermite(cour2, dxm)
            alpha = 1.0 if i == nc - 1 else dx[i] / dxm
            qy = A[0] * old_q[i - 1] + A[1] * old_q[i] \
                + A[2] * qpx[i - 1] + A[3] * qpx[i]
            qxy = B[0] * old_q[i - 1] + B[1] * old_q[i] \
                + B[2] * qpx[i - 1] + B[3] * qpx[i]
            qxxy = D[0] * old_q[i - 1] + D[1] * old_q[i] \
                + D[2] * qpx[i - 1] + D[3] * qpx[i]
            qxxxy = H[0] * old_q[i - 1] + H[1] * old_q[i] \
                + H[2] * qpx[i - 1] + H[3] * qpx[i]
            ppi = -th * dif[i] * dtini / dxm ** 2 \
                * 2.0 / (alpha * (alpha + 1.0)) * alpha
            qqi = 1.0 - ppi * (alpha + 1.0) / alpha
            rri = ppi / alpha
            ssi = qy + dtini * dif[i] * (1.0 - th) * qxxy
            sxi = qxy + dtini * dif[i] * (1.0 - th) * qxxxy
            eei[i] = -rri / (ppi * eei[i - 1] + qqi)
            ffi[i] = (ssi - ppi * ffi[i - 1]) / (ppi * eei[i - 1] + qqi)
            exi[i] = -rri / (ppi * exi[i - 1] + qqi)
            fxi[i] = (sxi - ppi * fxi[i - 1]) / (ppi * exi[i - 1] + qqi)

        # ghost node: operands swapped (oldQ[nc-1] plays "upstream"),
        # celerity at nc-2, diffusivity at nc-1 for ppi but nc-2 for ssi
        # (diffusive.f90:1230-1277)
        dxm = dx[nc - 2]
        cour2 = abs(cel[nc - 2]) * dtini / dxm
        A, B, D, H = hermite(cour2, dxm)
        qy = A[0] * old_q[nc - 1] + A[1] * old_q[nc - 2] \
            + A[2] * qpx[nc - 1] + A[3] * qpx[nc - 2]
        qxy = B[0] * old_q[nc - 1] + B[1] * old_q[nc - 2] \
            + B[2] * qpx[nc - 1] + B[3] * qpx[nc - 2]
        qxxy = D[0] * old_q[nc - 1] + D[1] * old_q[nc - 2] \
            + D[2] * qpx[nc - 1] + D[3] * qpx[nc - 2]
        qxxxy = H[0] * old_q[nc - 1] + H[1] * old_q[nc - 2] \
            + H[2] * qpx[nc - 1] + H[3] * qpx[nc - 2]
        ppi = -th * dif[nc - 1] * dtini / dxm ** 2 * 2.0 / 2.0
        qqi = 1.0 - ppi * 2.0
        ssi = qy + dtini * dif[nc - 2] * (1.0 - th) * qxxy
        sxi = qxy + dtini * dif[nc - 2] * (1.0 - th) * qxxxy
        qp_ghost = old_q[nc - 2]
        qpx_ghost = 0.0

        qp = np.zeros(nc)
        qpx_new = np.zeros(nc)
        qp[nc - 1] = eei[nc - 1] * qp_ghost + ffi[nc - 1]
        qpx_new[nc - 1] = exi[nc - 1] * qpx_ghost + fxi[nc - 1]
        for i in range(nc - 2, -1, -1):
            qp[i] = eei[i] * qp[i + 1] + ffi[i]
            qpx_new[i] = exi[i] * qpx_new[i + 1] + fxi[i]
        qp[0] = new_q1 + allqlat
        for i in range(nc):
            if abs(qp[i]) < self.q_llm:
                qp[i] = self.q_llm
        return qp, qpx_new

    # -- corrector (mesh_diffusive_backward, diffusive.f90:1357-1553)
    def _backward(self, j, qp, new_y, old_y):
        nc = self.ncomp[j]
        z = self.z[j]
        dx = self.dx[j]
        cel2 = np.zeros(nc)
        dif2 = np.zeros(nc)
        for i in range(nc - 1, -1, -1):
            t = self.tab[j][i]
            xt = new_y[i]
            sq = (t[0] - z[i]) ** 2
            co = r_interpol(sq, t[4], (new_y[i] - z[i]) ** 2)
            bo = r_interpol(t[0], t[5], xt)
            sk = r_interpol(t[0], t[10], xt)
            sfi = qp[i] * abs(qp[i]) / co ** 2
            cel2[i] = 5.0 / 3.0 * abs(sfi) ** 0.3 * abs(qp[i]) ** 0.4 \
                / bo ** 0.4 / (1.0 / sk) ** 0.6
            c_ulm = self.cfl * dx[i - 1 if i > 0 else i] / self.dtini_min
            if cel2[i] > c_ulm:
                cel2[i] = c_ulm
            dif2[i] = abs(qp[i]) / 2.0 / bo / abs(sfi)
            if i > 0:
                y_ds = max(new_y[i] - z[i], 0.005)
                y_cur = self._rtsafe(j, i - 1, qp[i - 1], qp[i],
                                     z[i - 1], z[i], y_ds, old_y)
                new_y[i - 1] = min(y_cur + z[i - 1], 1.0e5)
        cel_mean = cel2.sum() / nc
        if cel_mean < self.c_llm:
            cel_mean = self.c_llm
        dif_mean = dif2.sum() / nc
        dif_mean = min(max(dif_mean, self.d_llm), self.d_ulm)
        return (np.full(nc, cel_mean), np.full(nc, dif_mean))

    # -- initialization (diffusive.f90:530-582)
    def initialize(self, iniq):
        """iniq: [R, Cmax] right-aligned initial discharge (like the
        solver) or per-reach list.  Returns state dict."""
        old_q = []
        for j in range(self.R):
            if isinstance(iniq, np.ndarray) and iniq.ndim == 2:
                old_q.append(np.asarray(
                    iniq[j, self.C - self.ncomp[j]:], float).copy())
            else:
                old_q.append(np.asarray(iniq[j], float).copy())
        old_y = [np.zeros(self.ncomp[j]) for j in range(self.R)]
        new_y = [np.zeros(self.ncomp[j]) for j in range(self.R)]
        cel = [np.ones(self.ncomp[j]) for j in range(self.R)]
        dif = [np.full(self.ncomp[j], 10.0) for j in range(self.R)]
        for j in self.corr_order:
            nc = self.ncomp[j]
            if self.ds[j] < 0:
                if self.dsbc_option == 1:
                    e = self._db_elev_at(j, 0.0)
                    new_y[j][nc - 1] = e
                    if e - self.z[j][nc - 1] < self.mindepth_nstab:
                        new_y[j][nc - 1] = self.mindepth_nstab \
                            + self.z[j][nc - 1]
                else:
                    new_y[j][nc - 1] = self.intp_tab(
                        j, nc - 1, 9, 0, old_q[j][nc - 1])
            else:
                new_y[j][nc - 1] = new_y[self.ds[j]][0]
            wdepth = new_y[j][nc - 1] - self.z[j][nc - 1]
            for i in range(nc - 1):
                old_y[j][i] = wdepth + self.z[j][i]
            cel[j], dif[j] = self._backward(j, old_q[j], new_y[j], old_y[j])
            old_y[j] = new_y[j].copy()
        return dict(old_q=old_q, old_y=old_y,
                    qpx=[np.zeros(self.ncomp[j]) for j in range(self.R)],
                    cel=cel, dif=dif)

    # -- time loop (diffusive.f90:632-847)
    def run(self, state, tfin_s, save_interval):
        """Advance to tfin (seconds); returns saves list of
        (t_seconds, q per-reach list, y per-reach list)."""
        t = 0.0           # minutes, t0 = 0
        tfin_min = tfin_s / 60.0
        max_cel_dx = 1.0 / self.min_dx     # maxCelerity=1 (:613-614)
        old_q, old_y = state["old_q"], state["old_y"]
        qpx, cel, dif = state["qpx"], state["cel"], state["dif"]
        saves = []
        while t < tfin_min - 1e-12:
            # calculateDT (:942-991), t in minutes
            dtini = self.cfl / max_cel_dx
            a = math.floor(t / (save_interval / 60.0))
            b = math.floor((t + dtini / 60.0) / (save_interval / 60.0))
            if b > a:
                dtini = (a + 1) * save_interval - t * 60.0
            if t + dtini / 60.0 > tfin_min:
                dtini = (tfin_min - t) * 60.0

            new_q = [None] * self.R
            new_y = [old_y[j].copy() for j in range(self.R)]
            # PREDICTOR, upstream -> downstream (:639-694)
            for j in self.pred_order:
                lat = self._lateral_flow(j, t)
                q1 = 0.0
                for u in self.up[j]:
                    q1 += new_q[u][self.ncomp[u] - 1]
                q1 += self._trib_at(j, t + dtini / 60.0)
                q1 += lat[0] * self.dx[j][0]
                new_q[j], qpx[j] = self._forward(
                    j, dtini, old_q[j], qpx[j], cel[j], dif[j], q1, lat)
            # CORRECTOR, downstream -> upstream (:701-753)
            for j in self.corr_order:
                nc = self.ncomp[j]
                if self.ds[j] >= 0:
                    new_y[j][nc - 1] = new_y[self.ds[j]][0]
                else:
                    if self.dsbc_option == 1:
                        e = self._db_elev_at(j, t + dtini / 60.0)
                        new_y[j][nc - 1] = e
                        if e - self.z[j][nc - 1] < self.mindepth_nstab:
                            new_y[j][nc - 1] = self.mindepth_nstab \
                                + self.z[j][nc - 1]
                    else:
                        new_y[j][nc - 1] = self.intp_tab(
                            j, nc - 1, 9, 0, abs(new_q[j][nc - 1]))
                cel[j], dif[j] = self._backward(
                    j, new_q[j], new_y[j], old_y[j])
            max_cel_dx = 0.0
            for j in range(self.R):
                nc = self.ncomp[j]
                for i in range(nc - 1):
                    max_cel_dx = max(max_cel_dx,
                                     cel[j][i] / self.dx[j][i])
            t = t + dtini / 60.0
            boundary_hit = (b > a)
            if boundary_hit or t >= tfin_min - 1e-12:
                saves.append((t * 60.0,
                              [q.copy() for q in new_q],
                              [y.copy() for y in new_y]))
            old_q = new_q
            old_y = new_y
        state.update(old_q=old_q, old_y=old_y, qpx=qpx, cel=cel, dif=dif)
        return saves
