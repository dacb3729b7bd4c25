"""Scalar NumPy oracle implementations of the reference kernels.

Written directly from the NWM equations (reference
``src/kernel/muskingum/MCsingleSegStime_f2py_NOLOOP.f90`` and
``src/kernel/reservoir/Level_Pool/module_levelpool.F``) as plain, slow,
scalar Python — used only as the test oracle for the vectorized JAX ops,
mirroring how the reference validates its Fortran kernel against a scalar
reimplementation (``kernel/muskingum/test_MC_kernel.py``).

``dtype=np.float32`` reproduces the reference's single-precision arithmetic
closely enough to hit its published golden values; ``np.float64`` gives the
clean-algorithm answer for tolerance-based property tests.
"""

from __future__ import annotations

import numpy as np

MINDEPTH = 0.01


def _hydraulic_geometry(h, bfd, bw, twcc, z, f):
    twl = f(bw + 2.0 * z * h)
    h_gt = max(f(h - bfd), f(0.0))
    h_lt = min(bfd, h)
    if h_gt > 0.0 and twcc <= 0.0:
        h_gt = f(0.0)
        h_lt = h
    area = f(f(bw + h_lt * z) * h_lt)
    wp = f(bw + 2.0 * h_lt * np.sqrt(f(1.0 + z * z)))
    areac = f(twcc * h_gt)
    wpc = f(twcc + 2.0 * h_gt) if h_gt > 0.0 else f(0.0)
    r = f((area + areac) / (wp + wpc)) if (wp + wpc) != 0.0 else f(0.0)
    return twl, h_lt, h_gt, area, areac, wp, wpc, r


def _secant2_h(z, bw, bfd, twcc, s0, n, ncc, dt, dx, qdp, ql, qup, quc,
               h, interval, qj_in, c_in, f):
    """Returns (Qj, C1, C2, C3, C4, X)."""
    twl, h_lt, h_gt, area, areac, wp, wpc, r = _hydraulic_geometry(
        h, bfd, bw, twcc, z, f)

    if (h > bfd) and (twcc > 0.0) and (ncc > 0.0):
        ck = max(
            f(0.0),
            f((f(np.sqrt(s0)) / n
               * (f(5.0 / 3.0) * r ** f(2.0 / 3.0)
                  - f(2.0 / 3.0) * r ** f(5.0 / 3.0)
                  * (2.0 * np.sqrt(f(1.0 + z * z)) / f(bw + 2.0 * bfd * z))))
              * area
              + (f(np.sqrt(s0)) / ncc) * f(5.0 / 3.0)
              * f(h - bfd) ** f(2.0 / 3.0) * areac)
            / f(area + areac),
        )
    elif h > 0.0:
        ck = max(
            f(0.0),
            f(np.sqrt(s0)) / n
            * (f(5.0 / 3.0) * r ** f(2.0 / 3.0)
               - f(2.0 / 3.0) * r ** f(5.0 / 3.0)
               * (2.0 * np.sqrt(f(1.0 + z * z)) / f(bw + 2.0 * h * z))),
        )
    else:
        ck = f(0.0)

    km = max(dt, f(dx / ck)) if ck > 0.0 else dt

    if interval == 1:
        numer = qj_in
        lo = f(0.0)
    else:
        c1i, c2i, c3i, c4i = c_in
        numer = f(c1i * qup + c2i * quc + c3i * qdp + c4i)
        lo = f(0.25)

    if (h > bfd) and (twcc > 0.0) and (ncc > 0.0) and (ck > 0.0):
        x = min(f(0.5), max(lo, f(0.5 * (1.0 - numer / f(2.0 * twcc * s0 * ck * dx)))))
    elif ck > 0.0:
        x = min(f(0.5), max(lo, f(0.5 * (1.0 - numer / f(2.0 * twl * s0 * ck * dx)))))
    else:
        x = f(0.5)

    d = f(km * f(1.0 - x) + dt / 2.0)
    c1 = f((km * x + dt / 2.0) / d)
    c2 = f((dt / 2.0 - km * x) / d)
    c3 = f((km * f(1.0 - x) - dt / 2.0) / d)
    c4 = f((ql * dt) / d)

    if interval == 2:
        base = f(c1 * qup + c2 * quc + c3 * qdp)
        if c4 < 0.0 and abs(c4) > base:
            c4 = f(-base)

    if (wp + wpc) > 0.0:
        n_eff = f((wp * n + wpc * ncc) / (wp + wpc))
        qj = f(f(c1 * qup + c2 * quc + c3 * qdp + c4)
               - f((1.0 / n_eff) * f(area + areac) * r ** f(2.0 / 3.0)
                   * np.sqrt(s0)))
    else:
        qj = f(0.0)
    return qj, c1, c2, c3, c4, x


def muskingum_cunge_ref(dt, qup, quc, qdp, ql, dx, bw, tw, twcc, n, ncc,
                        cs, s0, depthp, dtype=np.float64):
    """Scalar reference solve. Returns (qdc, velc, depthc, ck, cn, X)."""
    f = dtype
    dt, qup, quc, qdp, ql = f(dt), f(qup), f(quc), f(qdp), f(ql)
    dx, bw, tw, twcc = f(dx), f(bw), f(tw), f(twcc)
    n, ncc, cs, s0, depthp = f(n), f(ncc), f(cs), f(s0), f(depthp)

    maxiter = 100
    mindepth = f(MINDEPTH)
    aerror = f(0.01)
    rerror = f(1.0)
    tries = 0

    z = f(1.0) if cs == 0.0 else f(1.0 / cs)
    if bw > tw:
        bfd = f(bw / f(0.00001))
    elif bw == tw:
        bfd = f(bw / (2.0 * z))
    else:
        bfd = f((tw - bw) / (2.0 * z))

    depthc = max(depthp, f(0.0))
    h = f(depthc * f(1.33) + mindepth)
    h_0 = f(depthc * f(0.67))

    qdc = f(0.0)
    velc = f(0.0)
    x = f(0.0)
    qj0_slot = f(0.0)
    c1 = c2 = c3 = c4 = f(0.0)

    if ql > 0.0 or qup > 0.0 or quc > 0.0 or qdp > 0.0:
        while True:  # label 110
            it = 0
            while rerror > 0.01 and aerror >= mindepth and it <= maxiter:
                qj0_slot, c1a, c2a, c3a, c4a, _ = _secant2_h(
                    z, bw, bfd, twcc, s0, n, ncc, dt, dx, qdp, ql, qup, quc,
                    h_0, 1, qj0_slot, None, f)
                qj, c1, c2, c3, c4, x = _secant2_h(
                    z, bw, bfd, twcc, s0, n, ncc, dt, dx, qdp, ql, qup, quc,
                    h, 2, None, (c1a, c2a, c3a, c4a), f)

                if qj0_slot - qj != 0.0:
                    h_1 = f(h - (qj * f(h_0 - h)) / f(qj0_slot - qj))
                    if h_1 < 0.0:
                        h_1 = h
                else:
                    h_1 = h

                if h > 0.0:
                    rerror = f(abs(f(h_1 - h) / h))
                    aerror = f(abs(f(h_1 - h)))
                else:
                    rerror = f(0.0)
                    aerror = f(0.9)

                h_0 = max(f(0.0), h)
                h = max(f(0.0), h_1)
                it += 1
                if h < mindepth:
                    break

            # label 111
            if it >= maxiter:
                tries += 1
                if tries <= 4:
                    h = f(h * f(1.33))
                    h_0 = f(h_0 * f(0.67))
                    maxiter += 25
                    continue  # goto 110
            break

        qmc = f(c1 * qup + c2 * quc + c3 * qdp + c4)
        if qmc < 0.0:
            base = f(c1 * qup + c2 * quc + c3 * qdp)
            if c4 < 0.0 and abs(c4) > base:
                qdc = f(0.0)
            else:
                qdc = max(f(c1 * qup + c2 * quc + c4), f(c1 * qup + c3 * qdp + c4))
        else:
            qdc = qmc

        twl = f(bw + 2.0 * z * h)
        r = f(f(h * f(bw + twl) / 2.0)
              / f(bw + 2.0 * (f(f(twl - bw) / 2.0) ** f(2.0) + h ** f(2.0)) ** f(0.5)))
        velc = f(f(1.0 / n) * r ** f(2.0 / 3.0) * np.sqrt(s0))
        depthc = h
    else:
        qdc = f(0.0)
        velc = f(0.0)
        depthc = f(0.0)

    # courant diagnostics (always)
    twl, h_lt, h_gt, area, areac, wp, wpc, r = _hydraulic_geometry(
        h, bfd, bw, twcc, z, f)
    with np.errstate(divide="ignore", invalid="ignore"):
        ck_ch = f(np.sqrt(s0)) / n * (
            f(5.0 / 3.0) * r ** f(2.0 / 3.0)
            - f(2.0 / 3.0) * r ** f(5.0 / 3.0)
            * (2.0 * np.sqrt(f(1.0 + z * z)) / f(bw + 2.0 * h_lt * z)))
        ck_fp = (f(np.sqrt(s0)) / ncc if ncc > 0.0 else f(0.0)) \
            * f(5.0 / 3.0) * h_gt ** f(2.0 / 3.0)
        if area + areac > 0.0:
            ck = max(f(0.0), f((ck_ch * area + ck_fp * areac) / f(area + areac)))
        else:
            ck = f(0.0)
    cn = f(ck * (dt / dx))
    return qdc, velc, depthc, ck, cn, x


def levelpool_ref(H, qi0, qi1, ql, dt, ar, we, maxh, wc, wl, dl, oe, oc, oa,
                  dtype=np.float64):
    """Scalar level-pool step (reference ``LEVELPOOL_PHYSICS``).

    Returns (outflow, new_water_elevation).
    """
    f = dtype
    H, qi0, qi1, ql, dt = f(H), f(qi0), f(qi1), f(ql), f(dt)
    ar, we, maxh = f(ar), f(we), f(maxh)
    wc, wl, dl, oe, oc, oa = f(wc), f(wl), f(dl), f(oe), f(oc), f(oa)

    it = qi0
    itdt_3 = f(qi0 + (qi1 + ql - qi0) * f(0.33))
    itdt_2_3 = f(qi0 + (qi1 + ql - qi0) * f(0.67))
    max_weir_depth = f(maxh - we)
    sap = f(ar * f(1.0e6))

    def discharge_at(elev, head_elev):
        """elev: elevation for the weir head; head_elev: orifice head elev."""
        dh = f(elev - we)
        if dh > max_weir_depth:
            dh = max_weir_depth
        tmp1 = f(oc * oa * np.sqrt(f(2.0 * f(9.81) * f(head_elev - oe))))
        tmp2 = f(wc * wl * dh ** f(1.5))
        if H > maxh:
            return f(tmp1 + tmp2 + wc * (wl * dl) * f(H - maxh) ** f(1.5))
        elif dh > 0.0:
            return f(tmp1 + tmp2)
        elif head_elev > oe:
            return f(oc * oa * np.sqrt(f(2.0 * f(9.81) * f(head_elev - oe))))
        else:
            return f(0.0)

    with np.errstate(invalid="ignore"):
        d = discharge_at(H, H)
        dh1 = f(((it - d) / sap) * dt) if sap > 0 else f(0.0)

        d = discharge_at(f(H + dh1 / 3.0), f(H + dh1 / 3.0))
        dh2 = f(((itdt_3 - d) / sap) * dt) if sap > 0 else f(0.0)

        d = discharge_at(f(H + f(0.667) * dh2), f(H + dh2 * f(0.667)))
        dh3 = f(((itdt_2_3 - d) / sap) * dt) if sap > 0 else f(0.0)

        dh = f(dh1 / 4.0 + f(0.75) * dh3)
        H = f(H + dh)

        qo1 = discharge_at(H, H)
    return qo1, H


def hybrid_da_ref(gage_obs, gage_time, now, prev_persisted, p_update_time,
                  p_index, lp_outflow, inflow, dt, lake_area, max_depth,
                  orifice_elev, init_elev, lookback_hrs, update_time):
    """Scalar hybrid persistence DA (reference reservoir_hybrid_da.py:55)."""
    limit = 11
    new_p_idx = p_index
    new_p_ut = p_update_time
    new_ut = update_time
    init_storage = (init_elev - orifice_elev) * (lake_area * 1e6)
    max_storage = (max_depth - orifice_elev) * (lake_area * 1e6)

    if now >= update_time:
        obs = np.nan
        t_diff = update_time - gage_time
        t_idx = int(np.where(t_diff >= 0, t_diff, np.inf).argmin())
        lookback_sec = None
        for i in range(t_idx, -1, -1):
            if not np.isnan(gage_obs[i]):
                obs = gage_obs[i]
                lookback_sec = update_time - gage_time[i]
                new_ut = update_time + 3600.0
                break
        if np.isnan(obs):
            persisted = prev_persisted
            if now >= p_update_time:
                new_p_idx = p_index + 1
                new_p_ut = p_update_time + 86400.0
        elif lookback_sec > lookback_hrs * 3600:
            persisted = prev_persisted
            if now >= p_update_time:
                new_p_idx = p_index + 1
                new_p_ut = p_update_time + 86400.0
        else:
            persisted = obs
            new_p_idx = 1
            new_p_ut = p_update_time + 86400.0
    elif now >= p_update_time:
        new_p_idx = p_index + 1
        new_p_ut = p_update_time + 86400.0
        if p_index <= limit:
            persisted = prev_persisted
        if p_index > limit:
            persisted = lp_outflow
            new_p_idx = 0
    else:
        persisted = prev_persisted

    if np.isnan(persisted):
        outflow = lp_outflow
        new_p_idx = 0
    else:
        outflow = persisted

    # storage modification
    assess = outflow
    out = assess
    if assess < 0:
        out = 0.0
    projected = init_storage + (inflow - assess) * dt
    max_reached = projected > max_storage
    if projected <= 0:
        out = inflow
    if out < 0:
        out = 0.0
    if max_reached and out < lp_outflow:
        out = lp_outflow

    delta = (inflow - out) * dt
    new_elev = init_elev + delta / (lake_area * 1e6)
    return out, persisted, new_elev, new_ut, new_p_idx, new_p_ut


def rfc_da_ref(use_rfc, series, ts_idx, total_counts, dt, now, update_time,
               da_step, persist_seconds, rtype, inflow, water_elev,
               lp_outflow, lp_elev, area_m2, max_elev):
    """Scalar RFC forecast DA (reference reservoir_RFC_da.py:196)."""
    if use_rfc and now <= persist_seconds:
        if now >= update_time and ts_idx < total_counts:
            update_time += da_step
            ts_idx += 1
        if rtype == 4:
            outflow = series[ts_idx]
        else:
            outflow = inflow + series[ts_idx]
        new_elev = water_elev + ((inflow - outflow) / area_m2) * dt
        new_elev = min(max(new_elev, 0.0), max_elev)
        if outflow < 0:
            j = ts_idx
            while outflow < 0 and j > 1:
                j -= 1
                outflow = series[j]
            if outflow < 0:
                outflow = lp_outflow if rtype == 4 else inflow
                new_elev = lp_elev
    else:
        outflow = lp_outflow if rtype == 4 else inflow
        new_elev = lp_elev
    return outflow, new_elev, update_time, ts_idx


def gl_da_ref(gage_obs, gage_time, prev_out, prev_time, update_time, now,
              month_idx, climatology, limit_days=11.0):
    """Scalar Great Lakes DA (reference reservoir_GL_da.py:6)."""
    new_out, new_time, new_ut = prev_out, prev_time, update_time
    clim = climatology[month_idx]
    prev = clim if np.isnan(prev_out) else prev_out
    limit_s = limit_days * 86400.0
    if now >= update_time:
        obs = np.nan
        t_idxs = np.nonzero((now - gage_time) >= 0)[0]
        if len(t_idxs):
            i = t_idxs[-1]
            obs = gage_obs[i]
            lookback = now - gage_time[i]
        if np.isnan(obs):
            outflow = prev
        elif lookback > limit_s:
            outflow = clim
        else:
            outflow = obs
            new_out, new_time = obs, gage_time[i]
            new_ut = update_time + 3600.0
    else:
        outflow = prev
        if (now - prev_time) > limit_s:
            outflow = clim
    return outflow, new_out, new_time, new_ut
