"""Multi-device routing: shard_map over a basin-sharded device mesh.

Each device advances its block of nodes; junction flows crossing device
boundaries ride an ``all_gather`` of exported boundary values over ICI each
timestep (see ``partition.py`` for the index plan).  This is the TPU-native
replacement for the reference's joblib order-barrier + interorder dict
hand-off (``compute.py:882-900``): the exchange is a device collective
fused into the compiled scan, not host pickling.

Short-timestep mode needs one exchange per step (timestep t reads only
t-1 state).  Strict mode runs as fixed-point sweeps on the current-step
iterate with a per-sweep exchange, converging to the reference's
within-step coupling without a per-wavefront-level barrier
(``local_step_strict``; cf. ``engine.route()``'s ``step_strict_iter``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from troute_tpu.ops.levelpool import LevelpoolParams, levelpool_step
from troute_tpu.ops.muskingum import muskingum_cunge
from troute_tpu.ops.reservoir_da import (
    GreatLakesDAState, HybridDAState, RfcDAState,
    typed_reservoir_dispatch)
from troute_tpu.parallel.partition import NetworkPartition, scatter_to_shards
from troute_tpu.routing.engine import (ChannelParams,
                                       _accel_enabled,
                                       mc_linear_gain)

AXIS = "basin"


class ShardedResDA(NamedTuple):
    """Per-device reservoir-DA lanes ([n_dev, R, ...]); mirrors
    ``routing.engine.ReservoirDAData`` sliced to each shard's
    reservoirs."""

    wbody_type: jax.Array          # int32 [n_dev, R]
    hybrid_obs: jax.Array          # [n_dev, R, n_hobs]
    hybrid_obs_time: jax.Array     # [n_dev, n_hobs]
    hyb0: HybridDAState            # [n_dev, R] lanes
    rfc_series: jax.Array          # [n_dev, R, n_counts]
    rfc_counts: jax.Array          # int32 [n_dev, R]
    rfc_use: jax.Array             # bool [n_dev, R]
    rfc_timestep: jax.Array        # [n_dev, R]
    rfc_persist_seconds: jax.Array
    rfc0: RfcDAState
    gl_obs: jax.Array              # [n_dev, R, n_gobs]
    gl_obs_time: jax.Array
    gl_climatology: jax.Array      # [n_dev, R, 12]
    gl0: GreatLakesDAState
    month_idx: jax.Array           # int32 [n_dev, nts+1] (replicated copies)
    obs_lookback_hours: float


class ShardedInputs(NamedTuple):
    """All [n_dev, ...] leading-axis-sharded device arrays for the run."""

    upstream_local: jax.Array   # int32 [n_dev, n_local, K] into extended array
    export_slot: jax.Array      # int32 [n_dev, E]
    halo_src_dev: jax.Array     # int32 [n_dev, H]
    halo_src_pos: jax.Array     # int32 [n_dev, H]
    # neighbor-exchange plan (partition.py): per-round ppermute pairs
    # (replicated) + per-device send/recv packing + boundary row lists
    perm_pairs: jax.Array       # int32 [n_rounds, n_pairs, 2] (replicated)
    send_slot: jax.Array        # int32 [n_dev, n_rounds, W]
    recv_pos: jax.Array         # int32 [n_dev, n_rounds, W]
    boundary_rows: jax.Array    # int32 [n_dev, B] (-1 pad)
    valid: jax.Array            # bool  [n_dev, n_local] (pad rows False)
    is_reservoir: jax.Array     # bool  [n_dev, n_local]
    res_slots: jax.Array        # int32 [n_dev, R] local slots of reservoirs, -1 pad
    chan: ChannelParams         # [n_dev, n_local] each
    res_params: LevelpoolParams  # [n_dev, R] each
    q0: jax.Array               # [n_dev, n_local]
    depth0: jax.Array           # [n_dev, n_local]
    res_elev0: jax.Array        # [n_dev, R]
    qlat: jax.Array             # [n_cols, n_dev, n_local]
    # streamflow-nudging DA, device-local lanes (-1 = pad slot)
    gage_slot: jax.Array        # int32 [n_dev, G]
    gage_index: jax.Array       # int32 [n_dev, G] global gage ordinal (-1 pad)
    gage_obs: jax.Array         # [n_dev, nts+1, G] (NaN = missing)
    gage_lo_val: jax.Array      # [n_dev, G]
    gage_lo_time: jax.Array     # [n_dev, G]
    # per-shard banded upstream plan (partition._banded_local_plans);
    # the static shift tuple travels separately (route_sharded band_shifts)
    band_masks: jax.Array       # bool [n_dev, D, n_local] (D may be 0)
    band_rem_dst: jax.Array     # int32 [n_dev, E] (-1 pad)
    band_rem_src: jax.Array     # int32 [n_dev, E]


class ShardedRunResult(NamedTuple):
    """Sharded outputs of ``route_sharded`` ([n_dev, ...] leading axis)."""

    fvd: jax.Array              # [n_dev, nts, n_local, 3]
    nudge: jax.Array            # [n_dev, nts, G]
    q: jax.Array                # [n_dev, n_local] final flows
    depth: jax.Array            # [n_dev, n_local]
    res_elev: jax.Array         # [n_dev, R]
    lo_val: jax.Array           # [n_dev, G]
    lo_time: jax.Array          # [n_dev, G]
    hyb: HybridDAState          # [n_dev, R] lanes
    rfc: RfcDAState
    gl: GreatLakesDAState


def build_sharded_inputs(part: NetworkPartition, topo, chan_np: dict,
                         res_params_np: np.ndarray | None,
                         q0, depth0, res_elev_by_row: dict,
                         qlat_cols: np.ndarray,
                         dtype=jnp.float32,
                         gage_rows=None, gage_obs=None,
                         gage_lo_val=None,
                         gage_lo_time=None) -> ShardedInputs:
    """Assemble sharded arrays from global host arrays.

    Args:
        chan_np: dict of [N] float arrays (dx, bw, tw, twcc, n, ncc, cs, s0)
        res_params_np: [n_res_global, 9] levelpool params in row order of
            ``topo.reservoir_rows`` (area..weir_length, dam_length)
        res_elev_by_row: {global_row: initial elevation}
        qlat_cols: [n_cols, N]
    """
    nd, nl = part.n_dev, part.n_local
    valid = part.global_row >= 0

    is_res_global = (topo.node_type == 1)
    is_res = np.zeros((nd, nl), bool)
    is_res[valid] = is_res_global[part.global_row[valid]]

    # per-device reservoir slot lists
    res_lists = [np.flatnonzero(is_res[d]) for d in range(nd)]
    R = max((len(r) for r in res_lists), default=0)
    R = max(R, 1)
    res_slots = np.full((nd, R), -1, np.int64)
    res_p = np.ones((nd, R, 9), np.float64)
    res_e0 = np.zeros((nd, R), np.float64)
    if res_params_np is not None:
        slot_of_global = {int(r): i for i, r in enumerate(topo.reservoir_rows)}
        for d in range(nd):
            for i, s in enumerate(res_lists[d]):
                g = int(part.global_row[d, s])
                res_slots[d, i] = s
                res_p[d, i] = res_params_np[slot_of_global[g]]
                res_e0[d, i] = res_elev_by_row.get(g, 0.0)

    def shard(a, fill=0.0):
        return jnp.asarray(scatter_to_shards(part, np.asarray(a, np.float64),
                                             fill), dtype)

    chan = ChannelParams(**{k: shard(chan_np[k], 1.0)
                            for k in ChannelParams._fields})
    qlat_sh = jnp.stack([shard(qlat_cols[c]) for c in range(qlat_cols.shape[0])])

    # gage DA lanes: each gage lives on exactly one device (its owner)
    n_obs_t = gage_obs.shape[0] if gage_obs is not None else 1
    if gage_rows is not None and len(gage_rows):
        per_dev = [[] for _ in range(nd)]
        for gi, g in enumerate(np.asarray(gage_rows)):
            per_dev[part.owner[g]].append((int(part.local_slot[g]), gi))
        G = max(1, max(len(p) for p in per_dev))
        gslot = np.full((nd, G), -1, np.int64)
        gindex = np.full((nd, G), -1, np.int64)
        gobs = np.full((nd, n_obs_t, G), np.nan)
        glov = np.full((nd, G), np.nan)
        glot = np.zeros((nd, G))
        for d in range(nd):
            for k, (slot, gi) in enumerate(per_dev[d]):
                gslot[d, k] = slot
                gindex[d, k] = gi
                gobs[d, :, k] = np.asarray(gage_obs)[:, gi]
                if gage_lo_val is not None:
                    glov[d, k] = np.asarray(gage_lo_val)[gi]
                    glot[d, k] = np.asarray(gage_lo_time)[gi]
    else:
        G = 1
        gslot = np.full((nd, G), -1, np.int64)
        gindex = np.full((nd, G), -1, np.int64)
        gobs = np.full((nd, n_obs_t, G), np.nan)
        glov = np.full((nd, G), np.nan)
        glot = np.zeros((nd, G))

    return ShardedInputs(
        upstream_local=jnp.asarray(part.upstream_local, jnp.int32),
        export_slot=jnp.asarray(part.export_slot, jnp.int32),
        halo_src_dev=jnp.asarray(part.halo_src_dev, jnp.int32),
        halo_src_pos=jnp.asarray(part.halo_src_pos, jnp.int32),
        perm_pairs=jnp.asarray(part.perm_pairs, jnp.int32),
        send_slot=jnp.asarray(part.send_slot, jnp.int32),
        recv_pos=jnp.asarray(part.recv_pos, jnp.int32),
        boundary_rows=jnp.asarray(part.boundary_rows, jnp.int32),
        valid=jnp.asarray(valid),
        is_reservoir=jnp.asarray(is_res),
        res_slots=jnp.asarray(res_slots, jnp.int32),
        chan=chan,
        res_params=LevelpoolParams(
            *[jnp.asarray(res_p[:, :, i], dtype) for i in range(9)]),
        q0=shard(q0), depth0=shard(depth0),
        res_elev0=jnp.asarray(res_e0, dtype),
        qlat=qlat_sh,
        gage_slot=jnp.asarray(gslot, jnp.int32),
        gage_index=jnp.asarray(gindex, jnp.int32),
        gage_obs=jnp.asarray(gobs, dtype),
        gage_lo_val=jnp.asarray(glov, dtype),
        gage_lo_time=jnp.asarray(glot, dtype),
        band_masks=jnp.asarray(
            part.band_masks if part.band_masks is not None
            else np.zeros((nd, 0, nl), bool)),
        band_rem_dst=jnp.asarray(
            part.band_rem_dst if part.band_rem_dst is not None
            else np.full((nd, 1), -1, np.int32), jnp.int32),
        band_rem_src=jnp.asarray(
            part.band_rem_src if part.band_rem_src is not None
            else np.zeros((nd, 1), np.int32), jnp.int32),
    )


def shard_reservoir_da(part: NetworkPartition, topo, res_da,
                       res_slots: np.ndarray, dtype=jnp.float32):
    """Slice a global ``ReservoirDAData`` ([n_res_global] lanes, ordered
    by ``topo.reservoir_rows``) into per-device [n_dev, R] lanes matching
    ``ShardedInputs.res_slots``."""
    import jax

    nd, R = res_slots.shape
    slot_of_global = {int(r): i for i, r in enumerate(topo.reservoir_rows)}

    def take(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((nd, R) + a.shape[1:], fill, a.dtype)
        for d in range(nd):
            for i in range(R):
                s = res_slots[d, i]
                if s < 0:
                    continue
                g = int(part.global_row[d, s])
                out[d, i] = a[slot_of_global[g]]
        return jnp.asarray(out)

    rep = lambda a: jnp.asarray(np.broadcast_to(np.asarray(a),
                                                (nd,) + np.asarray(a).shape))
    return ShardedResDA(
        wbody_type=take(res_da.wbody_type, 1),
        hybrid_obs=take(res_da.hybrid_obs, np.nan),
        hybrid_obs_time=rep(res_da.hybrid_obs_time),
        hyb0=jax.tree.map(take, res_da.hybrid_state0),
        rfc_series=take(res_da.rfc_series),
        rfc_counts=take(res_da.rfc_counts, 0),
        rfc_use=take(res_da.rfc_use, False),
        rfc_timestep=take(res_da.rfc_timestep, 1.0),
        rfc_persist_seconds=take(res_da.rfc_persist_seconds),
        rfc0=jax.tree.map(take, res_da.rfc_state0),
        gl_obs=take(res_da.gl_obs, np.nan),
        gl_obs_time=take(res_da.gl_obs_time),
        gl_climatology=take(res_da.gl_climatology),
        gl0=jax.tree.map(take, res_da.gl_state0),
        month_idx=rep(res_da.month_idx),
        obs_lookback_hours=float(res_da.obs_lookback_hours))


def make_interior_sum(up, n_local, band_shifts, band_masks, band_rem_dst,
                      band_rem_src):
    """Local-only upstream-sum callable (halo contributions 0; boundary
    rows are recomputed after the exchange).  Banded masked-shift form
    when a ``band_shifts`` plan exists, masked gather otherwise."""
    def interior_sum(q):
        if band_shifts is None:
            local_up = (up >= 0) & (up < n_local)
            vals = jnp.where(local_up,
                             q[jnp.clip(up, 0, n_local - 1)], 0.0)
            return vals.sum(axis=1)
        from troute_tpu.routing.upstream_plan import banded_upstream_sum
        return banded_upstream_sum(q, band_masks, band_shifts,
                                   band_rem_dst, band_rem_src,
                                   padded_remainder=True)
    return interior_sum


def make_exchange(exchange, perms, n_halo, dtype, export_slot, send_slot,
                  recv_pos, halo_src_dev, halo_src_pos):
    """Halo-exchange callable: cross-shard boundary values of ``q`` into
    the [n_halo] halo layout (``"neighbor"`` ppermute rounds or the
    ``"allgather"`` fallback; both fill the same slots bit-identically)."""
    def exchange_halo(q):
        if exchange == "neighbor":
            halo = jnp.zeros((n_halo,), dtype)
            for r, perm in enumerate(perms):
                if not perm:
                    continue
                buf = q[send_slot[r]]
                rec = jax.lax.ppermute(buf, AXIS, perm)
                pos = recv_pos[r]
                halo = halo.at[jnp.where(pos >= 0, pos,
                                         n_halo)].set(rec, mode="drop")
            return halo
        exported = q[export_slot]                     # [E]
        all_exp = jax.lax.all_gather(exported, AXIS)  # [D, E]
        halo = all_exp[jnp.maximum(halo_src_dev, 0), halo_src_pos]
        return jnp.where(halo_src_dev >= 0, halo, 0.0)
    return exchange_halo


def apply_local_nudge(q_new, gage_slot, gage_obs, lo_val, lo_time,
                      t_idx, t_seconds, decay_coeff):
    """simple_da on device-local gage lanes (identical math to
    engine._apply_nudging, slot-local layout).  Past the end of the
    observation table means "missing" (decay nudging), exactly like the
    engine's obs_seq NaN fill."""
    safe_g = jnp.maximum(gage_slot, 0)
    obs_t = gage_obs[jnp.minimum(t_idx, gage_obs.shape[0] - 1)]
    obs_t = jnp.where((gage_slot >= 0) & (t_idx < gage_obs.shape[0]),
                      obs_t, jnp.nan)
    model = q_new[safe_g]
    have_obs = ~jnp.isnan(obs_t)
    minutes = (t_seconds - lo_time) / 60.0
    weight = jnp.exp(jnp.abs(minutes) / -decay_coeff)
    shift = (lo_val - model) * weight
    no_memory = jnp.isnan(obs_t) & jnp.isnan(lo_val)
    replaced = jnp.where(have_obs, obs_t,
                         jnp.where(no_memory, model, model + shift))
    nudge = jnp.where(gage_slot >= 0,
                      jnp.where(have_obs, obs_t - model,
                                jnp.where(no_memory, 0.0, shift)), 0.0)
    lo_val_c = jnp.where(have_obs, obs_t, lo_val)
    lo_time_c = jnp.where(have_obs, t_seconds, lo_time)
    g_scatter = jnp.where(gage_slot >= 0, safe_g, q_new.shape[0])
    q_new = q_new.at[g_scatter].set(replaced, mode="drop")
    return q_new, nudge, lo_val_c, lo_time_c


def reservoir_update(q_new, d_new, res_elev, inflow_src, res_slots,
                     res_params, rda, da_states, t_idx, t_seconds, dt_):
    """Levelpool step + typed reservoir DA on the padded per-device
    reservoir slots; scatters outflow/depth into the local state arrays.
    ``inflow_src`` is the upstream-sum vector the reservoirs read
    (previous-step sums in short mode, the iterate's sums in strict
    mode).  ``rda=None`` means plain levelpool."""
    hyb_s, rfc_s, gl_s = da_states
    safe_slots = jnp.maximum(res_slots, 0)
    inflow = inflow_src[safe_slots]
    lp_out, lp_elev = levelpool_step(res_elev, inflow, inflow,
                                     jnp.zeros_like(inflow), dt_,
                                     res_params)
    if rda is not None:
        month_i = rda.month_idx[jnp.minimum(
            t_idx, rda.month_idx.shape[0] - 1)]
        outflow, elev, d_scat, hyb_s, rfc_s, gl_s = \
            typed_reservoir_dispatch(
                rda.wbody_type, rda.hybrid_obs, rda.hybrid_obs_time,
                hyb_s, rda.rfc_series, rda.rfc_counts, rda.rfc_use,
                rda.rfc_timestep, rda.rfc_persist_seconds, rfc_s,
                rda.gl_obs, rda.gl_obs_time, rda.gl_climatology,
                gl_s, rda.obs_lookback_hours,
                res_elev, inflow, lp_out, lp_elev, t_seconds, month_i,
                res_params.area, res_params.max_depth,
                res_params.orifice_elev, dt_)
    else:
        outflow, elev, d_scat = lp_out, lp_elev, lp_elev
    have = res_slots >= 0
    scatter = jnp.where(have, safe_slots, q_new.shape[0])
    q_new = q_new.at[scatter].set(outflow, mode="drop")
    d_new = d_new.at[scatter].set(d_scat, mode="drop")
    res_elev = jnp.where(have, elev, res_elev)
    return q_new, d_new, res_elev, (hyb_s, rfc_s, gl_s)


def zero_da_states(R, dtype):
    """Placeholder per-device DA state lanes when no reservoir DA runs."""
    z = jnp.zeros((R,), dtype)
    return (HybridDAState(z, z, z, z),
            RfcDAState(jnp.zeros((R,), jnp.int32), z),
            GreatLakesDAState(z, z, z))


def route_sharded(mesh: Mesh, inp: ShardedInputs, dt: float, nts: int,
                  qts_subdivisions: int = 1,
                  res_da: ShardedResDA | None = None,
                  decay_coeff: float = 120.0,
                  exchange: str = "neighbor",
                  band_shifts: tuple | None = None,
                  strict: bool = False, strict_tol: float = 1e-9,
                  strict_max_sweeps: int = 64, accel_lin: int = 0):
    """Compiled multi-device routing run.

    ``strict=True`` runs reference-exact within-step coupling as
    fixed-point sweeps with a per-sweep halo exchange of the iterate
    (``local_step_strict``); default is the short-timestep mode with one
    exchange per step.

    ``exchange`` picks the halo mechanism (both bit-identical):

    * ``"neighbor"`` (default): per-round ``ppermute`` partial
      permutations sized by actual cut edges — traffic per device is
      O(its own boundary), flat in device count.  The full-domain MC
      solve runs on local-only upstream sums first (no dependency on the
      collective, so XLA can overlap it with the permutes), then the few
      boundary rows are recomputed with the imported halo values.
    * ``"allgather"``: every exported value broadcast to every device;
      one-pass solve.  O(devices x exports) traffic.

    ``band_shifts`` (static tuple from ``NetworkPartition.band_shifts``)
    switches the interior upstream sum to the banded masked-shift form
    — the gather is latency-bound on TPU (routing/upstream_plan.py) —
    with halo-referencing boundary rows recomputed by the full gather
    after the exchange in BOTH exchange modes (so the two stay
    bit-identical).  None keeps the gather form everywhere.
    """
    dtype = inp.q0.dtype
    dt_ = jnp.asarray(dt, dtype)
    have_res_da = res_da is not None
    n_halo = int(inp.halo_src_dev.shape[-1])
    # static ppermute schedule from the (replicated) plan array
    perm_np = np.asarray(inp.perm_pairs)
    perms = tuple(
        tuple((int(s), int(d)) for s, d in perm_np[r] if s >= 0)
        for r in range(perm_np.shape[0]))

    def mc_rows(up_prev, q, qlat_t, depth, chan, quc=None):
        return muskingum_cunge(up_prev, up_prev if quc is None else quc,
                               q, qlat_t, chan.dx,
                               chan.bw, chan.tw, chan.twcc, chan.n,
                               chan.ncc, chan.cs, chan.s0, depth, dt_)

    def local_step(carry, xs, upstream_local, export_slot, halo_src_dev,
                   halo_src_pos, perm_pairs, send_slot, recv_pos,
                   boundary_rows, valid, is_res, res_slots, chan,
                   res_params, gage_slot, gage_obs, rda, band_masks,
                   band_rem_dst, band_rem_src):
        q, depth, res_elev, lo_val, lo_time, hyb_s, rfc_s, gl_s = carry
        qlat_t, t_idx = xs
        up = upstream_local
        n_local = q.shape[0]
        interior_sum = make_interior_sum(up, n_local, band_shifts,
                                         band_masks, band_rem_dst,
                                         band_rem_src)

        def boundary_fix(q_ext, qdc, velc, depthc, up_prev):
            """Recompute halo-referencing rows with true upstream sums."""
            b = boundary_rows
            safe_b = jnp.maximum(b, 0)
            up_b = up[safe_b]
            vals_b = jnp.where(up_b >= 0, q_ext[jnp.maximum(up_b, 0)], 0.0)
            up_prev_b = vals_b.sum(axis=1)
            chan_b = jax.tree.map(lambda a: a[safe_b], chan)
            out_b = mc_rows(up_prev_b, q[safe_b], qlat_t[safe_b],
                            depth[safe_b], chan_b)
            scat_b = jnp.where(b >= 0, safe_b, n_local)
            qdc = qdc.at[scat_b].set(out_b.qdc, mode="drop")
            velc = velc.at[scat_b].set(out_b.velc, mode="drop")
            depthc = depthc.at[scat_b].set(out_b.depthc, mode="drop")
            up_prev = up_prev.at[scat_b].set(up_prev_b, mode="drop")
            return qdc, velc, depthc, up_prev

        exchange_halo = make_exchange(exchange, perms, n_halo, dtype,
                                      export_slot, send_slot, recv_pos,
                                      halo_src_dev, halo_src_pos)
        if exchange == "neighbor":
            # interior pass first: upstream sums from owned nodes only
            # (boundary rows get provisional values, fixed below) — no
            # data dependency on the collective, so the big solve and the
            # sparse per-round ppermutes overlap
            up_prev = interior_sum(q)
            out = mc_rows(up_prev, q, qlat_t, depth, chan)
            qdc, velc, depthc = out.qdc, out.velc, out.depthc

            q_ext = jnp.concatenate([q, exchange_halo(q)])
            qdc, velc, depthc, up_prev = boundary_fix(q_ext, qdc, velc,
                                                      depthc, up_prev)
        else:
            # halo exchange: export boundary flows, all-gather, import
            q_ext = jnp.concatenate([q, exchange_halo(q)])
            if band_shifts is None:
                vals = q_ext[jnp.maximum(up, 0)]
                up_prev = jnp.where(up >= 0, vals, 0.0).sum(axis=1)
                out = mc_rows(up_prev, q, qlat_t, depth, chan)
                qdc, velc, depthc = out.qdc, out.velc, out.depthc
            else:
                # banded interior + boundary recompute: identical
                # accumulation to the neighbor mode, so the two exchange
                # mechanisms stay bit-identical
                up_prev = interior_sum(q)
                out = mc_rows(up_prev, q, qlat_t, depth, chan)
                qdc, velc, depthc = out.qdc, out.velc, out.depthc
                qdc, velc, depthc, up_prev = boundary_fix(
                    q_ext, qdc, velc, depthc, up_prev)

        q_new = jnp.where(valid & ~is_res, qdc, q)
        v_new = jnp.where(valid & ~is_res, velc, 0.0)
        d_new = jnp.where(valid & ~is_res, depthc, depth)

        # reservoirs: padded per-device slots
        t_seconds = t_idx.astype(dtype) * dt_
        q_new, d_new, res_elev, (hyb_s, rfc_s, gl_s) = reservoir_update(
            q_new, d_new, res_elev, up_prev, res_slots, res_params, rda,
            (hyb_s, rfc_s, gl_s), t_idx, t_seconds, dt_)

        # streamflow-nudging DA on device-local gage lanes
        q_new, nudge, lo_val, lo_time = apply_local_nudge(
            q_new, gage_slot, gage_obs, lo_val, lo_time, t_idx, t_seconds,
            decay_coeff)

        fvd = jnp.stack([q_new, v_new, d_new], axis=-1)
        return (q_new, d_new, res_elev, lo_val, lo_time, hyb_s, rfc_s,
                gl_s), (fvd, nudge)

    def local_step_strict(carry, xs, upstream_local, export_slot,
                          halo_src_dev, halo_src_pos, perm_pairs,
                          send_slot, recv_pos, boundary_rows, valid,
                          is_res, res_slots, chan, res_params, gage_slot,
                          gage_obs, rda, band_masks, band_rem_dst,
                          band_rem_src):
        """One STRICT timestep: fixed-point sweeps on the current-step
        iterate, each sweep halo-exchanging the iterate's boundary flows
        (cf. ``engine.route()``'s ``step_strict_iter``).  Convergence is
        the global max |dq| via ``lax.pmax``, so every shard runs the
        same sweep count and the in-loop collectives stay in lockstep.
        Reservoir inflows, typed DA and gage nudging see current-step
        upstream sums; candidate states from non-final sweeps are
        discarded (each sweep recomputes them from the carried-in
        previous-timestep state, so the recompute is idempotent)."""
        q, depth, res_elev, lo_val, lo_time, hyb_s, rfc_s, gl_s = carry
        qlat_t, t_idx = xs
        up = upstream_local
        n_local = q.shape[0]
        t_seconds = t_idx.astype(dtype) * dt_
        interior_sum = make_interior_sum(up, n_local, band_shifts,
                                         band_masks, band_rem_dst,
                                         band_rem_src)
        exchange_halo = make_exchange(exchange, perms, n_halo, dtype,
                                      export_slot, send_slot, recv_pos,
                                      halo_src_dev, halo_src_pos)

        def sums_full(qv):
            """True upstream sums incl. cross-shard neighbors."""
            halo = exchange_halo(qv)
            upv = interior_sum(qv)
            q_ext = jnp.concatenate([qv, halo])
            b = boundary_rows
            safe_b = jnp.maximum(b, 0)
            up_b = up[safe_b]
            vals_b = jnp.where(up_b >= 0, q_ext[jnp.maximum(up_b, 0)],
                               0.0)
            return upv.at[jnp.where(b >= 0, safe_b, n_local)].set(
                vals_b.sum(axis=1), mode="drop")

        up_prev = sums_full(q)

        def sweep(q_est, quc=None):
            if quc is None:
                quc = sums_full(q_est)
            out = mc_rows(up_prev, q, qlat_t, depth, chan, quc=quc)
            q_new = jnp.where(valid & ~is_res, out.qdc, q)
            v_new = jnp.where(valid & ~is_res, out.velc, 0.0)
            d_new = jnp.where(valid & ~is_res, out.depthc, depth)

            q_new, d_new, elev_c, (hyb_c, rfc_c, gl_c) = reservoir_update(
                q_new, d_new, res_elev, quc, res_slots, res_params, rda,
                (hyb_s, rfc_s, gl_s), t_idx, t_seconds, dt_)

            # nudging from the carried-in lastobs state (idempotent)
            q_new, nudge, lo_val_c, lo_time_c = apply_local_nudge(
                q_new, gage_slot, gage_obs, lo_val, lo_time, t_idx,
                t_seconds, decay_coeff)
            return (q_new, v_new, d_new, elev_c, lo_val_c, lo_time_c,
                    nudge, hyb_c, rfc_c, gl_c, out)

        # dtype-resolution convergence floor (see step_strict_iter):
        # strict_tol-sized |dq| may be unrepresentable at f32 on large
        # flows, so also converge at a few ulps of the largest flow
        eps4 = 4.0 * jnp.asarray(jnp.finfo(dtype).eps, dtype)
        # shard-local linearized-propagation acceleration (see
        # engine.RoutingConfig.strict_accel and the stepped driver's
        # _make_strict_sweep_fn): gain zeroed at boundary rows (their
        # upstream residual lives on other shards), gage and reservoir
        # lanes; the accel jump is select-skipped near convergence so
        # the exit iterate is a plain sweep result
        use_accel = accel_lin > 0 and band_shifts is not None
        b_scat = jnp.where(boundary_rows >= 0,
                           jnp.maximum(boundary_rows, 0), n_local)
        g_scat = jnp.where(gage_slot >= 0,
                           jnp.maximum(gage_slot, 0), n_local)

        def cond(c):
            k, delta, qmax = c[0], c[1], c[2]
            tol = jnp.maximum(jnp.asarray(strict_tol, dtype), eps4 * qmax)
            return (k < strict_max_sweeps) & (delta > tol)

        def body(c):
            k, _, _, q_est, g_prev, u_prev = c
            quc = sums_full(q_est)
            sw = sweep(q_est, quc)
            q_new, out = sw[0], sw[10]
            dq = q_new - q_est
            delta = jax.lax.pmax(jnp.max(jnp.abs(dq)), AXIS)
            qmax = jax.lax.pmax(jnp.max(jnp.abs(q_new)), AXIS)
            q_next = q_new
            if use_accel:
                # k is traced inside while_loop: lane-wise gate on k>=1
                # (at k=0 du is vs the previous timestep, not a sweep
                # response)
                gain = jnp.where(
                    k >= 1,
                    mc_linear_gain(out.ck, out.X, chan.dx, dt_, dtype,
                                   q_new=q_new, g_prev=g_prev, quc=quc,
                                   quc_prev=u_prev),
                    mc_linear_gain(out.ck, out.X, chan.dx, dt_, dtype))
                gain = jnp.where(valid & ~is_res, gain, 0.0)
                gain = gain.at[b_scat].set(0.0, mode="drop")
                gain = gain.at[g_scat].set(0.0, mode="drop")
                acc = q_new
                lin = dq
                for _ in range(accel_lin):
                    lin = gain * interior_sum(lin)
                    acc = acc + lin
                tol = jnp.maximum(jnp.asarray(strict_tol, dtype),
                                  eps4 * qmax)
                q_next = jnp.where(delta > 4.0 * tol,
                                   jnp.maximum(acc, 0.0), q_new)
            return (k + 1, delta, qmax, q_next, q_new, quc)

        # iterate exactly like route()'s step_strict_iter: while_loop to
        # the fixed point (or the sweep cap), then commit ONE final sweep
        # from the exited iterate — identical sweep counts in both exit
        # modes, so the two engines agree even when the cap binds
        _, _, _, q_fp, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.asarray(jnp.inf, dtype),
                         jnp.asarray(0.0, dtype), q, q, up_prev))
        (q_new, v_new, d_new, res_elev, lo_val, lo_time, nudge, hyb_s,
         rfc_s, gl_s, _) = sweep(q_fp)
        fvd = jnp.stack([q_new, v_new, d_new], axis=-1)
        return (q_new, d_new, res_elev, lo_val, lo_time, hyb_s, rfc_s,
                gl_s), (fvd, nudge)

    def device_fn(upstream_local, export_slot, halo_src_dev, halo_src_pos,
                  perm_pairs, send_slot, recv_pos, boundary_rows,
                  valid, is_res, res_slots, chan, res_params, q0, depth0,
                  res_elev0, qlat, gage_slot, gage_index, gage_obs,
                  gage_lo_val, gage_lo_time, band_masks, band_rem_dst,
                  band_rem_src, *rda_flat):
        # block shapes carry a leading size-1 device axis; drop it
        sq = lambda a: a[0]
        if have_res_da:
            rda_d = jax.tree.unflatten(rda_treedef, rda_flat)
            rda_d = jax.tree.map(sq, rda_d)
            rda_l = ShardedResDA(obs_lookback_hours=lookback_static,
                                 **rda_d)
            hyb0, rfc0, gl0 = rda_l.hyb0, rda_l.rfc0, rda_l.gl0
        else:
            rda_l = None
            hyb0, rfc0, gl0 = zero_da_states(res_slots.shape[-1], dtype)
        args = (sq(upstream_local), sq(export_slot), sq(halo_src_dev),
                sq(halo_src_pos), perm_pairs, sq(send_slot), sq(recv_pos),
                sq(boundary_rows), sq(valid), sq(is_res), sq(res_slots),
                jax.tree.map(sq, chan), jax.tree.map(sq, res_params),
                sq(gage_slot), sq(gage_obs), rda_l, sq(band_masks),
                sq(band_rem_dst), sq(band_rem_src))

        cols = ((jnp.arange(nts) // qts_subdivisions)).astype(jnp.int32)
        qlat_seq = qlat[:, 0][cols]   # [nts, n_local]
        t_seq = jnp.arange(1, nts + 1, dtype=jnp.int32)

        step_fn = local_step_strict if strict else local_step

        def step(c, x):
            return step_fn(c, x, *args)

        carry, (fvd, nudge) = jax.lax.scan(
            step, (sq(q0), sq(depth0), sq(res_elev0), sq(gage_lo_val),
                   sq(gage_lo_time), hyb0, rfc0, gl0), (qlat_seq, t_seq))
        q_f, d_f, re_f, lov_f, lot_f, hyb_f, rfc_f, gl_f = carry
        add1 = lambda a: a[None]
        return ShardedRunResult(
            fvd=fvd[None], nudge=nudge[None], q=q_f[None], depth=d_f[None],
            res_elev=re_f[None], lo_val=lov_f[None], lo_time=lot_f[None],
            hyb=jax.tree.map(add1, hyb_f), rfc=jax.tree.map(add1, rfc_f),
            gl=jax.tree.map(add1, gl_f))

    specs = list(input_specs())
    rda_args = ()
    rda_treedef = None
    lookback_static = 48.0
    if have_res_da:
        # obs_lookback_hours is a static float, not an array: close over
        # it and flatten only the array fields
        lookback_static = float(res_da.obs_lookback_hours)
        rda_dict = {k: v for k, v in res_da._asdict().items()
                    if k != "obs_lookback_hours"}
        rda_flat, rda_treedef = jax.tree.flatten(rda_dict)
        rda_args = tuple(rda_flat)
        specs = specs + [P(AXIS)] * len(rda_flat)
    out_specs = ShardedRunResult(
        fvd=P(AXIS), nudge=P(AXIS), q=P(AXIS), depth=P(AXIS),
        res_elev=P(AXIS), lo_val=P(AXIS), lo_time=P(AXIS),
        hyb=HybridDAState(*[P(AXIS)] * len(HybridDAState._fields)),
        rfc=RfcDAState(*[P(AXIS)] * len(RfcDAState._fields)),
        gl=GreatLakesDAState(*[P(AXIS)] * len(GreatLakesDAState._fields)))
    fn = jax.shard_map(device_fn, mesh=mesh, in_specs=tuple(specs),
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)(*inp, *rda_args)



def route_sharded_fvd(mesh: Mesh, inp: ShardedInputs, dt: float, nts: int,
                      **kw):
    """``route_sharded`` returning only the fvd array (test convenience)."""
    return route_sharded(mesh, inp, dt, nts, **kw).fvd


def input_specs() -> ShardedInputs:
    """Per-field PartitionSpecs matching ``ShardedInputs``."""
    return ShardedInputs(
        upstream_local=P(AXIS), export_slot=P(AXIS), halo_src_dev=P(AXIS),
        halo_src_pos=P(AXIS), perm_pairs=P(),
        send_slot=P(AXIS), recv_pos=P(AXIS), boundary_rows=P(AXIS),
        valid=P(AXIS), is_reservoir=P(AXIS),
        res_slots=P(AXIS),
        chan=ChannelParams(*[P(AXIS)] * len(ChannelParams._fields)),
        res_params=LevelpoolParams(*[P(AXIS)] * len(LevelpoolParams._fields)),
        q0=P(AXIS), depth0=P(AXIS), res_elev0=P(AXIS),
        qlat=P(None, AXIS),
        gage_slot=P(AXIS), gage_index=P(AXIS), gage_obs=P(AXIS),
        gage_lo_val=P(AXIS), gage_lo_time=P(AXIS),
        band_masks=P(AXIS), band_rem_dst=P(AXIS), band_rem_src=P(AXIS))


def place_global(mesh: Mesh, inp: ShardedInputs) -> ShardedInputs:
    """Place inputs as GLOBAL arrays over a (possibly multi-process) mesh.

    Every process holds the full host copy; each contributes only its
    addressable shards (``jax.make_array_from_callback``).  This is the
    multi-host entry: on N hosts each runs the same preprocessing, then
    routes its mesh slice with collectives over ICI/DCN — the reference
    has no multi-node analog (joblib is single-node, SURVEY §2.4).
    """
    leaves, treedef = jax.tree.flatten(inp)
    spec_leaves = jax.tree.flatten(
        input_specs(), is_leaf=lambda x: isinstance(x, P))[0]

    def put(a, spec):
        a = np.asarray(a)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    return jax.tree.unflatten(
        treedef, [put(a, s) for a, s in zip(leaves, spec_leaves)])


def route_sharded_global(mesh: Mesh, topo, chan_np: dict,
                         res_params_np, cfg, q0, depth0, res_elev0,
                         qlat_cols, da=None, res_da=None,
                         part: NetworkPartition | None = None,
                         dtype=jnp.float32, driver: str = "auto"):
    """Multi-device routing with the ``route()`` contract on GLOBAL arrays.

    Partitions the network over ``mesh`` (greedy basin packing unless a
    ``part`` is supplied), shards channel/reservoir/DA state, runs
    ``route_sharded`` (neighbor ppermute halo exchange), and reassembles
    global outputs: ``{"flowveldepth": [nts, N, 3], "nudge": [nts, G],
    "state": RoutingState}`` — so the CLI's run-set loop can hand state
    across sets exactly as with the single-device engine.  This is the
    multi-chip production entry (``parallel_compute_method: sharded``);
    the reference's closest analog is the joblib by-subnetwork scheduler
    (``compute.py:553-907``), which is single-node.
    """
    from troute_tpu.parallel.partition import (
        gather_from_shards, partition_network)
    from troute_tpu.routing.engine import RoutingState

    if not cfg.assume_short_ts and not getattr(cfg, "strict_iterative",
                                               False):
        raise ValueError(
            "route_sharded_global supports short-timestep mode and the "
            "strict fixed-point form (strict_iterative=True); the "
            "level-scan strict form is single-device only")
    n_dev = int(np.prod(mesh.devices.shape))
    if part is None:
        part = partition_network(topo, n_dev)

    res_rows = np.asarray(topo.reservoir_rows)
    res_elev_by_row = {int(r): float(np.asarray(res_elev0)[i])
                       for i, r in enumerate(res_rows)}
    have_da = da is not None and int(da.rows.shape[0]) > 0
    inp = build_sharded_inputs(
        part, topo, chan_np,
        np.asarray(res_params_np) if res_params_np is not None else None,
        np.asarray(q0), np.asarray(depth0), res_elev_by_row,
        np.asarray(qlat_cols), dtype=dtype,
        gage_rows=np.asarray(da.rows) if have_da else None,
        gage_obs=np.asarray(da.obs) if have_da else None,
        gage_lo_val=np.asarray(da.lastobs_val) if have_da else None,
        gage_lo_time=np.asarray(da.lastobs_time) if have_da else None)

    rda_sh = None
    if res_da is not None:
        rda_sh = shard_reservoir_da(part, topo, res_da,
                                    np.asarray(inp.res_slots), dtype=dtype)

    # driver selection: the host-stepped Pallas drivers (stepped_engine)
    # are the production paths on TPU (~8x the in-scan XLA form per chip
    # in short mode); the in-scan driver remains the CPU-mesh default
    # (interpreted Pallas is slow off-TPU)
    if driver == "auto":
        driver = ("stepped" if jax.default_backend() == "tpu" else "scan")
    if driver == "stepped" and cfg.assume_short_ts:
        from troute_tpu.parallel.stepped_engine import route_sharded_stepped
        res = route_sharded_stepped(
            mesh, inp, cfg.dt, cfg.nts,
            qts_subdivisions=cfg.qts_subdivisions, res_da=rda_sh,
            decay_coeff=(da.decay_coeff if have_da else 120.0),
            band_shifts=part.band_shifts)
    elif driver == "stepped":
        from troute_tpu.parallel.stepped_engine import (
            route_sharded_strict_stepped)
        res = route_sharded_strict_stepped(
            mesh, inp, cfg.dt, cfg.nts,
            qts_subdivisions=cfg.qts_subdivisions, res_da=rda_sh,
            decay_coeff=(da.decay_coeff if have_da else 120.0),
            band_shifts=part.band_shifts,
            strict_tol=getattr(cfg, "strict_tol", 1e-9),
            strict_max_sweeps=getattr(cfg, "strict_max_sweeps", 64),
            sweep_chunk=(getattr(cfg, "strict_accel_chunk", 8)
                         if _accel_enabled(cfg, stepped=True)
                         else getattr(cfg, "strict_sweep_chunk", 16)),
            accel_lin=(getattr(cfg, "strict_accel_lin", 8)
                       if _accel_enabled(cfg, stepped=True) else 0))
    else:
        res = route_sharded(mesh, inp, cfg.dt, cfg.nts,
                            qts_subdivisions=cfg.qts_subdivisions,
                            res_da=rda_sh,
                            decay_coeff=(da.decay_coeff if have_da
                                         else 120.0),
                            band_shifts=part.band_shifts,
                            strict=not cfg.assume_short_ts,
                            strict_tol=getattr(cfg, "strict_tol", 1e-9),
                            strict_max_sweeps=getattr(
                                cfg, "strict_max_sweeps", 64),
                            accel_lin=(getattr(cfg, "strict_accel_lin", 8)
                                       if _accel_enabled(
                                           cfg, stepped=False) else 0))

    # ---- reassemble global outputs ----
    fvd_sh = np.asarray(res.fvd)                       # [D, nts, L, 3]
    fvd = gather_from_shards(part, fvd_sh.transpose(0, 2, 1, 3))
    fvd = fvd.transpose(1, 0, 2)                       # [nts, N, 3]

    gidx = np.asarray(inp.gage_index)                  # [D, G]
    n_g = int(da.rows.shape[0]) if have_da else 0
    nudge = np.zeros((cfg.nts, n_g), fvd.dtype)
    if have_da:
        nudge_sh = np.asarray(res.nudge)               # [D, nts, G]
        lov = np.full((n_g,), np.nan, fvd.dtype)
        lot = np.zeros((n_g,), fvd.dtype)
        lov_sh, lot_sh = np.asarray(res.lo_val), np.asarray(res.lo_time)
        for d in range(gidx.shape[0]):
            for k in range(gidx.shape[1]):
                gi = gidx[d, k]
                if gi >= 0:
                    nudge[:, gi] = nudge_sh[d, :, k]
                    lov[gi] = lov_sh[d, k]
                    lot[gi] = lot_sh[d, k]
    else:
        lov = np.zeros((0,), fvd.dtype)
        lot = np.zeros((0,), fvd.dtype)

    # reservoir lanes back to global slot order (topo.reservoir_rows)
    slot_of_global = {int(r): i for i, r in enumerate(res_rows)}
    res_slots_np = np.asarray(inp.res_slots)
    lane_of_slot = {}                                   # global slot -> (d, i)
    for d in range(res_slots_np.shape[0]):
        for i in range(res_slots_np.shape[1]):
            s = res_slots_np[d, i]
            if s >= 0:
                g = int(part.global_row[d, s])
                lane_of_slot[slot_of_global[g]] = (d, i)

    def gather_res(a_sh, fill=0.0):
        a_sh = np.asarray(a_sh)
        out = np.full((res_rows.size,) + a_sh.shape[2:], fill, a_sh.dtype)
        for gs, (d, i) in lane_of_slot.items():
            out[gs] = a_sh[d, i]
        return jnp.asarray(out)

    n_res = res_rows.size
    relev = (gather_res(res.res_elev) if n_res
             else jnp.asarray(np.asarray(res_elev0)))
    state = RoutingState(
        q=jnp.asarray(gather_from_shards(part, np.asarray(res.q))),
        depth=jnp.asarray(gather_from_shards(part, np.asarray(res.depth))),
        res_elev=relev,
        lastobs_val=jnp.asarray(lov), lastobs_time=jnp.asarray(lot),
        hybrid=(jax.tree.map(gather_res, res.hyb) if res_da is not None
                else None),
        rfc=(jax.tree.map(gather_res, res.rfc) if res_da is not None
             else None),
        gl=(jax.tree.map(gather_res, res.gl) if res_da is not None
            else None))
    return {"flowveldepth": fvd, "nudge": nudge, "state": state}
