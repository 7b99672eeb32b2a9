"""Round-4 probe: where do the ~0.43 s/channel between (geom + synth) and
the full jitted _phase_history go at the reference ATI scale?

Rows:
  geom+synth : one jit composing the probe's geometry replica with
               echo_freq.synthesize — the 'no-overhead' floor
  sort+geom+synth : adds the delay-sort/gather prologue
  full       : ops/echo.phase_history (the committed path)
Run alone on the axon tunnel.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops import echo_freq
from nis_sar_amtigmti_video_tpu.ops.echo import (phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene import targets as T_
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field

print("device:", jax.devices()[0], flush=True)
sc = cfg.ati_dpca()
rs, gs, cs = sc.radar, sc.geometry, sc.collect
opts = dataclasses.replace(echo_opts_for(sc), backend="freq",
                           endpoint_grid=False)
t0 = window_start_time(gs.slant_range_m, opts, cs.window_length_s,
                       "centered")
ship = T_.destroyer().rotate_z(90.0)
clut = ocean_clutter_field(np.random.default_rng(0))
scene = T_.PointTargets.concatenate([ship, clut])
n_ps = cs.num_pulses(rs.prf_hz)
traj = orbit.make_trajectory(gs, orbit.slow_time_grid(cs.integration_time_s,
                                                      n_ps))

# reuse the breakdown probe's geometry replica
import importlib.util
spec = importlib.util.spec_from_file_location(
    "e2e_probe_defs", os.path.join(os.path.dirname(__file__),
                                   "probe_e2e_breakdown_r4.py"))


def timed(tag, fn, n=3):
    out = fn()
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t1) / n
    print(f"{tag}: {dt:7.3f} s", flush=True)
    return out, dt


# --- replicate geom_only inline (same math as probe_e2e_breakdown_r4) ---
t64 = jnp.asarray(traj.times, jnp.float64)
p64 = jnp.asarray(traj.positions, jnp.float64)
v64 = jnp.asarray(traj.velocities, jnp.float64)
tp64 = jnp.asarray(scene.positions, jnp.float64)
tr64 = jnp.asarray(scene.rcs, jnp.float64)
tv64 = jnp.asarray((0.0, 0.0, 0.0), jnp.float64)
off0 = 0.0


def geom_core(sort: bool):
    import math

    from nis_sar_amtigmti_video_tpu.utils.anchors import anchor_plan
    num_p = t64.shape[0]
    num_b = tp64.shape[0]
    tb = min(opts.target_chunk, num_b)
    b_pad = -(-num_b // tb) * tb
    ns = opts.num_samples
    pc = max(1, min(num_p, opts.max_elements // max(1, tb * ns)))
    needed, trip, w_np = anchor_plan(num_p, opts.freq_geom_stride)
    na = len(needed)
    na_pad = -(-na // pc) * pc
    tgt_pos_p = jnp.pad(tp64, ((0, b_pad - num_b), (0, 0)))
    rcs_p = jnp.pad(tr64, (0, b_pad - num_b))
    if sort:
        d_mid = jnp.linalg.norm(tgt_pos_p - p64[num_p // 2][None, :], axis=1)
        order = jnp.argsort(jnp.where(jnp.arange(b_pad) < num_b, d_mid,
                                      jnp.inf))
        tgt_pos_p = tgt_pos_p[order]
        rcs_p = rcs_p[order]
    amp_b = jnp.sqrt(rcs_p)

    def pad_a(x):
        pad = na_pad - na
        cfg_ = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x[jnp.asarray(needed)], cfg_, mode="edge")

    ts_a = pad_a(t64).reshape(-1, pc)
    ps_a = pad_a(p64).reshape(-1, pc, 3)
    vs_a = pad_a(v64).reshape(-1, pc, 3)
    c = 299792458.0

    def geom_chunk64(carry, xs):
        ts, ps, vs = xs
        taus, amps = [], []
        for j in range(b_pad // tb):
            pos0 = jax.lax.dynamic_slice(tgt_pos_p, (j * tb, 0), (tb, 3))
            amp0 = jax.lax.dynamic_slice(amp_b, (j * tb,), (tb,))
            p_t = pos0[None, :, :] + tv64[None, None, :] * ts[:, None, None]
            diff_tx = p_t - ps[:, None, :]
            d_tx = jnp.linalg.norm(diff_tx, axis=-1)
            v_norm = jnp.linalg.norm(vs, axis=-1, keepdims=True)
            v_dir = vs / jnp.where(v_norm == 0.0, 1.0, v_norm)
            p_rx = ps[:, None, :] + v_dir[:, None, :] * off0
            d_rx = jnp.linalg.norm(p_t - p_rx, axis=-1)
            taus.append((d_tx + d_rx) / c)
            amps.append(jnp.broadcast_to(amp0[None, :], d_tx.shape
                                         ).astype(jnp.float32))
        return carry, (jnp.concatenate(taus, 1), jnp.concatenate(amps, 1))

    _, (tau_a, amp_a) = jax.lax.scan(geom_chunk64, 0, (ts_a, ps_a, vs_a))
    tau_a = tau_a.reshape(na_pad, b_pad)[:na]
    amp_a = amp_a.reshape(na_pad, b_pad)[:na]
    w64 = jnp.asarray(w_np)
    a0, a1, a2 = (jnp.asarray(trip[:, k]) for k in range(3))
    two_pi = 2.0 * math.pi
    tau64 = (w64[:, 0, None] * tau_a[a0] + w64[:, 1, None] * tau_a[a1]
             + w64[:, 2, None] * tau_a[a2])
    car = (-two_pi * opts.fc_hz * tau64)
    car = (car - two_pi * jnp.round(car / two_pi)).astype(jnp.float32)
    tau_rel = (tau64 - t0).astype(jnp.float32)[:num_p]
    w32 = w64.astype(jnp.float32)
    amp_all = (w32[:, 0, None] * amp_a[a0] + w32[:, 1, None] * amp_a[a1]
               + w32[:, 2, None] * amp_a[a2])[:num_p]
    return tau_rel, car[:num_p], amp_all


@jax.jit
def fused_nosort():
    t, c2, a = geom_core(False)
    return echo_freq.synthesize(t, c2, a, opts)


@jax.jit
def fused_sort():
    t, c2, a = geom_core(True)
    return echo_freq.synthesize(t, c2, a, opts)


def run(f):
    def g():
        out = f()
        return float(jnp.sum(jnp.abs(out[:1, :1])))
    return g


timed("geom+synth      ", run(fused_nosort))
timed("sort+geom+synth ", run(fused_sort))


def full():
    a = phase_history(traj, scene, opts, t_start=t0, rx_offset=off0)
    return float(jnp.sum(jnp.abs(a[:1, :1])))


timed("full            ", full)
