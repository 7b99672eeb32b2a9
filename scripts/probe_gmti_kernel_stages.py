"""TPU: stage-level timing of the kernel-fused GMTI CPI (gmti_cpi_pallas)
vs the composed pallas path — isolates K1/K2, K3 vs K3g, the XLA product
epilogue, and the raw balance reduction to locate the fusion's overhead.

Each stage is timed as a chained stream (output feeds the next call) with
one final sync, amortizing the ~33 ms axon tunnel RTT.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.gmti import cfar
from nis_sar_amtigmti_video_tpu.gmti import fused as fused_mod
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel, gmti_kernel

print("device:", jax.devices()[0])
size = 4096
sc = cfg.videosar()
g, r = sc.geometry, sc.radar
t0 = window_start_time(g.slant_range_m, None, sc.collect.window_length_s,
                       "centered")
p = csa_ops.CsaParams(
    wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
    prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
    range_ref_m=g.slant_range_m, t_start_fast=t0,
    num_pulses=size, num_samples=size)
f = csa_ops.csa_factors(p)
cp = cfar.CfarParams(guard=2, train=8)
a = int(math.isqrt(size))
b = int(math.isqrt(size))

key = jax.random.PRNGKey(0)
planes = [jax.random.normal(jax.random.fold_in(key, i), (size, size),
                            jnp.float32) for i in range(4)]
cal_cs = jnp.asarray([[1.0, 0.0]], jnp.float32)


def bench(name, fn, args, iters=8):
    """fn must map a tuple of planes -> same-shaped tuple (chained)."""
    fn = jax.jit(fn, donate_argnums=tuple(range(len(args))))
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    for _ in range(iters):
        out = fn(*out)
    jax.block_until_ready(out)
    ms = 1000.0 * (time.perf_counter() - t1) / iters
    print(f"{name:34s} {ms:8.2f} ms")
    return ms


# -- K1+K2 two channels: separate calls (fused path) vs batched ------------
def k12_sep(x1r, x1i, x2r, x2i):
    def one(zr, zi):
        with jax.enable_x64(False):
            zr, zi = csa_kernel._k1_call(zr, zi, f.u.reshape(1, -1),
                                         f.c1.reshape(-1, 1),
                                         f.w.reshape(-1, 1), a, False,
                                         "bf16x3")
            return csa_kernel._k2_call(zr, zi, f, b, False, "bf16x3")
    y1r, y1i = one(x1r, x1i)
    y2r, y2i = one(x2r, x2i)
    return y1r, y1i, y2r, y2i


def full_composed(x1r, x1i, x2r, x2i):
    sr, si = csa_kernel.apply_csa_pallas_planes(
        jnp.stack([x1r, x2r]), jnp.stack([x1i, x2i]), f)
    return sr[0], si[0], sr[1], si[1]


def k3_plain(x1r, x1i, x2r, x2i):
    with jax.enable_x64(False):
        y1r, y1i = csa_kernel._k3_call(x1r, x1i, a, False, "bf16x3")
        y2r, y2i = csa_kernel._k3_call(x2r, x2i, a, False, "bf16x3")
    return y1r, y1i, y2r, y2i


def k3g(x1r, x1i, x2r, x2i):
    out = gmti_kernel.k3_gmti_planes(x1r, x1i, x2r, x2i, cal_cs,
                                     h_out=cp.guard + cp.train,
                                     h_in=cp.guard)
    return out[0], out[1], out[2], out[3]


def epilogue(s1r, s1i, power, cso):
    csi = cso
    outer = fused_mod._hbox(cso, cp.guard + cp.train)
    inner = fused_mod._hbox(csi, cp.guard)
    n_outer = cfar._box_count((size, size), cp.guard + cp.train)
    n_inner = cfar._box_count((size, size), cp.guard)
    n_train = jnp.maximum(n_outer - n_inner, 1.0)
    noise = (outer - inner) / n_train
    snr = power / jnp.maximum(noise, 1e-30)
    mag = s1r * s1r + s1i * s1i
    phase = jnp.where(mag > 0.0025 * 3.0, s1i, 0.0)
    return phase, snr, power + snr, outer


def raw_reduce(x1r, x1i, x2r, x2i):
    xs_re = jnp.sum(x1r * x2r + x1i * x2i)
    xs_im = jnp.sum(x1i * x2r - x1r * x2i)
    c = jnp.arctan2(xs_im, xs_re)
    # 1e-30*c keeps the reduction live without perturbing the stream
    return (x1r + 1e-30 * c, x1i, x2r, x2i)


def full_fused(x1r, x1i, x2r, x2i):
    s1r, s1i, s2r, s2i, _, _, _, _ = fused_mod.gmti_cpi_pallas(
        x1r, x1i, x2r, x2i, f, cfar_params=cp)
    return s1r, s1i, s2r, s2i


host = [np.asarray(x) for x in planes]


def fresh():
    """New device arrays per bench call — each bench donates its args."""
    return tuple(jnp.asarray(x) for x in host)


bench("raw balance reduction", raw_reduce, fresh())
bench("K1+K2 x2ch separate", k12_sep, fresh())
bench("K1+K2+K3 x2ch batched (composed)", full_composed, fresh())
bench("K3 x2ch separate", k3_plain, fresh())
bench("K3g fused products", k3g, fresh())
bench("XLA epilogue (hbox+snr+mask)", epilogue, fresh())
bench("FULL fused CPI", full_fused, fresh())


# -- late-round-3 adopted stages: fused two-channel K1 + paired K2 ---------
def k1g(x1r, x1i, x2r, x2i):
    with jax.enable_x64(False):
        z1r, z1i, z2r, z2i, xr_, xi_ = gmti_kernel.k1_gmti_planes(
            x1r, x1i, x2r, x2i, f)
    return z1r + 1e-30 * xr_, z1i, z2r, z2i


def k2_pair(x1r, x1i, x2r, x2i):
    with jax.enable_x64(False):
        return csa_kernel.k2_pair_call(x1r, x1i, x2r, x2i, f, b, False,
                                       "bf16x3")


bench("K1g 2ch + in-kernel balance", k1g, fresh())
bench("K2 pair (shared trig)", k2_pair, fresh())
