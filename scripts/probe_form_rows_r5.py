"""TPU: single-channel formation K2 rows A/B (round-5).

The PAIR K2 adopted rows=32 (two channels' working sets); the
single-channel formation path (apply_csa_pallas_planes -> _k2_call)
still uses rows=128. Chained single-plane formation stream at 4096^2.
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
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel as ck

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
a = b = int(math.isqrt(size))
host = [np.random.default_rng(i).standard_normal((size, size), np.float32)
        for i in range(2)]


def form(zr, zi, rows, variant):
    with jax.enable_x64(False):
        zr, zi = ck._k1_call(zr, zi, f.u.reshape(1, -1),
                             f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
                             a, False, "bf16x3")
        zr, zi = ck._k2_call(zr, zi, f, b, False, "bf16x3", rows=rows,
                             variant=variant)
        return ck._k3_call(zr, zi, a, False, "bf16x3")


import itertools
for variant, rows in itertools.product(("restack", "dots"), (128, 64, 32)):
    fn = jax.jit(lambda zr, zi, rows=rows, variant=variant:
                 form(zr, zi, rows, variant), donate_argnums=(0, 1))
    out = fn(jnp.asarray(host[0]), jnp.asarray(host[1]))
    _ = float(jnp.sum(out[0][:1, :1]))
    t1 = time.perf_counter()
    iters = 16
    for _ in range(iters):
        out = fn(*out)
    _ = float(jnp.sum(out[0][:1, :1]))
    ms = 1000.0 * (time.perf_counter() - t1) / iters
    print(f"formation {variant:8s} rows={rows:3d}: {ms:7.2f} ms/plane", flush=True)
