"""K2 row-block sweep for the v2 CSA megakernel + full-chain timing.
Run alone on the TPU."""
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
a = b = 64


@jax.jit
def mk(key):
    return (jax.random.normal(key, (size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (size, size), jnp.float32))


xr, xi = mk(jax.random.PRNGKey(0))


def sync(t):
    return float(jnp.sum(jnp.abs(t[0][:1, :1])) + jnp.sum(jnp.abs(t[1][:1, :1])))


def stream_time(fn, n=16):
    o = fn(xr, xi)
    _ = sync(o)
    o = fn(*o)  # chainable? planes in == planes out shapes
    t1 = time.perf_counter()
    for _ in range(n):
        o = fn(*o)
    _ = sync(o)
    return 1000 * (time.perf_counter() - t1) / n


# K2 alone at several row blocks
for rows in (64, 128, 256, 512):
    def k2(zr, zi, rows=rows):
        with jax.enable_x64(False):
            return ck._k2_call(zr, zi, f, b, False, "bf16x3", rows=rows)
    fn = jax.jit(k2)
    try:
        ms = stream_time(fn)
        print(f"K2 rows={rows}: {ms:.2f} ms")
    except Exception as e:
        print(f"K2 rows={rows}: FAIL {type(e).__name__}: {str(e)[:120]}")

# full chain at the best row setting is wired via default; time it
full = jax.jit(lambda zr, zi: ck.apply_csa_pallas_planes(zr, zi, f))
ms = stream_time(full)
print(f"full chain (default rows): {ms:.2f} ms")
