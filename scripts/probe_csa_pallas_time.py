"""Minimal TPU timing of the pallas CSA megakernel (donated buffers)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

size = int(os.environ.get("SIZE", "4096"))
batch = int(os.environ.get("BATCH", "2"))
impl = os.environ.get("IMPL", "pallas")
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


@jax.jit
def mk(key):
    return (jax.random.normal(key, (batch, size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (batch, size, size), jnp.float32))


xr, xi = mk(jax.random.PRNGKey(0))

mode = os.environ.get("MODE", "bf16x3")
if impl == "pallas":
    fn = jax.jit(lambda r, i: csa_kernel.apply_csa_pallas_planes(
        r, i, f, mode=mode), donate_argnums=(0, 1))
else:
    def _planes(r, i):
        y = csa_ops.apply_csa_fused(jax.lax.complex(r, i), f, impl)
        return jnp.real(y), jnp.imag(y)
    fn = jax.jit(_planes, donate_argnums=(0, 1))

xr, xi = fn(xr, xi)
_ = float(jnp.sum(jnp.abs(xr[:, :1, :1])))
print("compiled", impl)
lat = []
for _i in range(8):
    t1 = time.perf_counter()
    xr, xi = fn(xr, xi)
    _ = float(jnp.sum(jnp.abs(xr[:, :1, :1])))
    lat.append(time.perf_counter() - t1)
tag = f"{impl}[{mode}]" if impl == "pallas" else impl
print(f"{tag}: {1000 * float(np.median(lat)) / batch:.2f} ms/frame "
      f"(batch {batch}, median of 8)")
