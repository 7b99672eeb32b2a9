"""TPU probe: pallas CSA megakernel vs XLA fused path at 4096^2."""
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

print("device:", jax.devices()[0])
size = int(os.environ.get("SIZE", "4096"))
batch = int(os.environ.get("BATCH", "4"))
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
    return jax.lax.complex(
        jax.random.normal(key, (batch, size, size), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1), (batch, size, size),
                          jnp.float32))


x = mk(jax.random.PRNGKey(0))

pal = jax.jit(lambda v: csa_kernel.apply_csa_pallas(v, f))
xla = jax.jit(lambda v: csa_ops.apply_csa_fused(v, f, "hybrid"))

t1 = time.perf_counter()
yp = pal(x)
sp = float(jnp.sum(jnp.abs(yp[:, :2, :2])))
print(f"pallas compile+run: {time.perf_counter() - t1:.1f} s  sum={sp:.4e}")

t1 = time.perf_counter()
yx = xla(x)
sx = float(jnp.sum(jnp.abs(yx[:, :2, :2])))
print(f"xla compile+run: {time.perf_counter() - t1:.1f} s  sum={sx:.4e}")

# accuracy on device (small slice fetch)
d = float(jnp.max(jnp.abs(yp - yx))) / float(jnp.max(jnp.abs(yx)))
print(f"max rel diff vs xla: {d:.2e}")

for name, fn in [("pallas", pal), ("xla-hybrid", xla)]:
    y = fn(x)
    _ = float(jnp.sum(jnp.abs(y[:, :1, :1])))
    lat = []
    for _i in range(6):
        t1 = time.perf_counter()
        y = fn(y)   # chain to force execution
        _ = float(jnp.sum(jnp.abs(y[:, :1, :1])))
        lat.append(time.perf_counter() - t1)
    ms = 1000.0 * float(np.median(lat)) / batch
    print(f"{name}: {ms:.2f} ms/frame (batch {batch})")
