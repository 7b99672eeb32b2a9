"""TPU per-kernel timing of the pallas CSA megakernel stages."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel as ck
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

size = 4096
a = b = 64
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
frs = jnp.asarray(f.fr)[jnp.asarray(ck._digit_swap_perm(size))]


@jax.jit
def mk(key):
    return (jax.random.normal(key, (size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1), (size, size),
                              jnp.float32))


xr, xi = mk(jax.random.PRNGKey(0))


def wrap_x64_off(fn):
    def g(*args):
        with jax.enable_x64(False):
            return fn(*args)
    return jax.jit(g)


k1 = wrap_x64_off(lambda zr, zi: ck._k1_call(
    zr, zi, f.u.reshape(1, -1), f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
    a, False))
k2 = wrap_x64_off(lambda zr, zi: ck._k2_call(zr, zi, f, frs.reshape(1, -1),
                                             b, False))
k3 = wrap_x64_off(lambda zr, zi: ck._k3_call(zr, zi, a, False))


def timeit(name, fn, zr, zi, reps=8):
    o = fn(zr, zi)
    _ = float(jnp.sum(jnp.abs(o[0][:1, :1])))
    lat = []
    for _i in range(reps):
        t1 = time.perf_counter()
        o = fn(*o)
        _ = float(jnp.sum(jnp.abs(o[0][:1, :1])))
        lat.append(time.perf_counter() - t1)
    print(f"{name}: {1000 * float(np.median(lat)):.2f} ms")


print("device:", jax.devices()[0])
timeit("K1 (az fwd + Phi1)", k1, xr, xi)
timeit("K2 (rg fft/phi2/ifft/phi3)", k2, xr, xi)
timeit("K3 (az inverse)", k3, xr, xi)
