"""TPU timing: 2-channel 4096^2 GMTI step — formation vs products split."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.gmti import ati, cfar, dpca
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

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
phases = csa_ops.csa_factors(p)
cfar_p = cfar.CfarParams(guard=2, train=8)


@jax.jit
def mk(key):
    return jax.lax.complex(
        jax.random.normal(key, (2, size, size), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1), (2, size, size),
                          jnp.float32))


two = mk(jax.random.PRNGKey(0))


def products(slc):
    s1, s2 = slc[0], slc[1]
    s2 = ati.apply_balance(s2, ati.channel_balance_phase(s1, s2))
    phase = ati.masked_phase(s1, s2)
    diff = dpca.dpca_difference(s1, s2)
    det = cfar.ca_cfar(jnp.abs(diff) ** 2, cfar_p)
    return jnp.sum(phase[:2, :2]) + jnp.sum(det.snr[:2, :2])


form_j = jax.jit(lambda x, ph: csa_ops.apply_csa_fused(x, ph, "hybrid"))
prod_j = jax.jit(products)
full_j = jax.jit(lambda x, ph: products(csa_ops.apply_csa_fused(x, ph,
                                                                "hybrid")))

# no-CFAR variant to isolate CFAR cost
def products_nocfar(slc):
    s1, s2 = slc[0], slc[1]
    s2 = ati.apply_balance(s2, ati.channel_balance_phase(s1, s2))
    phase = ati.masked_phase(s1, s2)
    diff = dpca.dpca_difference(s1, s2)
    return jnp.sum(phase[:2, :2]) + jnp.sum(jnp.abs(diff[:2, :2]))


prod_nc_j = jax.jit(products_nocfar)


def sync_scalar(v):
    return float(v)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = (float(jnp.sum(jnp.abs(out[:1, :1, :1]))) if out.ndim == 3
         else float(out))
    lat = []
    for _i in range(reps):
        t1 = time.perf_counter()
        out = fn(*args)
        _ = (float(jnp.sum(jnp.abs(out[:1, :1, :1]))) if out.ndim == 3
             else float(out))
        lat.append(time.perf_counter() - t1)
    print(f"{name}: {1000 * float(np.median(lat)):.1f} ms")
    return out


t1 = time.perf_counter()
slc = form_j(two, phases)
_ = float(jnp.sum(jnp.abs(slc[:1, :1, :1])))
print(f"form compile: {time.perf_counter() - t1:.1f} s")
timeit("form (2ch 4096^2 CSA)", form_j, two, phases)
timeit("products (bal+ATI+DPCA+CFAR)", prod_j, slc)
timeit("products no-CFAR", prod_nc_j, slc)
timeit("FULL gmti step", full_j, two, phases)
