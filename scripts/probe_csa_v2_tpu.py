"""On-TPU accuracy + RTT-amortized timing of the v2 pallas CSA kernels."""
import functools
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

size = int(os.environ.get("SIZE", "4096"))
iters = int(os.environ.get("ITERS", "20"))
a = b = int(np.sqrt(size))
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

rng = np.random.default_rng(0)
xr0 = jnp.asarray(rng.standard_normal((size, size)).astype(np.float32))
xi0 = jnp.asarray(rng.standard_normal((size, size)).astype(np.float32))

print("device:", jax.devices()[0], "size:", size)

# ---- accuracy vs fused-XLA (device-side compare, scalar fetch) ----
@functools.partial(jax.jit, static_argnames=("mode",))
def err_of(xr, xi, mode):
    want = csa_ops.apply_csa_fused(jax.lax.complex(xr, xi), f, "hybrid")
    gr, gi = ck.apply_csa_pallas_planes(xr, xi, f, mode=mode)
    d = jnp.abs(jax.lax.complex(gr, gi) - want)
    return jnp.max(d) / jnp.max(jnp.abs(want))


for mode in ("bf16x3", "bf16"):
    print(f"{mode}: max rel err vs fused-XLA = "
          f"{float(err_of(xr0, xi0, mode=mode)):.2e}", flush=True)

# ---- per-stage + full timing, scan-chained ----
stage_fns = {
    "K1": lambda zr, zi, m: ck._k1_call(
        zr, zi, f.u.reshape(1, -1), f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
        a, False, m),
    "K2": lambda zr, zi, m: ck._k2_call(zr, zi, f, b, False, m),
    "K3": lambda zr, zi, m: ck._k3_call(zr, zi, a, False, m),
    "full": lambda zr, zi, m: ck.apply_csa_pallas_planes(zr, zi, f, mode=m),
}


def chained(fn, mode):
    def run(zr, zi):
        with jax.enable_x64(False):
            def body(c, _):
                return fn(*c, mode), 0.0
            (zr, zi), _ = jax.lax.scan(body, (zr, zi), None, length=iters)
            return jnp.sum(jnp.abs(zr[:1, :1]))
    return jax.jit(run)


for mode in ("bf16x3", "bf16"):
    for name, fn in stage_fns.items():
        run = chained(fn, mode)
        _ = float(run(xr0, xi0))
        best = 1e9
        for _rep in range(3):
            t1 = time.perf_counter()
            _ = float(run(xr0, xi0))
            best = min(best, (time.perf_counter() - t1) / iters)
        print(f"{mode} {name}: {1000 * best:.3f} ms/iter", flush=True)
