"""RTT-amortized per-stage timing of the pallas CSA megakernel.

Each stage is dispatched ``iters`` times chained (output feeds input) inside
one jit, with ONE scalar fetch at the end — the axon tunnel's ~33 ms RTT is
paid once, so the per-iteration time is true device time.
"""
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
frs = jnp.asarray(f.fr)[jnp.asarray(ck._digit_swap_perm(size))]


@jax.jit
def mk(key):
    return (jax.random.normal(key, (size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1), (size, size),
                              jnp.float32))


xr0, xi0 = mk(jax.random.PRNGKey(0))

stage_fns = {
    "K1": lambda zr, zi: ck._k1_call(
        zr, zi, f.u.reshape(1, -1), f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
        a, False),
    "K2": lambda zr, zi: ck._k2_call(zr, zi, f, frs.reshape(1, -1), b, False),
    "K3": lambda zr, zi: ck._k3_call(zr, zi, a, False),
    "full": lambda zr, zi: ck.apply_csa_pallas_planes(zr, zi, f),
}


def chained(fn):
    def run(zr, zi):
        with jax.enable_x64(False):
            def body(c, _):
                return fn(*c), 0.0
            (zr, zi), _ = jax.lax.scan(body, (zr, zi), None, length=iters)
            return jnp.sum(jnp.abs(zr[:1, :1]))
    return jax.jit(run)


print("device:", jax.devices()[0], "size:", size, "iters:", iters)
for name, fn in stage_fns.items():
    run = chained(fn)
    s = run(xr0, xi0)
    _ = float(s)                                   # compile + warm
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        s = run(xr0, xi0)
        _ = float(s)
        best = min(best, (time.perf_counter() - t1) / iters)
    print(f"{name}: {1000 * best:.3f} ms/iter")
