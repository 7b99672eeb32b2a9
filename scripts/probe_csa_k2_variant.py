"""Round-3 probe: K2 restack-vs-dots digit-swap variants at 4096^2.

ROUND2_NOTES §14 attributed 5.8 of K2's 7.6 ms to the two VMEM restacks
(64x128 transposes). variant='dots' (ops/pallas/csa_kernel.py::swap_dot)
replaces each restack+dot with ONE sublane-axis dot against the
lane-concatenated [Wr | Wi] DFT parts plus two quadrant slice-adds.

Rows: K2 standalone both variants; full CSA formation both variants;
equality check between them.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel

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
b = int(np.sqrt(size))

key = jax.random.PRNGKey(0)
xr = jax.random.normal(key, (size, size), jnp.float32)
xi = jax.random.normal(jax.random.fold_in(key, 1), (size, size), jnp.float32)


def stream(fn, n=6):
    o = fn(xr, xi)
    float(jnp.sum(o[0][:1, :1]))
    t1 = time.perf_counter()
    for _ in range(n):
        o = fn(xr, xi)
    float(jnp.sum(o[0][:1, :1]))
    return 1000 * (time.perf_counter() - t1) / n


a_dig = int(np.sqrt(size))
outs = {}
for var in ("restack", "dots"):
    k2 = jax.jit(lambda a, c, v=var: csa_kernel._k2_call(
        a, c, f, b, False, "bf16x3", variant=v))
    print(f"K2 {var:8s}: {stream(k2):7.1f} ms", flush=True)
for var in ("swap", "dots"):
    k1 = jax.jit(lambda a, c, v=var: csa_kernel._k1_call(
        a, c, f.u.reshape(1, -1), f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
        a_dig, False, "bf16x3", variant=v))
    print(f"K1 {var:8s}: {stream(k1):7.1f} ms", flush=True)
for k2v, ldv in (("restack", "swap"), ("dots", "swap"), ("dots", "dots")):
    full = jax.jit(
        lambda a, c, kv=k2v, lv=ldv: csa_kernel.apply_csa_pallas_planes(
            a, c, f, k2_variant=kv, lead_variant=lv))
    t = stream(full)
    o = full(xr, xi)
    outs[(k2v, ldv)] = np.asarray(o[0]) + 1j * np.asarray(o[1])
    print(f"CSA k2={k2v:8s} lead={ldv:4s}: {t:7.1f} ms", flush=True)
outs["restack"] = outs[("restack", "swap")]
outs["dots"] = outs[("dots", "dots")]

rel = (np.abs(outs["dots"] - outs["restack"]).max()
       / np.abs(outs["restack"]).max())
print(f"dots vs restack rel-err: {rel:.2e}", flush=True)

# ---- full kernel-fused GMTI CPI (the headline path) ----
from nis_sar_amtigmti_video_tpu.gmti import fused as gmti_fused

x2r = jax.random.normal(jax.random.fold_in(key, 2), (size, size),
                        jnp.float32)
x2i = jax.random.normal(jax.random.fold_in(key, 3), (size, size),
                        jnp.float32)


def cpi(k2v, ldv):
    @jax.jit
    def run(a, c):
        o = gmti_fused.gmti_cpi_pallas(a, c, x2r, x2i, f, k2_variant=k2v,
                                       lead_variant=ldv)
        det = o[7]
        return (jnp.sum(o[5]) + jnp.sum(o[6]) + jnp.sum(det.snr)
                + jnp.sum(o[0]) + jnp.sum(o[2]))
    o = run(xr, xi)
    float(o)
    t1 = time.perf_counter()
    for _ in range(6):
        o = run(xr, xi)
    float(o)
    return 1000 * (time.perf_counter() - t1) / 6


for k2v, ldv in (("restack", "swap"), ("dots", "swap"), ("dots", "dots")):
    print(f"GMTI CPI k2={k2v:8s} lead={ldv:4s}: {cpi(k2v, ldv):7.1f} ms",
          flush=True)
