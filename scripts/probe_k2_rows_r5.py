"""TPU: K2 pair grid-rows sweep + full-CPI A/B (round-5 item 3 follow-up).

probe_k2_bill_r5.py found the pair kernel layout-bound (bf16 dots save
0.27 ms, nophase 1.77) and rows=32 0.7 ms faster than the shipped 64.
This probe sweeps rows further down, then A/Bs the FULL fused GMTI CPI
(gmti_cpi_pallas) at the candidate rows and at lead_variant='dots', using
the bench's exact chained protocol.
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
cp = cfar.CfarParams(guard=2, train=8)
b = int(math.isqrt(size))
host = [np.random.default_rng(i).standard_normal((size, size), np.float32)
        for i in range(4)]


def fresh():
    return tuple(jnp.asarray(x) for x in host)


def bench(name, fn, iters=12):
    fnj = jax.jit(fn, donate_argnums=(0, 1, 2, 3))
    out = fnj(*fresh())
    _ = float(jnp.sum(out[0][:1, :1]))
    t1 = time.perf_counter()
    for _ in range(iters):
        out = fnj(*out)
    _ = float(jnp.sum(out[0][:1, :1]))
    ms = 1000.0 * (time.perf_counter() - t1) / iters
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return ms


for rows in (32, 16, 8):
    bench(f"k2 pair rows={rows}",
          lambda *x, rows=rows: ck.k2_pair_call(*x, f, b, False, "bf16x3",
                                                rows=rows, variant="dots"))


def full_cpi(rows, lead):
    def fn(x1r, x1i, x2r, x2i):
        s1r, s1i, s2r, s2i, cal, phase, dmag, det = fused_mod.gmti_cpi_pallas(
            x1r, x1i, x2r, x2i, f, cfar_params=cp, k2_rows=rows,
            lead_variant=lead)
        summary = jnp.sum(phase) + jnp.sum(dmag) + jnp.sum(det.snr) + cal
        return s1r, s1i, s2r, s2i, summary
    return fn


def bench_cpi(name, fn, iters=16):
    fnj = jax.jit(fn, donate_argnums=(0, 1, 2, 3))
    out = fnj(*fresh())
    _ = float(out[4])
    t1 = time.perf_counter()
    for _ in range(iters):
        out = fnj(out[0], out[1], out[2], out[3])
    _ = float(out[4])
    ms = 1000.0 * (time.perf_counter() - t1) / iters
    print(f"{name:34s} {ms:8.2f} ms/CPI", flush=True)
    return ms


bench_cpi("FULL CPI rows=64 lead=swap", full_cpi(64, "swap"))
bench_cpi("FULL CPI rows=32 lead=swap", full_cpi(32, "swap"))
bench_cpi("FULL CPI rows=16 lead=swap", full_cpi(16, "swap"))
bench_cpi("FULL CPI rows=32 lead=dots", full_cpi(32, "dots"))
