"""TPU: round-5 confirmation — full fused GMTI CPI with every adopted
lever (k2_rows=32, new swap_dot recombination, K4 epilogue, Phi1 table),
plus a k2_variant='restack' A/B (the old transpose-based digit swap may
rank differently now that the recombination is cheap).

Bench-identical chained protocol (16 iters, one sync).
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
from nis_sar_amtigmti_video_tpu.ops.pallas import gmti_kernel as gk

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
host = [np.random.default_rng(i).standard_normal((size, size), np.float32)
        for i in range(4)]
PCS, PSN = gk.phi1_tables(f)


def fresh():
    return tuple(jnp.asarray(x) for x in host)


def full_cpi(table=True, k2v="dots"):
    def fn(x1r, x1i, x2r, x2i, pcs, psn):
        s1r, s1i, s2r, s2i, cal, phase, dmag, det = fused_mod.gmti_cpi_pallas(
            x1r, x1i, x2r, x2i, f, cfar_params=cp, k2_variant=k2v,
            phi1_table=(pcs, psn) if table else None)
        summary = jnp.sum(phase) + jnp.sum(dmag) + jnp.sum(det.snr) + cal
        return s1r, s1i, s2r, s2i, summary
    return fn


def bench_cpi(name, fn, iters=16):
    try:
        fnj = jax.jit(fn, donate_argnums=(0, 1, 2, 3))
        out = fnj(*fresh(), PCS, PSN)
        _ = float(out[4])
        t1 = time.perf_counter()
        for _ in range(iters):
            out = fnj(out[0], out[1], out[2], out[3], PCS, PSN)
        _ = float(out[4])
        ms = 1000.0 * (time.perf_counter() - t1) / iters
        print(f"{name:40s} {ms:8.2f} ms/CPI", flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAILED: {str(e)[:140]}", flush=True)
        return float("nan")


bench_cpi("FULL CPI adopted (phi1 table, dots)", full_cpi())
bench_cpi("FULL CPI trig phi1 (reference)", full_cpi(table=False))
bench_cpi("FULL CPI phi1 table + restack", full_cpi(k2v="restack"))
