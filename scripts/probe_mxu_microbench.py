"""Isolate pallas CSA kernel cost components on the TPU.

Times, RTT-amortized (scan-chained, one fetch):
  * raw in-kernel matmul throughput (128,128)@(128,8192) at several
    precisions;
  * K1 variants with pieces removed (no Phi1 / no twiddle+swap / copy-only)
    to attribute the 2.5 ms K1 cost.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel as ck
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

size = 4096
iters = int(os.environ.get("ITERS", "20"))
a = 64
n = size

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

fr_m, fi_m, tr_m, ti_m = ck._dft_consts(a, n)
wblk = ck._blk_matrix(fr_m, fi_m)


def timeit(name, fn, *args, flops=None):
    def run(*xs):
        with jax.enable_x64(False):
            def body(c, _):
                return fn(*c), 0.0
            c, _ = jax.lax.scan(body, xs, None, length=iters)
            return jnp.sum(jnp.abs(c[0][:1, :1]))
    run = jax.jit(run)
    s = run(*args)
    _ = float(s)
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t1) / iters)
    extra = f"  ({flops / best / 1e12:.1f} TFLOP/s)" if flops else ""
    print(f"{name}: {1000 * best:.3f} ms{extra}")


# ---------------- raw matmul throughput, one kernel, grid=32 ----------------
def mm_body(wref, xref, oref, *, prec):
    oref[:] = jnp.dot(wref[:], xref[:], preferred_element_type=jnp.float32,
                      precision=prec)


def mm_call(w, x, prec):
    grid = (n // 128,)
    return pl.pallas_call(
        partial(mm_body, prec=prec),
        grid=grid,
        in_specs=[pl.BlockSpec((128, 128), lambda j: (0, 0)),
                  pl.BlockSpec((128, 64 * 128), lambda j: (j, 0))],
        out_specs=pl.BlockSpec((128, 64 * 128), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((32 * 128, 64 * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(w, x)


x_mm = jnp.ones((32 * 128, 64 * 128), jnp.float32)
w_mm = jnp.asarray(wblk)
mm_flops = 2.0 * 32 * 128 * 128 * (64 * 128)
print("device:", jax.devices()[0])
for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
    timeit(f"matmul f32 {prec}", lambda xx: (mm_call(w_mm, xx, prec),),
           x_mm, flops=mm_flops * iters)

# bf16 inputs
def mmb_body(wref, xref, oref):
    oref[:] = jnp.dot(wref[:], xref[:], preferred_element_type=jnp.float32)


def mmb_call(w, x):
    grid = (n // 128,)
    return pl.pallas_call(
        mmb_body,
        grid=grid,
        in_specs=[pl.BlockSpec((128, 128), lambda j: (0, 0)),
                  pl.BlockSpec((128, 64 * 128), lambda j: (j, 0))],
        out_specs=pl.BlockSpec((128, 64 * 128), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((32 * 128, 64 * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(w, x)


timeit("matmul bf16 in/f32 out",
       lambda xx: (mmb_call(w_mm.astype(jnp.bfloat16),
                            xx.astype(jnp.bfloat16)).astype(jnp.float32),),
       x_mm, flops=mm_flops * iters)


# ---------------- K1 component ablation ----------------
def k1_var(xr, xi, u, c1, w, *, twiddle, phi, nmat):
    """K1 with selectable pieces."""
    lane = 128

    def body(xr_, xi_, u_, c1_, w_, wblk_, tr_, ti_, our, oui):
        zr, zi = xr_[:], xi_[:]
        if nmat >= 1:
            zr = zr.reshape(a, a * lane)
            zi = zi.reshape(a, a * lane)
            zr, zi = ck._cdot_blk(wblk_[:], zr, zi)
            if twiddle:
                zr = zr.reshape(a, a, lane)
                zi = zi.reshape(a, a, lane)
                zr, zi = ck._cmul(zr, zi, tr_[:][:, :, None],
                                  ti_[:][:, :, None])
                zr = jnp.swapaxes(zr, 0, 1).reshape(a, a * lane)
                zi = jnp.swapaxes(zi, 0, 1).reshape(a, a * lane)
            if nmat >= 2:
                zr, zi = ck._cdot_blk(wblk_[:], zr, zi)
            zr = zr.reshape(n, lane)
            zi = zi.reshape(n, lane)
        if phi:
            du = u_[:] - w_[:]
            ph = c1_[:] * du * du
            pr, pi = jnp.cos(ph), jnp.sin(ph)
            zr, zi = ck._cmul(zr, zi, pr, pi)
        our[:], oui[:] = zr, zi

    grid = (n // 128,)
    bs_dat = pl.BlockSpec((n, 128), lambda j: (0, j))
    bs_u = pl.BlockSpec((1, 128), lambda j: (0, j))
    bs_az = pl.BlockSpec((n, 1), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[bs_dat, bs_dat, bs_u, bs_az, bs_az, bs_blk, bs_c, bs_c],
        out_specs=[bs_dat, bs_dat],
        out_shape=[jax.ShapeDtypeStruct((n, n), jnp.float32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xr, xi, u, c1, w, jnp.asarray(wblk), jnp.asarray(tr_m),
      jnp.asarray(ti_m))


xr = jnp.ones((n, n), jnp.float32)
xi = jnp.zeros((n, n), jnp.float32)
u2 = jnp.asarray(f.u).reshape(1, -1)
c12 = jnp.asarray(f.c1).reshape(-1, 1)
w2 = jnp.asarray(f.w).reshape(-1, 1)

for name, kw in [
    ("K1 full (2mat+tw+phi)", dict(twiddle=True, phi=True, nmat=2)),
    ("K1 no-phi", dict(twiddle=True, phi=False, nmat=2)),
    ("K1 1mat only", dict(twiddle=False, phi=False, nmat=1)),
    ("K1 2mat no-twiddle", dict(twiddle=False, phi=False, nmat=2)),
    ("K1 copy-only", dict(twiddle=False, phi=False, nmat=0)),
]:
    timeit(name, lambda zr, zi, kw=kw: k1_var(zr, zi, u2, c12, w2, **kw),
           xr, xi)
