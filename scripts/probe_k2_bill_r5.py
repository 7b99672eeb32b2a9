"""TPU: attribute the K2 pair kernel's internal bill (round-5 item 3).

The round-4 precision ladder proved K2 is NOT dot-bound (dropping a third
of its dots saved 1.7%); this probe finds where the ~7 ms actually goes by
timing ablated clones of csa_kernel._k2g_body:

  full       the shipped pair kernel (dots variant, bf16x3)
  notrig     cos/sin of Phi2/Phi3 replaced by the raw phase fields
             (removes ~4 transcendental field evaluations per grid step)
  noroll     roll_half(s) -> s (removes the 6 lane-half rotations per
             channel; values wrong, traffic/ALU otherwise identical)
  nophase    twiddle + Phi2/Phi3 multiplies removed entirely (pure dot
             pipeline)
  noswapout  final (q, p) -> (p, q) transpose removed (wrong layout out)
  bf16       single-pass dots (the round-4 ladder row, for scale)

Chained-stream protocol (donated args, one sync per timed loop) like
probe_gmti_kernel_stages.py.
"""
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel as ck
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import roll_half

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
b = int(math.isqrt(size))


def _mk_body(ablate: str):
    def body(x1r, x1i, x2r, x2i, frs2, alpha, beta, cph3, dr3, usq3,
             rphase, gg, c3, wf_hi, wf_lo, wi_hi, wi_lo,
             fc_hi, fc_lo, ic_hi, ic_lo, a1, b1, a2, b2,
             o1r, o1i, o2r, o2i, *, b: int, mode: str):
        sgn = ck._half_sign((1, 1, 2 * b), b)
        rh = (lambda s: s) if ablate == "noroll" else roll_half

        def swap_dot(s, ch, cl):
            dc = ck._dot3(s, ch, cl, 1, mode)
            return jnp.concatenate(
                [dc[:, :b, :b] - dc[:, b:, b:],
                 dc[:, b:, :b] + dc[:, :b, b:]], axis=2)

        fv = frs2[:][None]
        ph2 = (alpha[:] * fv + beta[:]) * fv
        ph3 = rphase[:] + cph3[:][None] + gg[:] * dr3[:][None] \
            - c3[:] * usq3[:][None]
        if ablate == "notrig":
            cs2, sn2 = ph2, ph2 * sgn
            cs3, sn3 = ph3, ph3 * sgn
        else:
            cs2, sn2 = jnp.cos(ph2), jnp.sin(ph2) * sgn
            cs3, sn3 = jnp.cos(ph3), jnp.sin(ph3) * sgn

        for xr, xi, our, oui in ((x1r, x1i, o1r, o1i),
                                 (x2r, x2i, o2r, o2i)):
            z = jnp.concatenate([xr[:], xi[:]], axis=1)
            s = ck._dot3(z, wf_hi[:], wf_lo[:], 1, mode)
            if ablate != "nophase":
                s = s * a1[:][None] + rh(s) * b1[:][None]
            s = swap_dot(s, fc_hi[:], fc_lo[:])
            if ablate != "nophase":
                s = s * cs2 + rh(s) * sn2
            s = ck._dot3(s, wi_hi[:], wi_lo[:], 2, mode)
            if ablate != "nophase":
                s = s * a2[:][None] + rh(s) * b2[:][None]
            s = swap_dot(s, ic_hi[:], ic_lo[:])
            if ablate != "nophase":
                s = s * cs3 + rh(s) * sn3
            if ablate == "noswapout":
                our[:] = s[..., :b]
                oui[:] = s[..., b:]
            else:
                our[:] = jnp.swapaxes(s[..., :b], 1, 2)
                oui[:] = jnp.swapaxes(s[..., b:], 1, 2)
    return body


def k2_pair_ablated(x1r, x1i, x2r, x2i, ablate: str, mode: str = "bf16x3",
                    rows: int = 64):
    n = b * b
    n_az = x1r.shape[0]
    frs2, cph3, dr3, usq3 = ck._k2_tables(f, b)
    (wf_hi, wf_lo), (wi_hi, wi_lo), (fc_hi, fc_lo), (ic_hi, ic_lo), \
        a1, b1, a2, b2 = ck._k2_consts(b)
    grid = (n_az // rows,)
    bs_dat = pl.BlockSpec((rows, b, b), lambda i: (i, 0, 0))
    bs_az = pl.BlockSpec((rows, 1, 1), lambda i: (i, 0, 0))
    bs_tab = pl.BlockSpec((b, 2 * b), lambda i: (0, 0))
    bs_w = pl.BlockSpec((2 * b, 2 * b), lambda i: (0, 0))

    def col(v):
        return jnp.asarray(v).reshape(-1, 1, 1)

    with jax.enable_x64(False):
        o = pl.pallas_call(
            partial(_mk_body(ablate), b=b, mode=mode),
            grid=grid,
            in_specs=[bs_dat] * 4 + [bs_tab, bs_az, bs_az, bs_tab, bs_tab,
                                     bs_tab, bs_az, bs_az, bs_az,
                                     bs_w, bs_w, bs_w, bs_w,
                                     bs_tab, bs_tab, bs_tab, bs_tab,
                                     bs_tab, bs_tab, bs_tab, bs_tab],
            out_specs=[bs_dat] * 4,
            out_shape=[jax.ShapeDtypeStruct((n_az, b, b), jnp.float32)] * 4,
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=ck._VMEM,
            interpret=False,
        )(x1r.reshape(n_az, b, b), x1i.reshape(n_az, b, b),
          x2r.reshape(n_az, b, b), x2i.reshape(n_az, b, b), frs2,
          col(f.alpha), col(f.beta), cph3, dr3, usq3,
          col(f.rphase), col(f.g), col(f.c3),
          wf_hi, wf_lo, wi_hi, wi_lo, fc_hi, fc_lo, ic_hi, ic_lo,
          a1, b1, a2, b2)
    return tuple(z.reshape(n_az, n) for z in o)


key = jax.random.PRNGKey(0)
host = [np.random.default_rng(i).standard_normal((size, size),
                                                 np.float32)
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
    print(f"{name:28s} {ms:8.2f} ms")
    return ms


rows_full = bench("pair shipped (lib)", lambda *x: ck.k2_pair_call(
    *x, f, b, False, "bf16x3", variant="dots"))
base = bench("full (probe clone)", lambda *x: k2_pair_ablated(*x, "full"))
for abl in ("notrig", "noroll", "nophase", "noswapout"):
    ms = bench(abl, lambda *x, abl=abl: k2_pair_ablated(*x, abl))
    print(f"  -> {abl} saves {base - ms:6.2f} ms")
ms = bench("bf16 dots", lambda *x: k2_pair_ablated(*x, "full", mode="bf16"))
print(f"  -> bf16 saves {base - ms:6.2f} ms")
for rows in (32, 128, 256):
    try:
        bench(f"full rows={rows}",
              lambda *x, rows=rows: k2_pair_ablated(*x, "full", rows=rows))
    except Exception as e:
        print(f"full rows={rows}: {type(e).__name__}: {str(e)[:120]}")
