"""(1) Accuracy of in-kernel f32 dots vs f64 (is Mosaic doing bf16 1-pass?)
(2) Slope rate of the weights-LHS orientation (128,128)@(128,8192).
(3) Accuracy+rate of a manual bf16x3 (hi/lo split) dot.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
M, K, N = 1024, 128, 128
a64 = rng.standard_normal((M, K))
b64 = rng.standard_normal((K, N))
ref = a64 @ b64

a32 = jnp.asarray(a64, jnp.float32)
b32 = jnp.asarray(b64, jnp.float32)


def run_kernel(body, *args, out_shape):
    with jax.enable_x64(False):
        return pl.pallas_call(
            body,
            in_specs=[pl.BlockSpec(x.shape, lambda: (0,) * x.ndim)
                      for x in args],
            out_specs=pl.BlockSpec(out_shape, lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*args)


def body_f32(aref, bref, oref):
    oref[:] = jnp.dot(aref[:], bref[:], preferred_element_type=jnp.float32)


out = np.asarray(run_kernel(body_f32, a32, b32, out_shape=(M, N)))
err = np.abs(out - ref).max() / np.abs(ref).max()
print(f"in-kernel f32 dot DEFAULT rel err: {err:.2e}")

# numpy f32 reference error for comparison
err_np32 = np.abs(a64.astype(np.float32) @ b64.astype(np.float32)
                  - ref).max() / np.abs(ref).max()
print(f"numpy f32 matmul rel err:         {err_np32:.2e}")

err_bf16 = np.abs(
    np.asarray(jnp.asarray(a64, jnp.bfloat16), np.float64)
    @ np.asarray(jnp.asarray(b64, jnp.bfloat16), np.float64)
    - ref).max() / np.abs(ref).max()
print(f"pure bf16-rounded matmul rel err: {err_bf16:.2e}")


# manual bf16x3
def body_bf16x3(aref, bref, oref):
    a = aref[:]
    b = bref[:]
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    oref[:] = d(ah, bh) + d(ah, bl) + d(al, bh)


out3 = np.asarray(run_kernel(body_bf16x3, a32, b32, out_shape=(M, N)))
err3 = np.abs(out3 - ref).max() / np.abs(ref).max()
print(f"in-kernel manual bf16x3 rel err:  {err3:.2e}")

# ---- orientation slope: weights-LHS (128,128)@(128,8192) ----
iters = 20


def orient_time(nmat, wl):
    def body(wref, xref, oref):
        z = xref[:]
        w = wref[:]
        for _ in range(nmat):
            if wl:
                z = jnp.dot(w, z, preferred_element_type=jnp.float32)
            else:
                z = jnp.dot(z, w, preferred_element_type=jnp.float32)
        oref[:] = z

    shape = (128, 8192) if wl else (8192, 128)

    def call(w, x):
        return pl.pallas_call(
            body,
            grid=(8,),
            in_specs=[pl.BlockSpec((128, 128), lambda j: (0, 0)),
                      pl.BlockSpec(shape, lambda j: (0, j) if wl else (j, 0))],
            out_specs=pl.BlockSpec(shape, lambda j: (0, j) if wl else (j, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (128, 8 * 8192) if wl else (8 * 8192, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, x)

    w = jnp.eye(128, dtype=jnp.float32) * 1.0001
    x = jnp.ones((128, 8 * 8192) if wl else (8 * 8192, 128), jnp.float32)

    def run(xx):
        def bd(c, _):
            return (call(w, c[0]),), 0.0
        with jax.enable_x64(False):
            c, _ = jax.lax.scan(bd, (xx,), None, length=iters)
            return jnp.sum(c[0].ravel()[:1])

    run = jax.jit(run)
    _ = float(run(x))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(x))
        best = min(best, (time.perf_counter() - t1) / iters)
    return best


for wl, name in ((True, "weights-LHS (128,128)@(128,8192)"),
                 (False, "data-LHS (8192,128)@(128,128)")):
    t2, t8 = orient_time(2, wl), orient_time(8, wl)
    fl = 2.0 * 8 * 8192 * 128 * 128 * 6
    print(f"{name}: t2={1e3*t2:.3f} t8={1e3*t8:.3f} ms -> "
          f"{fl / (t8 - t2) / 1e12:.1f} TF/s marginal")
