"""Measure the device's achievable HBM bandwidth and MXU rate with plain XLA.

Chained dispatch, one fetch — establishes the roofline the pallas kernels
should be judged against.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

iters = int(os.environ.get("ITERS", "30"))


def timeit(name, fn, *args, bytes_moved=None, flops=None):
    try:
        _timeit(name, fn, *args, bytes_moved=bytes_moved, flops=flops)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")


def _timeit(name, fn, *args, bytes_moved=None, flops=None):
    def run(*xs):
        with jax.enable_x64(False):
            def body(c, _):
                return fn(*c), 0.0
            c, _ = jax.lax.scan(body, xs, None, length=iters)
            return jnp.sum(c[0].ravel()[:1].astype(jnp.float32))
    run = jax.jit(run)
    _ = float(run(*args))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t1) / iters)
    extra = ""
    if bytes_moved:
        extra += f"  ({bytes_moved / best / 1e9:.0f} GB/s)"
    if flops:
        extra += f"  ({flops / best / 1e12:.1f} TFLOP/s)"
    print(f"{name}: {1000 * best:.3f} ms{extra}")


print("device:", jax.devices()[0])

# elementwise scale: read N + write N bytes
for mb in (16, 64, 256):
    nel = mb * 1024 * 1024 // 4
    x = jnp.ones((nel // 4096, 4096), jnp.float32)
    timeit(f"scale f32 {mb} MB", lambda z: (z * 1.000001,), x,
           bytes_moved=2 * mb * 1e6 * 1.048576)

# big bf16 matmul: compute bound
for m in (4096, 8192):
    xb = jnp.ones((m, m), jnp.bfloat16)
    wb = jnp.ones((m, m), jnp.bfloat16)
    timeit(f"bf16 matmul {m}^2",
           lambda z, w: (jnp.dot(z, w, preferred_element_type=jnp.bfloat16),
                         w),
           xb, wb, flops=2.0 * m * m * m)

# f32 matmul
xf = jnp.ones((4096, 4096), jnp.float32)
wf = jnp.ones((4096, 4096), jnp.float32)
timeit("f32 matmul 4096^2 DEFAULT",
       lambda z, w: (jnp.dot(z, w), w), xf, wf, flops=2.0 * 4096**3)
timeit("f32 matmul 4096^2 HIGHEST",
       lambda z, w: (jnp.dot(z, w, precision=jax.lax.Precision.HIGHEST), w),
       xf, wf, flops=2.0 * 4096**3)

# fft along last axis, c64 4096^2: read+write 128 MB
xc = jnp.ones((4096, 4096), jnp.complex64)
timeit("fft rows c64 4096^2", lambda z: (jnp.fft.fft(z, axis=-1),), xc,
       bytes_moved=2 * 128e6, flops=5.0 * 4096 * 4096 * 12)
