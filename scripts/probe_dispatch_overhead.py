"""Quantify per-iteration overhead: scan-chained vs python-loop dispatch.

A tiny op (128x128 scale) isolates fixed cost; then the same big op is
timed (a) scan-chained inside one executable and (b) python-loop chained
across executable launches (one fetch at the end in both cases).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

iters = int(os.environ.get("ITERS", "50"))
print("device:", jax.devices()[0])


def scan_time(fn, *args, n=iters):
    def run(*xs):
        def body(c, _):
            return fn(*c), 0.0
        c, _ = jax.lax.scan(body, xs, None, length=n)
        return jnp.sum(c[0].ravel()[:1].astype(jnp.float32))
    run = jax.jit(run)
    _ = float(run(*args))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t1) / n)
    return best


def loop_time(fn, *args, n=iters):
    step = jax.jit(fn, donate_argnums=tuple(range(len(args))))
    xs = step(*tuple(a + 0 for a in args))
    _ = float(jnp.sum(xs[0].ravel()[:1].astype(jnp.float32)))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        for _i in range(n):
            xs = step(*xs)
        _ = float(jnp.sum(xs[0].ravel()[:1].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t1) / n)
    return best


tiny = jnp.ones((128, 128), jnp.float32)
big = jnp.ones((8192, 8192), jnp.float32)   # 256 MB

f_scale = lambda z: (z * 1.000001,)

print(f"tiny scale scan-chained:  {1e3 * scan_time(f_scale, tiny):.3f} ms/iter")
print(f"tiny scale loop-chained:  {1e3 * loop_time(f_scale, tiny):.3f} ms/iter")
print(f"big  scale scan-chained:  {1e3 * scan_time(f_scale, big):.3f} ms/iter")
print(f"big  scale loop-chained:  {1e3 * loop_time(f_scale, big):.3f} ms/iter")

# two ops per iteration, still one executable: does overhead scale with
# ops or with iterations?
f2 = lambda z: ((z * 1.000001) * 0.999999,)
print(f"big  scale x2 scan:       {1e3 * scan_time(f2, big):.3f} ms/iter")

# unrolled scan (no loop machinery)
def unrolled(z):
    def run(x):
        for _ in range(8):
            x = x * 1.000001
        return jnp.sum(x.ravel()[:1])
    run = jax.jit(run)
    _ = float(run(z))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(z))
        best = min(best, (time.perf_counter() - t1) / 8)
    return best

print(f"big  scale unrolled x8:   {1e3 * unrolled(big):.3f} ms/iter")
