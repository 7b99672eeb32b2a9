"""Which in-kernel matmul shapes reach MXU peak on this chip?

Times (M,K)@(K,N) inside a single-block pallas kernel, scan-chained.
Total MACs held ~constant; orientation and K vary.
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

iters = int(os.environ.get("ITERS", "30"))
print("device:", jax.devices()[0])


def mm_time(m, k, n, dtype, grid=8, prec=jax.lax.Precision.DEFAULT):
    def body(wref, xref, oref):
        oref[:] = jnp.dot(xref[:], wref[:], preferred_element_type=jnp.float32,
                          precision=prec)

    def call(w, x):
        return pl.pallas_call(
            body,
            grid=(grid,),
            in_specs=[pl.BlockSpec((k, n), lambda j: (0, 0)),
                      pl.BlockSpec((m, k), lambda j: (j, 0))],
            out_specs=pl.BlockSpec((m, n), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((grid * m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, x)

    w = jnp.ones((k, n), dtype)
    x = jnp.ones((grid * m, k), dtype)

    def run(xx):
        def bd(c, _):
            return (call(w, c[0]).astype(dtype)[:, :k],), 0.0
        c, _ = jax.lax.scan(bd, (xx,), None, length=iters)
        return jnp.sum(c[0].ravel()[:1].astype(jnp.float32))

    run = jax.jit(run)
    try:
        _ = float(run(x))
    except Exception as e:
        print(f"M{m} K{k} N{n} {dtype.__name__} g{grid}: FAIL {str(e)[:80]}")
        return
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(x))
        best = min(best, (time.perf_counter() - t1) / iters)
    fl = 2.0 * grid * m * k * n
    print(f"M{m} K{k} N{n} {dtype.__name__} g{grid}: {1e3 * best:.3f} ms "
          f"({fl / best / 1e12:.1f} TF/s)")


# same total MACs (8.6 GFLOP/iter), different orientation
mm_time(128, 128, 8192, jnp.float32, grid=32)
mm_time(8192, 128, 128, jnp.float32, grid=32)
mm_time(1024, 128, 1024, jnp.float32, grid=32)
mm_time(512, 512, 512, jnp.float32, grid=32)
mm_time(128, 128, 8192, jnp.bfloat16, grid=32)
mm_time(8192, 128, 128, jnp.bfloat16, grid=32)
mm_time(512, 512, 512, jnp.bfloat16, grid=32)
mm_time(2048, 2048, 2048, jnp.bfloat16, grid=2)
mm_time(2048, 2048, 2048, jnp.float32, grid=2)
# dot_general variants for the K2 use case: (rows,64,64) batch-ish shapes
def dg_time(rows, b, lhs_axis, nmat, name):
    dn = (((lhs_axis,), (0,)), ((), ()))

    def body(wref, xref, oref):
        z = xref[:]
        for _ in range(nmat):
            z = jax.lax.dot_general(z, wref[:], dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
        oref[:] = z

    def call(w, x):
        return pl.pallas_call(
            body,
            grid=(4096 // rows,),
            in_specs=[pl.BlockSpec((b, b), lambda j: (0, 0)),
                      pl.BlockSpec((rows, b, b), lambda j: (j, 0, 0))],
            out_specs=pl.BlockSpec((rows, b, b), lambda j: (j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((4096, b, b), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, x)

    w = jnp.ones((b, b), jnp.float32)
    x = jnp.ones((4096, b, b), jnp.float32)

    def run(xx):
        def bd(c, _):
            return (call(w, c[0]),), 0.0
        c, _ = jax.lax.scan(bd, (xx,), None, length=iters)
        return jnp.sum(c[0].ravel()[:1])

    run = jax.jit(run)
    _ = float(run(x))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(x))
        best = min(best, (time.perf_counter() - t1) / iters)
    fl = 2.0 * 4096 * b * b * b * nmat
    print(f"{name}: {1e3 * best:.3f} ms ({fl / best / 1e12:.1f} TF/s)")


dg_time(64, 64, 1, 4, "dg axis1 b64 rows64 x4")
dg_time(64, 64, 2, 4, "dg axis2(minor) b64 rows64 x4")
dg_time(256, 64, 2, 4, "dg axis2(minor) b64 rows256 x4")
dg_time(64, 128, 2, 4, "dg axis2(minor) b128 rows64 x4")
