"""Slope test: in-kernel matmul rate isolated from overhead/DMA.

Chains nmat matmuls inside one kernel on VMEM-resident data; rate comes
from the time difference between nmat=2 and nmat=8 (DMA and launch costs
cancel).
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

iters = int(os.environ.get("ITERS", "20"))
print("device:", jax.devices()[0])


def t_of(nmat, dtype, m, k, rows_blocks=8):
    """rows_blocks blocks of (m, k) @ (k, k), nmat chained dots each."""
    def body(wref, xref, oref):
        z = xref[:]
        w = wref[:]
        for _ in range(nmat):
            z = jnp.dot(z, w,
                        preferred_element_type=jnp.float32).astype(dtype)
        oref[:] = z

    def call(w, x):
        return pl.pallas_call(
            body,
            grid=(rows_blocks,),
            in_specs=[pl.BlockSpec((k, k), lambda j: (0, 0)),
                      pl.BlockSpec((m, k), lambda j: (j, 0))],
            out_specs=pl.BlockSpec((m, k), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((rows_blocks * m, k), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, x)

    w = (jnp.eye(k, dtype=jnp.float32) * 1.0001).astype(dtype)
    x = jnp.ones((rows_blocks * m, k), dtype)

    def run(xx):
        def bd(c, _):
            return (call(w, c[0]),), 0.0
        c, _ = jax.lax.scan(bd, (xx,), None, length=iters)
        return jnp.sum(c[0].ravel()[:1].astype(jnp.float32))

    run = jax.jit(run)
    _ = float(run(x))
    best = 1e9
    for _rep in range(3):
        t1 = time.perf_counter()
        _ = float(run(x))
        best = min(best, (time.perf_counter() - t1) / iters)
    return best


for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
    for (m, k) in ((4096, 128), (2048, 512), (1024, 1024)):
        t2 = t_of(2, dtype, m, k)
        t8 = t_of(8, dtype, m, k)
        fl = 2.0 * 8 * m * k * k * 6          # 6 extra matmuls, 8 blocks
        rate = fl / (t8 - t2) / 1e12
        print(f"{name} ({m},{k})@({k},{k}): t2={1e3*t2:.3f} t8={1e3*t8:.3f} "
              f"ms -> {rate:.1f} TF/s marginal")
