"""Round-3 probe: locate the recentre kernel's ~20 ms floor.

Rows:
  dispatch    — jnp sum of the raw input (axon round-trip + read baseline)
  prep        — the XLA pad + real/imag + reshape passes, sum-consumed
  copykernel  — pallas kernel that only DMAs blocks in and writes the
                presum-shaped output (no compute): the pipeline floor
  grid/2      — same copy kernel with blk doubled (156 steps): step-count
                sensitivity
Streamed n=8 to dilute per-call overhead.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

sched, ns = 2500, 22004
nfft = 32768
b1 = nfft // _LANE
d, groups = 4, 2

key = jax.random.PRNGKey(1)
raw = jax.lax.complex(
    jax.random.normal(key, (sched, ns), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1), (sched, ns), jnp.float32))


def stream(fn, args, n=8):
    out = fn(*args)
    float(jnp.sum(jnp.abs(out.reshape(-1)[:1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jnp.abs(out.reshape(-1)[:1])))
    return 1000 * (time.perf_counter() - t1) / n


disp = jax.jit(lambda rc: jnp.sum(jnp.abs(rc[:, :1])) * jnp.ones((1, 1)))
print(f"dispatch   : {stream(disp, (raw,)):7.1f} ms", flush=True)


def prep(rc):
    rc_p = jnp.pad(rc, ((0, 0), (0, nfft - ns)))
    xr = jnp.real(rc_p).astype(jnp.float32).reshape(sched, b1, _LANE)
    xi = jnp.imag(rc_p).astype(jnp.float32).reshape(sched, b1, _LANE)
    return xr[:, :1, :1] + xi[:, :1, :1]


print(f"prep       : {stream(jax.jit(prep), (raw,)):7.1f} ms", flush=True)


def copy_kernel(xr, xi, out_r, out_i, *, d, groups):
    for g in range(groups):
        out_r[g] = xr[g * d]
        out_i[g] = xi[g * d]


def run_copy(rc, blk_mult=1):
    dd = d * blk_mult
    blk = dd * groups
    p_pad = -(-sched // blk) * blk
    rc_p = jnp.pad(rc, ((0, p_pad - sched), (0, nfft - ns)))
    xr = jnp.real(rc_p).astype(jnp.float32).reshape(p_pad, b1, _LANE)
    xi = jnp.imag(rc_p).astype(jnp.float32).reshape(p_pad, b1, _LANE)
    n_out = p_pad // dd
    grid = (p_pad // blk,)
    bs_in = pl.BlockSpec((blk, b1, _LANE), lambda i: (i, 0, 0))
    bs_out = pl.BlockSpec((groups, b1, _LANE), lambda i: (i, 0, 0))
    our, oui = pl.pallas_call(
        partial(copy_kernel, d=dd, groups=groups),
        grid=grid,
        in_specs=[bs_in, bs_in],
        out_specs=[bs_out, bs_out],
        out_shape=[jax.ShapeDtypeStruct((n_out, b1, _LANE), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi)
    return our + oui


for bm, tag in ((1, "copykernel "), (2, "copy blk*2 "), (4, "copy blk*4 ")):
    fn = jax.jit(lambda rc, bm=bm: run_copy(rc, bm))
    print(f"{tag}: {stream(fn, (raw,)):7.1f} ms", flush=True)
