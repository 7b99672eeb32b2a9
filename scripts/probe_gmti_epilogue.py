"""TPU: A/B the GMTI epilogue's lane-direction CFAR box sums.

The kernel-fused CPI leaves two cross-tile stages in XLA; the epilogue
(5.3 ms standalone of the 16.5 ms CPI) is dominated by the two
reduce_window box sums over the K3g column-sum planes. Candidates:

  rw    — jax.lax.reduce_window (the committed form)
  shift — O(log k) doubling shifted adds (pad + static slices)
  cum   — cumulative-sum difference (one scan + one shifted subtract;
          ~k*eps relative error from the cancellation)

Each timed as a donated chained stream (8 iters, one sync); equality
reported vs rw.
"""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

size = 4096
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (size, size), jnp.float32)


def hbox_rw(v, half):
    k = 2 * half + 1
    return jax.lax.reduce_window(v, jnp.zeros((), v.dtype), jax.lax.add,
                                 (1, k), (1, 1), [(0, 0), (half, half)])


def hbox_shift(v, half):
    # binary window decomposition: pyramid of power-of-two run sums, then
    # one add per set bit of k at its offset (no overlap, exact integers)
    k = 2 * half + 1
    p = jnp.pad(v, ((0, 0), (half, half)))
    run = 1
    pyr = {1: p}
    while run * 2 <= k:
        p = p[:, :-run] + p[:, run:]
        run *= 2
        pyr[run] = p
    out = None
    off = 0
    for run in sorted(pyr, reverse=True):
        if k & run:
            seg = pyr[run][:, off:off + v.shape[1]]
            out = seg if out is None else out + seg
            off += run
    return out


def hbox_cum(v, half):
    cs = jnp.cumsum(v, axis=1)
    up = jnp.concatenate([cs[:, half:], jnp.broadcast_to(
        cs[:, -1:], (v.shape[0], half))], axis=1)
    lo = jnp.concatenate([jnp.zeros((v.shape[0], half + 1), v.dtype),
                          cs[:, :-half - 1]], axis=1)
    return up - lo


def mk(fn):
    def ep(cso, csi, power):
        outer = fn(cso, 10)
        inner = fn(csi, 2)
        noise = (outer - inner) * (1.0 / 17.0)
        snr = power / jnp.maximum(noise, 1e-30)
        # chain: keep every output live
        return (cso + 1e-30 * snr, csi + 1e-30 * outer, power + 1e-30 * inner)
    return ep


ref = None
for name, fn in (("rw", hbox_rw), ("shift", hbox_shift), ("cum", hbox_cum)):
    o = hbox_rw(x, 10) if ref is None else ref
    ref = o
    got = fn(x, 10)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    ep = jax.jit(mk(fn), donate_argnums=(0, 1, 2))
    args = tuple(jnp.asarray(np.asarray(v)) for v in (x, x, x))
    out = ep(*args); jax.block_until_ready(out)
    t1 = time.perf_counter()
    for _ in range(8):
        out = ep(*out)
    jax.block_until_ready(out)
    ms = 1000.0 * (time.perf_counter() - t1) / 8
    print(f"{name:6s} epilogue: {ms:6.2f} ms   hbox rel-err {err:.2e}",
          flush=True)
