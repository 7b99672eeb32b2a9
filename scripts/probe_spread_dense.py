"""Round-3 probe: dense (one-hot matmul) NUFFT spreading vs scatter-add.

The 'freq' echo backend is bound by the TPU scatter wall (~24 ns/update,
ROUND2_NOTES 11/14). This probe times the bucketed-dense alternative on
synthetic spreading workloads at the reference ATI scale:

  sort targets by delay once -> groups of consecutive sorted targets ->
  per (pulse, group): one-hot(targets, window) built from integer cells,
  (K-taps x targets) @ one-hot on the MXU, tap shifts as lane rolls,
  accumulated at the group's window offset.

Run alone on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

P, B, W = 7200, 5035, 8          # pulses, targets, spreading taps
L_IMP = 50560                    # impulse grid length (os=2 reference class)
WIN = 4096                       # per-group window (cells)
GRP = 16                         # groups of consecutive sorted targets

rng = np.random.default_rng(0)
# synthetic delays: uniform over most of the grid + slow per-pulse walk
base_cell = np.sort(rng.uniform(2000, L_IMP - 6000, B))
walk = 200.0 * np.sin(np.linspace(0, 2, P))[:, None]
cells = jnp.asarray((base_cell[None, :] + walk).astype(np.float64))
vals = jnp.asarray(rng.standard_normal((P, B)).astype(np.float32)
                   + 1j * rng.standard_normal((P, B)).astype(np.float32))


def sync(x):
    return float(jnp.sum(jnp.abs(x[:1, :1])))


def stream(fn, args, n=3):
    out = fn(*args)
    sync(out)
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t1) / n


def weights(cells):
    i0 = jnp.floor(cells).astype(jnp.int32) - (W // 2 - 1)
    frac = (cells - jnp.floor(cells)).astype(jnp.float32)
    offs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    u = (offs - (W // 2 - 1)) - frac[:, :, None]
    z2 = jnp.clip(1.0 - (2.0 * u / W) ** 2, 0.0, 1.0)
    w = jnp.where(jnp.abs(u) < W / 2,
                  jnp.exp(18.4 * (jnp.sqrt(z2) - 1.0)), 0.0)
    return i0, w                                  # (P,B) i32, (P,B,W) f32


@jax.jit
def spread_scatter(cells, vals):
    i0, w = weights(cells)
    rows = jnp.arange(P, dtype=jnp.int32)[:, None, None]
    pos = i0[:, :, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    ok = (pos >= 0) & (pos < L_IMP)
    pos = jnp.clip(pos, 0, L_IMP - 1)
    wv = jnp.where(ok, w, 0.0)
    flat = (jnp.broadcast_to(rows, pos.shape).reshape(-1) * L_IMP
            + pos.reshape(-1))
    fr = jnp.zeros((P * L_IMP,), jnp.float32).at[flat].add(
        (wv * jnp.real(vals)[:, :, None]).reshape(-1))
    fi = jnp.zeros((P * L_IMP,), jnp.float32).at[flat].add(
        (wv * jnp.imag(vals)[:, :, None]).reshape(-1))
    return jax.lax.complex(fr, fi).reshape(P, L_IMP)


BG = -(-B // GRP)                 # targets per group (sorted order)
B_PAD = BG * GRP


@jax.jit
def spread_dense(cells, vals):
    i0, w = weights(cells)
    i0 = jnp.pad(i0, ((0, 0), (0, B_PAD - B)), constant_values=-(10 ** 6))
    w = jnp.pad(w, ((0, 0), (0, B_PAD - B), (0, 0)))
    vr = jnp.pad(jnp.real(vals), ((0, 0), (0, B_PAD - B)))
    vi = jnp.pad(jnp.imag(vals), ((0, 0), (0, B_PAD - B)))
    i0g = i0.reshape(P, GRP, BG)
    # group window base: 128-aligned, clipped into the grid
    base = jnp.min(jnp.where(i0g < -(10 ** 5), 10 ** 6, i0g), axis=2) - 64
    base = jnp.clip((base // 128) * 128, 0, L_IMP - WIN)      # (P, GRP)

    wg = w.reshape(P, GRP, BG, W)
    vrg = (vr.reshape(P, GRP, BG, 1) * wg)                    # (P,G,BG,W)
    vig = (vi.reshape(P, GRP, BG, 1) * wg)
    c_rel = i0g - base[:, :, None]                            # (P,G,BG)
    iota = jnp.arange(WIN, dtype=jnp.int32)

    def one_pulse(args):
        c_rel_p, vr_p, vi_p = args                            # (G,BG,...)
        onehot = (c_rel_p[:, :, None] == iota[None, None, :]
                  ).astype(jnp.bfloat16)                      # (G,BG,WIN)

        def dotk(vk):                                         # (G,BG,W)
            vt = jnp.swapaxes(vk, 1, 2).astype(jnp.bfloat16)  # (G,W,BG)
            return jax.lax.dot_general(
                vt, onehot, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (G,W,WIN)

        pr = dotk(vr_p)
        pi_ = dotk(vi_p)
        # tap shifts: roll partial k by +k along the window axis
        out_r = jnp.zeros((GRP, WIN), jnp.float32)
        out_i = jnp.zeros((GRP, WIN), jnp.float32)
        for k in range(W):
            out_r = out_r + jnp.roll(pr[:, k], k, axis=-1)
            out_i = out_i + jnp.roll(pi_[:, k], k, axis=-1)
        return out_r, out_i

    out_r, out_i = jax.lax.map(one_pulse, (c_rel, vrg, vig),
                               batch_size=64)
    # place group windows into the full grid (per pulse: G dynamic adds)
    seg = jnp.zeros((P, L_IMP), jnp.float32)

    def place(fld, og, bases):
        def body(g, f):
            upd = jax.lax.dynamic_slice(
                jnp.pad(og[g], (0, 0)), (0,), (WIN,))
            cur = jax.lax.dynamic_slice(f, (bases[g],), (WIN,))
            return jax.lax.dynamic_update_slice(f, cur + upd, (bases[g],))
        return jax.lax.fori_loop(0, GRP, body, fld)

    fr = jax.vmap(place)(seg, out_r, base)
    fi = jax.vmap(place)(seg, out_i, base)
    return jax.lax.complex(fr, fi)


t_sc = stream(spread_scatter, (cells, vals))
print(f"scatter : {t_sc:7.3f} s", flush=True)
t_dn = stream(spread_dense, (cells, vals))
print(f"dense   : {t_dn:7.3f} s", flush=True)

a = spread_scatter(cells, vals)
b = spread_dense(cells, vals)
err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
print(f"max rel err: {err:.2e}", flush=True)
