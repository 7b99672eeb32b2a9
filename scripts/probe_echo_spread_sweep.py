"""Round-3 probe: dense-spreader group sizing sweep at full ATI scale.

The (pc, grp, B/grp, win) one-hot is the dense path's HBM bill; sorted
scenes let groups shrink (span ~ total_cells/grp) until win - K is
approached, cutting that bill linearly. Each row times a full channel pass
(7,200 x 13,200, 5,035 targets) and checks field equality vs the default
sizing — a too-small win silently DROPS out-of-window targets, so equality
is the adoption gate, not just time.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops import echo_freq
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

P, B = 7200, 5035
sc = cfg.ati_dpca()
rs, gs, cs = sc.radar, sc.geometry, sc.collect
opts0 = echo_opts_for(sc)
opts = dataclasses.replace(opts0, backend="freq", endpoint_grid=False)
t0 = window_start_time(gs.slant_range_m, opts, cs.window_length_s,
                       "centered")

rng = np.random.default_rng(0)
tau_c = np.sort(rng.uniform(2e-6, 20e-6, B))
walk = 8e-8 * np.sin(np.linspace(0, 2.5, P))[:, None]
tau = jnp.asarray(tau_c[None, :] + walk - float(t0) * 0.0)
car = jnp.asarray(rng.uniform(-np.pi, np.pi, (P, B)).astype(np.float32))
amp = jnp.asarray(rng.uniform(0.5, 2.0, (P, B)).astype(np.float32))


def run(win, grp, spreader="dense"):
    fn = jax.jit(lambda t, c, a: echo_freq.synthesize(
        t, c, a, opts, spreader=spreader, spread_win=win, spread_grp=grp))
    out = fn(tau, car, amp)
    float(jnp.sum(jnp.abs(jnp.real(out[:1, :1]))))
    t1 = time.perf_counter()
    out = fn(tau, car, amp)
    float(jnp.sum(jnp.abs(jnp.real(out[:1, :1]))))
    dt = time.perf_counter() - t1
    mag = jnp.sqrt(jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2))
    return dt, out, float(mag)


t_ref, out_ref, m_ref = run(None, None)          # committed defaults
print(f"win=4096 grp= 16 : {t_ref:6.2f} s  (anchor, |out|={m_ref:.6g})",
      flush=True)
for win, grp in ((2048, 32), (1024, 64), (512, 128), (1024, 32)):
    t, out, m = run(win, grp)
    d = jax.jit(lambda a, b: jnp.max(jnp.abs(jnp.real(a) - jnp.real(b)))
                + jnp.max(jnp.abs(jnp.imag(a) - jnp.imag(b))))(out, out_ref)
    rel = float(d) / max(m_ref / (P * 13200) ** 0.5, 1e-30)
    print(f"win={win:4d} grp={grp:3d} : {t:6.2f} s  max-abs-err "
          f"{float(d):.3e} (vs rms {rel:.2e})", flush=True)

# VMEM one-hot kernel (ops/pallas/spread_kernel.py) at the same sizings —
# equality-gated against the XLA dense anchor like every sweep row
for win, grp in ((None, None), (2048, 32), (1024, 64), (512, 128)):
    try:
        t, out, m = run(win, grp, spreader="dense_kernel")
    except Exception as e:  # Mosaic compile failure must not kill the sweep
        print(f"KERNEL win={win} grp={grp}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue
    d = jax.jit(lambda a, b: jnp.max(jnp.abs(jnp.real(a) - jnp.real(b)))
                + jnp.max(jnp.abs(jnp.imag(a) - jnp.imag(b))))(out, out_ref)
    rel = float(d) / max(m_ref / (P * 13200) ** 0.5, 1e-30)
    wtxt = win or 4096
    gtxt = grp or 16
    print(f"KERNEL win={wtxt:4d} grp={gtxt:3d} : {t:6.2f} s  max-abs-err "
          f"{float(d):.3e} (vs rms {rel:.2e})", flush=True)
