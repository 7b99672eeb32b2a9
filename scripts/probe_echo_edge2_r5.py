"""TPU: edge-pass levers on the production echo path (round-5 item 2).

probe_echo_edge_r5: the exact-edge pass is 0.29 s of the 0.71 s channel
pass. Levers probed here, each with an equality/fidelity delta vs the
shipped configuration on the SAME scalars:

  edge_win   spread_win_edge 2048 -> 1024/512 (the edge one-hot bill
             scales with it; must be equality-exact — a too-small
             window silently drops flank corrections)
  taper 2    edge_taper 4 -> 2 (4 instead of 6 exact taps per flank,
             narrower raised-cosine -> field-level fidelity delta;
             gate against the full-default output)
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops import echo_freq
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

P, B = 7200, 5035
sc = cfg.ati_dpca()
opts = dataclasses.replace(echo_opts_for(sc), backend="freq",
                           endpoint_grid=False)
print("device:", jax.devices()[0])

rng = np.random.default_rng(0)
tau_c = np.sort(rng.uniform(2e-6, 20e-6, B))
walk = 8e-8 * np.sin(np.linspace(0, 2.5, P))[:, None]
tau = jnp.asarray(tau_c[None, :] + walk)
car = jnp.asarray(rng.uniform(-np.pi, np.pi, (P, B)).astype(np.float32))
amp = jnp.asarray(rng.uniform(0.5, 2.0, (P, B)).astype(np.float32))


def sync(x):
    return float(jnp.sum(jnp.abs(x[:1, :1])))


def stream(fn, args, n=3):
    out = fn(*args)
    sync(out)
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t1) / n, out


mdiff = jax.jit(lambda a, b: jnp.max(jnp.abs(jnp.real(a) - jnp.real(b)))
                + jnp.max(jnp.abs(jnp.imag(a) - jnp.imag(b))))
rms_j = jax.jit(lambda a: jnp.sqrt(jnp.mean(jnp.real(a) ** 2
                                            + jnp.imag(a) ** 2)))

ref = None
for tag, kw in (("shipped (we=2048, taper4)", {}),
                ("edge_win 1024            ", {"spread_win_edge": 1024}),
                ("edge_win  512            ", {"spread_win_edge": 512}),
                ("taper 2                  ", {"edge_taper": 2.0}),
                ("taper 2 + edge_win 1024  ", {"edge_taper": 2.0,
                                               "spread_win_edge": 1024})):
    try:
        fn = jax.jit(lambda t, c, a, kw=kw: echo_freq.synthesize(
            t, c, a, opts, spreader="dense_kernel", conv="pallas", **kw))
        dt, out = stream(fn, (tau, car, amp))
        if ref is None:
            ref = out
            rms = float(rms_j(ref))
            print(f"{tag}: {dt:6.2f} s  (anchor, rms={rms:.4g})",
                  flush=True)
        else:
            d = float(mdiff(out, ref))
            print(f"{tag}: {dt:6.2f} s  max-abs-err {d:.3e} "
                  f"({d / rms:.2e} of rms)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


# -- follow-up: grp-compensated edge windows. There is no separate edge
# group knob (spread_grp drives both passes), and the one-hot bill is
# B*win per pass regardless of grp — so doubling grp tightens each
# group's delay span at the same bill (placement rows grow; measure).
for tag, kw in (("edge_win 1024 EDGEgrp 32 ", {"spread_win_edge": 1024,
                                               "spread_grp_edge": 32}),
                ("edge_win 1024 EDGEgrp 64 ", {"spread_win_edge": 1024,
                                               "spread_grp_edge": 64}),
                ("edge_win  512 EDGEgrp 64 ", {"spread_win_edge": 512,
                                               "spread_grp_edge": 64})):
    try:
        fn = jax.jit(lambda t, c, a, kw=kw: echo_freq.synthesize(
            t, c, a, opts, spreader="dense_kernel", conv="pallas", **kw))
        dt, out = stream(fn, (tau, car, amp))
        d = float(mdiff(out, ref))
        print(f"{tag}: {dt:6.2f} s  max-abs-err {d:.3e} "
              f"({d / rms:.2e} of rms)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
