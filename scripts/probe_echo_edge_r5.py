"""TPU: edge-exact pass share on the PRODUCTION echo path (round-5 item
2 follow-up: e2e 1.71 s vs the 1.2 s collect-real-time stretch).

probe_echo_dense_stages showed the edge pass costs ~0.76 s/channel on
the XLA-dense path (2.05 vs 1.29 s). This isolates it on the shipped
kernel+conv path, plus the oversample=1 ladder (the conv/spread grid is
os*fs; os=1 would halve the spread/conv bill but needs a fidelity gate).
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
rs, gs, cs = sc.radar, sc.geometry, sc.collect
opts0 = echo_opts_for(sc)
opts = dataclasses.replace(opts0, backend="freq", endpoint_grid=False)
t0 = window_start_time(gs.slant_range_m, opts, cs.window_length_s,
                       "centered")
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
    return (time.perf_counter() - t1) / n


for tag, et, os_ in (("kernel+conv full  os2", 4.0, 2),
                     ("kernel+conv NOEDGE os2", 0.0, 2),
                     ("kernel+conv full  os1", 4.0, 1)):
    try:
        fn = jax.jit(lambda t, c, a, et=et, os_=os_: echo_freq.synthesize(
            t, c, a, opts, oversample=os_, edge_taper=et,
            spreader="dense_kernel", conv="pallas"))
        print(f"{tag}: {stream(fn, (tau, car, amp)):7.2f} s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
