"""Round-3 probe: stage split of the dense-spreader echo pass on TPU.

Times, at the reference ATI scale: the f64 geometry pass, the main dense
spread, the edge-exact pass, and the FFT convolution — each streamed.
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
# synthetic delay-sorted scalars with realistic spread + walk
tau_c = np.sort(rng.uniform(2e-6, 20e-6, B))
walk = 8e-8 * np.sin(np.linspace(0, 2.5, P))[:, None]
tau = jnp.asarray((tau_c[None, :] + walk))
car = jnp.asarray(rng.uniform(-np.pi, np.pi, (P, B)).astype(np.float32))
amp = jnp.asarray(rng.uniform(0.5, 2.0, (P, B)).astype(np.float32))


def sync(x):
    return float(jnp.sum(jnp.abs(x[:1, :1])))


def stream(fn, args, n=2):
    out = fn(*args)
    sync(out)
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t1) / n


for tag, et, spreader, conv in (
        ("dense full      ", 4.0, "dense", "xla"),
        ("dense no-edge   ", 0.0, "dense", "xla"),
        ("scatter no-edge ", 0.0, "scatter", "xla"),
        ("kernel full     ", 4.0, "dense_kernel", "xla"),
        ("dense conv-fused", 4.0, "dense", "pallas"),
        ("kernel+conv     ", 4.0, "dense_kernel", "pallas"),
        ("kernel+conv m=2K", 4.0, "dense_kernel", "pallas"),
        ("kernel+conv qr  ", 4.0, "dense_kernel_qr", "pallas")):
    from nis_sar_amtigmti_video_tpu.ops.pallas import spread_kernel
    spread_kernel._M_STACK = "m=2K" not in tag
    try:
        fn = jax.jit(lambda t, c, a, et=et, sp=spreader, cv=conv:
                     echo_freq.synthesize(t, c, a, opts, edge_taper=et,
                                          spreader=sp, conv=cv))
        print(f"{tag}: {stream(fn, (tau, car, amp)):7.2f} s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

# geometry-only pass (what the echo engine spends before synthesize)
from nis_sar_amtigmti_video_tpu.ops import echo as echo_mod
from nis_sar_amtigmti_video_tpu.scene import targets as T_
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field

ship = T_.destroyer().rotate_z(90.0)
clut = ocean_clutter_field(np.random.default_rng(0))
scene = T_.PointTargets.concatenate([ship, clut])
traj = orbit.make_trajectory(gs, orbit.slow_time_grid(cs.integration_time_s,
                                                      P))
o_geom = dataclasses.replace(opts, freq_edge_taper=0.0, num_samples=256)
# num_samples only affects synthesize, not geometry; time the full call at
# tiny Ns so geometry dominates
t0g = window_start_time(gs.slant_range_m, o_geom, 256 / o_geom.fs_hz,
                        "centered")
fn_g = lambda: echo_mod.phase_history(traj, scene, o_geom, t_start=t0g)
out = fn_g()
sync(out)
t1 = time.perf_counter()
out = fn_g()
sync(out)
print(f"geometry(+tiny synth): {time.perf_counter() - t1:7.2f} s", flush=True)
