"""TPU A/B: freq_geom_interp='split' vs 'f64' on the full-scale ATI scene.

Context (scripts/probe_geom_interp stride sweep, 2026-08-19): the anchored
geometry's cost is FLAT in freq_geom_stride (0.42 s at stride 8..64 with a
tiny synthesize) -- the bill is the (P, B) emulated-f64 interpolation +
carrier wrap, not the anchor pass. 'split' moves exactly that work to f32
(ops/echo.py). Chained-stream protocol, one sync per timed block.
"""
import sys, time, dataclasses
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import numpy as np
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops import echo as echo_mod
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.scene import targets as T_
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field
print(jax.devices())
P = 7200
sc = cfg.ati_dpca()
rs, gs, cs = sc.radar, sc.geometry, sc.collect
ship = T_.destroyer().rotate_z(90.0)
clut = ocean_clutter_field(np.random.default_rng(0))
scene = T_.PointTargets.concatenate([ship, clut])
traj = orbit.make_trajectory(gs, orbit.slow_time_grid(cs.integration_time_s, P))

def sync(x):
    return float(jnp.sum(jnp.abs(x[:1, :1])))

def run(tag, ns, interp):
    o = dataclasses.replace(echo_opts_for(sc), backend="freq",
                            endpoint_grid=False, freq_geom_interp=interp,
                            freq_edge_taper=0.0 if ns < 1000 else 4.0,
                            num_samples=ns)
    t0g = window_start_time(gs.slant_range_m, o, ns / o.fs_hz, "centered")
    fn = lambda: echo_mod.phase_history(traj, scene, o, t_start=t0g)
    out = fn(); sync(out)
    t1 = time.perf_counter()
    out = fn(); sync(out)
    print(f"{tag}: {time.perf_counter() - t1:6.3f} s", flush=True)
    from nis_sar_amtigmti_video_tpu.utils import cplx
    return cplx.to_host(out[:4, :256])

for rep in range(2):
    a = run(f"geom-only f64  ", 256, "f64")
    b = run(f"geom-only split", 256, "split")
    print("  tiny-field rel diff:",
          float(np.abs(b - a).max() / (np.abs(a).max() + 1e-30)), flush=True)
# full-scale pass A/B (the bench's sim metric protocol)
run("full f64  ", 13200, "f64")
run("full split", 13200, "split")
run("full f64  b", 13200, "f64")
run("full split b", 13200, "split")
