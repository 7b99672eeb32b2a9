"""Benchmark: VideoSAR CSA formation rate at 4096x4096 + GMTI latency per CPI.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N, ...}

value        — frames/sec of 4096x4096 CSA image formation (the BASELINE.json
               north-star metric), sustained over a pipelined frame stream on
               the available device(s).
vs_baseline  — speedup over the NumPy reference pipeline (oracle CSA measured
               here on this host; BASELINE target is >=50x, and >=30 fps).

Extra keys: gmti_latency_ms (two-channel 4096^2 CSA + ATI/DPCA/CFAR products,
per-CPI, synchronized each call), numpy_fps, device, batch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    t_proc0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.gmti import ati, cfar, dpca
    from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops

    dev = jax.devices()[0]
    size = int(os.environ.get("BENCH_SIZE", "4096"))
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    fft_impl = os.environ.get("BENCH_FFT", "hybrid")  # profiled fastest on v5e

    from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

    sc = cfg.videosar()
    g, r = sc.geometry, sc.radar
    t0 = window_start_time(g.slant_range_m, None, sc.collect.window_length_s,
                           "centered")
    p = csa_ops.CsaParams(
        wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
        prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
        range_ref_m=g.slant_range_m, t_start_fast=t0,
        num_pulses=size, num_samples=size)

    phases = csa_ops.csa_factors(p)   # fused grid-free path (ops/csa.py)

    @jax.jit
    def make_frames(key):
        return jax.lax.complex(
            jax.random.normal(key, (batch, size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (batch, size, size), jnp.float32))

    # NOTE: phases are passed as jit *arguments* — a jitted function that
    # closes over complex device arrays embeds them as constants, which
    # requires a device->host copy that the axon TPU runtime cannot do.
    @jax.jit
    def form(x, ph):
        y = csa_ops.apply_csa_fused(x, ph, fft_impl)
        return y, jnp.sum(jnp.abs(y[:, 0, :2]))

    frames = make_frames(jax.random.PRNGKey(0))

    # warmup / compile. NOTE: on the axon runtime block_until_ready returns
    # before execution finishes — only a host fetch truly synchronizes, so all
    # timing fences below are scalar float() fetches.
    out, s = form(frames, phases)
    _ = float(s)

    t_start = time.perf_counter()
    x = out
    for _ in range(iters):
        x, s = form(x, phases)
    _ = float(s)   # the iteration chain forces every step to execute
    dt = time.perf_counter() - t_start
    fps = batch * iters / dt

    # ---- GMTI latency per CPI: 2-channel formation + products, synced ----
    # best-effort beyond this point: the headline formation number is already
    # measured, and remote-compile queues can be slow — never lose the line.
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET", "1800"))
    t_elapsed = time.perf_counter() - t_proc0
    cfar_p = cfar.CfarParams(guard=2, train=8)

    @jax.jit
    def gmti_step(x2, ph):
        slc = csa_ops.apply_csa_fused(x2, ph, fft_impl)
        s1, s2 = slc[0], slc[1]
        s2 = ati.apply_balance(s2, ati.channel_balance_phase(s1, s2))
        phase = ati.masked_phase(s1, s2)
        diff = dpca.dpca_difference(s1, s2)
        det = cfar.ca_cfar(jnp.abs(diff) ** 2, cfar_p)
        return jnp.sum(phase[:2, :2]) + jnp.sum(det.snr[:2, :2])

    gmti_ms = None
    try:
        if t_elapsed < budget_s:
            two = frames[:2]
            _ = float(gmti_step(two, phases))
            lat = []
            for _ in range(5):
                t1 = time.perf_counter()
                _ = float(gmti_step(two, phases))
                lat.append(time.perf_counter() - t1)
            gmti_ms = 1000.0 * float(np.median(lat))
    except Exception:
        pass

    # ---- BP VideoSAR frame (512^2 grid, presummed aperture), best-effort ----
    bp_ms = None
    try:
        # BP adds a multi-minute remote compile: only attempt it with at
        # least half the budget left, so the JSON line is never at risk
        if (time.perf_counter() - t_proc0) < 0.5 * budget_s \
                and os.environ.get("BENCH_SKIP_BP", "0") != "1":
            from nis_sar_amtigmti_video_tpu.geometry import orbit
            from nis_sar_amtigmti_video_tpu.models import videosar
            from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops

            scv = cfg.videosar()
            rv, gv = scv.radar, scv.geometry
            sched_pulses = 2500                     # reference CPI
            l_ant = videosar.antenna_length_for_swath(
                scv, scv.processing.bp_scene_size_m)
            opts = videosar.spotlight_echo_opts(scv, l_ant)
            t0b = window_start_time(gv.slant_range_m, opts,
                                    scv.collect.window_length_s, "centered")
            p_bp = videosar.bp_params_for(scv, opts, "f32")
            d_ps = bp_ops.presum_factor(p_bp, rv.prf_hz, rv.wavelength_m,
                                        gv.slant_range_m,
                                        gv.effective_velocity_mps)
            tb = np.linspace(-sched_pulses / rv.prf_hz / 2,
                             sched_pulses / rv.prf_hz / 2, sched_pulses)
            trajb = orbit.make_trajectory(gv, tb)

            @jax.jit
            def mk_bp(key):
                return jax.lax.complex(
                    jax.random.normal(key, (sched_pulses, opts.num_samples),
                                      jnp.float32),
                    jax.random.normal(jax.random.fold_in(key, 1),
                                      (sched_pulses, opts.num_samples),
                                      jnp.float32))

            raw_bp = mk_bp(jax.random.PRNGKey(1))
            # gather-free fast BP (ops/bp_fast.py); the exact path stays
            # available as bp_ops.focus_bp / bp_backend='exact'
            from nis_sar_amtigmti_video_tpu.ops import bp_fast
            plan_bp = bp_fast.make_plan(p_bp, np.asarray(trajb.positions),
                                        np.asarray(trajb.times), float(t0b))
            fbp = jax.jit(lambda x: bp_fast.focus_bp_fast(
                x, trajb.positions, trajb.velocities, trajb.times,
                np.zeros(3), float(t0b), p_bp, presum=d_ps, plan=plan_bp))
            o = fbp(raw_bp)
            _ = float(jnp.sum(jnp.abs(o[:2, :2])))
            lat = []
            for _ in range(2):
                t1 = time.perf_counter()
                o = fbp(raw_bp)
                _ = float(jnp.sum(jnp.abs(o[:2, :2])))
                lat.append(time.perf_counter() - t1)
            bp_ms = 1000.0 * float(np.median(lat))
    except Exception:
        pass

    # ---- NumPy reference baseline (oracle CSA, same shape, 1 rep) ----
    numpy_fps = None
    try:
      if os.environ.get("BENCH_SKIP_NUMPY", "0") != "1":
        import oracle
        rng = np.random.default_rng(0)
        nsz = min(size, 4096)
        raw = (rng.standard_normal((nsz, nsz))
               + 1j * rng.standard_normal((nsz, nsz)))
        t2 = time.perf_counter()
        oracle.focus_csa(raw, p.wavelength_m, p.chirp_rate, p.fs_hz, p.prf_hz,
                         p.velocity_mps, p.range_ref_m, p.t_start_fast)
        numpy_dt = time.perf_counter() - t2
        # CSA cost ~ N^2 log N: scale the measured rate to the bench size so
        # vs_baseline stays a same-work comparison when BENCH_SIZE > 4096
        work = (size * size * np.log2(size)) / (nsz * nsz * np.log2(nsz))
        numpy_fps = (1.0 / numpy_dt) / work
    except Exception:
        pass

    result = {
        "metric": f"videosar_csa_{size}x{size}_formation",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / numpy_fps, 2) if numpy_fps else None,
        "gmti_latency_ms": round(gmti_ms, 2) if gmti_ms else None,
        "bp_frame_ms": round(bp_ms, 1) if bp_ms else None,
        "numpy_fps": round(numpy_fps, 4) if numpy_fps else None,
        "device": str(dev),
        "batch": batch,
        "iters": iters,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
