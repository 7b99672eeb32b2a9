"""Benchmark: GMTI-inclusive VideoSAR throughput at 4096x4096 (the north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N, ...}

value        — frames/sec of the COMPLETE per-CPI GMTI pipeline: two-channel
               4096^2 CSA formation with channel balance + ATI phase + DPCA
               magnitude + CA-CFAR fused into the K3 megakernel's output
               pass (gmti/fused.py::gmti_cpi_pallas +
               ops/pallas/gmti_kernel.py; every product plane is
               materialized and consumed), measured as a chained stream
               with ONE final sync — the streaming protocol amortizes the
               axon tunnel's ~33 ms host-fetch RTT, which is transport
               latency, not chip work (docs/ROUND2_NOTES.md).
vs_baseline  — speedup over the NumPy reference doing the same GMTI step
               (2x oracle CSA + numpy products on this host).

Extra keys: csa_formation_fps (single-channel formation-only stream, the
round-1 headline), bp_frame_ms (gather-free fast BP at the reference
512^2 x 2,500-pulse VideoSAR scale), numpy_gmti_fps, device.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Pin the BLAS/FFT thread pool BEFORE numpy loads so the NumPy-baseline
# denominator is reproducible across hosts/runs (the round-3 verdict found
# a ~3x host-contention swing). A fixed count, capped by the machine.
_NP_THREADS = str(min(8, os.cpu_count() or 8))
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
    os.environ.setdefault(_v, _NP_THREADS)

import numpy as np


def main():
    t_proc0 = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET", "1800"))

    import jax
    import jax.numpy as jnp

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.gmti import cfar
    from nis_sar_amtigmti_video_tpu.gmti.fused import gmti_product_step
    from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
    from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
    from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel

    # the axon pool can be unreachable, and it HANGS device init inside a
    # C call rather than failing (SIGALRM never fires). Probe in a bounded
    # subprocess first so the driver gets an honest error line instead of
    # a silent hang past its own timeout.
    import subprocess
    plat = jax.config.jax_platforms or ""
    if "cpu" in plat:
        dev_ok = True          # explicitly CPU-pinned (smoke runs): no pool
    else:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0])"],
                timeout=int(os.environ.get("BENCH_DEV_TIMEOUT", "600")),
                capture_output=True)
            dev_ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            dev_ok = False
    if not dev_ok:
        print(json.dumps({
            "metric": "videosar_gmti_stream", "value": 0.0,
            "unit": "frames/sec", "vs_baseline": None,
            "error": "tpu_unavailable: device acquisition timed out "
                     "(axon pool unreachable)"}))
        return
    dev = jax.devices()[0]
    size = int(os.environ.get("BENCH_SIZE", "4096"))
    ncpi = int(os.environ.get("BENCH_NCPI", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    fft_impl = os.environ.get("BENCH_FFT", "pallas")   # fastest measured
    if fft_impl == "pallas" and (not csa_kernel.supported(size, size)
                                 or jax.default_backend() != "tpu"):
        fft_impl = "hybrid"

    sc = cfg.videosar()
    g, r = sc.geometry, sc.radar
    t0 = window_start_time(g.slant_range_m, None, sc.collect.window_length_s,
                           "centered")
    p = csa_ops.CsaParams(
        wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
        prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
        range_ref_m=g.slant_range_m, t_start_fast=t0,
        num_pulses=size, num_samples=size)
    f = csa_ops.csa_factors(p)
    cfar_p = cfar.CfarParams(guard=2, train=8)

    # NOTE (axon runtime): block_until_ready does not block — only a host
    # scalar fetch synchronizes, and each fetch costs a ~33 ms tunnel RTT.
    # All loops below chain device-resident state and sync ONCE at the end.

    @jax.jit
    def mk(key):
        return (jax.random.normal(key, (ncpi, 2, size, size), jnp.float32),
                jax.random.normal(jax.random.fold_in(key, 1),
                                  (ncpi, 2, size, size), jnp.float32))

    def form(xr, xi):
        if fft_impl == "pallas":
            sr, si = csa_kernel.apply_csa_pallas_planes(
                xr.reshape(-1, size, size), xi.reshape(-1, size, size), f)
            return (sr.reshape(ncpi, 2, size, size),
                    si.reshape(ncpi, 2, size, size))
        slc = csa_ops.apply_csa_fused(
            jax.lax.complex(xr, xi).reshape(-1, size, size), f, fft_impl)
        return (jnp.real(slc).reshape(ncpi, 2, size, size),
                jnp.imag(slc).reshape(ncpi, 2, size, size))

    kernel_path = (fft_impl == "pallas"
                   and os.environ.get("BENCH_GMTI_KERNEL", "1") == "1")
    if kernel_path:
        # round-3 production path: GMTI products fused into the CSA K3
        # output pass (ops/pallas/gmti_kernel.py). ALL product planes are
        # materialized by the kernel (no DCE possible inside pallas), and
        # the full-plane sums below consume the XLA epilogue honestly.
        from nis_sar_amtigmti_video_tpu.gmti.fused import gmti_cpi_pallas

        # k2='dots' loses standalone (8.5 vs 8.1 ms) but wins the full
        # CPI (16.7 vs 17.3 ms measured) — adopted as the GMTI default
        k2_var = os.environ.get("BENCH_K2", "dots")
        lead_var = os.environ.get("BENCH_LEAD", "swap")

        def gmti_one(x1r, x1i, x2r, x2i):
            s1r, s1i, s2r, s2i, cal, phase, dmag, det = gmti_cpi_pallas(
                x1r, x1i, x2r, x2i, f, cfar_params=cfar_p,
                k2_variant=k2_var, lead_variant=lead_var,
                balance_impl=os.environ.get("BENCH_BAL", "pallas"))
            summary = (jnp.sum(phase) + jnp.sum(dmag) + jnp.sum(det.snr)
                       + cal)
            return s1r, s1i, s2r, s2i, summary

        gmti_fn1 = jax.jit(gmti_one, donate_argnums=(0, 1, 2, 3))
        key0 = jax.random.PRNGKey(0)
        out = gmti_fn1(*(jax.random.normal(jax.random.fold_in(key0, i),
                                           (size, size), jnp.float32)
                         for i in range(4)))
        _ = float(out[4])                          # compile + first run
        iters_k = 2 * iters * max(1, ncpi // 2)    # match dispatch count
        t1 = time.perf_counter()
        for _i in range(iters_k):
            out = gmti_fn1(out[0], out[1], out[2], out[3])
        _ = float(out[4])
        gmti_ms = 1000.0 * (time.perf_counter() - t1) / iters_k
    else:
        def gmti_batch(xr, xi):
            sr, si = form(xr, xi)
            slc = jax.lax.complex(sr, si)

            def prods(s):
                _, phase, dmag, det = gmti_product_step(s[0], s[1],
                                                        cfar_params=cfar_p)
                return phase, dmag, det.snr

            ph, dm, snr = jax.vmap(prods)(slc)
            return sr, si, jnp.sum(ph) + jnp.sum(dm) + jnp.sum(snr)

        gmti_fn = jax.jit(gmti_batch, donate_argnums=(0, 1))
        xr, xi = mk(jax.random.PRNGKey(0))
        xr, xi, s = gmti_fn(xr, xi)
        _ = float(s)                               # compile + first run
        t1 = time.perf_counter()
        for _i in range(iters):
            xr, xi, s = gmti_fn(xr, xi)
        _ = float(s)
        gmti_ms = 1000.0 * (time.perf_counter() - t1) / (iters * ncpi)
    gmti_fps = 1000.0 / gmti_ms

    # ---- single-channel formation-only stream (the round-1 metric) ----
    if kernel_path:
        xr, xi = mk(jax.random.PRNGKey(0))
    form_fps = None
    try:
        def form_only(xr_, xi_):
            sr, si = form(xr_, xi_)
            return sr, si, jnp.sum(jnp.abs(sr[:, :, :1, :1]))

        form_fn = jax.jit(form_only, donate_argnums=(0, 1))
        xr, xi, s = form_fn(xr, xi)
        _ = float(s)
        t1 = time.perf_counter()
        for _i in range(iters):
            xr, xi, s = form_fn(xr, xi)
        _ = float(s)
        form_fps = (2 * ncpi * iters) / (time.perf_counter() - t1)
    except Exception:
        pass

    # ---- single-pass-bf16 formation stream (accuracy class ~2.6e-3 —
    # what a raw Mosaic f32 dot silently gives; labeled separately) ----
    form_bf16_fps = None
    try:
        if fft_impl == "pallas":
            def form_bf16(xr_, xi_):
                sr, si = csa_kernel.apply_csa_pallas_planes(
                    xr_.reshape(-1, size, size), xi_.reshape(-1, size, size),
                    f, mode="bf16")
                return (sr.reshape(ncpi, 2, size, size),
                        si.reshape(ncpi, 2, size, size),
                        jnp.sum(jnp.abs(sr[:1, :1, :1])))

            fb16 = jax.jit(form_bf16, donate_argnums=(0, 1))
            xr, xi, s = fb16(xr, xi)
            _ = float(s)
            t1 = time.perf_counter()
            for _i in range(iters):
                xr, xi, s = fb16(xr, xi)
            _ = float(s)
            form_bf16_fps = (2 * ncpi * iters) / (time.perf_counter() - t1)
    except Exception:
        pass

    # ---- gather-free fast BP at reference VideoSAR scale, best-effort ----
    bp_ms = None
    try:
        if (time.perf_counter() - t_proc0) < 0.6 * budget_s \
                and os.environ.get("BENCH_SKIP_BP", "0") != "1":
            from nis_sar_amtigmti_video_tpu.geometry import orbit
            from nis_sar_amtigmti_video_tpu.models import videosar
            from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
            from nis_sar_amtigmti_video_tpu.ops import bp_fast

            scv = cfg.videosar()
            rv, gv = scv.radar, scv.geometry
            sched_pulses = 2500
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
            # round-3 production path: factorized (sub-aperture) accumulate
            # + pallas recentre kernel + anchored fit, measured as a chained
            # stream (one sync per chain) like the GMTI headline
            plan_bp = bp_fast.make_plan(p_bp, np.asarray(trajb.positions),
                                        np.asarray(trajb.times), float(t0b),
                                        factorize=True)
            bp_acc = os.environ.get("BENCH_BP_ACC", "")
            if bp_acc and bp_acc not in ("xla", "factor", "factor_pallas",
                                         "factor_kernel", "factor2",
                                         "factor2_pallas"):
                raise ValueError(f"BENCH_BP_ACC={bp_acc!r}: pick one of "
                                 "xla|factor|factor_pallas|factor_kernel|"
                                 "factor2|factor2_pallas "
                                 "(the w_win=32 factorize plan)")
            if not bp_acc:
                # two-level factorization where the plan supports it
                # (36.0 vs 39.2 ms/frame measured, docs/ROUND3_NOTES.md)
                if jax.default_backend() == "tpu" and plan_bp.sub_raw > 0:
                    bp_acc = ("factor2_pallas" if plan_bp.sub_raw1 > 0
                              else "factor_pallas")
                else:
                    bp_acc = "factor" if plan_bp.sub_raw > 0 else "xla"

            @jax.jit
            def mk_bp(key):
                return jax.lax.complex(
                    jax.random.normal(key, (sched_pulses, opts.num_samples),
                                      jnp.float32),
                    jax.random.normal(jax.random.fold_in(key, 1),
                                      (sched_pulses, opts.num_samples),
                                      jnp.float32))

            raw_bp = mk_bp(jax.random.PRNGKey(1))
            chain = 3

            @jax.jit
            def bp_stream(x):
                img = None
                for _c in range(chain):
                    img = bp_fast.focus_bp_fast(
                        x, trajb.positions, trajb.velocities, trajb.times,
                        np.zeros(3), float(t0b), p_bp, presum=d_ps,
                        plan=plan_bp, accumulate=bp_acc, fit_stride=8,
                        math_mode=os.environ.get("BENCH_BP_MATH", "exact"))
                    x = x + (jnp.sum(img[:1, :1]) * 0).astype(x.dtype)
                return x, img

            x, o = bp_stream(raw_bp)
            _ = float(jnp.sum(jnp.abs(o[:2, :2])))
            lat = []
            for _i in range(3):
                t1 = time.perf_counter()
                x, o = bp_stream(x)
                _ = float(jnp.sum(jnp.abs(o[:2, :2])))
                lat.append((time.perf_counter() - t1) / chain)
            bp_ms = 1000.0 * float(np.median(lat))
    except Exception:
        pass

    # ---- streaming VideoSAR BP: amortized per-frame cost at the product's
    # 80% CPI overlap — forward spectra cached per pulse (computed once,
    # shared by ~5 frames), only recentre/fit/accumulate/finalize per frame
    bp_stream_ms = None
    try:
        if bp_ms is not None \
                and os.environ.get("BENCH_SKIP_BP_STREAM", "0") != "1" \
                and (time.perf_counter() - t_proc0) < 0.7 * budget_s:
            from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel
            if fft_kernel.supported(plan_bp.nfft) \
                    and jax.default_backend() == "tpu":
                step_p = 500                     # 10 fps at PRF 5 kHz

                bp_math = os.environ.get("BENCH_BP_MATH", "exact")

                @jax.jit
                def stream_step(spec_buf, wp, new_raw):
                    # ring buffer: advance the cached-spectra window with
                    # ONE dynamic_update_slice (131 MB written/step) instead
                    # of re-concatenating the ~655 MB window every frame;
                    # ring_offset rolls only the per-pulse scalars + the
                    # small presummed rows. The chain frames ride inside one
                    # jit like bp_stream above (one dispatch per chain).
                    img = None
                    for _c in range(chain):
                        new_spec = bp_fast.forward_spectra(
                            new_raw, p_bp, math_mode=bp_math)
                        zero = jnp.zeros((), wp.dtype)
                        spec_buf = jax.lax.dynamic_update_slice(
                            spec_buf, new_spec, (wp, zero, zero))
                        wp = (wp + step_p) % sched_pulses
                        img = bp_fast.focus_bp_fast(
                            None, trajb.positions, trajb.velocities,
                            trajb.times, np.zeros(3), float(t0b), p_bp,
                            presum=d_ps, plan=plan_bp, accumulate=bp_acc,
                            fit_stride=8, math_mode=bp_math,
                            raw_spectra=spec_buf, ring_offset=wp)
                        new_raw = new_raw + (jnp.sum(img[:1, :1])
                                             * 0).astype(new_raw.dtype)
                    return spec_buf, wp, img

                spec0 = bp_fast.forward_spectra(raw_bp, p_bp)
                wp0 = jnp.int32(0)
                new0 = raw_bp[:step_p]
                spec0, wp0, img0 = stream_step(spec0, wp0, new0)
                _ = float(jnp.sum(jnp.abs(img0[:2, :2])))
                lat = []
                for _i in range(3):
                    t1 = time.perf_counter()
                    spec0, wp0, img0 = stream_step(spec0, wp0, new0)
                    _ = float(jnp.sum(jnp.abs(img0[:2, :2])))
                    lat.append((time.perf_counter() - t1) / chain)
                bp_stream_ms = 1000.0 * float(np.median(lat))
    except Exception:
        pass

    # ---- full-reference-scale echo synthesis (one clutter channel pass:
    # 5,035 targets x 7,200 x 13,200, golden 'freq' NUFFT backend) ----
    sim_pass_s = None
    try:
        if (time.perf_counter() - t_proc0) < 0.55 * budget_s \
                and os.environ.get("BENCH_SKIP_SIM", "0") != "1":
            import dataclasses

            from nis_sar_amtigmti_video_tpu.geometry import orbit
            from nis_sar_amtigmti_video_tpu.models.stripmap import (
                echo_opts_for)
            from nis_sar_amtigmti_video_tpu.ops.echo import phase_history
            from nis_sar_amtigmti_video_tpu.scene import targets as T_
            from nis_sar_amtigmti_video_tpu.scene.clutter import (
                ocean_clutter_field)

            # round-3 production path: 'freq' NUFFT backend with the VMEM
            # one-hot spread kernel + fused conv (scatter-free; 14.6 ->
            # 2.87 -> ~1.0 s measured on one v5e chip, spread == XLA dense
            # bit-for-bit; ops/echo_freq.py + ops/pallas/spread_kernel.py).
            # Off TPU the spreader auto-falls back to scatter.
            sc_s = cfg.ati_dpca()
            rs, gs, cs = sc_s.radar, sc_s.geometry, sc_s.collect
            sim_win = os.environ.get("BENCH_SIM_WIN")
            sim_grp = os.environ.get("BENCH_SIM_GRP")
            opts_s = dataclasses.replace(
                echo_opts_for(sc_s), backend="freq", endpoint_grid=False,
                freq_spreader=os.environ.get("BENCH_SIM_SPREADER", "auto"),
                freq_spread_win=int(sim_win) if sim_win else None,
                freq_spread_grp=int(sim_grp) if sim_grp else None,
                freq_conv=os.environ.get("BENCH_SIM_CONV", "auto"))
            t0s = window_start_time(gs.slant_range_m, opts_s,
                                    cs.window_length_s, "centered")
            ship = T_.destroyer().rotate_z(90.0)
            clut = ocean_clutter_field(np.random.default_rng(0))
            scene = T_.PointTargets.concatenate([ship, clut])
            n_ps = cs.num_pulses(rs.prf_hz)
            traj_s = orbit.make_trajectory(
                gs, orbit.slow_time_grid(cs.integration_time_s, n_ps))
            off0 = sc_s.channels.rx_offsets()[0]
            a = phase_history(traj_s, scene, opts_s, t_start=t0s,
                              rx_offset=off0)
            _ = float(jnp.sum(jnp.abs(a[:1, :1])))   # compile + first
            t1 = time.perf_counter()
            a = phase_history(traj_s, scene, opts_s, t_start=t0s,
                              rx_offset=off0)
            _ = float(jnp.sum(jnp.abs(a[:1, :1])))
            sim_pass_s = time.perf_counter() - t1
    except Exception:
        pass

    # ---- full-scale END-TO-END GMTI: scene -> two-channel echo -> DPCA
    # coregister -> dual CSA -> balance/ATI/DPCA products at the reference
    # 7,200 x 13,200 shape (sar_ati_dcpa_sim_csa.py's complete pipeline,
    # timed warm as one chain) ----
    e2e_fullscale_s = None
    try:
        if sim_pass_s is not None \
                and os.environ.get("BENCH_SKIP_E2E", "0") != "1" \
                and (time.perf_counter() - t_proc0) < 0.6 * budget_s:
            from nis_sar_amtigmti_video_tpu.models import gmti as gmti_model
            from nis_sar_amtigmti_video_tpu.ops.echo import (
                multi_channel_phase_history)

            traj_e = orbit.make_trajectory(
                gs, orbit.slow_time_grid(cs.integration_time_s, n_ps))
            offs = sc_s.channels.rx_offsets()

            def e2e_once():
                raw2 = multi_channel_phase_history(
                    traj_e, scene, opts_s, t_start=t0s, rx_offsets=offs)
                prod = gmti_model.focus_and_products(raw2, sc_s, float(t0s))
                return float(jnp.sum(jnp.abs(prod.ati_phase[:1, :1]))
                             + jnp.sum(jnp.abs(prod.dpca_mag[:1, :1])))

            e2e_once()                         # compile + first run
            t1 = time.perf_counter()
            e2e_once()
            e2e_fullscale_s = time.perf_counter() - t1
    except Exception:
        pass

    # ---- HRWS multichannel reconstruction (K=4, production 4096^2:
    # (4, 1024, 4096) sub-Nyquist channels -> (4096, 4096) unfolded
    # slow-time; doppler ambiguity.html:556-570's processing chain) ----
    hrws_recon_ms = None
    hrws_ghost_db = None
    try:
        if os.environ.get("BENCH_SKIP_HRWS", "0") != "1" \
                and (time.perf_counter() - t_proc0) < 0.8 * budget_s:
            from nis_sar_amtigmti_video_tpu.models import hrws
            from nis_sar_amtigmti_video_tpu.utils import cplx as _cplx

            k_ch, m_b = 4, 4
            p_az, n_rg = size // m_b, size
            prf_h, v_h = 6000.0, 7612.0      # ati_dpca-class system PRF
            # uniform effective sampling: spacing*PRF/(2V) = 1/K
            ph = hrws.HrwsParams(num_channels=k_ch,
                                 spacing_m=2.0 * v_h / (k_ch * prf_h),
                                 prf_hz=prf_h, velocity_mps=v_h)
            # multi-tone scene: one in-band + one aliasing tone per extra
            # band, constant over range (the solve/FFT work is
            # data-independent; tones give the ghost metric physical
            # meaning). Channel k samples slow time advanced by x_k/(2V).
            t_h = np.arange(p_az) / prf_h
            tones = [(0.17 * prf_h, 1.0), (1.31 * prf_h, 1.0),
                     (-1.62 * prf_h, 0.7)]
            offs_h = ph.rx_offsets()
            ch_np = np.zeros((k_ch, p_az, 1), np.complex64)
            for kk, x_off in enumerate(offs_h):
                tk = t_h + x_off / (2.0 * v_h)
                sig = np.zeros(p_az, np.complex128)
                for f0_h, a_h in tones:
                    sig += a_h * np.exp(2j * np.pi * f0_h * tk)
                ch_np[kk] = sig[:, None].astype(np.complex64)
            chans = jnp.broadcast_to(_cplx.to_device(ch_np),
                                     (k_ch, p_az, n_rg))

            recon_j = jax.jit(lambda c: hrws.reconstruct(c, ph))
            rec = recon_j(chans)
            _ = float(jnp.sum(jnp.abs(rec[:1, :1])))   # compile + first
            t1 = time.perf_counter()
            for _i in range(4):
                rec = recon_j(chans)
                _ = float(jnp.sum(jnp.abs(rec[:1, :1])))
            hrws_recon_ms = (time.perf_counter() - t1) / 4 * 1e3

            # ghost suppression: the 1.31*PRF tone aliases to 0.31*PRF in
            # any single channel; after unfolding it sits at its true bin
            # and the aliased bin drops. dB = alias-bin level, single
            # channel vs reconstructed (relative to the tone's true peak).
            spec1 = np.abs(np.fft.fft(ch_np[0, :, 0]))
            spec_r = np.abs(np.fft.fft(_cplx.to_host(rec[:, 0])))
            f1 = np.fft.fftfreq(p_az, 1.0 / prf_h)
            fr = np.fft.fftfreq(m_b * p_az, 1.0 / (m_b * prf_h))
            f_alias = 1.31 * prf_h - prf_h   # in-band alias position
            b1 = int(np.argmin(np.abs(f1 - f_alias)))
            br = int(np.argmin(np.abs(fr - f_alias)))
            b_true = int(np.argmin(np.abs(fr - 1.31 * prf_h)))
            g1 = spec1[b1] / spec1.max()
            gr = spec_r[br] / spec_r[b_true]
            hrws_ghost_db = 20.0 * math.log10(max(gr, 1e-12) / g1)
    except Exception:
        pass

    # ---- NumPy reference baseline: the same 2-channel GMTI step ----
    numpy_gmti_fps = None
    numpy_raw_s = None
    try:
      if os.environ.get("BENCH_SKIP_NUMPY", "0") != "1" \
              and (time.perf_counter() - t_proc0) < 0.85 * budget_s:
        import oracle
        rng = np.random.default_rng(0)
        nsz = min(size, 4096)
        # PINNED PROTOCOL (round-4): fixed BLAS threads (set at module
        # top), MEDIAN of >=5 identical channel passes over the same two
        # raw buffers, raw per-pass seconds recorded in the JSON — two
        # consecutive bench runs must agree within ~+-20%.
        n_passes = int(os.environ.get("BENCH_NUMPY_PASSES", "5"))
        raws = [(rng.standard_normal((nsz, nsz))
                 + 1j * rng.standard_normal((nsz, nsz)))
                for _ in range(2)]
        s_pair = [None, None]
        ch_dt = []
        for k in range(max(2, n_passes)):
            tc = time.perf_counter()
            s_pair[k % 2] = oracle.focus_csa(
                raws[k % 2], p.wavelength_m, p.chirp_rate, p.fs_hz, p.prf_hz,
                p.velocity_mps, p.range_ref_m, p.t_start_fast)[0].T
            ch_dt.append(time.perf_counter() - tc)
        s1o, s2o = s_pair
        t3 = time.perf_counter()
        cal = np.angle(np.mean(s1o * np.conj(s2o)))
        s2o = s2o * np.exp(1j * cal)
        interf = s1o * np.conj(s2o)
        phase = np.angle(interf)
        mag = np.abs(s1o)
        phase = np.where(mag > 0.05 * mag.max(), phase, 0.0)
        dmag = np.abs(s1o - s2o)
        _ = phase.sum() + dmag.sum()           # products (CFAR omitted:
        prod_dt = time.perf_counter() - t3     # favours the baseline)
        numpy_dt = 2.0 * float(np.median(ch_dt)) + prod_dt
        numpy_raw_s = [round(d, 3) for d in ch_dt] + [round(prod_dt, 3)]
        work = (size * size * np.log2(size)) / (nsz * nsz * np.log2(nsz))
        numpy_gmti_fps = (1.0 / numpy_dt) / work
    except Exception:
        pass

    result = {
        "metric": f"videosar_gmti_{size}x{size}_stream",
        "value": round(gmti_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": (round(gmti_fps / numpy_gmti_fps, 1)
                        if numpy_gmti_fps else None),
        "gmti_latency_ms": round(gmti_ms, 2),
        "csa_formation_fps": round(form_fps, 2) if form_fps else None,
        "csa_formation_bf16_fps": (round(form_bf16_fps, 2)
                                   if form_bf16_fps else None),
        "bp_frame_ms": round(bp_ms, 1) if bp_ms else None,
        "bp_stream_frame_ms": (round(bp_stream_ms, 1)
                               if bp_stream_ms else None),
        "sim_pass_s": round(sim_pass_s, 2) if sim_pass_s else None,
        "hrws_recon_ms": round(hrws_recon_ms, 1) if hrws_recon_ms else None,
        "hrws_ghost_db": round(hrws_ghost_db, 1) if hrws_ghost_db else None,
        "e2e_fullscale_s": (round(e2e_fullscale_s, 2)
                            if e2e_fullscale_s else None),
        "numpy_gmti_fps": round(numpy_gmti_fps, 5) if numpy_gmti_fps else None,
        "numpy_gmti_s_raw": numpy_raw_s,
        "fft_impl": fft_impl,
        "gmti_path": "kernel_fused" if kernel_path else "composed",
        "device": str(dev),
        "ncpi": ncpi,
        "iters": iters,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
