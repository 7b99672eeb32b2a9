"""Frequency-domain echo synthesis — the fast backend for large scenes.

The direct engine evaluates a gated chirp per (pulse, target, sample):
O(P*B*Ns) transcendentals (~50 TFLOP for the reference's 5k-scatterer ATI
scene). But the echo is exactly a convolution:

    raw(t) = sum_b A_b * g(t - tau_b),   g(x) = gate(x) e^{j pi K (x-shift)^2}

with A_b = sqrt(rcs)*gain*e^{j carrier}. This module evaluates it as a
type-1 NUFFT: each impulse A_b delta(t - tau_b) is *spread* over W
neighboring taps of an os-times oversampled grid with an
exponential-of-semicircle kernel (FINUFFT's kernel family), the field is
FFT-convolved with the sampled chirp, the spectrum is deconvolved by the
spreading kernel's transform, and the result is decimated at the window
sample positions. Cost: O(P*B*W) scatter + O(P * L log L) FFT.

Sub-sample delays are therefore represented to spreading accuracy (~1e-5
relative with W=8, os=2), not quantized — essential because the chirp's
internal phase ramp makes a delay error r cost up to 2*pi*K*(Tp/2)*r radians
at the pulse edges.

Window truncation (the reference's 22 us window cutting the 20 us chirp) is
reproduced exactly: the convolution lives on an extended grid and is cropped
to the window — identical to gating each echo by the receive interval.

Requires a uniform fast-time grid (endpoint_grid=False); selected with
EchoOpts(backend='freq').

Exact-edge split (default): the rect gate's hard edges have unbounded
bandwidth, so a purely band-limited path has an ~-25 dB field floor there.
The chirp is therefore split as g = g_smooth + g_edges: g_smooth carries
raised-cosine flanks (edge_taper native samples wide) through the NUFFT
path — its spectrum decays fast, so the band-limited sub-sample shift is
accurate — while the two compact flank pieces are evaluated *exactly*
(transcendentals at the native sample positions, ~2 extra taps-per-target
scatter passes).

Gate tie-break: the direct engine evaluates its rect gate in f32, so an
echo edge landing within ~f32-eps of a sample (a pathologically aligned
scene: symmetric aperture, target on a grid-exact range) can round INTO
the gate there while this path's f64 geometry excludes it — a one-sample,
full-amplitude deviation exactly on the discontinuity, where the physical
value is undefined. Realistic scenes sit far from the tie; the golden
budgets below are unaffected.

Accuracy class (measured, tests/test_echo_freq.py): *golden-grade*. With
edge_taper=4, os=2 on an interference-rich scene: field RMS error < -60 dB
vs the direct engine; bright compressed pixels < 0.01 dB / < 1e-3 rad —
inside the BASELINE acceptance budget. edge_taper=0 restores the round-1
approximate mode (~-25 dB floor, ~50x speed). Requires chirp bandwidth < fs
(a physical waveform); aliased test waveforms (BW > fs) violate the
spreading band assumption.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu.utils.cplx import expj

_W = 8                      # spreading taps
_BETA = 2.30 * _W           # ES-kernel beta (FINUFFT's rule of thumb)
_LANE_C = 128               # fused-conv output row width (TPU lane count)


def _next_fast_len(n: int) -> int:
    """Next power of two >= n.

    XLA:TPU only runs power-of-two FFT lengths on the fast path; a 5-smooth
    length that CPU FFT libraries love (e.g. 150,000 at the reference
    two-channel scale) lowers to a DENSE DFT matmul on TPU — a 90 GB
    allocation. The <=2x extra padding is far cheaper."""
    return 1 << (n - 1).bit_length()


def _es_kernel(u):
    """exp(beta*(sqrt(1-(2u/W)^2)-1)) on |u|<=W/2, else 0."""
    z = 2.0 * np.asarray(u, np.float64) / _W
    inside = np.abs(z) < 1.0
    val = np.exp(_BETA * (np.sqrt(np.maximum(1.0 - z * z, 0.0)) - 1.0))
    return np.where(inside, val, 0.0)


@lru_cache(maxsize=None)
def _kernel_ft(l_fft: int) -> np.ndarray:
    """phi_hat(nu_k) for all DFT bins (numerical quadrature, host, cached)."""
    nu = np.fft.fftfreq(l_fft)                      # cycles/sample
    uq = np.linspace(-_W / 2, _W / 2, 8 * _W + 1)
    wq = _es_kernel(uq)
    # trapezoid weights
    tw = np.full(uq.shape, uq[1] - uq[0])
    tw[0] *= 0.5
    tw[-1] *= 0.5
    ft = (wq * tw) @ np.exp(-2j * np.pi * np.outer(uq, nu))
    # clamp far out-of-band values so deconvolution cannot blow up where the
    # chirp spectrum is ~0 anyway
    mag = np.abs(ft)
    floor = mag.max() * 1e-6
    ft = np.where(mag < floor, floor, ft)
    return ft.astype(np.complex128)


def chirp_kernel(opts, oversample: int, edge_taper_samples: float = 0.0):
    """(g taps complex64, x0) — g sampled at os*fs over its gate support.

    ``edge_taper_samples`` > 0 applies raised-cosine flanks of that width
    (in *native* samples) inside the gate: the smooth part for the
    exact-edge split (see :func:`synthesize`)."""
    dt = 1.0 / (opts.fs_hz * oversample)
    n = int(round(opts.pulse_width_s / dt)) + 1
    x0 = opts.chirp_shift - opts.half_width
    arg = x0 + np.arange(n) * dt - opts.chirp_shift
    gate = np.abs(arg) <= opts.half_width + 1e-15
    g = np.exp(1j * math.pi * opts.chirp_rate * arg ** 2) * gate
    if edge_taper_samples > 0.0:
        # gate-local coordinate: arg is chirp-centred, the gate starts at
        # arg = -half_width
        g = g * _edge_taper(arg + opts.half_width, opts.pulse_width_s,
                            edge_taper_samples / opts.fs_hz)
    return g.astype(np.complex64), x0


def _edge_taper(u, width_s: float, t_edge_s: float):
    """Raised-cosine flanks inside [0, width]: 0 at the gate edges, 1 in the
    interior beyond t_edge. Works on numpy or jax arrays."""
    xp = jnp if isinstance(u, jnp.ndarray) else np
    d = xp.minimum(u, width_s - u)                 # distance to nearest edge
    z = xp.clip(d / t_edge_s, 0.0, 1.0)
    return xp.where(d < 0, 0.0, 0.5 - 0.5 * xp.cos(xp.pi * z))


def _spread_dense(i0, val_sets, l_out: int, win: int, grp: int,
                  lo: int = 0, impl: str = "xla"):
    """Scatter-free spreading: values at integer cells via one-hot MXU
    matmuls over groups of delay-ordered targets.

    The TPU scatter wall (~24 ns/update) made the round-2 spreader slower
    than the direct engine despite its ~500x work advantage. Here targets
    arrive sorted by delay (the echo engine orders the scene once), so each
    group of B/grp consecutive targets spans a narrow cell band: build a
    (targets, win) one-hot of the group's window-relative cells, contract
    the K tap values against it on the MXU, shift tap k by k lanes, and add
    the group windows into the field with a second (row-level) one-hot
    matmul — no scatters anywhere.

    i0: (pc, B) i32 cell of tap 0 (may be out of grid — such taps must
    carry zero weight, matching the scatter path's clip).
    val_sets: sequence of (vr (pc, B, K), vi, offset) — each set's taps
    land at cells i0 + offset + k, all sets sharing the ONE one-hot (the
    exact-edge pass uses this: the trailing gate flank sits an integer
    number of cells after the leading one). Targets whose group window
    cannot contain them (group cell-spread > win - K: a badly unsorted or
    pathologically spread scene) are dropped — callers choose win/grp so
    this cannot happen for sane scenes (tests compare against the scatter
    path on the reference scenes).
    impl: 'xla' (HBM one-hot + dot_general) or 'pallas'/'pallas_interpret'
    (ops/pallas/spread_kernel.py — the one-hot never leaves VMEM; requires
    every value set at one K, which both callers satisfy).
    Returns (pc, l_out) f32 re/im fields.
    """
    pc, num_b = i0.shape
    max_off = max(off for _, _, off in val_sets)
    bg = -(-num_b // grp)
    b_pad = bg * grp
    far = -(10 ** 6)
    i0p = jnp.pad(i0, ((0, 0), (0, b_pad - num_b)), constant_values=far)

    # ``lo`` + one window of margin below, margin + tap offsets above: every
    # set's group window then sits inside the padded field, and out-of-grid
    # taps land in the margins (cropped at the end — the scatter ok-mask
    # equivalent). ``lo`` > 0 admits i0 down to -lo (offset sets can still
    # land such targets' taps in-grid).
    lo = -(-lo // 128) * 128
    rows_tot = -(-(l_out + 2 * win + lo + max_off + 256) // 128)
    l_pad = rows_tot * 128
    i0g = i0p.reshape(pc, grp, bg) + win + lo
    live = i0g > far // 2
    base = jnp.min(jnp.where(live, i0g, 10 ** 6), axis=2) - 8
    base = jnp.clip((base // 128) * 128, 0, l_out + win + lo)  # (pc, grp)

    c_rel = i0g - base[:, :, None]
    iota = jnp.arange(win, dtype=jnp.int32)
    row_io = jnp.arange(rows_tot, dtype=jnp.int32)

    # ONE one-hot serves every value set (built with the widest tap margin)
    k_max = max(v[0].shape[-1] for v in val_sets)
    ok = live & (c_rel >= 0) & (c_rel <= win - k_max)

    def _pack_vals(vr, vi, k_taps):
        # re/im stacked on the tap axis: ONE contraction against the big
        # one-hot serves both fields, halving the spread's dominant HBM
        # bill (the one-hot reads)
        v2 = jnp.concatenate([vr, vi], axis=-1)               # (pc,B,2K)
        return jnp.swapaxes(
            jnp.pad(v2, ((0, 0), (0, b_pad - num_b), (0, 0))
                    ).reshape(pc, grp, bg, 2 * k_taps), 2, 3)  # (pc,g,2K,bg)

    if impl == "xla":
        oh = (jnp.where(ok, c_rel, -1)[..., None] == iota
              ).astype(jnp.bfloat16)                          # (pc,g,bg,win)
        wins = None
    else:
        # VMEM-resident one-hot: the kernel builds and consumes the
        # selection matrix per (pulse, group) tile, writing only the group
        # windows (ops/pallas/spread_kernel.py)
        from nis_sar_amtigmti_video_tpu.ops.pallas.spread_kernel import (
            spread_windows_pallas)
        bgp = -(-bg // 128) * 128
        c_ok = jnp.pad(jnp.where(ok, c_rel, -1).astype(jnp.int32),
                       ((0, 0), (0, 0), (0, bgp - bg)), constant_values=-1)
        vts = [jnp.pad(_pack_vals(vr, vi, vr.shape[-1]
                                  ).astype(jnp.float32),
                       ((0, 0), (0, 0), (0, 0), (0, bgp - bg)))
               for vr, vi, _ in val_sets]
        wins = spread_windows_pallas(c_ok, vts, win,
                                     interpret=impl.endswith("interpret"),
                                     qr="qr" in impl)

    fr = jnp.zeros((pc, l_pad), jnp.float32)
    fi = jnp.zeros_like(fr)
    for si, (vr, vi, offset) in enumerate(val_sets):
        k_taps = vr.shape[-1]
        if wins is not None:
            out_r, out_i = wins[si]
        else:
            vt = _pack_vals(vr, vi, k_taps)
            vh = vt.astype(jnp.bfloat16)
            vl = (vt - vh.astype(jnp.float32)).astype(jnp.bfloat16)

            def dg(a, oh=oh):
                return jax.lax.dot_general(
                    a, oh, (((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)       # (pc,g,2K,win)

            part = dg(vh) + dg(vl)   # one-hot exact in bf16; split v only
            out_r = jnp.zeros((pc, grp, win), jnp.float32)
            out_i = jnp.zeros((pc, grp, win), jnp.float32)
            for k in range(k_taps):
                out_r = out_r + jnp.roll(part[:, :, k], k, axis=-1)
                out_i = out_i + jnp.roll(part[:, :, k_taps + k], k, axis=-1)

        # sub-row part of the offset: pad one row and lane-roll the windows
        off_mod = offset % 128
        win_e = win + (128 if off_mod else 0)
        if off_mod:
            out_r = jnp.roll(jnp.pad(out_r, ((0, 0), (0, 0), (0, 128))),
                             off_mod, axis=-1)
            out_i = jnp.roll(jnp.pad(out_i, ((0, 0), (0, 0), (0, 128))),
                             off_mod, axis=-1)

        # row-level one-hot placement: field rows = sum over group-window
        # rows selected at their dynamic row offsets (a batched MXU dot —
        # the vmapped dynamic-update alternative lowers to a scatter)
        nwr = win_e // 128
        base_eff = base + (offset - off_mod)
        rowpos = (base_eff[:, :, None] // 128
                  + jnp.arange(nwr, dtype=jnp.int32)[None, None, :]
                  ).reshape(pc, grp * nwr)
        rowhot = (rowpos[..., None] == row_io).astype(jnp.bfloat16)

        # re/im stacked on the lane axis: one placement dot serves both
        wv = jnp.concatenate([out_r.reshape(pc, grp * nwr, 128),
                              out_i.reshape(pc, grp * nwr, 128)], axis=-1)
        wh = wv.astype(jnp.bfloat16)
        wl_ = (wv - wh.astype(jnp.float32)).astype(jnp.bfloat16)

        def dg_place(a):
            return jax.lax.dot_general(
                rowhot, a, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (pc,rows,256)

        placed = dg_place(wh) + dg_place(wl_)
        fr = fr + placed[..., :128].reshape(pc, l_pad)
        fi = fi + placed[..., 128:].reshape(pc, l_pad)
    return (fr[:, win + lo:win + lo + l_out],
            fi[:, win + lo:win + lo + l_out])


def synthesize(tau_rel, carrier, amp, opts, oversample: int = 2,
               pulse_chunk: int | None = None, edge_taper: float = 4.0,
               spreader: str = "auto", spread_win: int | None = None,
               spread_grp: int | None = None, conv: str = "auto",
               spread_win_edge: int | None = None,
               spread_grp_edge: int | None = None):
    """(P, B) per-(pulse,target) scalars -> (P, Ns) complex64 raw data.

    tau_rel: delay of each echo relative to the window start [s]
    carrier: wrapped carrier phase [rad]; amp: real amplitude.
    The pulse chunk is sized from ``opts.max_elements`` (like the direct
    backend) so the (pc, B, W) spreading temporaries and the (pc, l_fft)
    field stay bounded for clutter-heavy scenes.

    edge_taper > 0 enables the **exact-edge split** (golden-grade mode):
    the NUFFT path carries the chirp with raised-cosine flanks of
    ``edge_taper`` native samples (smooth -> fast-decaying spectrum, so the
    band-limited sub-sample shift is accurate), while the two gate-edge
    flanks — whose hard discontinuity dominates the plain NUFFT error floor
    — are synthesized *exactly* per (pulse, target) at the native rate and
    scatter-added. Costs ~2 extra taps-per-target passes; 0 restores the
    round-1 approximate behavior.

    spreader: 'scatter' (round-2 scatter-add), 'dense' (one-hot MXU
    spreading, :func:`_spread_dense` — requires the target axis sorted by
    delay, which the echo engine's freq branch guarantees), 'dense_kernel'
    (same semantics, one-hot built in VMEM by ops/pallas/spread_kernel.py;
    needs a TPU — falls back to 'dense' elsewhere, with
    'dense_kernel_interpret' as the test mode), or 'auto' (dense on TPU,
    scatter elsewhere).
    conv: 'xla' (jnp fft round trips) or 'pallas'/'pallas_interpret' (the
    fused four-step conv kernel, fft_conv_pallas — TPU-gated, falls back
    to 'xla' when the padded FFT length is outside the kernel's range).
    """
    num_p, num_b = tau_rel.shape
    ns = opts.num_samples
    os_ = oversample
    fs_os = opts.fs_hz * os_
    if spreader == "auto":
        # dense_kernel == dense bit-for-bit since the hi/lo halves split
        # outside the kernel, and ~1.9x faster at full ATI scale (1.11 vs
        # 2.07 s/channel pass, scripts/probe_echo_spread_sweep.py)
        spreader = ("dense_kernel" if jax.default_backend() == "tpu"
                    else "scatter")
    if (spreader in ("dense_kernel", "dense_kernel_qr")
            and jax.default_backend() != "tpu"):
        spreader = "dense"                 # Mosaic needs a TPU (csa.py guard)
    if spreader not in ("scatter", "dense", "dense_kernel",
                        "dense_kernel_qr", "dense_kernel_interpret",
                        "dense_kernel_qr_interpret"):
        raise ValueError(f"unknown spreader {spreader!r}")
    use_dense = spreader != "scatter"
    d_impl = {"dense": "xla", "dense_kernel": "pallas",
              "dense_kernel_qr": "pallas_qr",
              "dense_kernel_interpret": "pallas_interpret",
              "dense_kernel_qr_interpret": "pallas_qr_interpret",
              "scatter": "xla"}[spreader]
    # group sizing: the (pc, grp, B/grp, win) one-hot IS the dense path's
    # HBM bill (~grp*(B/grp)*win bf16 per pulse); more/smaller groups cut it
    # linearly until a group's delay span approaches win - K (sorted scenes:
    # span ~ total_cells/grp). Defaults hold the round-3 safety margin;
    # spread_win/spread_grp are the measured-sweep overrides
    # (scripts/probe_echo_spread_sweep.py).
    d_win, d_grp = spread_win or 4096, spread_grp or 16
    # the edge pass works at the NATIVE rate (spans half the oversampled
    # grid's), so its window scales as spread_win/2 — capping it would
    # silently drop gate-flank corrections for widely-spread scenes.
    # ``spread_win_edge`` overrides it independently (the edge pass is
    # ~40% of the production channel pass — probe_echo_edge_r5.py — and
    # its one-hot bill scales with this window).
    d_win_e, d_grp_e = (spread_win_edge
                        or (spread_win // 2 if spread_win else 2048),
                        spread_grp_edge or spread_grp or 16)
    if d_win % 128 or d_win_e % 128 or d_win_e < 256:
        raise ValueError(
            f"spread_win must be a 256-multiple (got {spread_win}): the "
            "spread windows place as whole 128-lane rows at both the "
            "oversampled and native rates")

    g, x0 = chirp_kernel(opts, os_, edge_taper)
    lead = int(round(opts.pulse_width_s * fs_os)) + os_ + _W     # L0
    l_imp = lead + ns * os_ + os_ + _W
    # circular-wrap sizing: the linear convolution spans l_imp + len(g) - 1;
    # at l_fft < that, the wrapped tail contaminates [0, wrap) — which must
    # stay inside the lead margin, never the cropped window [lead, ...).
    # len(g) - 1 <= lead by construction, so next_fast_len(l_imp) (usually
    # half the naive l_imp + len(g) padding) is always safe.
    l_fft = _next_fast_len(l_imp)
    assert l_imp + g.shape[0] - 1 - l_fft <= lead
    # combined spectral filter: chirp response deconvolved by the spreader
    filt = np.fft.fft(g.astype(np.complex128), n=l_fft) / _kernel_ft(l_fft)
    filt_j = jnp.asarray(filt.astype(np.complex64))

    if conv == "auto":
        # the fused conv wins ~8% on the full ATI pass (1.02 vs 1.10 s) at
        # 4.4e-5-of-rms error — 20x inside the golden fidelity budgets
        # (probe: /tmp-level full-scale A/B, docs/ROUND3_NOTES.md)
        conv = "pallas" if jax.default_backend() == "tpu" else "xla"
    if conv == "pallas" and jax.default_backend() != "tpu":
        conv = "xla"                       # Mosaic needs a TPU (csa.py guard)
    if conv not in ("xla", "pallas", "pallas_interpret"):
        raise ValueError(f"unknown conv {conv!r}")
    if conv != "xla":
        from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel as _fftk
        if not _fftk.supported(l_fft):
            conv = "xla"                   # padded length outside the kernel
    # inverse-band slicing for the fused conv: only the window's rows
    p0c = lead // _LANE_C
    p1c = -(-(lead + ns * os_) // _LANE_C)
    off_c = lead - p0c * _LANE_C

    if pulse_chunk is None:
        per_pulse = max(num_b * _W, l_fft)
        pulse_chunk = max(1, opts.max_elements // per_pulse)
    pc = max(1, min(pulse_chunk, num_p))
    p_pad = -(-num_p // pc) * pc

    def padp(x):
        return jnp.pad(x, [(0, p_pad - num_p), (0, 0)]).reshape(
            p_pad // pc, pc, num_b)

    xs = (padp(tau_rel), padp(carrier), padp(amp))
    x0_f = jnp.float64(x0)
    beta = jnp.float32(_BETA)
    half_w = _W / 2.0

    n_edge = int(math.ceil(edge_taper)) + 2 if edge_taper > 0 else 0
    t_edge_s = edge_taper / opts.fs_hz

    def _edge_exact(tau, a_cplx):
        """Exact native-rate samples of chirp*(rect - taper) at both gate
        flanks, added into a (pc, ns) correction field (scatter or dense).

        Per-tap math runs in f32 against per-target f64 anchors: the flank
        phase is quadratic in the tap offset k, ph = c0 + c1 k + c2 k^2,
        with c0/c1 computed (and wrapped) per (pulse, target) in f64 and
        c2 = pi K / fs^2 a small static constant — the per-tap emulated-f64
        arithmetic this replaces was the edge pass's dominant TPU cost."""
        tau64 = tau.astype(jnp.float64)
        corr_r = jnp.zeros((pc, ns) if use_dense else (pc * ns,), jnp.float32)
        corr_i = jnp.zeros_like(corr_r)
        rows = jnp.arange(pc, dtype=jnp.int32)[:, None, None]
        offs = jnp.arange(n_edge)[None, None, :]
        offs_f = offs.astype(jnp.float32)
        two_pi = 2.0 * math.pi
        c2 = jnp.float32(math.pi * opts.chirp_rate / (opts.fs_hz ** 2))

        def wrap32(x64):
            return (x64 - two_pi * jnp.round(x64 / two_pi)
                    ).astype(jnp.float32)

        # when the flank separation is an integer number of native cells
        # (Tp*fs integer — every reference waveform), both flanks share ONE
        # dense one-hot: the trailing set is just offset by delta cells
        delta_f = (opts.pulse_width_s - t_edge_s) * opts.fs_hz
        delta = int(round(delta_f))
        share = abs(delta_f - delta) < 1e-6
        sets, i0_lead = [], None

        for edge_off, leading in ((0.0, True),
                                  (opts.pulse_width_s - t_edge_s, False)):
            # first native sample index at/after the flank start
            start = (tau64 + x0 + edge_off) * opts.fs_hz        # (pc, B) f64
            cell0 = jnp.ceil(start - 1e-9)
            # flank-local coordinate of tap 0 (small f64 -> exact f32)
            e0 = cell0 / opts.fs_hz - tau64 - x0 - edge_off
            arg0 = e0 + edge_off + x0 - opts.chirp_shift
            c0 = wrap32(math.pi * opts.chirp_rate * arg0 * arg0)
            c1 = wrap32((two_pi * opts.chirp_rate / opts.fs_hz) * arg0)
            ph = (c0[:, :, None] + c1[:, :, None] * offs_f
                  + c2 * offs_f * offs_f)
            e = e0.astype(jnp.float32)[:, :, None] + offs_f / jnp.float32(
                opts.fs_hz)
            if leading:
                gate = e >= -1e-12
                d = e
            else:
                gate = e <= t_edge_s + 1e-12
                d = t_edge_s - e
            z = jnp.clip(d / t_edge_s, 0.0, 1.0)
            tap = 0.5 + 0.5 * jnp.cos(jnp.pi * z)   # 1 - raised-cosine
            cs, sn = jnp.cos(ph), jnp.sin(ph)
            ar = jnp.real(a_cplx)[:, :, None]
            ai = jnp.imag(a_cplx)[:, :, None]
            if use_dense:
                t_ok = jnp.where(gate, tap, 0.0)
                vr = t_ok * (cs * ar - sn * ai)
                vi = t_ok * (cs * ai + sn * ar)
                if share:
                    if leading:
                        i0_lead = jnp.clip(cell0, -delta - 256.0, ns + 256.0
                                           ).astype(jnp.int32)
                    sets.append((vr, vi, 0 if leading else delta))
                else:
                    er, ei = _spread_dense(
                        jnp.clip(cell0, -256.0, ns + 256.0
                                 ).astype(jnp.int32),
                        [(vr, vi, 0)], ns, d_win_e, d_grp_e, impl=d_impl)
                    corr_r = corr_r + er
                    corr_i = corr_i + ei
                continue
            nidx = cell0.astype(jnp.int64)[:, :, None] + offs
            ok = (nidx >= 0) & (nidx < ns)
            t_ok = jnp.where(gate & ok, tap, 0.0)
            vr = t_ok * (cs * ar - sn * ai)
            vi = t_ok * (cs * ai + sn * ar)
            pos = jnp.clip(nidx, 0, ns - 1).astype(jnp.int32)
            flat = (jnp.broadcast_to(rows, pos.shape).reshape(-1) * ns
                    + pos.reshape(-1))
            corr_r = corr_r.at[flat].add(vr.reshape(-1))
            corr_i = corr_i.at[flat].add(vi.reshape(-1))
        if use_dense:
            if share:
                er, ei = _spread_dense(i0_lead, sets, ns, d_win_e, d_grp_e,
                                       lo=delta + 256, impl=d_impl)
                corr_r = corr_r + er
                corr_i = corr_i + ei
            return jax.lax.complex(corr_r, corr_i)
        return jax.lax.complex(corr_r, corr_i).reshape(pc, ns)

    def chunk(carry, x):
        tau, car, am = x
        s = (tau.astype(jnp.float64) + x0_f) * fs_os + lead   # grid position
        i0 = jnp.floor(s).astype(jnp.int32) - (_W // 2 - 1)
        frac = (s - jnp.floor(s)).astype(jnp.float32)
        a_cplx = am * expj(car)                                # (pc, B)
        rows = jnp.arange(pc, dtype=jnp.int32)[:, None, None]
        offs = jnp.arange(_W, dtype=jnp.int32)[None, None, :]
        pos = i0[:, :, None] + offs                            # (pc, B, W)
        # ES weights at u = pos - s = offs - (W/2-1) - frac
        u = (offs.astype(jnp.float32) - (_W // 2 - 1)) - frac[:, :, None]
        z2 = jnp.clip(1.0 - (2.0 * u / _W) ** 2, 0.0, 1.0)
        w = jnp.where(jnp.abs(u) < half_w,
                      jnp.exp(beta * (jnp.sqrt(z2) - 1.0)), 0.0)
        if use_dense:
            vr = w * jnp.real(a_cplx)[:, :, None]
            vi = w * jnp.imag(a_cplx)[:, :, None]
            # clamp far-out cells near the grid edges: their taps land in
            # the margins (dropped, == the scatter path's ok-mask) without
            # dragging their group's window away from live neighbors
            i0_d = jnp.clip(i0, -256, l_imp + 256)
            fr, fi = _spread_dense(i0_d, [(vr, vi, 0)], l_imp, d_win, d_grp,
                                   impl=d_impl)
        else:
            ok = (pos >= 0) & (pos < l_imp)
            pos = jnp.clip(pos, 0, l_imp - 1)
            wv = jnp.where(ok, w, 0.0)
            flat = (jnp.broadcast_to(rows, pos.shape).reshape(-1) * l_imp
                    + pos.reshape(-1))
            # separate f32 re/im scatters: complex64 scatter-adds at the
            # reference scale (10M+ updates) fault the TPU runtime
            fr = jnp.zeros((pc * l_imp,), jnp.float32).at[flat].add(
                (wv * jnp.real(a_cplx)[:, :, None]).reshape(-1)
                ).reshape(pc, l_imp)
            fi = jnp.zeros((pc * l_imp,), jnp.float32).at[flat].add(
                (wv * jnp.imag(a_cplx)[:, :, None]).reshape(-1)
                ).reshape(pc, l_imp)
        if conv != "xla":
            cr, ci2 = _fftk.fft_conv_pallas(
                fr, fi, filt, l_fft, out_rows=(p0c, p1c),
                interpret=conv == "pallas_interpret")
            out_c = jax.lax.complex(cr, ci2)[:, off_c:off_c + ns * os_:os_]
        else:
            spec = jnp.fft.fft(jax.lax.complex(fr, fi),
                               n=l_fft, axis=-1) * filt_j
            conv_f = jnp.fft.ifft(spec, axis=-1)
            out_c = conv_f[:, lead:lead + ns * os_:os_]
        if n_edge:
            out_c = out_c + _edge_exact(tau, a_cplx)
        return carry, out_c

    _, out = jax.lax.scan(chunk, 0, xs)
    return out.reshape(p_pad, ns)[:num_p]
