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


def synthesize(tau_rel, carrier, amp, opts, oversample: int = 2,
               pulse_chunk: int | None = None, edge_taper: float = 4.0):
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
    """
    num_p, num_b = tau_rel.shape
    ns = opts.num_samples
    os_ = oversample
    fs_os = opts.fs_hz * os_

    g, x0 = chirp_kernel(opts, os_, edge_taper)
    lead = int(round(opts.pulse_width_s * fs_os)) + os_ + _W     # L0
    l_imp = lead + ns * os_ + os_ + _W
    l_fft = _next_fast_len(l_imp + g.shape[0])
    # combined spectral filter: chirp response deconvolved by the spreader
    filt = np.fft.fft(g.astype(np.complex128), n=l_fft) / _kernel_ft(l_fft)
    filt_j = jnp.asarray(filt.astype(np.complex64))

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
        flanks, scatter-added into a (pc, ns) correction field."""
        tau64 = tau.astype(jnp.float64)
        corr_r = jnp.zeros((pc * ns,), jnp.float32)
        corr_i = jnp.zeros((pc * ns,), jnp.float32)
        rows = jnp.arange(pc, dtype=jnp.int32)[:, None, None]
        offs = jnp.arange(n_edge)[None, None, :]
        for edge_off in (0.0, opts.pulse_width_s - t_edge_s):
            # first native sample index at/after the flank start
            start = (tau64 + x0 + edge_off) * opts.fs_hz        # (pc, B) f64
            nidx = (jnp.ceil(start - 1e-9).astype(jnp.int64)[:, :, None]
                    + offs)
            tn = nidx.astype(jnp.float64) / opts.fs_hz
            u = tn - tau64[:, :, None] - x0                     # gate-local
            gate = (u >= -1e-15) & (u <= opts.pulse_width_s + 1e-15)
            tap = 1.0 - _edge_taper(u, opts.pulse_width_s, t_edge_s)
            arg = u + x0 - opts.chirp_shift
            ph64 = math.pi * opts.chirp_rate * arg * arg
            ph = (ph64 - 2.0 * math.pi * jnp.round(ph64 / (2.0 * math.pi))
                  ).astype(jnp.float32)
            ok = (nidx >= 0) & (nidx < ns)
            t_ok = jnp.where(gate & ok, tap, 0.0).astype(jnp.float32)
            cs, sn = jnp.cos(ph), jnp.sin(ph)
            ar = jnp.real(a_cplx)[:, :, None]
            ai = jnp.imag(a_cplx)[:, :, None]
            vr = t_ok * (cs * ar - sn * ai)
            vi = t_ok * (cs * ai + sn * ar)
            pos = jnp.clip(nidx, 0, ns - 1).astype(jnp.int32)
            flat = (jnp.broadcast_to(rows, pos.shape).reshape(-1) * ns
                    + pos.reshape(-1))
            corr_r = corr_r.at[flat].add(vr.reshape(-1))
            corr_i = corr_i.at[flat].add(vi.reshape(-1))
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
        ok = (pos >= 0) & (pos < l_imp)
        pos = jnp.clip(pos, 0, l_imp - 1)
        wv = jnp.where(ok, w, 0.0)
        flat = (jnp.broadcast_to(rows, pos.shape).reshape(-1) * l_imp
                + pos.reshape(-1))
        # separate f32 re/im scatters: complex64 scatter-adds at the
        # reference scale (10M+ updates) fault the TPU runtime
        fr = jnp.zeros((pc * l_imp,), jnp.float32).at[flat].add(
            (wv * jnp.real(a_cplx)[:, :, None]).reshape(-1))
        fi = jnp.zeros((pc * l_imp,), jnp.float32).at[flat].add(
            (wv * jnp.imag(a_cplx)[:, :, None]).reshape(-1))
        field = jax.lax.complex(fr, fi).reshape(pc, l_imp)
        spec = jnp.fft.fft(field, n=l_fft, axis=-1) * filt_j
        conv = jnp.fft.ifft(spec, axis=-1)
        out_c = conv[:, lead:lead + ns * os_:os_]
        if n_edge:
            out_c = out_c + _edge_exact(tau, a_cplx)
        return carry, out_c

    _, out = jax.lax.scan(chunk, 0, xs)
    return out.reshape(p_pad, ns)[:num_p]
