"""NumPy oracle for the SAR/GMTI pipelines.

Each function reproduces the observable behavior of one reference component
(cited per function) in plain vectorized float64 NumPy, written fresh. They are
deliberately simple and slow: correctness fixtures, not production code.

Conventions (matching the reference):
  * raw phase history is (num_pulses, num_samples), i.e. (azimuth, range)
  * focusing functions that mirror ``sar_focus_rda`` take (range, azimuth)
  * LFM chirp: rect((t - tau)/Tp centered) * exp(j*pi*Kr*(t - tau - Tp/2)^2)
"""

from __future__ import annotations

import numpy as np

C = 299792458.0
K_BOLTZ = 1.380649e-23


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def hamming(n: int) -> np.ndarray:
    """Symmetric Hamming window, identical to scipy.signal.windows.hamming."""
    if n == 1:
        return np.ones(1)
    m = np.arange(n)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * m / (n - 1))


# ---------------------------------------------------------------------------
# Raw-echo engines  (reference L3; SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def fast_time_window(r0: float, fs: float, pulse_width: float,
                     window_length: float = 22e-6,
                     mode: str = "reference"):
    """Receive-window start time + absolute fast-time grid.

    mode='reference': t_start = 2R0/c - Tp/2 - 1us, N = int(win*fs), grid via
    linspace(0, N/fs, N) (sar_satellite_sim.py:248-254 — note linspace
    *includes* the endpoint, so the step is N/(fs*(N-1)), not exactly 1/fs).
    mode='centered':  t_start = 2R0/c - win/2, N even, uniform arange/fs grid
    (sar_batch_sim.py:85-90).
    """
    if mode == "reference":
        n = int(window_length * fs)
        t_start = 2.0 * r0 / C - pulse_width / 2.0 - 1e-6
        grid = t_start + np.linspace(0.0, n / fs, n)
    elif mode == "centered":
        n = int(np.ceil(window_length * fs))
        if n % 2 != 0:
            n += 1
        t_start = 2.0 * r0 / C - window_length / 2.0
        grid = t_start + np.arange(n) / fs
    else:
        raise ValueError(mode)
    return t_start, grid


def _chirp_response(t_fast_abs, tau, amp, carrier_phase, k_rate, pulse_width):
    """Sum of gated LFM echoes: (B,) delays -> (Ns,) complex pulse response."""
    t_local = t_fast_abs[None, :] - tau[:, None]          # (B, Ns)
    arg = t_local - pulse_width / 2.0
    mask = np.abs(arg) <= pulse_width / 2.0
    phase = carrier_phase[:, None] + np.pi * k_rate * arg ** 2
    return np.sum(amp[:, None] * np.exp(1j * phase) * mask, axis=0)


def echo_monostatic(target_pos, target_rcs, sat_pos, t_fast_abs,
                    fc, k_rate, pulse_width, target_vel=None, t_slow=None):
    """Monostatic point-target phase history.

    Behavior of ``run_physics_engine`` (sar_satellite_sim.py:211-305) and, with
    ``target_vel``/``t_slow``, of ``run_moving_physics``
    (sar_satellite_moving_sim.py:111-159): two-way phase -4*pi*fc*d/c, gated
    chirp accumulated over targets.
    """
    num_pulses = sat_pos.shape[0]
    raw = np.zeros((num_pulses, t_fast_abs.shape[0]), dtype=np.complex128)
    amp = np.sqrt(np.asarray(target_rcs, np.float64))
    for i in range(num_pulses):
        pos = np.asarray(target_pos, np.float64)
        if target_vel is not None:
            pos = pos + np.asarray(target_vel)[None, :] * t_slow[i]
        dist = np.linalg.norm(pos - sat_pos[i][None, :], axis=1)
        tau = 2.0 * dist / C
        carrier = -4.0 * np.pi * fc * dist / C
        raw[i] = _chirp_response(t_fast_abs, tau, amp, carrier, k_rate, pulse_width)
    return raw


def echo_bistatic(target_pos, target_rcs, sat_pos, sat_vel, t_fast_abs,
                  fc, k_rate, pulse_width, rx_offset, target_vel, t_slow):
    """Two-phase-center (Tx + along-track-offset Rx) phase history.

    Behavior of ``run_bistatic_physics_gpu`` (sar_ati_dcpa_sim_csa.py:106-181):
    Rx displaced ``rx_offset`` along the velocity unit vector, bistatic delay
    (d_tx + d_rx)/c, carrier phase -2*pi*fc*tau.
    """
    num_pulses = sat_pos.shape[0]
    raw = np.zeros((num_pulses, t_fast_abs.shape[0]), dtype=np.complex128)
    amp = np.sqrt(np.asarray(target_rcs, np.float64))
    tv = np.asarray(target_vel, np.float64)
    for i in range(num_pulses):
        p_tx = sat_pos[i]
        v_dir = sat_vel[i] / np.linalg.norm(sat_vel[i])
        p_rx = p_tx + v_dir * rx_offset
        pos = np.asarray(target_pos, np.float64) + tv[None, :] * t_slow[i]
        d_tx = np.linalg.norm(pos - p_tx[None, :], axis=1)
        d_rx = np.linalg.norm(pos - p_rx[None, :], axis=1)
        tau = (d_tx + d_rx) / C
        carrier = -2.0 * np.pi * fc * tau
        raw[i] = _chirp_response(t_fast_abs, tau, amp, carrier, k_rate, pulse_width)
    return raw


def echo_spotlight(target_pos, target_rcs, sat_pos, sat_vel, t_slow, t_fast_abs,
                   fc, k_rate, pulse_width, wavelength, ant_length,
                   target_vel, beam_center=(0.0, 0.0, 0.0)):
    """Spotlight engine with sinc^2 azimuth antenna pattern and stop-and-go Rx
    correction (sar_batch_sim.py:83-169).

    Rx position advanced by v_sat * tau_approx; gain = sinc^2 of off-boresight
    angle w.r.t. the beam center; amplitude uses rcs (NOT sqrt(rcs) — the
    reference multiplies by rcs directly at sar_batch_sim.py:150).
    """
    num_pulses = sat_pos.shape[0]
    raw = np.zeros((num_pulses, t_fast_abs.shape[0]), dtype=np.complex128)
    tv = np.asarray(target_vel, np.float64)
    bc = np.asarray(beam_center, np.float64)
    for i in range(num_pulses):
        p_sat, v_sat = sat_pos[i], sat_vel[i]
        pos = np.asarray(target_pos, np.float64) + tv[None, :] * t_slow[i]
        diff_tx = pos - p_sat[None, :]
        d_tx = np.linalg.norm(diff_tx, axis=1)
        tau_approx = 2.0 * d_tx / C
        p_rx = p_sat[None, :] + v_sat[None, :] * tau_approx[:, None]
        d_rx = np.linalg.norm(pos - p_rx, axis=1)
        tau = (d_tx + d_rx) / C

        look = (bc - p_sat)
        look = look / np.linalg.norm(look)
        tgt_dir = diff_tx / d_tx[:, None]
        cos_off = np.clip(tgt_dir @ look, -1.0, 1.0)
        x = np.pi * ant_length * np.sin(np.arccos(cos_off)) / wavelength
        gain = np.ones_like(x)
        big = np.abs(x) > 1e-6
        gain[big] = (np.sin(x[big]) / x[big]) ** 2

        t_local = t_fast_abs[None, :] - tau[:, None]
        mask = np.abs(t_local) <= pulse_width / 2.0
        phase = np.pi * k_rate * t_local ** 2 - 2.0 * np.pi * fc * tau[:, None]
        raw[i] = np.sum(
            np.asarray(target_rcs)[:, None] * gain[:, None]
            * np.exp(1j * phase) * mask, axis=0)
    return raw


# ---------------------------------------------------------------------------
# Radar equation + noise  (reference L4; SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def snr_db_radar_equation(r_slant, rcs, wavelength, bandwidth, t_int=None,
                          p_tx=1000.0, ant_l=3.5, ant_w=0.5, efficiency=0.6,
                          t_sys=290.0, nf_db=5.0, loss_db=3.0):
    """SNR = P G^2 lam^2 sigma [T_int] / ((4pi)^3 R^4 k T B L NF)
    (sar_satellite_sim.py:319-329; t_int=None gives the per-pulse variant of
    sar_batch_sim.py:53-63)."""
    gain = 4.0 * np.pi * (ant_l * ant_w * efficiency) / wavelength ** 2
    num = p_tx * gain ** 2 * wavelength ** 2 * rcs
    if t_int is not None:
        num = num * t_int
    den = ((4.0 * np.pi) ** 3 * r_slant ** 4 * K_BOLTZ * t_sys * bandwidth
           * 10.0 ** (loss_db / 10.0) * 10.0 ** (nf_db / 10.0))
    return 10.0 * np.log10(num / den), 10.0 * np.log10(gain)


def add_ocean_noise(raw, snr_db, rng, scr_db=10.0, k_nu=1.0,
                    ref_power=None):
    """Thermal Gaussian + K-distributed sea clutter
    (gamma texture x exponential speckle x uniform phase),
    sar_satellite_sim.py:331-344."""
    if ref_power is None:
        ref_power = np.mean(np.abs(raw) ** 2)
    noise_power = ref_power / 10.0 ** (snr_db / 10.0)
    thermal = np.sqrt(noise_power / 2.0) * (
        rng.standard_normal(raw.shape) + 1j * rng.standard_normal(raw.shape))
    clutter_power = ref_power / 10.0 ** (scr_db / 10.0)
    texture = rng.gamma(k_nu, 1.0 / k_nu, raw.shape)
    speckle = rng.exponential(1.0, raw.shape)
    phase = rng.uniform(0.0, 2.0 * np.pi, raw.shape)
    clutter = np.sqrt(clutter_power * texture * speckle) * np.exp(1j * phase)
    return raw + thermal + clutter


# ---------------------------------------------------------------------------
# Image formation  (reference L5; SURVEY.md §2.5)
# ---------------------------------------------------------------------------

def focus_rda(phist, wavelength, pulse_width, chirp_rate, fs, prf, v_platform,
              range_ref):
    """Range-Doppler Algorithm, behavior of ``sar_focus_rda``
    (sar_satellite_sim.py:356-448).

    phist: (num_ranges, num_pulses) raw phase history (range-major!).
    Returns (image_mag.T, range_axis_centered, cross_range, compressed,
    rd_map, rd_rcmc, doppler_axis).
    """
    num_ranges, num_pulses = phist.shape

    if num_pulses % 2 == 0:
        slow_time = (np.arange(num_pulses) - num_pulses / 2) / prf
    else:
        slow_time = (np.arange(num_pulses) - (num_pulses - 1) / 2) / prf
    t_ref = 2.0 * range_ref / C
    if num_ranges % 2 == 0:
        fast_time = (np.arange(num_ranges) - num_ranges / 2) / fs + t_ref
    else:
        fast_time = (np.arange(num_ranges) - (num_ranges - 1) / 2) / fs + t_ref

    # 1. range compression: 'same'-mode convolution with windowed conj chirp
    n_mf = int(np.floor(pulse_width * fs)) + 1
    t_mf = np.linspace(-pulse_width / 2.0, pulse_width / 2.0, n_mf)
    mf = np.conj(np.exp(1j * np.pi * chirp_rate * t_mf ** 2)) * hamming(n_mf)
    mf = mf / np.linalg.norm(mf)
    compressed = np.stack(
        [np.convolve(phist[:, i], mf, mode="same") for i in range(num_pulses)],
        axis=1)

    # 2. azimuth window + FFT -> range-Doppler
    win_az = hamming(num_pulses)
    rd = np.fft.fftshift(
        np.fft.fft(np.fft.fftshift(compressed * win_az, axes=1), axis=1), axes=1)
    if num_pulses % 2 == 0:
        fd = np.arange(-num_pulses / 2, num_pulses / 2) * (prf / num_pulses)
    else:
        fd = np.arange(-(num_pulses - 1) / 2, (num_pulses - 1) / 2 + 1) * (prf / num_pulses)
    range_axis = fast_time * C / 2.0

    # 3. RCMC: delta_R = R fd^2 lam^2 / (8 V^2), re-sampled per Doppler bin
    delta_r = (range_axis[:, None] * fd[None, :] ** 2 * wavelength ** 2
               / (8.0 * v_platform ** 2))
    rd_rcmc = np.zeros_like(rd)
    for j in range(num_pulses):
        src = range_axis - delta_r[:, j]
        prof = rd[:, j]
        re = np.interp(range_axis, src, prof.real, left=0.0, right=0.0)
        im = np.interp(range_axis, src, prof.imag, left=0.0, right=0.0)
        out = re + 1j * im
        out[(range_axis < src[0]) | (range_axis > src[-1])] = 0.0
        rd_rcmc[:, j] = out

    # 4. azimuth compression H = exp(-j*pi*fd^2/Ka), Ka = 2V^2/(lam R)
    ka = 2.0 * v_platform ** 2 / (wavelength * range_axis)
    h = np.exp(-1j * np.pi * (1.0 / ka)[:, None] * fd[None, :] ** 2)
    img = np.fft.ifftshift(
        np.fft.ifft(np.fft.ifftshift(rd_rcmc * h, axes=1), axis=1), axes=1)

    cross_range = v_platform * slow_time
    range_centered = range_axis - np.mean(range_axis)
    return (np.abs(img).T, range_centered, cross_range, compressed, rd,
            rd_rcmc, fd)


def focus_csa(phist, wavelength, chirp_rate, fs, prf, v_platform, range_ref,
              t_start_fast):
    """Chirp Scaling Algorithm, behavior of ``sar_focus_csa``
    (sar_ati_dcpa_sim_csa.py:202-396).

    phist: (num_pulses, num_samples) raw (azimuth-major, uncompressed).
    Returns (slc.T, range_axis, cross_range).
    """
    n_az, n_rg = phist.shape
    kr = chirp_rate
    tau = t_start_fast + np.arange(n_rg) / fs
    fr = np.fft.fftshift(np.fft.fftfreq(n_rg, 1.0 / fs))
    fa = np.fft.fftshift(np.fft.fftfreq(n_az, 1.0 / prf))

    # step 1: azimuth FFT -> range-Doppler; chirp-scaling multiply
    s_rd = np.fft.fftshift(np.fft.fft(phist, axis=0), axes=0)
    arg = 1.0 - (wavelength * fa / (2.0 * v_platform)) ** 2
    d_fa = np.sqrt(np.where(arg < 0.0, 1e-9, arg))
    cs = 1.0 / d_fa - 1.0
    tau_ref = 2.0 * range_ref / (C * d_fa)
    phi1 = np.exp(-1j * np.pi * kr * cs[:, None]
                  * (tau[None, :] - tau_ref[:, None]) ** 2)
    s_sc = s_rd * phi1

    # step 2: range FFT -> 2D freq; range compression + bulk RCMC
    s_2d = np.fft.fftshift(np.fft.fft(s_sc, axis=1), axes=1)
    phi2 = np.exp(1j * (np.pi * fr[None, :] ** 2 / (kr * (1.0 + cs[:, None]))
                        + 4.0 * np.pi * range_ref * cs[:, None] * fr[None, :] / C))
    s_rc = s_2d * phi2

    # step 3: range IFFT; azimuth compression + residual phase
    s_rd2 = np.fft.ifft(np.fft.ifftshift(s_rc, axes=1), axis=1)
    r_vec = C * tau / 2.0
    tau_diff = tau[None, :] - 2.0 * range_ref / C
    phi3 = np.exp(1j * (4.0 * np.pi * r_vec[None, :] * d_fa[:, None] / wavelength
                        - np.pi * kr * cs[:, None] * (1.0 + cs[:, None])
                        * tau_diff ** 2))
    s_foc = s_rd2 * phi3

    # step 4: azimuth IFFT -> SLC
    slc = np.fft.ifft(np.fft.ifftshift(s_foc, axes=0), axis=0)

    t_slow = np.arange(n_az) / prf
    t_slow = t_slow - np.mean(t_slow)
    return slc.T, r_vec, t_slow * v_platform


def focus_tdbp(raw, sat_pos, sat_vel, t_start, t_slow, fc, k_rate, fs,
               pulse_width, vel_focus, scene_size, nx=64, ny=64):
    """Time-domain backprojection, behavior of ``tdbp_gpu``
    (sar_batch_sim.py:171-238): FFT matched filter, moving-grid (mBP) shift,
    radial-velocity Doppler re-centering, stop-and-go Rx correction, linear
    interpolation at (index - 0.5) with zero fill (grid_sample semantics,
    align_corners=False), phase rotation exp(j*2*pi*fc*tau), pulse sum.
    """
    num_pulses, num_samples = raw.shape
    t_ref = np.linspace(-pulse_width / 2.0, pulse_width / 2.0,
                        int(pulse_width * fs))
    ref_f = np.fft.fft(np.fft.fftshift(np.exp(1j * np.pi * k_rate * t_ref ** 2)),
                       n=num_samples)
    rc = np.fft.ifft(np.fft.fft(raw, n=num_samples, axis=1)
                     * np.conj(ref_f)[None, :], axis=1)

    x = np.linspace(-scene_size / 2.0, scene_size / 2.0, nx)
    y = np.linspace(-scene_size / 2.0, scene_size / 2.0, ny)
    gx, gy = np.meshgrid(x, y, indexing="xy")
    grid = np.stack([gx.ravel(), gy.ravel(), np.zeros(nx * ny)], axis=1)  # (Np, 3)

    vf = np.asarray(vel_focus, np.float64)
    t_c = np.mean(t_slow)
    img = np.zeros(nx * ny, dtype=np.complex128)
    for i in range(num_pulses):
        g = grid + vf[None, :] * (t_slow[i] - t_c)
        diff = g - sat_pos[i][None, :]
        d_tx = np.linalg.norm(diff, axis=1)
        r_unit = diff / d_tx[:, None]
        v_rad = np.sum((sat_vel[i][None, :] - vf[None, :]) * r_unit, axis=1)
        t_shift = -fc * (2.0 * v_rad / C) / k_rate
        tau_approx = 2.0 * d_tx / C
        p_rx = sat_pos[i][None, :] + sat_vel[i][None, :] * tau_approx[:, None]
        g_rx = g + vf[None, :] * tau_approx[:, None]
        d_rx = np.linalg.norm(g_rx - p_rx, axis=1)
        tau = (d_tx + d_rx) / C

        u = (tau - t_start + t_shift) * fs - 0.5
        i0 = np.floor(u).astype(int)
        w = u - i0
        def take(idx):
            valid = (idx >= 0) & (idx < num_samples)
            return np.where(valid, rc[i][np.clip(idx, 0, num_samples - 1)], 0.0)
        samp = (1.0 - w) * take(i0) + w * take(i0 + 1)
        img += samp * np.exp(1j * 2.0 * np.pi * fc * tau)
    return img.reshape(ny, nx)
