"""Radar-equation SNR + thermal / K-distributed sea-clutter injection.

Behavior of ``calculate_snr_db`` / ``add_ocean_noise``
(sar_satellite_sim.py:307-344) and the per-pulse torch variant
(sar_batch_sim.py:53-81), re-designed with explicit ``jax.random`` keys in
place of global numpy/torch RNG state — every noise field is reproducible and
shardable (keys can be split per frame / per device).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from nis_sar_amtigmti_video_tpu import constants as k
from nis_sar_amtigmti_video_tpu.config import NoiseConfig
from nis_sar_amtigmti_video_tpu.utils.cplx import expj


def snr_db(cfg: NoiseConfig, r_slant_m: float, rcs_m2: float,
           wavelength_m: float, bandwidth_hz: float,
           integration_time_s: float | None = None) -> tuple[float, float]:
    """(snr_db, gain_db) from the radar equation.

    With ``integration_time_s`` this is the coherent-integration SNR
    (sar_satellite_sim.py:319-329); without, the raw per-pulse SNR
    (sar_batch_sim.py:53-63). ``snr_boost_db`` from the config is added.
    """
    area = cfg.antenna_length_m * cfg.antenna_width_m * cfg.aperture_efficiency
    gain = 4.0 * math.pi * area / wavelength_m ** 2
    num = cfg.tx_power_w * gain ** 2 * wavelength_m ** 2 * rcs_m2
    if integration_time_s is not None:
        num *= integration_time_s
    den = ((4.0 * math.pi) ** 3 * r_slant_m ** 4 * k.K_BOLTZMANN
           * cfg.system_temp_k * bandwidth_hz
           * 10.0 ** (cfg.loss_db / 10.0) * 10.0 ** (cfg.noise_figure_db / 10.0))
    return (10.0 * math.log10(num / den) + cfg.snr_boost_db,
            10.0 * math.log10(gain))


def sample_k_clutter(key, shape, clutter_power, k_shape: float = 1.0,
                     dtype=jnp.float32):
    """K-distributed sea clutter: intensity = power * Gamma(nu, 1/nu) texture
    * Exp(1) speckle, uniform phase (sar_satellite_sim.py:337-342)."""
    k_tex, k_spk, k_ph = jax.random.split(key, 3)
    texture = jax.random.gamma(k_tex, k_shape, shape, dtype) / k_shape
    speckle = jax.random.exponential(k_spk, shape, dtype)
    phase = jax.random.uniform(k_ph, shape, dtype, 0.0, 2.0 * math.pi)
    amp = jnp.sqrt(clutter_power * texture * speckle)
    return amp * expj(phase)


def sample_thermal(key, shape, noise_power, dtype=jnp.float32):
    """Circular complex Gaussian at the given total power."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(noise_power / 2.0).astype(dtype)
    return jax.lax.complex(std * jax.random.normal(kr, shape, dtype),
                           std * jax.random.normal(ki, shape, dtype))


def add_ocean_noise(key, raw, snr_db_val, scr_db: float = 10.0,
                    k_shape: float = 1.0, ref_power=None,
                    ref_power_mode: str = "mean"):
    """raw + thermal + K-clutter.

    ``ref_power_mode='mean'`` scales to mean signal power
    (sar_satellite_sim.py:333); ``'peak'`` to peak power
    (sar_batch_sim.py:317). Pass ``ref_power`` to pin it explicitly
    (deterministic golden tests).
    """
    if ref_power is None:
        p = jnp.abs(raw) ** 2
        ref_power = jnp.mean(p) if ref_power_mode == "mean" else jnp.max(p)
    noise_power = ref_power / 10.0 ** (snr_db_val / 10.0)
    clutter_power = ref_power / 10.0 ** (scr_db / 10.0)
    k_th, k_cl = jax.random.split(key)
    return (raw
            + sample_thermal(k_th, raw.shape, noise_power)
            + sample_k_clutter(k_cl, raw.shape, clutter_power, k_shape))
