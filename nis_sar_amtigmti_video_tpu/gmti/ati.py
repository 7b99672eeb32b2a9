"""Along-Track Interferometry (ATI) products.

Behavior of the reference's products (sar_ati_dcpa_sim_csa.py:414-416,
447-450) and viewer calibration (sar_ati_dcpa_viewer_csa.py:43-56, 245-254).
"""

from __future__ import annotations

import jax.numpy as jnp

from nis_sar_amtigmti_video_tpu.utils.cplx import expj


def interferogram(slc1, slc2):
    """Complex ATI interferogram slc1 * conj(slc2)."""
    return slc1 * jnp.conj(slc2)


def ati_phase(slc1, slc2):
    return jnp.angle(interferogram(slc1, slc2))


def masked_phase(slc1, slc2, threshold: float = 0.05):
    """Phase where channel-1 magnitude exceeds threshold*peak; else 0
    (sar_ati_dcpa_sim_csa.py:447-449)."""
    phase = ati_phase(slc1, slc2)
    mag = jnp.abs(slc1)
    return jnp.where(mag > threshold * jnp.max(mag), phase, 0.0)


def channel_balance_phase(slc1, slc2):
    """Global calibration phase = angle(mean(slc1*conj(slc2)))
    (sar_ati_dcpa_viewer_csa.py:245-254)."""
    return jnp.angle(jnp.mean(interferogram(slc1, slc2)))


def apply_balance(slc2, cal_phase):
    """Rotate channel 2 by the calibration phase."""
    return slc2 * expj(jnp.broadcast_to(cal_phase, ()).astype(jnp.float32))
