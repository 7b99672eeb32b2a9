"""Device-mesh construction and canonical shardings.

The framework's three parallel axes (SURVEY.md §2.10):

  * ``data`` — independent VideoSAR frames / scenarios / batch-matrix entries
               (the reference's serial frame loop, sar_batch_sim.py:303-331)
  * ``chan`` — receive channels / constellation receivers
               (the reference's 4 serial GPU passes, sar_ati_dcpa_sim_csa.py:189-197)
  * ``seq``  — slow-time pulses during synthesis, range bins during azimuth
               processing, swapped by an all_to_all corner turn
               (parallel/corner_turn.py) — the SAR analog of sequence
               parallelism

All communication is jax.lax collectives over this mesh; there is no other
comm API surface. Within a slice the collectives ride ICI; across slices DCN.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nis_sar_amtigmti_video_tpu.config import MeshConfig

AXES = ("data", "chan", "seq")


def pick_mesh_shape(n_devices: int, num_channels: int = 2) -> tuple:
    """Factor a device count into (data, chan, seq).

    Policy: give 'chan' the channel count when it divides; split the rest
    between 'data' (favored — frames are embarrassingly parallel) and 'seq'.
    """
    chan = num_channels if n_devices % num_channels == 0 and num_channels > 1 else 1
    rest = n_devices // chan
    # split rest into data x seq with data >= seq, both powers of the factors
    seq = 1
    data = rest
    while data % 2 == 0 and data // 2 >= seq * 2:
        data //= 2
        seq *= 2
    return (data, chan, seq)


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a ('data','chan','seq') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = pick_mesh_shape(n)
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def mesh_from_config(cfg: MeshConfig, devices=None) -> Mesh:
    return make_mesh(cfg.shape, devices)


def frame_sharding(mesh: Mesh, extra_dims: int = 2) -> NamedSharding:
    """(F, ...) batches: frames over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * extra_dims)))


def frame_chan_sharding(mesh: Mesh, extra_dims: int = 2) -> NamedSharding:
    """(F, C, ...) batches: frames over 'data', channels over 'chan'."""
    return NamedSharding(mesh, P("data", "chan", *([None] * extra_dims)))


def pulse_sharding(mesh: Mesh, batch_dims: int = 0) -> NamedSharding:
    """(..., P, Ns): slow-time over 'seq' (synthesis-domain layout)."""
    return NamedSharding(mesh, P(*([None] * batch_dims), "seq", None))


def range_sharding(mesh: Mesh, batch_dims: int = 0) -> NamedSharding:
    """(..., P, Ns): range bins over 'seq' (azimuth-processing layout)."""
    return NamedSharding(mesh, P(*([None] * batch_dims), None, "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
