"""VideoSAR frame scheduler: sliding CPI windows over a long pulse stream.

Behavior of the reference's frame loop (sar_batch_sim.py:244-252, 303-310):
duration*PRF pulses, CPI windows of cpi_s*PRF pulses stepping PRF/fps pulses
(80% overlap at the reference's 0.5 s CPI / 10 fps). Frames are re-driveable:
the schedule is pure data, so a failed/reassigned frame shard is just
re-executed from its (i0, i1) window — this is the framework's
checkpoint/recovery granularity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu.config import VideoConfig


class FrameSchedule(NamedTuple):
    starts: np.ndarray      # (F,) start pulse index of each frame
    cpi_pulses: int
    step_pulses: int
    total_pulses: int

    @property
    def num_frames(self) -> int:
        return self.starts.shape[0]


def make_schedule(video: VideoConfig, prf_hz: float) -> FrameSchedule:
    total = video.total_pulses(prf_hz)
    cpi = video.cpi_pulses(prf_hz)
    step = video.step_pulses(prf_hz)
    starts = []
    for f in range(video.num_frames()):
        i0 = f * step
        if i0 + cpi > total:
            break
        starts.append(i0)
    return FrameSchedule(starts=np.asarray(starts, np.int64), cpi_pulses=cpi,
                         step_pulses=step, total_pulses=total)


def gather_frames(stream, schedule: FrameSchedule):
    """(T, ...) pulse stream -> (F, cpi, ...) overlapped frame stack (device
    gather; overlap duplicates data, which is what lets the frame axis shard
    cleanly over the mesh 'data' axis)."""
    idx = jnp.asarray(schedule.starts)[:, None] + jnp.arange(schedule.cpi_pulses)[None, :]
    return stream[idx]


def frame_slices_host(traj_arrays, schedule: FrameSchedule):
    """Host-side per-frame stacking of trajectory arrays: each (T, ...) ->
    (F, cpi, ...) float64 numpy."""
    out = []
    for a in traj_arrays:
        out.append(np.stack([a[i0:i0 + schedule.cpi_pulses]
                             for i0 in schedule.starts], axis=0))
    return out
