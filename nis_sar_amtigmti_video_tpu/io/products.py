"""Product writers: .npz files key-compatible with the reference viewers.

The reference's sim->viewer contract is a set of .npz key schemas
(sar_satellite_sim.py:483-501, sar_vehicle_sim.py:290-306,
sar_ati_dcpa_sim_csa.py:457-461, sar_satellite_moving_sim.py:337-353, and
per-frame .npy stacks sar_batch_sim.py:328). These writers emit the same keys
from our product containers, so the *reference's own interactive viewers* can
open our outputs unchanged. Checkpoint/resume for long VideoSAR runs is at
frame granularity (write_video_frames / read-back).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from nis_sar_amtigmti_video_tpu.config import ScenarioConfig
from nis_sar_amtigmti_video_tpu.utils import cplx


def _h(x):
    """Fetch device array to host (complex-safe)."""
    return cplx.to_host(x) if x is not None else None


def _savez(path, **arrays):
    """np.savez with None entries omitted — savez would silently pickle None
    into an object array that every default (allow_pickle=False) np.load
    rejects, breaking the viewers on files this framework itself wrote."""
    np.savez(path, **{k: v for k, v in arrays.items() if v is not None})


def write_satellite_products(path: str, prod, sc: ScenarioConfig):
    """Schema of sar_satellite_data.npz (sar_satellite_sim.py:483-500)."""
    g, r = sc.geometry, sc.radar
    inter = prod.intermediates
    _savez(
        path,
        raw_phist=_h(prod.raw),
        range_comp=_h(inter.compressed) if inter else None,
        rd_map=_h(inter.rd_map) if inter else None,
        rd_rcmc=_h(inter.rd_rcmc) if inter else None,
        final_image=np.abs(_h(prod.image)),
        range_axis=prod.range_axis,
        cross_range=prod.cross_range,
        doppler_axis=prod.doppler_axis,
        orbit_alt=g.altitude_m,
        orbit_vel=g.orbital_velocity_mps,
        look_ang=g.look_angle_deg,
        inc_ang=np.degrees(g.incidence_angle_rad),
        bw=r.bandwidth_hz,
        r0=g.slant_range_m,
        fc=r.fc_hz,
        v_eff=g.effective_velocity_mps,
    )


def write_vehicle_products(path: str, prod, sc: ScenarioConfig):
    """Schema of sar_simulation_data.npz (sar_vehicle_sim.py:290-306)."""
    g, r = sc.geometry, sc.radar
    inter = prod.intermediates
    _savez(
        path,
        raw_phist=_h(prod.raw).T,
        range_comp=_h(inter.compressed).T if inter else None,
        rd_map=_h(inter.rd_map).T if inter else None,
        rd_rcmc=_h(inter.rd_rcmc).T if inter else None,
        rd_az_comp=_h(inter.rd_az_comp).T if inter else None,
        final_image=np.abs(_h(prod.image)),
        range_axis=prod.range_axis,
        cross_range=prod.cross_range,
        doppler_axis=prod.doppler_axis,
        platform_alt=g.altitude_m,
        platform_vel=g.platform_velocity_mps,
        look_ang=g.look_angle_deg,
        inc_ang=g.look_angle_deg,
        r0=g.slant_range_m,
        prf=r.prf_hz,
    )


def write_ati_dpca_products(path: str, prod):
    """Schema of sar_ati_dpca_data_csa.npz (sar_ati_dcpa_sim_csa.py:457-461).
    The reference stores SLCs transposed to (range, azimuth)."""
    np.savez(
        path,
        slc1=_h(prod.slc1).T,
        slc2=_h(prod.slc2).T,
        range_axis=prod.range_axis,
        cross_range=prod.cross_range,
    )


def write_moving_scenario(path: str, prod, sc: ScenarioConfig, *,
                          scen_name: str, ship_speed: float,
                          ship_heading: float, ship_vel):
    """Schema of sar_satellite_moving_scen_*.npz
    (sar_satellite_moving_sim.py:337-353)."""
    g, r = sc.geometry, sc.radar
    np.savez(
        path,
        final_image=np.abs(_h(prod.image)),
        range_axis=prod.range_axis,
        cross_range=prod.cross_range,
        orbit_alt=g.altitude_m,
        orbit_vel=g.orbital_velocity_mps,
        look_ang=g.look_angle_deg,
        inc_ang=np.degrees(g.incidence_angle_rad),
        r0=g.slant_range_m,
        v_eff=g.effective_velocity_mps,
        prf=r.prf_hz,
        scen_name=scen_name,
        ship_speed=ship_speed,
        ship_heading=ship_heading,
        ship_vel=np.asarray(ship_vel),
    )


def write_video_frames(out_dir: str, frames, prefix: str = "frame",
                       async_spill: bool = False, spiller=None):
    """Per-frame .npy stack (sar_batch_sim.py:328) — the resume checkpoint:
    a crashed/preempted run re-forms only the missing frames.

    ``async_spill=True`` hands serialization to the native C++ thread pool
    (nis_sar_amtigmti_video_tpu.native.FrameSpiller) so the device loop never
    blocks on disk; pass an existing ``spiller`` to share one pool across
    batches (caller waits/validates with spiller.wait()/spiller.errors).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    own = None
    if async_spill and spiller is None:
        from nis_sar_amtigmti_video_tpu import native
        own = spiller = native.FrameSpiller()
    try:
        for i in range(frames.shape[0]):
            pth = os.path.join(out_dir, f"{prefix}_{i:05d}.npy")
            if spiller is not None:
                spiller.submit(pth, frames[i])
            else:
                np.save(pth, frames[i])
            paths.append(pth)
        if own is not None:
            own.wait()
            if own.errors:
                raise IOError(
                    f"frame spiller reported {own.errors} write errors")
    finally:
        if own is not None:
            own.close()
    return paths


def read_video_frames(out_dir: str, prefix: str = "frame"):
    """Load an (possibly partial) frame stack; returns (indices, frames)
    sorted by frame *index* (numeric, not lexicographic — zero-padding can
    differ across writers/campaign sizes)."""
    import re
    pat = re.compile(rf"{re.escape(prefix)}_(\d+)\.npy$")
    found = []
    for name in os.listdir(out_dir):
        m = pat.match(name)
        if m:
            found.append((int(m.group(1)), os.path.join(out_dir, name)))
    if not found:
        return np.array([], np.int64), np.zeros((0,))
    found.sort(key=lambda t: t[0])
    idx = np.asarray([i for i, _ in found])
    return idx, np.stack([np.load(p) for _, p in found])


def missing_frames(out_dir: str, num_frames: int, prefix: str = "frame"):
    """Frame indices not yet on disk — the re-drive list for resume."""
    import re
    have = set()
    if os.path.isdir(out_dir):
        # same strict pattern as read_video_frames: unrelated files in the
        # output dir (e.g. 'frame_meta.npy') must not break resume
        pat = re.compile(rf"{re.escape(prefix)}_(\d+)\.npy$")
        have = set(int(m.group(1))
                   for m in map(pat.match, os.listdir(out_dir)) if m)
    return [f for f in range(num_frames) if f not in have]
