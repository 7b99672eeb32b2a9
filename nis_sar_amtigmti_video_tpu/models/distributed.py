"""Multi-chip GMTI / VideoSAR pipeline over a ('data','chan','seq') mesh.

Packages the framework's full sharded processing step for production use:
frame batches shard over 'data', receive channels over 'chan', and the
pulse/range axis over 'seq' with corner-turned CSA
(parallel/corner_turn.py). Cross-channel products use one all_gather over
'chan'; scalar metrics psum over the whole mesh. On a v5e-8 this is the
deployment shape of the BASELINE target (30 fps of 4k^2 GMTI imagery).

Numerics are identical to the single-device pipeline (asserted on the
8-virtual-device CPU mesh in tests/test_distributed.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nis_sar_amtigmti_video_tpu.gmti import cfar as cfar_mod
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.parallel import corner_turn


class ShardedGmtiOutputs(NamedTuple):
    dpca_mag: jax.Array       # (F, P, Ns) range-sharded over 'seq'
    ati_phase: jax.Array      # (F, P, Ns)
    cfar_snr: jax.Array       # (F, P, Ns)
    cancellation: jax.Array   # () replicated


def raw_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the (F, C, P, Ns) raw input batch."""
    return NamedSharding(mesh, P("data", "chan", "seq", None))


def product_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of the (F, P, Ns) product maps."""
    return NamedSharding(mesh, P("data", None, "seq"))


def make_gmti_step(mesh: Mesh, p: csa_ops.CsaParams,
                   cfar_params: cfar_mod.CfarParams = cfar_mod.CfarParams(),
                   mask_threshold: float = 0.05, fft_impl: str = "xla",
                   shift_pulses: int = 1):
    """Jitted sharded step: (F, C=2, P, Ns) complex64 raw -> products.

    The DPCA one-pulse-shift co-registration (gmti/dpca.py) is applied
    first, exactly as the single-device pipeline does, so ``p.num_pulses``
    must equal P - shift_pulses, and both (P - shift_pulses) and Ns must
    divide by the 'seq' axis size. Pass shift_pulses=0 for pre-coregistered
    input. The caller shards the input with :func:`raw_sharding` (or lets
    jit insert the transfer).
    """
    phases = csa_ops.csa_phases(p)

    def body(raw_l, phi1_l, phi2_l, phi3_l):
        slc = corner_turn.csa_local(raw_l, phi1_l, phi2_l, phi3_l, "seq",
                                    fft_impl=fft_impl)
        ch = jax.lax.all_gather(slc, "chan", axis=1, tiled=True)
        s1, s2 = ch[:, 0], ch[:, 1]
        # channel balance from the global mean interferogram
        ifg = s1 * jnp.conj(s2)
        num = jax.lax.psum(jnp.sum(ifg), ("data", "chan", "seq"))
        cal = num / jnp.abs(num)
        s2 = s2 * cal
        ifg = ifg * jnp.conj(cal)

        # magnitude-masked phase: mask on the global channel-1 peak
        mag1 = jnp.abs(s1)
        peak = jax.lax.pmax(jnp.max(mag1), ("data", "chan", "seq"))
        phase = jnp.where(mag1 > mask_threshold * peak, jnp.angle(ifg), 0.0)

        diff = s1 - s2
        # CFAR training windows cross range-shard boundaries: gather the full
        # range axis, detect, then slice the local shard back — identical to
        # the single-device detector (no zero-padded internal borders).
        diff_full = jax.lax.all_gather(jnp.abs(diff) ** 2, "seq", axis=-1,
                                       tiled=True)
        det_full = cfar_mod.ca_cfar(diff_full, cfar_params)
        ns_local = diff.shape[-1]
        start = jax.lax.axis_index("seq") * ns_local
        snr_local = jax.lax.dynamic_slice_in_dim(det_full.snr, start,
                                                 ns_local, axis=-1)
        c_num = jax.lax.psum(jnp.sum(mag1), ("data", "chan", "seq"))
        c_den = jax.lax.psum(jnp.sum(jnp.abs(diff)), ("data", "chan", "seq"))
        cancel = (c_num / (c_den + 1e-30)) * jnp.ones((), jnp.float32)
        return (jnp.abs(diff), phase.astype(jnp.float32),
                snr_local.astype(jnp.float32), cancel)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "chan", "seq", None),
                  P(None, "seq"), P("seq", None), P("seq", None)),
        out_specs=(P("data", None, "seq"), P("data", None, "seq"),
                   P("data", None, "seq"), P()),
        check_vma=False)

    @jax.jit
    def step(raw):
        if shift_pulses:
            s = shift_pulses
            raw = jnp.stack([raw[:, 0, s:, :], raw[:, 1, :-s, :]], axis=1)
        return ShardedGmtiOutputs(*sharded(raw, phases.phi1, phases.phi2,
                                           phases.phi3))

    return step


def make_videosar_step(mesh: Mesh, p: csa_ops.CsaParams,
                       fft_impl: str = "xla"):
    """Jitted sharded single-channel VideoSAR formation:
    (F, P, Ns) raw frames -> (F, P, Ns) SLC frames, 'data' x 'seq' sharded."""
    phases = csa_ops.csa_phases(p)

    def body(raw_l, phi1_l, phi2_l, phi3_l):
        return corner_turn.csa_local(raw_l, phi1_l, phi2_l, phi3_l, "seq",
                                     fft_impl=fft_impl)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "seq", None),
                  P(None, "seq"), P("seq", None), P("seq", None)),
        out_specs=P("data", None, "seq"))

    @jax.jit
    def step(raw):
        return sharded(raw, phases.phi1, phases.phi2, phases.phi3)

    return step
