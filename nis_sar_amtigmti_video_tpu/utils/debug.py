"""Numerical-sanitizer switches (SURVEY §5 "race detection / sanitizers").

The reference has no sanitizers — GPU memory safety is comment-math and
``del``/``empty_cache`` (sar_batch_sim.py:111-116,329-330), and randomness is
global ``np.random`` state (sar_satellite_sim.py:336-341). In a functional
JAX framework the race class disappears and randomness is explicit keys; what
remains worth trapping is numerical poison (NaN/Inf from a bad geometry or a
degenerate HRWS solve). These helpers flip JAX's debug interception on for a
scoped region so production runs pay nothing.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def nan_checks(infs: bool = True):
    """Scope in which any op producing NaN (and Inf) raises immediately,
    pointing at the primitive that produced it. Forces re-tracing inside the
    scope (debug versions of compiled fns), so use around a failing repro,
    not in the hot path."""
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


def assert_finite(tree, where: str = "") -> None:
    """Eager finite-ness audit of a pytree of arrays (host or device).

    Cheap enough to sprinkle at stage boundaries in campaign scripts; raises
    ``FloatingPointError`` naming the offending leaf.
    """
    import numpy as np

    from nis_sar_amtigmti_video_tpu.utils.cplx import to_host

    leaves, _ = jax.tree.flatten(tree)
    for i, leaf in enumerate(leaves):
        if not hasattr(leaf, "dtype"):
            continue
        a = to_host(leaf) if getattr(leaf.dtype, "kind", "") == "c" else np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            raise FloatingPointError(
                f"non-finite values in leaf {i}"
                + (f" at {where}" if where else ""))
