"""Driver-contract smoke test for bench.py (round-5 artifact discipline).

The driver captures ``python bench.py``'s LAST stdout line as the round's
artifact of record; the round-4 verdict's top item was metrics silently
vanishing from it. This test runs the bench end-to-end on CPU at a tiny
size (~7 s) and asserts the contract the rework established: one JSON
line on stdout, every metric KEY present (null only with a reason),
and a per-section status map with explicit skip reasons.
"""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_METRIC_KEYS = (
    "metric", "value", "unit", "vs_baseline", "gmti_latency_ms",
    "csa_formation_fps", "csa_formation_bf16_fps", "bp_frame_ms",
    "bp_stream_frame_ms", "sim_pass_s", "hrws_recon_ms", "hrws_ghost_db",
    "e2e_fullscale_s", "numpy_gmti_fps", "numpy_gmti_s_raw",
    "numpy_warm_spread", "numpy_stable", "fft_impl", "gmti_path",
    "device", "total_elapsed_s", "sections",
)

_SECTIONS = ("gmti", "e2e_fullscale", "bp_frame", "bp_stream",
             "csa_formation", "hrws", "csa_formation_bf16",
             "numpy_baseline")


@pytest.mark.skipif(os.environ.get("NIS_SAR_SKIP_BENCH_SMOKE") == "1",
                    reason="explicitly skipped")
def test_bench_cpu_smoke_contract():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", BENCH_SIZE="256", BENCH_NCPI="1",
               BENCH_ITERS="1", BENCH_SKIP_E2E="1", BENCH_SKIP_BP="1",
               BENCH_SKIP_BP_STREAM="1", BENCH_SKIP_HRWS="1",
               BENCH_SKIP_BF16="1", BENCH_NUMPY_PASSES="4",
               BENCH_NUMPY_COLD="1")
    res = subprocess.run([sys.executable, os.path.join(_ROOT, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, ("stdout must be exactly ONE JSON line "
                             f"(got {len(lines)})")
    d = json.loads(lines[0])
    for k in _METRIC_KEYS:
        assert k in d, f"metric key {k!r} missing from the artifact"
    assert d["value"] and d["value"] > 0
    assert d["unit"] == "frames/sec"
    # every section accounted for, with explicit statuses
    secs = d["sections"]
    for name in _SECTIONS:
        assert name in secs, f"section {name!r} missing"
        st = secs[name]["status"]
        assert st == "ok" or st.startswith(("skipped:", "error:")), st
        assert "elapsed_s" in secs[name]
    # env-skipped sections carry the reason
    assert secs["e2e_fullscale"]["status"] == "skipped: BENCH_SKIP_E2E=1"
    assert secs["bp_frame"]["status"] == "skipped: BENCH_SKIP_BP=1"
    # sections that ran have real values
    assert secs["gmti"]["status"] == "ok"
    assert d["gmti_latency_ms"] > 0
    assert secs["numpy_baseline"]["status"] == "ok"
    assert d["numpy_gmti_fps"] > 0
    assert isinstance(d["numpy_stable"], bool)
