"""Regenerate scorecard numbers in README/BASELINE/PARITY from BENCH_r*.json.

The driver captures ``python bench.py``'s JSON line after every round in
``BENCH_r0N.json`` — the artifact of record. Hand-copied numbers drifted from
it twice (round-2 and round-3 reviews), so the docs' measured blocks are now
GENERATED: each doc carries ``<!-- SYNC:name -->`` / ``<!-- /SYNC:name -->``
markers and this script owns the text between them, formatted from the parsed
bench artifacts. Run after each round (or whenever a new BENCH file lands):

    python scripts/sync_scorecards.py

Idempotent; fails loudly if a marker disappears.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def load_benches():
    """{round: parsed-dict} for every BENCH_r*.json."""
    out = {}
    for p in sorted(ROOT.glob("BENCH_r*.json")):
        data = json.loads(p.read_text())
        out[int(data["n"])] = data["parsed"]
    if not out:
        sys.exit("no BENCH_r*.json artifacts found")
    return out


def fmt(x, nd=1, thousands=False):
    if x is None:
        return "n/a"
    s = f"{x:,.{nd}f}" if thousands else f"{x:.{nd}f}"
    return s


def gmti_fps(b):
    """Headline 2-ch GMTI stream rate; round 1 benched formation only, so its
    GMTI rate derives from the latency metric."""
    if str(b.get("metric", "")).startswith("videosar_gmti"):
        return b["value"]
    lat = b.get("gmti_latency_ms")
    return 1000.0 / lat if lat else None


def csa_fps(b):
    if str(b.get("metric", "")).startswith("videosar_csa"):
        return b["value"]
    return b.get("csa_formation_fps")


def baseline_table(benches):
    rounds = sorted(benches)
    cur = rounds[-1]

    def row(label, getter, where, nd=1, suffix=""):
        cells = []
        for r in rounds:
            v = getter(benches[r])
            cell = "n/a" if v is None else fmt(v, nd) + suffix
            if r == cur and v is not None:
                cell = f"**{cell}**"
            cells.append(cell)
        return "| " + label + " | " + " | ".join(cells) + f" | {where} |"

    hdr_rounds = " | ".join(f"round {r}" for r in rounds)
    lines = [
        f"| Metric | {hdr_rounds} | Where |",
        "|---|" + "---|" * len(rounds) + "---|",
        row("GMTI 2-ch 4096² stream, frames/sec (headline: CSA×2 + balance "
            "+ ATI + DPCA + CA-CFAR, every product plane materialized and "
            "consumed)¹", gmti_fps,
            "bench.py; `ops/pallas/gmti_kernel.py`, `ops/pallas/csa_kernel.py`",
            nd=1),
        row("GMTI per-CPI latency, ms", lambda b: b.get("gmti_latency_ms"),
            "bench.py", nd=2),
        row("vs CPU NumPy reference (same GMTI step)²",
            lambda b: b.get("vs_baseline"), "bench.py", nd=0, suffix="×"),
        row("4096×4096 CSA formation (single-channel stream), frames/sec",
            csa_fps, "bench.py", nd=1),
        row("— same, bf16 class", lambda b: b.get("csa_formation_bf16_fps"),
            "bench.py", nd=1),
        row("VideoSAR BP frame (512², 2,500 pulses, 22k samples), ms cold³",
            lambda b: b.get("bp_frame_ms"), "bench.py; `ops/bp_fast.py`",
            nd=1),
        row("— same, streaming mode (ring-buffered cached spectra), ms",
            lambda b: b.get("bp_stream_frame_ms"), "bench.py", nd=1),
        row("Full ATI-scene echo pass (5,035 targets × 7,200 × 13,200), "
            "s/channel", lambda b: b.get("sim_pass_s"),
            "bench.py; `ops/echo_freq.py`, `ops/pallas/spread_kernel.py`",
            nd=2),
        row("Full-scale end-to-end GMTI collect (2-ch sim → CSA×2 → "
            "products, 7,200×13,200), s", lambda b: b.get("e2e_fullscale_s"),
            "bench.py `e2e_fullscale_s`", nd=2),
        row("HRWS 4-ch reconstruction (4,096² unfold), ms",
            lambda b: b.get("hrws_recon_ms"), "bench.py; `models/hrws.py`",
            nd=1),
        row("— same, azimuth-ghost suppression, dB",
            lambda b: b.get("hrws_ghost_db"), "bench.py", nd=1),
        "",
        "¹ round-1 GMTI rate derives from its latency metric (the round-1 "
        "bench's headline was CSA formation).",
        "² full-product consumption both sides; denominator = pinned-protocol "
        "NumPy oracle (fixed BLAS threads, median of 5) from round 3 on — "
        "earlier denominators swung ~3× with host contention.",
        "³ round-2 bench consumed only `[:1,:1]` product slices (partial "
        "dead-code elimination); fixed in round 3 — and the honest protocol "
        "is still faster.",
        "⁴ two round-5 protocol changes, flagged for cross-round reading: "
        "the echo pass is measured from the production BATCHED two-channel "
        "program (`sim_pass_protocol: batched2ch/2`; earlier rounds timed a "
        "standalone single-channel pass), and the HRWS loop now chains four "
        "recons per sync like every other section (the former per-recon "
        "host fetch made that row ~60% axon-tunnel RTT — 48 vs 17.9 ms "
        "same-day, same code).",
        "",
        f"*(generated by `scripts/sync_scorecards.py` from "
        f"`BENCH_r{cur:02d}.json`; RDA 4096² full chain: 72.8 ms, "
        "docs/ROUND1_NOTES.md)*",
    ]
    return "\n".join(lines)


def readme_headline(b, cur):
    e2e = b.get("e2e_fullscale_s")
    return (
        "**Headline (single TPU v5e chip; driver-measured, "
        f"`BENCH_r{cur:02d}.json`):** the complete two-channel 4096² GMTI "
        "pipeline — CSA×2 formation with channel balance + ATI + DPCA + "
        "CA-CFAR **fused into the K3 megakernel's output pass** (the balance "
        "reduction rides the two-channel K1 pass; K2 runs both channels "
        "through one shared Phi2/Phi3 trig evaluation) — streams at "
        f"**{fmt(gmti_fps(b))} frames/sec per chip** "
        f"({fmt(b.get('gmti_latency_ms'), 2)} ms/CPI, every product plane "
        "materialized and consumed), vs the project's 30 fps target that was "
        f"set for EIGHT chips, and {fmt(b.get('vs_baseline'), 0, True)}× the "
        "pinned-protocol NumPy reference doing the same step. Formation "
        f"alone runs {fmt(csa_fps(b))} fps f32-grade / "
        f"{fmt(b.get('csa_formation_bf16_fps'))} fps bf16 class (lane-packed "
        "four-step DFT kernel). VideoSAR backprojection at the reference "
        "scale (512², 2,500 pulses, 22k samples) takes "
        f"**{fmt(b.get('bp_frame_ms'))} ms/frame** cold via two-level "
        "factorized (sub-aperture) accumulation + the Pallas recentre kernel "
        f"and **{fmt(b.get('bp_stream_frame_ms'))} ms/frame** in the "
        "streaming mode (`videosar.run(stream_spectra='ring')`, CLI "
        "`--stream ring`), where the cached forward spectra ride a "
        "device-resident ring buffer across the 80%-overlapped CPIs. A full "
        "reference-scale ATI echo pass (5,035 targets × 7,200 × 13,200) "
        f"simulates in **{fmt(b.get('sim_pass_s'), 2)} s/channel** through "
        "the VMEM one-hot MXU spread kernel (M-stacked dot) + fused "
        "FFT-convolution kernel; the full-scale end-to-end GMTI collect "
        "(2-channel sim → CSA×2 → products) lands in "
        f"**{fmt(e2e, 2)} s**. Full RDA chain at 4096² in 73 ms "
        "(gather-free 'phase' RCMC)."
    )


def parity_echo(b, cur):
    sim = b.get("sim_pass_s")
    ratio = f"~{14.6 / sim:.0f}x" if sim else "~12x"
    return (
        "ops/echo_freq.py — golden-grade: passes the acceptance budgets vs "
        "the f64 oracle; the scatter-free dense one-hot MXU spreader runs "
        f"the full ATI scene in {fmt(sim, 2)} s/channel pass "
        f"on one v5e (`BENCH_r{cur:02d}.json`) — {ratio} the direct "
        "engine's 14.6 s; VMEM one-hot spread kernel (M-stacked dot) + "
        "fused conv kernel, spread bit-identical to the XLA dense path."
    )


def parity_perf_note(b, cur):
    return (
        f"Headline rates (driver-measured, `BENCH_r{cur:02d}.json` — "
        "regenerate with `scripts/sync_scorecards.py`): 2-channel 4096² "
        f"GMTI stream {fmt(gmti_fps(b))} fps "
        f"({fmt(b.get('gmti_latency_ms'), 2)} ms/CPI); CSA formation "
        f"{fmt(csa_fps(b))} fps f32-grade / "
        f"{fmt(b.get('csa_formation_bf16_fps'))} fps bf16; BP frame "
        f"{fmt(b.get('bp_frame_ms'))} ms cold / "
        f"{fmt(b.get('bp_stream_frame_ms'))} ms streaming; full ATI echo "
        f"pass {fmt(b.get('sim_pass_s'), 2)} s/channel; end-to-end "
        f"full-scale collect {fmt(b.get('e2e_fullscale_s'), 2)} s. "
        "The full per-metric, per-round table lives in BASELINE.md."
    )


def scaling_dp(b):
    """SCALING §1 data-parallel table from the latest bench."""
    rows = []
    csa = csa_fps(b)
    if csa:
        rows.append(("CSA formation only", csa))
    gm = gmti_fps(b)
    if gm:
        rows.append(("formation + GMTI products (headline)", gm))
    bps = b.get("bp_stream_frame_ms")
    if bps:
        rows.append(("BP frames 512^2 (ring-stream path)", 1000.0 / bps))
    lines = ["| pipeline (4096^2, 2-channel) | 1 chip (measured) | "
             "v5e-8 (projected) |", "|---|---|---|"]
    for label, fps in rows:
        lines.append(f"| {label} | {fps:.1f} fps | {8 * fps:,.0f} fps |")
    return "\n".join(lines)


def scaling_cpi(b):
    """SCALING §2 latency-mode projection from the measured CPI."""
    lat = b.get("gmti_latency_ms")
    if not lat:
        return "(no measured CPI in the latest bench artifact)"
    proj = lat / 8.0 + 1.0          # 8-way divide + ~1.0 ms corner turns
    return (f"Compute side at 8-way: the measured {lat:.1f} ms single-chip "
            f"GMTI CPI divides to ~{lat / 8.0:.1f} ms/chip, so the corner "
            "turns add ~" + f"{100.0 * 1.0 / max(proj, 1e-9):.0f}% overhead "
            "unless overlapped (XLA overlaps all_to_all with the local FFT "
            "stages when the schedule allows; even unoverlapped, the "
            f"projected latency-mode CPI is ~{proj:.1f} ms = "
            f"**{1000.0 / proj:,.0f} fps** with one-CPI latency "
            f"~{proj:.1f} ms vs {lat:.1f} ms single-chip).")


def scaling_echo(b):
    sim = b.get("sim_pass_s")
    if not sim:
        return "(no measured sim pass in the latest bench artifact)"
    return (f"the measured {sim:.2f} s/channel pass (VMEM spread kernel + "
            f"fused conv) divides to **~{sim / 8.0:.2f} s/channel on "
            "v5e-8**.")


def scaling_summary(b, cur):
    lat = b.get("gmti_latency_ms")
    gm = gmti_fps(b)
    bps = b.get("bp_stream_frame_ms")
    sim = b.get("sim_pass_s")
    lines = [f"| metric | single chip (measured, BENCH_r{cur:02d}) | "
             "v5e-8 projected | comm share |", "|---|---|---|---|"]
    if gm:
        lines.append(f"| GMTI stream throughput | {gm:.1f} fps | "
                     f"{8 * gm:,.0f} fps (dp) | 0% |")
    if lat:
        proj = lat / 8.0 + 1.0
        lines.append(f"| GMTI single-CPI latency | {lat:.1f} ms | "
                     f"~{proj:.1f} ms (sp) | "
                     f"~{100.0 * 1.0 / proj:.0f}% |")
    if bps:
        lines.append(f"| BP 512^2 frame throughput | "
                     f"{1000.0 / bps:.0f} fps (ring stream) | "
                     f"{8000.0 / bps:,.0f} fps (dp) | 0% |")
    if sim:
        lines.append(f"| full ATI-scene sim pass | {sim:.2f} s | "
                     f"~{sim / 8.0:.2f} s | ~0% |")
    return "\n".join(lines)


def splice(path: pathlib.Path, name: str, body: str):
    text = path.read_text()
    pat = re.compile(
        rf"(<!-- SYNC:{name} -->\n).*?(\n<!-- /SYNC:{name} -->)", re.S)
    if not pat.search(text):
        sys.exit(f"{path.name}: marker SYNC:{name} not found")
    path.write_text(pat.sub(lambda m: m.group(1) + body + m.group(2), text))
    print(f"synced {path.name}:{name}")


def main():
    benches = load_benches()
    cur = max(benches)
    b = benches[cur]
    splice(ROOT / "README.md", "headline", readme_headline(b, cur))
    splice(ROOT / "BASELINE.md", "measured", baseline_table(benches))
    splice(ROOT / "PARITY.md", "echo", parity_echo(b, cur))
    splice(ROOT / "PARITY.md", "perf", parity_perf_note(b, cur))
    scal = ROOT / "docs" / "SCALING.md"
    splice(scal, "scaling_dp", scaling_dp(b))
    splice(scal, "scaling_cpi", scaling_cpi(b))
    splice(scal, "scaling_echo", scaling_echo(b))
    splice(scal, "scaling_summary", scaling_summary(b, cur))


if __name__ == "__main__":
    main()
