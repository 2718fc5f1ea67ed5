"""Healthy-window hardware measurement campaign.

The axon TPU tunnel alternates healthy windows (HBM probe 423-429 GB/s)
with degraded (~70-130) and wedged ones (docs/PERF.md "Timing
methodology"). Several round-2 A/Bs were measured only in degraded
windows and are queued for healthy-window confirmation. This runner:

1. probes sustained HBM bandwidth in a SUBPROCESS (a wedged tunnel
   hangs rather than raising — the subprocess is killed by timeout);
2. when the window is healthy (>= SDR_CAMPAIGN_MIN_BW, default 300),
   runs the next queued measurement as a subprocess with its own env;
3. re-probes after the run and appends one JSON record per attempt to
   docs/hw_campaign.jsonl with pre/post bandwidth so every number is
   labeled by the window it was measured in;
4. an item is DONE once it has a record with healthy pre AND post
   probes; unhealthy attempts are retried (bounded per item).

Run it in the background and read the JSONL:
    python scripts/hw_campaign.py --hours 8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "docs", "hw_campaign.jsonl")
# Prepend the repo but KEEP the inherited path — /root/.axon_site must
# stay on PYTHONPATH or the axon TPU plugin fails to register.
PYPATH = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

WB = {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_BATCH": "256", "SDR_BENCH_SYMS": "8"}
HEAD = {"SDR_BENCH_NFFT": "256", "SDR_BENCH_CP": "64",
        "SDR_BENCH_BATCH": "4096", "SDR_BENCH_SYMS": "64"}

CAMPAIGN = [
    # Round 5 first: the library-entry headline, the LLR-materializing
    # terminal (f32/bf16 out), the sublane LDPC decoder (flooding +
    # layered), the coded fast engine (staged vs fused seam), and the
    # kernel-channel e2e engine — each wants one healthy-window
    # confirmation with the same probe-labeled discipline.
    ("r5_headline_library_entry", "../bench.py", {"SDR_BENCH_RETRY_S": "0"}),
    # (the first r5_llr_plane_* runs inherited bench_demod's 4096sc
    # default — recorded as such; these pin the 256sc headline shape)
    ("r5_llr_plane_f32_256sc", "bench_demod.py",
     {"SDR_BENCH_NFFT": "256", "SDR_BENCH_CP": "64",
      "SDR_BENCH_SYMS": "64", "SDR_BENCH_LAYOUT": "cl",
      "SDR_BENCH_TERMINAL": "llr_plane", "SDR_BENCH_BATCH": "8192",
      "SDR_BENCH_INPUT_DTYPE": "bf16"}),
    ("r5_llr_plane_bf16_256sc", "bench_demod.py",
     {"SDR_BENCH_NFFT": "256", "SDR_BENCH_CP": "64",
      "SDR_BENCH_SYMS": "64", "SDR_BENCH_LAYOUT": "cl",
      "SDR_BENCH_TERMINAL": "llr_plane", "SDR_BENCH_BATCH": "8192",
      "SDR_BENCH_INPUT_DTYPE": "bf16", "SDR_BENCH_LLR_DTYPE": "bf16"}),
    ("r5_count_narrow_idx_256sc", "bench_demod.py",
     {"SDR_BENCH_NFFT": "256", "SDR_BENCH_CP": "64",
      "SDR_BENCH_SYMS": "64", "SDR_BENCH_LAYOUT": "cl",
      "SDR_BENCH_TERMINAL": "count", "SDR_BENCH_BATCH": "8192",
      "SDR_BENCH_INPUT_DTYPE": "bf16"}),
    ("r5_fast_payload_kernel_32k", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "32768", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "fast",
      "SDR_BENCH_CHANNEL_MODEL": "rayleigh_flat"}),
    ("r5_fast_fused_txchannel_32k", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "32768", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "fast",
      "SDR_BENCH_CHANNEL_MODEL": "rayleigh_flat"}),
    ("r5_fast_fused_multipath_8k", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "8192", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "fast",
      "SDR_BENCH_CHANNEL_MODEL": "multipath"}),
    ("r5_mc_32k_same_window", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "32768", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "mc"}),
    ("r5_coded_fused_txchannel_4096", "bench_coded.py",
     {"SDR_BENCH_CHANNELS": "4096", "SDR_BENCH_CODED_ENGINE": "fused",
      "SDR_BENCH_LDPC_SCHEDULE": "layered", "SDR_BENCH_LDPC_ITERS": "13"}),
    ("r5_ldpc_flooding_16k", "bench_ldpc.py",
     {"SDR_BENCH_LDPC_CW": "16384", "SDR_BENCH_ITERS": "3"}),
    ("r5_ldpc_layered13_16k", "bench_ldpc.py",
     {"SDR_BENCH_LDPC_CW": "16384", "SDR_BENCH_ITERS": "3",
      "SDR_BENCH_LDPC_SCHEDULE": "layered", "SDR_BENCH_LDPC_ITERS": "13"}),
    ("r5_coded_fused_4096", "bench_coded.py",
     {"SDR_BENCH_CHANNELS": "4096", "SDR_BENCH_CODED_ENGINE": "fused",
      "SDR_BENCH_LDPC_SCHEDULE": "layered", "SDR_BENCH_LDPC_ITERS": "13"}),
    ("r5_coded_staged_4096", "bench_coded.py",
     {"SDR_BENCH_CHANNELS": "4096", "SDR_BENCH_CODED_ENGINE": "staged",
      "SDR_BENCH_LDPC_SCHEDULE": "layered", "SDR_BENCH_LDPC_ITERS": "13"}),
    ("r5_fast_kernel_channel_32k", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "32768", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "fast",
      "SDR_BENCH_CHANNEL_MODEL": "rayleigh_flat"}),
    ("r5_fast_threefry_32k", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "32768", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "fast",
      "SDR_BENCH_CHANNEL_MODEL": "rayleigh_flat",
      "SDR_TPU_CHANNEL_BACKEND": "jnp"}),
    ("r5_wb4096_cl_f32cascade", "bench_demod.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_BATCH": "4096", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_LAYOUT": "cl", "SDR_BENCH_INPUT_DTYPE": "bf16"}),
    # Round 4 next: the channels-last pipelined headline (bench.py
    # defaults to it), its block-shape knobs, the fast-SSCL polar
    # decoder, and the fused wideband SC-FDE — each wants one
    # healthy-window (>= 300 GB/s probe) confirmation; 0/52+ probes
    # have ever read healthy, so these double as the round-5 recapture
    # hooks (VERDICT round 3 item 9).
    ("r4_headline_cl", "../bench.py", {"SDR_BENCH_RETRY_S": "0"}),
    ("r4_headline_cl_lb512", "../bench.py",
     {"SDR_BENCH_RETRY_S": "0", "SDR_TPU_CL_LB": "512",
      "SDR_TPU_CL_SBLK": "8"}),
    ("r4_headline_cl_sblk32", "../bench.py",
     {"SDR_BENCH_RETRY_S": "0", "SDR_TPU_CL_SBLK": "32"}),
    ("r4_headline_rows_legacy", "../bench.py",
     {"SDR_BENCH_RETRY_S": "0", "SDR_BENCH_LAYOUT": "rows"}),
    ("r4_polar_fast_256", "bench_polar.py",
     {"SDR_BENCH_POLAR_CW": "8192", "SDR_BENCH_ITERS": "2"}),
    ("r4_polar_fast_1024", "bench_polar.py",
     {"SDR_BENCH_POLAR_N": "1024", "SDR_BENCH_POLAR_CW": "2048",
      "SDR_BENCH_ITERS": "2"}),
    ("r4_polar_scan_256", "bench_polar.py",
     {"SDR_BENCH_POLAR_CW": "1024", "SDR_BENCH_ITERS": "2",
      "SDR_BENCH_POLAR_DECODER": "scan"}),
    ("r4_wb4096_cl", "bench_demod.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_BATCH": "4096", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_LAYOUT": "cl", "SDR_BENCH_INPUT_DTYPE": "bf16",
      "SDR_TPU_CL_LB": "256", "SDR_TPU_CL_SBLK": "1"}),
    ("r4_wb4096_fourstep2_same_window", "bench_demod.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_BATCH": "4096", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_INPUT_DTYPE": "bf16",
      "SDR_TPU_DEMOD_BACKEND": "fourstep2"}),
    ("r4_wb_scfdma_fast", "bench_link.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_CHANNELS": "512", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "fast",
      "SDR_BENCH_DFT": "1"}),
    ("r4_wb_ofdm_fast", "bench_link.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_CHANNELS": "512", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_ITERS": "4", "SDR_BENCH_ENGINE": "fast"}),
    ("r4_link_mc_tdl", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "512", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "mc",
      "SDR_BENCH_CHANNEL_MODEL": "multipath_time"}),
    # Headline terminal + the bf16x2 decision A/B (PERF.md round 2).
    ("headline_256_llr_bf16x3", "bench_demod.py", {**HEAD}),
    ("headline_256_llr_bf16x2", "bench_demod.py",
     {**HEAD, "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    ("count_256_bf16x3", "bench_demod.py",
     {**HEAD, "SDR_BENCH_TERMINAL": "count"}),
    ("headline_256_llr_bf16x3_B8192", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "8192"}),
    ("headline_256_llr_bf16x2_B8192", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "8192", "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    # Wideband (config-5 numerology) demod backend ladder.
    ("wb4096_hybrid", "bench_demod.py",
     {**WB, "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("wb4096_fourstep", "bench_demod.py",
     {**WB, "SDR_TPU_DEMOD_BACKEND": "fourstep"}),
    ("wb4096_fourstep2_f32", "bench_demod.py",
     {**WB, "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "f32"}),
    ("wb4096_fourstep2_bf16", "bench_demod.py",
     {**WB, "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_fourstep2_bf16_x2", "bench_demod.py",
     {**WB, "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16", "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    ("wb4096_fourstep2_bf16_B512", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "512", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_hybrid_B512", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "512", "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("wb4096_count_fourstep2_bf16", "bench_demod.py",
     {**WB, "SDR_BENCH_TERMINAL": "count",
      "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    # Repeats for the unstable headline orderings + batch scaling.
    ("headline_256_llr_bf16x3_B8192_r2", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "8192"}),
    ("headline_256_llr_bf16x2_B8192_r2", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "8192", "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    ("headline_256_llr_bf16x3_B8192_r3", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "8192"}),
    ("headline_256_llr_bf16x2_B8192_r3", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "8192", "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    ("wb4096_fourstep2_bf16_B1024", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "1024", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_hybrid_B1024", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "1024", "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("wb4096_fourstep2_bf16_B512_r2", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "512", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_fourstep2_bf16_B1024_r2", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "1024", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_hybrid_B1024_r2", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "1024", "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("wb4096_fourstep2_bf16_B2048", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "2048", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_hybrid_B2048", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "2048", "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("headline_256_llr_bf16x2_B16384", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "16384",
      "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    # Pass 4: batch asymptote + adjacent-pair wideband crossover repeats.
    ("headline_256_llr_bf16x2_B32768", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "32768",
      "SDR_TPU_MXU_PRECISION": "bf16x2"}),
    ("headline_256_llr_bf16x3_B16384", "bench_demod.py",
     {**HEAD, "SDR_BENCH_BATCH": "16384"}),
    ("wb4096_fourstep2_bf16_B2048_r2", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "2048", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_hybrid_B2048_r2", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "2048", "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("wb4096_fourstep2_bf16_B2048_r3", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "2048", "SDR_TPU_DEMOD_BACKEND": "fourstep2",
      "SDR_TPU_FOURSTEP_STAGE": "bf16"}),
    ("wb4096_hybrid_B2048_r3", "bench_demod.py",
     {**WB, "SDR_BENCH_BATCH": "2048", "SDR_TPU_DEMOD_BACKEND": "hybrid"}),
    ("wb4096_link_mc_r2", "bench_link.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_CHANNELS": "64", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "mc"}),
    ("ldpc_decode_r12", "bench_ldpc.py", {}),
    ("ldpc_decode_r34", "bench_ldpc.py", {"SDR_BENCH_LDPC_RATE": "3/4"}),
    # End-to-end simulation engines (N-only accounting).
    ("link256_fast", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "512", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "fast"}),
    ("link256_mc", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "512", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "mc"}),
    ("link256_mc_jakes", "bench_link.py",
     {"SDR_BENCH_CHANNELS": "512", "SDR_BENCH_SYMS": "64",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "mc",
      "SDR_BENCH_CHANNEL_MODEL": "rayleigh_time"}),
    ("wb4096_link_mc", "bench_link.py",
     {"SDR_BENCH_NFFT": "4096", "SDR_BENCH_CP": "512",
      "SDR_BENCH_CHANNELS": "64", "SDR_BENCH_SYMS": "8",
      "SDR_BENCH_ITERS": "8", "SDR_BENCH_ENGINE": "mc"}),
]


def probe(timeout_s: float = 300.0) -> float:
    """HBM GB/s via a subprocess (hang-proof); -1 on failure/timeout."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "from sdr_tpu.obs.health import hbm_bandwidth_gbps;"
             "print(hbm_bandwidth_gbps())"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=REPO, env={**os.environ, "PYTHONPATH": PYPATH},
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:
        return -1.0


def last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def record(rec: dict) -> None:
    rec["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def load_done(min_bw: float) -> set:
    """Items already measured in a window that satisfies the CURRENT
    bandwidth gate (recomputed from the stored probes, so a permissive
    pass never marks items done for a later, stricter one)."""
    done = set()
    if os.path.exists(LOG):
        with open(LOG) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ok = (
                    rec.get("result") is not None
                    and rec.get("bw_pre", -1) >= min_bw
                    and rec.get("bw_post", -1) >= min_bw
                )
                if ok:
                    done.add(rec.get("name"))
    return done


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=8.0)
    p.add_argument("--min-bw", type=float,
                   default=float(os.environ.get("SDR_CAMPAIGN_MIN_BW", "300")))
    p.add_argument("--item-timeout", type=float, default=900.0)
    p.add_argument("--max-attempts", type=int, default=6)
    p.add_argument("--only", default=None,
                   help="comma list of item names to run (default: all)")
    args = p.parse_args()

    deadline = time.monotonic() + args.hours * 3600
    names = None if not args.only else set(args.only.split(","))
    attempts: dict = {}

    while time.monotonic() < deadline:
        done = load_done(args.min_bw)
        pending = [
            it for it in CAMPAIGN
            if it[0] not in done
            and (names is None or it[0] in names)
            and attempts.get(it[0], 0) < args.max_attempts
        ]
        if not pending:
            print("# campaign complete", flush=True)
            return
        bw = probe()
        print(f"# probe: {bw:.0f} GB/s, {len(pending)} pending", flush=True)
        if bw < args.min_bw:
            time.sleep(90)
            continue
        name, script, env = pending[0]
        attempts[name] = attempts.get(name, 0) + 1
        try:
            run = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", script)],
                capture_output=True, text=True, timeout=args.item_timeout,
                cwd=REPO, env={**os.environ, **env, "PYTHONPATH": PYPATH},
            )
            result = last_json_line(run.stdout)
            err_tail = run.stderr.strip().splitlines()[-2:]
        except subprocess.TimeoutExpired:
            result, err_tail = None, ["TIMEOUT"]
        bw_post = probe()
        record({
            "name": name, "env": env, "bw_pre": bw, "bw_post": bw_post,
            "healthy": bw >= args.min_bw and bw_post >= args.min_bw,
            "result": result, "stderr_tail": err_tail,
            "attempt": attempts[name],
        })
    print("# campaign deadline reached", flush=True)


if __name__ == "__main__":
    main()
