"""Head-to-head benchmark: this framework vs the compiled C++ reference.

Builds the reference (parity/build_reference.sh), synthesizes a 1080p
clip, runs both implementations on it end to end (cuts captured by
stand-ins so only scan+segment work is timed), verifies the concat lists
are byte-identical, and prints a comparison table.

Usage: python benchmarks/compare_reference.py [--duration 120] [--runs 2]

Notes on reading the numbers on a shared/dev TPU environment: the rebuild
pays a one-time jit compilation ("warmup(jit)" phase) that production
hosts amortize via the persistent compilation cache or long-lived batch
processes; steady_state_sec excludes it, total_sec includes it.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = "/tmp/mvt_ref_build"


def ensure_reference() -> tuple[str, str]:
    binary = os.path.join(BUILD, "motion_trim")
    shim = os.path.join(BUILD, "libinterpose_system.so")
    if not (os.path.exists(binary) and os.path.exists(shim)):
        subprocess.run([os.path.join(REPO, "parity", "build_reference.sh"),
                        BUILD], check=True, capture_output=True, timeout=600)
    return binary, shim


def run_reference(binary, shim, clip, runs):
    walls = []
    concat = "/tmp/bench_ref_concat.txt"
    for _ in range(runs):
        env = dict(os.environ, LD_PRELOAD=shim, MVT_CONCAT_DUMP=concat)
        t0 = time.perf_counter()
        subprocess.run([binary, clip, "/tmp/bench_ref_out.mp4"], env=env,
                       check=True, capture_output=True, timeout=600)
        walls.append(time.perf_counter() - t0)
    return min(walls), open(concat).read()


def run_ours(clip, runs):
    walls, steadies, marginals = [], [], []
    concat = "/tmp/bench_our_concat.txt"
    for _ in range(runs):
        env = dict(os.environ,
                   MVT_FFMPEG_BIN=os.path.join(REPO, "parity",
                                               "fake_ffmpeg.sh"),
                   MVT_CONCAT_DUMP=concat, MVT_LOG="0")
        t0 = time.perf_counter()
        res = subprocess.run(
            [sys.executable, "-m", "mvtrim_tpu", clip,
             "/tmp/bench_our_out.mp4"],
            env=env, cwd=REPO, check=True, capture_output=True, text=True,
            timeout=1800)
        wall = time.perf_counter() - t0
        walls.append(wall)
        m = re.search(r"warmup\(jit\)\s+([0-9.]+)s", res.stdout)
        warmup = float(m.group(1)) if m else 0.0
        steadies.append(wall - warmup)
        m = re.search(r"total_run\s+([0-9.]+)s", res.stdout)
        total_run = float(m.group(1)) if m else wall
        # marginal per-video cost: pipeline time minus one-time compile —
        # what each additional video costs in batch/daemon operation
        marginals.append(total_run - warmup)
    return min(walls), min(steadies), min(marginals), open(concat).read()


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--duration", type=float, default=120.0)
    parser.add_argument("--runs", type=int, default=2)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    args = parser.parse_args()

    sys.path.insert(0, REPO)
    from mvtrim_tpu.io import native

    clip = "/tmp/bench_compare_clip.mp4"
    if not os.path.exists(clip):
        print(f"synthesizing {args.duration:.0f}s "
              f"{args.width}x{args.height} clip...", file=sys.stderr)
        native.synthesize(
            clip, width=args.width, height=args.height, fps=25.0,
            duration=args.duration, codec="libx264",
            motion_windows=((args.duration * 0.1, args.duration * 0.2),
                            (args.duration * 0.5, args.duration * 0.65),
                            (args.duration * 0.85, args.duration * 0.9)))

    binary, shim = ensure_reference()
    print("timing reference...", file=sys.stderr)
    ref_wall, ref_concat = run_reference(binary, shim, clip, args.runs)
    print("timing rebuild...", file=sys.stderr)
    our_wall, our_steady, our_marginal, our_concat = run_ours(clip,
                                                              args.runs)

    frames = args.duration * 25.0
    result = {
        "clip": {"resolution": f"{args.width}x{args.height}",
                 "duration_sec": args.duration, "frames": frames},
        "reference_cpp": {
            "wall_sec": round(ref_wall, 2),
            "frames_per_sec": round(frames / ref_wall),
        },
        "rebuild_tpu": {
            "wall_sec": round(our_wall, 2),
            "steady_state_sec": round(our_steady, 2),
            "marginal_per_video_sec": round(our_marginal, 2),
            "marginal_frames_per_sec": round(frames / our_marginal),
        },
        "concat_lists_identical": our_concat == ref_concat,
    }
    print(json.dumps(result, indent=2))
    return 0 if result["concat_lists_identical"] else 1


if __name__ == "__main__":
    sys.exit(main())
