"""tune — sweep detector configs over one decode of a video.

Scans the clip's motion vectors once, then scores a grid of
(MV_THRESHOLD_SQ, VECTORS_NEEDED, CLUSTERS_NEEDED) candidates in a single
device pass per batch (ops/sweep.py), reporting motion frames, segment
count and savings for each.  The reference needs one full re-run per
candidate; here the whole grid costs one decode.

Usage:
  python -m mvtrim_tpu.tools.tune input.mp4 \
      [--thresholds 4,16,64] [--vectors 1,2,4] [--clusters 1,2,4]
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

from ..core import oracle
from ..core.config import Config
from ..core.types import GridGeometry
from ..io import native
from ..ops.mv_vote import threshold_bound
from ..ops.sweep import make_mv_sweep_op


def sweep(input_path: str, thresholds, vectors, clusters, *,
          cfg: Config | None = None, max_mv: int = 8192,
          batch_frames: int = 256) -> list[dict]:
    cfg = cfg or Config.from_env()
    configs = [(t, v, c) for t in thresholds for v in vectors
               for c in clusters]
    k = len(configs)
    bounds = np.asarray([threshold_bound(t) for t, _, _ in configs],
                        np.int32)
    vec_needs = np.asarray([v for _, v, _ in configs], np.int32)
    clust_needs = np.asarray([c for _, _, c in configs], np.int32)

    reader = native.VideoReader(input_path)
    duration, fps = reader.duration, reader.fps
    geom = GridGeometry.build(reader.width, reader.height, cfg)
    op = make_mv_sweep_op(geom, cfg.block_shift)
    frame_skip = cfg.frame_skip(fps)

    motion_ts: list[list[float]] = [[] for _ in range(k)]
    t = 0.0
    chunk = cfg.chunk_duration_sec
    cap = int(math.ceil(chunk * max(fps, 1.0))) + 64
    while t < duration:
        end = min(t + chunk, duration)
        mvs, counts, pts = reader.scan_mvs(
            t, end, frame_skip=frame_skip, max_frames=cap, max_mv=max_mv)
        # resume past the frame cap (VFR bursts) instead of skipping to
        # the next window
        t = float(pts[-1]) + 1e-6 if len(pts) == cap else end
        if len(pts) == 0:
            continue
        # overflowed frames (negative counts) are clipped to capacity;
        # size max_mv to avoid this in practice
        dev_counts = np.abs(counts).clip(max=max_mv).astype(np.int32)
        for lo in range(0, len(pts), batch_frames):
            hi = min(lo + batch_frames, len(pts))
            pad = batch_frames - (hi - lo)
            sl = slice(lo, hi)
            f = lambda a: np.pad(a[sl], [(0, pad)] + [(0, 0)] * (a.ndim - 1))
            motion = np.asarray(op(
                f(mvs[..., 0].astype(np.int32)),
                f(mvs[..., 1].astype(np.int32)),
                f(mvs[..., 2].astype(np.int32)),
                f(mvs[..., 3].astype(np.int32)),
                f(dev_counts), bounds, vec_needs, clust_needs))
            for ki in range(k):
                motion_ts[ki].extend(pts[sl][motion[:hi - lo, ki]].tolist())
    reader.close()

    results = []
    for (thr, vec, clu), ts in zip(configs, motion_ts):
        merged = oracle.merge_timestamps(ts)
        segments = oracle.segments_from_timestamps(
            merged, max_gap_sec=cfg.max_gap_sec,
            padding_sec=cfg.padding_sec, duration=duration)
        _, saved_pct = oracle.savings(segments, duration)
        results.append({
            "mv_threshold_sq": thr,
            "vectors_needed": vec,
            "clusters_needed": clu,
            "motion_frames": int(merged.size),
            "segments": len(segments),
            "saved_pct": round(saved_pct, 2),
        })
    return results


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tune")
    parser.add_argument("input")
    parser.add_argument("--thresholds", default="4,16,64")
    parser.add_argument("--vectors", default="1,2,4")
    parser.add_argument("--clusters", default="1,2,4")
    args = parser.parse_args(argv)

    thresholds = [float(x) for x in args.thresholds.split(",")]
    vectors = [int(x) for x in args.vectors.split(",")]
    clusters = [int(x) for x in args.clusters.split(",")]
    results = sweep(args.input, thresholds, vectors, clusters)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
