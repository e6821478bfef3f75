"""tune — sweep detector configs over one decode of a video.

Scans the clip once — the native layer scatters one vote grid per
MV_THRESHOLD_SQ candidate during decode (mvt_scan_grids_multi) — then
scores every (threshold, VECTORS_NEEDED, CLUSTERS_NEEDED) combination with
the vote-sweep device op (ops/sweep.py), reporting motion frames, segment
count and savings per config.

The reference needs one full re-run per candidate; here a K-config grid
costs one decode plus K tiny device reductions: H2D is K*gh*gw bytes per
frame instead of the raw-MV export's max_mv*8.

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
from ..ops.sweep import make_vote_sweep_op


def sweep(input_path: str, thresholds, vectors, clusters, *,
          cfg: Config | None = None, batch_frames: int = 512) -> list[dict]:
    import jax

    cfg = cfg or Config.from_env()
    thresholds = list(thresholds)
    vc_pairs = [(v, c) for v in vectors for c in clusters]
    vec_needs = np.asarray([v for v, _ in vc_pairs], np.int32)
    clust_needs = np.asarray([c for _, c in vc_pairs], np.int32)

    reader = native.VideoReader(input_path)
    duration, fps = reader.duration, reader.fps
    geom = GridGeometry.build(reader.width, reader.height, cfg)
    frame_skip = cfg.frame_skip(fps)
    op = make_vote_sweep_op(geom)
    gh_p, gw_p = geom.padded_gh, geom.padded_gw

    # motion_ts[(threshold index, vc index)] -> timestamps
    motion_ts: dict[tuple[int, int], list[float]] = {
        (ti, vi): [] for ti in range(len(thresholds))
        for vi in range(len(vc_pairs))
    }

    t = 0.0
    chunk = cfg.chunk_duration_sec
    cap = int(math.ceil(chunk * max(fps, 1.0))) + 64
    while t < duration:
        end = min(t + chunk, duration)
        grids, pts = reader.scan_grids_multi(
            t, end, thresholds_sq=thresholds,
            block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
            y_min=geom.y_min, y_max=geom.y_max,
            frame_skip=frame_skip, max_frames=cap)
        t = float(pts[-1]) + 1e-6 if len(pts) == cap else end
        if len(pts) == 0:
            continue
        for lo in range(0, len(pts), batch_frames):
            hi = min(lo + batch_frames, len(pts))
            pad = batch_frames - (hi - lo)
            for ti in range(len(thresholds)):
                batch = np.zeros((batch_frames, gh_p, gw_p), np.uint8)
                batch[:hi - lo, :geom.gh, :geom.gw] = grids[lo:hi, ti]
                motion = np.asarray(op(batch, vec_needs, clust_needs))
                for vi in range(len(vc_pairs)):
                    sel = motion[:hi - lo, vi]
                    motion_ts[(ti, vi)].extend(pts[lo:hi][sel].tolist())
            del pad
    reader.close()

    results = []
    for ti, thr in enumerate(thresholds):
        for vi, (vec, clu) in enumerate(vc_pairs):
            merged = oracle.merge_timestamps(motion_ts[(ti, vi)])
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
