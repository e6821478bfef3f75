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
          cfg: Config | None = None, batch_frames: int = 512,
          device_stats: bool = False,
          scan_input: str = "grids", mesh=None) -> list[dict]:
    """Score every config combination over one decode.

    ``device_stats=False`` (default): per-batch motion booleans come back
    to the host and segmentation/savings run through the float64 oracle —
    bit-exact with what a pipeline run at that config would decide.

    ``device_stats=True``: motion stays device-resident for the whole
    scan; at the end ONE vmapped dispatch of the streaming segmentation
    op (ops/segmentation.py lax.scan carry) produces the entire
    (threshold x config) stats table — segment counts, kept seconds,
    savings — with a single host round trip.  Timestamps are f32 on
    device, so savings can differ from the oracle in the last decimals;
    use it for tuning sweeps, not for cut lists.

    ``scan_input`` picks the H2D payload, like the pipeline's
    MVT_SCAN_INPUT: 'grids' scatters one vote grid per threshold during
    decode (mvt_scan_grids_multi — K*gh*gw bytes/frame, near-zero device
    math per config); 'mv_raw' exports raw MV fields once and sweeps the
    magnitude thresholds as device data (ops/sweep.make_mv_sweep_op) —
    for hosts where the scatter CPU is the constraint.  Identical
    decisions either way (the integer bound reproduces the double
    threshold compare exactly — ops/mv_vote.threshold_bound).

    ``mesh`` (a jax.sharding.Mesh with 'data'/'sweep' axes, e.g. from
    parallel.mesh.build_mesh) shards the scoring across chips: frames
    over 'data', (vectors, clusters) pairs over 'sweep', one
    sharded_scan_step dispatch per (batch, threshold) — the multi-chip
    sweep the reference would need one box-wide re-run per config for.
    Decisions are identical to the single-device path (asserted in
    tests/test_sweep.py on the 8-device CPU mesh).
    """
    import jax

    cfg = cfg or Config.from_env()
    thresholds = list(thresholds)
    vc_pairs = [(v, c) for v in vectors for c in clusters]
    # the reference stores VECTORS_NEEDED as uint8 (config.hpp:74) and
    # Config.__post_init__ wraps to match; sweeping the raw value would
    # score configs the reference cannot express (256 vs 0, -1 vs 255)
    vec_needs = np.asarray([v & 0xFF for v, _ in vc_pairs], np.int32)
    clust_needs = np.asarray([c for _, c in vc_pairs], np.int32)
    # effective vec == 0: zero votes satisfy >= 0, but the reference
    # still decides MV-less frames False before phase 2 runs
    # (motion_scanner.cpp:219-221) — those frames need masking because
    # a zero vote grid cannot carry the distinction
    vec0 = vec_needs == 0

    reader = native.VideoReader(input_path)
    duration, fps = reader.duration, reader.fps
    geom = GridGeometry.build(reader.width, reader.height, cfg)
    frame_skip = cfg.frame_skip(fps)
    gh_p, gw_p = geom.padded_gh, geom.padded_gw

    # motion_ts[(threshold index, vc index)] -> timestamps (host path)
    motion_ts: dict[tuple[int, int], list[float]] = {
        (ti, vi): [] for ti in range(len(thresholds))
        for vi in range(len(vc_pairs))
    }
    # device path: per-threshold lists of (motion device array, n_valid)
    dev_motion: list[list] = [[] for _ in thresholds]
    all_pts: list[np.ndarray] = []

    if scan_input == "mv_raw":
        if mesh is not None:
            raise ValueError("--mesh supports the grids scan input only")
        _sweep_mv_raw(reader, cfg, geom, thresholds, vc_pairs,
                      frame_skip, batch_frames, device_stats,
                      motion_ts, dev_motion, all_pts)
    else:
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import sharded_scan_step

            data_size = mesh.shape["data"]
            sweep_size = mesh.shape["sweep"]
            # frames pad to the data axis, configs to the sweep axis;
            # pad configs score with clusters_needed = INT32_MAX so they
            # decide False and slice off
            batch_frames = ((batch_frames + data_size - 1)
                            // data_size) * data_size
            kp = ((len(vc_pairs) + sweep_size - 1)
                  // sweep_size) * sweep_size
            vec_p = np.ones((kp,), np.int32)
            clu_p = np.full((kp,), np.iinfo(np.int32).max, np.int32)
            vec_p[:len(vc_pairs)] = vec_needs
            clu_p[:len(vc_pairs)] = np.maximum(1, clust_needs)
            step = sharded_scan_step(geom, cfg, mesh, sweep_clusters=True)
            votes_sh = NamedSharding(mesh, P("data", None, None))
            cfg_sh = NamedSharding(mesh, P("sweep"))
            vec_dev = jax.device_put(vec_p, cfg_sh)
            clu_dev = jax.device_put(clu_p, cfg_sh)

            def score(batch):
                m, _ = step(jax.device_put(batch, votes_sh),
                            vec_dev, clu_dev)
                return m[:, :len(vc_pairs)]
        else:
            op = make_vote_sweep_op(geom)

            def score(batch):
                return op(batch, vec_needs, clust_needs)
        import jax.numpy as jnp

        cap = int(math.ceil(cfg.chunk_duration_sec * max(fps, 1.0))) + 64
        cur = native.ChunkScanCursor(duration, cfg.chunk_duration_sec, cap)
        # Host path: one staging buffer for the whole sweep — each
        # dispatch is resolved (np.asarray) before the next overwrite.
        # device_stats path: dispatches stay LAZY until the end and the
        # CPU backend may alias numpy buffers zero-copy, so reuse would
        # feed later batches' data to earlier dispatches (caught by
        # test_device_stats_matches_host_path) — allocate per dispatch.
        batch = (None if device_stats
                 else np.zeros((batch_frames, gh_p, gw_p), np.uint8))
        while cur.more():
            start, end = cur.window()
            grids, pts, has_mv = reader.scan_grids_multi(
                start, end, thresholds_sq=thresholds,
                block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
                y_min=geom.y_min, y_max=geom.y_max,
                frame_skip=frame_skip, max_frames=cap, resume=cur.resume)
            cur.advance(len(pts))
            if len(pts) == 0:
                continue
            if device_stats:
                all_pts.append(pts)
            for lo in range(0, len(pts), batch_frames):
                hi = min(lo + batch_frames, len(pts))
                if vec0.any():
                    # reference `!sd -> false` for the vec==0 columns
                    # (zero grids cannot represent "no side data")
                    allow = np.ones((batch_frames, len(vc_pairs)), bool)
                    allow[:hi - lo] = has_mv[lo:hi, None] | ~vec0[None, :]
                for ti in range(len(thresholds)):
                    if device_stats:
                        batch = np.zeros((batch_frames, gh_p, gw_p),
                                         np.uint8)
                    else:
                        batch[hi - lo:, :geom.gh, :geom.gw] = 0
                    batch[:hi - lo, :geom.gh, :geom.gw] = grids[lo:hi, ti]
                    motion = score(batch)
                    if vec0.any():
                        motion = motion & jnp.asarray(allow)
                    if device_stats:
                        # async dispatch; resolution happens on-device at
                        # the end via the segmentation op — no host round
                        # trip
                        dev_motion[ti].append((motion, hi - lo))
                    else:
                        motion = np.asarray(motion)
                        for vi in range(len(vc_pairs)):
                            sel = motion[:hi - lo, vi]
                            motion_ts[(ti, vi)].extend(
                                pts[lo:hi][sel].tolist())
    reader.close()

    results = []
    if device_stats:
        import jax.numpy as jnp
        from ..ops.segmentation import make_segment_op

        # segment capacity: the gap rule bounds how many segments can fit
        max_segments = min(4096, int(duration /
                                     max(1e-6, cfg.max_gap_sec)) + 2)
        seg_op = make_segment_op(max_segments,
                                 max_gap_sec=cfg.max_gap_sec,
                                 padding_sec=cfg.padding_sec)
        ts = jnp.asarray(np.concatenate(all_pts) if all_pts
                         else np.zeros((1,)), jnp.float32)
        dur = jnp.float32(duration)

        def per_threshold(parts):
            motion = jnp.concatenate(
                [m[:n] for m, n in parts], axis=0)          # [N, K]
            starts, ends, count, kept = jax.vmap(
                lambda col: seg_op(ts, col, dur), in_axes=1)(motion)
            return count, kept, motion.sum(axis=0)

        for ti, thr in enumerate(thresholds):
            if not dev_motion[ti]:
                count = kept = frames = np.zeros((len(vc_pairs),))
            else:
                count, kept, frames = (np.asarray(x)
                                       for x in per_threshold(
                                           dev_motion[ti]))
            for vi, (vec, clu) in enumerate(vc_pairs):
                kept_s = float(kept[vi])
                saved = 100.0 * max(0.0, duration - kept_s) / duration \
                    if duration > 0 else 0.0
                row = {
                    "mv_threshold_sq": thr,
                    "vectors_needed": vec,
                    "clusters_needed": clu,
                    "motion_frames": int(frames[vi]),
                    "segments": int(count[vi]),
                    "saved_pct": round(saved, 2),
                    "stats": "device_f32",
                }
                if int(count[vi]) >= max_segments:
                    # capacity saturated: later segments were dropped, so
                    # segments/saved_pct understate reality — mark the
                    # row and tell the operator (host path has no cap)
                    row["segments_saturated"] = True
                    print(f"tune: segment capacity {max_segments} "
                          f"saturated for threshold={thr} vec={vec} "
                          f"clu={clu}; re-run without --device-stats "
                          "for exact stats", file=sys.stderr)
                results.append(row)
        return results

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


def _sweep_mv_raw(reader, cfg, geom, thresholds, vc_pairs, frame_skip,
                  batch_frames, device_stats, motion_ts, dev_motion,
                  all_pts) -> None:
    """One raw-MV decode, all (threshold, vec, clu) combos on device.

    Flattened config axis k = ti * len(vc_pairs) + vi; chunks whose MV
    count overflows MVT_MV_CAPACITY are re-decoded at a fitting capacity
    (exactness over speed — a truncated list is never scored).
    """
    import math as _math

    import numpy as np

    from ..ops.mv_vote import threshold_bound
    from ..ops.sweep import make_mv_sweep_op

    nvc = len(vc_pairs)
    bounds = np.asarray([threshold_bound(t) for t in thresholds
                         for _ in vc_pairs], np.int32)
    # uint8 wrap: same rationale as sweep()'s vec_needs
    vecs = np.asarray([v & 0xFF for _ in thresholds for v, _ in vc_pairs],
                      np.int32)
    clus = np.asarray([c for _ in thresholds for _, c in vc_pairs],
                      np.int32)
    op = make_mv_sweep_op(geom, cfg.block_shift)

    cap = int(_math.ceil(cfg.chunk_duration_sec
                         * max(reader.fps, 1.0))) + 64
    cur = native.ChunkScanCursor(reader.duration, cfg.chunk_duration_sec,
                                 cap)
    capm = cfg.mv_capacity
    fields = cnts = None
    marks = None  # rollback point: the current chunk's list lengths
    while cur.more():
        start, end = cur.window()
        if not cur.resume:
            marks = (len(all_pts), [len(x) for x in dev_motion],
                     {k: len(v) for k, v in motion_ts.items()})
        mvs, counts, pts = reader.scan_mvs(
            start, end, frame_skip=frame_skip, max_frames=cap,
            max_mv=capm, resume=cur.resume)
        if len(pts) and (counts < 0).any():
            # MV-capacity overflow: roll back any partial contributions
            # this chunk already scored, then restart the whole chunk
            # from a fresh seek at a fitting capacity
            del all_pts[marks[0]:]
            for lst, n in zip(dev_motion, marks[1]):
                del lst[n:]
            for k, n in marks[2].items():
                del motion_ts[k][n:]
            capm = 1 << int(np.ceil(np.log2(-counts.min())))
            cur.restart_chunk()
            continue
        cur.advance(len(pts))
        if len(pts) == 0:
            continue
        if device_stats:
            all_pts.append(pts)
        m = mvs.shape[1]
        if fields is None or fields.shape[1] != m:
            # host-path staging buffers live for the whole sweep
            # (reallocated only when an overflow restart raises the MV
            # capacity); each dispatch is resolved before the next
            # overwrite, so reuse is safe — unlike device_stats, whose
            # LAZY dispatches may alias numpy buffers on the CPU backend
            fields = np.zeros((batch_frames, m, 4), np.int32)
            cnts = np.zeros((batch_frames,), np.int32)
        for lo in range(0, len(pts), batch_frames):
            hi = min(lo + batch_frames, len(pts))
            if device_stats:
                fields = np.zeros((batch_frames, m, 4), np.int32)
                cnts = np.zeros((batch_frames,), np.int32)
            else:
                fields[hi - lo:] = 0
                cnts[hi - lo:] = 0
            fields[:hi - lo] = mvs[lo:hi]
            cnts[:hi - lo] = counts[lo:hi]
            motion = op(fields[..., 0], fields[..., 1], fields[..., 2],
                        fields[..., 3], cnts, bounds, vecs, clus)
            if device_stats:
                for ti in range(len(thresholds)):
                    dev_motion[ti].append(
                        (motion[:, ti * nvc:(ti + 1) * nvc], hi - lo))
            else:
                mnp = np.asarray(motion)
                for ti in range(len(thresholds)):
                    for vi in range(nvc):
                        sel = mnp[:hi - lo, ti * nvc + vi]
                        motion_ts[(ti, vi)].extend(
                            pts[lo:hi][sel].tolist())


def main(argv: list[str] | None = None) -> int:
    from ..utils.system import apply_platform_override
    apply_platform_override()  # MVT_JAX_PLATFORM
    parser = argparse.ArgumentParser(prog="tune")
    parser.add_argument("input")
    parser.add_argument("--thresholds", default="4,16,64")
    parser.add_argument("--vectors", default="1,2,4")
    parser.add_argument("--clusters", default="1,2,4")
    parser.add_argument("--device-stats", action="store_true",
                        help="compute the stats table with the device "
                             "segmentation op (one host round trip; f32)")
    parser.add_argument("--scan-input", default="grids",
                        choices=("grids", "mv_raw"),
                        help="H2D payload: per-threshold vote grids "
                             "(default) or raw MV fields with on-device "
                             "threshold sweeping")
    parser.add_argument("--mesh", type=int, default=0, metavar="N",
                        help="shard the sweep over an N-device mesh: "
                             "frames over 'data', configs over 'sweep' "
                             "(grids input only)")
    parser.add_argument("--mesh-sweep", type=int, default=0, metavar="S",
                        help="sweep-axis size of the mesh (default: the "
                             "largest divisor of N not exceeding the "
                             "config-pair count)")
    args = parser.parse_args(argv)

    thresholds = [float(x) for x in args.thresholds.split(",")]
    vectors = [int(x) for x in args.vectors.split(",")]
    clusters = [int(x) for x in args.clusters.split(",")]
    mesh = None
    if args.mesh:
        from ..parallel.mesh import build_mesh
        s = args.mesh_sweep or max(
            d for d in range(1, args.mesh + 1)
            if args.mesh % d == 0
            and d <= max(1, len(vectors) * len(clusters)))
        mesh = build_mesh(args.mesh, sweep=s)
    results = sweep(args.input, thresholds, vectors, clusters,
                    device_stats=args.device_stats,
                    scan_input=args.scan_input, mesh=mesh)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
