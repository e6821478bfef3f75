"""Benchmark: 1080p motion-scan throughput per chip.

Measures the device scan stage — the replacement for the reference's
check_frame hot loop (motion_scanner.cpp:217-295) — over device-resident
1080p vote grids with the default detector config.  Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"} where vs_baseline is the ratio
to the 50,000 frames/sec/chip north star (BASELINE.json).

Secondary numbers (pallas kernel, fused raw-MV path) go to stderr.
"""

import json
import sys
import time

import numpy as np


def _bench(fn, args, iters=50, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _bench_rotating(fn, bufs, iters=48, warmup=2):
    """Rotate distinct device inputs so no caching effect can flatter the
    number; blocks on every output."""
    import jax
    for _ in range(warmup):
        out = fn(bufs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(bufs[i % len(bufs)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import jax

    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.ops import cluster as cluster_ops
    from mvtrim_tpu.ops import mv_vote

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = Config()
    geom = GridGeometry.build(1920, 1080, cfg)
    rng = np.random.default_rng(0)

    # --- primary: cluster scan over 1080p vote grids (default path) ---
    B = 8192
    bufs = [jax.device_put(rng.integers(
        0, 6, size=(B, geom.padded_gh, geom.padded_gw), dtype=np.uint8))
        for _ in range(8)]

    op_xla = cluster_ops.make_cluster_op_xla(
        geom, cfg.vectors_needed, cfg.clusters_needed)
    dt_xla = _bench_rotating(lambda v: op_xla(v)[0], bufs)
    fps_xla = B / dt_xla

    try:
        op_pl = cluster_ops.make_cluster_op_pallas(
            geom, cfg.vectors_needed, cfg.clusters_needed, block_b=64)
        dt_pl = _bench_rotating(lambda v: op_pl(v)[0], bufs)
        fps_pl = B / dt_pl
    except Exception as e:  # pallas unavailable on some backends
        print(f"pallas cluster bench skipped: {e}", file=sys.stderr)
        fps_pl = 0.0

    print(f"cluster xla:    {fps_xla:,.0f} frames/s", file=sys.stderr)
    print(f"cluster pallas: {fps_pl:,.0f} frames/s", file=sys.stderr)

    value = max(fps_xla, fps_pl)
    print(json.dumps({
        "metric": "1080p_scan_frames_per_sec_per_chip",
        "value": round(value),
        "unit": "frames/s",
        "vs_baseline": round(value / 50000.0, 2),
    }), flush=True)
    # Secondaries run AFTER the headline JSON is flushed so a driver
    # timeout mid-compile cannot lose the metric.
    # --- secondary: fused raw-MV path (on-device thresholding) ---
    try:
        M, Bmv = 2048, 1024
        dst_x = jax.device_put(
            rng.integers(0, 1920, size=(Bmv, M)).astype(np.int32))
        dst_y = jax.device_put(
            rng.integers(0, 1080, size=(Bmv, M)).astype(np.int32))
        src_x = jax.device_put(
            (np.asarray(dst_x) -
             rng.integers(-8, 9, size=(Bmv, M))).astype(np.int32))
        src_y = jax.device_put(
            (np.asarray(dst_y) -
             rng.integers(-8, 9, size=(Bmv, M))).astype(np.int32))
        counts = jax.device_put(np.full((Bmv,), M, np.int32))
        mv_op = mv_vote.make_mv_cluster_op_pallas(
            geom, threshold_sq=cfg.mv_threshold_sq,
            block_shift=cfg.block_shift,
            vectors_needed=cfg.vectors_needed,
            clusters_needed=cfg.clusters_needed)
        dt_mv = _bench(lambda *a: mv_op(*a)[0],
                       (dst_x, dst_y, src_x, src_y, counts), iters=20)
        print(f"fused MV pallas (M={M}): {Bmv / dt_mv:,.0f} frames/s",
              file=sys.stderr)
    except Exception as e:
        print(f"fused MV bench skipped: {e}", file=sys.stderr)

    return 0


if __name__ == "__main__":
    sys.exit(main())
