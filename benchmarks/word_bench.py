"""Word-domain cluster kernel layout shootout (headline-metric R&D).

The production kernel (ops/cluster.word_cluster_counts) keeps each
frame's 384 packed int32 words on the LANE axis: neighbor taps are
lane rotates (cross-lane shuffles) and the final popcount sum is a
cross-lane reduction — both relatively expensive VPU patterns.  This
harness measures alternatives under the same audited methodology as
bench.py (single launch, resident accumulator, oracle checksum,
roofline gate):

* ``base``  — the production lane-major kernel (control).
* ``lmxu``  — lane-major, but the final reduction as an f32 ones-matmul
              on the MXU instead of a cross-lane sum.
* ``tmxu``  — TRANSPOSED layout [lanes, frames]: words on sublanes
              (neighbor taps become sublane rotates), frames on lanes,
              reduction as ones[1,lanes] @ v on the MXU (per-word
              popcounts <= 32, sums <= gh*gw — f32-exact).  This is the
              production math (ops/cluster.word_cluster_counts_T).
* ``tslim`` — the full production math (slim edge masks +
              lax.population_count reduce, via
              ops/cluster.word_cluster_counts_T).
* ``tswar`` — per-word 13-op SWAR popcount (the pre-popcount
              production fold); ``tu32`` — neutral uint32-shift probe.
* ``tctrl`` — STREAM-BOUND control: identical launch structure, trivial
              math (bit-0 mask + MXU ones-matmul).  Measures the
              practical HBM ceiling of this pallas/grid configuration;
              kernel GB/s / tctrl GB/s is the efficiency vs that
              ceiling (VERDICT r2 directive 1).

Usage:
    python benchmarks/word_bench.py [--variants base,lmxu,tslim,tswar]
                                    [--frames B] [--iters N] [--block N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _counts_T(wT, geom, masksT, roll0, slim):
    """Production transposed math (ops/cluster.word_cluster_counts_T);
    ``slim`` drops the edge masks (valid when lanes - used >= gww)."""
    from mvtrim_tpu.ops.cluster import word_cluster_counts_T

    center, not_first, not_last = masksT
    if slim:
        masksT = (center, None, None)
    return word_cluster_counts_T(wT, geom, masksT, roll0)


def build_variant(variant, geom, cfg, *, k, b, iters, block_b):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mvtrim_tpu.ops.cluster import (_word_masks, word_cluster_counts,
                                        word_geometry)

    gww, used, lanes = word_geometry(geom)
    clusters_needed = max(1, cfg.clusters_needed)
    nb = b // block_b
    assert nb * block_b == b, (b, block_b)

    if variant in ("base", "lmxu"):
        masks_np = tuple(m[None, :] for m in _word_masks(geom))

        def kernel(words_ref, center_ref, nf_ref, nl_ref, acc_ref):
            it = pl.program_id(1)
            a = words_ref[0]
            masks = (center_ref[:], nf_ref[:], nl_ref[:])
            if variant == "base":
                counts = word_cluster_counts(
                    a, geom, masks, lambda v, s: pltpu.roll(v, s, 1))
            else:
                # same math, but stop before the cross-lane sum and
                # finish with an f32 ones-matmul on the MXU
                center, nf, nl = masks
                w = a
                left = (w << 1) | ((pltpu.roll(w, 1, 1) >> 31) & 1)
                right = (((w >> 1) & 0x7FFFFFFF) |
                         ((pltpu.roll(w, lanes - 1, 1) & 1) << 31))
                up = pltpu.roll(w, gww, 1) & nf
                down = pltpu.roll(w, lanes - gww, 1) & nl
                cl = w & (left | right | up | down) & center
                v = cl - ((cl >> 1) & 0x55555555)
                v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
                v = (v + ((v >> 4) & 0x0F0F0F0F)) & 0x0F0F0F0F
                v = ((v * 0x01010101) >> 24) & 0xFF
                ones = jnp.ones((lanes, 1), jnp.float32)
                counts = jax.lax.dot_general(
                    v.astype(jnp.float32), ones,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
            motion = (counts >= clusters_needed).astype(jnp.int32)

            @pl.when(it == 0)
            def _init():
                acc_ref[:] = motion

            @pl.when(it != 0)
            def _acc():
                acc_ref[:] = acc_ref[:] + motion

        mask_spec = pl.BlockSpec((1, lanes), lambda jb, it: (0, 0),
                                 memory_space=pltpu.VMEM)
        sweep = pl.pallas_call(
            kernel,
            grid=(nb, iters),
            in_specs=[pl.BlockSpec((1, block_b, lanes),
                                   lambda jb, it: (it % k, jb, 0),
                                   memory_space=pltpu.VMEM),
                      mask_spec, mask_spec, mask_spec],
            out_specs=pl.BlockSpec((block_b, 1), lambda jb, it: (jb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        )
        masks_dev = tuple(jnp.asarray(m) for m in masks_np)

        @jax.jit
        def run(stacked):
            return jnp.sum(sweep(stacked, *masks_dev))

        return run, "lane"

    elif variant in ("tswar", "tu32", "tpopc", "tcsapop"):
        # tswar: per-word 13-op SWAR popcount — the production fold
        #   until round 3 (a CSA fold over it was worth +1-3%).
        # tu32: logical shifts via uint32 bitcast (drops the arithmetic-
        #   shift mask ops) — measured neutral; kept as a probe of
        #   Mosaic u32 op support.
        # tpopc: SWAR replaced by lax.population_count — Mosaic lowers
        #   it natively; measured 461.3M vs tslim(SWAR+CSA) 406.1M and
        #   tctrl 470.1M in one session, so it became the production
        #   fold (tslim now measures it via the product op).
        # tcsapop: CSA fold + population_count — 449.6M, the fold stops
        #   paying once popcount is one hardware op.
        # These bodies ship only the center mask and compute up/down as
        # UNMASKED rolls — provably exact only under the slim condition
        # (wrap sources zero-padded lanes or lands outside the center
        # mask, ops/cluster.py word_cluster_counts_T).  Guard it: a
        # non-slim geometry would silently measure wrong math here.
        if lanes - used < gww:
            raise ValueError(
                f"t* variants assume the slim-mask condition "
                f"(lanes-used={lanes - used} < gww={gww} here); use "
                f"bench.py's _sweep_bench_words_T, which selects masks "
                f"per geometry")
        masks_np = (tuple(m[:, None] for m in _word_masks(geom)))[:1]

        def kernel(words_ref, center_ref, acc_ref):
            it = pl.program_id(1)
            wT = words_ref[0]                          # [lanes, block_b]
            center = center_ref[:]
            if variant == "tu32":
                wu = jax.lax.bitcast_convert_type(wT, jnp.uint32)
                left = (wT << 1) | jax.lax.bitcast_convert_type(
                    pltpu.roll(wu, 1, 0) >> 31, jnp.int32)
                right = jax.lax.bitcast_convert_type(
                    wu >> 1, jnp.int32) | (
                    (pltpu.roll(wT, lanes - 1, 0) & 1) << 31)
            else:
                left = (wT << 1) | ((pltpu.roll(wT, 1, 0) >> 31) & 1)
                right = (((wT >> 1) & 0x7FFFFFFF) |
                         ((pltpu.roll(wT, lanes - 1, 0) & 1) << 31))
            up = pltpu.roll(wT, gww, 0)
            down = pltpu.roll(wT, lanes - gww, 0)
            cl_ = wT & (left | right | up | down) & center

            def swar(v):
                v = v - ((v >> 1) & 0x55555555)
                v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
                v = (v + ((v >> 4) & 0x0F0F0F0F)) & 0x0F0F0F0F
                return (v * 0x01010101) >> 24

            def popc(v):
                return jax.lax.population_count(
                    jax.lax.bitcast_convert_type(v, jnp.uint32)
                ).astype(jnp.int32)

            dims = (((1,), (0,)), ((), ()))
            if variant == "tcsapop":
                third = lanes // 3
                a, b_, c = (cl_[0:third], cl_[third:2 * third],
                            cl_[2 * third:])
                t = a ^ b_
                s, cy = t ^ c, (a & b_) | (t & c)
                ones = jnp.ones((1, third), jnp.float32)
                c1 = jax.lax.dot_general(
                    ones, popc(s).astype(jnp.float32), dims,
                    preferred_element_type=jnp.float32)
                c2 = jax.lax.dot_general(
                    ones, popc(cy).astype(jnp.float32), dims,
                    preferred_element_type=jnp.float32)
                counts = (c1 + 2.0 * c2).astype(jnp.int32)
            else:
                fold = popc if variant == "tpopc" else swar
                ones = jnp.ones((1, lanes), jnp.float32)
                counts = jax.lax.dot_general(
                    ones, fold(cl_).astype(jnp.float32), dims,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
            motion = (counts >= clusters_needed).astype(jnp.int32)

            @pl.when(it == 0)
            def _init():
                acc_ref[:] = motion

            @pl.when(it != 0)
            def _acc():
                acc_ref[:] = acc_ref[:] + motion

        mask_spec = pl.BlockSpec((lanes, 1), lambda jb, it: (0, 0),
                                 memory_space=pltpu.VMEM)
        sweep = pl.pallas_call(
            kernel,
            grid=(nb, iters),
            in_specs=[pl.BlockSpec((1, lanes, block_b),
                                   lambda jb, it: (it % k, 0, jb),
                                   memory_space=pltpu.VMEM),
                      mask_spec],
            out_specs=pl.BlockSpec((1, block_b), lambda jb, it: (0, jb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
        )
        masks_dev = tuple(jnp.asarray(m) for m in masks_np)

        @jax.jit
        def run(stackedT):
            return jnp.sum(sweep(stackedT, *masks_dev))

        return run, "transposed"

    elif variant in ("tmxu", "tslim"):
        # (the tvpu comparison point from the original shootout — VPU
        # sublane reduction, 139M — is recorded in PERFORMANCE.md; the
        # harness now measures the production math only)
        masks_full = tuple(m[:, None] for m in _word_masks(geom))
        slim = variant == "tslim"
        # slim matches the production op exactly: only the center mask
        # is declared/loaded (two fewer VMEM streams per block)
        masks_np = masks_full[:1] if slim else masks_full

        def kernel(words_ref, *refs):
            mask_refs, (acc_ref,) = refs[:-1], refs[-1:]
            it = pl.program_id(1)
            wT = words_ref[0]                          # [lanes, block_b]
            masks = (mask_refs[0][:],
                     mask_refs[1][:] if not slim else None,
                     mask_refs[2][:] if not slim else None)
            counts = _counts_T(
                wT, geom, masks,
                lambda x, s: pltpu.roll(x, s, 0), slim)
            motion = (counts >= clusters_needed).astype(jnp.int32)

            @pl.when(it == 0)
            def _init():
                acc_ref[:] = motion

            @pl.when(it != 0)
            def _acc():
                acc_ref[:] = acc_ref[:] + motion

        mask_spec = pl.BlockSpec((lanes, 1), lambda jb, it: (0, 0),
                                 memory_space=pltpu.VMEM)
        sweep = pl.pallas_call(
            kernel,
            grid=(nb, iters),
            in_specs=[pl.BlockSpec((1, lanes, block_b),
                                   lambda jb, it: (it % k, 0, jb),
                                   memory_space=pltpu.VMEM)] +
                     [mask_spec] * len(masks_np),
            out_specs=pl.BlockSpec((1, block_b), lambda jb, it: (0, jb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
        )
        masks_dev = tuple(jnp.asarray(m) for m in masks_np)

        @jax.jit
        def run(stackedT):
            return jnp.sum(sweep(stackedT, *masks_dev))

        return run, "transposed"

    elif variant == "tctrl":
        # Stream-bound control (VERDICT r2 directive 1): the SHARED
        # builder in bench.py — one place owns the control methodology
        # (grid order, rotating blocks, resident accumulator, bit-0 +
        # MXU ones-matmul math).  Measures the max HBM GB/s this exact
        # pallas/grid configuration achieves; kernel-vs-control is the
        # efficiency number against the PRACTICAL ceiling.  Per-frame
        # entries stay < 2^31 (<= lanes*iters); the cross-frame total
        # would overflow int32, so main() sums host-side in int64.
        import bench as bench_mod
        run = jax.jit(bench_mod.build_control_sweep_T(
            k, lanes, b, block_b, iters))
        return run, "control"

    # ValueError (not SystemExit): main's sweep loop catches Exception and
    # keeps already-measured results; SystemExit would escape it
    raise ValueError(f"unknown variant {variant}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,lmxu,tslim,tswar")
    ap.add_argument("--buffers", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8192)
    # the tunnel charges a fixed ~28ms per dispatch; short windows both
    # deflate absolute GB/s and COMPRESS variant ratios (at 1024 iters
    # the ~54ms launch is half overhead).  32768 iters ≈ 0.7-0.9s launch
    # -> fixed cost <4%.
    ap.add_argument("--iters", type=int, default=32768)
    ap.add_argument("--block", type=int, default=1024)
    args = ap.parse_args()

    import jax

    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.core import oracle
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.ops import cluster as cluster_ops
    import bench as bench_mod

    dev = jax.devices()[0]
    roofline = bench_mod._roofline_gbps(dev)
    cfg = Config()
    geom = GridGeometry.build(1920, 1080, cfg)
    gww, used, lanes = cluster_ops.word_geometry(geom)
    k, b, iters = args.buffers, args.frames, args.iters
    print(f"device: {dev} | lanes={lanes} used={used} | K={k} B={b} "
          f"iters={iters} block={args.block}", file=sys.stderr)

    rng = np.random.default_rng(0)
    grids = rng.integers(0, 6, size=(k, b, geom.gh, geom.gw),
                         dtype=np.uint8)
    need = oracle.effective_clusters_needed(cfg.clusters_needed)
    motion_per_buf = [
        int((oracle.count_clusters_batch(
            g, vectors_needed=cfg.vectors_needed,
            y_min=geom.y_min, y_max=geom.y_max) >= need).sum())
        for g in grids]
    expected = bench_mod._expected_total(motion_per_buf, k, iters)
    print(f"oracle motion/buffer: {motion_per_buf} -> expected {expected}",
          file=sys.stderr)

    packed = np.packbits(grids >= cfg.vectors_needed, axis=3,
                         bitorder="little")
    flat = np.zeros((k, b, lanes), np.int32)
    flat[:, :, :used] = cluster_ops.repack_bits_words(
        packed.reshape(k * b, geom.gh, -1), geom).reshape(k, b, used)

    stacked = stackedT = None
    word_bytes = lanes * 4
    expected_ctrl = bench_mod._expected_total(
        (flat & 1).sum(axis=(1, 2)), k, iters)
    results = {}
    for variant in args.variants.split(","):
        variant = variant.strip()
        try:
            # inside the try: a bad variant name or an unsatisfiable
            # block size must not discard the variants already measured
            run, layout = build_variant(variant, geom, cfg, k=k, b=b,
                                        iters=iters, block_b=args.block)
            if layout == "lane":
                if stacked is None:
                    stacked = jax.device_put(flat)
                arg = stacked
            else:
                if stackedT is None:
                    stackedT = jax.device_put(
                        np.ascontiguousarray(flat.transpose(0, 2, 1)))
                arg = stackedT

            def fetch(out):
                # control returns the full [1, b] accumulator (per-frame
                # odd-word sums; the cross-frame total needs int64)
                if layout == "control":
                    return int(np.asarray(out).sum(dtype=np.int64))
                return int(out)

            t0 = time.perf_counter()
            total = fetch(run(arg))        # compile + first pass
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            total = fetch(run(arg))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        fps = b * iters / dt
        ok = total == (expected_ctrl if layout == "control" else expected)
        valid, implied, pct = bench_mod._audit(
            f"words/{variant}", fps, word_bytes, roofline, ok)
        results[variant] = {"frames_per_sec": round(fps),
                            "implied_gbps": round(implied, 1),
                            "pct_roofline": round(pct, 1),
                            "audited": bool(valid),
                            "compile_s": round(compile_s, 1)}

    print(json.dumps({"metric": "word_kernel_1080p_frames_per_sec",
                      "bytes_per_frame": word_bytes,
                      "roofline_gbps": roofline,
                      "variants": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
