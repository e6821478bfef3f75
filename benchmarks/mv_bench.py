"""Audited fused raw-MV kernel benchmark + variant shootout.

Same validity-by-construction methodology as bench.py / sad_bench.py:
ONE pallas launch whose grid spans all passes, rotating over K resident
device buffers via index maps, per-frame cluster counts written to HBM
every step, host-fetched after the full sequential grid and diffed
frame-by-frame against the NumPy oracle (core/oracle.vote_grid +
count_clusters), with the implied HBM GB/s gated against the chip
roofline.

Motivation: bench.py's fused-MV secondary times 20 whole-op dispatches
through the tunnel — at 1024 frames/dispatch that measurement is
dominated by the fixed ~28ms dispatch cost plus transfer, i.e. it
bounds the *dispatch path*, not the kernel (the same artifact the
round-3 window-length correction found for the cluster/SAD kernels).
This harness measures the kernel itself and diagnoses where its time
goes:

    prod     the exact production step (ops/mv_vote.chunked_frame_votes +
             _cluster_map + 2D reduce), --fps frames per grid step;
             at --m > --m-chunk this includes the product default's
             count-bounded DYNAMIC chunk loop
    prodstat the same body with the dynamic bound disabled (every chunk
             always runs) — A/B partner for prod at --m 8192; pair with
             --counts sparse (realistic MV densities) vs full (worst case)
    prodandmask
             the retired pre-round-4 build: the keep mask AND-ed across
             the [GH_p, M] one-hot instead of folded into the row index
             as a [1, M] select-to--1.  Production folds since round 4
             (bit-exact, +3.3% measured: 4.128M -> 4.263M frames/s same
             session at M=2048 F=16); this is the regression partner.
    prodrag  ragged chunk-in-grid candidate: the chunk loop moves into
             the pallas grid with [F, 1, m_chunk] blocks whose index map
             clamps the chunk at the step's max needed chunk (scalar-
             prefetch) — all-padding chunks are neither DMA'd nor
             computed, making the DMA count-sized like the compute
             (the structural fix for sparse counts at large --m, where
             prod's capacity-sized stream blocks dominate).  The audit
             accounts its actually-fetched bytes (mean chunks/step).
    prodragstep
             prodrag with ONE step-level dynamic predicate over a static
             F-frame body instead of F per-frame pl.when regions —
             probes per-frame dynamic control-flow region cost (the
             round-5 find: prodrag's 4x DMA cut measured NEUTRAL at
             sparse M=8192 — 1.777M vs prod 1.753M — but collapsing the
             16 per-frame regions to 1 measured 2.448M, +40%).
    prodragfuse
             prodragstep minus two more regions: the zero pass folds
             into the first chunk's accumulate (init-select) and the
             finalize runs at the step's OWN last chunk — empty chunk
             steps run nothing at all.  Measured a REGRESSION (2.20M vs
             prodragstep 2.45M, same session): the per-chunk vector
             select + per-step own-finalize predicate cost more than the
             regions they remove.  Kept as the negative probe.
    prodragdyn
             prodragfuse with a DYNAMIC grid third dim (max needed
             chunk over the batch): a uniformly sparse batch runs zero
             empty grid steps.  Measured 2.730M (best fused form, +56%
             over prod; empty grid steps cost ~0.22us each).  NOTE: at
             --counts sparse (64..2048) every step needs exactly 1
             chunk, so the dynamic grid is 1 — the residual gap to the
             M=2048 prod floor (~4.26M) is per-step cost inside ACTIVE
             steps, dominated by the scratch round-trip (zero-write +
             read-modify-write + finalize-read ~ 4MB VMEM traffic/step)
             that single-chunk steps don't need.
    prodraghyb
             prodragdyn plus a straight-line NO-SCRATCH fast path for
             steps whose max needed chunk is 1 (votes -> cluster -> out
             in registers, exactly the M=2048 prod body); multi-chunk
             steps take the prodragstep-style scratch path.  The
             production-shaped candidate: real 1080p counts are
             hundreds-to-thousands against M=8192 capacity, so nc==1
             steps ARE the hot path.
    prodmaxb the production body with ONE shared dynamic chunk bound per
             step (max of the F frames' counts) instead of F per-frame
             SMEM-dependent bounds — exact (extra chunks contribute
             zero).  Measured NEUTRAL at sparse M=8192 (1.718M vs prod
             1.729M, round 4): per-frame scalar syncs are not the
             sparse bottleneck; kept as the recorded negative probe.
    mmctrl   compute-roofline control: the exact launch structure and
             matmul SHAPES of prod ([GH_p, M] x [GW_p, M] NT dot per
             frame) but with the cheapest possible operand prep — the
             four streams' parity bits broadcast lane-major, no iota
             compares.  Isolates "broadcast + cast + MXU matmul +
             reduce" from the one-hot construction: if prod ~= mmctrl,
             the kernel is at its matmul-formulation floor and the gap
             to the stream control is arithmetic intensity, not waste.
             Exact checksum: votes[y,x] = sum_k a_k*b_k with a,b in
             {0,1}, so every output cell is the same integer <= M and
             the int32 grid sum is gh_p*gw_p*sum(a&b).
    rollclu  production votes, roll-based cluster map
             (ops/cluster.cluster_map_kernel) instead of pad/shift
    bclu     --fps frames per step, per-frame vote matmuls stacked into
             one [F, GH, GW] grid, ONE batched roll-based cluster map +
             batched reduction per step (amortizes tiny-grid op count)
    noclu    votes only; per-frame count = sum of votes (= kept MVs,
             exact in f32) — isolates the cluster-map cost
    ctrl     stream-bound control: same launch structure/blocks, per
             frame just i32 sums of the four MV streams + the count —
             the practical floor/ceiling of this launch configuration
    ctrlmm   same, reductions via bf16 ones-matmul (near-zero VPU work)
    prodsub / ctrlsub
             the RETIRED round-2 layout, kept as regression evidence:
             dst_x shipped a second time as a sublane-major [M, 1]
             stream so the rhs one-hot could be built [M, GW] for an NN
             dot.  That block is lane-padded 128x in VMEM and its DMA
             writes M strided 4-byte rows (~1.5us/block) — audited
             sweep at M=2048, F=1: prodsub 687k frames/s == its own
             ctrlsub, vs prod 1.69M (ctrl 3.27M): the DMA, not
             compute, was the kernel's floor.

Usage:
    python benchmarks/mv_bench.py [--variants prod,bclu,noclu,ctrl]
                                  [--fps F] [--buffers K] [--frames B]
                                  [--iters N] [--m M]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(variant, geom, cfg, *, k, b, m, iters, fps,
                  m_chunk=2048):
    """Returns jitted fn(dst_x, dst_y, src_x, src_y, dst_x_sub, counts)
    -> per-frame int32 counts [B] for the last-written buffer."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mvtrim_tpu.ops import mv_vote
    from mvtrim_tpu.ops.cluster import (_cluster_map, cluster_map_kernel)

    bound = mv_vote.threshold_bound(cfg.mv_threshold_sq)
    vec = cfg.vectors_needed
    F = fps or 1
    if b % F:
        # ValueError: caught per variant by main's sweep loop
        raise ValueError(f"--frames {b} must be divisible by F={F}")
    nb = b // F

    if variant in ("prodrag", "prodragstep", "prodragfuse", "prodragdyn",
                   "prodraghyb"):
        # Ragged chunk-in-grid production candidates (ops/mv_vote.py
        # ragged_chunks): grid (iters, steps, chunks), [F, 1, m_chunk]
        # blocks whose index map clamps the chunk at the step's max
        # needed chunk (second scalar-prefetch array) — all-padding
        # chunks are never DMA'd (Mosaic re-fetches only on index
        # change).  DMA becomes count-sized like the compute already
        # was; the audit in main accounts the actually-fetched bytes.
        #   prodrag      per-FRAME pl.when predicates (16 dynamic
        #                control-flow regions per step)
        #   prodragstep  ONE step-level pl.when over a static F-frame
        #                body — frames needing fewer chunks than the
        #                step max accumulate vector-masked zeros (exact;
        #                no scalar branch).  Probes whether per-frame
        #                dynamic regions, not DMA, are the sparse cost:
        #                round-5 measured prodrag's 4x DMA cut NEUTRAL
        #                (1.777M vs prod 1.753M at sparse M=8192).
        if m % m_chunk:
            raise ValueError(f"prodrag needs m % m_chunk == 0 ({m})")
        NC = max(1, m // m_chunk)
        gh_p2, gw_p2 = geom.padded_gh, geom.padded_gw

        fused = variant in ("prodragfuse", "prodragdyn")

        def rag_kernel(count_ref, nc_ref, dx_ref, dy_ref, sx_ref, sy_ref,
                       out_ref, vs):
            it = pl.program_id(0)
            j = pl.program_id(1)
            ci = pl.program_id(2)
            base = (it % k) * b + j * F
            nc_step = nc_ref[(it % k) * nb + j]

            def acc_frame(fi, count, init_select=False):
                v = mv_vote._mv_frame_votes(
                    dx_ref[fi], dy_ref[fi], sx_ref[fi], sy_ref[fi],
                    count, geom, bound, cfg.block_shift,
                    idx_offset=ci * m_chunk, fold_keep=True)
                if init_select:
                    # first chunk WRITES (no separate zero region);
                    # count==0 frames get v==0 -> correctly initialized
                    vs[fi] = jnp.where(ci == 0, v, vs[fi] + v)
                else:
                    vs[fi] = vs[fi] + v

            def finalize():
                for fi in range(F):
                    cl = _cluster_map(vs[fi].astype(jnp.int32), geom,
                                      vec).astype(jnp.int32)
                    rows = jnp.sum(cl, axis=1, keepdims=True)
                    out_ref[fi] = jnp.sum(rows, axis=0, keepdims=True
                                          ).reshape(1, 1)

            if variant == "prodraghyb":
                # Fast path: a single-chunk step (max count <= m_chunk,
                # the hot case for real 1080p densities at M=8192) runs
                # the straight-line M=2048-prod body — votes -> cluster
                # -> out entirely in registers, scratch untouched.
                @pl.when((nc_step == 1) & (ci == 0))
                def _fast():
                    for fi in range(F):
                        v = mv_vote._mv_frame_votes(
                            dx_ref[fi], dy_ref[fi], sx_ref[fi],
                            sy_ref[fi], count_ref[base + fi], geom,
                            bound, cfg.block_shift, idx_offset=0,
                            fold_keep=True)
                        cl = _cluster_map(v.astype(jnp.int32), geom,
                                          vec).astype(jnp.int32)
                        rows = jnp.sum(cl, axis=1, keepdims=True)
                        out_ref[fi] = jnp.sum(rows, axis=0,
                                              keepdims=True).reshape(1, 1)

                # Multi-chunk steps: prodragstep-style scratch path,
                # finalized at the step's OWN last chunk (required
                # under the dynamic grid, where NC-1 may never run).
                @pl.when((nc_step > 1) & (ci == 0))
                def _zero_mc():
                    vs[...] = jnp.zeros((F, gh_p2, gw_p2), jnp.float32)

                @pl.when((nc_step > 1) & (ci < nc_step))
                def _acc_mc():
                    for fi in range(F):
                        acc_frame(fi, count_ref[base + fi])

                @pl.when((nc_step > 1) & (ci == nc_step - 1))
                def _fin_mc():
                    finalize()
            elif fused:
                # two dynamic regions per ACTIVE step, none on empty
                # steps: accumulate (init-select folds the zero pass)
                # and finalize at the step's OWN last chunk
                @pl.when(ci < nc_step)
                def _acc_step():
                    for fi in range(F):
                        acc_frame(fi, count_ref[base + fi],
                                  init_select=True)

                @pl.when(ci == nc_step - 1)
                def _fin():
                    finalize()
            elif variant == "prodragstep":
                @pl.when(ci == 0)
                def _zero():
                    vs[...] = jnp.zeros((F, gh_p2, gw_p2), jnp.float32)

                @pl.when(ci < nc_step)
                def _acc_step():
                    for fi in range(F):
                        acc_frame(fi, count_ref[base + fi])

                @pl.when(ci == NC - 1)
                def _fin():
                    finalize()
            else:
                @pl.when(ci == 0)
                def _zero():
                    vs[...] = jnp.zeros((F, gh_p2, gw_p2), jnp.float32)

                for fi in range(F):
                    count = count_ref[base + fi]

                    @pl.when(ci * m_chunk < count)
                    def _acc(fi=fi, count=count):
                        acc_frame(fi, count)

                @pl.when(ci == NC - 1)
                def _fin():
                    finalize()

        rag_spec = pl.BlockSpec(
            (F, 1, m_chunk),
            lambda it, j, ci, csm, ncsm: (
                (it % k) * nb + j, 0,
                jnp.minimum(ci, ncsm[(it % k) * nb + j] - 1)),
            memory_space=pltpu.VMEM)

        def make_rag_sweep(grid_nc):
            return pl.pallas_call(
                rag_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(iters, nb, grid_nc),
                    in_specs=[rag_spec] * 4,
                    out_specs=pl.BlockSpec(
                        (F, 1, 1), lambda it, j, ci, *_: (j, 0, 0),
                        memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((F, gh_p2, gw_p2),
                                               jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )

        @jax.jit
        def run_rag(dst_x, dst_y, src_x, src_y, sub, counts):
            cg = counts.reshape(k * nb, F)
            ncs = jnp.clip((jnp.max(cg, axis=1) + jnp.int32(m_chunk - 1))
                           // jnp.int32(m_chunk), 1, NC).astype(jnp.int32)
            if variant in ("prodragdyn", "prodraghyb"):
                # DYNAMIC grid third dim: the chunk sweep is bounded by
                # the batch's max needed chunk — a uniformly sparse
                # batch runs zero empty grid steps (Mosaic dynamic grid)
                grid_nc = jnp.max(ncs)
            else:
                grid_nc = NC
            return make_rag_sweep(grid_nc)(
                counts, ncs, dst_x, dst_y, src_x, src_y)[:, 0, 0]

        return run_rag
    # *sub variants ship dst_x a SECOND time as a sublane-major [M, 1]
    # stream (whose VMEM block is lane-padded 128x and whose DMA writes
    # M strided 4-byte rows) — the retired round-2 layout
    use_sub = variant in ("ctrlsub", "prodsub")
    # prodstat: the chunked product body with the count-bounded fori_loop
    # disabled — the static A/B partner of prod at m > m_chunk
    dynamic = variant != "prodstat"
    gh_p, gw_p = geom.padded_gh, geom.padded_gw

    def frame_votes(refs, fi, bound_count=None):
        """The exact production vote step (shared chunked body)."""
        dst_x_ref, dst_y_ref, src_x_ref, src_y_ref, _, count = refs
        return mv_vote.chunked_frame_votes(
            dst_x_ref, dst_y_ref, src_x_ref, src_y_ref, fi, count(fi),
            geom, bound, cfg.block_shift, m=m, m_chunk=m_chunk,
            dynamic_chunks=dynamic, fold_keep=variant != "prodandmask",
            bound_count=bound_count)

    def votes_sub(refs, fi):
        """Retired layout: rhs one-hot built [M, GW] from the sublane
        stream, NN dot."""
        dst_x_ref, dst_y_ref, src_x_ref, src_y_ref, sub_ref, count = refs
        dst_x, dst_y = dst_x_ref[fi], dst_y_ref[fi]          # [1, M]
        dx = dst_x - src_x_ref[fi]
        dy = dst_y - src_y_ref[fi]
        mag = dx * dx + dy * dy
        gx = jax.lax.shift_right_arithmetic(dst_x, cfg.block_shift)
        gy = jax.lax.shift_right_arithmetic(dst_y, cfg.block_shift)
        gx_sub = jax.lax.shift_right_arithmetic(sub_ref[fi],
                                                cfg.block_shift)  # [M, 1]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        keep = ((idx < count(fi))
                & (mag >= jnp.int32(bound))
                & (gx >= 0) & (gx < geom.gw)
                & (gy >= geom.y_min) & (gy < geom.y_max))    # [1, M]
        rows_y = jax.lax.broadcasted_iota(jnp.int32, (gh_p, m), 0)
        cols_x = jax.lax.broadcasted_iota(jnp.int32, (m, gw_p), 1)
        one_y = ((rows_y == gy) & keep).astype(jnp.float32)  # [GH_p, M]
        one_x = (cols_x == gx_sub).astype(jnp.float32)       # [M, GW_p]
        return jax.lax.dot_general(
            one_y, one_x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [GH_p, GW_p]

    def kernel(count_ref, dst_x_ref, dst_y_ref, src_x_ref, src_y_ref,
               *rest):
        if use_sub:
            sub_ref, out_ref = rest
        else:
            (out_ref,) = rest
            sub_ref = None
        it = pl.program_id(0)
        j = pl.program_id(1)
        base = (it % k) * b + j * F

        def count(fi):
            return count_ref[base + fi]

        refs = (dst_x_ref, dst_y_ref, src_x_ref, src_y_ref, sub_ref, count)

        def mm_sum(v_ref, fi):
            """Exact cheap reduction of [1, M] i32 via bf16 ones-matmul:
            mask to 8 bits (bf16-exact), f32 accumulation."""
            v = (v_ref[fi] & 255).astype(jnp.bfloat16)       # [1, M]
            return jax.lax.dot_general(
                v, jnp.ones((m, 1), jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [1, 1]

        if variant in ("ctrl", "ctrlsub"):
            for fi in range(F):
                s = (jnp.sum(dst_x_ref[fi], axis=1, keepdims=True)
                     + jnp.sum(dst_y_ref[fi], axis=1, keepdims=True)
                     + jnp.sum(src_x_ref[fi], axis=1, keepdims=True)
                     + jnp.sum(src_y_ref[fi], axis=1, keepdims=True)
                     + count(fi).reshape(1, 1))
                if use_sub:
                    s = s + jnp.sum(sub_ref[fi], axis=0, keepdims=True)
                out_ref[fi] = s.reshape(1, 1)
        elif variant == "ctrlmm":
            # 4 lane-major streams only, reductions on the MXU: the
            # launch-structure floor with near-zero VPU work
            for fi in range(F):
                s = (mm_sum(dst_x_ref, fi) + mm_sum(dst_y_ref, fi)
                     + mm_sum(src_x_ref, fi) + mm_sum(src_y_ref, fi))
                out_ref[fi] = (s.astype(jnp.int32)
                               + count(fi)).reshape(1, 1)
        elif variant == "mmctrl":
            # prod's matmul shapes with trivial operand prep: parity
            # bits of all four streams (keeps the load dependency on
            # every byte), broadcast lane-major, one NT dot per frame
            for fi in range(F):
                a1 = (dst_x_ref[fi] ^ src_x_ref[fi]) & 1      # [1, M]
                b1 = (dst_y_ref[fi] ^ src_y_ref[fi]) & 1      # [1, M]
                a = jnp.broadcast_to(a1, (gh_p, m)).astype(jnp.float32)
                bb = jnp.broadcast_to(b1, (gw_p, m)).astype(jnp.float32)
                v = jax.lax.dot_general(
                    a, bb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [GH, GW]
                rows = jnp.sum(v.astype(jnp.int32), axis=1,
                               keepdims=True)                 # [GH, 1]
                out_ref[fi] = jnp.sum(rows, axis=0, keepdims=True
                                      ).reshape(1, 1)
        elif variant == "noclu":
            for fi in range(F):
                v = frame_votes(refs, fi)                 # [GH, GW] f32
                s = jnp.sum(v, axis=1, keepdims=True)     # [GH, 1]
                out_ref[fi] = jnp.sum(s, axis=0, keepdims=True
                                      ).astype(jnp.int32).reshape(1, 1)
        elif variant == "bclu":
            grids = jnp.stack(
                [frame_votes(refs, fi).astype(jnp.int32)
                 for fi in range(F)], axis=0)             # [F, GH, GW]
            cl = cluster_map_kernel(grids, geom, vec).astype(jnp.int32)
            rows = jnp.sum(cl, axis=2)                    # [F, GH]
            out_ref[:] = jnp.sum(rows, axis=1, keepdims=True
                                 ).reshape(F, 1, 1)
        else:
            assert variant in ("prod", "prodstat", "prodandmask",
                               "prodmaxb", "rollclu", "prodsub"), variant
            body = cluster_map_kernel if variant == "rollclu" else (
                _cluster_map)
            mk = votes_sub if variant == "prodsub" else frame_votes
            bound_count = None
            if variant == "prodmaxb":
                # ONE dynamic chunk bound for the whole step (max of
                # the F frames' counts — exact, extra chunks are zero):
                # 1 SMEM-dependent loop bound per step instead of F,
                # probing whether per-frame scalar syncs are the sparse
                # bottleneck
                bound_count = count(0)
                for fi in range(1, F):
                    bound_count = jnp.maximum(bound_count, count(fi))
            for fi in range(F):
                v = (mk(refs, fi) if variant == "prodsub"
                     else mk(refs, fi, bound_count)).astype(jnp.int32)
                cl = body(v, geom, vec).astype(jnp.int32)
                rows = jnp.sum(cl, axis=1, keepdims=True)  # [GH, 1]
                out_ref[fi] = jnp.sum(rows, axis=0, keepdims=True
                                      ).reshape(1, 1)

    mv_spec = pl.BlockSpec((F, 1, m), lambda it, j, *_: ((it % k) * nb + j,
                                                         0, 0),
                           memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec((F, m, 1), lambda it, j, *_: ((it % k) * nb + j,
                                                          0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [mv_spec] * 4 + ([sub_spec] if use_sub else [])
    sweep = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(iters, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((F, 1, 1), lambda it, j, *_: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    @jax.jit
    def run(dst_x, dst_y, src_x, src_y, sub, counts):
        args = (counts, dst_x, dst_y, src_x, src_y)
        if use_sub:
            args = args + (sub,)
        return sweep(*args)[:, 0, 0]

    return run


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="ctrl,noclu,prod,bclu")
    ap.add_argument("--fps", type=int, default=16,
                    help="frames per grid step (default 16 — tracks the "
                         "product op's make_mv_cluster_op_pallas default; "
                         "pass 1 for the per-frame floor)")
    ap.add_argument("--buffers", type=int, default=4)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--m-chunk", type=int, default=2048,
                    help="in-kernel MV chunk (mirrors the product op); "
                         "dynamic count-bounded skipping only engages at "
                         "--m > --m-chunk")
    ap.add_argument("--counts", choices=("uniform", "sparse", "full"),
                    default="uniform",
                    help="per-frame MV count distribution: uniform [0, m] "
                         "(default), sparse = log-uniform 64..2048 "
                         "(realistic 1080p densities — what the dynamic "
                         "chunk skip is for), full = every frame at "
                         "capacity (the dynamic skip's worst case)")
    # fixed ~28ms dispatch cost: keep the launch >= ~0.7s of device work
    # (prod at F=16 runs ~4M frames/s -> 1024 frames x 4096 iters ~= 1s)
    ap.add_argument("--iters", type=int, default=4096)
    args = ap.parse_args()

    import jax

    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.core import oracle
    from mvtrim_tpu.ops import mv_vote
    import bench as bench_mod

    dev = jax.devices()[0]
    roofline = bench_mod._roofline_gbps(dev)
    cfg = Config()
    geom = GridGeometry.build(1920, 1080, cfg)
    k, b, m, iters = args.buffers, args.frames, args.m, args.iters
    bound = mv_vote.threshold_bound(cfg.mv_threshold_sq)
    # 4 lane-major int32 streams (the *sub legacy variants add a fifth,
    # sublane-major dst_x copy — accounted per-variant below)
    bytes_per_frame = 4 * m * 4
    print(f"device: {dev} | grid {geom.gw}x{geom.gh} | M={m} "
          f"({bytes_per_frame} B/frame) | K={k} B={b} iters={iters} "
          f"fps={args.fps or 1}", file=sys.stderr)

    rng = np.random.default_rng(7)
    dst_x = rng.integers(-32, 1920 + 32, size=(k, b, m)).astype(np.int32)
    dst_y = rng.integers(-32, 1080 + 32, size=(k, b, m)).astype(np.int32)
    src_x = (dst_x - rng.integers(-8, 9, size=(k, b, m))).astype(np.int32)
    src_y = (dst_y - rng.integers(-8, 9, size=(k, b, m))).astype(np.int32)
    if args.counts == "uniform":
        counts = rng.integers(0, m + 1, size=(k, b)).astype(np.int32)
    elif args.counts == "sparse":
        hi = min(m, 2048)
        lo = min(64, hi)  # tiny --m: clamp so the draw range stays valid
        counts = np.exp(rng.uniform(np.log(lo), np.log(hi + 1),
                                    size=(k, b))).astype(np.int32)
        counts = np.minimum(counts, m)
    else:  # full
        counts = np.full((k, b), m, np.int32)

    # ---- host-side expectations (shared vectorized restatement —
    # ops/mv_vote.host_expected_clusters, the same definition bench.py's
    # fused-MV audit uses — cross-checked vs the real oracle below) ----
    last = (iters - 1) % k
    kept_last, expected_clusters = mv_vote.host_expected_clusters(
        dst_x[last], dst_y[last], src_x[last], src_y[last], counts[last],
        geom, threshold_sq=cfg.mv_threshold_sq,
        block_shift=cfg.block_shift, vectors_needed=cfg.vectors_needed)

    # cross-check the vectorized restatement against the real oracle
    for fi in (0, 1, b - 1):
        n = int(counts[last, fi])
        mvs = np.stack([dst_x[last, fi, :n], dst_y[last, fi, :n],
                        src_x[last, fi, :n], src_y[last, fi, :n]], axis=1)
        g = oracle.vote_grid(mvs, geom.gw, geom.gh,
                             threshold_sq=cfg.mv_threshold_sq,
                             block_shift=cfg.block_shift,
                             y_min=geom.y_min, y_max=geom.y_max)
        assert expected_clusters[fi] == oracle.count_clusters(
            g, vectors_needed=cfg.vectors_needed,
            y_min=geom.y_min, y_max=geom.y_max), f"oracle mismatch {fi}"

    ctrl_expected = (dst_x[last].astype(np.int64).sum(axis=1)
                     + dst_y[last].astype(np.int64).sum(axis=1)
                     + src_x[last].astype(np.int64).sum(axis=1)
                     + src_y[last].astype(np.int64).sum(axis=1)
                     + counts[last])
    # ctrlsub reads dst_x twice (the second, sublane-major copy)
    ctrlsub_expected = ctrl_expected + dst_x[last].astype(np.int64).sum(axis=1)
    ctrlmm_expected = sum((a[last].astype(np.int64) & 255).sum(axis=1)
                          for a in (dst_x, dst_y, src_x, src_y)
                          ) + counts[last]
    geom_cells = geom.padded_gh * geom.padded_gw
    mmctrl_expected = geom_cells * (
        ((dst_x[last] ^ src_x[last]) & (dst_y[last] ^ src_y[last]) & 1)
        .astype(np.int64).sum(axis=1))

    flat3 = lambda a: jax.device_put(
        np.ascontiguousarray(a.reshape(k * b, 1, m)))
    wanted = [v.strip() for v in args.variants.split(",")]
    # the fifth, sublane-major dst_x copy (k*b*m*4 bytes over the slow
    # tunnel) is only read by the retired *sub variants — upload lazily
    sub = (jax.device_put(np.ascontiguousarray(dst_x.reshape(k * b, m, 1)))
           if any(v in ("ctrlsub", "prodsub") for v in wanted) else None)
    d_args = (flat3(dst_x), flat3(dst_y), flat3(src_x), flat3(src_y),
              sub, jax.device_put(counts.reshape(k * b)))

    analyzed = b * iters
    results = {}
    for variant in wanted:
        try:
            run = build_variant(variant, geom, cfg, k=k, b=b, m=m,
                                iters=iters, fps=args.fps,
                                m_chunk=args.m_chunk)
            t0 = time.perf_counter()
            out = np.asarray(run(*d_args))       # compile + first pass
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = np.asarray(run(*d_args))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        out64 = out.astype(np.int64)
        if variant in ("ctrl", "ctrlsub"):
            # device sums are int32; compare modulo 2^32
            exp = ctrlsub_expected if variant == "ctrlsub" else ctrl_expected
            ok = np.array_equal(out64 & 0xFFFFFFFF, exp & 0xFFFFFFFF)
        elif variant == "ctrlmm":
            ok = np.array_equal(out64, ctrlmm_expected)
        elif variant == "mmctrl":
            ok = np.array_equal(out64, mmctrl_expected)
        elif variant == "noclu":
            ok = np.array_equal(out64, kept_last)
        else:
            ok = np.array_equal(out64, expected_clusters)
        fps_meas = analyzed / dt
        # *sub legacy variants stream a fifth, sublane-major dst_x copy
        bpf = 5 * m * 4 if variant in (
            "ctrlsub", "prodsub") else bytes_per_frame
        if variant in ("prodrag", "prodragstep", "prodragfuse", "prodragdyn",
                   "prodraghyb"):
            # ragged DMA is count-sized: per step, nc_j blocks of
            # [F, 1, m_chunk] i32 per stream -> nc_j*16*m_chunk B/frame
            F_main = args.fps or 1
            cg = counts.reshape(k, b // F_main, F_main)
            ncs = np.clip(
                -(-cg.max(axis=2) // args.m_chunk), 1,
                max(1, m // args.m_chunk))
            bpf = float(ncs.mean()) * 16 * args.m_chunk
        valid, implied, pct = bench_mod._audit(
            f"mv/{variant}", fps_meas, bpf, roofline, ok)
        results[variant] = {"frames_per_sec": round(fps_meas),
                            "implied_gbps": round(implied, 1),
                            "pct_roofline": round(pct, 1),
                            "audited": bool(valid),
                            "compile_s": round(compile_s, 1)}

    print(json.dumps({"metric": "mv_fused_frames_per_sec",
                      "m": m, "m_chunk": args.m_chunk,
                      "counts": args.counts,
                      "mean_count": round(float(counts.mean()), 1),
                      "bytes_per_frame": bytes_per_frame,
                      "fps_per_step": args.fps or 1,
                      "roofline_gbps": roofline,
                      "variants": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
