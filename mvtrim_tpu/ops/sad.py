"""Pixel-domain block SAD kernels — the MV-less fallback path.

For intra-only / MV-less streams (BASELINE.json config 2) the codec offers
no motion vectors, so motion is measured from decoded luma directly: per
16x16 block, the sum of absolute differences against the previous analyzed
frame.  A block is "active" when its mean absolute difference clears
``sad_threshold``; active blocks then run through the same 4-neighbor
cluster rule as the MV path (ops/cluster.py), so segmentation semantics
are shared.

The reference has no such path (it simply detects nothing on MV-less
input — check_frame returns false without side data,
motion_scanner.cpp:219-221); this is a capability extension the north
star requires.

Two implementations:
* ``xla``   — reduce_window block sums; XLA fuses diff+reduce.
* ``pallas``— per-frame kernel: |cur-prev| then the block reduction as two
  small matmuls (R @ D @ S with block-indicator matrices) on the MXU,
  cluster decision fused in-kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import GridGeometry
from .cluster import cluster_counts_traced


def sad_threshold_sum(sad_threshold: float, block_size: int) -> int:
    """Active iff block SAD sum >= ceil(threshold * block_area).

    ``sad_threshold`` is a mean-absolute-difference per pixel; comparing
    against the integer SAD sum keeps the kernel in int32.
    """
    import math
    return int(math.ceil(sad_threshold * block_size * block_size))


def _cluster_from_grid(grid_i32, geom: GridGeometry, bound: int):
    """Cluster count over an activity grid — the shared cluster rule
    (ops/cluster.cluster_counts_traced) with the SAD bound as threshold."""
    return cluster_counts_traced(grid_i32, geom, jnp.int32(bound))


def make_sad_op_xla(geom: GridGeometry, *, sad_threshold: float,
                    block_size: int, clusters_needed: int):
    """luma uint8 [B+1, H_p, W_p] (frame 0 = previous carry) ->
    (cluster counts int32 [B], motion bool [B]).

    H_p/W_p must be multiples of block_size (zero-pad; pad pixels diff to
    zero and cannot activate a block).
    """
    bound = sad_threshold_sum(sad_threshold, block_size)
    eff = max(1, clusters_needed)

    @jax.jit
    def op(luma):
        x = luma.astype(jnp.int32)
        diff = jnp.abs(x[1:] - x[:-1])                     # [B, H, W]
        sad = jax.lax.reduce_window(
            diff, 0, jax.lax.add,
            window_dimensions=(1, block_size, block_size),
            window_strides=(1, block_size, block_size),
            padding="VALID")                               # [B, gh_p, gw_p]
        counts = _cluster_from_grid(sad, geom, bound)
        return counts, counts >= jnp.int32(eff)

    return op


def make_sad_op_pallas(geom: GridGeometry, *, sad_threshold: float,
                       block_size: int, clusters_needed: int,
                       height: int, width: int, interpret: bool = False):
    """Pallas: one frame pair per grid step; block reduction via two
    block-indicator matmuls on the MXU (no strided gathers)."""
    bound = sad_threshold_sum(sad_threshold, block_size)
    eff = max(1, clusters_needed)
    gh_p, gw_p = geom.padded_gh, geom.padded_gw
    h_p = gh_p * block_size
    w_p = gw_p * block_size

    def kernel(frame_ref, counts_ref, prev_ref):
        # One HBM read per frame: the previous frame is carried across
        # the (sequential) grid in VMEM scratch instead of being
        # re-fetched — halves the kernel's HBM traffic, which is what it
        # is bound by.  Step 0 only seeds the scratch (its output row is
        # discarded by the caller).
        i = pl.program_id(0)
        cur = frame_ref[0]                                   # u8 [H_p, W_p]

        @pl.when(i == 0)
        def _seed():
            counts_ref[0] = jnp.zeros((1, 1), jnp.int32)

        @pl.when(i > 0)
        def _scan():
            diff = jnp.abs(cur.astype(jnp.int32) -
                           prev_ref[:].astype(jnp.int32))    # [H_p, W_p]
            # Row-block sums on the VPU: splitting the sublane dim keeps
            # the lane dim intact (Mosaic-legal reshape), one add pass.
            row_sum = jnp.sum(
                diff.reshape(gh_p, block_size, w_p), axis=1
            ).astype(jnp.float32)                            # [gh_p, W_p]
            # Column blocks stay a matmul (lane-dim reshapes are not
            # legal): S[c, g] = 1 if column c belongs to block-col g.
            cols = jax.lax.broadcasted_iota(jnp.int32, (w_p, gw_p), 0)
            c_ind = (cols // block_size ==
                     jax.lax.broadcasted_iota(jnp.int32, (w_p, gw_p), 1)
                     ).astype(jnp.float32)                   # [W_p, gw_p]
            sad = jax.lax.dot_general(
                row_sum, c_ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [gh_p, gw_p]
            n = _cluster_from_grid(sad.astype(jnp.int32), geom, bound)
            counts_ref[0] = n.reshape(1, 1)

        prev_ref[:] = cur

    @jax.jit
    def op(luma):
        n_frames = luma.shape[0]                      # b+1 incl. carry
        counts = pl.pallas_call(
            kernel,
            grid=(n_frames,),
            in_specs=[pl.BlockSpec((1, h_p, w_p), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_frames, 1, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((h_p, w_p), jnp.uint8)],
            interpret=interpret,
        )(luma)
        counts = counts[1:, 0, 0]
        return counts, counts >= jnp.int32(eff)

    return op


def pad_luma(luma: np.ndarray, geom: GridGeometry,
             block_size: int) -> np.ndarray:
    """Zero-pad [N, H, W] luma to block-aligned padded grid extents."""
    n, h, w = luma.shape
    h_p = geom.padded_gh * block_size
    w_p = geom.padded_gw * block_size
    out = np.zeros((n, h_p, w_p), np.uint8)
    out[:, :h, :w] = luma
    return out
