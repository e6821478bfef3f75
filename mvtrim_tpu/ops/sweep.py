"""Multi-config sweep kernels: score K detector configs in one pass.

The reference evaluates exactly one (MV_THRESHOLD_SQ, VECTORS_NEEDED,
CLUSTERS_NEEDED) triple per process run; tuning means re-decoding the
video once per candidate.  On TPU the marginal cost of extra configs is a
few VPU ops per frame, so a whole tuning grid rides one decode:

* ``make_vote_sweep_op``  — vote grids were scattered host-side with a
  fixed MV threshold, so the sweep covers (vectors_needed,
  clusters_needed) pairs: [B, GH, GW] votes x [K] configs -> bool [B, K].
* ``make_mv_sweep_op``    — raw MV fields; the magnitude threshold is
  traced too, so the sweep covers (threshold_bound, vectors_needed,
  clusters_needed) triples.

Configs are *data* (traced arrays), not compile-time constants: one
compiled program serves any K of the same static shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import GridGeometry
from .cluster import cluster_counts_traced as _cluster_counts_traced


def make_vote_sweep_op(geom: GridGeometry):
    """(votes u8 [B, GH, GW], vec_needs i32 [K], clusters_needs i32 [K])
    -> motion bool [B, K].

    Caveat for vec_need <= 0 columns: a zero vote grid cannot represent
    "no MV side data", so this op alone cannot reproduce the reference's
    unconditional ``!sd -> false`` (motion_scanner.cpp:219-221) — zero
    votes satisfy ``>= 0`` and MV-less frames would decide True.  Callers
    sweeping vec <= 0 must mask MV-less frames themselves (tools/tune.py
    does, from scan_grids_multi's per-frame has_mv flags)."""

    @jax.jit
    def op(votes, vec_needs, clusters_needs):
        v = votes.astype(jnp.int32)

        def per_config(vec_need, clust_need):
            counts = _cluster_counts_traced(v, geom, vec_need)
            return counts >= jnp.maximum(1, clust_need)

        return jax.vmap(per_config, out_axes=1)(vec_needs, clusters_needs)

    return op


def make_sad_sweep_op(geom: GridGeometry, block_size: int):
    """Pixel-domain sweep: K (sad_threshold, clusters_needed) configs
    from one luma decode.

    (luma u8 [N, H_p, W_p], bounds i32 [K], clusters_needs i32 [K])
    -> motion bool [N-1, K]: row i is the decision for luma[i+1]
    compared against luma[i] (row 0 is the predecessor/carry, exactly
    the SADDetector windowing — models/sad_detector.py).

    ``bounds`` are integer SAD-sum bounds (ops/sad.sad_threshold_sum,
    ceil(threshold * block_area)) so the compare stays int32-exact.
    The |diff| + block reduction runs ONCE and is shared by every
    config; each sweep point costs one traced cluster pass
    (cluster_counts_traced with the SAD bound as the activity
    threshold) — the same math the single-config SAD ops dispatch
    (ops/sad._cluster_from_grid).  The reference needs one full re-run
    per config triple (config.hpp single-triple-per-process); it has
    no pixel-domain path at all (motion_scanner.cpp:219-221 decides
    MV-less frames False), so this sweeps a capability extension.

    XLA build (reduce_window): runs on every backend.  Tuning sweeps
    are decode-bound on the host, so the pallas SAD kernel's edge is
    irrelevant here.
    """

    @jax.jit
    def op(luma, bounds, clusters_needs):
        x = luma.astype(jnp.int32)
        diff = jnp.abs(x[1:] - x[:-1])                     # [N-1, H, W]
        sad = jax.lax.reduce_window(
            diff, 0, jax.lax.add,
            window_dimensions=(1, block_size, block_size),
            window_strides=(1, block_size, block_size),
            padding="VALID")                               # [N-1, gh, gw]

        def per_config(bound, clust_need):
            counts = _cluster_counts_traced(sad, geom, bound)
            return counts >= jnp.maximum(1, clust_need)

        return jax.vmap(per_config, out_axes=1)(bounds, clusters_needs)

    return op


def make_mv_sweep_op(geom: GridGeometry, block_shift: int):
    """Raw-MV sweep: thresholds are traced data.

    (dst_x/dst_y/src_x/src_y i32 [B, M], counts i32 [B],
     bounds i32 [K], vec_needs i32 [K], clusters_needs i32 [K])
    -> motion bool [B, K].

    ``bounds`` are integer magnitude bounds (ceil of the double threshold,
    ops/mv_vote.threshold_bound) so the compare is exact.
    """
    gh_p, gw_p = geom.padded_gh, geom.padded_gw

    def frame(dst_x, dst_y, src_x, src_y, count, bounds, vec_needs,
              clusters_needs):
        m = dst_x.shape[-1]
        dx = dst_x - src_x
        dy = dst_y - src_y
        mag = dx * dx + dy * dy
        gx = jax.lax.shift_right_arithmetic(dst_x, block_shift)
        gy = jax.lax.shift_right_arithmetic(dst_y, block_shift)
        idx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        base_keep = ((idx < count)
                     & (gx >= 0) & (gx < geom.gw)
                     & (gy >= geom.y_min) & (gy < geom.y_max))

        rows_y = jax.lax.broadcasted_iota(jnp.int32, (gh_p, m), 0)
        cols_x = jax.lax.broadcasted_iota(jnp.int32, (m, gw_p), 1)
        one_x = (cols_x == gx[:, None]).astype(jnp.float32)   # [M, GW]

        def per_config(bound, vec_need, clust_need):
            keep = base_keep & (mag >= bound)
            one_y = ((rows_y == gy[None, :])
                     & keep[None, :]).astype(jnp.float32)      # [GH, M]
            votes = jax.lax.dot_general(
                one_y, one_x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            counts = _cluster_counts_traced(
                votes.astype(jnp.int32), geom, vec_need)
            return counts >= jnp.maximum(1, clust_need)        # scalar

        # count == 0 <=> no MV side data (FFmpeg never attaches an empty
        # list): the reference decides such frames False before phase 2
        # runs (motion_scanner.cpp:219-221) — unreachable from the votes
        # alone at vec_need == 0, where zero votes satisfy >= 0
        return jax.vmap(per_config)(bounds, vec_needs,
                                    clusters_needs) & (count > 0)

    @jax.jit
    def op(dst_x, dst_y, src_x, src_y, counts, bounds, vec_needs,
           clusters_needs):
        return jax.vmap(
            frame, in_axes=(0, 0, 0, 0, 0, None, None, None)
        )(dst_x, dst_y, src_x, src_y, counts, bounds, vec_needs,
          clusters_needs)

    return op
