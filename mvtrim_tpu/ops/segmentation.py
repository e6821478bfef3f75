"""Device-side temporal segmentation.

The authoritative segmentation runs on host in float64 (core/oracle.py —
bit-parity with pipeline.cpp:321-356).  This op is the *streaming* variant
for device-resident analytics over very long archives: given per-frame
motion booleans and timestamps (already merged/sorted along the time
axis), it computes segment boundaries inside jit via a ``lax.scan`` carry,
so multi-chip sweeps can reduce segment statistics (kept seconds, segment
counts, savings) without a host round trip per batch.  Product consumer:
``tools/tune.py --device-stats`` vmaps this op over the whole config grid
and fetches the entire stats table in one round trip.

Semantics mirror the oracle: a new segment starts when the gap between
consecutive motion timestamps exceeds max_gap (strict >); each segment is
padded and clamped.  Outputs are fixed-capacity segment arrays (start,
end) with a count — jit-friendly static shapes.  float32 timestamps: good
to ~1s precision over multi-day archives for *statistics*; the cut list
itself always comes from the host float64 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_segment_op(max_segments: int, *, max_gap_sec: float,
                    padding_sec: float):
    """Build jit'd op: (ts f32 [N] sorted, motion bool [N], duration f32)
    -> (starts f32 [S], ends f32 [S], count i32, kept_seconds f32).

    Non-motion slots are ignored via masking; if more than max_segments
    segments form, later ones are dropped (count saturates — callers size
    S generously; the host path has no such cap).
    """
    gap = jnp.float32(max_gap_sec)
    pad = jnp.float32(padding_sec)

    def op(ts, motion, duration):
        n = ts.shape[0]

        def body(carry, x):
            (seg_idx, curr_start, last_act, have_open,
             starts, ends) = carry
            t, is_motion = x

            gap_exceeded = have_open & is_motion & (t - last_act > gap)
            # close the open segment into slot seg_idx; past capacity the
            # write is suppressed so the FIRST max_segments segments are
            # kept (count still advances and saturates below)
            write_ok = gap_exceeded & (seg_idx < max_segments)
            close_idx = jnp.minimum(seg_idx, max_segments - 1)
            new_starts = jnp.where(
                write_ok,
                starts.at[close_idx].set(
                    jnp.maximum(0.0, curr_start - pad)),
                starts)
            new_ends = jnp.where(
                write_ok,
                ends.at[close_idx].set(last_act + pad),
                ends)
            seg_idx = jnp.where(gap_exceeded, seg_idx + 1, seg_idx)

            # open / extend on motion
            curr_start = jnp.where(
                is_motion & (~have_open | gap_exceeded), t, curr_start)
            last_act = jnp.where(is_motion, t, last_act)
            have_open = have_open | is_motion
            return ((seg_idx, curr_start, last_act, have_open,
                     new_starts, new_ends), None)

        init = (
            jnp.int32(0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.bool_(False),
            jnp.zeros((max_segments,), jnp.float32),
            jnp.zeros((max_segments,), jnp.float32),
        )
        (seg_idx, curr_start, last_act, have_open, starts, ends), _ = (
            jax.lax.scan(body, init, (ts, motion), length=n))

        # flush the final open segment (pipeline.cpp:343-344)
        flush_ok = have_open & (seg_idx < max_segments)
        close_idx = jnp.minimum(seg_idx, max_segments - 1)
        starts = jnp.where(
            flush_ok,
            starts.at[close_idx].set(jnp.maximum(0.0, curr_start - pad)),
            starts)
        ends = jnp.where(
            flush_ok, ends.at[close_idx].set(last_act + pad), ends)
        count = jnp.where(have_open, seg_idx + 1, seg_idx)
        count = jnp.minimum(count, max_segments)

        # clamp (pipeline.cpp:349-353) and mask unused slots
        slot = jax.lax.broadcasted_iota(jnp.int32, (max_segments,), 0)
        valid = slot < count
        ends = jnp.where(valid, jnp.minimum(ends, duration), 0.0)
        starts = jnp.where(valid, jnp.minimum(starts, ends), 0.0)
        kept = jnp.sum(jnp.where(valid, ends - starts, 0.0))
        return starts, ends, count, kept

    return jax.jit(op)
