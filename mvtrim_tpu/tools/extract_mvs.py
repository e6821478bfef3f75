"""extract_mvs — dump per-frame motion-vector side data to JSON.

Same schema as the reference tool (tools/extract_mvs.cpp:97-169): top-level
``input`` / ``time_base`` / ``frames``; per frame ``frame_index`` (1-based
over every decoded frame), ``pts_seconds`` (best-effort timestamp, null if
unknown), ``frame_type`` (I/P/B/?), ``num_mvs`` and the ``motion_vectors``
list with integer dst and *sub-pel* src derived from motion_x/motion_scale
(extract_mvs.cpp:148-151).

Usage: python -m mvtrim_tpu.tools.extract_mvs input.mp4 output.json
"""

from __future__ import annotations

import json
import sys

from ..io import native

_FRAME_TYPES = {1: "I", 2: "P", 3: "B"}


def extract(input_path: str, *, max_mv: int = 16384,
            chunk_sec: float = 30.0) -> dict:
    """Return the extract_mvs document for a video."""
    with native.VideoReader(input_path, native.MVT_MODE_MV_FULL) as r:
        num, den = r.time_base()
        frames = []
        frame_index = 0
        start = 0.0
        end = r.duration if r.duration > 0 else 1e12
        # chunked sequential export to bound memory; chunks share a handle
        # so B-frame/PTS ordering is contiguous
        t = start
        while t < end:
            t_hi = min(t + chunk_sec, end)
            mvs, counts, pts, ptype = r.scan_mvs_full(
                t, t_hi, max_frames=int(chunk_sec * 120) + 64, max_mv=max_mv)
            for i in range(len(counts)):
                frame_index += 1
                n = abs(int(counts[i]))
                n_stored = min(n, max_mv)
                rows = mvs[i, :n_stored]
                mv_list = []
                for row in rows:
                    (dst_x, dst_y, _src_x, _src_y, w, h,
                     motion_x, motion_y, motion_scale, source) = (
                        int(v) for v in row)
                    scale = motion_scale if motion_scale else 1
                    mv_list.append({
                        "dst_x": dst_x, "dst_y": dst_y,
                        "src_x": round(dst_x + motion_x / scale, 3),
                        "src_y": round(dst_y + motion_y / scale, 3),
                        "w": w, "h": h,
                        "motion_x": motion_x, "motion_y": motion_y,
                        "motion_scale": motion_scale,
                        "source": source,
                    })
                frames.append({
                    "frame_index": frame_index,
                    "pts_seconds": (round(float(pts[i]), 6)
                                    if pts[i] >= 0 else None),
                    "frame_type": _FRAME_TYPES.get(int(ptype[i]), "?"),
                    "num_mvs": n,
                    "motion_vectors": mv_list,
                })
            if len(counts) == 0:
                break
            t = t_hi
    return {
        "input": input_path,
        "time_base": f"{num}/{den}",
        "frames": frames,
    }


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("Usage: extract_mvs input.mp4 output.json", file=sys.stderr)
        return 1
    doc = extract(argv[0])
    with open(argv[1], "w") as f:
        json.dump(doc, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
