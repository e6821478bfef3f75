"""Cut-executor boundary conditions: degenerate segments must not crash
or corrupt output (the reference gets equivalent safety from the ffmpeg
binary; our native remux needs its own proof)."""

import os

import pytest

from mvtrim_tpu.core.types import TimeSegment
from mvtrim_tpu.cut.executor import execute_cut, quantized_segments
from mvtrim_tpu.io import native


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cutedge") / "c.mp4")
    native.synthesize(path, width=320, height=240, fps=25.0, duration=10.0,
                      codec="libx264", motion_windows=((2.0, 4.0),))
    return path


class TestQuantization:
    def test_drops_empty_and_rounds(self):
        segs = [TimeSegment(1.004, 1.004), TimeSegment(2.006, 2.014),
                TimeSegment(3.0, 5.0)]
        q = quantized_segments(segs)
        # 1.00-1.00 dropped; 2.01-2.01 collapses after rounding -> dropped
        assert q == [(3.0, 5.0)]

    def test_negative_duration_dropped(self):
        assert quantized_segments([TimeSegment(5.0, 3.0)]) == []


class TestNativeCutEdges:
    def test_segment_past_end_of_video(self, clip, tmp_path):
        # seek beyond EOF: segment contributes nothing but must not corrupt
        out = str(tmp_path / "past.mp4")
        native.cut(clip, out, [(2.0, 4.0), (50.0, 60.0)])
        with native.VideoReader(out) as r:
            assert 1.5 < r.duration < 5.0

    def test_overlapping_segments(self, clip, tmp_path):
        # monotonic-dts repair must keep the output muxable
        out = str(tmp_path / "overlap.mp4")
        native.cut(clip, out, [(2.0, 5.0), (4.0, 7.0)])
        with native.VideoReader(out) as r:
            g, pts = r.scan_grids(0.0, r.duration, threshold_sq=16.0,
                                  block_shift=4, gw=20, gh=15, y_min=0,
                                  y_max=15, max_frames=512)
            assert len(pts) > 50
            assert (pts[1:] > pts[:-1]).all()

    def test_whole_video_single_segment(self, clip, tmp_path):
        out = str(tmp_path / "whole.mp4")
        with native.VideoReader(clip) as r:
            dur = r.duration
        native.cut(clip, out, [(0.0, dur + 5.0)])  # outpoint beyond end
        with native.VideoReader(out) as r:
            assert abs(r.duration - dur) < 0.5

    def test_executor_empty_segments_noop(self, clip, tmp_path):
        out = str(tmp_path / "noop.mp4")
        rc = execute_cut(clip, out, [TimeSegment(3.0, 3.0)])
        assert rc == 0
        assert not os.path.exists(out)

    def test_many_tiny_segments(self, clip, tmp_path):
        out = str(tmp_path / "tiny.mp4")
        segs = [(float(t), float(t) + 0.2) for t in range(1, 9)]
        native.cut(clip, out, segs)
        with native.VideoReader(out) as r:
            assert r.duration > 1.0  # 8 x 0.2s + keyframe preroll


class TestConcatMemfd:
    def test_memfd_concat_delivery(self):
        """The concat list rides an anonymous memfd exposed as
        /proc/<pid>/fd/<fd> (reference pipeline.cpp:476-498) — readable
        by a child process, no disk file."""
        import os
        import subprocess
        from mvtrim_tpu.cut.executor import _concat_list_fd

        text = "file 'x.mp4'\ninpoint 1.00\noutpoint 2.00\n"
        path, fd, unlink = _concat_list_fd(text)
        try:
            assert path.startswith(f"/proc/{os.getpid()}/fd/")
            assert fd is not None and unlink is False
            # a child process can read it through the /proc path
            out = subprocess.run(["cat", path], capture_output=True,
                                 text=True)
            assert out.returncode == 0 and out.stdout == text
        finally:
            if fd is not None:
                os.close(fd)
