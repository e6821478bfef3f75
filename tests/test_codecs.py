"""Codec-family coverage (BASELINE config 3: HEVC / 4K / copy-vs-cut).

Notes on MV export support in libavcodec: the MOTION_VECTORS side data is
produced by the mpegvideo/h264 decoder family (h264, mpeg1/2/4, vc1...).
The HEVC decoder in this FFmpeg 5.x exports none — the reference would
scan HEVC and find zero motion (check_frame's !sd early-out) — so HEVC
automatically takes our pixel-domain SAD path; on newer FFmpeg libs with
HEVC MV export the MV path works unchanged (side data is read
generically).
"""

import os

import numpy as np
import pytest

from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.io import native
from mvtrim_tpu.pipeline.pipeline import ProcessingPipeline


class TestHEVC:
    @pytest.fixture(scope="class")
    def hevc_clip(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("codecs") / "hevc.mp4")
        native.synthesize(path, width=1280, height=720, fps=25.0,
                          duration=10.0, codec="libx265",
                          motion_windows=((2.0, 4.0),))
        return path

    def test_decodes_and_trims_via_sad_fallback(self, hevc_clip, tmp_path):
        with native.VideoReader(hevc_clip) as r:
            assert r.width == 1280 and r.height == 720
        out = str(tmp_path / "hevc_out.mp4")
        p = ProcessingPipeline(hevc_clip, out, cfg=Config())
        assert p.run() == 0
        assert os.path.exists(out)
        assert 50.0 < p.saved_pct < 85.0
        with native.VideoReader(out) as r:
            assert 2.0 < r.duration < 5.0

    def test_mv_path_when_runtime_capable(self, hevc_clip, tmp_path):
        """On FFmpeg >= 7 runtimes (deployment image) HEVC rides the MV
        path natively — no SAD fallback.  Capability-gated: skips on
        libav builds that export no HEVC MV side data."""
        if not native.hevc_mv_export_capable():
            pytest.skip("linked libavcodec exports no HEVC MV side data "
                        "(FFmpeg < 7); deployment image builds FFmpeg 8")
        cfg = Config()
        with native.VideoReader(hevc_clip) as r:
            from mvtrim_tpu.core.types import GridGeometry

            geom = GridGeometry.build(r.width, r.height, cfg)
            tm = native.ScanTiming()
            grids, pts = r.scan_grids(
                0.0, r.duration + 1, threshold_sq=cfg.mv_threshold_sq,
                block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
                y_min=geom.y_min, y_max=geom.y_max, max_frames=300,
                timing=tm)
        assert tm.frames_with_mvs > 0
        assert grids.sum() > 0  # votes actually landed

    def test_min_savings_copy_decision(self, hevc_clip, tmp_path):
        out = str(tmp_path / "hevc_copy.mp4")
        p = ProcessingPipeline(hevc_clip, out,
                               cfg=Config(min_savings_pct=99.0))
        assert p.run() == 0
        with native.VideoReader(hevc_clip) as a, native.VideoReader(out) as b:
            assert abs(a.duration - b.duration) < 0.5


class TestMPEG2:
    def test_mv_path_works(self, tmp_path):
        """mpeg2video is in the MV-exporting decoder family."""
        path = str(tmp_path / "m2.mpg")
        native.synthesize(path, width=640, height=480, fps=25.0,
                          duration=8.0, codec="mpeg2video",
                          motion_windows=((2.0, 4.0),))
        cfg = Config()
        with native.VideoReader(path) as r:
            geom = GridGeometry.build(r.width, r.height, cfg)
            timing = native.ScanTiming()
            grids, pts = r.scan_grids(
                0.0, r.duration, threshold_sq=cfg.mv_threshold_sq,
                block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
                y_min=geom.y_min, y_max=geom.y_max, max_frames=256,
                timing=timing)
        assert timing.frames_with_mvs > 0, "mpeg2 exported no MVs"
        assert grids.max() >= 1


class Test4K:
    def test_large_grid_mv_path(self, tmp_path):
        """4K H.264: 240x135 grid through the MV path end to end."""
        path = str(tmp_path / "uhd.mp4")
        native.synthesize(path, width=3840, height=2160, fps=25.0,
                          duration=4.0, codec="libx264",
                          motion_windows=((1.0, 2.5),))
        cfg = Config()
        geom = GridGeometry.build(3840, 2160, cfg)
        assert (geom.gw, geom.gh) == (240, 135)
        assert cfg.vertical_margin(geom.gh) == 6
        out = str(tmp_path / "uhd_out.mp4")
        p = ProcessingPipeline(path, out, cfg=cfg)
        assert p.run() == 0
        assert os.path.exists(out)
        assert p.saved_pct > 30.0


class TestBFrames:
    @pytest.fixture(scope="class")
    def b_clip(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("bframes") / "b.mp4")
        native.synthesize(path, width=320, height=240, fps=25.0,
                          duration=10.0, codec="libx264",
                          motion_windows=((2.0, 4.0),), b_frames=2)
        return path

    def test_clip_has_b_frames(self, b_clip):
        from mvtrim_tpu.tools import extract_mvs
        doc = extract_mvs.extract(b_clip)
        types = {f["frame_type"] for f in doc["frames"]}
        assert "B" in types, f"no B-frames produced: {types}"
        # decode-order export: every decoded frame indexed contiguously
        idx = [f["frame_index"] for f in doc["frames"]]
        assert idx == list(range(1, len(idx) + 1))
        assert len(idx) >= 240  # ~250 frames, drain included

    def test_scan_skips_bidir_like_reference(self, b_clip):
        """MV mode sets skip_frame=BIDIR (motion_scanner.cpp:154): B-frames
        are not analyzed, but motion is still found on P-frames."""
        with native.VideoReader(b_clip) as r:
            geom = GridGeometry.build(r.width, r.height, Config())
            grids, pts = r.scan_grids(
                0.0, r.duration, threshold_sq=16.0, block_shift=4,
                gw=geom.gw, gh=geom.gh, y_min=geom.y_min, y_max=geom.y_max,
                max_frames=512)
        # fewer analyzed frames than total (B skipped)
        assert 0 < len(pts) < 240
        from mvtrim_tpu.core.oracle import (count_clusters_batch,
                                            effective_clusters_needed)
        # this encode emits one MV per 16x16 macroblock, so vec_need=1
        # (the reference would find nothing at its default 2 either)
        counts = count_clusters_batch(grids, vectors_needed=1,
                                      y_min=geom.y_min, y_max=geom.y_max)
        motion = pts[counts >= effective_clusters_needed(2)]
        assert len(motion) > 5
        assert all(1.9 <= p <= 4.1 for p in motion)

    def test_pipeline_and_cut_on_b_frames(self, b_clip, tmp_path):
        out = str(tmp_path / "b_out.mp4")
        p = ProcessingPipeline(b_clip, out,
                               cfg=Config(scan_backend="oracle",
                                          vectors_needed=1))
        assert p.run() == 0
        assert os.path.exists(out)
        with native.VideoReader(out) as r:
            # cut output decodes cleanly with reordered B-frames
            g, pts = r.scan_grids(0.0, r.duration, threshold_sq=16.0,
                                  block_shift=4, gw=20, gh=15, y_min=0,
                                  y_max=15, max_frames=256)
            assert len(pts) > 30


class TestNoisyCCTV:
    def test_threshold_rejects_noise(self, tmp_path):
        """Sensor-like per-frame noise makes the encoder's motion search
        emit spurious MVs; the documented tuning workflow (raise
        MV_THRESHOLD_SQ, as the shipped env file does) rejects them while
        the real motion window is kept."""
        path = str(tmp_path / "noisy.mp4")
        native.synthesize(path, width=640, height=480, fps=25.0,
                          duration=12.0, codec="libx264",
                          motion_windows=((3.0, 6.0),), noise=6)
        # defaults: noise floods the detector, almost nothing is trimmed
        p0 = ProcessingPipeline(path, str(tmp_path / "o0.mp4"),
                                cfg=Config(scan_backend="oracle"))
        assert p0.run() == 0
        assert p0.saved_pct < 20.0
        # tuned threshold (|mv| >= 8px): noise rejected, window found
        p1 = ProcessingPipeline(
            path, str(tmp_path / "o1.mp4"),
            cfg=Config(scan_backend="oracle", mv_threshold_sq=64.0))
        assert p1.run() == 0
        assert 50.0 < p1.saved_pct < 80.0

    def test_noise_increases_mv_count(self, tmp_path):
        quiet = str(tmp_path / "q.mp4")
        noisy = str(tmp_path / "n.mp4")
        for path, noise in ((quiet, 0), (noisy, 8)):
            native.synthesize(path, width=320, height=240, fps=25.0,
                              duration=4.0, codec="libx264",
                              motion_windows=(), noise=noise)
        def total_mvs(path):
            with native.VideoReader(path) as r:
                _, counts, _ = r.scan_mvs(0.0, r.duration, max_frames=128)
            return int(np.abs(counts).sum())
        assert total_mvs(noisy) > total_mvs(quiet)


class TestContainers:
    @pytest.mark.parametrize("ext", ["mkv", "ts", "avi"])
    def test_scan_and_cut(self, tmp_path, ext):
        """Every container in the batch extension filter (main.cpp:68-69)
        must decode, scan, and cut."""
        path = str(tmp_path / f"c.{ext}")
        codec = "mpeg4" if ext == "avi" else "libx264"
        native.synthesize(path, width=320, height=240, fps=25.0,
                          duration=8.0, codec=codec,
                          motion_windows=((2.0, 4.0),))
        with native.VideoReader(path) as r:
            geom = GridGeometry.build(r.width, r.height, Config())
            g, p = r.scan_grids(0.0, r.duration, threshold_sq=16.0,
                                block_shift=4, gw=geom.gw, gh=geom.gh,
                                y_min=geom.y_min, y_max=geom.y_max,
                                max_frames=256)
            assert len(p) > 150
        out = str(tmp_path / f"out.{ext}")
        native.cut(path, out, [(1.5, 4.5)])
        with native.VideoReader(out) as r:
            assert 2.0 < r.duration < 5.5
