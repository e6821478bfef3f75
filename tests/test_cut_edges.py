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


class TestDegenerateCutInvocation:
    """The cut is ALWAYS attempted once the savings gate passed — the
    reference runs ffmpeg even when every segment is zero-length (its
    concat writer drops end <= start lines but the command still runs,
    pipeline.cpp:464-470 + :533-556).  Caught by the round-3 400-seed
    differential fuzz (seed 333: PADDING_SEC=0 + isolated motion frames
    -> empty concat list captured from the reference, nothing from us)."""

    def test_external_cut_invoked_with_empty_list(self, tmp_path):
        import os
        from mvtrim_tpu.core.config import Config
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dump = str(tmp_path / "dump.txt")
        os.environ["MVT_CONCAT_DUMP"] = dump
        try:
            cfg = Config(ffmpeg_bin=os.path.join(repo, "parity",
                                                 "fake_ffmpeg.sh"))
            rc = execute_cut("/tmp/in.mp4", str(tmp_path / "o.mp4"),
                             [TimeSegment(1.0, 1.0), TimeSegment(3.5, 3.5)],
                             cfg=cfg)
        finally:
            os.environ.pop("MVT_CONCAT_DUMP", None)
        assert os.path.exists(dump), "ffmpeg was not invoked"
        assert open(dump).read() == ""          # empty list, like the ref
        assert rc == 0                          # fake ffmpeg exits 0

    def test_external_list_keeps_subcentisecond_segments(self, tmp_path):
        """A 0 < duration < 0.01 segment is WRITTEN with equal %.2f
        in/outpoints — the reference drops only unquantized end <= start."""
        import os
        from mvtrim_tpu.core.config import Config
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dump = str(tmp_path / "dump.txt")
        os.environ["MVT_CONCAT_DUMP"] = dump
        try:
            cfg = Config(ffmpeg_bin=os.path.join(repo, "parity",
                                                 "fake_ffmpeg.sh"))
            execute_cut("/tmp/in.mp4", str(tmp_path / "o.mp4"),
                        [TimeSegment(2.006, 2.014)], cfg=cfg)
        finally:
            os.environ.pop("MVT_CONCAT_DUMP", None)
        text = open(dump).read()
        assert "inpoint 2.01\noutpoint 2.01\n" in text

    def test_native_cut_empty_list_errors_without_output(self, clip,
                                                         tmp_path):
        out = str(tmp_path / "o.mp4")
        rc = execute_cut(clip, out, [TimeSegment(1.0, 1.0)],
                         cfg=__import__("mvtrim_tpu.core.config",
                                        fromlist=["Config"]).Config())
        assert rc == 1                # reference analog: error logged
        assert not os.path.exists(out)


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

    def test_many_tiny_segments(self, clip, tmp_path):
        out = str(tmp_path / "tiny.mp4")
        segs = [(float(t), float(t) + 0.2) for t in range(1, 9)]
        native.cut(clip, out, segs)
        with native.VideoReader(out) as r:
            assert r.duration > 1.0  # 8 x 0.2s + keyframe preroll


class TestCutOutputInvariants:
    """Mechanical validation of the cut's stream/timestamp invariants —
    what one would assert about a real `ffmpeg -f concat -c copy` output
    (reference mechanism ffmpeg_executor.cpp:94-118), checked via
    demux-only packet inspection since this box has no ffmpeg binary."""

    GOP = 25  # 1s keyframe interval at 25fps

    @pytest.fixture(scope="class")
    def av_cut(self, tmp_path_factory):
        import numpy as np

        d = tmp_path_factory.mktemp("cutinv")
        src = str(d / "src.mp4")
        native.synthesize(src, width=320, height=240, fps=25.0,
                          duration=14.0, codec="libx264", gop=self.GOP,
                          motion_windows=((1.0, 3.0), (6.0, 8.0)),
                          with_audio=True)
        out = str(d / "out.mp4")
        segments = [(1.0, 3.5), (6.0, 8.5), (11.0, 12.0)]
        native.cut(src, out, segments)
        packets = native.inspect_packets(out)
        return src, out, segments, packets, np

    def test_monotonic_dts_per_stream(self, av_cut):
        _, _, _, (stream, dts, _, _), np = av_cut
        for st in sorted(set(stream.tolist())):
            d = dts[stream == st]
            d = d[~np.isnan(d)]
            assert len(d) > 10, f"stream {st} nearly empty"
            assert (np.diff(d) >= 0).all(), \
                f"stream {st} dts not monotonic"

    def test_video_splices_start_on_keyframes(self, av_cut):
        """Every segment splice begins at a keyframe (concat+copy can
        only cut on keyframes): the first video packet is key, and every
        video dts jump larger than a GOP's worth of frames lands on one."""
        _, _, _, (stream, dts, _, key), np = av_cut
        v = stream == 0
        vd, vk = dts[v], key[v]
        ok = ~np.isnan(vd)
        vd, vk = vd[ok], vk[ok]
        assert vk[0] == 1, "output must start on a keyframe"
        gaps = np.diff(vd)
        frame_dt = np.median(gaps)
        splices = np.nonzero(gaps > 3 * frame_dt)[0]
        # mvt_cut rebases each segment onto a contiguous timeline, so
        # splices may be seamless in dts; when they ARE visible, they
        # must be keyframe-anchored.  Keyframe count always bounds below
        # by the segment count (each inpoint seeks to a keyframe).
        for i in splices:
            assert vk[i + 1] == 1, \
                f"splice at packet {i + 1} (dts {vd[i + 1]:.2f}) not key"
        assert int(vk.sum()) >= 3, "one keyframe per spliced segment"

    def test_segment_count_and_duration_within_keyframe_tolerance(
            self, av_cut):
        src, out, segments, _, np = av_cut
        want = sum(e - s for s, e in segments)
        tol = len(segments) * (self.GOP / 25.0)  # 1 GOP per inpoint
        with native.VideoReader(out) as r:
            got = r.duration
        assert want - 0.5 <= got <= want + tol + 0.5, (got, want, tol)

    def test_audio_video_interleaving_preserved(self, av_cut):
        """Audio and video stay interleaved on the shared output
        timeline: at any video packet, the most recent audio dts is
        within one segment-splice tolerance (never an un-interleaved
        tail of one stream)."""
        _, _, _, (stream, dts, _, _), np = av_cut
        last_audio = None
        max_skew = 0.0
        for st, d in zip(stream.tolist(), dts.tolist()):
            if np.isnan(d):
                continue
            if st == 1:
                last_audio = d
            elif st == 0 and last_audio is not None:
                max_skew = max(max_skew, abs(d - last_audio))
        assert last_audio is not None, "no audio packets in output"
        assert max_skew < 2.0, f"a/v interleave skew {max_skew:.2f}s"

    def test_all_input_streams_carried(self, av_cut):
        src, out, _, (stream, _, _, _), np = av_cut
        with native.VideoReader(src) as r:
            src_types = r.stream_types()
        with native.VideoReader(out) as r:
            out_types = r.stream_types()
        assert out_types == src_types == [0, 1]
        assert set(stream.tolist()) == {0, 1}

    def test_pipeline_cut_output_passes_invariants(self, tmp_path):
        """End-to-end: the pipeline's own cut output (audio clip, two
        motion windows) satisfies the same packet invariants."""
        import numpy as np
        from mvtrim_tpu.core.config import Config
        from mvtrim_tpu.pipeline.pipeline import ProcessingPipeline
        from mvtrim_tpu.utils.timing import TimingCollector

        src = str(tmp_path / "psrc.mp4")
        native.synthesize(src, width=320, height=240, fps=25.0,
                          duration=12.0, codec="libx264", gop=25,
                          motion_windows=((1.0, 3.0), (7.0, 9.0)),
                          with_audio=True)
        out = str(tmp_path / "pout.mp4")
        cfg = Config(scan_backend="oracle", max_gap_sec=1.5)
        assert ProcessingPipeline(src, out, cfg=cfg).run() == 0
        TimingCollector.clear()
        stream, dts, _, key = native.inspect_packets(out)
        assert set(stream.tolist()) == {0, 1}
        for st in (0, 1):
            d = dts[stream == st]
            d = d[~np.isnan(d)]
            assert (np.diff(d) >= 0).all(), f"stream {st} dts"
        vk = key[stream == 0]
        assert vk[0] == 1


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


class TestCutCpuset:
    """MVT_CUT_CPUSET — the reference's taskset-wrapped ffmpeg child
    (pipeline.cpp:500-515) rebuilt as sched_setaffinity on both cut paths."""

    def test_parse_cpuset_list(self):
        from mvtrim_tpu.utils.system import parse_cpuset_list
        assert parse_cpuset_list("0-3,8,10-11") == [0, 1, 2, 3, 8, 10, 11]
        assert parse_cpuset_list(" 2 , 0-1 ") == [0, 1, 2]
        assert parse_cpuset_list("") == []
        with pytest.raises(ValueError):
            parse_cpuset_list("zero")

    def test_external_child_confined(self, clip, tmp_path):
        """The fake-ffmpeg child must report Cpus_allowed_list == the knob."""
        from mvtrim_tpu.core.config import Config
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dump = str(tmp_path / "aff.txt")
        cpu = sorted(os.sched_getaffinity(0))[0]
        os.environ["MVT_AFFINITY_DUMP"] = dump
        try:
            cfg = Config(ffmpeg_bin=os.path.join(repo, "parity",
                                                 "fake_ffmpeg.sh"),
                         cut_cpuset=str(cpu))
            rc = execute_cut(clip, str(tmp_path / "o.mp4"),
                             [TimeSegment(1.0, 3.0)], cfg=cfg)
        finally:
            del os.environ["MVT_AFFINITY_DUMP"]
        assert rc == 0
        assert open(dump).read().split()[-1] == str(cpu)

    def test_native_path_pinned_and_restored(self, clip, tmp_path):
        """Native remux runs under the cpuset; caller affinity restored."""
        from mvtrim_tpu.core.config import Config
        before = os.sched_getaffinity(0)
        cpu = sorted(before)[0]
        out = str(tmp_path / "n.mp4")
        cfg = Config(cut_cpuset=str(cpu))
        rc = execute_cut(clip, out, [TimeSegment(1.0, 3.0)], cfg=cfg)
        assert rc == 0
        assert os.sched_getaffinity(0) == before
        assert native.VideoReader(out).duration > 0

    def test_bad_cpuset_warns_and_runs_unpinned(self, clip, tmp_path):
        from mvtrim_tpu.core.config import Config
        out = str(tmp_path / "b.mp4")
        rc = execute_cut(clip, out, [TimeSegment(1.0, 3.0)],
                         cfg=Config(cut_cpuset="not-a-cpu"))
        assert rc == 0 and os.path.exists(out)

    def test_empty_cpuset_warns_and_runs_unpinned(self, clip, tmp_path,
                                                  capsys):
        """A spec that parses to NOTHING (',') is as misconfigured as an
        unparseable one: the cut must succeed unpinned AND warn, so the
        operator learns the isolation intent was dropped."""
        from mvtrim_tpu.core.config import Config
        out = str(tmp_path / "e.mp4")
        rc = execute_cut(clip, out, [TimeSegment(1.0, 3.0)],
                         cfg=Config(cut_cpuset=","))
        assert rc == 0 and os.path.exists(out)
        assert "MVT_CUT_CPUSET empty" in capsys.readouterr().out

    def test_out_of_range_cpuset_native_falls_back(self, clip, tmp_path):
        """CPUs that don't exist on this host: warn, cut still succeeds."""
        from mvtrim_tpu.core.config import Config
        out = str(tmp_path / "r.mp4")
        rc = execute_cut(clip, out, [TimeSegment(1.0, 3.0)],
                         cfg=Config(cut_cpuset="4090-4093"))
        assert rc == 0 and os.path.exists(out)

    def test_out_of_range_cpuset_external_falls_back(self, clip, tmp_path,
                                                     capsys):
        """A parseable-but-nonexistent cpuset must not fail EVERY external
        cut (it previously raised EINVAL in the child's preexec): warn,
        run unpinned, succeed."""
        from mvtrim_tpu.core.config import Config
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = Config(ffmpeg_bin=os.path.join(repo, "parity",
                                             "fake_ffmpeg.sh"),
                     cut_cpuset="4090-4093")
        rc = execute_cut(clip, str(tmp_path / "x.mp4"),
                         [TimeSegment(1.0, 3.0)], cfg=cfg)
        assert rc == 0
        assert "no CPU available" in capsys.readouterr().out

    def test_partially_valid_cpuset_pins_to_valid_subset(self, capsys):
        """Stale ids in an otherwise valid set degrade to the usable
        subset instead of EINVAL-ing the cut."""
        from mvtrim_tpu.core.config import Config
        from mvtrim_tpu.cut.executor import _cut_cpus
        cpu = sorted(os.sched_getaffinity(0))[0]
        got = _cut_cpus(Config(cut_cpuset=f"{cpu},4091"))
        assert got == {cpu}
        assert "not available" in capsys.readouterr().out
