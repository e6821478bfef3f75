"""Device segmentation op + sharded archive scan tests."""

import numpy as np
import pytest

from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import TimeSegment
from mvtrim_tpu.io import native
from mvtrim_tpu.ops.segmentation import make_segment_op
from mvtrim_tpu.parallel.archive import scan_archive
from mvtrim_tpu.parallel.mesh import build_mesh


def run_op(ts_motion, duration, max_gap=5.0, pad=0.5, cap=16):
    ts = np.asarray([t for t, _ in ts_motion], np.float32)
    motion = np.asarray([m for _, m in ts_motion], bool)
    op = make_segment_op(cap, max_gap_sec=max_gap, padding_sec=pad)
    starts, ends, count, kept = op(ts, motion, np.float32(duration))
    n = int(count)
    return ([TimeSegment(round(float(s), 4), round(float(e), 4))
             for s, e in zip(np.asarray(starts)[:n], np.asarray(ends)[:n])],
            float(kept))


class TestSegmentOp:
    def test_matches_oracle_basic(self):
        pts = [10.0, 11.0, 12.0, 20.0, 21.0]
        segs, kept = run_op([(t, True) for t in pts], 100.0)
        expect = oracle.segments_from_timestamps(
            pts, max_gap_sec=5.0, padding_sec=0.5, duration=100.0)
        assert segs == expect
        assert kept == pytest.approx(sum(s.end - s.start for s in expect))

    def test_non_motion_frames_ignored(self):
        stream = [(9.0, False), (10.0, True), (10.5, False), (11.0, True),
                  (30.0, False), (40.0, True)]
        segs, _ = run_op(stream, 100.0)
        expect = oracle.segments_from_timestamps(
            [10.0, 11.0, 40.0], max_gap_sec=5.0, padding_sec=0.5,
            duration=100.0)
        assert segs == expect

    def test_no_motion(self):
        segs, kept = run_op([(1.0, False), (2.0, False)], 10.0)
        assert segs == [] and kept == 0.0

    def test_clamping(self):
        segs, _ = run_op([(0.2, True), (9.9, True)], 10.0, max_gap=2.0)
        expect = oracle.segments_from_timestamps(
            [0.2, 9.9], max_gap_sec=2.0, padding_sec=0.5, duration=10.0)
        assert segs == expect

    def test_random_streams_match_oracle(self, rng):
        for _ in range(10):
            n = 64
            ts = np.sort(rng.uniform(0, 300, n)).astype(np.float32)
            ts = np.unique(ts)
            motion = rng.random(len(ts)) < 0.3
            segs, _ = run_op(list(zip(ts.tolist(), motion.tolist())), 300.0,
                             max_gap=7.0, pad=1.0, cap=64)
            expect = oracle.segments_from_timestamps(
                ts[motion].astype(np.float64), max_gap_sec=7.0,
                padding_sec=1.0, duration=300.0)
            assert len(segs) == len(expect)
            for got, want in zip(segs, expect):
                assert got.start == pytest.approx(want.start, abs=1e-3)
                assert got.end == pytest.approx(want.end, abs=1e-3)

    def test_capacity_saturation_keeps_first(self):
        # 20 isolated motion frames, cap 4: the FIRST 4 segments are kept
        stream = [(float(10 * i), True) for i in range(20)]
        segs, _ = run_op(stream, 1000.0, max_gap=2.0, cap=4)
        assert len(segs) == 4
        expect = oracle.segments_from_timestamps(
            [10.0 * i for i in range(20)], max_gap_sec=2.0,
            padding_sec=0.5, duration=1000.0)[:4]
        assert segs == expect


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("arch") / "long.mp4")
    native.synthesize(path, width=320, height=240, fps=25.0,
                      duration=30.0, codec="libx264",
                      motion_windows=((3.0, 6.0), (20.0, 22.0)))
    return path


class TestArchiveScan:
    def test_sharded_scan_matches_single_device(self, clip):
        cfg = Config(chunk_duration_sec=5.0)
        mesh8 = build_mesh(8, sweep=1)
        segs8, dur, stats = scan_archive(clip, cfg, mesh=mesh8,
                                         frames_per_device=32)
        assert stats["mesh"]["data"] == 8
        assert stats["dispatches"] >= 2
        # observability parity with the pipeline phase tree: the decode
        # dominates on any real clip, and every frame decoded carries time
        assert stats["worker_us"]["decode"] > 0
        assert stats["worker_us"]["analyze"] >= 0
        mesh1 = build_mesh(1, sweep=1)
        segs1, _, _ = scan_archive(clip, cfg, mesh=mesh1,
                                   frames_per_device=64)
        assert segs8 == segs1
        # both motion windows are represented (detection onset depends on
        # encoder GOP/partition dynamics; require overlap, not exact edges)
        assert len(segs8) == 2
        assert segs8[0].start < 6.0 and segs8[0].end > 3.0
        assert segs8[1].start < 22.0 and segs8[1].end > 20.0


class TestArchiveCheckpoint:
    def test_resume_skips_chunks_and_matches(self, clip, tmp_path):
        cfg = Config(chunk_duration_sec=5.0)
        mesh = build_mesh(2, sweep=1)
        ck = str(tmp_path / "scan.ckpt")
        # full scan writing the checkpoint
        segs_a, dur, stats_a = scan_archive(clip, cfg, mesh=mesh,
                                            frames_per_device=64,
                                            checkpoint=ck)
        assert stats_a["resumed_chunks"] == 0
        import os
        assert os.path.exists(ck)
        # resume: everything is checkpointed, nothing rescanned
        segs_b, _, stats_b = scan_archive(clip, cfg, mesh=mesh,
                                          frames_per_device=64,
                                          checkpoint=ck)
        assert stats_b["resumed_chunks"] == 6  # 30s / 5s chunks
        assert stats_b["frames_scanned"] == 0
        assert segs_b == segs_a

    def test_partial_checkpoint_resumes(self, clip, tmp_path):
        import json
        cfg = Config(chunk_duration_sec=5.0)
        mesh = build_mesh(1, sweep=1)
        ck_full = str(tmp_path / "full.ckpt")
        segs_full, _, _ = scan_archive(clip, cfg, mesh=mesh,
                                       frames_per_device=64,
                                       checkpoint=ck_full)
        # simulate an interrupted scan: keep only the first 3 chunk records
        # (plus the identity header the sidecar leads with)
        lines = open(ck_full).read().strip().split("\n")
        all_recs = [json.loads(x) for x in lines]
        header = [r for r in all_recs if "header" in r]
        assert len(header) == 1
        recs = sorted((r for r in all_recs if "chunk" in r),
                      key=lambda r: r["chunk"])
        ck_part = str(tmp_path / "part.ckpt")
        with open(ck_part, "w") as f:
            for r in header + recs[:3]:
                f.write(json.dumps(r) + "\n")
        segs_res, _, stats = scan_archive(clip, cfg, mesh=mesh,
                                          frames_per_device=64,
                                          checkpoint=ck_part)
        assert stats["resumed_chunks"] == 3
        assert segs_res == segs_full

    def test_legacy_headerless_sidecar_resumes_but_is_never_stamped(
            self, clip, tmp_path):
        """Pre-identity-header sidecars (chunk records only) must still
        resume — with a warning, not a refusal — and must NOT be stamped
        with the current identity: stamping would convert 'cannot verify'
        into 'verified' for chunk records this scan never checked."""
        import json
        cfg = Config(chunk_duration_sec=5.0)
        mesh = build_mesh(1, sweep=1)
        ck_full = str(tmp_path / "full.ckpt")
        segs_full, _, _ = scan_archive(clip, cfg, mesh=mesh,
                                       frames_per_device=64,
                                       checkpoint=ck_full)
        legacy = str(tmp_path / "legacy.ckpt")
        with open(legacy, "w") as f:
            for line in open(ck_full):
                if "header" not in json.loads(line):
                    f.write(line)
        for _ in range(2):  # every resume stays unverified (and warns)
            segs_res, _, stats = scan_archive(clip, cfg, mesh=mesh,
                                              frames_per_device=64,
                                              checkpoint=legacy)
            assert stats["resumed_chunks"] == 6
            assert segs_res == segs_full
            headers = [json.loads(x) for x in open(legacy)
                       if "header" in json.loads(x)]
            assert headers == []

    def test_foreign_checkpoint_rejected(self, clip, tmp_path):
        """A sidecar written under a different config must fail loudly
        instead of silently merging foreign chunk results."""
        import pytest
        cfg = Config(chunk_duration_sec=5.0)
        mesh = build_mesh(1, sweep=1)
        ck = str(tmp_path / "scan.ckpt")
        scan_archive(clip, cfg, mesh=mesh, frames_per_device=64,
                     checkpoint=ck)
        other = Config(chunk_duration_sec=5.0, mv_threshold_sq=999)
        with pytest.raises(RuntimeError, match="different scan"):
            scan_archive(clip, other, mesh=mesh, frames_per_device=64,
                         checkpoint=ck)

    def test_sigkill_mid_scan_resumes(self, clip, tmp_path):
        """Crash consistency at the process level: a scan SIGKILLed
        mid-run (right after its 3rd chunk record hits the sidecar)
        must leave a sidecar a fresh process resumes from, producing
        segments identical to an uninterrupted scan.  (The reference's
        only resume granularity is the whole-file output-exists skip,
        batch_processor.cpp:66-69.)"""
        import os
        import signal
        import subprocess
        import sys

        ck = str(tmp_path / "scan.ckpt")
        child = (
            "import os, signal\n"
            # axon-style sitecustomize prepends its platform and routes
            # everything through the remote-compile tunnel; the env var
            # alone is not enough (the tunnel's cold compile blows the
            # 300s timeout) — override the config like conftest does
            "import jax\n"
            "if jax.config.jax_platforms != 'cpu':\n"
            "    jax.config.update('jax_platforms', 'cpu')\n"
            "import mvtrim_tpu.parallel.archive as A\n"
            "orig = A.ScanCheckpoint.record\n"
            "n = [0]\n"
            "def rec(self, cid, ts):\n"
            "    orig(self, cid, ts)\n"
            "    n[0] += 1\n"
            "    if n[0] == 3:\n"
            "        os.kill(os.getpid(), signal.SIGKILL)\n"
            "A.ScanCheckpoint.record = rec\n"
            "from mvtrim_tpu.core.config import Config\n"
            "from mvtrim_tpu.parallel.mesh import build_mesh\n"
            f"A.scan_archive({clip!r}, Config(chunk_duration_sec=5.0),\n"
            "               mesh=build_mesh(1, sweep=1),\n"
            f"               frames_per_device=64, checkpoint={ck!r})\n"
        )
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.getcwd() + os.pathsep + \
            env.get("PYTHONPATH", "")
        p = subprocess.run([sys.executable, "-c", child], env=env,
                           capture_output=True, timeout=300)
        assert p.returncode == -signal.SIGKILL, p.stderr.decode()[-2000:]

        cfg = Config(chunk_duration_sec=5.0)
        mesh = build_mesh(1, sweep=1)
        segs_full, _, _ = scan_archive(clip, cfg, mesh=mesh,
                                       frames_per_device=64)
        segs_res, _, stats = scan_archive(clip, cfg, mesh=mesh,
                                          frames_per_device=64,
                                          checkpoint=ck)
        assert stats["resumed_chunks"] == 3
        assert segs_res == segs_full

    def test_truncated_tail_line_tolerated(self, clip, tmp_path):
        """A kill mid-append leaves a truncated final line; resume must
        tolerate it (costing one chunk re-scan), not crash."""
        cfg = Config(chunk_duration_sec=5.0)
        mesh = build_mesh(1, sweep=1)
        ck = str(tmp_path / "scan.ckpt")
        segs_full, _, _ = scan_archive(clip, cfg, mesh=mesh,
                                       frames_per_device=64,
                                       checkpoint=ck)
        with open(ck, "a") as f:
            f.write('{"chunk": 99, "motion_')  # torn write
        segs_res, _, stats = scan_archive(clip, cfg, mesh=mesh,
                                          frames_per_device=64,
                                          checkpoint=ck)
        assert stats["resumed_chunks"] == 6
        assert segs_res == segs_full


class TestArchivePipelineEquivalence:
    def test_archive_mode_matches_standard_pipeline(self, clip, tmp_path):
        """MVT_ARCHIVE=1 and the standard pipeline must produce identical
        quantized cut segments for the same clip/config."""
        from mvtrim_tpu.cut.executor import quantized_segments
        from mvtrim_tpu.pipeline.pipeline import ProcessingPipeline
        from mvtrim_tpu.core import oracle as orc

        cfg = Config(scan_backend="oracle", chunk_duration_sec=5.0)
        segs_arch, dur, _ = scan_archive(clip, cfg, mesh=build_mesh(4, sweep=1),
                                         frames_per_device=64)
        # run the standard pipeline capturing its emitted segments via the
        # fake-ffmpeg concat dump
        import os
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dump = str(tmp_path / "std.txt")
        env = dict(os.environ,
                   MVT_FFMPEG_BIN=os.path.join(repo, "parity",
                                               "fake_ffmpeg.sh"),
                   MVT_CONCAT_DUMP=dump, MVT_SCAN_BACKEND="oracle",
                   CHUNK_DURATION_SEC="5.0", MVT_LOG="0")
        subprocess.run([sys.executable, "-m", "mvtrim_tpu", clip,
                        str(tmp_path / "std.mp4")], env=env, cwd=repo,
                       check=True, capture_output=True, timeout=300)
        std_concat = open(dump).read()
        _, out_segments = orc.decide_cut(segs_arch, dur,
                                         cfg.min_savings_pct)
        arch_concat = orc.concat_list(os.path.abspath(clip), out_segments)
        assert arch_concat == std_concat
