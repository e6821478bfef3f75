"""Multi-config sweep ops + tune tool (capability beyond the reference)."""

import numpy as np
import pytest

from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.io import native
from mvtrim_tpu.ops.mv_vote import threshold_bound
from mvtrim_tpu.ops.sweep import make_mv_sweep_op, make_vote_sweep_op
from mvtrim_tpu.tools import tune

CFG = Config()
GEOM = GridGeometry.build(640, 480, CFG)


class TestVoteSweep:
    def test_matches_oracle_per_config(self, rng):
        grids = rng.integers(0, 6, size=(24, GEOM.gh, GEOM.gw),
                             dtype=np.uint8)
        padded = np.zeros((24, GEOM.padded_gh, GEOM.padded_gw), np.uint8)
        padded[:, :GEOM.gh, :GEOM.gw] = grids
        vec_needs = np.asarray([1, 2, 4, 0], np.int32)
        clust_needs = np.asarray([1, 2, 1, 3], np.int32)
        op = make_vote_sweep_op(GEOM)
        motion = np.asarray(op(padded, vec_needs, clust_needs))
        assert motion.shape == (24, 4)
        for k, (vn, cn) in enumerate(zip(vec_needs, clust_needs)):
            counts = oracle.count_clusters_batch(
                grids, vectors_needed=int(vn),
                y_min=GEOM.y_min, y_max=GEOM.y_max)
            expect = counts >= oracle.effective_clusters_needed(int(cn))
            np.testing.assert_array_equal(motion[:, k], expect,
                                          err_msg=f"config {k}")


class TestMVSweep:
    def test_matches_single_config_ops(self, rng):
        b, m = 8, 256
        dst = rng.integers(0, 640, size=(b, m)).astype(np.int32)
        dsty = rng.integers(0, 480, size=(b, m)).astype(np.int32)
        src = dst - rng.integers(-8, 9, size=(b, m)).astype(np.int32)
        srcy = dsty - rng.integers(-8, 9, size=(b, m)).astype(np.int32)
        counts = rng.integers(50, m, size=(b,)).astype(np.int32)

        configs = [(16.0, 2, 2), (4.0, 1, 1), (64.0, 4, 1)]
        bounds = np.asarray([threshold_bound(t) for t, _, _ in configs],
                            np.int32)
        vecs = np.asarray([v for _, v, _ in configs], np.int32)
        clus = np.asarray([c for _, _, c in configs], np.int32)
        op = make_mv_sweep_op(GEOM, CFG.block_shift)
        motion = np.asarray(op(dst, dsty, src, srcy, counts,
                               bounds, vecs, clus))
        for k, (thr, vn, cn) in enumerate(configs):
            for i in range(b):
                mvs = np.stack([dst[i], dsty[i], src[i], srcy[i]],
                               axis=1)[:counts[i]].astype(np.int64)
                expect = oracle.check_frame(
                    mvs, GEOM.gw, GEOM.gh, threshold_sq=thr,
                    block_shift=CFG.block_shift, y_min=GEOM.y_min,
                    y_max=GEOM.y_max, vectors_needed=vn,
                    clusters_needed=cn)
                assert bool(motion[i, k]) == expect, (k, i)


class TestTuneTool:
    def test_sweep_on_clip(self, tmp_path):
        clip = str(tmp_path / "t.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((2.0, 4.0),))
        results = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2],
                             cfg=Config(), batch_frames=64)
        assert len(results) == 8
        # looser configs find at least as many motion frames
        loosest = next(r for r in results if r["mv_threshold_sq"] == 4.0
                       and r["vectors_needed"] == 1
                       and r["clusters_needed"] == 1)
        strictest = next(r for r in results if r["mv_threshold_sq"] == 16.0
                         and r["vectors_needed"] == 2
                         and r["clusters_needed"] == 2)
        assert loosest["motion_frames"] >= strictest["motion_frames"]
        # the default config's result matches a plain pipeline-style scan
        assert strictest["motion_frames"] > 0
        assert 0 <= strictest["saved_pct"] <= 100

    def test_device_stats_matches_host_path(self, tmp_path):
        """--device-stats (ops/segmentation.py consumer) agrees with the
        float64 host path: identical motion/segment counts, savings
        within f32 slack."""
        clip = str(tmp_path / "d.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 2.5), (5.0, 6.0)))
        kw = dict(cfg=Config(max_gap_sec=1.0), batch_frames=64)
        host = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2], **kw)
        dev = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2],
                         device_stats=True, **kw)
        assert len(host) == len(dev) == 8
        for h, d in zip(host, dev):
            assert d["stats"] == "device_f32"
            assert d["motion_frames"] == h["motion_frames"], (h, d)
            assert d["segments"] == h["segments"], (h, d)
            assert abs(d["saved_pct"] - h["saved_pct"]) < 0.05, (h, d)

    @pytest.mark.parametrize("n,s", [(8, 4), (8, 1), (4, 2)])
    def test_mesh_sweep_matches_single_device(self, tmp_path, n, s):
        """tune --mesh (the sharded_scan_step product surface): frames
        sharded over 'data', (vectors, clusters) pairs over 'sweep' —
        identical stats table to the single-device sweep, including
        config counts that don't divide the sweep axis (padding)."""
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "m.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 2.5), (5.0, 6.0)))
        kw = dict(cfg=Config(max_gap_sec=1.0), batch_frames=50)
        single = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2, 3], **kw)
        mesh = build_mesh(n, sweep=s)
        sharded = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2, 3],
                             mesh=mesh, **kw)
        assert sharded == single

    def test_mesh_sweep_device_stats(self, tmp_path):
        """--mesh composes with --device-stats (sharded scoring feeding
        the device segmentation op)."""
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "md.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 2.5),))
        kw = dict(cfg=Config(max_gap_sec=1.0), batch_frames=64)
        host = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2], **kw)
        dev = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2],
                         mesh=build_mesh(8, sweep=2), device_stats=True,
                         **kw)
        for h, d in zip(host, dev):
            assert d["motion_frames"] == h["motion_frames"], (h, d)
            assert d["segments"] == h["segments"], (h, d)
            assert abs(d["saved_pct"] - h["saved_pct"]) < 0.05, (h, d)

    def test_mesh_rejects_mv_raw(self, tmp_path):
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "mr0.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=4.0, codec="libx264",
                          motion_windows=((1.0, 2.0),))
        with pytest.raises(ValueError, match="grids"):
            tune.sweep(clip, [16.0], [2], [2], mesh=build_mesh(2),
                       scan_input="mv_raw", cfg=Config())

    def test_mv_raw_sweep_matches_grids_sweep(self, tmp_path):
        """tune --scan-input mv_raw (make_mv_sweep_op product surface)
        produces the identical stats table to the grids sweep."""
        clip = str(tmp_path / "mr.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 3.0), (5.5, 6.5)))
        kw = dict(cfg=Config(), batch_frames=64)
        grids = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2], **kw)
        mvraw = tune.sweep(clip, [4.0, 16.0], [1, 2], [1, 2],
                           scan_input="mv_raw", **kw)
        assert mvraw == grids

    def test_mv_raw_sweep_overflow_exact(self, tmp_path):
        """Tiny MV capacity: the sweep re-decodes at a fitting capacity
        instead of scoring truncated lists."""
        clip = str(tmp_path / "mo.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=6.0, codec="libx264",
                          motion_windows=((1.0, 4.0),), noise=2)
        ref = tune.sweep(clip, [4.0], [1], [2], cfg=Config(),
                         batch_frames=64)
        ovf = tune.sweep(clip, [4.0], [1], [2],
                         cfg=Config(mv_capacity=8), batch_frames=64,
                         scan_input="mv_raw")
        assert ovf == ref

    def test_mv_raw_with_device_stats(self, tmp_path):
        """Both knobs together: raw-MV sweep + device segmentation
        stats agree with the grids + device-stats table."""
        clip = str(tmp_path / "md.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((2.0, 4.0),))
        kw = dict(cfg=Config(), batch_frames=64, device_stats=True)
        a = tune.sweep(clip, [4.0, 16.0], [1, 2], [2], **kw)
        b = tune.sweep(clip, [4.0, 16.0], [1, 2], [2],
                       scan_input="mv_raw", **kw)
        assert a == b


def _sad_detector_run(clip: str, cfg: Config):
    """Pipeline-style single-config SAD scan: chunked decode with the
    cap-resume carry threading (pipeline/pipeline.py luma branch) feeding
    SADDetector — the per-config ground truth the sweep must match."""
    import math

    from mvtrim_tpu.models.sad_detector import SADDetector

    reader = native.VideoReader(clip)
    duration, fps = reader.duration, reader.fps
    det = SADDetector(reader.width, reader.height, cfg)
    frame_skip = cfg.frame_skip(fps)
    cap = int(math.ceil(cfg.chunk_duration_sec * max(fps, 1.0))) + 64
    if cfg.chunk_frames_cap > 0:
        cap = min(cap, cfg.chunk_frames_cap)
    cur = native.ChunkScanCursor(duration, cfg.chunk_duration_sec, cap)
    carry = None
    ts: list[float] = []
    while cur.more():
        start, end = cur.window()
        if not cur.resume:
            carry = None
        data, pts = reader.scan_luma(start, end, frame_skip=frame_skip,
                                     max_frames=cap, resume=cur.resume)
        cur.advance(len(pts))
        if len(pts) == 0:
            continue
        motion = det.scan_luma(data, carry=carry)
        ts.extend(pts[motion].tolist())
        carry = data[-1].copy()
    reader.close()
    return ts, duration


def sad_reference_rows(clip: str, thresholds, clusters, cfg: Config):
    """K independent SADDetector runs -> the stats table sweep_sad must
    reproduce from ONE decode."""
    import dataclasses

    rows = []
    for thr in thresholds:
        for clu in clusters:
            c = dataclasses.replace(cfg, sad_threshold=thr,
                                    clusters_needed=clu)
            ts, duration = _sad_detector_run(clip, c)
            merged = oracle.merge_timestamps(ts)
            segments = oracle.segments_from_timestamps(
                merged, max_gap_sec=c.max_gap_sec,
                padding_sec=c.padding_sec, duration=duration)
            _, saved_pct = oracle.savings(segments, duration)
            rows.append({"sad_threshold": thr, "clusters_needed": clu,
                         "motion_frames": int(merged.size),
                         "segments": len(segments),
                         "saved_pct": round(saved_pct, 2)})
    return rows


class TestSADSweep:
    """tune --scan-input sad: the pixel-domain sweep route (one luma
    decode for K (sad_threshold, clusters_needed) configs) must be
    bit-identical to K independent SADDetector pipeline runs."""

    def test_matches_independent_detector_runs(self, tmp_path):
        clip = str(tmp_path / "s.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((2.0, 4.0), (6.0, 7.0)),
                          noise=2)
        cfg = Config()
        # 0.5 sits below the sensor-noise floor (every frame active),
        # 100 above most box motion — a non-degenerate spread
        thresholds, clusters = [0.5, 8.0, 100.0], [1, 2]
        got = tune.sweep_sad(clip, thresholds, clusters, cfg=cfg,
                             batch_frames=64)
        want = sad_reference_rows(clip, thresholds, clusters, cfg)
        assert got == want
        # the table must not be trivial (all-zero or all-motion)
        frames = [r["motion_frames"] for r in got]
        assert max(frames) > 0 and min(frames) < max(frames)

    def test_cap_resume_carry_is_decision_invariant(self, tmp_path):
        """A tiny chunk-frames cap forces mid-chunk sub-scan resumes;
        the carry threading must keep every decision identical to the
        uncapped sweep (the MVT_CHUNK_FRAMES_CAP contract)."""
        clip = str(tmp_path / "c.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=6.0, codec="libx264",
                          motion_windows=((1.0, 3.0),), noise=2)
        thresholds, clusters = [4.0, 12.0], [1, 2]
        free = tune.sweep_sad(clip, thresholds, clusters,
                              cfg=Config(), batch_frames=64)
        capped = tune.sweep_sad(clip, thresholds, clusters,
                                cfg=Config(chunk_frames_cap=16),
                                batch_frames=7)
        assert capped == free
        # and the capped decode path matches capped detector runs too
        want = sad_reference_rows(clip, thresholds, clusters,
                                  Config(chunk_frames_cap=16))
        assert capped == want

    def test_device_stats_matches_host_path(self, tmp_path):
        clip = str(tmp_path / "sd.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 2.5), (5.0, 6.0)),
                          noise=2)
        kw = dict(cfg=Config(max_gap_sec=1.0), batch_frames=64)
        host = tune.sweep_sad(clip, [4.0, 12.0], [1, 2], **kw)
        dev = tune.sweep_sad(clip, [4.0, 12.0], [1, 2],
                             device_stats=True, **kw)
        assert len(host) == len(dev) == 4
        for h, d in zip(host, dev):
            assert d["stats"] == "device_f32"
            assert d["motion_frames"] == h["motion_frames"], (h, d)
            assert d["segments"] == h["segments"], (h, d)
            assert abs(d["saved_pct"] - h["saved_pct"]) < 0.05, (h, d)

    def test_cli_rejects_vectors(self, tmp_path, capsys):
        clip = str(tmp_path / "x.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=2.0, codec="libx264")
        with pytest.raises(SystemExit):
            tune.main([clip, "--scan-input", "sad", "--vectors", "1,2"])
        capsys.readouterr()

    @pytest.mark.parametrize("n,s", [(8, 4), (8, 1), (4, 2)])
    def test_mesh_sad_sweep_matches_single_device(self, tmp_path, n, s):
        """tune --mesh --scan-input sad (sharded_sad_sweep_step):
        frames over 'data' with per-shard predecessor carries,
        (threshold, clusters) configs over 'sweep' — identical stats
        table to the single-device SAD sweep, including config counts
        that don't divide the sweep axis (padding) and batch sizes that
        don't divide the data axis (rounding)."""
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "ms.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 2.5), (5.0, 6.0)),
                          noise=2)
        kw = dict(cfg=Config(max_gap_sec=1.0), batch_frames=50)
        single = tune.sweep_sad(clip, [0.5, 8.0, 100.0], [1, 2], **kw)
        sharded = tune.sweep_sad(clip, [0.5, 8.0, 100.0], [1, 2],
                                 mesh=build_mesh(n, sweep=s), **kw)
        assert sharded == single
        frames = [r["motion_frames"] for r in single]
        assert max(frames) > 0 and min(frames) < max(frames)

    def test_mesh_sad_sweep_device_stats(self, tmp_path):
        """--mesh composes with --device-stats on the SAD route."""
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "msd.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((1.0, 2.5),), noise=2)
        kw = dict(cfg=Config(max_gap_sec=1.0), batch_frames=64)
        host = tune.sweep_sad(clip, [4.0, 12.0], [1, 2], **kw)
        dev = tune.sweep_sad(clip, [4.0, 12.0], [1, 2],
                             mesh=build_mesh(8, sweep=2),
                             device_stats=True, **kw)
        for h, d in zip(host, dev):
            assert d["motion_frames"] == h["motion_frames"], (h, d)
            assert d["segments"] == h["segments"], (h, d)
            assert abs(d["saved_pct"] - h["saved_pct"]) < 0.05, (h, d)

    def test_mesh_sad_cap_resume(self, tmp_path):
        """The mesh path threads the cap-resume carry identically to
        the single-device path (chunk splits must not change shard
        carries or decisions)."""
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "mc.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=6.0, codec="libx264",
                          motion_windows=((1.0, 3.0),), noise=2)
        free = tune.sweep_sad(clip, [4.0, 12.0], [1, 2],
                              cfg=Config(), batch_frames=64)
        capped = tune.sweep_sad(clip, [4.0, 12.0], [1, 2],
                                cfg=Config(chunk_frames_cap=16),
                                batch_frames=7,
                                mesh=build_mesh(4, sweep=2))
        assert capped == free


class TestVecZeroExactness:
    """The reference decides MV-less frames False unconditionally
    (motion_scanner.cpp:219-221) even at VECTORS_NEEDED=0, where zero
    votes otherwise satisfy >= 0 — the parity rule commit 98d7924 fixed
    in the pipeline ops, extended here to the sweep routes."""

    def test_mv_sweep_mvless_frames_decide_false(self, rng):
        b, m = 4, 64
        dst = rng.integers(0, 640, size=(b, m)).astype(np.int32)
        dsty = rng.integers(0, 480, size=(b, m)).astype(np.int32)
        src = (dst - 8).astype(np.int32)
        srcy = (dsty - 8).astype(np.int32)
        counts = np.asarray([0, m, 0, m], np.int32)  # frames 0/2 are MV-less
        bounds = np.asarray([0, 16], np.int32)
        vecs = np.asarray([0, 1], np.int32)
        clus = np.asarray([1, 1], np.int32)
        op = make_mv_sweep_op(GEOM, CFG.block_shift)
        motion = np.asarray(op(dst, dsty, src, srcy, counts,
                               bounds, vecs, clus))
        assert not motion[0].any() and not motion[2].any()
        assert motion[1].all()  # large uniform motion at loose configs

    def test_tune_vec0_grids_matches_mv_raw(self, tmp_path):
        """The grids route (has_mv-masked) and the mv_raw route (count-
        guarded) must agree row for row at vectors_needed=0 — I-frames
        in the clip are MV-less and decide False on both."""
        clip = str(tmp_path / "v0.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((2.0, 4.0),))
        kw = dict(cfg=Config(), batch_frames=64)
        grids = tune.sweep(clip, [4.0, 16.0], [0, 1], [1, 2], **kw)
        mvraw = tune.sweep(clip, [4.0, 16.0], [0, 1], [1, 2],
                           scan_input="mv_raw", **kw)
        assert grids == mvraw
        # at vec=0 every frame WITH side data is motion, so the count
        # must sit strictly between 0 (all-False bug) and every frame
        # (the pre-fix True-for-I-frames bug)
        v0 = next(r for r in grids if r["vectors_needed"] == 0
                  and r["clusters_needed"] == 1)
        v1 = next(r for r in grids if r["vectors_needed"] == 1
                  and r["clusters_needed"] == 1
                  and r["mv_threshold_sq"] == v0["mv_threshold_sq"])
        assert v0["motion_frames"] > v1["motion_frames"] > 0

    def test_tune_vec0_mesh_matches_single(self, tmp_path):
        from mvtrim_tpu.parallel.mesh import build_mesh

        clip = str(tmp_path / "v0m.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((2.0, 4.0),))
        kw = dict(cfg=Config(), batch_frames=50)
        single = tune.sweep(clip, [16.0], [0, 1], [1], **kw)
        sharded = tune.sweep(clip, [16.0], [0, 1], [1],
                             mesh=build_mesh(4, sweep=2), **kw)
        assert sharded == single

    def test_tune_vec0_device_stats_matches_host(self, tmp_path):
        """The has_mv masking must also hold on the device-stats path,
        where masked motion stays LAZY until the end-of-sweep
        segmentation op resolves it."""
        clip = str(tmp_path / "v0d.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=8.0, codec="libx264",
                          motion_windows=((2.0, 4.0),))
        kw = dict(cfg=Config(), batch_frames=64)
        host = tune.sweep(clip, [16.0], [0, 1], [1], **kw)
        dev = tune.sweep(clip, [16.0], [0, 1], [1],
                         device_stats=True, **kw)
        assert len(host) == len(dev) == 2
        for h, d in zip(host, dev):
            assert d["motion_frames"] == h["motion_frames"], (h, d)
            assert d["segments"] == h["segments"], (h, d)

    def test_tune_uint8_wrap(self, tmp_path):
        """VECTORS_NEEDED is a uint8 in the reference (config.hpp:74):
        256 wraps to 0 and -1 to 255 — tune must sweep the value the
        reference/pipeline would actually run."""
        clip = str(tmp_path / "wrap.mp4")
        native.synthesize(clip, width=320, height=240, fps=25.0,
                          duration=6.0, codec="libx264",
                          motion_windows=((1.0, 3.0),))
        kw = dict(cfg=Config(), batch_frames=64)
        rows = tune.sweep(clip, [16.0], [0, 256, 255, -1], [1], **kw)
        by_vec = {r["vectors_needed"]: r for r in rows}
        assert by_vec[256]["motion_frames"] == by_vec[0]["motion_frames"]
        assert by_vec[-1]["motion_frames"] == by_vec[255]["motion_frames"]
