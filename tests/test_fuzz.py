"""Config-space fuzz: random geometries/configs/MV sets through every
kernel path must match the oracle bit for bit.

The targeted tests pin known semantics; this sweep guards the corners
nobody thought to write a case for (odd grid sizes, extreme masks,
degenerate thresholds, OOB motion vectors).  MVT_FUZZ_N scales the
trial counts (see CLAUDE.md "Fuzzing").
"""

import os

import numpy as np
import pytest

from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import mv_vote
from mvtrim_tpu.ops.cluster import make_cluster_op_xla, pad_votes
from mvtrim_tpu.ops.sweep import make_vote_sweep_op

FUZZ_N = int(os.environ.get("MVT_FUZZ_N", "6"))


def random_geometry(rng):
    gw = int(rng.integers(4, 64))
    gh = int(rng.integers(4, 48))
    margin = int(rng.integers(0, max(1, gh // 3)))
    return GridGeometry(width=gw * 16, height=gh * 16, gw=gw, gh=gh,
                        y_min=margin, y_max=gh - margin)


def random_mvs(rng, n, geom):
    dst = np.stack([
        rng.integers(-40, geom.width + 40, n),
        rng.integers(-40, geom.height + 40, n),
    ], axis=1)
    disp = rng.integers(-12, 13, size=(n, 2))
    return np.concatenate([dst, dst - disp], axis=1).astype(np.int64)


class TestFuzz:
    def test_cluster_kernel_random_configs(self, rng):
        for trial in range(10):
            geom = random_geometry(rng)
            vec = int(rng.integers(0, 7))
            clust = int(rng.integers(0, 5))
            grids = rng.integers(
                0, 8, size=(6, geom.gh, geom.gw)).astype(np.uint8)
            op = make_cluster_op_xla(geom, vec, clust)
            counts, motion = op(pad_votes(grids, geom))
            for i, g in enumerate(grids):
                expect = oracle.count_clusters(
                    g, vectors_needed=vec, y_min=geom.y_min,
                    y_max=geom.y_max)
                assert int(counts[i]) == expect, (trial, i, geom, vec)
                assert bool(motion[i]) == (
                    expect >= oracle.effective_clusters_needed(clust))

    def test_fused_mv_kernel_random_configs(self, rng):
        for trial in range(8):
            geom = random_geometry(rng)
            vec = int(rng.integers(0, 5))
            clust = int(rng.integers(1, 4))
            threshold = float(rng.choice([0.0, 1.0, 4.5, 16.0, 16.5, 100.0]))
            m = 128
            mv_list = [random_mvs(rng, int(rng.integers(0, m)), geom)
                       for _ in range(4)]
            dx_, dy_, sx_, sy_, counts, overflow = mv_vote.pad_mvs(
                mv_list, m)
            assert not overflow.any()
            op = mv_vote.make_mv_cluster_op_xla(
                geom, threshold_sq=threshold, block_shift=4,
                vectors_needed=vec, clusters_needed=clust)
            _, motion = op(dx_, dy_, sx_, sy_, counts)
            for i, mvs in enumerate(mv_list):
                expect = oracle.check_frame(
                    mvs, geom.gw, geom.gh, threshold_sq=threshold,
                    block_shift=4, y_min=geom.y_min, y_max=geom.y_max,
                    vectors_needed=vec, clusters_needed=clust)
                assert bool(motion[i]) == expect, \
                    (trial, i, geom, vec, clust, threshold)

    def test_vote_sweep_random_configs(self, rng):
        geom = random_geometry(rng)
        grids = rng.integers(
            0, 8, size=(8, geom.gh, geom.gw)).astype(np.uint8)
        k = 6
        vecs = rng.integers(0, 7, k).astype(np.int32)
        clusts = rng.integers(0, 5, k).astype(np.int32)
        padded = np.asarray(pad_votes(grids, geom))
        motion = np.asarray(make_vote_sweep_op(geom)(padded, vecs, clusts))
        for ki in range(k):
            for i, g in enumerate(grids):
                expect = oracle.count_clusters(
                    g, vectors_needed=int(vecs[ki]), y_min=geom.y_min,
                    y_max=geom.y_max)
                assert bool(motion[i, ki]) == (
                    expect >= oracle.effective_clusters_needed(
                        int(clusts[ki])))

    @pytest.mark.parametrize("seed", range(max(4, FUZZ_N)))
    def test_sad_threshold_sweep_vs_oracle(self, seed):
        """Random SAD thresholds / cluster counts / block sizes through
        the SAD device op vs the NumPy oracle — the pixel-domain path
        has no C++ reference, so the oracle IS its semantics contract."""
        from mvtrim_tpu.models.sad_detector import sad_oracle_counts
        from mvtrim_tpu.ops import sad as sad_ops

        rng = np.random.default_rng(3000 + seed)
        block = int(rng.choice([8, 16]))
        gw = int(rng.integers(6, 24))
        gh = int(rng.integers(6, 20))
        margin = int(rng.integers(0, 3))
        geom = GridGeometry(width=gw * block, height=gh * block,
                            gw=gw, gh=gh, y_min=margin, y_max=gh - margin)
        thr = float(rng.choice([0.5, 2.0, 7.3, 12.0, 30.0, 200.0]))
        clust = int(rng.integers(0, 4))
        n = int(rng.integers(2, 9))
        h = geom.padded_gh * block
        w = geom.padded_gw * block
        luma = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
        # correlated frames so some diffs land near the threshold
        for i in range(1, n):
            if rng.random() < 0.5:
                luma[i] = np.clip(
                    luma[i - 1].astype(np.int16)
                    + rng.integers(-int(thr) - 2, int(thr) + 3,
                                   size=(h, w)), 0, 255).astype(np.uint8)
        op = sad_ops.make_sad_op_xla(
            geom, sad_threshold=thr, block_size=block,
            clusters_needed=clust)
        counts, motion = op(luma)
        expect = sad_oracle_counts(luma, geom, sad_threshold=thr,
                                   block_size=block)
        np.testing.assert_array_equal(np.asarray(counts), expect,
                                      err_msg=str((seed, geom, thr)))
        np.testing.assert_array_equal(
            np.asarray(motion),
            expect >= oracle.effective_clusters_needed(clust))

    def test_segmentation_random(self, rng):
        for _ in range(30):
            n = int(rng.integers(0, 40))
            ts = np.sort(rng.uniform(0, 200, n))
            ts = np.unique(np.round(ts, 3))
            max_gap = float(rng.uniform(0.5, 20))
            pad = float(rng.uniform(0, 3))
            duration = float(rng.uniform(100, 250))
            segs = oracle.segments_from_timestamps(
                ts, max_gap_sec=max_gap, padding_sec=pad, duration=duration)
            # structural invariants
            assert all(0.0 <= s.start <= s.end <= duration for s in segs)
            for a, b in zip(segs, segs[1:]):
                assert a.end - pad <= b.start + pad + 1e-9
            removed, pct = oracle.savings(segs, duration)
            assert -1e-9 <= pct <= 100.0 + 1e-9 or n == 0


class TestTuneRouteFuzz:
    """Differential fuzz of the two tune scan routes: the grids payload
    (host scatter + has_mv masking) and the mv_raw payload (on-device
    thresholding + count guard) must produce identical stats tables at
    random knob draws — including the uint8-wrapping vector values and
    the VECTORS_NEEDED=0 MV-less-frame rule both routes implement by
    different mechanisms."""

    @pytest.mark.parametrize("seed", range(max(3, FUZZ_N // 2)))
    def test_grids_and_mv_raw_agree(self, seed, tmp_path):
        from mvtrim_tpu.core.config import Config
        from mvtrim_tpu.io import native
        from mvtrim_tpu.tools import tune

        rng2 = np.random.default_rng(7000 + seed)
        clip = str(tmp_path / f"t{seed}.mp4")
        wins, t0 = [], 0.5
        for _ in range(int(rng2.integers(1, 3))):
            a = t0 + float(rng2.uniform(0, 1.5))
            b = a + float(rng2.uniform(0.3, 1.5))
            wins.append((a, min(b, 5.6)))
            t0 = b + 0.4
        native.synthesize(clip, width=256, height=192, fps=25.0,
                          duration=6.0, codec="libx264",
                          motion_windows=tuple(wins))
        thresholds = sorted(
            float(x) for x in rng2.choice(
                [0.0, 1.0, 4.0, 16.5, 64.0], size=2, replace=False))
        vectors = [int(v) for v in rng2.choice(
            [0, 1, 2, 3, 255, 256, -1], size=2, replace=False)]
        clusters = [int(c) for c in rng2.choice(
            [0, 1, 2, 4], size=2, replace=False)]
        cfg = Config(chunk_duration_sec=float(rng2.choice([1.7, 5.0])),
                     target_fps=int(rng2.choice([0, 7])))
        kw = dict(cfg=cfg, batch_frames=int(rng2.choice([16, 64])))
        a = tune.sweep(clip, thresholds, vectors, clusters, **kw)
        b = tune.sweep(clip, thresholds, vectors, clusters,
                       scan_input="mv_raw", **kw)
        assert a == b, (seed, thresholds, vectors, clusters)
        # third leg: the lazy device-stats route must agree on the
        # integer stats (timestamps are f32 on device, so saved_pct can
        # differ in the last decimals — compare the exact fields)
        d = tune.sweep(clip, thresholds, vectors, clusters,
                       device_stats=True, **kw)
        for ra, rd in zip(a, d):
            assert rd["motion_frames"] == ra["motion_frames"], (ra, rd)
            assert rd["segments"] == ra["segments"], (ra, rd)

    @pytest.mark.parametrize("seed", range(max(3, FUZZ_N // 2)))
    def test_sad_sweep_matches_detector_runs(self, seed, tmp_path):
        """tune --scan-input sad (one luma decode, K configs) vs K
        independent SADDetector pipeline runs at random knob draws —
        random chunking, frame-skip phase, tiny chunk-frame caps (the
        carry-threading resume path), and thresholds spanning the noise
        floor through well past the motion band."""
        from test_sweep import sad_reference_rows

        from mvtrim_tpu.core.config import Config
        from mvtrim_tpu.io import native
        from mvtrim_tpu.tools import tune

        rng2 = np.random.default_rng(9000 + seed)
        clip = str(tmp_path / f"s{seed}.mp4")
        wins, t0 = [], 0.5
        for _ in range(int(rng2.integers(1, 3))):
            a = t0 + float(rng2.uniform(0, 1.5))
            b = a + float(rng2.uniform(0.3, 1.5))
            wins.append((a, min(b, 5.6)))
            t0 = b + 0.4
        native.synthesize(clip, width=256, height=192, fps=25.0,
                          duration=6.0, codec="libx264",
                          motion_windows=tuple(wins),
                          noise=int(rng2.integers(0, 4)))
        thresholds = sorted(
            float(x) for x in rng2.choice(
                [0.0, 0.5, 2.0, 12.0, 60.0, 200.0], size=2,
                replace=False))
        clusters = [int(c) for c in rng2.choice(
            [0, 1, 2, 4], size=2, replace=False)]
        cfg = Config(chunk_duration_sec=float(rng2.choice([1.7, 5.0])),
                     target_fps=int(rng2.choice([0, 7])),
                     chunk_frames_cap=int(rng2.choice([0, 13])))
        kw = dict(cfg=cfg, batch_frames=int(rng2.choice([16, 64])))
        got = tune.sweep_sad(clip, thresholds, clusters, **kw)
        want = sad_reference_rows(clip, thresholds, clusters, cfg)
        assert got == want, (seed, thresholds, clusters)
        # device-stats leg: integer stats must agree (f32 timestamps)
        d = tune.sweep_sad(clip, thresholds, clusters,
                           device_stats=True, **kw)
        for rg, rd in zip(got, d):
            assert rd["motion_frames"] == rg["motion_frames"], (rg, rd)
            assert rd["segments"] == rg["segments"], (rg, rd)
