"""SAD fallback path: kernel parity, detector behavior, pipeline
auto-fallback on intra-only (MV-less) streams — BASELINE config 2."""

import os

import numpy as np
import pytest

from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.io import native
from mvtrim_tpu.models.sad_detector import SADDetector, sad_oracle_counts
from mvtrim_tpu.ops import sad as sad_ops
from mvtrim_tpu.pipeline.pipeline import ProcessingPipeline

CFG = Config()
GEOM = GridGeometry.build(320, 240, CFG)  # gw=20, gh=15


@pytest.fixture(scope="session")
def intra_clip(tmp_path_factory):
    """All-I-frame clip (gop=1): decodes fine, exports zero MVs."""
    path = str(tmp_path_factory.mktemp("sad") / "intra.mp4")
    native.synthesize(path, width=320, height=240, fps=25.0, duration=10.0,
                      codec="libx264", motion_windows=((2.0, 4.0),), gop=1)
    return path


class TestSADKernels:
    def random_luma(self, rng, n=6):
        h = GEOM.padded_gh * CFG.block_size
        w = GEOM.padded_gw * CFG.block_size
        luma = np.zeros((n, h, w), np.uint8)
        base = rng.integers(0, 200, size=(h, w), dtype=np.uint8)
        luma[:] = base
        # add moving square on some frames
        for i in range(1, n, 2):
            luma[i, 50:100, 30 + i * 10:80 + i * 10] = 255
        return luma

    def test_xla_matches_oracle(self, rng):
        luma = self.random_luma(rng)
        op = sad_ops.make_sad_op_xla(
            GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed)
        counts, motion = op(luma)
        # oracle computes over the unpadded region; our luma is padded and
        # oracle's geom-based loop only reads geom.gh/gw blocks
        expect = sad_oracle_counts(
            luma, GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size)
        np.testing.assert_array_equal(np.asarray(counts), expect)
        np.testing.assert_array_equal(
            np.asarray(motion), expect >= max(1, CFG.clusters_needed))

    def test_pallas_matches_xla(self, rng):
        luma = self.random_luma(rng)
        op_x = sad_ops.make_sad_op_xla(
            GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed)
        op_p = sad_ops.make_sad_op_pallas(
            GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed,
            height=240, width=320, interpret=True)
        cx, _ = op_x(luma)
        cp, _ = op_p(luma)
        np.testing.assert_array_equal(np.asarray(cx), np.asarray(cp))

    def test_sliced_kernel_matches_oracle(self, rng):
        """make_sad_kernel_sliced (the lane-axis sub-frame-blocked 4K
        variant): per-slice _sad_grid columns assemble to the full-frame
        grid and the once-per-frame cluster decision is oracle-exact.
        Uses a 4K-width geometry (padded_gw=256) — the 128*S lane
        alignment the kernel requires."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S = 2
        geom = GridGeometry.build(3840, 96, CFG)   # gw=240->256, gh=6->8
        bs = CFG.block_size
        gh_p, gw_p = geom.padded_gh, geom.padded_gw
        h_p, w_p = gh_p * bs, gw_p * bs
        w_s = w_p // S
        n = 7
        luma = np.zeros((n, h_p, w_p), np.uint8)
        luma[:] = rng.integers(0, 200, size=(h_p, w_p), dtype=np.uint8)
        for i in range(1, n, 2):                   # motion crossing the
            luma[i, 20:80, w_s - 200:w_s + 200] = 255  # slice boundary
        bound = sad_ops.sad_threshold_sum(CFG.sad_threshold, bs)
        nb = n - 1
        kernel = sad_ops.make_sad_kernel_sliced(geom, bs, bound, S)
        counts = pl.pallas_call(
            kernel,
            grid=(nb, S),
            in_specs=[pl.BlockSpec((1, h_p, w_p), lambda j, s: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, h_p, w_s), lambda j, s: (j, 0, s),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1), lambda j, s: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 1, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((h_p, w_p), jnp.uint8),
                            pltpu.VMEM((gh_p, gw_p), jnp.int32)],
            interpret=True,
        )(luma[:1], luma[1:])
        expect = sad_oracle_counts(luma, geom,
                                   sad_threshold=CFG.sad_threshold,
                                   block_size=bs)
        np.testing.assert_array_equal(np.asarray(counts)[:, 0, 0], expect)

    def test_sliced_product_op_auto_selects_and_matches_xla(self, rng):
        """make_sad_op_pallas flips to the sliced kernel when F=1 and
        the geometry is 256-lane-aligned (the 4K shape); decisions must
        match the XLA op bit for bit."""
        geom = GridGeometry.build(3840, 96, CFG)
        kw = dict(sad_threshold=CFG.sad_threshold,
                  block_size=CFG.block_size,
                  clusters_needed=CFG.clusters_needed)
        op_p = sad_ops.make_sad_op_pallas(
            geom, height=96, width=3840, interpret=True,
            frames_per_step=1, **kw)   # F=1 forces the S=2 auto-select
        assert op_p.slices_per_frame == 2
        assert op_p.frames_per_step == 1
        op_x = sad_ops.make_sad_op_xla(geom, **kw)
        h_p = geom.padded_gh * CFG.block_size
        w_p = geom.padded_gw * CFG.block_size
        luma = rng.integers(0, 256, size=(9, h_p, w_p), dtype=np.uint8)
        cx, mx = op_x(luma)
        cp, mp = op_p(luma)
        np.testing.assert_array_equal(np.asarray(cx), np.asarray(cp))
        np.testing.assert_array_equal(np.asarray(mx), np.asarray(mp))
        # 1080p (gw_p=128) and multi-frame steps keep the unsliced kernel
        op_1080 = sad_ops.make_sad_op_pallas(
            GEOM, height=240, width=320, interpret=True,
            frames_per_step=1, **kw)
        assert op_1080.slices_per_frame == 1

    def test_sliced_kernel_rejects_unaligned_slicing(self):
        """Lane-store offsets must be 128-aligned: the builder refuses
        geometries/S where GW_p/S is not a multiple of 128 (Mosaic would
        fail to lower — caught on hardware, round 4)."""
        bound = sad_ops.sad_threshold_sum(CFG.sad_threshold,
                                          CFG.block_size)
        with pytest.raises(ValueError, match="128"):
            sad_ops.make_sad_kernel_sliced(GEOM, CFG.block_size, bound, 2)

    @pytest.mark.parametrize(
        "col_mode", ["hilo", "highest", "dcfirst", "vpurow"])
    def test_col_modes_match_oracle(self, rng, col_mode):
        """Every exact column-reduction mode of the per-frame SAD math
        (ops/sad.sad_step_counts — the body both the product kernel and
        the sad_bench shootout dispatch) is oracle-exact.  CPU/interpret
        compute true f32, so the bf16 *rounding* hazards these modes
        exist to avoid are only provable on hardware
        (test_tpu_smoke.py::test_sad_kernel_near_threshold_exact_on_device);
        this pins the reshape/split/matmul plumbing itself."""
        import jax.numpy as jnp

        luma = self.random_luma(rng, n=4)
        bound = sad_ops.sad_threshold_sum(CFG.sad_threshold, CFG.block_size)
        expect = sad_oracle_counts(
            luma, GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size)
        x = luma.astype(np.int32)
        for i, e in enumerate(expect):
            diff = jnp.abs(jnp.asarray(x[i + 1] - x[i]))
            got = int(sad_ops.sad_step_counts(
                diff, GEOM, CFG.block_size, bound, col_mode=col_mode))
            assert got == e, (col_mode, i, got, e)

    @pytest.mark.parametrize("fps_n", [1, 2, 3, 4])
    def test_pallas_frames_per_step_parity(self, rng, fps_n):
        """The multi-frame-step kernel is exact at every F, including
        step-boundary carries and the padded tail (b % F != 0)."""
        luma = self.random_luma(rng, n=8)  # b=7: pads for F in {2,3,4}
        op_x = sad_ops.make_sad_op_xla(
            GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed)
        op_p = sad_ops.make_sad_op_pallas(
            GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed,
            height=240, width=320, interpret=True, frames_per_step=fps_n)
        assert op_p.frames_per_step == fps_n
        cx, mx = op_x(luma)
        cp, mp = op_p(luma)
        np.testing.assert_array_equal(np.asarray(cx), np.asarray(cp))
        np.testing.assert_array_equal(np.asarray(mx), np.asarray(mp))

    def test_pallas_vmem_autoscale_4k(self):
        """4K frames (~8.9MB padded) halve frames_per_step to keep the
        double-buffered frames block within the VMEM budget."""
        geom4k = GridGeometry.build(3840, 2160, CFG)
        op = sad_ops.make_sad_op_pallas(
            geom4k, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed,
            height=2160, width=3840, interpret=True)
        assert op.frames_per_step == sad_ops.sad_frames_per_step(
            geom4k, CFG.block_size)
        assert op.frames_per_step < 4

    def test_static_frames_inactive(self):
        h = GEOM.padded_gh * CFG.block_size
        w = GEOM.padded_gw * CFG.block_size
        luma = np.full((4, h, w), 77, np.uint8)
        op = sad_ops.make_sad_op_xla(
            GEOM, sad_threshold=CFG.sad_threshold,
            block_size=CFG.block_size, clusters_needed=CFG.clusters_needed)
        counts, motion = op(luma)
        assert not np.asarray(motion).any()


class TestSADDetector:
    def _luma_seq(self, rng, n=12):
        """320x240 sequence: moving bright square on odd frames < 8
        (every consecutive pair differs -> motion), static tail (no
        motion)."""
        luma = np.zeros((n, 240, 320), np.uint8)
        base = rng.integers(0, 200, size=(240, 320), dtype=np.uint8)
        luma[:] = base
        for i in range(1, min(n, 8), 2):
            luma[i, 40:120, 20 + i * 12:120 + i * 12] = 255
        return luma

    def test_carry_matches_single_scan(self, rng):
        """Splitting a chunk anywhere and threading the boundary frame as
        ``carry`` reproduces single-scan decisions exactly — the frame
        cap must never change decisions (the pipeline cap-resume
        contract).  Without carry the first frame of the resumed part
        would be forced False."""
        luma = self._luma_seq(rng)
        n = len(luma)
        # device_batch=64 -> window of 8: resumed parts also re-window
        det = SADDetector(320, 240, Config(device_batch=64))
        full = det.scan_luma(luma)
        assert full[1:8].all() and not full[9:].any()  # both regimes
        for k in (1, 2, 5, 9, n - 1):
            head = det.scan_luma(luma[:k])
            tail = det.scan_luma(luma[k:], carry=luma[k - 1])
            got = np.concatenate([head, tail])
            np.testing.assert_array_equal(got, full,
                                          err_msg=f"split at {k}")

    def test_device_pin_same_decisions(self, rng):
        """Pinning the detector to an explicit device (multi-chip batch
        round-robin) changes placement only, never decisions."""
        import jax

        luma = self._luma_seq(rng, n=6)
        base = SADDetector(320, 240, CFG).scan_luma(luma)
        pinned = SADDetector(320, 240, CFG,
                             device=jax.devices()[-1]).scan_luma(luma)
        np.testing.assert_array_equal(pinned, base)

    def test_detects_moving_box(self, intra_clip):
        with native.VideoReader(intra_clip, native.MVT_MODE_LUMA) as r:
            luma, pts = r.scan_luma(0.0, r.duration, max_frames=300)
        det = SADDetector(320, 240, CFG)
        motion = det.scan_luma(luma)
        assert not motion[0]  # no predecessor
        hits = pts[motion]
        assert len(hits) > 10
        assert all(1.9 <= p <= 4.1 for p in hits), hits


class TestPipelineFallback:
    def test_intra_clip_has_no_mvs(self, intra_clip):
        with native.VideoReader(intra_clip) as r:
            timing = native.ScanTiming()
            r.scan_grids(0.0, r.duration, threshold_sq=16.0, block_shift=4,
                         gw=GEOM.gw, gh=GEOM.gh, y_min=GEOM.y_min,
                         y_max=GEOM.y_max, max_frames=300, timing=timing)
            assert timing.frames_with_mvs == 0

    def test_auto_fallback_trims(self, intra_clip, tmp_path):
        out = str(tmp_path / "sad_out.mp4")
        p = ProcessingPipeline(intra_clip, out, cfg=Config())
        assert p.run() == 0
        assert os.path.exists(out)
        # motion 2-4s of 10s -> ~3s kept with padding
        assert 50.0 < p.saved_pct < 80.0

    def test_forced_sad_mode(self, intra_clip, tmp_path):
        out = str(tmp_path / "sad_forced.mp4")
        p = ProcessingPipeline(intra_clip, out,
                               cfg=Config(pipeline_mode="sad"))
        assert p.run() == 0
        assert os.path.exists(out)

    def test_tiny_frame_cap_identical_cut(self, intra_clip, tmp_path):
        """MVT_CHUNK_FRAMES_CAP=8 forces ~30 cap-resumes through the
        SAD path, several inside the motion window.  The luma carry
        threading must keep the cut AND the per-frame motion count
        identical to the uncapped run (without it, each resumed
        sub-scan's first frame was silently decided False)."""
        import json

        def run(tag, **kw):
            out = str(tmp_path / f"{tag}.mp4")
            mj = str(tmp_path / f"{tag}.jsonl")
            p = ProcessingPipeline(intra_clip, out, cfg=Config(
                pipeline_mode="sad", metrics_json=mj, **kw))
            assert p.run() == 0
            rec = json.loads(open(mj).read().splitlines()[-1])
            return (p.time_removed, p.saved_pct,
                    rec["motion_frames"], rec["frames_scanned"])

        ref = run("uncapped")
        assert ref[2] > 0
        capped = run("capped", chunk_frames_cap=8)
        assert capped == ref

    def test_mv_mode_finds_nothing_on_intra(self, intra_clip, tmp_path):
        out = str(tmp_path / "mv_none.mp4")
        p = ProcessingPipeline(intra_clip, out,
                               cfg=Config(pipeline_mode="mv"))
        assert p.run() == 0  # "No motion found." — reference behavior
        assert not os.path.exists(out)
