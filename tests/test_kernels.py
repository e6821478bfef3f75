"""Device-kernel vs oracle parity (SURVEY.md §4 item 2).

Random vote grids and random MV sets are pushed through the XLA and Pallas
(interpret-mode) kernels and must reproduce the NumPy oracle's cluster
counts and motion decisions exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import cluster as cluster_ops
from mvtrim_tpu.ops import mv_vote

CFG = Config()
GEOM = GridGeometry.build(640, 480, CFG)  # gw=40, gh=30, margin=1


def oracle_counts(grids, geom, vectors_needed):
    return np.array([
        oracle.count_clusters(g, vectors_needed=vectors_needed,
                              y_min=geom.y_min, y_max=geom.y_max)
        for g in grids
    ], dtype=np.int32)


def random_grids(rng, b, geom, density=0.1, max_votes=6):
    grids = np.zeros((b, geom.gh, geom.gw), np.uint8)
    mask = rng.random((b, geom.gh, geom.gw)) < density
    votes = rng.integers(0, max_votes, size=(b, geom.gh, geom.gw))
    # votes may land anywhere in the allocated grid rows inside the mask
    # window only (vote_grid can't produce them elsewhere), but the cluster
    # phase must tolerate arbitrary grid contents — test with full-range.
    grids[mask] = votes[mask]
    return grids


class TestClusterKernels:
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_random_parity(self, rng, backend):
        grids = random_grids(rng, 64, GEOM)
        counts, motion = cluster_ops.cluster_counts(
            grids, GEOM, vectors_needed=2, clusters_needed=2,
            backend=backend, interpret=True)
        expect = oracle_counts(grids, GEOM, 2)
        np.testing.assert_array_equal(np.asarray(counts), expect)
        np.testing.assert_array_equal(np.asarray(motion), expect >= 2)

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_dense_grids(self, rng, backend):
        grids = random_grids(rng, 16, GEOM, density=0.9, max_votes=255)
        counts, _ = cluster_ops.cluster_counts(
            grids, GEOM, vectors_needed=3, clusters_needed=2,
            backend=backend, interpret=True)
        np.testing.assert_array_equal(np.asarray(counts),
                                      oracle_counts(grids, GEOM, 3))

    def test_1080p_geometry(self, rng):
        geom = GridGeometry.build(1920, 1080, CFG)
        assert (geom.gw, geom.gh, geom.y_min, geom.y_max) == (120, 68, 3, 65)
        grids = random_grids(rng, 8, geom, density=0.05)
        counts, _ = cluster_ops.cluster_counts(
            grids, geom, vectors_needed=2, clusters_needed=2, backend="xla")
        np.testing.assert_array_equal(np.asarray(counts),
                                      oracle_counts(grids, geom, 2))

    def test_empty_and_full(self):
        grids = np.zeros((4, GEOM.gh, GEOM.gw), np.uint8)
        grids[1] = 255
        counts, motion = cluster_ops.cluster_counts(
            grids, GEOM, vectors_needed=2, clusters_needed=2, backend="xla")
        assert counts[0] == 0 and not motion[0]
        assert counts[1] == oracle_counts(grids[1:2], GEOM, 2)[0]


def random_mvs(rng, n, spread=640):
    """Random MV rows (dst_x, dst_y, src_x, src_y) incl. negatives/OOB."""
    dst = rng.integers(-32, spread + 32, size=(n, 2))
    disp = rng.integers(-8, 9, size=(n, 2))
    src = dst - disp
    return np.concatenate([dst, src], axis=1).astype(np.int32)


class TestMVFusedKernels:
    @pytest.mark.parametrize("threshold_sq", [16.0, 16.5, 0.0, 4.0])
    def test_xla_parity(self, rng, threshold_sq):
        b, m = 12, 256
        mv_list = [random_mvs(rng, int(rng.integers(0, m))) for _ in range(b)]
        dx_, dy_, sx_, sy_, counts, overflow = mv_vote.pad_mvs(mv_list, m)
        assert not overflow.any()
        op = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=threshold_sq, block_shift=4,
            vectors_needed=2, clusters_needed=2)
        n, motion = op(dx_, dy_, sx_, sy_, counts)
        for i, mvs in enumerate(mv_list):
            grid = oracle.vote_grid(
                mvs, GEOM.gw, GEOM.gh, threshold_sq=threshold_sq,
                block_shift=4, y_min=GEOM.y_min, y_max=GEOM.y_max)
            expect = oracle.count_clusters(grid, vectors_needed=2,
                                           y_min=GEOM.y_min, y_max=GEOM.y_max)
            assert int(n[i]) == expect, f"frame {i}"
            assert bool(motion[i]) == (expect >= 2)

    def test_pallas_parity(self, rng):
        b, m = 8, 256
        mv_list = [random_mvs(rng, int(rng.integers(32, m))) for _ in range(b)]
        dx_, dy_, sx_, sy_, counts, _ = mv_vote.pad_mvs(mv_list, m)
        op = mv_vote.make_mv_cluster_op_pallas(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=2, clusters_needed=2, interpret=True)
        n, _ = op(dx_, dy_, sx_, sy_, counts)
        op_ref = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=2, clusters_needed=2)
        n_ref, _ = op_ref(dx_, dy_, sx_, sy_, counts)
        np.testing.assert_array_equal(np.asarray(n), np.asarray(n_ref))

    @pytest.mark.parametrize("fps_n", [1, 3, 8])
    def test_pallas_frames_per_step_parity(self, rng, fps_n):
        """Multi-frame steps (and the zero-count step padding when b is
        not a multiple of F) decide identically."""
        b, m = 8, 256
        mv_list = [random_mvs(rng, int(rng.integers(32, m)))
                   for _ in range(b)]
        dx_, dy_, sx_, sy_, counts, _ = mv_vote.pad_mvs(mv_list, m)
        op = mv_vote.make_mv_cluster_op_pallas(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=2, clusters_needed=2, interpret=True,
            frames_per_step=fps_n)
        assert op.frames_per_step == fps_n
        op_ref = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=2, clusters_needed=2)
        n, mo = op(dx_, dy_, sx_, sy_, counts)
        nr, mr = op_ref(dx_, dy_, sx_, sy_, counts)
        np.testing.assert_array_equal(np.asarray(n), np.asarray(nr))
        np.testing.assert_array_equal(np.asarray(mo), np.asarray(mr))

    def test_padding_ignored(self, rng):
        # padded zero MVs have mag 0: dropped when threshold > 0, and when
        # threshold == 0 they must still be masked by the count
        mvs = random_mvs(rng, 100)
        dx_, dy_, sx_, sy_, counts, _ = mv_vote.pad_mvs([mvs], 256)
        op = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=0.0, block_shift=4,
            vectors_needed=1, clusters_needed=1)
        n, _ = op(dx_, dy_, sx_, sy_, counts)
        grid = oracle.vote_grid(mvs, GEOM.gw, GEOM.gh, threshold_sq=0.0,
                                block_shift=4, y_min=GEOM.y_min,
                                y_max=GEOM.y_max)
        assert int(n[0]) == oracle.count_clusters(
            grid, vectors_needed=1, y_min=GEOM.y_min, y_max=GEOM.y_max)

    def test_threshold_bound(self):
        assert mv_vote.threshold_bound(16.0) == 16
        assert mv_vote.threshold_bound(16.5) == 17
        assert mv_vote.threshold_bound(0.0) == 0
        assert mv_vote.threshold_bound(-3.0) == -3


class TestMVFramesPerStep:
    def test_vmem_clamp_anchors(self):
        """The VMEM-aware frames-per-step formula: F=16 at the default
        M=2048 (the audited knee), clamped at large M where the 8x-
        sublane-padded [1, M] stream blocks would blow the kernel's
        64MB limit (F=16 x M=16384 alone equals the whole limit)."""
        assert mv_vote.mv_frames_per_step(2048) == 16
        assert mv_vote.mv_frames_per_step(16384) == 12
        assert mv_vote.mv_frames_per_step(16384, requested=1) == 1
        assert mv_vote.mv_frames_per_step(1 << 22) == 1  # never 0


class TestMVFoldKeep:
    def test_fold_keep_bit_identical(self, rng):
        """_mv_frame_votes(fold_keep=True) — the keep mask folded into
        the row index as a [1, M] select-to--1 instead of an AND across
        the [GH_p, M] one-hot (mv_bench ``prodfold``) — is bit-identical
        across random MV sets incl. OOB rows and count-masked tails."""
        m = 256
        for _ in range(6):
            dst_x = jnp.asarray(
                rng.integers(-64, 704, (1, m)).astype(np.int32))
            dst_y = jnp.asarray(
                rng.integers(-64, 544, (1, m)).astype(np.int32))
            src_x = dst_x - jnp.asarray(
                rng.integers(-9, 10, (1, m)).astype(np.int32))
            src_y = dst_y - jnp.asarray(
                rng.integers(-9, 10, (1, m)).astype(np.int32))
            count = jnp.int32(int(rng.integers(0, m + 1)))
            kw = dict(geom=GEOM, bound=17, block_shift=CFG.block_shift)
            v0 = mv_vote._mv_frame_votes(dst_x, dst_y, src_x, src_y,
                                         count, **kw)
            v1 = mv_vote._mv_frame_votes(dst_x, dst_y, src_x, src_y,
                                         count, fold_keep=True, **kw)
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


class TestMVChunkedPath:
    def test_chunked_and_padded_capacity(self, rng):
        """M > m_chunk exercises the fori_loop accumulation; a non-divisible
        M exercises the padding path. Both must match the XLA op."""
        b, m = 4, 3000  # pads to 4096 = 2 chunks of 2048
        mv_list = [random_mvs(rng, int(rng.integers(m - 100, m)))
                   for _ in range(b)]
        dx_, dy_, sx_, sy_, counts, overflow = mv_vote.pad_mvs(mv_list, m)
        assert not overflow.any()
        op = mv_vote.make_mv_cluster_op_pallas(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=1, clusters_needed=1, interpret=True)
        ref = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=1, clusters_needed=1)
        n, _ = op(dx_, dy_, sx_, sy_, counts)
        nr, _ = ref(dx_, dy_, sx_, sy_, counts)
        np.testing.assert_array_equal(np.asarray(n), np.asarray(nr))
        # tail MVs (indices past the last full chunk boundary) must count:
        # craft a frame whose ONLY motion lives in the tail
        tail = np.zeros((1, m, 4), np.int64)
        tail[0, 2900:2910] = random_mvs(rng, 10, spread=400)
        dx2, dy2, sx2, sy2, c2, _ = mv_vote.pad_mvs([tail[0][2900:2910]], 8)
        # rebuild at full m with the tail occupied
        mvs_full = [np.concatenate([np.tile([[0, 0, 0, 0]], (2900, 1)),
                                    tail[0][2900:2910]])]
        dx3, dy3, sx3, sy3, c3, _ = mv_vote.pad_mvs(mvs_full, m)
        n3, _ = op(dx3, dy3, sx3, sy3, c3)
        nr3, _ = ref(dx3, dy3, sx3, sy3, c3)
        assert int(n3[0]) == int(nr3[0])

    @pytest.mark.parametrize("dynamic", [True, False])
    def test_sparse_counts_dynamic_chunk_skip(self, rng, dynamic):
        """dynamic_chunks bounds the chunk fori_loop by each frame's MV
        count; frames whose counts land mid-chunk, at a chunk boundary,
        at zero, and at full capacity must all decide exactly like the
        dense XLA op (and like dynamic_chunks=False)."""
        m, m_chunk = 1024, 256
        counts_wanted = [0, 1, 255, 256, 257, 512, 700, 1024]
        mv_list = [random_mvs(rng, c) for c in counts_wanted]
        dx_, dy_, sx_, sy_, counts, _ = mv_vote.pad_mvs(mv_list, m)
        np.testing.assert_array_equal(counts, counts_wanted)
        op = mv_vote.make_mv_cluster_op_pallas(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=1, clusters_needed=1, interpret=True,
            m_chunk=m_chunk, dynamic_chunks=dynamic)
        ref = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=1, clusters_needed=1)
        n, mo = op(dx_, dy_, sx_, sy_, counts)
        nr, mr = ref(dx_, dy_, sx_, sy_, counts)
        np.testing.assert_array_equal(np.asarray(n), np.asarray(nr))
        np.testing.assert_array_equal(np.asarray(mo), np.asarray(mr))

    @pytest.mark.parametrize("fps_n", [1, 3, 4])
    def test_ragged_chunk_grid_parity(self, rng, fps_n):
        """ragged_chunks moves the chunk loop into the grid with a
        count-clamped block index map (DMA skipped for all-padding
        chunks).  Counts at zero, mid-chunk, chunk boundaries, and full
        capacity — across 1/3/4-frame steps (incl. the zero-count step
        padding) — must decide exactly like the dense XLA op."""
        m, m_chunk = 1024, 256
        counts_wanted = [0, 1, 255, 256, 257, 512, 700, 1024]
        mv_list = [random_mvs(rng, c) for c in counts_wanted]
        dx_, dy_, sx_, sy_, counts, _ = mv_vote.pad_mvs(mv_list, m)
        op = mv_vote.make_mv_cluster_op_pallas(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=1, clusters_needed=1, interpret=True,
            m_chunk=m_chunk, ragged_chunks=True, frames_per_step=fps_n)
        ref = mv_vote.make_mv_cluster_op_xla(
            GEOM, threshold_sq=16.0, block_shift=4,
            vectors_needed=1, clusters_needed=1)
        n, mo = op(dx_, dy_, sx_, sy_, counts)
        nr, mr = ref(dx_, dy_, sx_, sy_, counts)
        np.testing.assert_array_equal(np.asarray(n), np.asarray(nr))
        np.testing.assert_array_equal(np.asarray(mo), np.asarray(mr))

    def test_ragged_chunk_grid_unaligned_m(self, rng):
        """ragged_chunks with m not a multiple of m_chunk (the chunk-pad
        path) and m <= m_chunk (ragged inert) both stay exact."""
        for m in (300, 200):
            m_chunk = 256
            mv_list = [random_mvs(rng, int(rng.integers(0, m + 1)))
                       for _ in range(5)]
            dx_, dy_, sx_, sy_, counts, _ = mv_vote.pad_mvs(mv_list, m)
            op = mv_vote.make_mv_cluster_op_pallas(
                GEOM, threshold_sq=16.0, block_shift=4,
                vectors_needed=1, clusters_needed=1, interpret=True,
                m_chunk=m_chunk, ragged_chunks=True, frames_per_step=2)
            ref = mv_vote.make_mv_cluster_op_xla(
                GEOM, threshold_sq=16.0, block_shift=4,
                vectors_needed=1, clusters_needed=1)
            n, mo = op(dx_, dy_, sx_, sy_, counts)
            nr, mr = ref(dx_, dy_, sx_, sy_, counts)
            np.testing.assert_array_equal(np.asarray(n), np.asarray(nr))
            np.testing.assert_array_equal(np.asarray(mo), np.asarray(mr))


class TestPackedClusterOps:
    """Packed-domain cluster math (bitwise neighbors + SWAR popcount on
    the mvt_scan_bits layout) vs the oracle and the unpack op."""

    @pytest.mark.parametrize("dims", [(1920, 1080), (360, 240), (256, 192)])
    def test_packed_xla_matches_oracle(self, rng, dims):
        from mvtrim_tpu.core.config import Config
        from mvtrim_tpu.core import oracle as orc

        cfg = Config()
        geom = GridGeometry.build(dims[0], dims[1], cfg)
        grids = rng.integers(0, 5, size=(48, geom.gh, geom.gw),
                             dtype=np.uint8)
        active = (grids >= cfg.vectors_needed)
        packed = np.packbits(active, axis=2, bitorder="little")
        gwb, used, lanes = cluster_ops.packed_geometry(geom)
        flat = np.zeros((48, lanes), np.uint8)
        flat[:, :used] = packed.reshape(48, used)

        op = cluster_ops.make_cluster_bits_packed_op_xla(
            geom, cfg.clusters_needed)
        counts, motion = op(jnp.asarray(flat))
        expect = orc.count_clusters_batch(
            active.astype(np.uint8), vectors_needed=1,
            y_min=geom.y_min, y_max=geom.y_max)
        np.testing.assert_array_equal(np.asarray(counts), expect)
        need = orc.effective_clusters_needed(cfg.clusters_needed)
        np.testing.assert_array_equal(np.asarray(motion), expect >= need)

    def test_packed_matches_unpack_op_margin0(self, rng):
        """vertical_mask=0 (margin-0): the zero-fill row-neighbor
        semantics must match the unpacked op's definition exactly."""
        from mvtrim_tpu.core.config import Config

        cfg = Config(vertical_mask=0.0)
        geom = GridGeometry.build(360, 240, cfg)
        grids = rng.integers(0, 4, size=(32, geom.gh, geom.gw),
                             dtype=np.uint8)
        active = grids >= cfg.vectors_needed
        packed = np.packbits(active, axis=2, bitorder="little")
        gwb, used, lanes = cluster_ops.packed_geometry(geom)
        flat = np.zeros((32, lanes), np.uint8)
        flat[:, :used] = packed.reshape(32, used)

        unpack_op = cluster_ops.make_cluster_bits_op_xla(
            geom, cfg.clusters_needed)
        packed_op = cluster_ops.make_cluster_bits_packed_op_xla(
            geom, cfg.clusters_needed)
        c1, m1 = unpack_op(jnp.asarray(packed))
        c2, m2 = packed_op(jnp.asarray(flat))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


class TestWordClusterOps:
    """Word-domain cluster math (32 cells per int32 lane; the flagship
    kernel) vs the oracle, incl. margin-0 and non-32-aligned widths."""

    @pytest.mark.parametrize("dims,vm", [
        ((1920, 1080), 0.05),   # gw=120: not a multiple of 32
        ((3840, 2160), 0.05),   # 4K
        ((360, 240), 0.0),      # margin-0 zero-fill rows
        ((200, 144), 0.05),     # tiny, gw=13 < one word
    ])
    def test_words_xla_matches_oracle(self, rng, dims, vm):
        from mvtrim_tpu.core import oracle as orc

        cfg = Config(vertical_mask=vm)
        geom = GridGeometry.build(dims[0], dims[1], cfg)
        grids = rng.integers(0, 5, size=(40, geom.gh, geom.gw),
                             dtype=np.uint8)
        active = grids >= cfg.vectors_needed
        bits = np.packbits(active, axis=2, bitorder="little")
        gww, used, lanes = cluster_ops.word_geometry(geom)
        words = np.zeros((40, lanes), np.int32)
        words[:, :used] = cluster_ops.repack_bits_words(bits, geom)

        op = cluster_ops.make_cluster_words_op_xla(
            geom, cfg.clusters_needed)
        counts, motion = op(jnp.asarray(words))
        expect = orc.count_clusters_batch(
            active.astype(np.uint8), vectors_needed=1,
            y_min=geom.y_min, y_max=geom.y_max)
        np.testing.assert_array_equal(np.asarray(counts), expect)
        need = orc.effective_clusters_needed(cfg.clusters_needed)
        np.testing.assert_array_equal(np.asarray(motion), expect >= need)

    @pytest.mark.parametrize("dims,vm", [
        ((1920, 1080), 0.05),   # gw=120: not a multiple of 32; slim masks
        ((3840, 2160), 0.05),   # 4K: lanes=1152
        ((360, 240), 0.0),      # margin-0 zero-fill rows
        ((200, 144), 0.05),     # tiny, gw=13 < one word
    ])
    def test_words_transposed_matches_oracle(self, rng, dims, vm):
        """The transposed pallas kernel (words on sublanes, frames on
        lanes, MXU popcount reduction) is bit-identical to the oracle
        and the lane-major op."""
        from mvtrim_tpu.core import oracle as orc

        cfg = Config(vertical_mask=vm)
        geom = GridGeometry.build(dims[0], dims[1], cfg)
        grids = rng.integers(0, 5, size=(40, geom.gh, geom.gw),
                             dtype=np.uint8)
        active = grids >= cfg.vectors_needed
        bits = np.packbits(active, axis=2, bitorder="little")
        gww, used, lanes = cluster_ops.word_geometry(geom)
        words = np.zeros((40, lanes), np.int32)
        words[:, :used] = cluster_ops.repack_bits_words(bits, geom)

        op_t = cluster_ops.make_cluster_words_op_pallas_T(
            geom, cfg.clusters_needed, block_b=40, interpret=True)
        ct, mt = op_t(jnp.asarray(np.ascontiguousarray(words.T)))
        expect = orc.count_clusters_batch(
            active.astype(np.uint8), vectors_needed=1,
            y_min=geom.y_min, y_max=geom.y_max)
        np.testing.assert_array_equal(np.asarray(ct), expect)
        need = orc.effective_clusters_needed(cfg.clusters_needed)
        np.testing.assert_array_equal(np.asarray(mt), expect >= need)

    def test_words_transposed_no_padding_headroom(self, rng):
        """A geometry where used == lanes (no zero-padding lanes): the
        transposed op must keep the up/down edge masks — the wrap
        sources real words there — and still match the oracle."""
        from mvtrim_tpu.core import oracle as orc

        cfg = Config(vertical_mask=0.0)
        geom = GridGeometry.build(512, 2048, cfg)  # gww=1, gh=128
        gww, used, lanes = cluster_ops.word_geometry(geom)
        assert lanes - used < gww  # the case under test
        grids = rng.integers(0, 5, size=(16, geom.gh, geom.gw),
                             dtype=np.uint8)
        active = grids >= cfg.vectors_needed
        bits = np.packbits(active, axis=2, bitorder="little")
        words = np.zeros((16, lanes), np.int32)
        words[:, :used] = cluster_ops.repack_bits_words(bits, geom)

        op_t = cluster_ops.make_cluster_words_op_pallas_T(
            geom, cfg.clusters_needed, block_b=16, interpret=True)
        ct, _ = op_t(jnp.asarray(np.ascontiguousarray(words.T)))
        expect = orc.count_clusters_batch(
            active.astype(np.uint8), vectors_needed=1,
            y_min=geom.y_min, y_max=geom.y_max)
        np.testing.assert_array_equal(np.asarray(ct), expect)

    def test_words_match_byte_domain(self, rng):
        """Word and byte packed domains agree bit-for-bit (same frames,
        both layouts)."""
        cfg = Config()
        geom = GridGeometry.build(360, 240, cfg)
        grids = rng.integers(0, 4, size=(24, geom.gh, geom.gw),
                             dtype=np.uint8)
        bits = np.packbits(grids >= cfg.vectors_needed, axis=2,
                           bitorder="little")
        _, usedb, lanesb = cluster_ops.packed_geometry(geom)
        flatb = np.zeros((24, lanesb), np.uint8)
        flatb[:, :usedb] = bits.reshape(24, usedb)
        _, usedw, lanesw = cluster_ops.word_geometry(geom)
        flatw = np.zeros((24, lanesw), np.int32)
        flatw[:, :usedw] = cluster_ops.repack_bits_words(bits, geom)

        cb, mb = cluster_ops.make_cluster_bits_packed_op_xla(
            geom, cfg.clusters_needed)(jnp.asarray(flatb))
        cw, mw = cluster_ops.make_cluster_words_op_xla(
            geom, cfg.clusters_needed)(jnp.asarray(flatw))
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(cw))
        np.testing.assert_array_equal(np.asarray(mb), np.asarray(mw))
