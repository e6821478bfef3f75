"""Unit tests freezing the reference hot-loop semantics (SURVEY.md §4 item 1).

Each case pins one behavior of motion_scanner.cpp:242-293 or
pipeline.cpp:302-404 against hand-computed expectations.
"""

import numpy as np
import pytest

from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import TimeSegment

GW, GH = 8, 8
KW = dict(threshold_sq=16.0, block_shift=4, y_min=1, y_max=7)


def mv(dst_x, dst_y, dx, dy):
    """Build an MV row with displacement (dx,dy) landing at dst."""
    return [dst_x, dst_y, dst_x - dx, dst_y - dy]


class TestVoteGrid:
    def test_threshold_strict_less_skips(self):
        # mag_sq = 9+4=13 < 16 -> no vote; 16 >= 16 -> vote
        grid = oracle.vote_grid(np.array([mv(32, 32, 3, 2)]), GW, GH, **KW)
        assert grid.sum() == 0
        grid = oracle.vote_grid(np.array([mv(32, 32, 4, 0)]), GW, GH, **KW)
        assert grid[2, 2] == 1 and grid.sum() == 1

    def test_grid_mapping_shift(self):
        # dst (47, 16) -> gx=2, gy=1
        grid = oracle.vote_grid(np.array([mv(47, 16, 8, 0)]), GW, GH, **KW)
        assert grid[1, 2] == 1

    def test_negative_dst_excluded(self):
        # dst_x = -5 -> gx = -1 (arithmetic shift), excluded by gx >= 0
        grid = oracle.vote_grid(np.array([mv(-5, 32, 8, 0)]), GW, GH, **KW)
        assert grid.sum() == 0

    def test_out_of_grid_excluded(self):
        grid = oracle.vote_grid(np.array([mv(16 * GW, 32, 8, 0)]), GW, GH, **KW)
        assert grid.sum() == 0

    def test_vertical_mask_excludes_rows(self):
        # gy=0 < y_min=1 and gy=7 >= y_max=7 are both dropped
        rows = np.array([mv(32, 0, 8, 0), mv(32, 16 * 7, 8, 0)])
        grid = oracle.vote_grid(rows, GW, GH, **KW)
        assert grid.sum() == 0

    def test_saturating_at_255(self):
        rows = np.array([mv(32, 32, 8, 0)] * 300)
        grid = oracle.vote_grid(rows, GW, GH, **KW)
        assert grid[2, 2] == 255

    def test_threshold_is_double_compare(self):
        # threshold 16.5: mag_sq 16 < 16.5 -> skip
        kw = dict(KW, threshold_sq=16.5)
        grid = oracle.vote_grid(np.array([mv(32, 32, 4, 0)]), GW, GH, **kw)
        assert grid.sum() == 0


class TestClusters:
    def make(self, cells, value=5):
        grid = np.zeros((GH, GW), dtype=np.uint8)
        for y, x in cells:
            grid[y, x] = value
        return grid

    def test_isolated_cell_no_cluster(self):
        grid = self.make([(3, 3)])
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 0

    def test_horizontal_pair_counts_twice(self):
        # both cells are active-with-active-neighbor -> count 2
        grid = self.make([(3, 3), (3, 4)])
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 2

    def test_vertical_pair(self):
        grid = self.make([(3, 3), (4, 3)])
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 2

    def test_diagonal_not_adjacent(self):
        grid = self.make([(3, 3), (4, 4)])
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 0

    def test_x_edges_not_centers(self):
        # centers scan x in [1, gw-2]; x=0 and x=gw-1 are never centers
        grid = self.make([(3, 0), (3, 1)])
        # x=1 is a center with active neighbor x=0 -> 1 cluster (x=0 not counted)
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 1

    def test_neighbor_row_outside_mask_counts(self):
        # center at y_min with active neighbor at y_min-1 (votes there can't
        # exist from vote_grid, but cluster phase reads the row regardless)
        grid = self.make([(1, 3), (0, 3)])
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 1

    def test_below_vote_threshold_inactive(self):
        grid = self.make([(3, 3), (3, 4)], value=1)
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=1, y_max=7) == 0

    def test_margin_zero_defined(self):
        # margin 0 is UB in the reference; we define OOB neighbor rows as 0
        grid = self.make([(0, 3), (0, 4)])
        assert oracle.count_clusters(grid, vectors_needed=2, y_min=0, y_max=8) == 2


class TestCheckFrame:
    def test_motion_decision(self):
        rows = np.array([mv(32, 32, 8, 0)] * 2 + [mv(48, 32, 8, 0)] * 2)
        assert oracle.check_frame(rows, GW, GH, vectors_needed=2,
                                  clusters_needed=2, **KW)
        assert not oracle.check_frame(rows[:2], GW, GH, vectors_needed=2,
                                      clusters_needed=2, **KW)


class TestSegmentation:
    def test_merge_sort_unique(self):
        out = oracle.merge_timestamps([3.0, 1.0, 2.0, 1.0, 3.0])
        assert out.tolist() == [1.0, 2.0, 3.0]

    def test_single_run_padded(self):
        segs = oracle.segments_from_timestamps(
            [10.0, 11.0, 12.0], max_gap_sec=5.0, padding_sec=0.5, duration=100.0)
        assert segs == [TimeSegment(9.5, 12.5)]

    def test_gap_splits(self):
        segs = oracle.segments_from_timestamps(
            [10.0, 11.0, 20.0], max_gap_sec=5.0, padding_sec=0.5, duration=100.0)
        assert segs == [TimeSegment(9.5, 11.5), TimeSegment(19.5, 20.5)]

    def test_gap_exactly_max_does_not_split(self):
        # strict > comparison (pipeline.cpp:333)
        segs = oracle.segments_from_timestamps(
            [10.0, 15.0], max_gap_sec=5.0, padding_sec=0.5, duration=100.0)
        assert segs == [TimeSegment(9.5, 15.5)]

    def test_clamp_start_at_zero(self):
        segs = oracle.segments_from_timestamps(
            [0.2], max_gap_sec=5.0, padding_sec=0.5, duration=100.0)
        assert segs == [TimeSegment(0.0, 0.7)]

    def test_clamp_end_at_duration_then_start(self):
        segs = oracle.segments_from_timestamps(
            [99.9], max_gap_sec=5.0, padding_sec=0.5, duration=100.0)
        assert segs == [TimeSegment(99.4, 100.0)]

    def test_savings_and_decision(self):
        segs = [TimeSegment(0.0, 10.0)]
        removed, pct = oracle.savings(segs, 100.0)
        assert removed == 90.0 and pct == 90.0
        is_cut, out = oracle.decide_cut(segs, 100.0, min_savings_pct=5.0)
        assert is_cut and out == segs
        # strict >: exactly-at-threshold copies the full stream
        is_cut, out = oracle.decide_cut([TimeSegment(0.0, 95.0)], 100.0,
                                        min_savings_pct=5.0)
        assert not is_cut and out == [TimeSegment(0.0, 100.0)]

    def test_concat_list_format(self):
        text = oracle.concat_list(
            "/x/in.mp4", [TimeSegment(1.005, 2.0), TimeSegment(3.0, 3.0)])
        # zero-length dropped; %.2f formatting
        assert text == "file '/x/in.mp4'\ninpoint 1.00\noutpoint 2.00\n"


class TestConfig:
    def test_defaults_match_reference_code(self):
        cfg = Config()
        assert cfg.mv_threshold_sq == 16.0
        assert cfg.vectors_needed == 2
        assert cfg.clusters_needed == 2
        assert cfg.vertical_mask == pytest.approx(0.05)
        assert cfg.min_savings_pct == 5.0

    def test_env_parsing(self, monkeypatch):
        monkeypatch.setenv("MV_THRESHOLD_SQ", "4.0")
        monkeypatch.setenv("VECTORS_NEEDED", "4")
        monkeypatch.setenv("TARGET_FPS", "10")
        monkeypatch.setenv("WATCH_MODE", "1")
        cfg = Config.from_env()
        assert cfg.mv_threshold_sq == 4.0
        assert cfg.vectors_needed == 4
        assert cfg.target_fps == 10.0
        assert cfg.watch_mode is True

    def test_grid_geometry_1080p(self):
        cfg = Config()
        gw, gh = cfg.grid_dims(1920, 1080)
        assert (gw, gh) == (120, 68)
        assert cfg.vertical_margin(gh) == 3

    def test_frame_skip(self):
        cfg = Config(target_fps=10.0)
        assert cfg.frame_skip(25.0) == 2
        assert cfg.frame_skip(10.0) == 1  # target >= fps -> no skip
        assert Config(target_fps=0.0).frame_skip(25.0) == 1


class TestBatchOracle:
    def test_vectorized_matches_naive(self, rng=np.random.default_rng(7)):
        for gw, gh, y_min, y_max, vn in [(40, 30, 1, 29, 2), (8, 8, 0, 8, 1),
                                         (120, 68, 3, 65, 4), (8, 8, 2, 6, 0)]:
            grids = rng.integers(0, 6, size=(16, gh, gw)).astype(np.uint8)
            batch = oracle.count_clusters_batch(
                grids, vectors_needed=vn, y_min=y_min, y_max=y_max)
            naive = [oracle.count_clusters(g, vectors_needed=vn,
                                           y_min=y_min, y_max=y_max)
                     for g in grids]
            np.testing.assert_array_equal(batch, naive)


class TestReviewFixes:
    def test_vectors_needed_wraps_like_uint8_cast(self, monkeypatch):
        # reference: static_cast<uint8_t> == mod 256 (config.hpp:74-77)
        monkeypatch.setenv("VECTORS_NEEDED", "256")
        assert Config.from_env().vectors_needed == 0
        monkeypatch.setenv("VECTORS_NEEDED", "257")
        assert Config.from_env().vectors_needed == 1
        monkeypatch.setenv("VECTORS_NEEDED", "-1")
        assert Config.from_env().vectors_needed == 255

    def test_timing_collector_thread_local(self):
        import threading
        from mvtrim_tpu.utils.timing import TimingCollector

        TimingCollector.clear()
        TimingCollector.record("main-entry", 1)
        seen = {}

        def worker():
            TimingCollector.record("worker-entry", 2)
            TimingCollector.clear()  # must not affect main thread
            seen["after_clear"] = TimingCollector.entries()

        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert seen["after_clear"] == []
        assert TimingCollector.entries() == [("main-entry", 1)]
        TimingCollector.clear()
