"""Tools: extract_mvs JSON schema + motion_scalar CSV (SURVEY.md §2 X4)."""

import json

import numpy as np
import pytest

from mvtrim_tpu.io import native
from mvtrim_tpu.tools import extract_mvs, motion_scalar


@pytest.fixture(scope="session")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tools") / "m.mp4")
    native.synthesize(path, width=320, height=240, fps=25.0, duration=6.0,
                      codec="libx264", motion_windows=((1.0, 3.0),))
    return path


class TestExtractMVs:
    def test_schema(self, clip):
        doc = extract_mvs.extract(clip)
        assert doc["input"] == clip
        num, den = doc["time_base"].split("/")
        assert int(den) > 0
        frames = doc["frames"]
        assert len(frames) > 100
        assert frames[0]["frame_index"] == 1
        assert [f["frame_index"] for f in frames] == \
            list(range(1, len(frames) + 1))
        # first decodable frame is an I-frame without MVs
        assert frames[0]["frame_type"] == "I"
        assert frames[0]["num_mvs"] == 0
        # some P-frame during motion carries MVs with the full field set
        p = next(f for f in frames
                 if f["num_mvs"] > 0 and 1.0 <= (f["pts_seconds"] or 0) < 3.0)
        mv = p["motion_vectors"][0]
        assert set(mv) == {"dst_x", "dst_y", "src_x", "src_y", "w", "h",
                           "motion_x", "motion_y", "motion_scale", "source"}
        # sub-pel src derivation (extract_mvs.cpp:148-151)
        scale = mv["motion_scale"] or 1
        assert mv["src_x"] == pytest.approx(
            mv["dst_x"] + mv["motion_x"] / scale, abs=1e-3)

    def test_cli_writes_json(self, clip, tmp_path):
        out = str(tmp_path / "mvs.json")
        assert extract_mvs.main([clip, out]) == 0
        doc = json.load(open(out))
        assert "frames" in doc

    def test_usage(self):
        assert extract_mvs.main([]) == 1


class TestMotionScalar:
    def test_buckets(self, clip, tmp_path):
        doc = extract_mvs.extract(clip)
        buckets = motion_scalar.motion_per_second(doc)
        # motion window 1-3s: those seconds dominate
        moving = sum(buckets.get(s, 0.0) for s in (1, 2))
        still = sum(buckets.get(s, 0.0) for s in (4, 5))
        assert moving > 10 * max(still, 1e-9)

    def test_hand_built_doc(self):
        doc = {"frames": [
            {"pts_seconds": 0.5, "motion_vectors": [
                {"motion_x": 4, "motion_y": 0, "motion_scale": 4,
                 "w": 16, "h": 16},          # |1.0| * 256 = 256
                {"motion_x": 3, "motion_y": 4, "motion_scale": 0,
                 "w": 16, "h": 16},          # scale 0 -> skipped
            ]},
            {"pts_seconds": None, "motion_vectors": [
                {"motion_x": 99, "motion_y": 0, "motion_scale": 1,
                 "w": 16, "h": 16}]},        # null pts -> skipped
            {"pts_seconds": 1.9, "motion_vectors": [
                {"motion_x": 0, "motion_y": 8, "motion_scale": 2,
                 "w": 8, "h": 8}]},          # |4.0| * 64 = 256 in sec 1
        ]}
        buckets = motion_scalar.motion_per_second(doc)
        assert buckets == {0: pytest.approx(256.0), 1: pytest.approx(256.0)}

    def test_cli(self, clip, tmp_path, capsys):
        out = str(tmp_path / "mvs.json")
        extract_mvs.main([clip, out])
        assert motion_scalar.main([out]) == 0
        captured = capsys.readouterr()
        assert captured.out.startswith("second,motion_value")
        assert "PERFORMANCE METRICS" in captured.err


class TestDeviceProbe:
    def test_probe_json(self, capsys):
        from mvtrim_tpu.tools import device_probe
        assert device_probe.main([]) == 0
        import json
        doc = json.loads(capsys.readouterr().out)
        assert len(doc["devices"]) == 8  # virtual CPU mesh in tests
        assert doc["scan_geometry_1080p"]["grid"] == [68, 120]
        assert doc["host"]["cpu_limit"] >= 1


class TestTuneCLI:
    def test_main(self, clip, capsys):
        from mvtrim_tpu.tools import tune
        assert tune.main([clip, "--thresholds", "16",
                          "--vectors", "1,2", "--clusters", "2"]) == 0
        import json
        results = json.loads(capsys.readouterr().out)
        assert len(results) == 2
        assert {r["vectors_needed"] for r in results} == {1, 2}


class TestHeatmap:
    def test_activity_localized_to_box_path(self, clip):
        """The moving box sweeps a horizontal band at mid-height: heatmap
        activity must concentrate there and be ~zero at top/bottom."""
        from mvtrim_tpu.tools import heatmap
        activity, frames, geom = heatmap.compute_heatmap(clip)
        assert frames > 100
        assert activity.shape == (geom.gh, geom.gw)
        band = activity[geom.gh // 3: 2 * geom.gh // 3].mean()
        top = activity[:2].mean()
        assert band > 0
        assert band > 10 * max(top, 1e-9)

    def test_vec0_excludes_mvless_frames(self, clip):
        """VECTORS_NEEDED=0: every cell of a frame WITH MV side data is
        active (votes >= 0, reference semantics), but MV-less frames
        (e.g. I-frames: unconditional !sd -> false,
        motion_scanner.cpp:219-221) must contribute no activity — so the
        map is uniform and strictly below 1.0, not all-ones."""
        import numpy as np
        from mvtrim_tpu.core.config import Config
        from mvtrim_tpu.tools import heatmap
        activity, frames, geom = heatmap.compute_heatmap(
            clip, Config(vectors_needed=0))
        assert frames > 100
        assert np.allclose(activity, activity[0, 0]), \
            "vec0 activity must be uniform (all cells active per frame)"
        assert 0.0 < activity[0, 0] < 1.0, \
            "MV-less frames must stay in the denominator only"

    def test_cli_json(self, clip, tmp_path, capsys):
        from mvtrim_tpu.tools import heatmap
        npy = str(tmp_path / "h.npy")
        assert heatmap.main([clip, "--npy", npy]) == 0
        import json
        import numpy as np
        doc = json.loads(capsys.readouterr().out)
        assert doc["grid"] == [15, 20]
        assert doc["hottest_cells"]
        arr = np.load(npy)
        assert arr.shape == (15, 20)


class TestDoctor:
    def test_all_checks_pass_on_this_box(self, capsys):
        """Every required capability works here; HEVC MV export and the
        CPU-only backend are WARNs (expected on FFmpeg 5.x / test env)."""
        from mvtrim_tpu.tools import doctor
        assert doctor.main(["--json"]) == 0  # exit = #failures
        import json
        doc = json.loads(capsys.readouterr().out)
        assert doc["failures"] == 0
        by_name = {c["name"]: c for c in doc["checks"]}
        for required in ("native-library", "h264-mv-export", "remux-cut",
                         "device-mesh", "end-to-end (oracle)"):
            assert by_name[required]["status"] == "ok", by_name[required]
        # FFmpeg 5.x on this box: HEVC MV export must be a WARN, not a
        # silent OK (the capability gap the doctor exists to surface)
        assert by_name["hevc-mv-export"]["status"] in ("ok", "warn")
        assert by_name["libav"]["detail"].startswith("avformat")

    def test_human_report(self, capsys):
        from mvtrim_tpu.tools import doctor
        rc = doctor.main([])
        out = capsys.readouterr().out
        assert rc == 0
        assert "[ OK ] native-library" in out
        assert "checks:" in out.splitlines()[-1]
