"""Bit-exact parity against the compiled C++ reference.

Builds the read-only reference (parity/build_reference.sh: vendored
header-only fmt 11 + a system() interposer that captures the concat list
from the memfd), runs both implementations on the same synthetic clips
under the same env knobs, and asserts the final concat lists — the
inpoint/outpoint cut boundaries formatted to %.2f — are byte-identical.

This is the north-star contract from BASELINE.json ("segment boundaries
identical to the C++ reference").  Skips (not fails) if the reference
toolchain can't build here.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD_DIR = "/tmp/mvt_ref_build"


@pytest.fixture(scope="session")
def reference_bin():
    binary = os.path.join(BUILD_DIR, "motion_trim")
    interposer = os.path.join(BUILD_DIR, "libinterpose_system.so")
    if not (os.path.exists(binary) and os.path.exists(interposer)):
        try:
            subprocess.run(
                [os.path.join(REPO, "parity", "build_reference.sh"),
                 BUILD_DIR],
                check=True, capture_output=True, timeout=600)
        except (subprocess.SubprocessError, OSError) as e:
            pytest.skip(f"reference build unavailable: {e}")
    return binary, interposer


@pytest.fixture(scope="session")
def clips(tmp_path_factory):
    from mvtrim_tpu.io import native

    d = tmp_path_factory.mktemp("parity")
    paths = {}
    p = str(d / "two_windows.mp4")
    native.synthesize(p, width=640, height=480, fps=25.0, duration=20.0,
                      codec="libx264",
                      motion_windows=((2.0, 5.0), (12.0, 14.0)))
    paths["two_windows"] = p
    p = str(d / "busy.mp4")
    native.synthesize(p, width=320, height=240, fps=25.0, duration=12.0,
                      codec="libx264", motion_windows=((0.5, 11.5),))
    paths["busy"] = p
    p = str(d / "bframes.mp4")
    native.synthesize(p, width=320, height=240, fps=25.0, duration=12.0,
                      codec="libx264", motion_windows=((2.0, 5.0),),
                      b_frames=2)
    paths["bframes"] = p
    return paths


def run_reference(binary, interposer, clip, env_knobs, tmp_path):
    dump = str(tmp_path / "ref_concat.txt")
    if os.path.exists(dump):
        os.unlink(dump)
    env = dict(os.environ)
    env.update(env_knobs)
    env["LD_PRELOAD"] = interposer
    env["MVT_CONCAT_DUMP"] = dump
    res = subprocess.run(
        [binary, clip, str(tmp_path / "ref_out.mp4")],
        env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    return open(dump).read() if os.path.exists(dump) else None


def run_ours(clip, env_knobs, tmp_path):
    dump = str(tmp_path / "our_concat.txt")
    if os.path.exists(dump):
        os.unlink(dump)
    env = dict(os.environ)
    env.update(env_knobs)
    env["MVT_FFMPEG_BIN"] = os.path.join(REPO, "parity", "fake_ffmpeg.sh")
    env["MVT_CONCAT_DUMP"] = dump
    env["MVT_SCAN_BACKEND"] = "oracle"  # device-free; identical decisions
    env["MVT_LOG"] = "0"
    res = subprocess.run(
        ["python", "-m", "mvtrim_tpu", clip, str(tmp_path / "our_out.mp4")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    return open(dump).read() if os.path.exists(dump) else None


CONFIGS = [
    pytest.param({}, id="defaults"),
    pytest.param({"TARGET_FPS": "10"}, id="frame-skip"),
    pytest.param({"MV_THRESHOLD_SQ": "4.0", "VECTORS_NEEDED": "4"},
                 id="env-file-tuning"),
    pytest.param({"CHUNK_DURATION_SEC": "5.0", "THREADS_PER_STREAM": "3"},
                 id="multi-chunk-parallel"),
    pytest.param({"MAX_GAP_SEC": "2.0", "PADDING_SEC": "1.25"},
                 id="segmentation-knobs"),
    pytest.param({"MIN_SAVINGS_PCT": "95"}, id="full-copy-path"),
]


class TestConcatListParity:
    @pytest.mark.parametrize("knobs", CONFIGS)
    def test_two_windows(self, reference_bin, clips, tmp_path, knobs):
        binary, interposer = reference_bin
        ref = run_reference(binary, interposer, clips["two_windows"],
                            knobs, tmp_path)
        ours = run_ours(clips["two_windows"], knobs, tmp_path)
        assert ref is not None and ours is not None
        assert ours == ref

    def test_busy_clip_defaults(self, reference_bin, clips, tmp_path):
        binary, interposer = reference_bin
        ref = run_reference(binary, interposer, clips["busy"], {}, tmp_path)
        ours = run_ours(clips["busy"], {}, tmp_path)
        assert ours == ref

    def test_batch_mode(self, reference_bin, clips, tmp_path):
        """Directory batch (BASELINE config 4): per-file concat lists from
        the reference's parallel streams + cut queue match ours."""
        binary, interposer = reference_bin
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        os.symlink(clips["two_windows"], in_dir / "a.mp4")
        os.symlink(clips["busy"], in_dir / "b.mp4")

        def dumps_for(cmd_env, out_dir, dump_dir):
            os.makedirs(out_dir, exist_ok=True)
            os.makedirs(dump_dir, exist_ok=True)
            argv = cmd_env.pop("_argv")
            env = dict(os.environ)
            env.update(cmd_env)
            env["MVT_CONCAT_DUMP_DIR"] = dump_dir
            env["PARALLEL_STREAMS"] = "2"
            res = subprocess.run(
                argv, env=env, capture_output=True,
                text=True, cwd=REPO, timeout=600)
            assert res.returncode == 0, res.stdout + res.stderr
            return {
                f: open(os.path.join(dump_dir, f)).read()
                for f in sorted(os.listdir(dump_dir))
            }

        ref = dumps_for(
            {"_argv": [binary, str(in_dir), str(tmp_path / "ref_out")],
             "LD_PRELOAD": interposer},
            str(tmp_path / "ref_out"), str(tmp_path / "ref_dump"))
        ours = dumps_for(
            {"_argv": ["python", "-m", "mvtrim_tpu", str(in_dir),
                       str(tmp_path / "our_out")],
             "MVT_FFMPEG_BIN": os.path.join(REPO, "parity",
                                            "fake_ffmpeg.sh"),
             "MVT_SCAN_BACKEND": "oracle", "MVT_LOG": "0"},
            str(tmp_path / "our_out"), str(tmp_path / "our_dump"))
        assert set(ref) == {"a.mp4.concat", "b.mp4.concat"}
        # concat lists reference absolute input paths — identical inputs,
        # so full byte equality holds per file
        assert ours == ref

    def test_b_frame_clip(self, reference_bin, clips, tmp_path):
        """B-frame stream: the skip_frame=BIDIR analyzed-frame set and the
        resulting segments must match the reference exactly."""
        binary, interposer = reference_bin
        knobs = {"VECTORS_NEEDED": "1"}
        ref = run_reference(binary, interposer, clips["bframes"], knobs,
                            tmp_path)
        ours = run_ours(clips["bframes"], knobs, tmp_path)
        assert ref is not None and ours == ref
