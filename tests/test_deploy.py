"""Deployment artifact coherence.

No docker exists in this environment, so the Dockerfile / docker-compose
pair (the reference deploys via Dockerfile:8-114 + docker-compose.yml:1-51)
can never be *built* here — but they can still rot: a renamed directory, a
dropped env knob, an FFmpeg pin below the HEVC-MV bar.  These tests parse
the artifacts and cross-check every claim they make against the repo, so
deployment bitrot fails CI instead of failing the first real `docker build`.
"""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(rel: str) -> str:
    with open(os.path.join(REPO, rel)) as f:
        return f.read()


class TestDockerfile:
    def test_copy_sources_exist(self):
        """Every COPY from the build context references a real path."""
        checked = 0
        for line in _read("Dockerfile").splitlines():
            m = re.match(r"\s*COPY\s+(.*)", line)
            if not m or "--from=" in line:
                continue
            *srcs, _dst = m.group(1).split()
            for src in srcs:
                assert os.path.exists(os.path.join(REPO, src)), \
                    f"Dockerfile COPYs missing path: {src}"
                checked += 1
        assert checked >= 5  # native/, mvtrim_tpu/, config/, pyproject, README

    def test_ffmpeg_pin_clears_hevc_mv_bar(self):
        """The image exists to provide HEVC MV export (FFmpeg >= 7,
        reference Dockerfile:46-65); a downgraded pin would silently
        reintroduce the SAD-fallback-only behavior."""
        m = re.search(r"ffmpeg-(\d+)\.(\d+)", _read("Dockerfile"))
        assert m, "Dockerfile no longer pins an FFmpeg source version"
        assert int(m.group(1)) >= 7

    def test_hevc_capability_gate_is_baked_into_the_build(self):
        """The build must fail if its libav cannot export HEVC MVs —
        the assert-at-build-time line must survive edits."""
        assert "hevc_mv_export_capable" in _read("Dockerfile")

    def test_native_lib_env_matches_copy_destination(self):
        df = _read("Dockerfile")
        m = re.search(r"MVT_NATIVE_LIB=(\S+)", df)
        assert m
        lib_path = m.group(1).rstrip("\\").strip()
        # the COPY --from=build must land the library at that path
        assert re.search(
            r"COPY --from=build \S*libmvtrim_host\.so\s+" +
            re.escape(os.path.relpath(lib_path, "/app")), df), \
            f"no COPY lands the native lib at {lib_path}"


class TestCompose:
    def test_parses_and_points_at_real_files(self):
        # PyYAML is a test-only extra (pyproject optional-dependencies
        # [test]); environments without it skip this one parse check,
        # not the module's Dockerfile/knob checks
        yaml = pytest.importorskip("yaml")
        doc = yaml.safe_load(_read("docker-compose.yml"))
        svc = doc["services"]["motion-trim"]
        for env_file in svc["env_file"]:
            assert os.path.exists(os.path.join(REPO, env_file)), env_file
        # watch-daemon flagship config: input ro, output rw, restart policy
        assert svc["environment"]["WATCH_MODE"] == "1"
        vols = "\n".join(svc["volumes"])
        assert "/input:ro" in vols and "/output:rw" in vols
        assert svc["restart"] == "unless-stopped"
        assert svc["command"] == ["/input", "/output"]


class TestEnvFileKnobs:
    def test_every_documented_knob_is_read_somewhere(self):
        """The reference ships a dead knob (MAX_THREADS, motion_trim.env —
        nothing reads it; SURVEY §5).  Our env file must not grow one:
        every non-comment KEY must be consumed by the source tree."""
        keys = []
        for line in _read("config/motion_trim.env").splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            keys.append(line.split("=", 1)[0])
        assert len(keys) >= 20
        source = []
        for root, _dirs, files in os.walk(os.path.join(REPO, "mvtrim_tpu")):
            for fn in files:
                if fn.endswith(".py"):
                    with open(os.path.join(root, fn)) as f:
                        source.append(f.read())
        blob = "\n".join(source)
        dead = [k for k in keys if f'"{k}"' not in blob
                and f"'{k}'" not in blob]
        assert not dead, f"env-file knobs nothing reads: {dead}"
