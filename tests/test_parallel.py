"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 item 4)."""

import numpy as np
import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.oracle import count_clusters_batch
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.parallel.mesh import (build_mesh, shard_votes,
                                      sharded_scan_step,
                                      stream_device_assignment)

CFG = Config()
GEOM = GridGeometry.build(256, 192, CFG)


def expected_motion(votes, vec_need):
    counts = count_clusters_batch(votes, vectors_needed=vec_need,
                                  y_min=GEOM.y_min, y_max=GEOM.y_max)
    return counts >= max(1, CFG.clusters_needed)


class TestMesh:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    @pytest.mark.parametrize("n,sweep", [(8, 1), (8, 2), (4, 2), (2, 1)])
    def test_mesh_shapes(self, n, sweep):
        mesh = build_mesh(n, sweep=sweep)
        assert mesh.shape["data"] * mesh.shape["sweep"] == n
        assert mesh.shape["sweep"] == sweep

    def test_stream_assignment_round_robin(self):
        mesh = build_mesh(4)
        assert stream_device_assignment(6, mesh) == [0, 1, 2, 3, 0, 1]

    def test_oversized_mesh_fails_loudly(self):
        """Production misconfiguration (more devices requested than the
        default platform holds) must raise with the device inventory —
        never silently fall back to scanning on host CPUs."""
        with pytest.raises(RuntimeError, match="16-device mesh.*only 8"):
            build_mesh(16)

    def test_cpu_fallback_is_explicit_opt_in(self):
        # On the CPU test backend the fallback re-resolves to the same
        # 8 devices, so an oversized request still fails loudly, but a
        # satisfiable one succeeds — the knob only gates the platform
        # switch, never relaxes the size check.
        mesh = build_mesh(8, allow_cpu_fallback=True)
        assert mesh.devices.size == 8

    def test_oversized_fallback_fails_with_inventory(self):
        """Even with the CPU fallback opted in, an unsatisfiable size
        raises with the inventory and the virtual-mesh hint — not a bare
        assert (which python -O would strip)."""
        with pytest.raises(RuntimeError,
                           match="CPU fallback platform also has only 8"):
            build_mesh(16, allow_cpu_fallback=True)

    def test_indivisible_sweep_raises(self):
        with pytest.raises(ValueError, match="not divisible by sweep"):
            build_mesh(8, sweep=3)


class TestShardedScan:
    @pytest.mark.parametrize("sweep", [1, 2, 4])
    def test_scan_step_matches_oracle(self, rng, sweep):
        mesh = build_mesh(8, sweep=sweep)
        step = sharded_scan_step(GEOM, CFG, mesh)
        b = 16 * mesh.shape["data"]
        votes = rng.integers(
            0, 5, size=(b, GEOM.padded_gh, GEOM.padded_gw), dtype=np.uint8)
        vec_needs = np.arange(1, sweep + 1, dtype=np.int32)
        motion, global_counts = step(
            shard_votes(votes, mesh),
            jax.device_put(vec_needs, NamedSharding(mesh, P("sweep"))))
        motion = np.asarray(motion)
        for k, vn in enumerate(vec_needs):
            expect = expected_motion(votes, int(vn))
            np.testing.assert_array_equal(motion[:, k], expect)
            assert int(global_counts[k]) == int(expect.sum())

    def test_data_shard_independence(self, rng):
        """Same frames produce the same decisions regardless of mesh size —
        sharding the batch axis is semantically invisible."""
        votes = rng.integers(
            0, 5, size=(32, GEOM.padded_gh, GEOM.padded_gw), dtype=np.uint8)
        vec = np.array([2], dtype=np.int32)
        results = []
        for n in (1, 2, 8):
            mesh = build_mesh(n, sweep=1)
            step = sharded_scan_step(GEOM, CFG, mesh)
            motion, counts = step(
                shard_votes(votes, mesh),
                jax.device_put(vec, NamedSharding(mesh, P("sweep"))))
            results.append((np.asarray(motion), int(counts[0])))
        for m, c in results[1:]:
            np.testing.assert_array_equal(m, results[0][0])
            assert c == results[0][1]


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry
        fn, args = entry()
        counts, motion = jax.jit(fn)(*args)
        assert counts.shape == motion.shape == (args[0].shape[0],)

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)

    def test_dryrun_multichip_32_devices(self):
        """The sharded training-step + archive path generalize past the
        suite's 8-device mesh: 32 virtual devices in a subprocess (this
        process's device count is pinned by conftest)."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # conftest pins 8 devices via JAX_NUM_CPU_DEVICES, which would
        # override XLA_FLAGS in the child — set both to 32
        env["JAX_NUM_CPU_DEVICES"] = "32"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=32"])
        repo_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get(
            "PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-c",
             # sitecustomize-proof platform pin (env alone is overridden
             # by axon-style setups): keeps the dryrun off any tunnel
             "import jax; jax.config.update('jax_platforms', 'cpu'); "
             "import __graft_entry__ as g; g.dryrun_multichip(32)"],
            env=env, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "dryrun_archive OK" in r.stdout + r.stderr


class TestMultiDeviceBatch:
    def test_streams_pinned_to_distinct_devices(self, tmp_path):
        """Batch mode with >1 device: each stream analyzes on its own chip
        (virtual CPU devices here), outputs identical to single-device."""
        import os
        from mvtrim_tpu.batch.batch import BatchProcessor, list_videos
        from mvtrim_tpu.io import native as nat

        in_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        for name in ("a.mp4", "b.mp4", "c.mp4"):
            nat.synthesize(str(in_dir / name), width=320, height=240,
                           fps=25.0, duration=6.0, codec="libx264",
                           motion_windows=((1.0, 3.0),))
        bp = BatchProcessor(3, Config(scan_backend="xla"))
        assert bp.process(list_videos(str(in_dir)), str(out_dir)) == 0
        for name in ("a.mp4", "b.mp4", "c.mp4"):
            assert os.path.exists(out_dir / name)


class TestDistributed:
    def test_single_process_noop(self, monkeypatch):
        from mvtrim_tpu.parallel import distributed
        # no coordinator/pod env configured -> stays single-process
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
        assert distributed.initialize() is False

    def test_empty_coordinator_env_is_unset(self, monkeypatch):
        """An EMPTY JAX_COORDINATOR_ADDRESS (unfilled compose/env
        template) must mean single-process, not a coordinator-less
        multi-process initialize that hangs at startup."""
        from mvtrim_tpu.parallel import distributed
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "")
        monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
        assert distributed.initialize() is False
