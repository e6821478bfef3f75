"""Real multi-process `jax.distributed.initialize` coverage.

Spawns two CPU-backend subprocesses that join one coordination service
through parallel.distributed.initialize (the branch the single-process
no-op test never enters), then run a cross-process collective
(process_allgather) to prove the cluster actually formed.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # axon sitecustomize-proof
from mvtrim_tpu.parallel import distributed

ok = distributed.initialize()
import numpy as np
from jax.experimental import multihost_utils

gathered = multihost_utils.process_allgather(
    np.array([jax.process_index() + 1], np.int32))
print(json.dumps({
    "multi": bool(ok),
    "process_count": jax.process_count(),
    "process_index": jax.process_index(),
    "device_count": jax.device_count(),
    "gathered": np.asarray(gathered).ravel().tolist(),
}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_cluster(worker_src: str, n_procs: int = 2,
                   devices_per_proc: int = 1, extra_env=None):
    """Launch n CPU-backend subprocesses joined into one JAX cluster."""
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        # scrub pod-detection and the parent suite's virtual-device knobs
        env.pop("TPU_WORKER_HOSTNAMES", None)
        env.pop("JAX_NUM_CPU_DEVICES", None)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        if devices_per_proc > 1:
            flags.append("--xla_force_host_platform_device_count="
                         f"{devices_per_proc}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_procs)
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker_src], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    results = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-3000:]
        results.append(json.loads(out.strip().splitlines()[-1]))
    return results


def test_two_process_initialize_and_collective():
    results = _spawn_cluster(_WORKER, n_procs=2, devices_per_proc=1)

    assert [r["process_index"] for r in results] == [0, 1]
    for r in results:
        assert r["multi"] is True
        assert r["process_count"] == 2
        assert r["device_count"] == 2
        # the collective saw both processes' contributions
        assert sorted(r["gathered"]) == [1, 2]


_ARCHIVE_WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # axon sitecustomize-proof
from mvtrim_tpu.parallel import distributed

ok = distributed.initialize()
assert ok, "cluster did not form"
import numpy as np
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.parallel.archive import scan_archive_multiprocess

cfg = Config(chunk_duration_sec=3.0)
segments, duration, stats = scan_archive_multiprocess(
    os.environ["MVT_TEST_CLIP"], cfg, frames_per_device=16)
print(json.dumps({
    "process_index": jax.process_index(),
    "device_count": jax.device_count(),
    "local_device_count": jax.local_device_count(),
    "segments": [[s.start, s.end] for s in segments],
    "duration": duration,
    "frames_scanned": stats["frames_scanned"],
    "motion_frames": stats["motion_frames"],
    "motion_frames_psum": stats["motion_frames_psum"],
    "dispatches": stats["dispatches"],
}))
"""


def test_multiprocess_archive_scan_matches_single_chip_oracle(tmp_path):
    """The PRODUCT path run multi-process (VERDICT r3 item 3): 2 CPU
    processes x 4 virtual devices each, per-process decode of disjoint
    chunk ranges, sharded global batches via
    make_array_from_process_local_data, psum + all_gather merge — the
    segments must byte-equal the single-chip oracle list (the same
    assertion __graft_entry__._dryrun_archive makes single-process)."""
    from mvtrim_tpu.core import oracle
    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.io import native

    clip = str(tmp_path / "tiny.mp4")
    native.synthesize(clip, width=320, height=240, fps=25.0,
                      duration=10.0, codec="libx264",
                      motion_windows=((2.0, 4.0), (7.0, 8.0)))

    results = _spawn_cluster(_ARCHIVE_WORKER, n_procs=2,
                             devices_per_proc=4,
                             extra_env={"MVT_TEST_CLIP": clip})

    # single-chip ground truth: host decode + oracle math end to end
    cfg = Config(chunk_duration_sec=3.0)
    r = native.VideoReader(clip)
    geom = GridGeometry.build(r.width, r.height, cfg)
    grids, pts = r.scan_grids(
        0.0, r.duration + 1, threshold_sq=cfg.mv_threshold_sq,
        block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
        y_min=geom.y_min, y_max=geom.y_max, max_frames=400)
    r.close()
    counts = oracle.count_clusters_batch(
        grids, vectors_needed=cfg.vectors_needed,
        y_min=geom.y_min, y_max=geom.y_max)
    m = counts >= oracle.effective_clusters_needed(cfg.clusters_needed)
    ts = oracle.merge_timestamps(pts[m].tolist())
    expect = [[s.start, s.end] for s in oracle.segments_from_timestamps(
        ts, max_gap_sec=cfg.max_gap_sec, padding_sec=cfg.padding_sec,
        duration=results[0]["duration"])]

    assert [r_["process_index"] for r_ in results] == [0, 1]
    for r_ in results:
        assert r_["device_count"] == 8
        assert r_["local_device_count"] == 4
        # every process computed the identical, oracle-equal segments
        assert r_["segments"] == expect and len(expect) > 0, (
            r_["segments"], expect)
        assert r_["frames_scanned"] == len(pts)
        assert r_["motion_frames"] == int(ts.size)
        # the psum total counts every True decision pre-dedupe
        assert r_["motion_frames_psum"] >= r_["motion_frames"] > 0
        assert r_["dispatches"] >= 2  # lockstep batches actually sharded


def test_multiprocess_archive_scan_with_zero_frame_process(tmp_path):
    """Edge: a clip shorter than one chunk gives process 1 ZERO chunks —
    it must still join every lockstep dispatch with all-padding shards
    and the empty-side timestamp allgather, and converge on the same
    oracle-equal segments as the process that decoded everything."""
    from mvtrim_tpu.core import oracle
    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.io import native

    clip = str(tmp_path / "short.mp4")
    native.synthesize(clip, width=320, height=240, fps=25.0,
                      duration=2.0, codec="libx264",
                      motion_windows=((0.5, 1.5),))

    results = _spawn_cluster(_ARCHIVE_WORKER, n_procs=2,
                             devices_per_proc=4,
                             extra_env={"MVT_TEST_CLIP": clip})

    cfg = Config(chunk_duration_sec=3.0)  # > clip duration: 1 chunk total
    r = native.VideoReader(clip)
    geom = GridGeometry.build(r.width, r.height, cfg)
    grids, pts = r.scan_grids(
        0.0, r.duration + 1, threshold_sq=cfg.mv_threshold_sq,
        block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
        y_min=geom.y_min, y_max=geom.y_max, max_frames=400)
    r.close()
    counts = oracle.count_clusters_batch(
        grids, vectors_needed=cfg.vectors_needed,
        y_min=geom.y_min, y_max=geom.y_max)
    m = counts >= oracle.effective_clusters_needed(cfg.clusters_needed)
    ts = oracle.merge_timestamps(pts[m].tolist())
    expect = [[s.start, s.end] for s in oracle.segments_from_timestamps(
        ts, max_gap_sec=cfg.max_gap_sec, padding_sec=cfg.padding_sec,
        duration=results[0]["duration"])]

    for r_ in results:
        assert r_["segments"] == expect and len(expect) > 0, (
            r_["segments"], expect)
        assert r_["frames_scanned"] == len(pts)
        assert r_["motion_frames"] == int(ts.size) > 0
        assert r_["dispatches"] >= 1


def _spawn_cluster_raw(worker_src: str, n_procs: int = 2,
                       devices_per_proc: int = 1, extra_env=None):
    """_spawn_cluster without the success assertion: returns
    [(returncode, stdout, stderr)] so failure-path tests can inspect."""
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.pop("TPU_WORKER_HOSTNAMES", None)
        env.pop("JAX_NUM_CPU_DEVICES", None)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        if devices_per_proc > 1:
            flags.append("--xla_force_host_platform_device_count="
                         f"{devices_per_proc}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_procs)
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker_src], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    out = []
    for p in procs:
        o, e = p.communicate(timeout=300)
        out.append((p.returncode, o, e))
    return out


_ARCHIVE_CKPT_WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # axon sitecustomize-proof
from mvtrim_tpu.parallel import distributed

ok = distributed.initialize()
assert ok, "cluster did not form"
import numpy as np
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.parallel.archive import scan_archive_multiprocess

abort_after = int(os.environ.get("MVT_TEST_ABORT_AFTER", "0"))

def cb(i, n):
    # fault injection: exit hard after the i-th lockstep dispatch —
    # sidecar appends for chunks completed so far have already hit disk
    if abort_after and i + 1 >= abort_after:
        os._exit(3)

cfg = Config(chunk_duration_sec=2.0)
segments, duration, stats = scan_archive_multiprocess(
    os.environ["MVT_TEST_CLIP"], cfg,
    frames_per_device=int(os.environ.get("MVT_TEST_FPD", "16")),
    checkpoint=os.environ.get("MVT_TEST_CKPT") or None,
    progress_cb=cb)
print(json.dumps({
    "process_index": jax.process_index(),
    "segments": [[s.start, s.end] for s in segments],
    "duration": duration,
    "frames_scanned": stats["frames_scanned"],
    "motion_frames": stats["motion_frames"],
    "dispatches": stats["dispatches"],
    "resumed_chunks_local": stats["resumed_chunks_local"],
}))
"""


def _oracle_segments(clip, cfg, duration):
    from mvtrim_tpu.core import oracle
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.io import native

    r = native.VideoReader(clip)
    geom = GridGeometry.build(r.width, r.height, cfg)
    grids, pts = r.scan_grids(
        0.0, r.duration + 1, threshold_sq=cfg.mv_threshold_sq,
        block_shift=cfg.block_shift, gw=geom.gw, gh=geom.gh,
        y_min=geom.y_min, y_max=geom.y_max, max_frames=400)
    r.close()
    counts = oracle.count_clusters_batch(
        grids, vectors_needed=cfg.vectors_needed,
        y_min=geom.y_min, y_max=geom.y_max)
    m = counts >= oracle.effective_clusters_needed(cfg.clusters_needed)
    ts = oracle.merge_timestamps(pts[m].tolist())
    return [[s.start, s.end] for s in oracle.segments_from_timestamps(
        ts, max_gap_sec=cfg.max_gap_sec, padding_sec=cfg.padding_sec,
        duration=duration)], len(pts), int(ts.size)


def test_multiprocess_archive_4_processes(tmp_path):
    """Wider topology (VERDICT r4 item 3): 4 processes x 2 devices each —
    the chunk round-robin, lockstep dispatch agreement, and the f64
    timestamp allgather must hold past the 2-process case."""
    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.io import native

    clip = str(tmp_path / "four.mp4")
    native.synthesize(clip, width=320, height=240, fps=25.0,
                      duration=10.0, codec="libx264",
                      motion_windows=((2.0, 4.0), (7.0, 8.0)))
    results = _spawn_cluster(_ARCHIVE_CKPT_WORKER, n_procs=4,
                             devices_per_proc=2,
                             extra_env={"MVT_TEST_CLIP": clip,
                                        "MVT_TEST_FPD": "8"})
    cfg = Config(chunk_duration_sec=2.0)
    expect, n_pts, n_motion = _oracle_segments(clip, cfg,
                                               results[0]["duration"])
    assert sorted(r["process_index"] for r in results) == [0, 1, 2, 3]
    for r_ in results:
        assert r_["segments"] == expect and len(expect) > 0
        assert r_["frames_scanned"] == n_pts
        assert r_["motion_frames"] == n_motion > 0


def test_multiprocess_checkpoint_kill_and_resume(tmp_path):
    """Kill the whole job mid-scan (after the first lockstep dispatch,
    when each process has sidecar records for its completed chunks),
    restart with the same topology: the resume must skip recorded
    chunks and converge on the oracle-equal segments (VERDICT r4
    item 3)."""
    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.io import native

    clip = str(tmp_path / "kill.mp4")
    native.synthesize(clip, width=320, height=240, fps=25.0,
                      duration=10.0, codec="libx264",
                      motion_windows=((2.0, 4.0), (7.0, 8.0)))
    ck = str(tmp_path / "mp.ckpt")
    env = {"MVT_TEST_CLIP": clip, "MVT_TEST_CKPT": ck,
           "MVT_TEST_FPD": "16"}

    # phase 1: all processes exit(3) after dispatch 1
    out = _spawn_cluster_raw(_ARCHIVE_CKPT_WORKER, n_procs=2,
                             devices_per_proc=4,
                             extra_env=dict(env, MVT_TEST_ABORT_AFTER="1"))
    assert all(rc == 3 for rc, _, _ in out), [(rc, e[-500:])
                                              for rc, _, e in out]
    sidecars = [f"{ck}.p0", f"{ck}.p1"]
    assert all(os.path.exists(s) for s in sidecars)
    # at least one chunk record landed before the kill (beyond headers)
    recs = sum(1 for s in sidecars for line in open(s)
               if '"chunk"' in line)
    assert recs >= 1, "kill happened before any chunk completed"

    # phase 2: same topology, full run — resumes past recorded chunks
    results = _spawn_cluster(_ARCHIVE_CKPT_WORKER, n_procs=2,
                             devices_per_proc=4, extra_env=env)
    cfg = Config(chunk_duration_sec=2.0)
    expect, n_pts, n_motion = _oracle_segments(clip, cfg,
                                               results[0]["duration"])
    assert sum(r["resumed_chunks_local"] for r in results) >= 1
    for r_ in results:
        assert r_["segments"] == expect and len(expect) > 0
        assert r_["motion_frames"] == n_motion > 0
        # rescanned frames exclude the resumed chunks' frames
        assert r_["frames_scanned"] < n_pts

    # phase 3: a THIRD run resumes everything — zero frames rescanned
    results3 = _spawn_cluster(_ARCHIVE_CKPT_WORKER, n_procs=2,
                              devices_per_proc=4, extra_env=env)
    for r_ in results3:
        assert r_["segments"] == expect
        assert r_["frames_scanned"] == 0
        assert r_["resumed_chunks_local"] >= 1


def test_multiprocess_checkpoint_refuses_resharded_topology(tmp_path):
    """Sidecars written under one process count pin (process_count,
    process_index) in their identity header; a restart with a different
    count re-shards the chunk assignment and MUST refuse loudly."""
    from mvtrim_tpu.io import native

    clip = str(tmp_path / "reshard.mp4")
    native.synthesize(clip, width=320, height=240, fps=25.0,
                      duration=6.0, codec="libx264",
                      motion_windows=((1.0, 3.0),))
    ck = str(tmp_path / "mp2.ckpt")
    env = {"MVT_TEST_CLIP": clip, "MVT_TEST_CKPT": ck,
           "MVT_TEST_FPD": "8"}
    _spawn_cluster(_ARCHIVE_CKPT_WORKER, n_procs=2, devices_per_proc=2,
                   extra_env=env)
    out = _spawn_cluster_raw(_ARCHIVE_CKPT_WORKER, n_procs=4,
                             devices_per_proc=1, extra_env=env)
    # processes 0/1 open the pc=2 sidecars and refuse; the job dies
    failing = [e for rc, _, e in out if rc != 0]
    assert failing, "re-sharded resume was not refused"
    assert any("different scan" in e for e in failing)
