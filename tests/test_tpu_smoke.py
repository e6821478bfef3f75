"""Opt-in real-TPU smoke tests (`MVT_TPU_TESTS=1 python -m pytest -m tpu`).

The regular suite runs on the CPU backend (conftest forces it) because the
single-chip TPU in this environment serializes device grants and compiles
take 20-140s.  That leaves Mosaic lowering and device layouts covered only
by bench.py — these tests close the gap: they drive the full pipeline and
the pallas cluster kernel (incl. the pltpu.roll neighbor path) on the
actual device in a SUBPROCESS with a clean backend config (the parent test
process has already pinned jax to CPU).

Run exactly one TPU test process at a time (device-grant serialization):
pytest runs them sequentially in one worker, which is fine.
"""

import json
import os
import subprocess
import sys

import pytest

from mvtrim_tpu.io import native

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(os.environ.get("MVT_TPU_TESTS") != "1",
                       reason="real-TPU smoke tests are opt-in "
                              "(set MVT_TPU_TESTS=1)"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    """Subprocess env with the CPU-forcing knobs stripped so the
    environment's real backend (axon TPU) registers."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = flags
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_py(code: str, timeout: float = 1800.0):
    # remote compiles are usually 20-140s but have been observed north
    # of 960s on degraded days — the bound must cover one cold compile
    return subprocess.run([sys.executable, "-c", code], env=_tpu_env(),
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tpu") / "tiny.mp4")
    native.synthesize(path, width=640, height=480, fps=25.0, duration=8.0,
                      codec="libx264", motion_windows=((1.0, 3.0),))
    return path


def test_pipeline_on_device(tiny_clip, tmp_path):
    """Full single-file pipeline on the real chip (default bits path)."""
    out = str(tmp_path / "out.mp4")
    code = f"""
import json, sys
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {{dev}}"
from mvtrim_tpu.pipeline.pipeline import ProcessingPipeline
from mvtrim_tpu.core.config import Config
p = ProcessingPipeline({tiny_clip!r}, {out!r}, cfg=Config())
rc = p.run()
print(json.dumps({{"rc": rc, "saved_pct": p.saved_pct,
                   "device": str(dev)}}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["rc"] == 0
    assert 40.0 < rec["saved_pct"] < 90.0
    assert os.path.exists(out)


def test_pallas_sad_kernel_on_device(tmp_path):
    """Pallas block-SAD kernel (MXU block sums) vs the NumPy SAD oracle
    on the real chip."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.models.sad_detector import SADDetector, sad_oracle_counts
from mvtrim_tpu.core import oracle

cfg = Config()
det = SADDetector(640, 480, cfg)
assert det.backend == "pallas", det.backend
rng = np.random.default_rng(5)
luma = rng.integers(0, 256, size=(17, 480, 640), dtype=np.uint8)
motion = det.scan_luma(luma)
counts = sad_oracle_counts(luma, det.geom,
                           sad_threshold=cfg.sad_threshold,
                           block_size=cfg.block_size)
need = oracle.effective_clusters_needed(cfg.clusters_needed)
expect = np.zeros((17,), bool)
expect[1:] = counts >= need
print(json.dumps({"ok": bool((motion == expect).all())}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"ok": True}


def test_sliced_sad_product_op_on_device():
    """The lane-axis SLICED SAD product op (auto-selected at 4K/F=1
    geometries — ops/sad.make_sad_kernel_sliced, +4.1% measured at 4K)
    must be bit-exact on real hardware: its dynamic lane-offset scratch
    stores and pl.when decide step have lowering risk CPU/interpret
    coverage cannot see (the sublane-sliced first cut only failed ON
    hardware — 8-alignment lowering error, round 4)."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import sad as sad_ops
from mvtrim_tpu.models.sad_detector import sad_oracle_counts

cfg = Config()
geom = GridGeometry.build(3840, 96, cfg)   # 4K width, tiny height
op = sad_ops.make_sad_op_pallas(
    geom, sad_threshold=cfg.sad_threshold, block_size=cfg.block_size,
    clusters_needed=cfg.clusters_needed, height=96, width=3840,
    frames_per_step=1)                     # F=1 engages the auto-slice
assert op.slices_per_frame == 2, op.slices_per_frame
h_p = geom.padded_gh * cfg.block_size
w_p = geom.padded_gw * cfg.block_size
rng = np.random.default_rng(5)
luma = rng.integers(0, 256, size=(9, h_p, w_p), dtype=np.uint8)
counts, _ = op(luma)
expect = sad_oracle_counts(luma, geom, sad_threshold=cfg.sad_threshold,
                           block_size=cfg.block_size)
print(json.dumps({"ok": bool(np.array_equal(counts, expect))}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"ok": True}


def test_sad_kernel_near_threshold_exact_on_device():
    """Adversarial MXU-precision regression: every 16x16 block's SAD sits
    EXACTLY at the activation bound, built from row sums of 257 — a value
    bf16 cannot represent.  Mosaic lowers default-precision f32 matmuls
    as a single bf16 pass (inputs rounded: 257 -> 256, measured on a v5e
    via a 1153.0-operand probe), which would compute block SAD 4096 <
    bound 4112 and flip EVERY block inactive; ops/sad.py's column matmul
    splits the row sums into bf16-exact hi/lo halves (col_mode="hilo")
    to stay bit-exact.  Interpret mode and the CPU backend compute true
    f32 and cannot catch a regression here — only this hardware run
    does.

    The row sums that must reach the column matmul unrounded are the
    FIRST matmul's outputs, r_ind [gh_p, H_p] @ |diff| [H_p, W_p]: a
    per-COLUMN sum over the 16 image rows of a block.  The adversarial
    pattern therefore stripes along rows (axis 1), one 255 and one 2
    row per 16-row block, so every column's row sum is 257."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.models.sad_detector import SADDetector, sad_oracle_counts
from mvtrim_tpu.core import oracle
from mvtrim_tpu.ops.sad import sad_threshold_sum

cfg = Config(sad_threshold=16.0625)   # bound = ceil(16.0625*256) = 4112
assert sad_threshold_sum(cfg.sad_threshold, cfg.block_size) == 4112
det = SADDetector(640, 480, cfg)
assert det.backend == "pallas", det.backend
luma = np.zeros((3, 480, 640), dtype=np.uint8)
# frame 1: in every 16-row block, one all-255 row and one all-2 row
# -> every column's over-rows sum is 257 (not bf16-representable; a
# lossy column matmul rounds it to 256 -> block SAD 4096 < 4112),
# exact block SAD = 16 columns * 257 = 4112 = bound
luma[1, 0::16, :] = 255
luma[1, 1::16, :] = 2
# frame 2 equals frame 1 -> diff 0, no motion
luma[2] = luma[1]
motion = np.asarray(det.scan_luma(luma))
counts = sad_oracle_counts(luma, det.geom,
                           sad_threshold=cfg.sad_threshold,
                           block_size=cfg.block_size)
need = oracle.effective_clusters_needed(cfg.clusters_needed)
expect = np.zeros((3,), bool)
expect[1:] = counts >= need
assert expect[1] and not expect[2], (counts, expect)  # test is sharp
print(json.dumps({"ok": bool((motion == expect).all()),
                  "motion": motion.tolist()}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["ok"], rec


def test_pallas_cluster_kernel_on_device(tiny_clip, tmp_path):
    """Pallas cluster op (roll/min-combine Mosaic path) vs the oracle on
    the real chip — catches Mosaic layout/lowering regressions the CPU
    interpreter cannot."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import cluster as cluster_ops

cfg = Config()
geom = GridGeometry.build(1920, 1080, cfg)
rng = np.random.default_rng(3)
grids = rng.integers(0, 6, size=(128, geom.gh, geom.gw), dtype=np.uint8)
padded = np.zeros((128, geom.padded_gh, geom.padded_gw), np.uint8)
padded[:, :geom.gh, :geom.gw] = grids

op = cluster_ops.make_cluster_op_pallas(
    geom, cfg.vectors_needed, cfg.clusters_needed, block_b=64)
counts, motion = op(jax.device_put(padded))
expected = oracle.count_clusters_batch(
    grids, vectors_needed=cfg.vectors_needed,
    y_min=geom.y_min, y_max=geom.y_max)
ok_counts = bool((np.asarray(counts) == expected).all())
need = oracle.effective_clusters_needed(cfg.clusters_needed)
ok_motion = bool((np.asarray(motion) == (expected >= need)).all())
print(json.dumps({"ok_counts": ok_counts, "ok_motion": ok_motion}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec == {"ok_counts": True, "ok_motion": True}


def test_transposed_words_kernel_on_device():
    """The flagship transposed word kernel (sublane rolls + MXU popcount
    reduction, slim edge masks) vs the oracle on the real chip."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core import oracle
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import cluster as cluster_ops

cfg = Config()
geom = GridGeometry.build(1920, 1080, cfg)
rng = np.random.default_rng(9)
grids = rng.integers(0, 6, size=(256, geom.gh, geom.gw), dtype=np.uint8)
active = grids >= cfg.vectors_needed
bits = np.packbits(active, axis=2, bitorder="little")
gww, used, lanes = cluster_ops.word_geometry(geom)
words = np.zeros((256, lanes), np.int32)
words[:, :used] = cluster_ops.repack_bits_words(bits, geom)

op = cluster_ops.make_cluster_words_op_pallas_T(
    geom, cfg.clusters_needed, block_b=256)
counts, motion = op(jax.device_put(np.ascontiguousarray(words.T)))
expected = oracle.count_clusters_batch(
    active.astype(np.uint8), vectors_needed=1,
    y_min=geom.y_min, y_max=geom.y_max)
need = oracle.effective_clusters_needed(cfg.clusters_needed)
print(json.dumps({
    "ok_counts": bool((np.asarray(counts) == expected).all()),
    "ok_motion": bool((np.asarray(motion) == (expected >= need)).all())}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec == {"ok_counts": True, "ok_motion": True}


def test_mv_op_large_capacity_clamp_on_device():
    """The fused-MV op at M=16384 — the documented-supported capacity
    where the VMEM-aware clamp (ops/mv_vote.mv_frames_per_step) must
    drop frames-per-step 16 -> 12: at F=16 the four 8x-sublane-padded
    [1, M] stream blocks alone (double-buffered) would equal the whole
    64MB vmem limit.  Compiles + runs the clamped kernel on the real
    chip and diffs against the XLA build (first hardware-proved in
    round 3; kept as a guard because no CPU/interpret test can catch a
    scoped-VMEM overflow)."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import mv_vote

cfg = Config()
geom = GridGeometry.build(1920, 1080, cfg)
rng = np.random.default_rng(11)
b, m = 24, 16384
assert mv_vote.mv_frames_per_step(m) == 12
mv_list = [rng.integers(-64, 1920, size=(int(rng.integers(100, m)), 4))
           for _ in range(b)]
dx, dy, sx, sy, counts, _ = mv_vote.pad_mvs(mv_list, m)
kw = dict(threshold_sq=cfg.mv_threshold_sq, block_shift=cfg.block_shift,
          vectors_needed=cfg.vectors_needed,
          clusters_needed=cfg.clusters_needed)
n, _ = mv_vote.make_mv_cluster_op_pallas(geom, **kw)(dx, dy, sx, sy, counts)
nr, _ = mv_vote.make_mv_cluster_op_xla(geom, **kw)(dx, dy, sx, sy, counts)
print(json.dumps({"ok": bool((np.asarray(n) == np.asarray(nr)).all())}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"ok": True}


def test_mv_ragged_hybrid_legs_on_device():
    """The round-5 ragged HYBRID kernel's hardware-only legs: the
    DYNAMIC chunk grid (`grid=(nb, jnp.max(nc_steps))`) and the
    own-finalize step (`ci == nc_step - 1`, which can precede the static
    last chunk) have NO interpret-mode equivalent — interpret falls back
    to a static grid (ops/mv_vote.py:442-453), so only a device run
    covers them.  Three batches at M=8192 (nc_total=4, m_chunk=2048):

      * all-sparse  — every step takes the no-scratch fast path and the
        dynamic grid collapses to one chunk iteration;
      * mixed       — step 0 pure fast path, step 1 multi-chunk with
        boundary counts (2048 = exactly one chunk inside a 4-chunk
        step; 2049 = first lane of chunk 1; 0 = all-padding), so the
        fast-path write of step 0 must survive the skipped chunk
        iterations before the out block flushes, and step 1's finalize
        fires at its OWN last needed chunk;
      * all-full    — every frame at capacity, finalize at the static
        last chunk (the fast path never taken).

    Each diffs against the XLA build (bit-parity contract,
    motion_scanner.cpp:242-268 semantics)."""
    code = """
import json
import numpy as np
import jax
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.core.types import GridGeometry
from mvtrim_tpu.ops import mv_vote

cfg = Config()
geom = GridGeometry.build(1920, 1080, cfg)
rng = np.random.default_rng(55)
m, m_chunk = 8192, 2048
kw = dict(threshold_sq=cfg.mv_threshold_sq, block_shift=cfg.block_shift,
          vectors_needed=cfg.vectors_needed,
          clusters_needed=cfg.clusters_needed)
op = mv_vote.make_mv_cluster_op_pallas(geom, m_chunk=m_chunk,
                                       ragged_chunks=True, **kw)
ref = mv_vote.make_mv_cluster_op_xla(geom, **kw)

def batch(counts):
    mvs = [rng.integers(-64, 1920, size=(c, 4)) for c in counts]
    return mv_vote.pad_mvs(mvs, m)[:5]

sparse = [int(rng.integers(1, m_chunk)) for _ in range(32)]
mixed = ([5, 100, 2048, 1500] * 4                  # step 0: fast path
         + [0, 2049, 8192, 4096, 2048, 1, 6000, 3000] * 2)  # step 1
full = [m] * 32
ok = True
for counts in (sparse, mixed, full):
    dx, dy, sx, sy, cts = batch(counts)
    n, mo = op(dx, dy, sx, sy, cts)
    nr, mr = ref(dx, dy, sx, sy, cts)
    ok &= bool((np.asarray(n) == np.asarray(nr)).all())
    ok &= bool((np.asarray(mo) == np.asarray(mr)).all())
print(json.dumps({"ok": ok}))
"""
    r = _run_py(code)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"ok": True}
