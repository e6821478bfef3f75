"""motion-estimated-video-trimmer, TPU-native.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Vaibhav-20022002/Motion-Estimated-Video-Trimmer (pure C++/FFmpeg reference):
codec motion-vector scanning of surveillance video, cluster-based motion
detection, temporal segmentation, and lossless FFmpeg-level cutting —
with the per-frame analysis running as batched device kernels instead of
per-thread scalar loops.

Layout:
  core/      config knobs (identical env names), value types, NumPy oracle
  ops/       Pallas + XLA device kernels (vote/cluster, fused MV, SAD, segmentation)
  models/    detector "model" families wrapping the kernels (MV, SAD)
  io/        host media layer: ctypes bridge to the native C++ decode library
  cut/       lossless cut executors (native remux / external ffmpeg) + job queue
  pipeline/  single-video driver (probe -> scan -> segment -> cut)
  batch/     multi-video scheduler, watch mode, mesh sharding of streams
  parallel/  device mesh discovery and sharded scan steps
  utils/     logging, phase timing
  tools/     extract_mvs / motion_scalar equivalents
"""

__version__ = "0.1.0"

import os as _os

# Persistent jit cache: CLI invocations are short-lived processes, and the
# scan programs are identical across runs for a given (geometry, config) —
# without this every invocation pays tens of seconds of XLA compilation
# on standard PJRT deployments (remote-compile tunnels like axon compile
# server-side and are not helped — see PERFORMANCE.md).
# MVT_COMPILE_CACHE=<dir> selects an explicit (e.g. fleet-shared)
# directory and caches every program; otherwise a per-user default is
# used.  Opt out entirely with MVT_JAX_CACHE=0.  Handled here via env
# vars so every entry point (CLI, library, bench, tools) is covered
# before jax initializes.
if _os.environ.get("MVT_COMPILE_CACHE"):
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _os.environ[
        "MVT_COMPILE_CACHE"]
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
elif _os.environ.get("MVT_JAX_CACHE", "1") != "0":
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/mvtrim_tpu/jax"))
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from .core.config import Config
from .core.types import TimeSegment, ScanTask, GridGeometry

__all__ = ["Config", "TimeSegment", "ScanTask", "GridGeometry", "__version__"]
