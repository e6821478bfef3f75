"""Device mesh discovery and sharded scan steps.

The reference's parallel substrate is cgroup-aware CPU enumeration +
thread pinning (system.cpp:107-225); the TPU-native substrate is a
``jax.sharding.Mesh``.  Two mesh axes are meaningful for this workload:

* ``data``  — frames (from one long archive or many videos) shard across
  chips; each chip scans its shard and a ``psum`` merges global motion
  statistics over ICI.
* ``sweep`` — detector configurations (vote thresholds) shard across
  chips; the same frames are scored under per-chip thresholds in one
  step.  The reference can only re-run the whole binary per config.

``sharded_scan_step`` builds the full jit'd multi-chip scan step the
driver dry-runs (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import Config
from ..core.types import GridGeometry


def build_mesh(n_devices: int | None = None,
               sweep: int = 1) -> Mesh:
    """Mesh over available devices: ('data', 'sweep').

    ``sweep`` chips hold distinct detector configs; the rest of the
    devices spread the frame batch.  If the default platform has fewer
    devices than requested, fall back to the CPU platform (virtual
    multi-device meshes for dryruns/tests).
    """
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        devices = jax.devices("cpu")
    n = n_devices or len(devices)
    assert n <= len(devices), (n, len(devices))
    assert n % sweep == 0, (n, sweep)
    dev_grid = np.asarray(devices[:n]).reshape(n // sweep, sweep)
    return Mesh(dev_grid, ("data", "sweep"))


def sharded_scan_step(geom: GridGeometry, cfg: Config, mesh: Mesh):
    """Build the jit'd multi-chip scan step.

    Returns ``step(votes, vec_needs) -> (motion, global_motion_frames)``:

      votes     uint8 [B, GH_p, GW_p], sharded over 'data'
      vec_needs int32 [K], sharded over 'sweep' (per-config thresholds)
      motion    bool  [B, K] — frame x config decisions, sharded (data, sweep)
      global_motion_frames int32 [K] — psum over 'data' (ICI collective),
                replicated over 'data', sharded over 'sweep'

    The per-frame math is the cluster kernel (ops/cluster.py); thresholds
    arrive as *data* so one compiled program serves every sweep point.
    """
    clusters_eff = max(1, cfg.clusters_needed)

    def local_step(votes, vec_needs):
        # votes: [B_local, GH, GW] uint8; vec_needs: [K_local] int32
        v = votes.astype(jnp.int32)
        # cluster map per threshold: vmap the threshold over K_local.
        def per_threshold(vec_need):
            # _cluster_map with a *traced* vec_need: replicate its math
            # here (static helper expects python int) — same ops.
            active = v >= vec_need
            def sh(dy, dx):
                pads = ((0, 0), (max(dy, 0), max(-dy, 0)),
                        (max(dx, 0), max(-dx, 0)))
                p = jnp.pad(v, pads)
                h, w = v.shape[-2], v.shape[-1]
                return p[:, max(-dy, 0):max(-dy, 0) + h,
                         max(-dx, 0):max(-dx, 0) + w]
            nb_max = jnp.maximum(jnp.maximum(sh(0, 1), sh(0, -1)),
                                 jnp.maximum(sh(1, 0), sh(-1, 0)))
            ys = jax.lax.broadcasted_iota(jnp.int32, v.shape[-2:], 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, v.shape[-2:], 1)
            mask = ((ys >= geom.y_min) & (ys < geom.y_max)
                    & (xs >= 1) & (xs <= geom.gw - 2))
            cl = active & (nb_max >= vec_need) & mask
            counts = jnp.sum(cl.astype(jnp.int32), axis=(-2, -1))
            return counts >= jnp.int32(clusters_eff)      # [B_local]

        motion = jax.vmap(per_threshold, out_axes=1)(vec_needs)  # [B_l, K_l]
        # Global motion-frame count per config: ICI collective over 'data'.
        global_count = jax.lax.psum(
            jnp.sum(motion.astype(jnp.int32), axis=0), axis_name="data")
        return motion, global_count

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None, None), P("sweep")),
        out_specs=(P("data", "sweep"), P("sweep")),
    )
    return jax.jit(step)


def shard_votes(votes: np.ndarray, mesh: Mesh):
    """Place a [B, GH, GW] batch sharded over the 'data' axis."""
    return jax.device_put(
        votes, NamedSharding(mesh, P("data", None, None)))


def stream_device_assignment(n_streams: int, mesh: Mesh) -> list[int]:
    """Round-robin multi-video streams onto mesh devices (replaces the
    reference's disjoint per-stream cpusets, batch_processor.cpp:101-110)."""
    n_dev = mesh.devices.size
    return [i % n_dev for i in range(n_streams)]
