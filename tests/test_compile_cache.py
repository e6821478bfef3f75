"""MVT_COMPILE_CACHE wiring: the knob must configure JAX's persistent
compilation cache and produce on-disk entries that a fresh process hits.

Runs on the CPU backend in subprocesses (the suite's conftest pins the
parent to CPU anyway); asserts a cache write on the first run and a hit
on the second — the wiring contract, independent of backend speed.

Scope note (PERFORMANCE.md): through this environment's axon
remote-compile tunnel the server-side compile at first execution
dominates and is NOT covered by the client-side cache; the knob's value
is on standard PJRT deployments.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROG = """
import logging, sys
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
from mvtrim_tpu.core.config import Config
from mvtrim_tpu.utils.system import enable_compile_cache
cfg = Config.from_env()
assert cfg.compile_cache_dir, "knob not plumbed"
import jax
# axon-style sitecustomize prepends its platform; env alone is not enough
if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
enable_compile_cache(cfg.compile_cache_dir)
import jax.numpy as jnp
import numpy as np
from mvtrim_tpu.ops import cluster as cluster_ops
from mvtrim_tpu.core.types import GridGeometry
geom = GridGeometry.build(320, 240, Config())
op = cluster_ops.make_cluster_words_op_xla(geom, 2)
lanes = cluster_ops.word_geometry(geom)[2]
counts, motion = op(jnp.asarray(np.zeros((8, lanes), np.int32)))
print("counts_sum", int(np.asarray(counts).sum()))
"""


def _run(cache_dir, extra_env=None):
    env = dict(os.environ)
    env["MVT_COMPILE_CACHE"] = cache_dir
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    return subprocess.run([sys.executable, "-c", _PROG], env=env,
                          capture_output=True, text=True, timeout=300)


def test_compile_cache_round_trip(tmp_path):
    cache = str(tmp_path / "jitcache")
    r1 = _run(cache)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "counts_sum 0" in r1.stdout
    entries = sorted(os.listdir(cache))
    # at least the scan program landed on disk (exact filenames are
    # JAX-internal; "-cache" suffix is the on-disk contract we rely on)
    assert any(e.endswith("-cache") for e in entries), entries

    r2 = _run(cache)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "counts_sum 0" in r2.stdout
    # a hit produces NO new entries; a key-instability miss would write
    # a second entry for the same program (the axon-tunnel signature)
    assert sorted(os.listdir(cache)) == entries, (
        entries, sorted(os.listdir(cache)))
