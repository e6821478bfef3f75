"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

Real TPU hardware is single-chip in this environment; multi-chip sharding is
validated on virtual CPU devices exactly like the driver's dryrun.  Note:
some environments (axon) register a TPU platform at interpreter startup and
prepend it to jax_platforms, so setting the env var alone is not enough —
we override the config after import, before any backend initializes.
"""

import os

os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
