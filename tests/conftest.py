"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

Real TPU hardware is single-chip in this environment; multi-chip sharding is
validated on virtual CPU devices exactly like the driver's dryrun.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
