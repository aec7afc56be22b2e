"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh: multi-chip sharding paths compile
and execute without TPU hardware, and CPU startup avoids the slow remote-TPU
tunnel initialization.  This must happen before JAX initializes a backend,
hence the env mutation at conftest import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
