"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (the driver separately dry-runs multi-chip)."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
