"""Test config: force CPU with 8 virtual devices so sharding/collective
tests run without a TPU pod (SURVEY.md §4).

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we must
set the platform through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
