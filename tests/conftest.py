"""Test configuration: force an 8-device virtual CPU platform so
mesh/pjit/collective tests run without TPU hardware (SURVEY.md §4
'Distributed').

Note: the env var JAX_PLATFORMS alone is not enough in this environment —
the axon TPU plugin still wins backend selection — so we also set the jax
config explicitly after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
