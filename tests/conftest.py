"""Test configuration: route tests to a virtual 8-device CPU backend.

This environment preloads JAX via sitecustomize with an `axon` TPU backend
already registered, so `JAX_PLATFORMS=cpu` cannot be set in time. Instead we
inject `--xla_force_host_platform_device_count=8` before the first backend
discovery (conftest runs before any test imports jax.devices) and pin
`jax_default_device` to CPU. Sharded tests build their mesh explicitly from
`jax.devices("cpu")` — the standard JAX multi-host simulation (SURVEY.md §4).

Set ZKSTARK_TEST_TPU=1 to leave the default device on the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("ZKSTARK_TEST_TPU"):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
