"""Test config: force the CPU backend with 8 virtual devices so tests run
anywhere and don't depend on the (tunneled, occasionally flaky) TPU chip.

Note: this image's sitecustomize registers the `axon` TPU plugin and appends
it to jax_platforms regardless of the JAX_PLATFORMS env var, so we must
override the config after importing jax, not via the environment.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
