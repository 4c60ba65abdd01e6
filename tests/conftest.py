"""Test configuration: force an 8-virtual-device CPU platform.

Multi-device mesh/collective code is tested the standard way — on CPU with
``xla_force_host_platform_device_count=8`` — so the suite runs anywhere
without a TPU pod (SURVEY.md §4).

This environment pins ``JAX_PLATFORMS=axon`` (a real TPU tunnel) via a
sitecustomize hook, so we flip the platform through jax.config *before* the
first backend resolution. Set ``_ISR_TPU_TESTS=1`` to run the suite against
the real chip instead.
"""

import os

if os.environ.get("_ISR_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")
    import jax

    jax.config.update("jax_platforms", "cpu")
