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
    # Hermetic tests: never read/write the user-level persistent XLA compile
    # cache (utils/compile_cache.py). Suite runs would otherwise fill
    # ~/.cache with CPU-compiled entries, and concurrent multi-process tests
    # sharing one LRU'd directory can skew worker startup enough to blow
    # Gloo's 30 s rendezvous deadline. Tests that exercise the cache pass an
    # explicit directory (which takes precedence) or monkeypatch the env.
    os.environ.setdefault("ISR_COMPILE_CACHE", "off")
    import jax

    jax.config.update("jax_platforms", "cpu")
