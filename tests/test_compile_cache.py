"""Persistent XLA compilation cache (utils/compile_cache.py).

The cache is ergonomics for repeat CLI invocations (the reference's eager
torch pays no compile cost — rs.py:16-27 — so this has no reference
counterpart to pin against): resolution order, the off-switch, graceful
fallback on unwritable locations, real cache population through jit, and
the flag's presence on every long-compile CLI.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from image_super_resolution_tpu.utils.compile_cache import (
    DEFAULT_DIR,
    DEFAULT_MAX_BYTES,
    enable_compile_cache,
    resolve_cache_dir,
    resolve_max_bytes,
)


class TestResolve:
    def test_explicit_dir_wins(self, monkeypatch, tmp_path):
        monkeypatch.setenv("ISR_COMPILE_CACHE", "/env/path")
        assert resolve_cache_dir(str(tmp_path)) == str(tmp_path)

    def test_env_var_when_no_explicit(self, monkeypatch):
        monkeypatch.setenv("ISR_COMPILE_CACHE", "/env/path")
        assert resolve_cache_dir(None) == "/env/path"

    def test_default_expands_home(self, monkeypatch):
        monkeypatch.delenv("ISR_COMPILE_CACHE", raising=False)
        resolved = resolve_cache_dir(None)
        assert resolved == str(Path(DEFAULT_DIR).expanduser())
        assert "~" not in resolved

    @pytest.mark.parametrize("value", ["off", "OFF", "none", "0", "", "  off "])
    def test_off_values_disable(self, value):
        assert resolve_cache_dir(value) is None

    def test_env_off_disables(self, monkeypatch):
        monkeypatch.setenv("ISR_COMPILE_CACHE", "off")
        assert resolve_cache_dir(None) is None

    def test_max_bytes_default_and_override(self, monkeypatch):
        monkeypatch.delenv("ISR_COMPILE_CACHE_MAX_BYTES", raising=False)
        assert resolve_max_bytes() == DEFAULT_MAX_BYTES
        monkeypatch.setenv("ISR_COMPILE_CACHE_MAX_BYTES", "-1")
        assert resolve_max_bytes() == -1  # unbounded opt-out
        monkeypatch.setenv("ISR_COMPILE_CACHE_MAX_BYTES", "not-an-int")
        assert resolve_max_bytes() == DEFAULT_MAX_BYTES

    def test_enable_applies_lru_bound(self, tmp_path, monkeypatch):
        import jax

        prev_dir = jax.config.jax_compilation_cache_dir
        prev_max = jax.config.jax_compilation_cache_max_size
        try:
            monkeypatch.setenv("ISR_COMPILE_CACHE_MAX_BYTES", "12345")
            enable_compile_cache(str(tmp_path))
            assert jax.config.jax_compilation_cache_max_size == 12345
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update("jax_compilation_cache_max_size", prev_max)


class TestEnable:
    def test_unwritable_location_falls_back_to_uncached(self):
        # /proc is not writable: the cache must degrade to None, not raise
        assert enable_compile_cache("/proc/isr_no_such_cache") is None

    def test_populates_and_reuses_entries(self, tmp_path, monkeypatch):
        """A jitted call writes an executable into the cache directory.

        Also pins the mid-process dir-change behavior: earlier tests in the
        suite may already have initialized JAX's file cache at another path
        (JAX opens it at most once unless reset), so enable_compile_cache
        must make THIS directory take effect regardless.
        """
        import jax
        import jax.numpy as jnp
        from jax._src import compilation_cache as cc

        prev_dir = jax.config.jax_compilation_cache_dir
        prev_time = jax.config.jax_persistent_cache_min_compile_time_secs
        prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
        try:
            assert enable_compile_cache(str(tmp_path)) == str(tmp_path)
            # tiny test graphs compile in <1s; persist everything
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

            @jax.jit
            def f(x):
                return jnp.tanh(x) @ (x + 1.2345)  # unique enough to compile

            f(jnp.ones((8, 8))).block_until_ready()
            entries = [p for p in tmp_path.rglob("*") if p.is_file()]
            assert entries, "no cache entries written"
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_time)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)
            cc.reset_cache()  # drop the tmp_path-backed cache object


    def test_legacy_unbounded_entries_get_atime_backfill(
        self, tmp_path, monkeypatch
    ):
        """Upgrading an unbounded cache dir to bounded must keep it writable.

        JAX's LRUCache reads an ``-atime`` companion for EVERY ``*-cache``
        entry during eviction; entries written before the bound existed have
        none, so one legacy entry makes every put() fail with a
        FileNotFoundError warning. enable_compile_cache backfills them.
        """
        import warnings

        import jax
        import jax.numpy as jnp
        from jax._src import compilation_cache as cc

        legacy = tmp_path / "deadbeef-cache"
        legacy.write_bytes(b"legacy entry from the unbounded era")

        prev_dir = jax.config.jax_compilation_cache_dir
        prev_max = jax.config.jax_compilation_cache_max_size
        prev_time = jax.config.jax_persistent_cache_min_compile_time_secs
        prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
        try:
            monkeypatch.setenv("ISR_COMPILE_CACHE_MAX_BYTES", str(1 << 20))
            assert enable_compile_cache(str(tmp_path)) == str(tmp_path)
            atime = tmp_path / "deadbeef-atime"
            assert atime.exists(), "legacy entry not backfilled"
            assert (
                int.from_bytes(atime.read_bytes(), "little")
                == legacy.stat().st_mtime_ns
            )

            # the actual regression: a put() alongside the legacy entry
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

            @jax.jit
            def f(x):
                return jnp.sinh(x) @ (x - 0.54321)

            with warnings.catch_warnings():
                warnings.simplefilter("error")  # the failure mode is a warning
                f(jnp.ones((8, 8))).block_until_ready()
            new_entries = [
                p
                for p in tmp_path.glob("*-cache")
                if p.name != "deadbeef-cache"
            ]
            assert new_entries, "no new cache entry written beside legacy one"
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update("jax_compilation_cache_max_size", prev_max)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_time)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)
            cc.reset_cache()


class TestFlagSurface:
    """Every CLI whose first call compiles a big graph exposes the flag."""

    @pytest.mark.parametrize(
        "module",
        ["rs", "train", "evaluate", "export"],
    )
    def test_cli_exposes_compile_cache(self, module):
        import importlib

        mod = importlib.import_module(
            f"image_super_resolution_tpu.cli.{module}"
        )
        flags = {
            action.option_strings[0]
            for action in mod.build_parser()._actions
            if action.option_strings
        }
        assert "--compile_cache" in flags
