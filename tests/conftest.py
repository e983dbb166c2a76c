"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX substitute for multi-chip testing without hardware
(SURVEY.md §4): sharding/pjit paths compile and execute against 8 virtual
CPU devices; numerics tests just use device 0.

NOTE: this image's sitecustomize force-registers the axon TPU backend and
sets JAX_PLATFORMS=axon, so a plain env setdefault is not enough — we
override the jax config directly before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by repeated XLA CPU
# compiles of tiny models; cache them across tests AND across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()
