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

assert jax.devices()[0].platform == "cpu", jax.devices()
