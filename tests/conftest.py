"""Test config: force an 8-device virtual CPU mesh so sharding paths are
testable without TPU hardware (tests never require the real chip).

The container's sitecustomize registers the remote-TPU ('axon') PJRT plugin
and pins JAX_PLATFORMS=axon before any of this runs, so plain env vars are
not enough: the platform must be overridden through jax.config before the
backend initializes (which only happens at first use)."""
import os

flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    f"test mesh wants 8 virtual CPU devices, got {len(jax.devices())} "
    f"on backend {jax.default_backend()!r}")
