"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested without TPU hardware by running JAX's CPU
backend with 8 virtual devices (the analogue of the reference's
in-process multi-stage shuffle tests, flock/src/launcher/aws/mod.rs:279-844).

The axon TPU-tunnel plugin registers itself from sitecustomize at interpreter
startup (before conftest runs) and force-selects ``jax_platforms="axon,cpu"``.
Re-pointing the config at "cpu" *before any backend is initialized* makes the
tests use the virtual CPU devices.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["FLOCK_TPU_JIT_CACHE"] = "0"  # see flock_tpu/__init__.py
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache has produced stale-executable buffer
# mismatches on the CPU backend in multi-query processes; disable for tests.
jax.config.update("jax_compilation_cache_dir", None)

assert len(jax.devices()) == 8, (
    f"tests need the 8-device virtual CPU mesh, got {jax.devices()}"
)
