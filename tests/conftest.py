"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested without TPU hardware by running JAX's CPU
backend with 8 virtual devices (the analogue of the reference's
in-process multi-stage shuffle tests, flock/src/launcher/aws/mod.rs:279-844).
"""

import os

# Must be set before jax is imported by any test module.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
