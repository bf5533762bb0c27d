"""Worker for the 2-process multihost CLI smoke test: runs the DOCUMENTED
pod command (``nexmark run -q N --distributed --multihost``) end-to-end
through flock_tpu.cli.main (launched by tests/test_multihost.py)."""

import os
import sys

pid = sys.argv[1]
port = sys.argv[2]
qnum = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)

from flock_tpu.cli import main  # noqa: E402

rc = main(["nexmark", "run", "-q", qnum, "-s", "2", "-e", "2000", "-g", "8",
           "--distributed", "--multihost",
           "--coordinator", f"localhost:{port}",
           "--num-processes", "2", "--process-id", pid])
sys.exit(rc)
