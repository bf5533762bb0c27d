"""flock_tpu — a TPU-native streaming SQL engine.

A from-scratch rebuild of the capabilities of flock-lab/flock (serverless
streaming NEXMark/YSB engine) designed for TPUs: fixed-shape columnar batches,
hand-lowered query plans compiled to XLA, Pallas kernels on the hot paths, and
SPMD shuffle over a jax.sharding.Mesh instead of Lambda payload invocation.
See SURVEY.md for the reference map and the design rationale.
"""

import jax

# int64 accumulators (aggregate sums) and exactness-sensitive paths need x64;
# hot-path arrays are explicitly int32/float32 throughout (see batch.py).
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: first TPU compiles are expensive (minutes via
# remote compile); cache across processes.  Disabled via FLOCK_TPU_JIT_CACHE=0
# (the test suite does: cache hits have produced executables whose
# dropped-unused-parameter layout disagrees with the fresh trace, failing with
# "Execution supplied N buffers but compiled program expected M").
import os as _os

if _os.environ.get("FLOCK_TPU_JIT_CACHE", "1") == "1":
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass

__version__ = "0.1.0"
