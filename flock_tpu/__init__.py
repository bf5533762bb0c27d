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

__version__ = "0.1.0"
