"""Worker process for the 2-process multihost smoke test (launched by
tests/test_multihost.py).  Drives the REAL multi-host path: distributed
init → global mesh over both processes' devices → per-host generator
partitions → MultiHostExecutor SPMD window → allgathered rows to disk."""

import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]
qnum = int(sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", None)

from flock_tpu.parallel.multihost import (  # noqa: E402
    MultiHostExecutor,
    init_distributed,
    local_partition_ids,
    make_multihost_mesh,
)

init_distributed(coordinator=f"localhost:{port}", num_processes=2,
                 process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

from flock_tpu.queries.nexmark import get_query  # noqa: E402
from flock_tpu.runtime.stream import generate_epoch_parts  # noqa: E402
from flock_tpu.runtime.tables import concat_relations  # noqa: E402

SECONDS, EPS, GENS = 2, 2000, 8
spec = get_query(qnum)
mesh = make_multihost_mesh()
n_shards = len(list(mesh.devices.flat))

# deterministic generation, but each host only generates ITS partitions
mine = set(local_partition_ids(GENS, mesh))
parts = generate_epoch_parts(SECONDS, EPS, GENS)
rels = tuple(r for r in spec.relations if r != "side_input")

ex = MultiHostExecutor(spec, mesh=mesh, agg_capacity=4096)
local_tables = []
for shard in ex.local_shards:
    owned = [parts[t][p] for t in range(SECONDS)
             for p in range(GENS) if p % n_shards == shard]
    assert all(p in mine for p in range(GENS) if p % n_shards == shard)
    local_tables.append(dict(concat_relations(owned, rels)))

host = ex.execute_window(local_tables)

from flock_tpu.runtime.executor import materialize_columns  # noqa: E402

cols = materialize_columns(spec, host)
names = spec.schema.names
rows = sorted(zip(*(list(map(str, cols[n])) for n in names))) \
    if len(cols[names[0]]) else []
with open(os.path.join(outdir, f"rows_{pid}.json"), "w") as f:
    json.dump(rows, f)
print(f"p{pid}: {len(rows)} rows", flush=True)
