"""Multi-host execution path: 2-process CPU smoke (the pod-slice analogue of
SURVEY §7.2 step 6).  Both processes run jax.distributed.initialize, build
one 8-device mesh (4 local each), generate ONLY their own partitions, and
execute the SPMD window via MultiHostExecutor; outputs must match the
single-process distributed run row-exactly."""

import json
import socket
import subprocess
import sys
import os

import numpy as np
import pytest

from flock_tpu.parallel.stream import DistStreamDriver
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import generate_epoch_parts

HERE = os.path.dirname(os.path.abspath(__file__))
SECONDS, EPS, GENS = 2, 2000, 8


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("qnum", [2, 4])
def test_two_process_multihost_matches_single_process(tmp_path, qnum):
    port = free_port()
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(pid), str(port), str(tmp_path), str(qnum)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    rows = [json.load(open(tmp_path / f"rows_{pid}.json")) for pid in (0, 1)]
    rows = [[tuple(r) for r in rs] for rs in rows]
    assert rows[0] == rows[1]

    # single-process ground truth over the same data: one window (the worker
    # executes all epochs as one window ⇒ compare against a driver run with
    # one elementwise epoch containing everything, i.e. merge epochs)
    spec = get_query(qnum)
    parts = generate_epoch_parts(SECONDS, EPS, GENS)
    merged = [[p for epoch in parts for p in epoch]]
    dist = DistStreamDriver(spec, 1, 8).run(merged)
    names = spec.schema.names
    expect = sorted(
        tuple(map(str, (np.asarray(res.columns[n])[i] for n in names)))
        for res in dist for i in range(len(np.asarray(res.columns[names[0]]))))
    assert rows[0] == expect


def test_two_process_multihost_cli():
    """The DOCUMENTED pod command (parallel/multihost.py:13) works: two
    processes run ``nexmark run -q 4 --distributed --multihost`` through the
    real CLI and agree on the output row count."""
    port = free_port()
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_cli_worker.py"),
         str(pid), str(port), "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"CLI worker failed:\n{out[-3000:]}"
    # process 0 prints the summary line with the global row count
    assert "q4 multihost: 2 process(es)" in outs[0] + outs[1]
