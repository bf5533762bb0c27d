"""Distributed windowed driver ≡ single-device windowed driver (all window
kinds), on the 8-virtual-device mesh."""

import numpy as np
import pytest

from flock_tpu.parallel.stream import DistStreamDriver
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import (
    StreamDriver,
    generate_epoch_parts,
    generate_epochs,
)

SECONDS = 12
EPS = 800
GENS = 8


@pytest.fixture(scope="module")
def data():
    return (generate_epochs(SECONDS, EPS, GENS),
            generate_epoch_parts(SECONDS, EPS, GENS))


def rows(cols, names):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


@pytest.mark.parametrize("qnum", [4, 5, 7, 11, 12])
def test_dist_windowed_matches_local(qnum, data):
    epochs, parts = data
    spec = get_query(qnum)
    local = StreamDriver(spec, SECONDS).run(epochs)
    dist = DistStreamDriver(spec, SECONDS, 8).run(parts)
    names = spec.schema.names
    lrows = sorted(r for res in local for r in rows(res.columns, names))
    drows = sorted(r for res in dist for r in rows(res.columns, names))
    assert lrows == drows, f"q{qnum}"
