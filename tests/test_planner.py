"""Planner parity tests: stage counts match the reference's golden assertions
(flock/src/distributed_plan/planner.rs:93,125,172,256,343)."""

import pytest

from flock_tpu.planner import plan_query_stages
from flock_tpu.queries.nexmark import get_query
from flock_tpu.queries.ysb import ysb_query


@pytest.mark.parametrize("qnum,expected", [
    (1, 1),   # planner.rs:93
    (2, 1),   # planner.rs:125
    (3, 2),   # planner.rs:172
    (4, 4),   # planner.rs:256
])
def test_nexmark_stage_counts(qnum, expected):
    dag = plan_query_stages(get_query(qnum).plan)
    assert len(dag.stages) == expected, dag.explain()


def test_ysb_stage_count():
    dag = plan_query_stages(ysb_query().plan)   # planner.rs:343
    assert len(dag.stages) == 3, dag.explain()


def test_q3_fan_in_stage():
    # stage 0 holds both filtered scans (stage.rs fan-in), stage 1 the join
    dag = plan_query_stages(get_query(3).plan)
    ops0 = " ".join(dag.stages[0].ops)
    assert "Scan(person)" in ops0 and "Scan(auction)" in ops0
    assert any("LookupJoin" in op for op in dag.stages[1].ops)


def test_explain_renders():
    dag = plan_query_stages(get_query(4).plan)
    text = dag.explain()
    assert "Stage 0" in text and "hash(" in text and "broadcast" in text


def test_golden_dag_files():
    # stage-structure goldens for every query (the playground .dag analogue,
    # playground/src/distributed_plan/nexmark/q*.dag)
    import os

    from flock_tpu.queries.nexmark import QUERIES
    from flock_tpu.queries.ysb import ysb_query

    here = os.path.join(os.path.dirname(__file__), "golden_dags")
    for n, spec in sorted(QUERIES.items()):
        want = open(os.path.join(here, f"q{n}.dag")).read()
        assert plan_query_stages(spec.plan).explain() + "\n" == want, f"q{n}"
    want = open(os.path.join(here, "ysb.dag")).read()
    assert plan_query_stages(ysb_query().plan).explain() + "\n" == want
