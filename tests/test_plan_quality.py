"""Plan-quality assertions — the 100 TB design contract.

These lock the physical-plan properties that make the queries scale:
filters reach the parquet scan (PushedFilters), projection prunes the
read schema, dimension joins broadcast, top-k compiles to
TakeOrderedAndProject (no global sort), aggregates are two-phase.
A regression here is a performance bug even when results stay correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from oxidsql_spark.registry import load_all

QUERIES = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "ref_filter")
    assert "GreaterThanOrEqual(c_acctbal,1000.0)" in p
    assert "EqualTo(c_mktsegment,BUILDING)" in p


def test_column_pruning(spark, sf_dir):
    p = plan_of(spark, sf_dir, "ref_project")
    # only the three projected columns are read
    assert "ReadSchema: struct<p_partkey:bigint,p_name:string,p_brand:string>" in p


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    p = plan_of(spark, sf_dir, "tpch_q1")
    assert "LessThanOrEqual(l_shipdate," in p
    # partial (map-side) + final aggregation
    assert p.count("HashAggregate") >= 2
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]  # pruned


def test_dimension_joins_broadcast(spark, sf_dir):
    p = plan_of(spark, sf_dir, "ref_join")
    assert "BroadcastHashJoin" in p
    p5 = plan_of(spark, sf_dir, "tpch_q5")
    assert "BroadcastHashJoin" in p5
    assert "CartesianProduct" not in p5


def test_topk_no_global_sort(spark, sf_dir):
    p = plan_of(spark, sf_dir, "tpch_q3")
    assert "TakeOrderedAndProject" in p
    p2 = plan_of(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in p2


def test_no_python_udf_in_relational_paths(spark, sf_dir):
    """Relational/text queries must stay JVM-side (whole-stage codegen);
    only the explicitly-pandas operators may cross into Python."""
    for name in ("tpch_q1", "tpch_q3", "text_stats", "dedup_exact", "window_topk"):
        p = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


@pytest.mark.parametrize("name", ["tpch_q1", "tpch_q6", "text_stats"])
def test_wholestage_codegen_active(spark, sf_dir, name):
    """Codegen spans only materialize in the AQE *executed* plan — run
    the query, then inspect the final physical plan."""
    df = QUERIES[name].fn(spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert "*(" in p, p[:500]
    if name == "tpch_q1":
        assert "partial_sum" in p  # map-side combine before the exchange
