"""Data-contract validation: each check class must COUNT violations
correctly on data that actually violates (the registered orders query
is an all-green contract; this exercises the red paths)."""

from __future__ import annotations

from oxidsql_spark.operators.quality import validate_contracts


def test_validate_contracts_counts_violations(spark):
    child = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (1, 10, -2.0),   # dup key + negative value
            (2, 99, None),   # orphan fk + null value (violates v > 0: NULL -> violation)
            (3, None, 1.0),  # null fk child is NOT an orphan (SQL FK semantics)
            (3, 10, 0.0),    # second k=3 (dup key); v=0 violates the strict > 0
        ],
        "k int, ref int, v double",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk int")
    rep = {
        r["check"]: r.violations
        for r in validate_contracts(
            child,
            row_checks={"v_positive": "v > 0"},
            unique={"pk": ["k"]},
            not_null=["ref"],
            fk={"child_parent": (parent, "ref", "pk")},
        ).collect()
    }
    assert rep == {
        "v_positive": 3,        # -2.0, NULL, 0.0
        "unique(pk)": 2,        # k=1 twice (+1), k=3 twice (+1)
        "not_null(ref)": 1,     # the NULL ref
        "fk(child_parent)": 1,  # ref=99 (NULL ref exempt)
    }


def test_validate_contracts_empty_and_clean(spark):
    df = spark.createDataFrame([(1, 1)], "a int, b int")
    # no checks declared -> empty report with the right schema
    empty = validate_contracts(df)
    assert empty.count() == 0 and empty.columns == ["check", "violations"]
    clean = {
        r["check"]: r.violations
        for r in validate_contracts(
            df, row_checks={"ok": "a = b"}, unique={"u": ["a"]}
        ).collect()
    }
    assert clean == {"ok": 0, "unique(u)": 0}


def test_row_checks_fuse_into_one_scan(spark, sf_dir):
    """All row-level predicates must evaluate in ONE aggregate over one
    scan — no per-check pass."""
    from oxidsql_spark.sources import table

    o = table(spark, sf_dir, "orders")
    rep = validate_contracts(
        o,
        row_checks={"a": "o_totalprice > 0", "b": "o_orderkey > 0"},
        not_null=["o_custkey"],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
