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


def test_ingest_gated_stream_dead_letter_and_replay(spark, tmp_path):
    """Streaming contract-gated ingest: clean rows land per-batch under
    the good path, violating rows under the dead-letter path with the
    failed check names; nothing is lost, nothing dirty passes, and a
    replayed batch overwrites its own subdirs (exactly-once landing)."""
    import glob
    import os
    import shutil
    import time

    from oxidsql_spark.operators.quality import ingest_gated_stream

    rows = [
        [(1, 10, "a"), (2, -5, "b")],          # one dirty amount
        [(3, 7, None), (4, 8, "d")],           # one NULL tag
        [(5, 1, "e"), (6, -1, None)],          # dirty amount AND null tag
    ]
    src = str(tmp_path / "feed")
    os.makedirs(src)
    for i, batch in enumerate(rows):
        d = str(tmp_path / f"c{i}")
        spark.createDataFrame(batch, "id int, amount int, tag string").coalesce(
            1
        ).write.parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0], f"{src}/b{i}.parquet")
        shutil.rmtree(d)
        time.sleep(0.05)

    good, dead = str(tmp_path / "good"), str(tmp_path / "dead")
    q = ingest_gated_stream(
        spark, src, "id int, amount int, tag string", good, dead,
        str(tmp_path / "ck"), {"amount_positive": "amount > 0"}, not_null=["tag"],
    ).start()
    q.processAllAvailable()
    q.stop()

    g = spark.read.parquet(good)
    d = spark.read.parquet(dead)
    assert {r.id for r in g.collect()} == {1, 4, 5}
    bad = {r.id: r._violations for r in d.collect()}
    assert bad[2] == "amount_positive" and bad[3] == "not_null(tag)"
    assert set(bad[6].split(",")) == {"amount_positive", "not_null(tag)"}
    assert g.count() + d.count() == 6  # nothing dropped

    # replay from a FRESH checkpoint (simulated redelivery of every
    # batch): per-batch overwrite keeps the landing byte-stable
    before = sorted(tuple(r) for r in g.collect())
    q2 = ingest_gated_stream(
        spark, src, "id int, amount int, tag string", good, dead,
        str(tmp_path / "ck2"), {"amount_positive": "amount > 0"}, not_null=["tag"],
    ).start()
    q2.processAllAvailable()
    q2.stop()
    after = sorted(tuple(r) for r in spark.read.parquet(good).collect())
    assert after == before
    assert spark.read.parquet(dead).count() == 3
