"""Snapshot-versioned tables: time travel, upsert, delete, rollback,
vacuum, and crash isolation (uncommitted snapshots are invisible)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oxidsql_spark.sources import table
from oxidsql_spark.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_versioned_lifecycle(spark, sf_dir, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "nation_vt"))
    nation = table(spark, sf_dir, "nation")

    v1 = vt.write(nation)
    assert v1 == 1 and vt.versions() == [1]
    assert _rows(vt.read()) == _rows(nation)

    # upsert: rename one nation + add a new one
    updates = spark.createDataFrame(
        [(0, "RENAMED_0", 0), (99, "NEW_99", 4)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    v2 = vt.upsert(updates, "n_nationkey")
    assert v2 == 2
    latest = {r.n_nationkey: r.n_name for r in vt.read().collect()}
    assert latest[0] == "RENAMED_0" and latest[99] == "NEW_99" and len(latest) == 26

    # time travel: v1 is untouched
    assert _rows(vt.read(1)) == _rows(nation)

    # delete
    v3 = vt.delete_where(F.col("n_nationkey") >= 90)
    assert vt.read(v3).count() == 25

    # rollback to v1 → new version with v1's content
    v4 = vt.rollback(1)
    assert v4 == 4 and _rows(vt.read()) == _rows(nation)

    # vacuum keeps the tail only
    removed = vt.vacuum(keep_last=2)
    assert removed == [1, 2] and vt.versions() == [3, 4]
    assert _rows(vt.read()) == _rows(nation)  # latest still readable


def test_uncommitted_snapshot_invisible(spark, sf_dir, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "crash_vt"))
    vt.write(table(spark, sf_dir, "region"))
    # simulate a crashed writer: directory exists, no _SUCCESS marker
    crashed = os.path.join(vt.path, "_v00000002")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-junk.parquet"), "wb") as f:
        f.write(b"torn write")
    assert vt.versions() == [1]
    assert vt.read().count() == 5  # reads v1, never the torn dir
    vt.vacuum(keep_last=5)
    assert not os.path.exists(crashed)  # vacuum clears the debris
    assert vt.write(table(spark, sf_dir, "region")) == 2


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    import glob

    from oxidsql_spark.versioned import PartitionedVersionedTable

    pvt = PartitionedVersionedTable(
        spark, str(tmp_path / "orders_pvt"), "o_orderpriority"
    )
    orders = table(spark, sf_dir, "orders")
    v1 = pvt.write_full(orders)
    assert v1 == 1
    assert _rows(pvt.read()) == _rows(orders)

    # upsert rows in ONE priority partition
    sample = [r for r in orders.filter("o_orderpriority = '1-URGENT'").limit(2).collect()]
    updates = spark.createDataFrame(
        [(r.o_orderkey, r.o_custkey, "X", 0.0, r.o_orderdate, "1-URGENT") for r in sample],
        orders.schema,
    )
    dirs_before = set(glob.glob(str(tmp_path / "orders_pvt" / "_data" / "*" / "g*")))
    v2 = pvt.upsert(updates, "o_orderkey")
    dirs_after = set(glob.glob(str(tmp_path / "orders_pvt" / "_data" / "*" / "g*")))

    new_dirs = dirs_after - dirs_before
    assert len(new_dirs) == 1  # only the 1-URGENT partition advanced
    assert "o_orderpriority=1-URGENT" in next(iter(new_dirs))

    # semantics: latest == full-rewrite MERGE; v1 untouched
    got = {r.o_orderkey: r.o_orderstatus for r in pvt.read().collect()}
    for r in sample:
        assert got[r.o_orderkey] == "X"
    assert pvt.read().count() == orders.count()
    assert _rows(pvt.read(1)) == _rows(orders)
