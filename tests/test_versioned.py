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


def test_vacuum_rejects_empty_retention(spark, sf_dir, tmp_path):
    """vacuum(keep_last=0) would compute an empty keep set and delete the
    entire table — both backends must refuse it outright."""
    import pytest

    from oxidsql_spark.versioned import PartitionedVersionedTable

    vt = VersionedTable(spark, str(tmp_path / "guard_vt"))
    vt.write(table(spark, sf_dir, "region"))
    with pytest.raises(ValueError):
        vt.vacuum(keep_last=0)
    assert vt.versions() == [1]  # nothing was deleted

    pvt = PartitionedVersionedTable(spark, str(tmp_path / "guard_pvt"), "n_regionkey")
    pvt.write_full(table(spark, sf_dir, "nation"))
    with pytest.raises(ValueError):
        pvt.vacuum(keep_last=0)
    assert pvt.read().count() == 25


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


def test_partitioned_read_prunes_to_named_partitions(spark, sf_dir, tmp_path):
    from oxidsql_spark.versioned import PartitionedVersionedTable

    pvt = PartitionedVersionedTable(spark, str(tmp_path / "po"), "o_orderpriority")
    orders = table(spark, sf_dir, "orders")
    pvt.write_full(orders)
    one = pvt.read_partitions(["1-URGENT"])
    assert one.count() == orders.filter("o_orderpriority = '1-URGENT'").count()
    assert {r.o_orderpriority for r in one.select("o_orderpriority").distinct().collect()} == {"1-URGENT"}
    assert pvt.read_partitions(["no-such"]).count() == 0


def test_streaming_foreachbatch_upserts_versioned_table(spark, sf_dir, tmp_path):
    """Production streaming sink shape: each micro-batch MERGEs into a
    versioned table via foreachBatch — the final state equals the batch
    per-user rollup, and every micro-batch left a committed, readable
    version behind it (reader isolation during the stream)."""
    import shutil

    from pyspark.sql import functions as F

    from oxidsql_spark.streaming.events import _stream_source
    from oxidsql_spark.versioned import VersionedTable

    stream_dir = str(tmp_path / "ev_stream")
    os.makedirs(stream_dir)
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir + "/part-0.parquet")

    vt = VersionedTable(spark, str(tmp_path / "user_totals"))
    vt.write(spark.createDataFrame([], "user_id long, n_events long"))

    stream = _stream_source(spark, stream_dir, watermark=False)

    def upsert_batch(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
        prev = vt.read().withColumnRenamed("n_events", "prev_n")
        merged = (
            agg.join(prev, "user_id", "full")
            .select(
                "user_id",
                (F.coalesce("n_events", F.lit(0)) + F.coalesce("prev_n", F.lit(0))).alias("n_events"),
            )
        )
        vt.upsert(merged, "user_id")

    q = stream.writeStream.foreachBatch(upsert_batch).outputMode("update").start()
    q.processAllAvailable()
    q.stop()

    got = {r.user_id: r.n_events for r in vt.read().collect()}
    want = {
        r.user_id: r.n
        for r in table(spark, sf_dir, "events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert len(vt.versions()) >= 2  # every batch committed a version


def test_partitioned_null_partition_routed_not_dropped(spark, tmp_path):
    """Rows with a NULL partition value land in the Hive default-
    partition bucket; the old string-equality filter silently lost them
    from every snapshot."""
    from pyspark.sql import functions as F

    from oxidsql_spark.versioned import NULL_PARTITION, PartitionedVersionedTable

    pvt = PartitionedVersionedTable(spark, str(tmp_path / "np"), "day")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)], "id int, day string"
    )
    pvt.write_full(df)
    assert pvt.read().count() == 4
    assert {r.id for r in pvt.read().filter(F.col("day").isNull()).collect()} == {2, 4}

    up = spark.createDataFrame([(2, None), (5, None)], "id int, day string")
    pvt.upsert(up, "id")
    assert pvt.read().count() == 5
    assert {r.id for r in pvt.read_partitions([NULL_PARTITION]).collect()} == {2, 4, 5}


def test_write_full_is_one_write_job(spark, sf_dir, tmp_path):
    """write_full must be a single partitionBy pass — N partition values
    may NOT cost N filtered scans of the input."""
    from oxidsql_spark.versioned import PartitionedVersionedTable

    sc = spark.sparkContext
    pvt = PartitionedVersionedTable(spark, str(tmp_path / "sp"), "o_orderpriority")
    orders = table(spark, sf_dir, "orders")  # 5 distinct priorities
    sc.setJobGroup("write_full_one_pass", "single-pass check")
    v = pvt.write_full(orders)
    sc.setJobGroup("write_full_done", "")
    jobs = sc.statusTracker().getJobIdsForGroup("write_full_one_pass")
    assert len(jobs) < 5, f"write_full ran {len(jobs)} jobs for 5 partitions"
    assert _rows(pvt.read(v)) == _rows(orders)


def test_partitioned_vacuum_reclaims_unreferenced_generations(spark, tmp_path):
    """PVT vacuum drops manifests outside the retention window and every
    generation dir no surviving manifest references; reads within the
    window keep working."""
    import os

    from pyspark.sql import functions as F

    from oxidsql_spark.versioned import PartitionedVersionedTable

    pvt = PartitionedVersionedTable(spark, str(tmp_path / "pv"), "p")
    mk = lambda rows: spark.createDataFrame(rows, "k long, p string, v long")  # noqa: E731
    pvt.write_full(mk([(1, "a", 1), (2, "b", 2)]))
    for i in range(3):  # 3 upserts touching partition a -> 3 generations of a
        pvt.upsert(mk([(1, "a", 10 + i)]), "k")
    assert len(pvt.versions()) == 4

    def gen_count():
        root = str(tmp_path / "pv" / "_data")
        return sum(len(os.listdir(os.path.join(root, d))) for d in os.listdir(root))

    before = gen_count()
    removed = pvt.vacuum(keep_last=2)
    assert removed and gen_count() == before - len(removed)
    assert pvt.versions() == [3, 4]
    # both retained versions still fully readable
    assert {r.v for r in pvt.read(4).filter(F.col("k") == 1).collect()} == {12}
    assert {r.v for r in pvt.read(3).filter(F.col("k") == 1).collect()} == {11}
    # partition b's single generation survived (referenced by both)
    assert {r.v for r in pvt.read_partitions(["b"]).collect()} == {2}


def test_schema_evolution_across_snapshots(spark, tmp_path):
    """Snapshots are self-contained: a later version may add a column;
    time travel reads each version with ITS schema (the property file
    formats get from immutable snapshot dirs)."""
    from oxidsql_spark.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "evo"))
    vt.write(spark.createDataFrame([(1, "a")], "k long, v string"))
    vt.write(spark.createDataFrame([(1, "a", 9.5)], "k long, v string, score double"))
    assert vt.read(1).columns == ["k", "v"]
    assert vt.read(2).columns == ["k", "v", "score"]
    assert vt.read().collect()[0].score == 9.5


def test_partitioned_torn_manifest_invisible(spark, tmp_path):
    """A crashed manifest write (leftover .tmp) must not surface as a
    version, corrupt reads, or block the next commit."""
    from oxidsql_spark.versioned import PartitionedVersionedTable

    pvt = PartitionedVersionedTable(spark, str(tmp_path / "torn"), "p")
    pvt.write_full(spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string"))
    # simulate a torn commit
    with open(str(tmp_path / "torn" / "_manifests" / ".m00000002.tmp"), "w") as fh:
        fh.write('{"partial":')
    assert pvt.versions() == [1]
    assert pvt.read().count() == 2
    v2 = pvt.upsert(spark.createDataFrame([(3, "a")], "k long, p string"), "k")
    assert v2 == 2 and pvt.read().count() == 3


def test_write_retries_over_uncommitted_debris(spark, tmp_path):
    """A crash mid-write leaves an uncommitted version dir; the RETRY
    of that write (e.g. a replayed streaming refresh) must clear the
    debris and commit, not die on errorifexists forever."""
    import os

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.createDataFrame([(1,)], "x int"))
    # simulate the crashed attempt at version 2: dir exists, no _SUCCESS
    debris = vt._vdir(2)
    os.makedirs(debris)
    with open(os.path.join(debris, "part-junk.parquet"), "w") as fh:
        fh.write("torn")
    assert vt.latest_version() == 1  # invisible, as designed
    v = vt.write(spark.createDataFrame([(2,)], "x int"))  # the retry
    assert v == 2 and vt.latest_version() == 2
    assert {r.x for r in vt.read().collect()} == {2}


def test_partitioned_upsert_retries_over_stage_and_gdir_debris(spark, tmp_path):
    """PartitionedVersionedTable.upsert after a crash that left the
    stage dir and a partial generation dir behind: the retry clears
    both (the manifest is the commit point — neither is referenced)
    and commits the same content a first attempt would."""
    import os

    from oxidsql_spark.versioned import PartitionedVersionedTable

    pt = PartitionedVersionedTable(spark, str(tmp_path / "p"), "k")
    pt.write_full(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
    # crashed attempt at version 2: stale stage + partial g-dir
    stage = os.path.join(pt.path, "_data", ".stage_v00000002")
    os.makedirs(stage)
    with open(os.path.join(stage, "leftover"), "w") as fh:
        fh.write("x")
    partial = os.path.join(pt.path, "_data", "k=1", "g00000002")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-torn.parquet"), "w") as fh:
        fh.write("torn")

    v = pt.upsert(
        spark.createDataFrame([(1, 11)], "k int, v int"), "k",
        partition_from_key=False,
    )
    assert v == 2
    got = {(r.k, r.v) for r in pt.read().collect()}
    assert got == {(1, 11), (2, 20)}
