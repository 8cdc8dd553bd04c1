"""Snapshot-versioned parquet tables: time travel, rollback, upsert.

The reference has no UPDATE/DELETE at all (README.md:51 TODO) and the
facade's rewrites swap temp views — interactive parity only. This module
is the production shape for mutating plain-parquet data at scale, the
same immutable-snapshot model Delta/Iceberg formalize:

* every mutation writes a NEW complete snapshot directory
  (`_v00000001/…`) and never touches prior ones — readers are isolated
  from writers for free;
* commit = the atomic appearance of the snapshot's `_SUCCESS` marker
  (written last); a crashed writer leaves an uncommitted directory that
  readers skip and `vacuum` removes;
* time travel = read an older snapshot; rollback = write the old
  snapshot's content as a new version (history stays linear).

At 100 TB a full-snapshot copy per mutation is the right baseline for
small dimension tables; fact tables would layer partition-scoped
snapshots (only rewritten partitions advance) — same commit protocol.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"^_v(\d{8})$")


class VersionedTable:
    """A directory of immutable parquet snapshots with atomic commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- commit log ------------------------------------------------------

    def versions(self) -> list[int]:
        """Committed versions, ascending (uncommitted dirs are invisible)."""
        out = []
        for name in os.listdir(self.path):
            m = _VERSION_RE.match(name)
            if m and os.path.exists(os.path.join(self.path, name, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"_v{version:08d}")

    # -- write side ------------------------------------------------------

    def write(self, df: DataFrame) -> int:
        """Commit `df` as the next snapshot; returns its version number.
        The parquet job writes _SUCCESS last, so a crash mid-write leaves
        an invisible (uncommitted) directory, never a torn table."""
        next_v = (self.latest_version() or 0) + 1
        df.write.mode("errorifexists").parquet(self._vdir(next_v))
        return next_v

    def upsert(self, updates: DataFrame, key: str) -> int:
        """MERGE-style upsert as a snapshot: surviving old rows UNION
        updated/new rows -> next version. Matches standard MERGE (key
        NULLs never match)."""
        current = self.read()
        survivors = current.join(updates.select(key), key, "left_anti")
        return self.write(survivors.unionByName(updates))

    def delete_where(self, condition) -> int:
        """DELETE as a snapshot: only rows where the predicate is not
        TRUE survive (standard SQL DELETE semantics)."""
        current = self.read()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return self.write(current.filter(~cond.eqNullSafe(True)))

    def rollback(self, version: int) -> int:
        """Restore an old snapshot's content as a NEW version (history
        stays append-only; nothing is rewritten in place)."""
        return self.write(self.read(version))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest `keep_last` committed snapshots plus
        any uncommitted (crashed) directories. Returns removed versions."""
        import shutil

        committed = self.versions()
        removed = committed[:-keep_last] if keep_last else committed
        for v in removed:
            shutil.rmtree(self._vdir(v))
        for name in os.listdir(self.path):
            m = _VERSION_RE.match(name)
            if m and not os.path.exists(os.path.join(self.path, name, "_SUCCESS")):
                shutil.rmtree(os.path.join(self.path, name))
        return removed

    # -- read side -------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to `version`."""
        v = version if version is not None else self.latest_version()
        if v is None or v not in self.versions():
            raise ValueError(f"no committed version {version!r} at {self.path}")
        return self.spark.read.parquet(self._vdir(v))
