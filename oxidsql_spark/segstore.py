"""Shared segment machinery for the rolling-index stores.

Four stores keep a growing index as ``_SUCCESS``-fenced parquet
segments, one per admitted batch (``SpanIndexStore`` grams,
``AudioIndexStore`` shingles, ``ImageBandIndexStore`` band rows,
``VideoKeyframeIndexStore`` keyframe sets).  Two costs accumulate at
streaming steady state:

  * FILE COUNT — every probe unions hundreds of micro-batch segments,
    paying a task launch + footer read per tiny file (the
    ``sinks.compact`` rationale);
  * CAP DRIFT — the hub df-caps are enforced per segment at commit
    time, so a value under the cap in each segment can accumulate
    unbounded df ACROSS segments (silence shingles, black keyframes),
    inflating probe fan-out (r13 VERDICT Next #3).

``compact_segments`` fixes both in one pass: merge every live segment,
re-apply the store's GLOBAL cap rule via its ``recap`` callback, and
write one ``cmp_<n>`` dir sized to ~128 MB files.

Crash safety is a pointer protocol, not renames: ``_COMPACTED`` (a
JSON file replaced atomically) names the ``active`` compacted dir and
the ``retired`` inputs.  ``list_segments`` honors it:

  * crash BEFORE the pointer lands — the cmp dir is invisible (only
    the pointer can activate it); the old segments still serve;
  * crash AFTER the pointer, before the lazy deletes — retired dirs
    are excluded by the pointer and removed on the next compaction.

QUIESCENCE CONTRACT: compaction must run while the stream is stopped
and every batch's segment is committed.  ``probe_admit`` excludes the
probing tag's own segment to make replays deterministic; once that
segment is folded into a cmp dir the exclusion is vacuous, so a replay
of an OLD batch would see its own rows in the corpus side.  Streaming
checkpoints never re-deliver committed batches, so the steady-state
maintenance pattern (stop stream -> compact -> restart) upholds the
contract by construction — the same window any index rebuild needs.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_COMPACTED"
_TARGET_FILE_MB = 128


def _read_pointer(path: str) -> dict | None:
    p = os.path.join(path, _POINTER)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except ValueError:
        return None  # torn write of the tmp-replace never happens; belt
    except OSError:
        return None


def list_segments(path: str) -> list[str]:
    """Every live segment dir: the pointer's active cmp dir (if any)
    plus all committed ``seg_*`` dirs the pointer hasn't retired."""
    if not os.path.isdir(path):
        return []
    ptr = _read_pointer(path)
    retired = set(ptr.get("retired", [])) if ptr else set()
    out: list[str] = []
    if ptr and ptr.get("active"):
        d = os.path.join(path, ptr["active"])
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append(d)
    for n in sorted(os.listdir(path)):
        if (
            n.startswith("seg_")
            and n not in retired
            and os.path.exists(os.path.join(path, n, "_SUCCESS"))
        ):
            out.append(os.path.join(path, n))
    return out


def _dir_bytes(paths: list[str]) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for p in paths
        for r, _, fs in os.walk(p)
        for f in fs
    )


def compact_segments(
    spark: SparkSession,
    path: str,
    recap: Callable[[DataFrame], DataFrame],
    target_file_mb: int = _TARGET_FILE_MB,
) -> int:
    """Merge all live segments through ``recap`` (the store's GLOBAL
    cap rule — identity for uncapped stores) into one cmp dir, commit
    it by atomically replacing the ``_COMPACTED`` pointer, then lazily
    delete the retired inputs.  Returns the number of segments folded
    (0 = nothing to do).  See the module docstring for the crash-safety
    and quiescence contracts."""
    import math

    segs = list_segments(path)
    if len(segs) <= 1:
        return 0
    merged = recap(spark.read.parquet(*segs))
    n_files = max(1, math.ceil(_dir_bytes(segs) / (target_file_mb << 20)))
    existing = [
        int(n.split("_", 1)[1])
        for n in os.listdir(path)
        if n.startswith("cmp_") and n.split("_", 1)[1].isdigit()
    ]
    cname = f"cmp_{(max(existing) if existing else 0) + 1:08d}"
    merged.repartition(n_files).write.mode("overwrite").parquet(
        os.path.join(path, cname)
    )
    old = _read_pointer(path) or {}
    retired = sorted(
        set(old.get("retired", [])) | {os.path.basename(s) for s in segs}
    )
    tmp = os.path.join(path, _POINTER + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"active": cname, "retired": retired}, fh)
    os.replace(tmp, os.path.join(path, _POINTER))
    for n in retired:
        shutil.rmtree(os.path.join(path, n), ignore_errors=True)
    return len(segs)
