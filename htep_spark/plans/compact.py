"""Deterministic output compaction — the small-files stage of a long-running
checkpointed pipeline.

``run_with_checkpoint`` (checkpoint.py) writes one output subdir per input
unit, so a 10^12-turn job accumulated over many incremental runs ends up
with thousands of small parquet parts — the classic small-files problem
(every downstream scan pays per-file open/footer costs, and object-store
listings dominate planning). Iceberg solves this with ``rewrite_data_files``;
without a catalog jar in this container, this is the same operation over
plain parquet directories:

- the driver lists FILE METADATA only (names + sizes — never row data),
- parts are greedy-bin-packed in sorted-name order into groups of
  ``target_bytes`` (a group always takes at least one file, so oversized
  parts pass through unsplit),
- each group is rewritten by one ``spark.read.parquet(files...).coalesce(1)``
  job — a 1-task read+write, no shuffle (coalesce over a file-list scan
  just concatenates partitions) — and the single part file is promoted to
  a FLAT ``output_dir/group-NNNNN.parquet``. Flat files (not subdirs) keep
  ``spark.read.parquet(output_dir)`` working unchanged with the input's
  exact schema: ``group=`` subdirs would smuggle in an inferred partition
  column, and non-partition subdirs aren't visited by a root read at all,
- a compaction manifest row per group records the inputs (lineage), so the
  rewrite is auditable and idempotent: re-running replaces each group
  file, and stale ``group-*`` files beyond the new plan are removed
  (a smaller re-plan must not leave duplicate rows behind),
- row counts come from ``observe()`` on the write pass — no second read
  of the just-written output (same discipline as ``checkpoint.py``).

Determinism: same input listing → same groups → same row sets per group
(file order inside a group is the sorted name order the scan uses).
Scale shape: driver work is O(#files) metadata; rewrite cost is one pass
over the data; groups are independent jobs (parallelize with a thread pool
over ``compact_group`` calls when the cluster is large — kept sequential
here for deterministic progress reporting).
"""

from __future__ import annotations

import os
from typing import Dict, List

from pyspark.sql import SparkSession

__all__ = ["plan_groups", "compact_output"]


def plan_groups(input_dir: str, target_bytes: int) -> List[List[str]]:
    """Greedy bin-pack of the directory's parquet parts (recursive, sorted
    by relative path) into groups whose total size stays <= target_bytes
    (single oversized files pass through as their own group)."""
    files: List[tuple] = []
    for root, _dirs, names in os.walk(input_dir):
        for name in sorted(names):
            if name.endswith(".parquet") and not name.startswith("."):
                path = os.path.join(root, name)
                files.append((os.path.relpath(path, input_dir), path))
    files.sort()
    groups: List[List[str]] = []
    cur: List[str] = []
    cur_bytes = 0
    for _rel, path in files:
        size = os.path.getsize(path)
        if cur and cur_bytes + size > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(path)
        cur_bytes += size
    if cur:
        groups.append(cur)
    return groups


def compact_output(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> Dict:
    """Rewrite ``input_dir``'s parquet parts into ~``target_bytes`` flat
    files ``output_dir/group-NNNNN.parquet``. Returns the compaction
    manifest: per-group input files + row counts, plus totals."""
    import shutil

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if os.path.abspath(input_dir) == os.path.abspath(output_dir):
        raise ValueError(
            "in-place compaction is not supported: the input listing would "
            "race the rewrite — compact into a fresh directory and swap"
        )
    groups = plan_groups(input_dir, target_bytes)
    os.makedirs(output_dir, exist_ok=True)
    manifest = []
    total_rows = 0
    for gi, paths in enumerate(groups):
        df = spark.read.parquet(*paths)
        tmp = os.path.join(output_dir, f"_tmp-group-{gi:05d}")
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        n = int(obs.get["n"])
        part = next(
            os.path.join(tmp, f)
            for f in sorted(os.listdir(tmp))
            if f.endswith(".parquet") and not f.startswith(".")
        )
        os.replace(part, os.path.join(output_dir, f"group-{gi:05d}.parquet"))
        shutil.rmtree(tmp)
        total_rows += n
        manifest.append(
            {
                "group": gi,
                "inputs": [os.path.relpath(p, input_dir) for p in paths],
                "n_files_in": len(paths),
                "n_rows": n,
            }
        )
    # a re-plan with fewer groups must not leave prior groups behind —
    # stale files would silently duplicate rows in the compacted dataset
    wanted = {f"group-{gi:05d}.parquet" for gi in range(len(groups))}
    for name in sorted(os.listdir(output_dir)):
        path = os.path.join(output_dir, name)
        if name.startswith("group-") and name not in wanted:
            os.remove(path)
        elif name.startswith("_tmp-group-"):
            shutil.rmtree(path, ignore_errors=True)
    return {
        "n_groups": len(groups),
        "n_files_in": sum(len(g) for g in groups),
        "n_rows": total_rows,
        "groups": manifest,
    }
