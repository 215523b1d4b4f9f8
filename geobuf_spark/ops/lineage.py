"""Partition-level lineage + metrics + checkpoint/resume.

Replaces the reference's ad-hoc progress logging (LoggingInitialMap,
split_combine.go:400-415) and per-feature stats CSV (metadata/meta.go:54-120)
with queryable tables, and its implicit "rerun the file" recovery with
snapshot-style resume:

- every job run writes `_metrics` rows (one per stage: rows in/out, wall
  seconds) and `_lineage` rows (one per output partition: partition values,
  row count, content fingerprint);
- job output is committed atomically: write to `<path>/.staging-<run_id>`
  then rename into place and append a manifest entry; a rerun with the same
  run_id short-circuits (idempotent), a rerun after a crash resumes from
  the last committed manifest entry.

On a real deployment these tables are Iceberg (snapshot ids give resume
for free); this layer keeps identical semantics on plain parquet +
manifest JSON so the sandbox tests exercise the real control flow.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"

_RUN_ID_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]{0,127}")


def _check_run_id(run_id: str) -> str:
    """run_id is interpolated into filesystem paths (.staging-<id>,
    data-<id>); reject separators / traversal ('..' alone can't start a
    match, but 'a/../..' could escape the table dir and rmtree outside it)."""
    if not isinstance(run_id, str) or not _RUN_ID_RE.fullmatch(run_id) \
            or ".." in run_id:
        raise ValueError(
            f"run_id {run_id!r} is not a safe slug (want "
            "[A-Za-z0-9][A-Za-z0-9._-]*, max 128 chars, no '..')")
    return run_id


class JobContext:
    """Tracks stage metrics for one job run and persists them."""

    def __init__(self, spark: SparkSession, base_path: str, job: str, run_id: str | None = None):
        self.spark = spark
        self.base = base_path
        self.job = job
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self._metrics: list[dict] = []

    def stage(self, name: str):
        ctx = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def set_counts(self, rows_in: int | None = None, rows_out: int | None = None):
                self.rows_in, self.rows_out = rows_in, rows_out
                return self

            def __exit__(self, *exc):
                ctx._metrics.append({
                    "job": ctx.job, "run_id": ctx.run_id, "stage": name,
                    "wall_sec": time.time() - self.t0,
                    "rows_in": getattr(self, "rows_in", None),
                    "rows_out": getattr(self, "rows_out", None),
                    "ts": time.time(),
                })

        return _Timer()

    def flush_metrics(self):
        if not self._metrics:
            return
        df = self.spark.createDataFrame(
            [(m["job"], m["run_id"], m["stage"], float(m["wall_sec"]),
              m["rows_in"], m["rows_out"], float(m["ts"])) for m in self._metrics],
            "job string, run_id string, stage string, wall_sec double, "
            "rows_in bigint, rows_out bigint, ts double",
        )
        df.write.mode("append").parquet(os.path.join(self.base, "_metrics"))
        self._metrics = []


def partition_lineage(df: DataFrame, partition_cols: list[str], key_col: str) -> DataFrame:
    """One row per output partition: values, count, order-insensitive
    content fingerprint (xor of row hashes — mergeable, deterministic)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn("_h", h).groupBy(*partition_cols).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(_h)").alias("content_xor"),  # order-insensitive, no overflow
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    )


def read_manifest(path: str) -> list[dict]:
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        return []
    with open(mf) as f:
        lines = [l for l in f if l.strip()]
    out = []
    for i, line in enumerate(lines):
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                # torn trailing line from a crash mid-append: by definition
                # uncommitted — skip so recovery itself is crash-safe
                continue
            raise
    return out


def committed_runs(path: str) -> set[str]:
    return {e["run_id"] for e in read_manifest(path) if e.get("status") == "committed"}


def commit_output(df: DataFrame, path: str, run_id: str, partition_cols: list[str] | None = None,
                  lineage_key: str | None = None) -> dict:
    """Atomic, idempotent, resumable write.

    1. if run_id already committed → no-op (resume-after-success);
    2. write to a staging dir (crash leaves only staging garbage);
    3. record per-partition lineage;
    4. rename staging → final, append manifest entry (the commit point).
    """
    _check_run_id(run_id)
    os.makedirs(path, exist_ok=True)
    if run_id in committed_runs(path):
        return {"status": "already_committed", "run_id": run_id}

    staging = os.path.join(path, f".staging-{run_id}")
    final = os.path.join(path, "data")
    if os.path.exists(staging):
        shutil.rmtree(staging)  # crash leftovers from a previous attempt

    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    lineage_rows = 0
    if partition_cols and lineage_key:
        # lineage from the WRITTEN staging files, not the live plan: a
        # nondeterministic df (rand salts, timestamps) would otherwise
        # fingerprint different rows than the committed output — and this
        # avoids recomputing the whole pipeline twice more
        spark = df.sparkSession
        lin = partition_lineage(spark.read.parquet(staging), partition_cols, lineage_key)
        # per-run directory, overwritten: a crash between this write and the
        # manifest append cannot leave duplicate lineage generations — the
        # rerun replaces its own rows (append would stack them)
        lin.write.mode("overwrite").parquet(
            os.path.join(path, "_lineage", f"run_id={run_id}")
        )
        lineage_rows = lin.count()

    # never destroy the only copy: move the old output aside, swap the new
    # one in, THEN drop the old — a crash at any point leaves data either
    # at `final` or at the trash path, recoverable by a rerun
    trash = os.path.join(path, f".old-{run_id}")
    if os.path.exists(trash):
        shutil.rmtree(trash)
    if os.path.exists(final):
        os.rename(final, trash)
    os.rename(staging, final)
    shutil.rmtree(trash, ignore_errors=True)
    entry = {
        "run_id": run_id, "status": "committed", "ts": time.time(),
        "partitions": lineage_rows,
    }
    with open(os.path.join(path, MANIFEST), "a") as f:
        f.write(json.dumps(entry) + "\n")
    return entry


def next_increment(df: DataFrame, state_dir: str, order_col: str, n: int,
                   tag: str = "purple") -> DataFrame:
    """Increment parity (increment.go:9-32): take the NEXT n rows in
    `order_col` order, tag COLORKEY, persist the cursor — successive calls
    page through the dataset; a restart resumes at the committed cursor.

    The cursor is a plain JSON checkpoint (`<state_dir>/_cursor.json`),
    the batch analog of the reference's in-process FeatureCount cursor —
    keyset pagination (WHERE key > cursor ORDER BY key LIMIT n), which at
    10^12 rows beats OFFSET by never re-scanning consumed prefixes once
    the predicate prunes on the sort key.

    `order_col` must be UNIQUE (keyset pagination; ties crossing a page
    boundary are detected and rejected, because rows sharing the boundary
    value would be skipped forever). Delivery is at-most-once: the cursor
    advances when the page is read — pair with idempotent downstream
    writes."""
    cur_path = os.path.join(state_dir, "_cursor.json")
    os.makedirs(state_dir, exist_ok=True)
    cursor = None
    if os.path.exists(cur_path):
        with open(cur_path) as f:
            cursor = json.load(f).get("last")
    page = df
    if cursor is not None:
        page = page.filter(F.col(order_col) > F.lit(cursor))
    page = page.orderBy(order_col).limit(n) \
        .withColumn("COLORKEY", F.lit(tag))
    rows = page.collect()
    if len(rows) == n:
        # boundary-tie check: more rows with the boundary value than this
        # page emitted would be silently skipped by `> cursor` forever
        last_val = rows[-1][order_col]
        emitted = sum(1 for r in rows if r[order_col] == last_val)
        total = df.filter(F.col(order_col) == F.lit(last_val)).count()
        if total > emitted:
            raise ValueError(
                f"order_col {order_col!r} is not unique at the page "
                f"boundary (value {last_val!r}: {total} rows, page holds "
                f"{emitted}) — keyset pagination needs a unique key")
    if rows:
        with open(cur_path, "w") as f:
            json.dump({"last": rows[-1][order_col], "n_seen_batch": len(rows),
                       "ts": time.time()}, f)
    spark = df.sparkSession
    return spark.createDataFrame(rows, page.schema) if rows else \
        spark.createDataFrame([], page.schema)


# ---------------------------------------------------------------------------
# Versioned snapshots — the Iceberg table model on the same manifest
# (BASELINE.json north rule: lineage persists "to Iceberg"; the sandbox has
# no iceberg jars, so the semantics — immutable snapshot data, a manifest of
# committed snapshot ids, time-travel reads, snapshot expiry — live on
# parquet + the JSONL manifest. Swapping to real Iceberg is a table-format
# change only: commit_snapshot ≙ append/overwrite commit, read_snapshot ≙
# VERSION AS OF, expire_snapshots ≙ expireSnapshots.)
# ---------------------------------------------------------------------------

def commit_snapshot(df: DataFrame, path: str, run_id: str,
                    partition_cols: list[str] | None = None) -> dict:
    """Immutable snapshot commit: data lands in `data-<run_id>` (never
    rewritten), the manifest append is the commit point, and EVERY prior
    committed snapshot stays readable (contrast commit_output, which keeps
    only the latest). Idempotent per run_id; crash-safe the same way."""
    _check_run_id(run_id)
    os.makedirs(path, exist_ok=True)
    if run_id in committed_runs(path):
        # distinguish live from expired, and both from a run_id that a
        # plain commit_output used on this path (its manifest entry has no
        # kind="snapshot" — calling that "expired" would mislead)
        if any(e["run_id"] == run_id for e in snapshots(path)):
            return {"status": "already_committed", "run_id": run_id}
        if any(e.get("kind") == "snapshot" and e["run_id"] == run_id
               for e in read_manifest(path)):
            raise ValueError(
                f"snapshot {run_id!r} was committed and then expired; "
                "run ids are immutable — pick a new one")
        raise ValueError(
            f"run_id {run_id!r} was already used by a non-snapshot commit "
            "on this path — pick a new one")

    staging = os.path.join(path, f".staging-{run_id}")
    final = os.path.join(path, f"data-{run_id}")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(final):
        shutil.rmtree(final)  # uncommitted leftover (no manifest entry)

    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    os.rename(staging, final)
    entry = {"run_id": run_id, "status": "committed", "ts": time.time(),
             "dir": f"data-{run_id}", "kind": "snapshot"}
    with open(os.path.join(path, MANIFEST), "a") as f:
        f.write(json.dumps(entry) + "\n")
    return entry


def snapshots(path: str) -> list[dict]:
    """Committed, unexpired snapshot entries in commit order."""
    expired = {e["run_id"] for e in read_manifest(path)
               if e.get("kind") == "expire"}
    return [e for e in read_manifest(path)
            if e.get("kind") == "snapshot" and e.get("status") == "committed"
            and e["run_id"] not in expired]


def current_snapshot_id(path: str) -> str | None:
    """The snapshot a bare `read_snapshot(path)` resolves to: the last
    manifest event wins — a snapshot commit moves the pointer forward, a
    rollback moves it to its target (Iceberg current-snapshot-id parity).
    None when no live snapshot exists."""
    expired = {e["run_id"] for e in read_manifest(path)
               if e.get("kind") == "expire"}
    cur = None
    for e in read_manifest(path):
        if e.get("kind") == "snapshot" and e.get("status") == "committed":
            cur = e["run_id"]
        elif e.get("kind") == "rollback":
            cur = e["target"]
    return None if cur is None or cur in expired else cur


def rollback_to_snapshot(path: str, run_id: str) -> dict:
    """Iceberg `rollback_to_snapshot` parity: point the table's CURRENT
    snapshot back at an older committed one. Pure manifest append — no
    data moves, every other snapshot stays readable by explicit id, and
    a later commit simply moves the pointer forward again."""
    _check_run_id(run_id)
    if not any(e["run_id"] == run_id for e in snapshots(path)):
        raise ValueError(f"snapshot {run_id!r} not committed (or expired); "
                         "cannot roll back to it")
    entry = {"kind": "rollback", "target": run_id, "ts": time.time()}
    with open(os.path.join(path, MANIFEST), "a") as f:
        f.write(json.dumps(entry) + "\n")
    return entry


def read_snapshot(spark, path: str, run_id: str | None = None) -> DataFrame:
    """Time-travel read: the named committed snapshot, or the CURRENT one
    (the latest commit unless a rollback re-pointed it). Iceberg
    `VERSION AS OF` parity on the manifest."""
    snaps = snapshots(path)
    if not snaps:
        raise ValueError(f"no committed snapshots under {path}")
    if run_id is None:
        run_id = current_snapshot_id(path)
    match = [e for e in snaps if e["run_id"] == run_id]
    if not match:
        raise ValueError(f"snapshot {run_id!r} not committed (or expired)")
    entry = match[0]
    return spark.read.parquet(os.path.join(path, entry["dir"]))


def expire_snapshots(path: str, keep_last: int = 1) -> list[str]:
    """Expire all but the newest `keep_last` snapshots: manifest records
    the expiry FIRST (so a crash mid-delete never leaves a readable entry
    pointing at vanished data), then the data dirs are dropped. The
    CURRENT snapshot (which a rollback may have re-pointed at an old id)
    is never expired."""
    snaps = snapshots(path)
    victims = snaps[:-keep_last] if keep_last > 0 else snaps
    cur = current_snapshot_id(path)
    victims = [e for e in victims if e["run_id"] != cur]
    with open(os.path.join(path, MANIFEST), "a") as f:
        for e in victims:
            f.write(json.dumps({"run_id": e["run_id"], "kind": "expire",
                                "ts": time.time()}) + "\n")
    for e in victims:
        shutil.rmtree(os.path.join(path, e["dir"]), ignore_errors=True)
    return [e["run_id"] for e in victims]
