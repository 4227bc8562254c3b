"""Manifest-transactional Parquet table: MVCC by atomic manifest swap.

Composes the r7 manifest-consistent reader (queries/llmprep.py:336) with
the keyed upsert sink (sinks/upsert.py:49) so the reference's Q4/Q5 merge
path (src/kinesis3/db.clj:113-134 flush-events!) gets torn-read immunity
without Delta/Iceberg (neither importable in this environment; this is
the poor-man's transaction log an immutable-file layout affords):

  * Data files are IMMUTABLE: every commit writes into a fresh
    ``snap-<epoch>/`` directory and never touches a file a reader might
    hold open. There is no read-then-overwrite window, so the merge needs
    no localCheckpoint lineage cut (contrast upsert_parquet, which
    rewrites in place).
  * The table's visible state is exactly the file list in
    ``_MANIFEST.json``. Commit = write files → fsync → ``os.replace`` the
    manifest (atomic on POSIX). A reader that goes through the manifest
    sees the pre-commit snapshot or the post-commit snapshot, never a
    torn mix; a crash mid-commit leaves unreferenced garbage files and a
    fully intact previous snapshot.
  * Write amplification is bounded by HASH-BUCKET pruning, the same idea
    as upsert_parquet's partition pruning but keyed: the table is laid
    out in ``n_buckets`` portable-hash buckets of the merge key, a batch
    touches only the buckets its keys hash into, and a commit rewrites
    those buckets while CARRYING FORWARD the untouched buckets' file
    references unchanged in the new manifest. At 100 TB a micro-batch
    merge costs O(touched buckets), not O(table) — the Delta MERGE
    file-rewrite shape, expressed with a JSON manifest.

Single-writer contract: commits are serialized by the caller (foreachBatch
runs micro-batches sequentially; that is the writer lock). Multi-writer
optimistic concurrency is exactly what the Delta/Iceberg upgrade adds.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import portable_hash60
from .upsert import _dedup_last

MANIFEST = "_MANIFEST.json"
_BUCKET_COL = "__bucket"


def _manifest_path(path: str, epoch: int | None = None) -> str:
    if epoch is None:
        return os.path.join(path, MANIFEST)
    return os.path.join(path, f"_MANIFEST.v{epoch:06d}.json")


def read_manifest(path: str, epoch: int | None = None) -> dict | None:
    """The committed snapshot descriptor, or None for a not-yet-created
    table. ``{"epoch": int, "n_buckets": int, "files":
    [{"path": rel, "bucket": int}, ...]}``. ``epoch`` reads a RETAINED
    historical version (time travel — Delta's ``versionAsOf``): every
    commit also files an immutable ``_MANIFEST.v<epoch>.json`` copy;
    raises ValueError for an epoch vacuum has reaped, and for an epoch
    ABOVE the current pointer — a crash between the version-copy and the
    atomic swap can leave an uncommitted ``v<epoch+1>`` file behind, and
    the current manifest, not that residue, is the source of truth."""
    if epoch is not None:
        cur = read_manifest(path)
        if cur is None or epoch > cur["epoch"]:
            raise ValueError(
                f"epoch {epoch} is not committed for table {path}"
            )
    try:
        with open(_manifest_path(path, epoch)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        if epoch is not None:
            raise ValueError(
                f"epoch {epoch} is not retained (vacuumed) for table "
                f"{path}"
            ) from None
        return None


def _bucket_expr(key: str, n_buckets: int):
    # NULL merge keys are a legal (single) key value for the window-based
    # LWW merge, so they must land in a deterministic bucket rather than
    # hash to NULL — which would crash the touched-bucket collect and,
    # worse, write a __HIVE_DEFAULT_PARTITION__ dir the manifest harvest
    # can't parse (review r8 #3).
    key_s = F.coalesce(F.col(key).cast("string"), F.lit("\x00__null_key__"))
    return (portable_hash60(key_s) % n_buckets).cast("int")


def read_snapshot(
    spark: SparkSession,
    path: str,
    buckets: set[int] | None = None,
    epoch: int | None = None,
) -> DataFrame | None:
    """Scan the committed snapshot STRICTLY through the manifest's file
    list (never a directory listing — stray/partial files from a torn or
    concurrent commit are invisible). ``buckets`` prunes the scan to the
    named hash buckets' files: O(|touched files|) I/O, the read half of
    the bounded-write-amplification contract. ``epoch`` time-travels to a
    retained historical version (immutable files + retained manifests
    make every old snapshot fully reconstructible until vacuumed).
    Returns None when the table (or the selected bucket set) has no
    committed files."""
    man = read_manifest(path, epoch)
    if man is None:
        return None
    entries = man["files"]
    if buckets is not None:
        entries = [e for e in entries if e["bucket"] in buckets]
    if not entries:
        return None
    return spark.read.parquet(*(os.path.join(path, e["path"]) for e in entries))


def commit_snapshot(
    merged: DataFrame,
    path: str,
    key: str,
    n_buckets: int,
    carry: list[dict] | None = None,
) -> int:
    """Publish `merged` as the rewritten-buckets portion of the next
    snapshot: files land in ``snap-<epoch>/__bucket=<b>/``, then the new
    manifest (carried untouched-file refs + the new files) replaces the
    old atomically. The bucket of each new file is parsed from the layout
    this function itself wrote, so manifest metadata can't drift from the
    physical files. fsync on the temp manifest + directory makes the
    rename durable, not merely atomic."""
    import shutil

    man = read_manifest(path)
    epoch = (man["epoch"] if man else 0) + 1
    snap = f"snap-{epoch:06d}"
    snap_dir = os.path.join(path, snap)
    # A RETRIED epoch (torn commit left data files behind) must start from
    # an empty snapshot dir: under partitionOverwriteMode=dynamic — which
    # upsert_parquet sets session-wide — mode("overwrite") would replace
    # only the partitions the retry writes and the os.walk below would
    # harvest the stale buckets' never-merged files into the new manifest
    # (review r8 #1).
    if os.path.isdir(snap_dir):
        shutil.rmtree(snap_dir)
    (
        merged.withColumn(_BUCKET_COL, _bucket_expr(key, n_buckets))
        .write.mode("overwrite")
        .partitionBy(_BUCKET_COL)
        .parquet(snap_dir)
    )
    new_entries = []
    for root, _dirs, fs in os.walk(snap_dir):
        for f in sorted(fs):
            if not f.endswith(".parquet") or f.startswith((".", "_")):
                continue
            rel = os.path.relpath(os.path.join(root, f), path)
            part_dir = os.path.basename(os.path.dirname(rel))
            assert part_dir.startswith(f"{_BUCKET_COL}="), rel
            new_entries.append(
                {"path": rel, "bucket": int(part_dir.split("=", 1)[1])}
            )
    files = sorted(
        list(carry or []) + new_entries, key=lambda e: (e["bucket"], e["path"])
    )
    tmp = os.path.join(path, f".{MANIFEST}.{epoch}.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {"epoch": epoch, "n_buckets": n_buckets, "files": files}, fh, indent=1
        )
        fh.flush()
        os.fsync(fh.fileno())
    # Versioned copy FIRST (time-travel history), then the atomic swap of
    # the current pointer — if the crash lands between the two, the
    # version file is unreferenced garbage and the table state is the
    # previous epoch, exactly like unreferenced data files. The copy is
    # fsynced too: once the swap commits the epoch, its retained version
    # must be as durable as the pointer (review r8 #7).
    vpath = _manifest_path(path, epoch)
    shutil.copyfile(tmp, vpath)
    vfd = os.open(vpath, os.O_RDONLY)
    try:
        os.fsync(vfd)
    finally:
        os.close(vfd)
    os.replace(tmp, _manifest_path(path))
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return epoch


def upsert_manifest_txn(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str = "id",
    order_col: str | None = None,
    mode: str = "replace",
    n_buckets: int = 8,
) -> int:
    """One transactional merge of `batch` into the manifest table —
    upsert_parquet's exact merge semantics (first- or last-writer-wins by
    `order_col`, shared `_dedup_last` helper) on the MVCC layout:

      1. touched buckets = distinct key-hash buckets in the batch
         (bounded driver metadata: at most n_buckets ints);
      2. read ONLY those buckets' committed files, union the batch,
         resolve winners per key;
      3. commit: new files for touched buckets + carried references for
         every untouched file, one atomic manifest swap.

    Readers through read_snapshot never observe the intermediate state.
    Returns the committed epoch. The reader/writer pair is exercised
    mid-commit in tests/test_sinks.py (partial files + stale tmp
    manifests planted; a failed swap leaves the old snapshot intact)."""
    assert mode in ("ignore", "replace")
    os.makedirs(path, exist_ok=True)
    order = order_col or key
    man = read_manifest(path)
    if man is not None:
        n_buckets = man["n_buckets"]  # layout is fixed at table creation
    touched = {
        int(r[0])
        for r in batch.select(_bucket_expr(key, n_buckets).alias("b"))
        .distinct()
        .collect()
    }
    new = batch.withColumn("__is_new", F.lit(1))
    current = read_snapshot(spark, path, buckets=touched)
    if current is None:
        merged = _dedup_last(
            new, key, order, prefer="new" if mode == "replace" else "old"
        )
    else:
        merged = _dedup_last(
            current.withColumn("__is_new", F.lit(0)).unionByName(new),
            key,
            order,
            prefer="new" if mode == "replace" else "old",
        )
    carry = [
        e for e in (man["files"] if man else []) if e["bucket"] not in touched
    ]
    return commit_snapshot(merged, path, key, n_buckets, carry=carry)


def compact_table(
    spark: SparkSession, path: str, key: str
) -> int:
    """Small-file compaction as an ordinary commit: read the current
    snapshot, rewrite every bucket with one shuffle task per bucket (≈one
    file per bucket directory), publish as the next epoch. Data is
    UNCHANGED — only the file layout; the old epoch's files stay on disk
    for time travel until vacuumed, so a reader mid-compaction is as safe
    as during any other commit. This is the maintenance op a long-running
    upsert table needs: N micro-batch commits leave O(N) files per
    touched bucket; compaction folds them back to O(1). (The in-place
    twin for plain directories is sinks/compact.py; this one inherits
    MVCC atomicity for free.)"""
    man = read_manifest(path)
    assert man is not None, f"no committed table at {path}"
    n_buckets = man["n_buckets"]
    cur = read_snapshot(spark, path)
    merged = cur.repartition(n_buckets, _bucket_expr(key, n_buckets))
    return commit_snapshot(merged, path, key, n_buckets, carry=[])


def vacuum_table(path: str, keep_epochs: int = 1) -> list[str]:
    """Reap files unreachable from the RETAINED manifests: keep the
    current manifest plus the ``keep_epochs - 1`` versions before it,
    delete every older versioned manifest and every data file no retained
    manifest references. Time travel remains exact within the retention
    window and fails loudly (read_manifest ValueError) outside it —
    Delta's VACUUM contract. Driver-side listing is O(|files|) metadata,
    the same walk the commit itself does; at real scale the deletes fan
    out to the object store's batch-delete API. Returns the deleted
    paths (tests pin the exact set)."""
    man = read_manifest(path)
    if man is None:
        return []
    keep_from = man["epoch"] - max(keep_epochs, 1) + 1
    referenced: set[str] = set()
    for e in range(keep_from, man["epoch"] + 1):
        try:
            m = read_manifest(path, e)
        except ValueError:
            continue
        if m:
            referenced.update(x["path"] for x in m["files"])
    deleted = []
    for root, _dirs, fs in os.walk(path, topdown=False):
        for f in fs:
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path)
            if f == MANIFEST:
                continue
            if f.endswith(".tmp"):
                # stale temp manifests from torn commits (review r8 #6)
                os.remove(full)
                deleted.append(rel)
                continue
            if f.startswith("_MANIFEST.v"):
                v = int(f[len("_MANIFEST.v"):].split(".")[0])
                # below retention, or uncommitted residue ABOVE the
                # current pointer (crash between version copy and swap)
                if v < keep_from or v > man["epoch"]:
                    os.remove(full)
                    deleted.append(rel)
                continue
            top = rel.split(os.sep, 1)[0]
            if not top.startswith("snap-"):
                continue
            if rel in referenced:
                continue
            # unreferenced parquet anywhere; writer bookkeeping (_SUCCESS,
            # .crc) only once its whole epoch left the retention window
            if f.endswith(".parquet") or int(top[5:]) < keep_from:
                os.remove(full)
                deleted.append(rel)
        if not os.listdir(root) and root != path:
            os.rmdir(root)
    return sorted(deleted)


def table_changes(
    spark: SparkSession,
    path: str,
    from_epoch: int,
    to_epoch: int,
    key: str = "id",
) -> DataFrame:
    """Change data feed between two retained epochs (Delta's
    ``table_changes`` on the manifest table): full-outer join the two
    snapshots on the merge key and classify each key as insert / delete /
    update_postimage (emitted with the TO-epoch row values; unchanged keys
    — all non-key columns equal, NULL-safe — are omitted). Downstream
    incremental consumers (index refresh, cache invalidation, reverse
    ETL) read the delta instead of re-scanning the table.

    Scale: one key-hash shuffle over the two snapshots; with bucket
    layouts shared between epochs the join co-locates per bucket. Time
    travel supplies both sides from retained manifests — no extra
    bookkeeping is written at commit time (contrast Delta, which persists
    CDF files per commit; here immutable snapshots make the diff
    recomputable on demand)."""
    a = read_snapshot(spark, path, epoch=from_epoch)
    b = read_snapshot(spark, path, epoch=to_epoch)
    assert a is not None and b is not None, (from_epoch, to_epoch)
    cols = [c for c in b.columns if c != key]
    a_r = a.select(
        F.col(key).alias("__k"), F.struct(*[F.col(c) for c in cols]).alias("__a")
    )
    b_r = b.select(
        F.col(key).alias("__k"),
        F.struct(*[F.col(c) for c in cols]).alias("__b"),
    )
    joined = a_r.join(b_r, a_r["__k"].eqNullSafe(b_r["__k"]), "fullOuter")
    change = (
        F.when(a_r["__k"].isNull() & b_r["__k"].isNotNull(), F.lit("insert"))
        .when(b_r["__k"].isNull() & a_r["__k"].isNotNull(), F.lit("delete"))
        .when(~F.col("__a").eqNullSafe(F.col("__b")), F.lit("update_postimage"))
    )
    out_key = F.coalesce(b_r["__k"], a_r["__k"]).alias(key)
    post = F.coalesce(F.col("__b"), F.col("__a"))
    return (
        joined.withColumn("_change_type", change)
        .where(F.col("_change_type").isNotNull())
        .select(
            out_key,
            *[post.getField(c).alias(c) for c in cols],
            "_change_type",
        )
    )


def upsert_manifest_stream(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    key: str = "id",
    order_col: str | None = None,
    mode: str = "replace",
    n_buckets: int = 8,
    trigger: dict | None = None,
):
    """The foreachBatch wiring (run.upsert_stream's transactional twin):
    every micro-batch is one atomic manifest commit, so a reader polling
    the table between batches always sees a consistent merge prefix."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        upsert_manifest_txn(
            batch_df.sparkSession,
            batch_df,
            path,
            key=key,
            order_col=order_col,
            mode=mode,
            n_buckets=n_buckets,
        )

    return (
        sdf.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
