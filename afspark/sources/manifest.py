"""Manifest-pinned snapshot store on plain parquet (mini-Iceberg).

Closes the "no Iceberg runtime jar in the container" gap at the
SEMANTICS level: atomic commits, snapshot-isolated reads, time travel,
and partition-level overwrite (the OoO-repair shape) on a plain
filesystem — no table-format runtime required.  The layout mirrors what
Iceberg does so the call sites swap cleanly when a jar appears (data
files are immutable once committed; a commit is ONE atomic metadata
rename; readers pin a manifest, so an in-flight rewrite — or a crash
mid-rewrite — is invisible to them):

    store/
      data/<snapshot-uuid>/[p=v/...]part-*.parquet   (immutable)
      manifests/<seq>-<uuid>.json                    (atomic rename)

A manifest lists every live data file with the partition values baked
into its path, so ``commit_overwrite_partitions`` drops replaced files
without reading them and ``read_snapshot`` prunes by partition before
touching a parquet footer.  This also removes the read-and-overwrite-
the-same-path hazard the dynamic-overwrite stores carry (the shuffle
barrier there is load-bearing; here the old files simply remain until
``expire_snapshots``).

Single-writer assumption (same as streaming/stream_tier's journal): one
committer per store; readers are unrestricted and lock-free.

Scale note: a manifest here is ONE json listing every live file — right
for stores whose file count is bounded (rolled-up tiers, compacted
chunk stores: ~10^4-10^6 files), which is exactly what this engine
writes.  A raw 10^12-row ingest table would need Iceberg's extra
indirection (manifest LISTS of manifest files, written once and reused
across commits) — at that point use the real thing; this module's call
sites are shaped to swap to it.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(store: str) -> str:
    return os.path.join(store, "manifests")


def _list_manifests(store: str) -> list[str]:
    d = _manifest_dir(store)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".json"))


def _load(store: str, name: str) -> dict:
    with open(os.path.join(_manifest_dir(store), name)) as fh:
        return json.load(fh)


def _parse_partition(relpath: str, partition_cols: list[str]) -> dict:
    vals = {}
    for seg in relpath.split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in partition_cols:
                vals[k] = v
    return vals


def _write_manifest(store: str, manifest: dict) -> str:
    d = _manifest_dir(store)
    os.makedirs(d, exist_ok=True)
    seq = manifest["seq"]
    name = f"{seq:08d}-{manifest['snapshot_id']}.json"
    tmp = os.path.join(d, f".tmp-{manifest['snapshot_id']}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(d, name))  # the atomic commit point
    return manifest["snapshot_id"]


def _write_data(
    df: DataFrame, store: str, partition_cols: list[str]
) -> tuple[str, list[dict], dict]:
    """Write df under a fresh immutable snapshot dir; return its file
    list and the declared types of the partition columns (directory
    discovery re-infers them — e.g. a '2024-01-01' string comes back as
    DATE — so reads cast back to the committed schema)."""
    ptypes = {
        c: df.schema[c].dataType.simpleString() for c in partition_cols
    }
    snap = uuid.uuid4().hex
    root = os.path.join(store, "data", snap)
    w = df.write.mode("error")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(root)
    files = []
    for dp, _dn, fn in os.walk(root):
        for f in fn:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dp, f), store)
                files.append(
                    {
                        "path": rel,
                        "base": os.path.relpath(root, store),
                        "partition": _parse_partition(
                            os.path.relpath(os.path.join(dp, f), root),
                            partition_cols,
                        ),
                    }
                )
    return snap, files, ptypes


def _commit(
    store: str,
    op: str,
    files: list[dict],
    snap: str,
    partition_cols: list[str],
    partition_types: dict,
    schema_json: dict | None = None,
) -> str:
    manifests = _list_manifests(store)
    parent = manifests[-1] if manifests else None
    seq = (_load(store, parent)["seq"] + 1) if parent else 0
    return _write_manifest(
        store,
        {
            "snapshot_id": snap,
            "seq": seq,
            "op": op,
            "parent": parent,
            "partition_cols": partition_cols,
            "partition_types": partition_types,
            # full committed schema (StructType json): lets readers build
            # an empty frame for a ZERO-FILE snapshot (a partitioned
            # write of an empty frame emits no data files)
            "schema": schema_json,
            "files": files,
            "committed_at": time.time(),
        },
    )


def commit_append(
    spark: SparkSession,
    df: DataFrame,
    store: str,
    partition_cols: list[str] = [],
) -> str:
    """Append df as a new snapshot: previous files + the new ones."""
    snap, new_files, ptypes = _write_data(df, store, partition_cols)
    manifests = _list_manifests(store)
    prev = _load(store, manifests[-1])["files"] if manifests else []
    return _commit(
        store, "append", prev + new_files, snap, partition_cols, ptypes,
        schema_json=df.schema.jsonValue(),
    )


def commit_overwrite_partitions(
    spark: SparkSession,
    df: DataFrame,
    store: str,
    partition_cols: list[str],
) -> str:
    """Replace exactly the partitions present in df (the OoO-repair /
    incremental-refresh writer): the new manifest keeps every previous
    file whose partition df does NOT touch, plus df's files.  Old files
    are not deleted — pinned readers keep a consistent view until
    ``expire_snapshots``."""
    if not partition_cols:
        raise ValueError("overwrite needs partition_cols")
    snap, new_files, ptypes = _write_data(df, store, partition_cols)
    touched = {tuple(sorted(f["partition"].items())) for f in new_files}
    manifests = _list_manifests(store)
    prev = _load(store, manifests[-1])["files"] if manifests else []
    kept = [
        f for f in prev
        if tuple(sorted(f["partition"].items())) not in touched
    ]
    return _commit(
        store, "overwrite", kept + new_files, snap, partition_cols, ptypes,
        schema_json=df.schema.jsonValue(),
    )


def snapshots(store: str) -> list[dict]:
    """Commit history, oldest first: id, seq, op, n_files, committed_at."""
    out = []
    for name in _list_manifests(store):
        m = _load(store, name)
        out.append(
            {
                "snapshot_id": m["snapshot_id"],
                "seq": m["seq"],
                "op": m["op"],
                "n_files": len(m["files"]),
                "committed_at": m["committed_at"],
            }
        )
    return out


def read_snapshot(
    spark: SparkSession,
    store: str,
    snapshot_id: str | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Snapshot-isolated read: the pinned (default: latest) manifest's
    file list, pruned by exact-match ``partition_filter`` BEFORE any
    parquet footer is opened.  Files are read per snapshot-dir group
    with that dir as basePath, so partition columns come back as
    ordinary columns."""
    manifests = _list_manifests(store)
    if not manifests:
        raise ValueError(f"no committed snapshot in {store}")
    chosen = None
    for name in manifests:
        m = _load(store, name)
        if snapshot_id is None or m["snapshot_id"] == snapshot_id:
            chosen = m
            if snapshot_id is not None:
                break
    if chosen is None or (
        snapshot_id is not None and chosen["snapshot_id"] != snapshot_id
    ):
        raise ValueError(f"snapshot {snapshot_id} not found in {store}")
    files = chosen["files"]
    if partition_filter:
        want = {k: str(v) for k, v in partition_filter.items()}
        files = [
            f for f in files
            if all(f["partition"].get(k) == v for k, v in want.items())
        ]
    if not files:
        raise ValueError("no files match the requested snapshot/partitions")
    return _read_files(spark, store, files, chosen.get("partition_types", {}))


def _read_files(
    spark: SparkSession, store: str, files: list[dict], partition_types: dict
) -> DataFrame:
    """Read an explicit manifest file list, per snapshot-dir group with
    that dir as basePath so partition columns come back as columns."""
    by_base: dict[str, list[str]] = {}
    for f in files:
        by_base.setdefault(f["base"], []).append(os.path.join(store, f["path"]))
    out = None
    for base, paths in sorted(by_base.items()):
        part = spark.read.option(
            "basePath", os.path.join(store, base)
        ).parquet(*sorted(paths))
        out = part if out is None else out.unionByName(part)
    # directory discovery re-infers partition column types; cast back to
    # the schema the data was COMMITTED with
    from pyspark.sql import functions as F

    for c, t in partition_types.items():
        out = out.withColumn(c, F.col(c).cast(t))
    return out


def read_incremental(
    spark: SparkSession,
    store: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
    allow_overwrites: bool = False,
) -> DataFrame:
    """Rows ADDED after ``from_snapshot`` up to ``to_snapshot`` (default
    latest) — the incremental-consumption read (Iceberg's incremental
    append scan): a downstream job remembers the last snapshot it
    processed and consumes each commit's new rows exactly once, never
    rescanning the table.  Work is proportional to the DELTA (the new
    files), not the store.

    ``from_snapshot`` must be an ancestor of ``to_snapshot`` (the commit
    chain is walked through parent pointers, so an expired or foreign id
    fails fast rather than silently diffing unrelated states).  If any
    commit in the range is an overwrite, the delta is not purely
    appended rows; mirroring Iceberg, that raises unless
    ``allow_overwrites=True``, in which case the file-level delta
    (added + replacement files) is returned.  ``from == to`` yields an
    empty frame with the committed schema.
    """
    manifests = _list_manifests(store)
    if not manifests:
        raise ValueError(f"no committed snapshot in {store}")
    by_id = {}
    for name in manifests:
        m = _load(store, name)
        by_id[m["snapshot_id"]] = m
    to = (_load(store, manifests[-1]) if to_snapshot is None
          else by_id.get(to_snapshot))
    if to is None:
        raise ValueError(f"snapshot {to_snapshot} not found in {store}")
    if from_snapshot not in by_id:
        raise ValueError(f"snapshot {from_snapshot} not found in {store}")
    base = by_id[from_snapshot]

    # ancestry walk to..from, collecting the ops in the range
    cur, ops = to, []
    while cur is not None and cur["snapshot_id"] != from_snapshot:
        ops.append(cur["op"])
        parent_name = cur.get("parent")
        try:
            cur = _load(store, parent_name) if parent_name else None
        except FileNotFoundError:
            cur = None  # chain severed by expire_snapshots -> not an ancestor
    if cur is None:
        raise ValueError(
            f"{from_snapshot} is not an ancestor of "
            f"{to['snapshot_id']} in {store}"
        )
    if any(op != "append" for op in ops) and not allow_overwrites:
        raise ValueError(
            "overwrite commit inside the incremental range: the delta is "
            "not purely appended rows (pass allow_overwrites=True for the "
            "file-level delta)"
        )

    seen = {f["path"] for f in base["files"]}
    added = [f for f in to["files"] if f["path"] not in seen]
    if not added:
        if to["files"]:
            return _read_files(
                spark, store, to["files"][:1], to.get("partition_types", {})
            ).limit(0)
        # zero-file 'to' snapshot (e.g. a partitioned empty initial
        # commit): build the empty frame from the committed schema
        # recorded in the manifest instead of raising
        schema_json = to.get("schema")
        if schema_json is None:
            raise ValueError(
                "store snapshot has no files and records no schema "
                "(committed by an older writer) — cannot build the "
                "empty delta frame"
            )
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(schema_json))
    return _read_files(spark, store, added, to.get("partition_types", {}))


def expire_snapshots(
    store: str, keep_last: int = 1, orphan_grace_seconds: float = 3600.0
) -> dict:
    """Retention for the metadata layer: drop all but the newest
    ``keep_last`` manifests, delete data files no kept manifest
    references, then sweep ORPHANED snapshot dirs — ``data/<snapshot>``
    trees no kept manifest references at all.  Orphans arise from a
    crash between ``_write_data`` and the manifest rename (data written,
    commit never happened) and from dropped manifests whose dirs
    emptied; without the sweep they accumulate forever.  A dir whose
    newest mtime is within ``orphan_grace_seconds`` is left alone — it
    may be an IN-FLIGHT commit that has written data but not yet renamed
    its manifest (the single-writer assumption makes anything older than
    the grace window definitively dead).  Returns
    {"manifests_removed", "files_removed", "orphan_dirs_removed"}."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    manifests = _list_manifests(store)
    drop, keep = manifests[:-keep_last], manifests[-keep_last:]
    live, live_bases = set(), set()
    for name in keep:
        for f in _load(store, name)["files"]:
            live.add(f["path"])
            live_bases.add(f["base"])
    removed_files = 0
    for name in drop:
        for f in _load(store, name)["files"]:
            if f["path"] not in live:
                p = os.path.join(store, f["path"])
                if os.path.exists(p):
                    os.remove(p)
                    removed_files += 1
        os.remove(os.path.join(_manifest_dir(store), name))
    data_dir = os.path.join(store, "data")
    orphan_dirs = 0
    now = time.time()
    if os.path.isdir(data_dir):
        for snap in os.listdir(data_dir):
            root = os.path.join(data_dir, snap)
            if os.path.join("data", snap) in live_bases or not os.path.isdir(root):
                continue
            newest = max(
                (
                    os.path.getmtime(os.path.join(dp, n))
                    for dp, dns, fns in os.walk(root)
                    for n in (*dns, *fns)
                ),
                default=os.path.getmtime(root),
            )
            if now - newest < orphan_grace_seconds:
                continue
            shutil.rmtree(root)
            orphan_dirs += 1
    return {
        "manifests_removed": len(drop),
        "files_removed": removed_files,
        "orphan_dirs_removed": orphan_dirs,
    }


def consume_incremental(
    spark: SparkSession,
    store: str,
    state_path: str,
    process,
    allow_overwrites: bool = False,
) -> dict:
    """Crash-safe incremental consumer: process every snapshot committed
    since the last successful run, exactly once at snapshot granularity.

    ``state_path`` holds the last PROCESSED snapshot id; it is advanced
    (atomic tmp+rename, same discipline as the manifest commit) only
    AFTER ``process(delta_df, snapshot_id)`` returns, so a crash mid-
    process re-delivers that snapshot's delta on the next run and never
    skips one — ``process`` must therefore be idempotent per snapshot
    (write to a path keyed by snapshot_id, or MERGE), the same contract
    Spark's own foreachBatch has with its batch id.  Snapshots are
    processed one commit at a time, oldest first, so a consumer that
    dies mid-backlog resumes mid-backlog.

    A FRESH consumer (no state file) is seeded with the oldest KEPT
    snapshot's full live content — correct even when that snapshot's
    parent manifests were dropped by ``expire_snapshots`` (the delta
    against an expired parent is unreconstructable; the live content is
    exactly what a new consumer should see once).  Deltas are computed
    by diffing ADJACENT manifests already in hand — no re-listing per
    step — and a commit that added no files advances the state without
    invoking ``process`` (there is nothing to deliver).

    Returns {"processed": n, "last_snapshot": id or None}.
    """
    manifests = _list_manifests(store)
    chain = [_load(store, name) for name in manifests]
    start = 0
    if os.path.exists(state_path):
        with open(state_path) as fh:
            last = json.load(fh)["last_snapshot"]
        idx = {m["snapshot_id"]: i for i, m in enumerate(chain)}
        if last not in idx:
            raise ValueError(
                f"consumer state points at snapshot {last} which the store "
                f"no longer has (expired?) — reset the state or re-seed"
            )
        start = idx[last] + 1
    processed = 0
    for i in range(start, len(chain)):
        m = chain[i]
        sid = m["snapshot_id"]
        if i == 0:
            added = m["files"]  # seed: the full live content
        else:
            # adjacency check (mirrors read_incremental's ancestry walk):
            # the delta below diffs chain[i-1] vs chain[i] and is only a
            # commit's delta if chain[i] really is chain[i-1]'s child —
            # a severed chain (manual manifest deletion, expiry racing
            # between the listing and this loop) or a foreign manifest
            # copied into the dir would otherwise deliver a merged or
            # wrong delta silently.
            if m.get("parent") != manifests[i - 1]:
                raise ValueError(
                    f"snapshot chain severed at {sid}: its parent manifest "
                    f"is {m.get('parent')!r} but the preceding manifest on "
                    f"disk is {manifests[i - 1]!r} — the store was expired, "
                    "edited, or mixed with a foreign manifest; reset the "
                    "consumer state to re-seed"
                )
            if m["op"] != "append" and not allow_overwrites:
                raise ValueError(
                    f"overwrite commit {sid} in the consume range: pass "
                    "allow_overwrites=True for file-level deltas"
                )
            seen = {f["path"] for f in chain[i - 1]["files"]}
            added = [f for f in m["files"] if f["path"] not in seen]
        if added:
            process(
                _read_files(spark, store, added, m.get("partition_types", {})),
                sid,
            )
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"last_snapshot": sid}, fh)
        os.replace(tmp, state_path)
        processed += 1
    return {
        "processed": processed,
        "last_snapshot": chain[-1]["snapshot_id"] if chain else None,
    }
