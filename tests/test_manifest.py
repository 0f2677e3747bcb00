"""Manifest-pinned snapshot store (sources/manifest.py): atomic commits,
time travel, partition overwrite, crash invisibility, expiry."""

import os

import pytest
from pyspark.sql import functions as F

from afspark.sources.manifest import (
    commit_append,
    commit_overwrite_partitions,
    expire_snapshots,
    read_snapshot,
    snapshots,
)


def _rows(df):
    return sorted(
        (r.series_id, r.d, int(r.v)) for r in df.select("series_id", "d", "v").collect()
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "series_id string, d string, v long")


def test_append_roundtrip_and_history(spark, tmpdir):
    store = str(tmpdir.join("s"))
    a = [("x", "2024-01-01", 1), ("y", "2024-01-01", 2)]
    b = [("x", "2024-01-02", 3)]
    s1 = commit_append(spark, _mk(spark, a), store, ["d"])
    s2 = commit_append(spark, _mk(spark, b), store, ["d"])
    assert _rows(read_snapshot(spark, store)) == sorted(
        (r[0], r[1], r[2]) for r in a + b
    )
    # time travel: snapshot 1 still shows only the first commit
    assert _rows(read_snapshot(spark, store, snapshot_id=s1)) == sorted(a)
    hist = snapshots(store)
    assert [h["snapshot_id"] for h in hist] == [s1, s2]
    assert [h["op"] for h in hist] == ["append", "append"]


def test_overwrite_partition_isolated_from_pinned_reader(spark, tmpdir):
    store = str(tmpdir.join("s"))
    s1 = commit_append(
        spark,
        _mk(spark, [("x", "2024-01-01", 1), ("x", "2024-01-02", 2)]),
        store,
        ["d"],
    )
    # repair day 1 (the OoO shape): only that partition's rows replaced
    s2 = commit_overwrite_partitions(
        spark, _mk(spark, [("x", "2024-01-01", 9)]), store, ["d"]
    )
    assert _rows(read_snapshot(spark, store)) == [
        ("x", "2024-01-01", 9),
        ("x", "2024-01-02", 2),
    ]
    # a reader pinned to s1 is untouched by the rewrite
    assert _rows(read_snapshot(spark, store, snapshot_id=s1)) == [
        ("x", "2024-01-01", 1),
        ("x", "2024-01-02", 2),
    ]
    assert snapshots(store)[-1]["op"] == "overwrite"


def test_uncommitted_data_files_invisible(spark, tmpdir):
    """Crash between data write and manifest rename: files exist on disk
    but no reader can see them."""
    store = str(tmpdir.join("s"))
    commit_append(spark, _mk(spark, [("x", "2024-01-01", 1)]), store, ["d"])
    # simulate a crashed writer: data files land, manifest never renames
    orphan = _mk(spark, [("z", "2024-01-09", 99)])
    orphan.write.partitionBy("d").parquet(
        os.path.join(store, "data", "deadbeef")
    )
    got = _rows(read_snapshot(spark, store))
    assert got == [("x", "2024-01-01", 1)]  # orphan invisible


def test_partition_filter_prunes_before_read(spark, tmpdir):
    store = str(tmpdir.join("s"))
    commit_append(
        spark,
        _mk(spark, [("x", "2024-01-01", 1), ("x", "2024-01-02", 2)]),
        store,
        ["d"],
    )
    out = read_snapshot(spark, store, partition_filter={"d": "2024-01-02"})
    assert _rows(out) == [("x", "2024-01-02", 2)]
    # pruning happens on the manifest: asking for a missing partition
    # fails fast without touching parquet
    with pytest.raises(ValueError, match="no files"):
        read_snapshot(spark, store, partition_filter={"d": "2024-09-09"})


def test_expire_keeps_latest_and_deletes_unreferenced(spark, tmpdir):
    store = str(tmpdir.join("s"))
    commit_append(spark, _mk(spark, [("x", "2024-01-01", 1)]), store, ["d"])
    commit_overwrite_partitions(
        spark, _mk(spark, [("x", "2024-01-01", 7)]), store, ["d"]
    )
    stats = expire_snapshots(store, keep_last=1)
    assert stats["manifests_removed"] == 1
    assert stats["files_removed"] >= 1  # the replaced day-1 file is gone
    assert _rows(read_snapshot(spark, store)) == [("x", "2024-01-01", 7)]
    assert len(snapshots(store)) == 1


def test_expire_sweeps_orphan_dirs_with_grace(spark, tmpdir):
    """A crash between _write_data and the manifest rename leaves a
    data/<snapshot> dir no manifest references.  expire_snapshots sweeps
    it once it ages past the grace window — and the emptied dir of a
    dropped manifest too — while a FRESH orphan (possibly an in-flight
    commit) survives."""
    store = str(tmpdir.join("s"))
    commit_append(spark, _mk(spark, [("x", "2024-01-01", 1)]), store, ["d"])
    commit_overwrite_partitions(
        spark, _mk(spark, [("x", "2024-01-01", 7)]), store, ["d"]
    )
    orphan = _mk(spark, [("z", "2024-01-09", 99)])
    orphan.write.partitionBy("d").parquet(os.path.join(store, "data", "deadbeef"))
    # fresh orphan inside the grace window: untouched
    stats = expire_snapshots(store, keep_last=1)
    assert stats["orphan_dirs_removed"] == 0
    assert os.path.isdir(os.path.join(store, "data", "deadbeef"))
    # aged past the grace window: swept, along with the emptied dir of
    # the dropped first snapshot
    stats = expire_snapshots(store, keep_last=1, orphan_grace_seconds=0.0)
    assert stats["orphan_dirs_removed"] >= 1
    assert not os.path.isdir(os.path.join(store, "data", "deadbeef"))
    live = snapshots(store)[-1]["snapshot_id"]
    assert sorted(os.listdir(os.path.join(store, "data"))) == [live]
    assert _rows(read_snapshot(spark, store)) == [("x", "2024-01-01", 7)]


def test_incremental_read_appends_exactly_once(spark, tmpdir):
    """read_incremental(from, to): exactly the rows of the commits AFTER
    `from` up to `to` — the consume-each-commit-once contract."""
    from afspark.sources.manifest import read_incremental

    store = str(tmpdir.join("inc"))
    b1 = [("x", "2024-01-01", 1), ("y", "2024-01-01", 2)]
    b2 = [("x", "2024-01-02", 3)]
    b3 = [("z", "2024-01-03", 4), ("x", "2024-01-03", 5)]
    s1 = commit_append(spark, _mk(spark, b1), store, ["d"])
    s2 = commit_append(spark, _mk(spark, b2), store, ["d"])
    s3 = commit_append(spark, _mk(spark, b3), store, ["d"])

    # consume s1 -> s2, then s2 -> latest: each batch seen exactly once
    assert _rows(read_incremental(spark, store, s1, s2)) == _rows(_mk(spark, b2))
    assert _rows(read_incremental(spark, store, s2)) == _rows(_mk(spark, b3))
    # whole range in one pull
    assert _rows(read_incremental(spark, store, s1, s3)) == _rows(
        _mk(spark, b2 + b3)
    )
    # from == to: empty with the committed schema
    empty = read_incremental(spark, store, s3, s3)
    assert empty.count() == 0
    assert set(empty.columns) == {"series_id", "d", "v"}


def test_incremental_read_rejects_overwrites_unless_allowed(spark, tmpdir):
    from afspark.sources.manifest import read_incremental

    store = str(tmpdir.join("inc_ow"))
    s1 = commit_append(
        spark, _mk(spark, [("x", "2024-01-01", 1), ("y", "2024-01-02", 2)]),
        store, ["d"],
    )
    s2 = commit_overwrite_partitions(
        spark, _mk(spark, [("x", "2024-01-01", 9)]), store, ["d"]
    )
    with pytest.raises(ValueError, match="overwrite"):
        read_incremental(spark, store, s1, s2)
    # file-level delta on request: the replacement file's rows
    delta = read_incremental(spark, store, s1, s2, allow_overwrites=True)
    assert _rows(delta) == [("x", "2024-01-01", 9)]


def test_incremental_read_bad_ids_and_severed_chain(spark, tmpdir):
    from afspark.sources.manifest import read_incremental

    store = str(tmpdir.join("inc_bad"))
    s1 = commit_append(spark, _mk(spark, [("x", "2024-01-01", 1)]), store, ["d"])
    s2 = commit_append(spark, _mk(spark, [("y", "2024-01-02", 2)]), store, ["d"])
    with pytest.raises(ValueError, match="not found"):
        read_incremental(spark, store, "nope", s2)
    with pytest.raises(ValueError, match="not found"):
        read_incremental(spark, store, s1, "nope")
    # reversed range: s2 is not an ancestor of s1
    with pytest.raises(ValueError, match="not an ancestor"):
        read_incremental(spark, store, s2, s1)
    # expire the base: its manifest is gone -> fails fast, never misreads
    s3 = commit_append(spark, _mk(spark, [("z", "2024-01-03", 3)]), store, ["d"])
    expire_snapshots(store, keep_last=1, orphan_grace_seconds=0)
    with pytest.raises(ValueError, match="not found|not an ancestor"):
        read_incremental(spark, store, s1, s3)


def test_consume_incremental_exactly_once_with_crash(spark, tmpdir):
    """consume_incremental: oldest-first snapshot processing, state
    advanced only after success — a crash mid-backlog re-delivers the
    failed snapshot and nothing before it."""
    from afspark.sources.manifest import consume_incremental

    store = str(tmpdir.join("cons"))
    state = str(tmpdir.join("cons_state.json"))
    ids = [
        commit_append(spark, _mk(spark, [(f"s{i}", "2024-01-01", i)]), store, ["d"])
        for i in range(3)
    ]

    seen: list[tuple[str, list]] = []

    def ok(df, sid):
        seen.append((sid, _rows(df)))

    r = consume_incremental(spark, store, state, ok)
    assert r["processed"] == 3
    assert [s for s, _ in seen] == ids  # oldest first
    assert [rows for _, rows in seen] == [
        [("s0", "2024-01-01", 0)], [("s1", "2024-01-01", 1)],
        [("s2", "2024-01-01", 2)],
    ]

    # nothing new: no-op
    assert consume_incremental(spark, store, state, ok)["processed"] == 0

    # two more commits; the processor dies on the first of them
    s4 = commit_append(spark, _mk(spark, [("s3", "2024-01-02", 3)]), store, ["d"])
    s5 = commit_append(spark, _mk(spark, [("s4", "2024-01-02", 4)]), store, ["d"])
    calls = []

    def dies(df, sid):
        calls.append(sid)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        consume_incremental(spark, store, state, dies)
    assert calls == [s4]  # died on s4; state NOT advanced

    seen.clear()
    r = consume_incremental(spark, store, state, ok)
    assert r["processed"] == 2
    assert [s for s, _ in seen] == [s4, s5]  # s4 re-delivered, s5 once


def test_consume_incremental_expired_state_fails_fast(spark, tmpdir):
    import json as _json

    from afspark.sources.manifest import consume_incremental

    store = str(tmpdir.join("cons2"))
    state = str(tmpdir.join("cons2_state.json"))
    commit_append(spark, _mk(spark, [("a", "2024-01-01", 1)]), store, ["d"])
    with open(state, "w") as fh:
        _json.dump({"last_snapshot": "gone"}, fh)
    with pytest.raises(ValueError, match="no longer has"):
        consume_incremental(spark, store, state, lambda df, sid: None)


def test_consume_incremental_rejects_severed_chain(spark, tmpdir):
    """Deltas are diffs of ADJACENT manifests; a severed chain (manual
    manifest deletion between commits) must raise, not silently deliver
    a merged delta — mirroring read_incremental's ancestry walk."""
    from afspark.sources.manifest import _manifest_dir, consume_incremental

    store = str(tmpdir.join("cons_sever"))
    state = str(tmpdir.join("cons_sever_state.json"))
    for i in range(3):
        commit_append(spark, _mk(spark, [(f"s{i}", "2024-01-01", i)]), store, ["d"])
    # consume once so the state pins the first snapshot, then sever the
    # chain by deleting the MIDDLE manifest
    seen = []
    consume_incremental(spark, store, state, lambda df, sid: seen.append(sid))
    import json as _json

    with open(state, "w") as fh:
        _json.dump({"last_snapshot": seen[0]}, fh)
    mids = sorted(os.listdir(_manifest_dir(store)))
    os.remove(os.path.join(_manifest_dir(store), mids[1]))
    with pytest.raises(ValueError, match="severed"):
        consume_incremental(spark, store, state, lambda df, sid: None)


def test_incremental_read_empty_initial_commit(spark, tmpdir):
    """from == to on a ZERO-FILE snapshot (partitioned write of an empty
    frame emits no data files) yields an empty frame with the committed
    schema instead of raising."""
    from afspark.sources.manifest import read_incremental

    store = str(tmpdir.join("empty_init"))
    s1 = commit_append(
        spark, _mk(spark, []).filter(F.lit(False)), store, ["d"]
    )
    empty = read_incremental(spark, store, s1, s1)
    assert empty.count() == 0
    assert set(empty.columns) == {"series_id", "d", "v"}


def test_consume_incremental_fresh_consumer_on_expired_store(spark, tmpdir):
    """A fresh consumer on a store whose older manifests were expired is
    seeded with the oldest KEPT snapshot's full live content (the delta
    against an expired parent is unreconstructable), then consumes
    normally."""
    from afspark.sources.manifest import consume_incremental

    store = str(tmpdir.join("cons_exp"))
    state = str(tmpdir.join("cons_exp_state.json"))
    b = [[(f"s{i}", "2024-01-01", i)] for i in range(4)]
    for rows in b[:3]:
        commit_append(spark, _mk(spark, rows), store, ["d"])
    expire_snapshots(store, keep_last=1, orphan_grace_seconds=0)
    s4 = commit_append(spark, _mk(spark, b[3]), store, ["d"])

    seen = []
    r = consume_incremental(spark, store, state, lambda df, sid: seen.append(
        (sid, _rows(df))))
    assert r["processed"] == 2
    # seed = all live rows at the oldest kept snapshot (b0+b1+b2), then b3
    assert seen[0][1] == _rows(_mk(spark, b[0] + b[1] + b[2]))
    assert seen[1] == (s4, _rows(_mk(spark, b[3])))
