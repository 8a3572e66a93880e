"""Transactional table format (sources/txn_table.py): snapshot
isolation, time travel, MERGE file-skipping, concurrent-writer safety,
and vacuum — the log-structured-table protocol built jar-free over
plain parquet."""

from __future__ import annotations

import json
import os
import threading

import pytest

from pyblazing_spark.sources.txn_table import CommitConflict, TxnTable


def _mk(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_append_overwrite_time_travel_history(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a"), (2, "b")]), key="k")
    assert t.latest_version() == 1
    t.append(_mk(spark, [(3, "c")]))
    t.overwrite(_mk(spark, [(9, "z")]))
    assert _sorted(t.read(version=1)) == [(1, "a"), (2, "b")]
    assert _sorted(t.read(version=2)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _sorted(t.read(version=3)) == [(9, "z")]
    assert _sorted(t.read()) == [(9, "z")]
    hist = t.history()
    assert [h["action"] for h in hist] == ["create", "append", "overwrite"]
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert hist[1]["n_added_rows"] == 1
    with pytest.raises(ValueError):
        t.read(version=4)
    with pytest.raises(ValueError):
        TxnTable.create(spark, path, _mk(spark, [(1, "x")]))


def test_merge_upsert_semantics(spark, tmp_path):
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), key="k",
    )
    t.merge(_mk(spark, [(2, "B"), (4, "D")]))
    assert _sorted(t.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "D")]
    # old snapshot untouched (snapshot isolation across DML)
    assert _sorted(t.read(version=1)) == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_skips_disjoint_files(spark, tmp_path):
    """A live file whose key [min,max] is disjoint from the source
    batch's range must survive a MERGE unrewritten (Delta-style data
    skipping applied to write amplification)."""
    path = str(tmp_path / "t")
    low = _mk(spark, [(i, "low") for i in range(10)]).coalesce(1)
    high = _mk(spark, [(i, "high") for i in range(1000, 1010)]).coalesce(1)
    t = TxnTable.create(spark, path, low, key="k")
    t.append(high)
    before = {f["path"]: f for f in t._live_files()}
    low_files = {p for p, f in before.items() if f["max"] < 500}
    assert low_files and len(before) > len(low_files)
    t.merge(_mk(spark, [(1005, "HIGH"), (2000, "NEW")]).coalesce(1))
    after = {f["path"] for f in t._live_files()}
    assert low_files <= after  # low-range files survived by reference
    assert _sorted(t.read())[:3] == [(0, "low"), (1, "low"), (2, "low")]
    got = dict(_sorted(t.read()))
    assert got[1005] == "HIGH" and got[2000] == "NEW" and got[1001] == "high"


def test_concurrent_appends_all_land(spark, tmp_path):
    """Optimistic concurrency: N racing appenders all commit (each
    retries the put-if-absent publication with the next version);
    the final snapshot is the union, the log is gap-free."""
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(0, "base")]), key="k")
    errs: list[Exception] = []

    def add(i: int):
        try:
            t.append(_mk(spark, [(i, f"w{i}")]))
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=add, args=(i,)) for i in range(1, 9)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.latest_version() == 9  # create + 8 appends, contiguous
    assert _sorted(t.read()) == [(0, "base")] + [
        (i, f"w{i}") for i in range(1, 9)
    ]


def test_commit_conflict_surfaces_when_retries_exhausted(spark, tmp_path):
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(0, "x")]), key="k")
    # jam the next version slot so every retry loses
    orig = t._try_publish
    t._try_publish = lambda v, p: False
    try:
        with pytest.raises(CommitConflict):
            t._commit_with_retry(
                lambda snap: {"action": "append", "add": [], "remove": [],
                              "key": "k"},
                max_retries=2,
            )
    finally:
        t._try_publish = orig


def test_vacuum_drops_unreferenced_files_only(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k")
    t.overwrite(_mk(spark, [(2, "b")]))
    t.overwrite(_mk(spark, [(3, "c")]))
    dropped = t.vacuum(retain_from_version=3)
    assert dropped  # v1+v2 data gone
    assert _sorted(t.read()) == [(3, "c")]  # latest intact
    with pytest.raises(Exception):
        t.read(version=1).collect()  # time travel below cutoff forfeited


def test_empty_snapshots_read_as_typed_zero_row_frames(spark, tmp_path):
    """Empty create / all-removed snapshots must read back as ZERO-ROW
    frames with the recorded schema (a filter eliminating everything is
    a daily event at scale, not an error) — caught by the catalog-wide
    empty-tables gate on stream_txn_upsert."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [], "k long, v string"), key="k",
    )
    got = t.read()
    assert got.columns == ["k", "v"] and got.count() == 0
    t.merge(_mk(spark, [], "k long, v string"))  # no-op commit
    assert t.latest_version() == 2
    assert t.read(version=2).count() == 0
    t.append(_mk(spark, [(1, "a")]))
    assert _sorted(t.read()) == [(1, "a")]
    assert t.read(version=1).count() == 0  # time travel to empty still OK


def test_compact_preserves_rows_and_history(spark, tmp_path):
    """OPTIMIZE-style compaction: fewer live files, identical rows,
    one commit; older versions still read the pre-compaction layout."""
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a")]).coalesce(1), key="k")
    for i in range(2, 6):
        t.append(_mk(spark, [(i, f"v{i}")]).coalesce(1))
    assert len(t._live_files()) == 5
    before = _sorted(t.read())
    v = t.compact(target_files=1)
    assert v == 6 and len(t._live_files()) == 1
    assert _sorted(t.read()) == before
    assert len(t._live_files(version=5)) == 5  # old layout intact
    assert t.history()[-1]["action"] == "compact"
    # idempotent when already compact: no-op commit, no rewrites
    t.compact(target_files=1)
    assert t.history()[-1]["n_added_files"] == 0


def test_schema_evolution_append_and_merge(spark, tmp_path):
    """A later append/merge may carry a NEW column: snapshot reads
    mergeSchema across live files (old rows read NULL), and MERGE
    unions with allowMissingColumns."""
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a"), (2, "b")]), key="k")
    t.append(_mk(spark, [(3, "c", 30)], "k long, v string, score long"))
    got = {r["k"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}
    t.merge(_mk(spark, [(2, "B", 20), (4, "D", 40)],
                "k long, v string, score long"))
    got = {r["k"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("B", 20), 3: ("c", 30), 4: ("D", 40)}
    # time travel predates the column entirely
    assert t.read(version=1).columns == ["k", "v"]


def test_concurrent_merge_and_append_both_land(spark, tmp_path):
    """Conflicting DML race: a MERGE (rewrites files) and an APPEND
    (adds files) run concurrently; optimistic retry must land BOTH —
    final state shows the merge's upsert AND the appended rows."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [(1, "a"), (2, "b")]).coalesce(1), key="k",
    )
    errs: list[Exception] = []

    def do_merge():
        try:
            t.merge(_mk(spark, [(2, "B"), (5, "E")]).coalesce(1))
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def do_append():
        try:
            t.append(_mk(spark, [(9, "z")]).coalesce(1))
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    th = [threading.Thread(target=do_merge), threading.Thread(target=do_append)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert t.latest_version() == 3
    assert _sorted(t.read()) == [(1, "a"), (2, "B"), (5, "E"), (9, "z")]


def test_blazing_context_registers_txn_table(spark, tmp_path):
    """BlazingContext.create_table on a _txn directory registers the
    snapshot (latest or time-traveled via version=) as a SQL view."""
    from pyblazing_spark.context import BlazingContext

    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a"), (2, "b")]), key="k")
    t.append(_mk(spark, [(3, "c")]))
    bc = BlazingContext(spark)
    bc.create_table("tt", path)
    assert bc.sql("SELECT count(*) AS n FROM tt", eager=True)["n"][0] == 3
    bc.create_table("tt1", path, version=1)
    assert bc.sql("SELECT count(*) AS n FROM tt1", eager=True)["n"][0] == 2
    assert "tt" in bc.list_tables()


def test_bucketed_layout_prunes_uniform_key_merges(spark, tmp_path):
    """Hash-bucketed layout (n_buckets=): with UNIFORM keys — the worst
    case for range-stat skipping, where every file overlaps every
    batch — a small merge batch rewrites only the buckets its keys
    hash into; all other bucket files survive BY REFERENCE."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [(i, f"v{i}") for i in range(200)]),
        key="k", n_buckets=8,
    )
    before = {f["path"]: f for f in t._live_files()}
    assert all("bucket" in f for f in before.values())
    assert len({f["bucket"] for f in before.values()}) == 8
    t.merge(_mk(spark, [(7, "SEVEN"), (8, "EIGHT")]))
    after = {f["path"] for f in t._live_files()}
    rewritten_buckets = {
        before[p]["bucket"] for p in set(before) - after
    }
    assert len(rewritten_buckets) <= 2  # two keys -> at most two buckets
    # every file in an untouched bucket survived BY REFERENCE
    for p, f in before.items():
        if f["bucket"] not in rewritten_buckets:
            assert p in after, (p, f)
    got = dict(_sorted(t.read()))
    assert got[7] == "SEVEN" and got[8] == "EIGHT" and got[9] == "v9"
    assert len(got) == 200
    # history + time travel still exact
    assert _sorted(t.read(version=1))[:2] == [(0, "v0"), (1, "v1")]


def test_app_txn_id_makes_replays_idempotent(spark, tmp_path):
    """Exactly-once handshake: a foreachBatch retry re-running the same
    (query, epoch) must be a no-op — same version, same state."""
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a")]), key="k")
    v = t.merge(_mk(spark, [(2, "b")]), app_txn_id="q1:0")
    assert v == 2
    # replay of epoch 0: skipped, version unchanged
    assert t.merge(_mk(spark, [(2, "DUP")]), app_txn_id="q1:0") == 2
    assert t.append(_mk(spark, [(9, "x")]), app_txn_id="q1:0") == 2
    assert _sorted(t.read()) == [(1, "a"), (2, "b")]
    # a NEW epoch applies normally
    assert t.merge(_mk(spark, [(3, "c")]), app_txn_id="q1:1") == 3
    assert t.committed_app_txn_ids() == {"q1:0", "q1:1"}


def test_change_feed_insert_update_delete(spark, tmp_path):
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), key="k")
    t.merge(_mk(spark, [(2, "B"), (4, "D")]))           # v2: upd 2, ins 4
    t.overwrite(_mk(spark, [(1, "a"), (2, "B")]))       # v3: del 3, del 4
    rows = {
        (r["_commit_version"], r["_change_type"], r["k"], r["v"])
        for r in t.change_feed(1).collect()
    }
    assert rows == {
        (2, "update_postimage", 2, "B"),
        (2, "insert", 4, "D"),
        (3, "delete", 3, "c"),   # deletes carry the pre-image
        (3, "delete", 4, "D"),
    }
    # bounded range: only v2's changes
    assert {r["_commit_version"] for r in t.change_feed(1, 2).collect()} == {2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.change_feed(3)  # empty range


def test_vacuum_orphans_respects_grace(spark, tmp_path):
    import os as _os

    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k")
    # simulate a lost commit race: staged data dir, never committed
    t._write_data(_mk(spark, [(9, "orphan")]), "k")
    n_before = sum(len(fs) for _, _, fs in _os.walk(_os.path.join(path, "data")))
    assert t.vacuum(1, orphans=True, orphan_grace_sec=3600) == []  # too young
    dropped = t.vacuum(1, orphans=True, orphan_grace_sec=0.0)
    assert dropped  # orphan gone once past grace
    assert _sorted(t.read()) == [(1, "a")]  # committed data intact
    n_after = sum(len(fs) for _, _, fs in _os.walk(_os.path.join(path, "data")))
    assert n_after < n_before


def test_read_key_between_prunes_manifest_files(spark, tmp_path):
    """Manifest-level data skipping: read(key_between=) must exclude
    range-disjoint files BEFORE Spark lists them, and (point lookup on
    a bucketed table) everything outside the key's hash bucket — while
    returning exactly the rows in range."""
    path = str(tmp_path / "t")
    low = _mk(spark, [(i, "low") for i in range(10)]).coalesce(1)
    high = _mk(spark, [(i, "high") for i in range(1000, 1010)]).coalesce(1)
    t = TxnTable.create(spark, path, low, key="k")
    t.append(high)
    pruned = t.read(key_between=(1002, 1004))
    # the scan's file list excludes the low-range file entirely
    scanned = pruned.inputFiles()
    assert len(scanned) == 1 and "low" not in str(
        _sorted(pruned)
    ), scanned
    assert _sorted(pruned) == [(1002, "high"), (1003, "high"), (1004, "high")]
    # bucketed point lookup: exactly one bucket's file scanned
    tb = TxnTable.create(
        spark, str(tmp_path / "tb"),
        _mk(spark, [(i, f"v{i}") for i in range(100)]),
        key="k", n_buckets=8,
    )
    got = tb.read(key_between=(42, 42))
    assert len(got.inputFiles()) == 1
    assert _sorted(got) == [(42, "v42")]


def test_randomized_dml_sequences_match_dict_model(spark, tmp_path):
    """Model-based check: random create/append/merge/overwrite/compact
    sequences (bucketed and not) must track a plain Python dict model
    after EVERY commit, and every historical version must time-travel
    to its recorded model snapshot at the end."""
    import random

    rng = random.Random(1307)
    for case in range(4):
        n_buckets = rng.choice([None, 4])
        path = str(tmp_path / f"m{case}")
        rows = [(k, f"c{case}_{k}") for k in rng.sample(range(50), 8)]
        t = TxnTable.create(spark, path, _mk(spark, rows), key="k",
                            n_buckets=n_buckets)
        model = dict(rows)
        snapshots = {1: dict(model)}
        for _ in range(6):
            op = rng.choice(["append", "merge", "overwrite", "compact"])
            if op == "append":
                new = [
                    (k, f"a{k}")
                    for k in rng.sample(range(100, 200), rng.randint(1, 5))
                    if k not in model
                ]
                v = t.append(_mk(spark, new or [(999, "pad")]))
                for k, s in new or [(999, "pad")]:
                    model[k] = s
            elif op == "merge":
                batch = [
                    (k, f"m{k}")
                    for k in rng.sample(range(60), rng.randint(0, 6))
                ]
                v = t.merge(_mk(spark, batch))
                model.update(batch)
            elif op == "overwrite":
                batch = [
                    (k, f"o{k}") for k in rng.sample(range(40), rng.randint(1, 6))
                ]
                v = t.overwrite(_mk(spark, batch))
                model = dict(batch)
            else:
                v = t.compact(target_files=1)
            snapshots[v] = dict(model)
            got = dict(_sorted(t.read()))
            assert got == model, (case, op, v)
        for v, want in snapshots.items():
            assert dict(_sorted(t.read(version=v))) == want, (case, v)
        # change_feed must equal the model's snapshot diffs, version
        # by version (inserts/updates/deletes incl. pre-image deletes)
        head = t.latest_version()
        feed: dict[int, set] = {v: set() for v in range(2, head + 1)}
        for r in t.change_feed(1).collect():
            feed[r["_commit_version"]].add(
                (r["_change_type"], r["k"], r["v"])
            )
        for v in range(2, head + 1):
            prev, cur = snapshots[v - 1], snapshots[v]
            want_changes = (
                {("insert", k, s) for k, s in cur.items() if k not in prev}
                | {
                    ("update_postimage", k, s)
                    for k, s in cur.items()
                    if k in prev and prev[k] != s
                }
                | {
                    ("delete", k, s)
                    for k, s in prev.items()
                    if k not in cur
                }
            )
            assert feed[v] == want_changes, (case, v)


def test_commit_files_are_atomic_json(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k")
    t.append(_mk(spark, [(2, "b")]))
    log_dir = os.path.join(path, "_txn")
    names = sorted(os.listdir(log_dir))
    assert names == ["v00000001.json", "v00000002.json"]  # no tmp litter
    v2 = json.load(open(os.path.join(log_dir, names[1])))
    assert v2["action"] == "append" and v2["parent"] == 1
    assert all(a["rows"] == 1 for a in v2["add"])
    assert "min" in v2["add"][0] and "max" in v2["add"][0]
