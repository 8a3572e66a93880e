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


def test_small_bucketed_merge_writes_few_files_and_still_prunes(spark, tmp_path):
    """rows_hint-adaptive write fan-out (r15): a tiny merge into a
    bucketed table must write ~1 grouped file (not one near-empty file
    per bucket), record the file's possible-bucket set, and keep every
    prune exact — point lookups on uninvolved keys skip the grouped
    file, lookups on merged keys find it, and a later merge still
    bucket-prunes correctly (the r13 lost-update trap)."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [(i, f"v{i}") for i in range(200)]),
        key="k", n_buckets=8,
    )
    v1_files = {f["path"] for f in t._live_files()}
    t.merge(_mk(spark, [(7, "SEVEN"), (201, "NEW")]))
    new = [f for f in t._live_files() if f["path"] not in v1_files]
    # 2-key merge, default 1M-row target -> exactly one grouped file
    assert len(new) == 1, new
    assert "buckets" in new[0] and "bucket" not in new[0]
    # the recorded set is candidate-tightened: <= |src ∪ hit buckets|
    assert 1 <= len(new[0]["buckets"]) <= 4, new[0]
    # contents exact
    got = dict(_sorted(t.read()))
    assert got[7] == "SEVEN" and got[201] == "NEW" and got[9] == "v9"
    assert len(got) == 201
    # point lookup on a MERGED key finds the grouped file's row
    assert _sorted(t.read(key_between=(201, 201))) == [(201, "NEW")]
    # point lookup on an uninvolved key: the grouped file is skipped
    # whenever its bucket set excludes the key's bucket
    from pyblazing_spark.sources.txn_table import _bucket_of_literal
    from pyspark.sql.types import LongType

    probe = next(
        k for k in range(200)
        if _bucket_of_literal(k, LongType(), 8) not in new[0]["buckets"]
    )
    lookup = t.read(key_between=(probe, probe))
    assert len(lookup.inputFiles()) == 1
    assert _sorted(lookup) == [(probe, f"v{probe}")]
    # a second merge touching a grouped-file key must rewrite it
    t.merge(_mk(spark, [(7, "SEVEN2")]))
    assert dict(_sorted(t.read()))[7] == "SEVEN2"
    # and compact with a known row count collapses to few files
    t.compact(target_files=1)
    assert len(t._live_files()) == 1
    assert dict(_sorted(t.read()))[7] == "SEVEN2"
    assert len(dict(_sorted(t.read()))) == 201


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
    to its recorded model snapshot at the end. checkpoint_interval=3
    forces every 7-commit sequence ACROSS >=2 checkpoint boundaries
    (VERDICT r14 #1): per-commit reads, end-state time travel (above,
    at, and below a checkpoint) and the change feed all run through
    the ckpt + suffix-replay path. Odd cases run with cdf=True, so the
    WRITE-TIME change feed is validated against the same model diffs
    as the snapshot-reconstruction feed."""
    import random

    rng = random.Random(1307)
    for case in range(4):
        n_buckets = rng.choice([None, 4])
        path = str(tmp_path / f"m{case}")
        rows = [(k, f"c{case}_{k}") for k in rng.sample(range(50), 8)]
        t = TxnTable.create(spark, path, _mk(spark, rows), key="k",
                            n_buckets=n_buckets, checkpoint_interval=3,
                            cdf=bool(case % 2))
        model = dict(rows)
        snapshots = {1: dict(model)}
        for i_op in range(6):
            op = rng.choice(["append", "merge", "overwrite", "compact"])
            if op == "append":
                new = [
                    (k, f"a{k}")
                    for k in rng.sample(range(100, 200), rng.randint(1, 5))
                    if k not in model
                ]
                # fallback key is unique per (case, op): appends must
                # stay key-fresh (the cdf=True insert-only derivation
                # assumes it, and re-appending a live key would put two
                # rows behind one model key anyway)
                fallback = [(900 + case * 10 + i_op, "pad")]
                v = t.append(_mk(spark, new or fallback))
                for k, s in new or fallback:
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
        assert any(
            f.startswith("ckpt-v")
            for f in os.listdir(os.path.join(path, "_txn"))
        ), "7 commits at interval 3 must have published a checkpoint"
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


# ---------------------------------------------------- r14: checkpoints
def test_checkpoint_state_equals_full_replay(spark, tmp_path):
    """The checkpointed state (_state_at = newest ckpt + suffix replay)
    must equal a from-scratch replay of every raw commit file, at the
    head AND at versions below/at/above each checkpoint (checkpoints
    are an index, never a truncation)."""
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(0, "base")]), key="k",
                        checkpoint_interval=3)
    t.append(_mk(spark, [(1, "a")]))
    t.merge(_mk(spark, [(1, "A"), (2, "b")]), app_txn_id="q:0")
    t.append(_mk(spark, [(3, "c")]), app_txn_id="q:1")
    t.overwrite(_mk(spark, [(9, "z")]))
    t.append(_mk(spark, [(10, "y")]))
    t.merge(_mk(spark, [(9, "Z")]))
    log_dir = os.path.join(path, "_txn")
    ckpts = sorted(f for f in os.listdir(log_dir) if f.startswith("ckpt-v"))
    assert ckpts == ["ckpt-v00000003.json", "ckpt-v00000006.json"]

    def replay_live(upto):
        live = {}
        for v in range(1, upto + 1):
            e = json.load(open(os.path.join(log_dir, "v%08d.json" % v)))
            for rel in e.get("remove", []):
                live.pop(rel, None)
            for a in e.get("add", []):
                live[a["path"]] = a
        return live

    for v in range(1, t.latest_version() + 1):
        st = t._state_at(v)
        assert st["live"] == replay_live(v), v
        assert dict(_sorted(t.read(version=v))) == dict(
            _sorted(TxnTable(spark, path, checkpoint_interval=0).read(version=v))
        )
    # app_txn_ids accumulated ACROSS the checkpoint boundary (v3 ckpt
    # carries q:0; v4's q:1 comes from the suffix)
    assert t.committed_app_txn_ids() == {"q:0", "q:1"}
    # ckpt content sanity: live list + schema + key recorded
    ck = json.load(open(os.path.join(log_dir, ckpts[-1])))
    assert ck["key"] == "k" and ck["schema"] and ck["app_txn_ids"] == ["q:0", "q:1"]
    assert {f["path"] for f in ck["live"]} == set(replay_live(6))


def test_checkpoint_bounds_commit_reads(spark, tmp_path):
    """The scale contract itself: reading the head snapshot of a
    checkpointed table must open at most checkpoint_interval commit
    files + 1 checkpoint — NOT the whole log (the O(commits) replay
    was VERDICT r13's one standing scale-killer)."""
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(0, "x")]), key="k",
                        checkpoint_interval=5)
    for i in range(1, 13):  # head = 13, ckpts at 5 and 10
        t.append(_mk(spark, [(i, f"v{i}")]))
    opened = []
    orig = TxnTable._load_commit

    def counting(self, v):
        opened.append(v)
        return orig(self, v)

    TxnTable._load_commit = counting
    try:
        t2 = TxnTable(spark, path, checkpoint_interval=5)
        assert len(t2._live_files()) == 13
    finally:
        TxnTable._load_commit = orig
    suffix = [v for v in opened if v > 1]  # table_key reads v1, allowed
    assert suffix == [11, 12, 13], suffix


def test_torn_checkpoint_falls_back_to_full_replay(spark, tmp_path):
    """A corrupt/torn checkpoint file must never break reads — the
    checkpoint is an index over the log, not the source of truth."""
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k",
                        checkpoint_interval=2)
    t.append(_mk(spark, [(2, "b")]))
    ckpt = os.path.join(path, "_txn", "ckpt-v00000002.json")
    assert os.path.exists(ckpt)
    with open(ckpt, "w") as fh:
        fh.write('{"version": 2, "liv')  # torn mid-write
    assert _sorted(t.read()) == [(1, "a"), (2, "b")]
    assert t.committed_app_txn_ids() == set()


def test_checkpoint_disabled_interval_zero(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k",
                        checkpoint_interval=0)
    for i in range(2, 8):
        t.append(_mk(spark, [(i, f"v{i}")]))
    assert not any(
        f.startswith("ckpt-") for f in os.listdir(os.path.join(path, "_txn"))
    )
    assert len(_sorted(t.read())) == 7


# ------------------------------------------------- r14: ADVICE closures
def test_vacuum_rejects_cutoff_above_head(spark, tmp_path):
    """ADVICE r13: retain_from_version > head used to compute an EMPTY
    keep-set and delete every live data file."""
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a")]), key="k")
    t.append(_mk(spark, [(2, "b")]))
    with pytest.raises(ValueError, match="retain_from_version"):
        t.vacuum(retain_from_version=99)
    with pytest.raises(ValueError):
        t.vacuum(retain_from_version=0)
    assert _sorted(t.read()) == [(1, "a"), (2, "b")]  # nothing deleted


def test_vacuum_dir_prune_respects_temporary_and_grace(spark, tmp_path):
    """ADVICE r13: the empty-dir prune must not rmtree a racing Spark
    writer's staged dir (only _temporary/ until task commit) — dirs
    follow the same orphans+grace rules as files."""
    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k")
    staged = os.path.join(path, "data", "aaaa_inflight")
    os.makedirs(os.path.join(staged, "_temporary"))
    empty = os.path.join(path, "data", "bbbb_empty")
    os.makedirs(empty)
    # orphans=False: no dir pruning at all
    t.vacuum(1)
    assert os.path.isdir(staged) and os.path.isdir(empty)
    # orphans=True within grace: both survive
    t.vacuum(1, orphans=True, orphan_grace_sec=3600)
    assert os.path.isdir(staged) and os.path.isdir(empty)
    # past grace: the empty dir goes, the in-flight _temporary dir stays
    t.vacuum(1, orphans=True, orphan_grace_sec=0.0)
    assert os.path.isdir(staged)
    assert not os.path.isdir(empty)


def test_date_and_timestamp_keys_prune_and_merge(spark, tmp_path):
    """ADVICE r13: JSON-persisted date/timestamp stats used to raise
    TypeError (str vs datetime.date) on the first merge or key_between
    read. ISO canonicalization is order-isomorphic, so pruning must
    WORK, not just not-crash."""
    import datetime as dt

    path = str(tmp_path / "t")
    rows = [(dt.date(2024, 1, d), f"d{d}") for d in range(1, 11)]
    early = spark.createDataFrame(rows[:5], "k date, v string").coalesce(1)
    late = spark.createDataFrame(rows[5:], "k date, v string").coalesce(1)
    t = TxnTable.create(spark, path, early, key="k")
    t.append(late)
    got = t.read(key_between=(dt.date(2024, 1, 7), dt.date(2024, 1, 8)))
    assert len(got.inputFiles()) == 1  # early file pruned by ISO stats
    assert _sorted(got) == [
        (dt.date(2024, 1, 7), "d7"), (dt.date(2024, 1, 8), "d8")]
    # merge with a date-keyed source: range-disjoint file survives
    before = {f["path"] for f in t._live_files()}
    t.merge(spark.createDataFrame(
        [(dt.date(2024, 1, 9), "D9"), (dt.date(2024, 1, 20), "NEW")],
        "k date, v string").coalesce(1))
    after = {f["path"] for f in t._live_files()}
    assert len(before & after) == 1  # the early file survived by reference
    got = dict(_sorted(t.read()))
    assert got[dt.date(2024, 1, 9)] == "D9"
    assert got[dt.date(2024, 1, 20)] == "NEW"
    # timestamp key end-to-end too
    ts = [(dt.datetime(2024, 1, 1, h), h) for h in range(10)]
    t2 = TxnTable.create(
        spark, str(tmp_path / "ts"),
        spark.createDataFrame(ts[:5], "k timestamp, n long").coalesce(1),
        key="k")
    t2.append(spark.createDataFrame(ts[5:], "k timestamp, n long").coalesce(1))
    got = t2.read(key_between=(dt.datetime(2024, 1, 1, 7),
                               dt.datetime(2024, 1, 1, 8)))
    assert len(got.inputFiles()) == 1
    assert sorted(r["n"] for r in got.collect()) == [7, 8]


def test_incompatible_bound_type_raises(spark, tmp_path):
    """A bound whose type cannot be compared against recorded stats is
    a loud error, never a silent mis-prune."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [(1, "a"), (2, "b")]), key="k")
    with pytest.raises(ValueError, match="not\\s+comparable"):
        t.read(key_between=("x", "y"))


def test_change_feed_detects_null_column_swap(spark, tmp_path):
    """ADVICE r13: xxhash64 skips NULL inputs, so an update moving the
    same value between columns (a: X->NULL, b: NULL->X) hashed
    identically and was silently omitted; eqNullSafe catches it."""
    df1 = spark.createDataFrame([(1, "X", None), (2, "q", "r")],
                                "k long, a string, b string")
    df2 = spark.createDataFrame([(1, None, "X"), (2, "q", "r")],
                                "k long, a string, b string")
    t = TxnTable.create(spark, str(tmp_path / "t"), df1.coalesce(1), key="k")
    t.overwrite(df2.coalesce(1))
    rows = {(r["k"], r["_change_type"], r["a"], r["b"])
            for r in t.change_feed(1).collect()}
    assert rows == {(1, "update_postimage", None, "X")}


def test_app_txn_id_revalidated_inside_commit_retry(spark, tmp_path):
    """ADVICE r13: the exactly-once check ran only BEFORE the retry
    loop — two writers replaying the same epoch could both pass it.
    The recheck inside build() must no-op even when the pre-check is
    (simulated) stale."""
    import unittest.mock as mock

    path = str(tmp_path / "t")
    t = TxnTable.create(spark, path, _mk(spark, [(1, "a")]), key="k")
    t.merge(_mk(spark, [(2, "b")]), app_txn_id="q:0")  # v2 commits q:0
    head = t.latest_version()
    # writer whose PRE-check is stale (sees no committed ids — the
    # concurrent-writer window); build's revalidation must still skip
    with mock.patch.object(TxnTable, "committed_app_txn_ids",
                           return_value=set()):
        assert t.merge(_mk(spark, [(2, "DUP")]), app_txn_id="q:0") == head
        assert t.append(_mk(spark, [(9, "DUP")]), app_txn_id="q:0") == head
    assert t.latest_version() == head
    assert _sorted(t.read()) == [(1, "a"), (2, "b")]


# ------------------------------------- r14: per-column stats + where=
def test_read_where_prunes_on_non_key_column(spark, tmp_path):
    """Generalized data skipping (VERDICT r14 #7): _write_data records
    min/max for every leaf scalar column; read(where=) prunes files on
    a NON-key column's stats before Spark lists them."""
    path = str(tmp_path / "t")
    rows = [(i, i * 10, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, score long, v string")
    t = TxnTable.create(
        spark, path, df.repartitionByRange(8, "score"), key="k")
    live = t._live_files()
    assert all("stats" in f and "score" in f["stats"] for f in live)
    got = t.read(where={"score": (300, 420)})
    assert 0 < len(got.inputFiles()) < len(live)
    assert sorted(r["k"] for r in got.collect()) == list(range(30, 43))
    # combined bounds: key AND non-key column prune together
    got2 = t.read(key_between=(35, 60), where={"score": (300, 420)})
    assert sorted(r["k"] for r in got2.collect()) == list(range(35, 43))
    # a column without recorded stats never prunes (strings recorded
    # here though — verify string stats round-trip and prune correctly)
    got3 = t.read(where={"v": ("v42", "v42")})
    assert [r["k"] for r in got3.collect()] == [42]


def test_compact_cluster_by_restores_skipping_locality(spark, tmp_path):
    """After merges scatter value ranges across files, compact(
    cluster_by=) range-reclusters the live set so per-file stats are
    tight again and where= pruning bites (OPTIMIZE ZORDER-lite)."""
    path = str(tmp_path / "t")
    rows = [(i, i * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, score long")
    t = TxnTable.create(spark, path, df.repartition(4), key="k")
    # random layout: a narrow score slice touches every file
    assert len(t.read(where={"score": (500, 600)}).inputFiles()) == len(
        t._live_files())
    t.compact(target_files=4, cluster_by="score")
    pruned = t.read(where={"score": (500, 600)})
    assert len(pruned.inputFiles()) == 1
    assert sorted(r["k"] for r in pruned.collect()) == list(range(50, 61))
    assert dict((r["k"], r["score"]) for r in t.read().collect()) == dict(rows)


# ------------------------------- r14: two-process writer-race (VERDICT #3)
def _race_commits(args):
    """Child-process worker: N optimistic commits against a shared log
    via the REAL TxnTable publication path (no Spark needed — the
    commit protocol is pure manifest arithmetic)."""
    path, writer, n = args
    t = TxnTable.__new__(TxnTable)
    t.path, t.checkpoint_interval = path, 0
    t._log = os.path.join(path, "_txn")
    out = []
    for i in range(n):
        v = t._commit_with_retry(
            lambda snap: {"action": "append",
                          "add": [{"path": f"data/w{writer}_{i}", "rows": 1}],
                          "remove": [], "key": "k"},
            max_retries=200,
        )
        out.append(v)
    return out


def test_two_process_commit_race_is_serializable(tmp_path):
    """The optimistic-commit claim rests on os.link put-if-absent being
    atomic ACROSS PROCESSES (threads share the CPython runtime and
    prove less — VERDICT r14 #3). Four real processes race 10 commits
    each on one table: every commit must land, versions must be
    contiguous and unique, and every writer's files must be live."""
    import multiprocessing as mp

    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "_txn"))
    t0 = TxnTable.__new__(TxnTable)
    t0.path, t0.checkpoint_interval = path, 0
    t0._log = os.path.join(path, "_txn")
    t0._commit_with_retry(
        lambda snap: {"action": "create", "add": [], "remove": [],
                      "key": "k", "schema": None, "n_buckets": None},
        max_retries=0)
    with mp.get_context("spawn").Pool(4) as pool:
        results = pool.map(
            _race_commits, [(path, w, 10) for w in range(4)])
    all_versions = [v for r in results for v in r]
    assert sorted(all_versions) == list(range(2, 42))  # contiguous, unique
    live = {f["path"] for f in t0._live_files()}
    assert live == {f"data/w{w}_{i}" for w in range(4) for i in range(10)}
    # log files themselves are gap-free and parseable
    vs = sorted(int(f[1:9]) for f in os.listdir(t0._log)
                if f.startswith("v") and f.endswith(".json"))
    assert vs == list(range(1, 42))


# ------------------------------------------------ r14: write-time CDF
def test_write_time_cdf_equals_snapshot_diff_and_reads_no_snapshots(
    spark, tmp_path
):
    """cdf=True persists change rows at commit time (Delta's
    enableChangeDataFeed): the feed must be VALUE-identical to the
    snapshot-reconstruction feed over the same DML history, and must be
    served entirely from cdf/add files — never from a snapshot diff."""
    seq = [
        ("create", [(1, "a"), (2, "b"), (3, "c")]),
        ("append", [(10, "j"), (11, "k")]),
        ("merge", [(2, "B"), (4, "D"), (10, "j")]),  # upd, ins, no-change
        ("overwrite", [(1, "a"), (2, "X"), (5, "e")]),  # del 3/4/10/11
        ("compact", None),
    ]

    def run(path, cdf):
        t = None
        for op, rows in seq:
            if op == "create":
                t = TxnTable.create(spark, path, _mk(spark, rows),
                                    key="k", cdf=cdf)
            elif op == "append":
                t.append(_mk(spark, rows))
            elif op == "merge":
                t.merge(_mk(spark, rows))
            elif op == "overwrite":
                t.overwrite(_mk(spark, rows))
            else:
                t.compact(target_files=1)
        return t

    t_diff = run(str(tmp_path / "plain"), cdf=False)
    t_cdf = run(str(tmp_path / "cdf"), cdf=True)
    assert not t_diff.table_cdf() and t_cdf.table_cdf()

    def feed_set(t):
        return {
            (r["_commit_version"], r["_change_type"], r["k"], r["v"])
            for r in t.change_feed(1).collect()
        }

    want = feed_set(t_diff)
    assert feed_set(t_cdf) == want
    assert (2, "insert", 10, "j") in want
    assert (3, "update_postimage", 2, "B") in want
    assert (4, "delete", 10, "j") in want  # pre-image
    assert not any(v == 5 for v, *_ in want)  # compact: zero changes
    # every commit after create carries write-time CDF metadata
    for v in range(2, t_cdf.latest_version() + 1):
        e = t_cdf._load_commit(v)
        assert "cdf_add" in e or e.get("cdf_from_add"), v
    # the feed's scan set is cdf_add files + insert-only add files:
    # NO file that a snapshot diff would read (the removed pre-images)
    allowed = set()
    for v in range(2, t_cdf.latest_version() + 1):
        e = t_cdf._load_commit(v)
        entries = e["cdf_add"] if "cdf_add" in e else e["add"]
        allowed.update(
            os.path.join(t_cdf.path, a["path"]) for a in entries
        )
    got_files = {
        f.replace("file://", "", 1) if f.startswith("file://") else f
        for f in t_cdf.change_feed(1).inputFiles()
    }
    assert got_files <= allowed, got_files - allowed
    # bounded range + persisted path agree too
    assert {r["_commit_version"]
            for r in t_cdf.change_feed(2, 4).collect()} == {3, 4}


def test_cdf_files_survive_vacuum_within_retention(spark, tmp_path):
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a")]), key="k", cdf=True)
    t.merge(_mk(spark, [(1, "A"), (2, "b")]))      # v2: upd + ins
    t.overwrite(_mk(spark, [(9, "z")]))            # v3: dels + ins
    t.merge(_mk(spark, [(9, "Z")]))                # v4: upd
    dropped = t.vacuum(retain_from_version=3, orphans=True,
                       orphan_grace_sec=0.0)
    # v2's snapshot data below the cutoff may go; the RETAINED feed
    # (v3, v4) must still serve from persisted change rows
    rows = {
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in t.change_feed(2).collect()
    }
    assert rows == {(3, "delete", 1), (3, "delete", 2), (3, "insert", 9),
                    (4, "update_postimage", 9)}
    assert _sorted(t.read()) == [(9, "Z")]
    assert dropped  # something below the cutoff was reclaimed


def test_cdf_with_schema_evolution_merge(spark, tmp_path):
    """Evolution-null columns in the write-time diff must be TYPED
    (untyped NullType cannot be written to parquet)."""
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        _mk(spark, [(1, "a"), (2, "b")]), key="k",
                        cdf=True)
    t.merge(_mk(spark, [(2, "B", 20), (4, "D", 40)],
                "k long, v string, score long"))
    rows = {
        (r["_change_type"], r["k"], r["v"], r["score"])
        for r in t.change_feed(1).collect()
    }
    assert rows == {("update_postimage", 2, "B", 20),
                    ("insert", 4, "D", 40)}


def test_literal_bucket_hash_matches_spark(spark):
    """The driver-side XXH64 used by the bucketed point-lookup prune
    (r14: replaced a spark.range(1) JOB per read) must equal Spark's
    pmod(xxhash64(lit cast ktype), n) for every supported key type —
    a divergence silently reads the WRONG bucket's single file."""
    import datetime
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DateType,
        IntegerType,
        LongType,
        StringType,
        TimestampNTZType,
    )

    from pyblazing_spark.sources.txn_table import _bucket_of_literal

    rng = random.Random(42)
    cases = []
    for _ in range(12):
        cases.append((rng.randint(-2**63, 2**63 - 1), LongType()))
        cases.append((rng.randint(-2**31, 2**31 - 1), IntegerType()))
        cases.append(
            (
                datetime.date(1970, 1, 1)
                + datetime.timedelta(days=rng.randint(-20000, 20000)),
                DateType(),
            )
        )
        cases.append(
            (
                datetime.datetime(2020, 1, 1)
                + datetime.timedelta(
                    seconds=rng.randint(0, 10**8),
                    microseconds=rng.randint(0, 999999),
                ),
                TimestampNTZType(),
            )
        )
    exprs, expected = [], []
    for i, (v, t) in enumerate(cases):
        exprs.append(
            F.pmod(F.xxhash64(F.lit(v).cast(t)), F.lit(257)).alias(f"b{i}")
        )
        expected.append(_bucket_of_literal(v, t, 257))
    row = spark.range(1).select(*exprs).collect()[0]
    assert [row[f"b{i}"] for i in range(len(cases))] == expected
    # unsupported types must route to the Spark fallback, never a wrong int
    assert _bucket_of_literal("abc", StringType(), 257) is None
    # TimestampType (tz-adjusted) and tz-aware datetimes must ALSO fall
    # back (ADVICE r14 medium): a naive datetime literal is converted
    # to TimestampType micros through the PYTHON PROCESS's local
    # timezone (pyspark's converter uses mktime), so a driver-side
    # wall-clock hash diverges on any non-UTC box. Proven by scoping
    # TZ/tzset: Spark's own hash of the same naive literal differs
    # from the NTZ wall-clock hash the old fast path would have used.
    import time as _time

    from pyspark.sql.types import TimestampType

    naive = datetime.datetime(2021, 6, 1, 12, 34, 56, 789000)
    aware = naive.replace(tzinfo=datetime.timezone(datetime.timedelta(hours=3)))
    assert _bucket_of_literal(naive, TimestampType(), 257) is None
    assert _bucket_of_literal(aware, TimestampType(), 257) is None
    assert _bucket_of_literal(aware, TimestampNTZType(), 257) is None
    prev_tz = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "Asia/Kolkata"  # UTC+5:30 — not DST-affected
        _time.tzset()
        tz_hash = spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(naive).cast(TimestampType())), F.lit(257))
        ).collect()[0][0]
    finally:
        if prev_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev_tz
        _time.tzset()
    ntz_hash = _bucket_of_literal(naive, TimestampNTZType(), 257)
    assert tz_hash != ntz_hash  # the divergence the fallback guards against
