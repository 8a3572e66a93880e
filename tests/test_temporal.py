"""Temporal joins: as-of semantics (ties, no-match, payload carry) and
bucketed range join equality with the naive inequality join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pyblazing_spark.operators import temporal as TP
from pyblazing_spark.sources.tables import load_table


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
        ],
        "uid bigint, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),  # exact tie -> visible
            (1, _ts("2024-01-01T11:30:00"), 200.0),
            (2, _ts("2024-01-01T09:30:00"), 50.0),
        ],
        "uid bigint, ts timestamp_ntz, px double",
    )
    out = {r.tag: r for r in TP.asof_join(left, right, on="uid", right_cols=["px"]).collect()}
    assert out["a"].px_right == 100.0 and out["a"].ts_right == _ts("2024-01-01T10:00:00")
    assert out["b"].px_right == 200.0
    assert out["c"].px_right is None and out["c"].ts_right is None


def test_asof_null_payload_not_stitched(spark):
    """A legitimately-NULL right payload value must ride with ITS OWN
    row's timestamp — column-wise first/last(ignorenulls) used to stitch
    the value from a farther right row onto the nearer row's ts
    (ADVICE r5 #1).  Both directions, struct-carried payload."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "L")],
        "uid bigint, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T11:00:00"), None),  # nearest-before: NULL px
        ],
        "uid bigint, ts timestamp_ntz, px double",
    )
    (row,) = TP.asof_join(left, right, on="uid", right_cols=["px"]).collect()
    assert row.ts_right == _ts("2024-01-01T11:00:00")
    assert row.px_right is None  # NOT 100.0 from the 10:00 row

    right_fwd = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T13:00:00"), None),  # nearest-after: NULL px
            (1, _ts("2024-01-01T14:00:00"), 300.0),
        ],
        "uid bigint, ts timestamp_ntz, px double",
    )
    (row,) = TP.asof_join_forward(
        left, right_fwd, on="uid", right_cols=["px"]
    ).collect()
    assert row.ts_right == _ts("2024-01-01T13:00:00")
    assert row.px_right is None  # NOT 300.0 from the 14:00 row


def test_asof_equal_right_ts_deterministic(spark):
    """Equal right timestamps per key tie-break deterministically (by
    payload-struct hash) and identically in both directions."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"))], "uid bigint, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 1.0),
            (1, _ts("2024-01-01T11:00:00"), 2.0),
            (1, _ts("2024-01-01T13:00:00"), 3.0),
            (1, _ts("2024-01-01T13:00:00"), 4.0),
        ],
        "uid bigint, ts timestamp_ntz, px double",
    )
    back = [
        TP.asof_join(left, right.repartition(n), on="uid", right_cols=["px"])
        .collect()[0]
        .px_right
        for n in (1, 3, 7)
    ]
    fwd = [
        TP.asof_join_forward(left, right.repartition(n), on="uid", right_cols=["px"])
        .collect()[0]
        .px_right
        for n in (1, 3, 7)
    ]
    assert len(set(back)) == 1 and back[0] in (1.0, 2.0)
    assert len(set(fwd)) == 1 and fwd[0] in (3.0, 4.0)


def test_asof_map_typed_payload_carries(spark):
    """Map-typed right payload columns work: xxhash64 raises on MapType,
    so the tie hash routes them through to_json — the carried struct
    still delivers the map value. The pre-r6 column-wise carrier
    accepted maps, so this is a capability-regression guard."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"))], "uid bigint, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), {"k": 1}, 10.0),
            (1, _ts("2024-01-01T11:00:00"), {"k": 2}, 20.0),
        ],
        "uid bigint, ts timestamp_ntz, attrs map<string,bigint>, px double",
    )
    (row,) = TP.asof_join(
        left, right, on="uid", right_cols=["attrs", "px"]
    ).collect()
    assert row.attrs_right == {"k": 2} and row.px_right == 20.0
    # forward direction: no match after 12:00 -> NULL map, no crash
    (fwd,) = TP.asof_join_forward(
        left, right, on="uid", right_cols=["attrs", "px"]
    ).collect()
    assert fwd.attrs_right is None and fwd.px_right is None


def test_asof_tie_on_map_only_difference_is_deterministic(spark):
    """Two right rows with equal key+timestamp differing ONLY in a map
    column must tie-break deterministically (ADVICE r7 #2: excluding
    maps from the hash made the pick partitioning-dependent). The map
    enters the hash via to_json, so repeated runs under different
    partitionings agree."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"))], "uid bigint, ts timestamp_ntz"
    )
    rows = [
        (1, _ts("2024-01-01T11:00:00"), {"k": 1}),
        (1, _ts("2024-01-01T11:00:00"), {"k": 2}),
    ]
    picks = set()
    for nparts in (1, 2, 5):
        right = spark.createDataFrame(
            rows, "uid bigint, ts timestamp_ntz, attrs map<string,bigint>"
        ).repartition(nparts)
        (row,) = TP.asof_join(left, right, on="uid", right_cols=["attrs"]).collect()
        picks.add(row.attrs_right["k"])
    assert len(picks) == 1, f"nondeterministic map-only tie pick: {picks}"


def test_asof_join_matches_duckdb_shape_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = TP.asof_join(clicks, buys, on="user_id", right_cols=["value"])
    assert out.count() == clicks.count()  # left-join semantics: no row loss
    bad = out.where(F.col("ts_right") > F.col("ts")).count()
    assert bad == 0  # matched row never from the future


def test_range_join_equals_naive(spark, sf_dir):
    """Bucketed range join == naive inequality join, row for row."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    # derive per-user activity intervals: hour bucket start/end +- slack
    intervals = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
        .select("user_id", "start", "end")
    )
    bucketed = TP.range_join(
        ev, intervals, left_point="ts", right_start="start", right_end="end",
        equi_keys=["user_id"],
    )
    naive = ev.join(intervals, "user_id").where(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    key = ["user_id", "event_id", "start", "end"]
    assert sorted(map(tuple, bucketed.select(*key).collect())) == sorted(
        map(tuple, naive.select(*key).collect())
    )
    assert bucketed.count() > 0


def test_range_join_without_equi_keys(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00")), (2, _ts("2024-01-01T13:30:00"))],
        "pid bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("w1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00")),
            ("w2", _ts("2024-01-01T12:00:00"), _ts("2024-01-01T14:00:00")),
        ],
        "win string, start timestamp_ntz, end timestamp_ntz",
    )
    out = {
        (r.pid, r.win)
        for r in TP.range_join(left, right, "ts", "start", "end").collect()
    }
    assert out == {(1, "w1"), (2, "w2")}


def test_interval_overlap_join_equals_naive(spark):
    """Bucketed interval×interval overlap join must emit exactly the
    naive O(n²) pair set, each pair ONCE — across intervals spanning
    zero, one, and many buckets (bucket width 10 over long points)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyblazing_spark.operators.temporal as TP
    from pyspark.sql import functions as F

    @st.composite
    def _intervals(draw):
        n = draw(st.integers(1, 8))
        out = []
        for i in range(n):
            s = draw(st.integers(0, 50))
            out.append((i, s, s + draw(st.integers(0, 25))))
        return out

    @settings(max_examples=8, deadline=None)
    @given(_intervals(), _intervals())
    def run(lrows, rrows):
        left = spark.createDataFrame(lrows, "lid long, ls long, le long")
        right = spark.createDataFrame(rrows, "rid long, rs long, re long")
        got = [
            (r.lid, r.rid)
            for r in TP.interval_overlap_join(
                left, right, "ls", "le", "rs", "re",
                bucket=lambda c: (c / 10).cast("long"),
            ).collect()
        ]
        want = {
            (li, ri)
            for li, ls, le in lrows
            for ri, rs, re in rrows
            if ls <= re and rs <= le
        }
        assert set(got) == want, (lrows, rrows)
        assert len(got) == len(want), "duplicate pair emitted"

    run()


def test_bucketed_joins_reject_bucket_column(spark):
    """__bucket is a staging column: a caller column of that name must
    fail loudly, never be silently overwritten (r8 advice)."""
    import pytest

    clash = spark.createDataFrame([(1, 2, 3, 9)], "s bigint, e bigint, x bigint, __bucket bigint")
    clean = spark.createDataFrame([(1, 2)], "s bigint, e bigint")
    ident = lambda c: c  # noqa: E731
    with pytest.raises(ValueError, match="__bucket"):
        TP.interval_overlap_join(clash, clean, "s", "e", "s", "e", bucket=ident)
    with pytest.raises(ValueError, match="__bucket"):
        TP.interval_overlap_join(clean, clash, "s", "e", "s", "e", bucket=ident)
    with pytest.raises(ValueError, match="__bucket"):
        TP.range_join(clash, clean, "x", "s", "e", bucket=ident)


def test_inverted_intervals_are_empty(spark):
    """end < start denotes the EMPTY interval: it matches nothing and
    must not feed Spark's DESCENDING sequence() bogus bucket rows."""
    ident = lambda c: c  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, 3), (2, 4, 6)], "lid bigint, s bigint, e bigint"
    )  # lid=1 inverted
    right = spark.createDataFrame(
        [(7, 2, 11), (8, 5, 5)], "rid bigint, s2 bigint, e2 bigint"
    )
    out = TP.interval_overlap_join(
        left, right, "s", "e", "s2", "e2", bucket=ident
    ).select("lid", "rid").collect()
    got = {(r.lid, r.rid) for r in out}
    # only the valid [4,6] interval matches; the inverted [10,3] never does
    assert got == {(2, 7), (2, 8)}

    # range_join: an inverted right interval can contain no point
    pts = spark.createDataFrame([(1, 5)], "pid bigint, p bigint")
    iv = spark.createDataFrame([(9, 8, 2), (10, 4, 6)], "rid bigint, s bigint, e bigint")
    rj = TP.range_join(pts, iv, "p", "s", "e", bucket=ident).select("pid", "rid").collect()
    assert {(r.pid, r.rid) for r in rj} == {(1, 10)}


def test_interval_overlap_matches_naive_with_inverted_rows(spark):
    """Random mix incl. inverted rows: bucketed == naive non-equi join
    restricted to VALID intervals on both sides."""
    import random

    rnd = random.Random(909)
    lrows = [(i, rnd.randint(0, 40), rnd.randint(0, 40)) for i in range(120)]
    rrows = [(i, rnd.randint(0, 40), rnd.randint(0, 40)) for i in range(120)]
    left = spark.createDataFrame(lrows, "lid bigint, s bigint, e bigint")
    right = spark.createDataFrame(rrows, "rid bigint, s2 bigint, e2 bigint")
    bucket = lambda c: (c / 7).cast("long")  # noqa: E731
    got = {
        (r.lid, r.rid)
        for r in TP.interval_overlap_join(
            left, right, "s", "e", "s2", "e2", bucket=bucket
        ).select("lid", "rid").collect()
    }
    want = {
        (lid, rid)
        for lid, s, e in lrows if s <= e
        for rid, s2, e2 in rrows if s2 <= e2
        if s <= e2 and s2 <= e
    }
    assert got == want


def test_asof_join_nearest_semantics(spark):
    """Nearest direction: closest right row either side, distance ties
    to the EARLIER row, exact-timestamp match wins at distance 0,
    keys with no right rows carry NULLs."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "exact"),    # right at 10:00 -> d=0
            (1, _ts("2024-01-01T10:40:00"), "mid"),      # 10:00 (40m) vs 11:00 (20m) -> fwd
            (1, _ts("2024-01-01T10:30:00"), "tie"),      # 30m both ways -> earlier (10:00)
            (1, _ts("2024-01-01T07:00:00"), "before_all"),  # only fwd exists
            (2, _ts("2024-01-01T09:00:00"), "lonely"),   # no right rows for key 2
        ],
        "uid bigint, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T11:00:00"), 200.0),
        ],
        "uid bigint, ts timestamp_ntz, px double",
    )
    out = {
        r.tag: r
        for r in TP.asof_join_nearest(left, right, on="uid", right_cols=["px"]).collect()
    }
    assert out["exact"].px_right == 100.0
    assert out["mid"].px_right == 200.0
    assert out["tie"].px_right == 100.0  # tie -> earlier
    assert out["before_all"].px_right == 100.0
    assert out["lonely"].px_right is None and out["lonely"].ts_right is None
    assert len(out) == 5
