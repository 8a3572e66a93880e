"""Multi-JVM execution proof: the driver-check sweep under
``local-cluster[2,8,4096]`` — two REAL executor JVMs, real task/closure
serialization, real shuffle over loopback — plus an executor-kill
fault-injection mode (VERDICT r9 #1/#2).

Everything before round 10 ran ``local[...]`` (one JVM): driver-only
assumptions that die here include the Python DataSource pickled to
executors, broadcast/closure literals (the bloom bitmap), ctypes
library handles inside mapInPandas workers, and localCheckpoint
behavior. The reference's analogue is its whole Dask+UCX distribution
layer (``/root/reference/engine/src/communication/CommunicationInterface/
protocols.hpp:64``) — Spark gives us the transport, this script proves
our operators actually survive it.

Usage:
  python scripts/cluster_probe.py [sf_dir] [prefix ... | --head=N]
  python scripts/cluster_probe.py [sf_dir] --kill name [name ...]
  python scripts/cluster_probe.py --kill-deep
  python scripts/cluster_probe.py --kill-e2e [sf_dir]

``--kill``: runs each named entry while SIGKILLing one
CoarseGrainedExecutorBackend JVM mid-query; the standalone worker
relaunches the executor, Spark retries the lost tasks, and the result
must STILL match the DuckDB oracle bit-for-bit — retry determinism of
the mapInPandas kernels and deterministic-sampling paths (reference
analogue: executor OOM-requeue, ``executor.cpp:116-118``).

``--kill-deep`` (VERDICT r10 #1): the case plain ``--kill`` cannot
catch. The iterative loops truncate lineage with localCheckpoint and
UNPERSIST each round's predecessor, so mid-loop state lives ONLY in
executor blocks with nothing upstream to recompute from; an executor
SIGKILL after a checkpoint round should therefore FAIL the
localCheckpoint run (block-not-found, no lineage), while the same loop
under ``checkpoint_dir=`` (reliable FS checkpoints,
``session.make_ckpt``) must recover and produce the analytically exact
components. Runs connected_components over a disjoint-chain graph
(high diameter -> many rounds -> a wide kill window) in both modes
with the same kill schedule and prints a verdict per mode.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tests.oracle_utils import assert_frames_match

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Entries that CANNOT run multi-JVM for documented environmental
#: reasons (not plan defects). Probed round 10:
SKIP: dict[str, str] = {
    # Embedded Derby is a single-process database BY DESIGN: whichever
    # JVM boots the db holds db.lck until shutdown, so a second JVM
    # (executor vs driver, or two executors) can never open it — the
    # failed boots cascade into executor exits and the standalone
    # master removes the whole app. The network-server fix needs
    # derbynet/derbyclient jars, which do not ship with Spark (only
    # derby/derbyshared/derbytools — probed, SCALE.md). The executable
    # multi-JVM JDBC-equivalent is source_sqlite_roundtrip: the Python
    # DataSource reader opens the db file read-only per executor.
    "source_jdbc_roundtrip": "embedded Derby is single-JVM (db.lck); "
    "client-server jars not shipped",
}


def build_session() -> SparkSession:
    # 2 executor JVMs x 8 cores x 4 GiB; executors need PYTHONPATH for
    # the package (a real cluster ships it via --py-files; local-cluster
    # workers inherit nothing from the driver's sys.path)
    return (
        SparkSession.builder.master("local-cluster[2,8,4096]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.driver.memory", "4g")
        # fault injection loses map outputs with the executor: allow
        # enough task/stage retries to recompute them
        .config("spark.task.maxFailures", "8")
        .config("spark.stage.maxConsecutiveAttempts", "8")
        .getOrCreate()
    )


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True,
    )
    return [int(p) for p in out.stdout.split()]


def _kill_after(delay: float, killed: list[int]) -> threading.Thread:
    def kill_one():
        time.sleep(delay)
        pids = sorted(executor_pids())
        if pids:
            os.kill(pids[-1], signal.SIGKILL)
            killed.append(pids[-1])

    t = threading.Thread(target=kill_one, daemon=True)
    t.start()
    return t


def kill_deep_probe() -> int:
    """Executor kill with parent lineage evicted: localCheckpoint mode
    is EXPECTED to fail; reliable checkpoint_dir mode must recover
    oracle-exact. Returns 0 iff the reliable run recovered exactly."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pyblazing_spark.operators.graph import connected_components

    base = tempfile.mkdtemp(prefix="kill_deep_")
    edges_pq = os.path.join(base, "edges")
    ck_dir = os.path.join(base, "ck")
    delay = float(os.environ.get("KILL_DELAY", "8.0"))
    rc = 1
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # 60k disjoint chains of 30 nodes: diameter 29 -> ~29 label
        # rounds (~10 localCheckpoints at interval 3), 1.74M edges so
        # every round's blocks spread across both executors. Components
        # are analytic: node -> its chain's first node.
        chain = 30
        n_chains = 60_000
        (
            spark.range(n_chains * (chain - 1))
            .select(
                (
                    (F.col("id") / (chain - 1)).cast("long") * chain
                    + (F.col("id") % (chain - 1))
                ).alias("id_a"),
            )
            .select("id_a", (F.col("id_a") + 1).alias("id_b"))
            .write.parquet(edges_pq)
        )
        edges = spark.read.parquet(edges_pq)

        def expected_checksum():
            # analytic components: comp(x) = x - x % chain. Compare via
            # a commutative checksum, not a 1.8M-row driver collect.
            return (
                edges.select(F.col("id_a").alias("id"))
                .unionAll(edges.select(F.col("id_b").alias("id")))
                .distinct()
                .select(
                    "id",
                    (F.col("id") - F.col("id") % chain).alias("component"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.xxhash64("id", "component").cast("decimal(38,0)")).alias("h"),
                )
                .collect()[0]
            )

        def run(mode: str, ckpt_dir):
            killed: list[int] = []
            _kill_after(delay, killed)
            t0 = time.time()
            try:
                comp = connected_components(
                    edges, max_iter=40, checkpoint_dir=ckpt_dir
                )
                row = comp.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.xxhash64("id", "component").cast("decimal(38,0)")).alias("h"),
                ).collect()[0]
                return ("ok", row, time.time() - t0, killed)
            except Exception as exc:
                return ("fail", str(exc).splitlines()[0][:160],
                        time.time() - t0, killed)

        exp = expected_checksum()
        print(f"expected: n={exp['n']} h={exp['h']}")

        status, info, dt, killed = run("local", None)
        tag = f"killed pid={killed[0]}" if killed else "KILL MISSED"
        if status == "fail":
            print(f"  localCheckpoint   EXPECTED-FAIL ({dt:.1f}s, {tag}): {info}")
        else:
            ok = (info["n"], info["h"]) == (exp["n"], exp["h"])
            print(
                f"  localCheckpoint   survived ({dt:.1f}s, {tag}) "
                f"exact={ok} — inconclusive (kill landed outside the "
                f"no-lineage window); rerun with a different KILL_DELAY"
            )

        # session may be poisoned by the cascade — rebuild for run 2
        try:
            spark.range(1).count()
        except Exception:
            try:
                spark.stop()
            except Exception:
                pass
            time.sleep(3)
            spark = build_session()
            spark.sparkContext.setLogLevel("ERROR")
            edges = spark.read.parquet(edges_pq)

        status, info, dt, killed = run("reliable", ck_dir)
        tag = f"killed pid={killed[0]}" if killed else "KILL MISSED"
        if status == "ok" and (info["n"], info["h"]) == (exp["n"], exp["h"]):
            print(f"  reliable ckpt     RECOVERED EXACT ({dt:.1f}s, {tag}) "
                  f"n={info['n']} h={info['h']}")
            rc = 0
        elif status == "ok":
            print(f"  reliable ckpt     WRONG RESULT ({dt:.1f}s, {tag}): "
                  f"n={info['n']} h={info['h']} vs n={exp['n']} h={exp['h']}")
        else:
            print(f"  reliable ckpt     FAIL ({dt:.1f}s, {tag}): {info}")
        return rc
    finally:
        try:
            spark.stop()
        except Exception:
            pass
        shutil.rmtree(base, ignore_errors=True)


def kill_e2e_probe(sf_dir: str) -> int:
    """VERDICT r12 #3: executor SIGKILL mid-``pipeline_corpus_e2e``.
    The composition materializes its loser/contaminated id sets with
    severed lineage (localCheckpoint default); under
    ``checkpoint_dir=`` they become reliable FS checkpoints and the
    card must still match the DuckDB oracle bit-for-bit after the
    kill. Ground truth is the entry's own oracle SQL — fully
    independent of any Spark run."""
    import shutil
    import tempfile

    import pyblazing_spark.plans as plans
    from pyblazing_spark.plans.curation import _corpus_e2e_build

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    expected = con.execute(plans.REGISTRY["pipeline_corpus_e2e"].oracle).df()

    base = tempfile.mkdtemp(prefix="kill_e2e_")
    ck_dir = os.path.join(base, "ck")
    delay = float(os.environ.get("KILL_DELAY", "2.0"))
    rc = 1
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        def run(ckpt_dir):
            killed: list[int] = []
            _kill_after(delay, killed)
            t0 = time.time()
            card, feat = _corpus_e2e_build(spark, sf_dir, checkpoint_dir=ckpt_dir)
            try:
                pdf = card.toPandas()
                return ("ok", pdf, time.time() - t0, killed)
            except Exception as exc:
                return ("fail", str(exc).splitlines()[0][:160],
                        time.time() - t0, killed)
            finally:
                feat.unpersist()

        for mode, ckpt_dir in (("localCheckpoint", None), ("reliable", ck_dir)):
            try:
                status, info, dt, killed = run(ckpt_dir)
            except Exception as exc:  # build itself died (local mode may)
                status, info, dt, killed = (
                    "fail", str(exc).splitlines()[0][:160], 0.0, [])
            tag = f"killed pid={killed[0]}" if killed else "KILL MISSED"
            if status == "ok":
                try:
                    assert_frames_match(info, expected, name="pipeline_corpus_e2e")
                    print(f"  {mode:16s} EXACT after kill ({dt:.1f}s, {tag})")
                    if mode == "reliable":
                        rc = 0
                except AssertionError as exc:
                    print(f"  {mode:16s} WRONG RESULT ({dt:.1f}s, {tag}): "
                          f"{str(exc).splitlines()[0][:120]}")
            else:
                verdict = ("EXPECTED-FAIL" if mode == "localCheckpoint"
                           else "FAIL")
                print(f"  {mode:16s} {verdict} ({dt:.1f}s, {tag}): {info}")
            # the kill may poison the session — health-check, rebuild
            try:
                spark.range(1).count()
            except Exception:
                try:
                    spark.stop()
                except Exception:
                    pass
                time.sleep(3)
                spark = build_session()
                spark.sparkContext.setLogLevel("ERROR")
        return rc
    finally:
        try:
            spark.stop()
        except Exception:
            pass
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if "--kill-deep" in args:
        return kill_deep_probe()
    if "--kill-e2e" in args:
        args.remove("--kill-e2e")
        sf = args[0] if args and not args[0].startswith("--") else "/root/testdata/sf0.01"
        return kill_e2e_probe(sf)
    sf_dir = "/root/testdata/sf0.01"
    if args and not args[0].startswith("--"):
        sf_dir = args.pop(0)
    kill_mode = "--kill" in args
    args = [a for a in args if a != "--kill"]
    head = 0
    for a in list(args):
        if a.startswith("--head="):
            head = int(a.split("=", 1)[1])
            args.remove(a)

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()

    if kill_mode:
        names = args
    else:
        names = list(qs)[:head] if head else (args or sorted(qs))
        names = [n for n in names if not args or n.startswith(tuple(args))]

    n_ok = n_bad = n_skip = 0
    for name in names:
        if name not in qs:
            print(f"  {name:28s} SKIP (unknown entry)")
            continue
        if name in SKIP:
            print(f"  {name:28s} SKIP ({SKIP[name]})")
            n_skip += 1
            continue
        t0 = time.time()
        killer = None
        killed_pid: list[int] = []
        if kill_mode:
            before = set(executor_pids())

            def kill_one(before=before, killed=killed_pid):
                # wait for the query to be mid-flight, then nuke one
                # executor JVM; the worker relaunches a replacement
                time.sleep(float(os.environ.get("KILL_DELAY", "1.0")))
                pids = sorted(set(executor_pids()) & before) or sorted(
                    executor_pids()
                )
                if pids:
                    os.kill(pids[-1], signal.SIGKILL)
                    killed.append(pids[-1])

            killer = threading.Thread(target=kill_one, daemon=True)
            killer.start()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if killer:
                killer.join()
            tag = f"killed pid={killed_pid[0]}" if killed_pid else (
                "kill-miss (query finished first)" if kill_mode else ""
            )
            if name not in osql:
                print(
                    f"  {name:28s} rows-only rows={len(spdf)} "
                    f"({time.time()-t0:.1f}s) {tag}"
                )
                n_ok += 1
                continue
            ddf = con.execute(osql[name]).df()
            assert_frames_match(spdf, ddf, name=name)
            print(
                f"  {name:28s} OK rows={len(spdf)} "
                f"({time.time()-t0:.1f}s) {tag}"
            )
            n_ok += 1
        except Exception as exc:
            n_bad += 1
            print(f"  {name:28s} FAIL: {str(exc).splitlines()[0][:150]}")
            # a hard executor cascade can take the standalone app down
            # with it — rebuild the session so one bad entry can't
            # poison the rest of the sweep
            try:
                spark.range(1).count()
            except Exception:
                print("  [session dead - rebuilding local-cluster]")
                try:
                    spark.stop()
                except Exception:
                    pass
                time.sleep(3)
                spark = build_session()
                spark.sparkContext.setLogLevel("ERROR")
    mode = "kill-injection" if kill_mode else "local-cluster[2,8,4096]"
    print(f"{n_ok} ok, {n_bad} failed, {n_skip} skipped @ {sf_dir} ({mode})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
