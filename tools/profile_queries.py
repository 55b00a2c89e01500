"""Per-query job/stage profiler for the optimization rounds.

Runs selected catalog queries under an event-log-enabled session,
labels every action with ``setJobDescription`` (guide §1.5), then
parses the event log into a per-query breakdown: job count, per-job
wall clock, per-stage task counts, executor compute vs shuffle bytes.
This answers "where does the time go?" (guide §1.1) without the UI
(disabled in this sandbox): scheduler/driver overhead shows up as
wall minus task time; shuffle-bound stages show up as bytes; a
query whose time is spread over many tiny jobs is overhead-bound,
not compute-bound.

Usage::

    python tools/profile_queries.py q97 q62 ...        # by qNN prefix
    python tools/profile_queries.py --top 15           # costliest from BENCH_DETAIL.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_queries.py --top 10

Writes ``/tmp/profile_queries.json`` and prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_podcast_etl_spark.plans.catalog import CATALOG  # noqa: E402
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402

EVENT_DIR = "/tmp/spark-events-profile"


def pick_queries(argv: list[str]) -> list[str]:
    names = sorted(CATALOG)
    if argv and argv[0] == "--top":
        n = int(argv[1]) if len(argv) > 1 else 10
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_DETAIL.json")) as f:
            detail = json.load(f)["queries_full"]
        return [k for k, _ in sorted(detail.items(), key=lambda kv: -kv[1])[:n]]
    out = []
    for a in argv:
        match = [n for n in names if n == a or n.split("_", 1)[0] == a]
        if not match:
            raise SystemExit(f"no catalog query matches {a!r}")
        out.extend(match)
    return out


def main() -> None:
    queries = pick_queries(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))
    os.makedirs(EVENT_DIR, exist_ok=True)
    for f in os.listdir(EVENT_DIR):
        os.unlink(os.path.join(EVENT_DIR, f))

    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVENT_DIR)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm the session like bench.py does
    spark.range(1).count()
    CATALOG["q06_distinct_types"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    def _warm_fn(s):
        return s

    _warm = F.pandas_udf(_warm_fn, "long")
    spark.range(8).select(_warm("id")).write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {}
    for name in queries:  # untimed codegen warm pass
        sc.setJobDescription(f"WARM::{name}")
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for r in range(runs):
        for name in queries:
            sc.setJobDescription(f"RUN{r}::{name}")
            t0 = time.perf_counter()
            CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.setdefault(name, []).append(time.perf_counter() - t0)
    sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log ----------------------------------------
    # Spark 4 writes a rolling-log DIRECTORY eventlog_v2_<appId> with
    # one or more events_N_<appId> files inside
    candidates = [
        os.path.join(EVENT_DIR, app_id),
        os.path.join(EVENT_DIR, f"eventlog_v2_{app_id}"),
    ]
    log_files: list[str] = []
    for c in candidates:
        if os.path.isfile(c):
            log_files = [c]
            break
        if os.path.isdir(c):
            log_files = sorted(
                os.path.join(c, f)
                for f in os.listdir(c)
                if f.startswith("events_")
            )
            break
    if not log_files:
        raise SystemExit(f"no event log found for {app_id} in {EVENT_DIR}")

    def _lines():
        import subprocess

        for lf in log_files:
            if lf.endswith(".zstd"):
                out = subprocess.run(
                    ["zstd", "-dc", lf], capture_output=True, text=True
                )
                yield from out.stdout.splitlines()
            else:
                with open(lf) as f:
                    yield from f

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in _lines():
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            jid = ev["Job ID"]
            jobs[jid] = {
                "desc": desc,
                "start": ev["Submission Time"],
                "stages": ev.get("Stage IDs", []),
            }
        elif t == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["end"] = ev["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = {
                "name": si.get("Stage Name", "")[:80],
                "tasks": si.get("Number of Tasks"),
                "wall_ms": (si.get("Completion Time") or 0)
                - (si.get("Submission Time") or 0),
            }
        elif t == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            st = stages.setdefault(sid, {})
            m = ev.get("Task Metrics") or {}
            st["task_ms"] = st.get("task_ms", 0) + m.get(
                "Executor Run Time", 0
            )
            srm = m.get("Shuffle Read Metrics") or {}
            st["shuf_read"] = (
                st.get("shuf_read", 0)
                + srm.get("Local Bytes Read", 0)
                + srm.get("Remote Bytes Read", 0)
            )
            swm = m.get("Shuffle Write Metrics") or {}
            st["shuf_write"] = st.get("shuf_write", 0) + swm.get(
                "Shuffle Bytes Written", 0
            )
            pym = m.get("Executor Deserialize Time", 0)
            st["deser_ms"] = st.get("deser_ms", 0) + pym

    # aggregate per query (timed runs only)
    report: dict[str, dict] = {}
    for jid, j in jobs.items():
        desc = j["desc"]
        if "::" not in desc or desc.startswith("WARM::"):
            continue
        run_tag, qname = desc.split("::", 1)
        q = report.setdefault(
            qname,
            {
                "wall_s": None,
                "n_jobs": 0,
                "job_ms": 0,
                "task_ms": 0,
                "shuf_read": 0,
                "shuf_write": 0,
                "n_stages": 0,
                "n_tasks": 0,
                "jobs": [],
            },
        )
        dur = (j.get("end", j["start"]) - j["start"])
        q["n_jobs"] += 1
        q["job_ms"] += dur
        stage_rows = []
        for sid in j["stages"]:
            st = stages.get(sid)
            if not st or "wall_ms" not in st:
                continue  # skipped stage (reused exchange)
            q["n_stages"] += 1
            q["n_tasks"] += st.get("tasks") or 0
            q["task_ms"] += st.get("task_ms", 0)
            q["shuf_read"] += st.get("shuf_read", 0)
            q["shuf_write"] += st.get("shuf_write", 0)
            stage_rows.append(
                {
                    "id": sid,
                    "tasks": st.get("tasks"),
                    "wall_ms": st["wall_ms"],
                    "task_ms": st.get("task_ms", 0),
                    "shuf_read": st.get("shuf_read", 0),
                    "shuf_write": st.get("shuf_write", 0),
                    "name": st.get("name", ""),
                }
            )
        q["jobs"].append({"job_ms": dur, "stages": stage_rows})
    nruns = max(runs, 1)
    for name, q in report.items():
        q["wall_s"] = round(sum(walls.get(name, [0])) / nruns, 3)
        for k in ("n_jobs", "job_ms", "task_ms", "shuf_read", "shuf_write",
                  "n_stages", "n_tasks"):
            q[k] = q[k] // nruns  # per-run averages

    out_path = "/tmp/profile_queries.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    hdr = (
        f"{'query':34s} {'wall_s':>7s} {'jobs':>4s} {'jobms':>6s} "
        f"{'taskms':>7s} {'stages':>6s} {'tasks':>5s} {'shufMB':>7s}"
    )
    print(hdr)
    for name in queries:
        q = report.get(name)
        if not q:
            continue
        print(
            f"{name:34s} {q['wall_s']:7.3f} {q['n_jobs']:4d} "
            f"{q['job_ms']:6d} {q['task_ms']:7d} {q['n_stages']:6d} "
            f"{q['n_tasks']:5d} {(q['shuf_read'] + q['shuf_write']) / 1e6:7.2f}"
        )
    print(f"\ndetail: {out_path}")


if __name__ == "__main__":
    main()
