"""Per-query job/stage time breakdown via the Spark event log.

Runs one (or more) registry queries end-to-end exactly as bench.py does
(noop sink), with ``spark.eventLog.enabled`` on, then parses the event
log: every job's wall time, its description (setJobDescription label or
callsite), and the top stages by duration.  This is the guide-§1 "where
is the time actually going" loop for a harness with the UI disabled.

Usage: python tools/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        print("usage: profile_query.py [sf_dir] query ...", file=sys.stderr)
        return 2

    log_dir = "/tmp/spark-events-profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = log_dir

    import __spark_entry__ as entry
    from mongo_es_spark.session import get_spark

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    # warm like bench.py so codegen/worker startup is not misattributed
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from mongo_es_spark.queries import warm_shared_fixtures

    warm_shared_fixtures(spark, sf_dir)

    marks = {}
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"QUERY:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        # unique mark key so the same query can be profiled twice
        # (cold + warm) in one session
        key = name if name not in marks else f"{name}#warm{i}"
        marks[key] = (t0, time.time())
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolling layout: a directory
    # eventlog_v2_<appId>/ holding events_* files; classic: one file)
    logs = sorted(
        glob.glob(os.path.join(log_dir, app_id + "*"))
        + glob.glob(
            os.path.join(log_dir, "eventlog_v2_" + app_id, "events*")
        )
    )
    logs = [p for p in logs if os.path.isfile(p)]
    if not logs:
        print("no event log found", file=sys.stderr)
        return 1
    jobs = {}  # id -> dict
    stages = {}  # id -> dict
    lines = []
    for p in logs:
        with open(p) as fh:
            lines.extend(fh)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": props.get(
                        "spark.job.description",
                        props.get("callSite.short", ""),
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "dur": ((com - sub) / 1000.0) if sub and com else 0.0,
                    "tasks": si.get("Number of Tasks", 0),
                }

    for name, (t0, t1) in marks.items():
        print(f"\n===== {name}: wall {t1 - t0:.2f}s =====")
        # attribute by wall-clock window: foreachBatch jobs run on the
        # stream thread and do not inherit the QUERY: description
        mine = [
            (j["start"], jid, j)
            for jid, j in jobs.items()
            if "end" in j
            and (
                j.get("desc") == f"QUERY:{name}"
                or t0 <= j["start"] <= t1
            )
        ]
        mine.sort()
        tot = sum(j["end"] - j["start"] for _, _, j in mine)
        gaps = 0.0
        prev_end = None
        for st, _, j in mine:
            if prev_end is not None and st > prev_end:
                gaps += st - prev_end
            prev_end = max(prev_end or 0, j["end"])
        # total tasks across this query's stages — deterministic
        # (host-noise-proof) evidence for partitioning/AQE-floor A/Bs
        seen_stages = set()
        for _, _, j in mine:
            seen_stages.update(s for s in j["stages"] if s in stages)
        total_tasks = sum(stages[s]["tasks"] for s in seen_stages)
        print(
            f"jobs: {len(mine)}  sum(job wall): {tot:.2f}s  "
            f"inter-job gaps (driver/python time): {gaps:.2f}s"
        )
        print(
            f"SUMMARY {name} jobs={len(mine)} stages={len(seen_stages)} "
            f"tasks={total_tasks} job_wall={tot:.2f} gaps={gaps:.2f} "
            f"wall={t1 - t0:.2f}"
        )
        from collections import Counter

        kinds = Counter()
        for _, _, j in mine:
            names = [
                stages[s]["name"]
                for s in j["stages"]
                if s in stages
            ]
            kind = names[-1].split(" at ")[0] if names else "?"
            kinds[kind] += 1
        print(
            "job kinds:",
            ", ".join(f"{k}×{v}" for k, v in kinds.most_common(12)),
        )
        for st, jid, j in mine:
            dur = j["end"] - j["start"]
            if dur < 0.05:
                continue
            stage_bits = sorted(
                (
                    (stages[s]["dur"], stages[s]["name"], stages[s]["tasks"])
                    for s in j["stages"]
                    if s in stages
                ),
                reverse=True,
            )[:3]
            sb = "; ".join(
                f"{d:.2f}s/{t}t {n[:60]}" for d, n, t in stage_bits
            )
            desc = (j.get("desc") or "")[:70]
            print(f"  job {jid}: {dur:5.2f}s  {desc}  [{sb}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
