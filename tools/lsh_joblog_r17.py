#!/usr/bin/env python
"""Per-job timeline of one cold run of each LSH-family query (guide
§7.1/§7.2 equivalent with spark.ui disabled): event log -> job
durations + gaps, to see which of the ~16-19 serialized jobs carry the
cold seconds and how much is inter-job driver idle."""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOGDIR = "/tmp/r17/eventlog"


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    spark = get_spark("lsh_joblog", cpus="32", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": LOGDIR,
    })
    docs_warm = plans.REGISTRY["agg_global"]
    docs_warm.fn(spark, SF).write.mode("overwrite").format("noop").save()

    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard"):
        # one throwaway cold run (codegen warm), then the logged run
        for tag in ("warmup", "measured"):
            spark.sparkContext.setJobDescription(f"{name}:{tag}")
            t0 = time.perf_counter()
            plans.REGISTRY[name].fn(spark, SF).write.mode(
                "overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            release_caches(blocking=True)
            spark.catalog.clearCache()
            print(f"{name} {tag}: {dt:.3f}s", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1)

    path = glob.glob(f"{LOGDIR}/{app_id}*")[0]
    jobs = {}
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties", {})
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "stages": len(ev.get("Stage IDs", [])),
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
    rows = sorted(jobs.items())
    prev_end = None
    for jid, j in rows:
        if "measured" not in j["desc"]:
            prev_end = j.get("t1", prev_end)
            continue
        gap = (j["t0"] - prev_end) if prev_end else 0
        dur = j.get("t1", j["t0"]) - j["t0"]
        print(f"job {jid:4d} {j['desc'][:28]:28s} stages={j['stages']} "
              f"gap={gap:5d}ms dur={dur:5d}ms")
        prev_end = j.get("t1", prev_end)


if __name__ == "__main__":
    main()
