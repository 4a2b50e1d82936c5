#!/usr/bin/env python
"""Round-16 30x extension of the distinct-content scale probe.

The r15 probe established the pairs->groups dedup pipelines as
flat-to-linear across 1x/4x/10x. This extension pushes the SAME
protocol (distinct-content replicas, warm min-of-2 per stage,
exchange-kind fingerprint per scale, pins released between scales)
half a decade further — 1x / 10x / 30x (5k / 50k / 150k docs) — for
the two CC-closure heavyweights:

* ``dedup_substring_groups`` (pair stage + transitive closure)
* ``dedup_minhash_groups``   (banded pair stage + closure)

A super-linear term too small to see at 10x (e.g. an O(n log n)
closure constant, a band-bucket quantile drifting with corpus shape)
separates from linear by 30x. Expectation from the r15 curves:
pair-stage near-flat (plan-dominated at this SF), closure linear,
cc_rounds CONSTANT (the large-star/small-star invariant — rounds
grow with component DIAMETER, which replication never increases, not
corpus size).

Reuses the r15 tool's replica builder and probe functions verbatim
(imported, not copied) so the protocol cannot drift between rounds.
Results -> tools/scale_probe_r16_30x_results.json + BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe_r15 import (  # noqa: E402
    probe_minhash_groups,
    probe_substring_groups,
    replicate_documents,
)

from git_log_to_sqlite_spark.operators.caching import release_caches  # noqa: E402
from git_log_to_sqlite_spark.session import get_spark  # noqa: E402

SCALES = (1, 10, 30)


def main() -> None:
    spark = get_spark("scale-probe-r16-30x", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf": 0.1, "scales": list(SCALES), "targets": {}}
    tmp = tempfile.mkdtemp(prefix="probe30x_")
    try:
        for target, probe in (
            ("dedup_substring_groups", probe_substring_groups),
            ("dedup_minhash_groups", probe_minhash_groups),
        ):
            per_scale = {}
            for factor in SCALES:
                docs = replicate_documents(spark, tmp, factor)
                per_scale[f"x{factor}"] = probe(spark, docs)
                release_caches(blocking=True)  # r16 protocol: no pin carries across scales
                print(f"{target} x{factor}: {json.dumps(per_scale[f'x{factor}'])}",
                      flush=True)
            results["targets"][target] = per_scale
            # exchange-kind invariance across scales (join-strategy
            # adaptation, e.g. a size-triggered BHJ->SMJ demotion, is
            # reported, not failed — the r15 axis sweep proved it
            # semantics-preserving)
            kinds = [
                {k: v for k, v in s.get("plan_kinds", {}).items() if k == "cartesian"}
                for s in per_scale.values()
            ]
            assert all(k.get("cartesian", 0) == 0 for k in kinds), (
                f"{target}: CartesianProduct appeared at some scale"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = os.path.join(os.path.dirname(__file__), "scale_probe_r16_30x_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", out)
    spark.stop()


if __name__ == "__main__":
    main()
