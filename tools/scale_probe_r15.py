#!/usr/bin/env python
"""Round-15 10x distinct-content scale probe (VERDICT.md round-14 item 3).

Measures the three slowest non-headline extras — the pairs->groups
dedup pipelines and the persisted-IVF probe — under DISTINCT-content
replication of the sf0.1 tables at 1x / 4x / 10x, with per-stage
floats (pair generation vs transitive closure; IVF fit / assign_write /
centroids_write vs probe) and an exchange-kind fingerprint per scale.

Distinct-content replication (the round-14 composite-probe recipe):
replica ``i`` carries disjoint ids (+i*1_000_000) and per-replica
token-prefixed text (``r{i}_<token>``), so no shingle/window/band key
ever matches across replicas — pair mass scales with the number of
replicas (the honest linear regime), never quadratically, and nothing
collapses at the dedup stage. Embedding replicas are shifted by a
per-replica constant so within-replica geometry is preserved while
replicas occupy disjoint regions.

IVF scaling is deployment-shaped: ``k`` grows with the corpus
(8/32/80) so cells stay ~constant-size — the regime where the probe's
static cell pruning makes probe cost flat in corpus size (a fixed-k
probe is trivially linear: n_probe cells each 1/k of a growing
corpus).

Results are recorded in BASELINE.md (round 15); exchange-kind
invariance across scales is asserted in-script (non-zero exit on
drift). Not part of the gate or bench — a committed, reproducible
measurement harness.
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import tempfile
import time
from contextlib import redirect_stdout
from io import StringIO

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from git_log_to_sqlite_spark.operators import IvfIndex  # noqa: E402
from git_log_to_sqlite_spark.operators import dedup as dd  # noqa: E402
from git_log_to_sqlite_spark.operators.caching import release_caches  # noqa: E402
from git_log_to_sqlite_spark.operators.graph import connected_components  # noqa: E402
from git_log_to_sqlite_spark.plans import llm_ops  # noqa: E402
from git_log_to_sqlite_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCALES = (1, 4, 10)
RUNS = 2  # warm min-of-2 per stage (bounded total runtime)


def plan_kinds(df) -> dict:
    """Exchange-kind fingerprint from the simple-mode physical plan:
    the counts that distinguish a bounded-candidate plan from a
    scale-killer (join strategies + data shuffles)."""
    buf = StringIO()
    with redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    return {
        "broadcast_hash_join": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_join": len(re.findall(r"SortMergeJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "hash_exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
    }


def timed(build_df, runs: int = RUNS) -> tuple[float, list[float]]:
    """Warm min-of-N wall clock of a full materialization (noop sink),
    rebuilding the plan per run so no lazy state carries over."""
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        build_df().write.mode("overwrite").format("noop").save()
        samples.append(round(time.perf_counter() - t0, 3))
    return min(samples), samples


def replicate_documents(spark, out_dir: str, factor: int) -> str:
    """Write a distinct-content documents table: replica 0 is the
    original; replica i>0 prefixes every token with ``r{i}_`` (token
    count and within-replica pair structure preserved exactly; zero
    cross-replica shingle/window matches)."""
    path = f"{out_dir}/x{factor}_documents.parquet"
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = []
    for i in range(factor):
        rep = base.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.regexp_replace("text", r"(\S+)", f"r{i}_$1")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.mode("overwrite").parquet(path)
    return path


def replicate_embeddings(spark, out_dir: str, factor: int) -> str:
    """Distinct-vector embeddings: replica i shifts every dimension by
    3.0*i — within-replica geometry intact, replicas disjoint in
    space (so cluster structure repeats per replica)."""
    path = f"{out_dir}/x{factor}_embeddings.parquet"
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parts = []
    for i in range(factor):
        shift = float(3 * i)
        rep = base.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x + F.lit(shift)).cast("float")
            ).alias("embedding"),
            "label",
        )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.mode("overwrite").parquet(path)
    return path


def probe_substring_groups(spark, docs_path: str) -> dict:
    docs = spark.read.parquet(docs_path)
    mk_pairs = lambda: dd.substring_span_pairs(  # noqa: E731
        docs,
        "doc_id",
        "text",
        window=llm_ops._SUBSTR_K,
        min_run_tokens=llm_ops._SUBSTR_MIN_RUN,
        max_df_quantile=llm_ops._SUBSTR_Q,
        quantile_headroom=llm_ops._SUBSTR_HEADROOM,
    )
    t_pairs, pair_runs = timed(mk_pairs)
    pair_rows = mk_pairs().count()
    stats: dict = {}
    t0 = time.perf_counter()
    connected_components(mk_pairs(), src="id_a", dst="id_b", stats=stats).write.mode(
        "overwrite"
    ).format("noop").save()
    t_pairs_plus_cc = round(time.perf_counter() - t0, 3)
    return {
        "rows": docs.count(),
        "pair_rows": pair_rows,
        "t_pairs": t_pairs,
        "pair_runs": pair_runs,
        "t_pairs_plus_cc": t_pairs_plus_cc,
        "t_closure_est": round(t_pairs_plus_cc - t_pairs, 3),
        "cc_rounds": stats.get("rounds"),
        "plan_kinds": plan_kinds(mk_pairs()),
    }


def probe_minhash_groups(spark, docs_path: str) -> dict:
    docs = spark.read.parquet(docs_path)

    def mk_pairs():
        return dd.minhash_lsh_pairs(
            docs,
            "doc_id",
            "text",
            num_hashes=llm_ops._MINHASH_K,
            rows_per_band=2,
            min_agree=0.25,
            band_size_quantile=llm_ops._BAND_Q,
        )

    t_pairs, pair_runs = timed(mk_pairs)
    pair_rows = mk_pairs().count()
    stats: dict = {}
    t0 = time.perf_counter()
    connected_components(mk_pairs(), src="id_a", dst="id_b", stats=stats).write.mode(
        "overwrite"
    ).format("noop").save()
    t_pairs_plus_cc = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)  # drop the signature pin between scales
    return {
        "rows": docs.count(),
        "pair_rows": pair_rows,
        "t_pairs": t_pairs,
        "pair_runs": pair_runs,
        "t_pairs_plus_cc": t_pairs_plus_cc,
        "t_closure_est": round(t_pairs_plus_cc - t_pairs, 3),
        "cc_rounds": stats.get("rounds"),
        "plan_kinds": plan_kinds(mk_pairs()),
    }


def probe_ivf(spark, emb_path: str, factor: int) -> dict:
    emb = spark.read.parquet(emb_path)
    # Deployment-shaped k: cells stay ~250 vectors at every scale.
    k = 8 * factor
    ivf_dir = tempfile.mkdtemp(prefix=f"probe_ivf_x{factor}_")
    try:
        idx = IvfIndex(spark, ivf_dir, id_col="vec_id", vec_col="embedding")
        stages: dict = {}
        t0 = time.perf_counter()
        idx.build(emb, k=k, max_iter=5, stage_times=stages)
        t_build = round(time.perf_counter() - t0, 3)
        # TWO probe shapes.  (a) DIVERSE: the same 100 spread query
        # vectors at every scale (replica-0 ids) — a diverse batch
        # probes ~every cell, so static pruning cannot engage and cost
        # is honestly linear in probed-cell mass (= corpus here).
        # (b) CONCENTRATED: 100 near-identical queries around ONE
        # vector — the probed-cell set is bounded (<= n_probe cells),
        # the regime the round-14 static-pruning fix exists for; cost
        # should be ~flat in corpus size.
        diverse = emb.filter(F.col("vec_id") < 1_000_000).orderBy(
            "vec_id"
        ).limit(100)
        one = emb.filter(F.col("vec_id") == 0).select("embedding")
        concentrated = (
            spark.range(100)
            .crossJoin(F.broadcast(one))
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: (x + F.lit(1e-4)).cast("float"),
                ).alias("embedding"),
            )
        )
        t_probe, probe_runs = timed(
            lambda: idx.probe(diverse, n_probe=2, k=5), runs=3
        )
        t_conc, conc_runs = timed(
            lambda: idx.probe(concentrated, n_probe=2, k=5), runs=3
        )
        return {
            "rows": emb.count(),
            "k": k,
            "t_build": t_build,
            "build_stages": stages,
            "t_probe_diverse": t_probe,
            "probe_runs_diverse": probe_runs,
            "t_probe_concentrated": t_conc,
            "probe_runs_concentrated": conc_runs,
            "plan_kinds": plan_kinds(idx.probe(diverse, n_probe=2, k=5)),
        }
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)


def main() -> None:
    only = set(sys.argv[1:])  # optional target names to rerun
    spark = get_spark("scale_probe_r15", cpus="16")
    work = tempfile.mkdtemp(prefix="probe_r15_")
    results: dict = {"sf": 0.1, "scales": list(SCALES), "targets": {}}
    try:
        for name, replicate, probe in (
            ("dedup_substring_groups", replicate_documents,
             lambda sp, p, f: probe_substring_groups(sp, p)),
            ("dedup_minhash_groups", replicate_documents,
             lambda sp, p, f: probe_minhash_groups(sp, p)),
            ("ivf_index_probe", replicate_embeddings, probe_ivf),
        ):
            if only and name not in only:
                continue
            per_scale = {}
            for factor in SCALES:
                path = replicate(spark, work, factor)
                per_scale[f"x{factor}"] = probe(spark, path, factor)
                print(f"  {name} x{factor}: "
                      f"{json.dumps(per_scale[f'x{factor}'])}", file=sys.stderr)
            kinds = [s["plan_kinds"] for s in per_scale.values()]
            # Strict kind identity is REPORTED; the hard contract is
            # (a) zero CartesianProducts at every scale and (b) no new
            # join KIND beyond the size-driven BHJ<->SMJ trade — the
            # adaptation Spark is SUPPOSED to make when a side outgrows
            # the broadcast threshold (axis 4 of the round-14 config
            # sweep proved it semantics-preserving corpus-wide).
            per_scale["kinds_invariant"] = all(k == kinds[0] for k in kinds)
            per_scale["cartesian_free"] = all(k["cartesian"] == 0 for k in kinds)
            results["targets"][name] = per_scale
        print(json.dumps(results, indent=1))
        bad = [n for n, t in results["targets"].items()
               if not t["cartesian_free"]]
        drift = [n for n, t in results["targets"].items()
                 if not t["kinds_invariant"]]
        if drift:
            print(f"note: join-strategy adaptation across scales: {drift}",
                  file=sys.stderr)
        if bad:
            print(f"CARTESIAN AT SCALE: {bad}", file=sys.stderr)
            sys.exit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
