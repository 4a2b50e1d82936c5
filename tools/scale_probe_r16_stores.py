#!/usr/bin/env python
"""Round-16 history-growth probe for the persisted incremental stores.

The stores' O(increment) scale claims (SignatureStore / HammingStore /
SemanticStore: "history is never re-scanned as TEXT / re-assigned /
self-joined; daily growth costs O(increment x probed mass)") were
evidence-class STRUCTURAL + equivalence-tested — proven row-identical
to batch semantics, but never measured against a GROWING history.
This harness upgrades them to MEASURED: history at 1x/4x/10x
(distinct-content replication, the r15/r16 probe recipe), the daily
increment FIXED (1,000 items: 500 exact/near copies of history
replica-0 rows that must flag as dups + 500 novel rows that must
append), ingest wall-clock per scale.

The honest expectation is NOT perfectly flat: the history signature /
kept table is scanned map-side each ingest (a linear term with a tiny
constant — K x 8 B/doc signatures, never the text), but the JOIN mass
(bands/cells probed x batch side) and the flagged/new counts must stay
constant, the exchange-kind fingerprint must not drift, and nothing
may go super-linear. Protocol: fresh bootstrap per timed run (ingest
mutates the store), warm min-of-2, then one additional DAY-2 ingest
(after day 1's novels appended) to show the steady-state cost.

Results land in BASELINE.md (round 16) and
``tools/scale_probe_r16_stores_results.json``. Not part of the gate
or bench — a committed, reproducible measurement harness.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from scale_probe_r15 import (  # noqa: E402
    SCALES,
    plan_kinds,
    replicate_documents,
    replicate_embeddings,
)

from git_log_to_sqlite_spark.operators import dedup as dd  # noqa: E402
from git_log_to_sqlite_spark.operators.caching import release_caches  # noqa: E402
from git_log_to_sqlite_spark.operators.clustering import (  # noqa: E402
    kmeans_fit_sample,
)
from git_log_to_sqlite_spark.operators.similarity import SemanticStore  # noqa: E402
from git_log_to_sqlite_spark.session import get_spark  # noqa: E402

BATCH = 1_000  # fixed daily increment at every history scale
RUNS = 2


def _doc_batch(spark, hist_docs, tag: str):
    """500 exact copies of history replica-0 texts under new ids (must
    flag as dups) + 500 novel docs whose shingles are disjoint from
    the corpus by construction (must append)."""
    dups = (
        hist_docs.filter(F.col("doc_id") < 1_000_000)
        .orderBy("doc_id")
        .limit(BATCH // 2)
        .select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            "text",
        )
    )
    novel = spark.range(BATCH // 2).select(
        (F.col("id") + 60_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"{tag}{t}q"), F.col("id")) for t in range(12)],
        ).alias("text"),
    )
    return dups.unionAll(novel)


def probe_signature_store(spark, docs_path: str, work: str) -> dict:
    hist = spark.read.parquet(docs_path)
    batch_a = _doc_batch(spark, hist, "na")
    batch_b = _doc_batch(spark, hist, "nb")
    out: dict = {"rows_history": hist.count()}
    runs = []
    res = None
    store = None
    for _ in range(RUNS):
        release_caches(blocking=True)
        path = tempfile.mkdtemp(prefix="sigstore_", dir=work)
        store = dd.SignatureStore(spark, path, id_col="doc_id")
        store.bootstrap(hist, "text")
        t0 = time.perf_counter()
        res = store.ingest(batch_a, "text")
        runs.append(round(time.perf_counter() - t0, 3))
    out["t_ingest_runs"] = runs
    out["t_ingest"] = min(runs)
    out["n_new"] = res.filter(F.col("is_new") == 1).count()
    out["n_dup"] = res.filter(F.col("is_new") == 0).count()
    t0 = time.perf_counter()
    store.ingest(batch_b, "text")
    out["t_ingest_day2"] = round(time.perf_counter() - t0, 3)
    # exchange fingerprint of the underlying probe-shaped plan (lazy;
    # ingest itself checkpoints, hiding the join from a post-hoc explain)
    out["plan_kinds"] = plan_kinds(
        dd.incremental_minhash_dedup(
            None, batch_a, "doc_id", "text",
            history_signatures=store.read(),
        )
    )
    release_caches(blocking=True)
    return out


def probe_hamming_store(spark, docs_path: str, work: str) -> dict:
    hist = spark.read.parquet(docs_path)
    hist_sigs = dd.simhash(hist, "doc_id", "text", bits=60).select(
        "doc_id", F.col("simhash").alias("sig")
    )
    batch_sigs = dd.simhash(
        _doc_batch(spark, hist, "na"), "doc_id", "text", bits=60
    ).select("doc_id", F.col("simhash").alias("sig"))
    b_sigs = dd.simhash(
        _doc_batch(spark, hist, "nb"), "doc_id", "text", bits=60
    ).select("doc_id", F.col("simhash").alias("sig"))
    out: dict = {"rows_history": hist.count()}
    runs = []
    res = None
    store = None
    for _ in range(RUNS):
        release_caches(blocking=True)
        path = tempfile.mkdtemp(prefix="hamstore_", dir=work)
        store = dd.HammingStore(spark, path, id_col="doc_id", bits=60)
        store.bootstrap(hist_sigs)
        t0 = time.perf_counter()
        res = store.ingest(batch_sigs, bands=4, max_hamming=3)
        runs.append(round(time.perf_counter() - t0, 3))
    out["t_ingest_runs"] = runs
    out["t_ingest"] = min(runs)
    out["n_new"] = res.filter(F.col("is_new") == 1).count()
    out["n_dup"] = res.filter(F.col("is_new") == 0).count()
    t0 = time.perf_counter()
    store.ingest(b_sigs, bands=4, max_hamming=3)
    out["t_ingest_day2"] = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)
    return out


def probe_window_store(spark, docs_path: str, work: str) -> dict:
    hist = spark.read.parquet(docs_path)
    batch_a = _doc_batch(spark, hist, "na")
    batch_b = _doc_batch(spark, hist, "nb")
    out: dict = {"rows_history": hist.count()}
    runs = []
    res = None
    store = None
    for _ in range(RUNS):
        release_caches(blocking=True)
        path = tempfile.mkdtemp(prefix="winstore_", dir=work)
        store = dd.WindowStore(spark, path, id_col="doc_id")
        store.bootstrap(hist, "text")
        t0 = time.perf_counter()
        res = store.ingest(batch_a, "text", min_run_tokens=12)
        runs.append(round(time.perf_counter() - t0, 3))
    out["t_ingest_runs"] = runs
    out["t_ingest"] = min(runs)
    out["n_new"] = res.filter(F.col("is_new") == 1).count()
    out["n_dup"] = res.filter(F.col("is_new") == 0).count()
    t0 = time.perf_counter()
    store.ingest(batch_b, "text", min_run_tokens=12)
    out["t_ingest_day2"] = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)
    return out


def probe_semantic_store(spark, emb_path: str, work: str, factor: int) -> dict:
    hist = spark.read.parquet(emb_path)
    k = 8 * factor  # deployment-shaped: cells ~constant-size
    cents = kmeans_fit_sample(
        hist, "vec_id", "embedding", k=k, max_iter=5, sample_size=1024
    )
    dup_half = (
        hist.filter(F.col("vec_id") < 1_000_000)
        .orderBy("vec_id")
        .limit(BATCH // 2)
        .select(
            (F.col("vec_id") + 50_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x + F.lit(1e-5)).cast("float")
            ).alias("embedding"),
        )
    )
    dims = len(hist.select("embedding").first()[0])

    def _novel(offset: int):
        # pseudo-random ±1 sign vectors (xxhash64 of (id, dim)): pairwise
        # near-orthogonal, so novels neither collapse intra-batch nor
        # brush history — they must APPEND, exercising the write half.
        # (A near-constant generator is degenerate here: all constant
        # vectors are mutually parallel, cos ~ 1.)
        return spark.range(BATCH // 2).select(
            (F.col("id") + offset).alias("vec_id"),
            F.transform(
                F.array_repeat(F.col("id").cast("float"), dims),
                lambda x, i: (
                    F.pmod(F.xxhash64(x.cast("long"), i), F.lit(2)) * 2 - 1
                ).cast("float"),
            ).alias("embedding"),
        )

    batch = dup_half.unionAll(_novel(60_000_000))
    batch_b = dup_half.unionAll(_novel(70_000_000))
    out: dict = {"rows_history": hist.count(), "k": k}
    runs = []
    res = None
    store = None
    for _ in range(RUNS):
        release_caches(blocking=True)
        path = tempfile.mkdtemp(prefix="semstore_", dir=work)
        store = SemanticStore(
            spark, path, id_col="vec_id", vec_col="embedding", threshold=0.98
        )
        t0 = time.perf_counter()
        store.bootstrap(hist, cents)
        t_boot = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        res = store.ingest(batch)
        runs.append(round(time.perf_counter() - t0, 3))
    out["t_bootstrap"] = t_boot
    out["t_ingest_runs"] = runs
    out["t_ingest"] = min(runs)
    out["n_kept"] = res.filter(F.col("is_kept") == 1).count()
    out["n_dropped"] = res.filter(F.col("is_kept") == 0).count()
    t0 = time.perf_counter()
    store.ingest(batch_b)
    out["t_ingest_day2"] = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)
    return out


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("scale_probe_r16_stores", cpus="16")
    work = tempfile.mkdtemp(prefix="probe_r16s_")
    results: dict = {"sf": 0.1, "scales": list(SCALES), "batch": BATCH,
                     "targets": {}}
    try:
        for name, replicate, probe in (
            ("signature_store_ingest", replicate_documents,
             lambda sp, p, f: probe_signature_store(sp, p, work)),
            ("hamming_store_ingest", replicate_documents,
             lambda sp, p, f: probe_hamming_store(sp, p, work)),
            ("window_store_ingest", replicate_documents,
             lambda sp, p, f: probe_window_store(sp, p, work)),
            ("semantic_store_ingest", replicate_embeddings,
             lambda sp, p, f: probe_semantic_store(sp, p, work, f)),
        ):
            if only and name not in only:
                continue
            per_scale = {}
            for factor in SCALES:
                path = replicate(spark, work, factor)
                per_scale[f"x{factor}"] = probe(spark, path, factor)
                print(f"  {name} x{factor}: "
                      f"{json.dumps(per_scale[f'x{factor}'])}", file=sys.stderr)
            kinds = [s["plan_kinds"] for s in per_scale.values()
                     if "plan_kinds" in s]
            if kinds:
                per_scale["kinds_invariant"] = all(k == kinds[0] for k in kinds)
                per_scale["cartesian_free"] = all(
                    k["cartesian"] == 0 for k in kinds
                )
            results["targets"][name] = per_scale
        print(json.dumps(results, indent=1))
        bad = [n for n, t in results["targets"].items()
               if not t.get("cartesian_free", True)]
        if bad:
            print(f"CARTESIAN AT SCALE: {bad}", file=sys.stderr)
            sys.exit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
