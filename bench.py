#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The stdout line is deliberately COMPACT (~700 chars): the driver that
records it captures only the tail of stdout, and round 13's artifact of
record lost its ``value`` field when in-line instrumentation grew the
JSON past that window (BENCH_r13 ``"parsed": null``).  Everything that
is not needed to read the headline — raw per-query runs, the extras
block, cool-down batches, per-window calibration — goes to a sidecar
``bench_detail.json`` next to this script, referenced by name in the
compact line's ``detail`` field.

Each query is fully materialized through the ``noop`` sink (real
execution, no driver-side collect bottleneck). Numbers are recorded in
BASELINE.md; the first recorded value per row is the frozen baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward
# the shuffle-heavy shapes that dominate at scale.
HEADLINE = [
    "agg_pricing_summary",      # filtered scan + multi-agg
    "agg_rollup",               # grouping sets over dim joins
    "join_revenue_per_customer",  # fact-fact join + agg
    "join_region_revenue",      # snowflake broadcast chain
    "join_anti",                # anti join
    "win_topk_per_group",       # window top-k
    "events_sessionize",        # lag-gap sessionization
    "events_window_tumbling",   # time-window agg
    "fn_explode",               # generate + re-agg fan-out
    "dedup_exact",              # hash-group dedup
    "dedup_minhash_lsh",        # shingle -> minhash -> band join
    "dedup_ngram_jaccard",      # inverted-index pair join
    "sim_cosine_topk",          # broadcast brute-force ANN baseline
    "text_quality",             # scalar battery over documents
    "asof_event_value",         # union-window as-of
]


def _calibrate(spark) -> list[float]:
    """Fixed-cost contention sentinel: a constant-size shuffle+agg over
    generated data (no parquet, no sf dependence) whose cost on this box
    is known (~0.3 s idle; BASELINE.md records the reference band).

    Round 6's driver bench artifact ran every query 1.5-2.5x slower than
    two independent runs of the same code because the box was contended
    — and nothing in the JSON made that detectable.  Emitting this
    query's min-of-3 next to the suite number lets any reader normalize:
    if ``calibration_s`` is far above its idle band, the suite number is
    a contended sample, not a code regression.
    """
    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 4_000_000, 1, 32)
            .groupBy((F.col("id") % 100_003).alias("k"))
            .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def _self_sha(n_hex: int = 12) -> str:
    """sha256 prefix of this script's own bytes, or "unreadable" — the
    hash must degrade, never abort, after minutes of measured work."""
    import hashlib

    try:
        with open(os.path.abspath(__file__), "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()[:n_hex]
    except OSError:
        return "unreadable"


def _fmt_exc(exc: Exception) -> str:
    """One-line error record; the `or [""]` guards an empty message
    from IndexError-ing out of the containment itself."""
    return f"{type(exc).__name__}: {(str(exc).splitlines() or [''])[0][:200]}"


def _timed_run(fn, spark, sf_dir: str) -> float:
    """One fully-materialized execution (noop sink) of a registry
    query, wall-clock seconds — THE shared timing protocol of all
    three headline passes and the registry extras, so a change to it
    (sink, rounding, the cache-release step below) cannot skew one
    pass against another.

    COLD-RUN HONESTY (round 17, advisor item 1): operator pins are
    released and the session cache cleared after EVERY timed run, not
    once per min-of-3 triple.  Through round 16 the release ran only
    after each triple, so for any query that ``pin()``s an
    intermediate (the LSH families, the composites) runs 2-3 read the
    run-1 InMemoryRelation back instead of recomputing it —
    CacheManager substitutes cached plans by ``sameResult`` — and
    min-of-3 reported a warm number (measured here: dedup_minhash_lsh
    1.66 warm vs 4.2-6.5 cold, dedup_ngram_jaccard 1.34 warm vs
    5-6.3 cold).  Every recorded run now computes the full pipeline
    from the parquet inputs.  The release itself is OUTSIDE the timed
    window and blocking, so async block eviction cannot overlap the
    next run's timing.  The ``value`` FORMULA is unchanged (pass-1
    min-of-3); what changed is that each run is genuinely cold —
    recorded as a harness change in OPTIMIZATION_r17.md, with the
    warm-formula numbers kept there for cross-round comparison."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)
    spark.catalog.clearCache()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench", cpus=cpus)
    # Warm the JVM + parquet footers so q1 doesn't pay one-time costs.
    plans.REGISTRY["agg_global"].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    # Contention sentinel, sampled before AND after the suite so
    # mid-run load spikes are visible too.  Bounded cool-down: the
    # r11/r12 driver artifacts both sampled a contended window
    # (calibration 0.578/0.514 vs the 0.33-0.45 idle band) because
    # the driver's own preceding work heats the box; when the FIRST
    # calibration reads out of band, wait briefly and re-measure (at
    # most twice, <=40 s added) so a transient spike doesn't stamp
    # the whole artifact as non-comparable.  All samples are
    # reported; a genuinely busy box still shows out-of-band numbers.
    calibration_pre = _calibrate(spark)
    pre_batches = [calibration_pre]
    for _ in range(2):
        if min(calibration_pre) <= 0.45:
            break
        time.sleep(20)
        retry = _calibrate(spark)
        pre_batches.append(retry)
        improved = min(retry) < 0.9 * min(calibration_pre)
        # accept the retry only when it is at least as good: a LAST
        # retry that reads worse than the batch that triggered it must
        # not displace the better sample from calibration_s (the
        # superseded batches survive only in the detail sidecar)
        if min(retry) <= min(calibration_pre):
            calibration_pre = retry
        # the idle floor is host-epoch-dependent (BASELINE.md: the
        # 0.33-0.45 band is unreachable on some epochs however quiet
        # the box) — when a retry stops improving materially we are AT
        # the floor, and further waiting just delays the suite
        if not improved:
            break
    # batches superseded by a cool-down retry — nothing measured is
    # dropped from the artifact; the accepted batch is whichever pre
    # batch carries the best (minimum) sample
    cooldown_retries = [b for b in pre_batches if b is not calibration_pre]

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    runs_pass2: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = plans.REGISTRY[name].fn
        runs = []
        # min-of-3: run 1 pays codegen/compile; runs 2-3 absorb this
        # box's +/-2x contention swings on the shuffle-heavy queries
        # (measured: identical code, 1.6s-8.0s across back-to-back runs)
        # Per-query containment: one failing query records an error
        # field instead of aborting the suite — a single regression
        # must never zero the whole round's perf signal.
        try:
            for _ in range(3):
                runs.append(_timed_run(fn, spark, sf_dir))
            timings[name] = round(min(runs), 3)
            all_runs[name] = runs
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            errors[name] = _fmt_exc(exc)
            print(f"  {name}: FAILED ({errors[name]})", file=sys.stderr)
            continue
        finally:
            # operators that persist intermediates (minhash signatures)
            # must not bleed executor memory into later queries' numbers
            spark.catalog.clearCache()
        print(f"  {name}: {timings[name]:.3f}s (runs: {[f'{r:.2f}' for r in runs]})",
              file=sys.stderr)

    # Second headline pass (round 15): one more timed run per query
    # AFTER the whole suite has executed once.  The per-boot host-noise
    # characterization (BASELINE.md, 18 round-14 anchors spanning
    # 7.97-14.43 s on identical code) showed single-window sampling is
    # the dominant artifact-variance term: pass 1's three runs of a
    # query land back-to-back in ONE contention window, so a load spike
    # there inflates that query with no later chance to recover.  The
    # second pass re-samples every query minutes later in a different
    # window.  Round 16 (advisor note): `value` stays on the ORIGINAL
    # pass-1 min-of-3 formula so it remains comparable against the
    # frozen reference baseline and rounds 1-14 (r15 is the one round
    # whose `value` mixed passes); the cross-pass floor is reported as
    # the SEPARATE `value_floor` field — the contention-resistant
    # number to read when calibration says pass 1 was contended.
    # Bounded cost: one warm run per query, ~+10 s at sf0.1.
    timings_floor = dict(timings)
    for name in HEADLINE:
        if name in errors:
            continue  # already failed whole-pass; don't re-litigate
        fn = plans.REGISTRY[name].fn
        try:
            run2 = _timed_run(fn, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — pass 2 only improves
            print(f"  [pass2] {name}: FAILED ({_fmt_exc(exc)})",
                  file=sys.stderr)
            continue
        finally:
            spark.catalog.clearCache()
        runs_pass2[name] = [run2]
        if run2 < timings_floor[name]:
            timings_floor[name] = run2
    print(f"  [pass2] cross-pass floor updated "
          f"({sum(len(v) for v in runs_pass2.values())} extra runs)",
          file=sys.stderr)

    # Bounded third pass (round 16): ONLY for queries whose pass-1-min
    # vs pass-2 spread exceeds 2x — i.e. the two windows disagree so
    # badly that one of them was certainly a load spike; a third
    # window arbitrates.  Feeds `value_floor` only (never `value`).
    # Cost bound: in a quiet run nothing exceeds 2x and this pass is
    # empty; in the worst case it is one warm run per headline query.
    runs_pass3: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in runs_pass2 or name in errors:
            continue
        p1, p2 = timings[name], runs_pass2[name][0]
        if max(p1, p2) < 2.0 * min(p1, p2):
            continue
        fn = plans.REGISTRY[name].fn
        try:
            run3 = _timed_run(fn, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — pass 3 only improves
            print(f"  [pass3] {name}: FAILED ({_fmt_exc(exc)})",
                  file=sys.stderr)
            continue
        finally:
            spark.catalog.clearCache()
        runs_pass3[name] = [run3]
        if run3 < timings_floor[name]:
            timings_floor[name] = run3
        print(f"  [pass3] {name}: {run3:.3f}s (p1 {p1:.2f} / p2 {p2:.2f} "
              f"disagreed >2x)", file=sys.stderr)

    # Round-7/8 additions, timed OUTSIDE the headline total: the
    # 15-query headline set is frozen so `value` stays comparable
    # against the reference baseline and earlier rounds; these ride
    # along in a separate field for per-round visibility
    # (dedup_embedding_cosine tracks the round-8 norm-precompute win;
    # sim_ann_ivf is deliberately NOT benched — its time is ~90% the
    # k-means FIT's per-iteration job dispatch, which a production
    # deployment pays once at index build, so the number would track
    # scheduler latency rather than the ANN probe the query exists
    # for — the recall test at sf0.1 is its perf/quality gate).
    # Per-window contention sentinel sampled immediately BEFORE the
    # extras block: the pre-suite cool-down protects the headline, but
    # the extras run after it un-guarded — BENCH_r13's extras sampled
    # the most contended window of any round (cold dsir A/B read
    # reversed purely from load) and nothing in the artifact made that
    # self-diagnosing.  A reader comparing extras across rounds checks
    # this sample first; far above the idle band means the extras (not
    # the headline) are a contended sample.
    calibration_extras = _calibrate(spark)

    extra: dict[str, float] = {}
    extra_runs: dict[str, list[float]] = {}
    extra_errors: dict[str, str] = {}
    for name in ("pipeline_pretrain_corpus", "dedup_incremental_lsh",
                 "dedup_decontaminate", "dedup_embedding_cosine",
                 "dedup_simhash_pairs", "dedup_substring_spans",
                 "dedup_incremental_substring",
                 # round-10 additions: the connected-components closure
                 # consumers (pairs -> groups) and the three binary-
                 # modality gate queries (mapInPandas decode + shared
                 # Hamming pair stage)
                 "dedup_substring_groups", "dedup_minhash_groups",
                 "mm_image_near_dup", "mm_video_near_dup",
                 "mm_audio_near_dup",
                 # round-11 additions: the four new gate rows — the
                 # sequence-modality pair stages (frame-dHash scenes,
                 # sub-fingerprint segments), the simhash-distance
                 # decontamination, and the cross-modal probe lookup
                 "mm_video_scene_pairs", "mm_audio_segment_pairs",
                 "mm_fuzzy_decontaminate", "mm_image_in_video"):
        try:
            # the shared _timed_run protocol (noop sink + per-run
            # cache release) — extras are cold min-of-3 like the
            # headline since round 17; raw runs land in the sidecar
            # so warm/cold contamination is auditable per run
            runs = []
            for _ in range(3):
                runs.append(_timed_run(plans.REGISTRY[name].fn, spark, sf_dir))
            extra[name] = round(min(runs), 3)
            extra_runs[name] = runs
        except Exception as exc:  # noqa: BLE001 — extras never gate:
            # a failed extra must NOT set `incomplete` or join `errors`
            # (both describe the frozen headline set whose total is
            # `value`); it gets its own field and a loud stderr line.
            extra_errors[name] = _fmt_exc(exc)
            print(f"  [extra] {name}: FAILED ({extra_errors[name]})",
                  file=sys.stderr)
        finally:
            spark.catalog.clearCache()
        if name in extra:
            print(f"  [extra] {name}: {extra[name]:.3f}s", file=sys.stderr)

    # IvfIndex build+probe cycle (round-8 operator): not a registry
    # query — it is the persisted build-once/probe-many API — so it is
    # timed here directly: one index build, then min-of-3 probe
    # batches (100 queries, n_probe=2) against the on-disk index.
    # The BUILD number includes the k-means fit (per-iteration job
    # dispatch dominates at this SF; a deployment pays it once per
    # rebuild); the PROBE number is the steady-state cost the index
    # exists for and is the one to watch across rounds.
    import shutil
    import tempfile

    from git_log_to_sqlite_spark.operators import IvfIndex

    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = IvfIndex(spark, ivf_dir, id_col="vec_id", vec_col="embedding")
        # stage-timed (fit / assign_write / centroids_write, flat
        # float keys): the build is the most contention-variance-
        # prone extra (5-14 s under load vs a 3.1-4.1 s floor), and a
        # whole-run wall clock made every out-of-floor sample a
        # re-litigation of contention-vs-code; the stage split shows
        # WHICH term absorbed the load.
        stages: dict = {}
        t0 = time.perf_counter()
        idx.build(emb, k=8, max_iter=5, stage_times=stages)
        extra["ivf_index_build"] = round(time.perf_counter() - t0, 3)
        for st, secs in stages.items():
            extra[f"ivf_index_build_{st}"] = secs
        probes = emb.orderBy("vec_id").limit(100)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            # since round 14 each probe() call pays the pinned-batch
            # checkpoint + cell-set collect that guarantee static
            # partition pruning (band moved ~0.94-1.15 -> ~1.3-1.6 s
            # at sf0.1; flat in corpus size — BASELINE.md round 14)
            idx.probe(probes, n_probe=2, k=5).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_caches(blocking=True)  # round-17 cold-run protocol
            spark.catalog.clearCache()
        extra["ivf_index_probe"] = round(min(runs), 3)
        extra_runs["ivf_index_probe"] = runs
        print(
            f"  [extra] ivf_index build: {extra['ivf_index_build']:.3f}s "
            f"probe: {extra['ivf_index_probe']:.3f}s",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001 — extras never gate
        extra_errors["ivf_index"] = _fmt_exc(exc)
        print(f"  [extra] ivf_index: FAILED ({extra_errors['ivf_index']})",
              file=sys.stderr)
    finally:
        spark.catalog.clearCache()
        shutil.rmtree(ivf_dir, ignore_errors=True)

    # SemDeDup annotate stage (round-11 operator): not yet a registry
    # query (gated round 12 as sem_dedup_assign) — timed directly with
    # a prefit quantizer, the steady-state shape: the bounded-sample
    # fit is a once-per-rebuild cost already tracked by
    # ivf_index_build; the annotate (assignment + rank window +
    # cell-local pair join) is what a curation pipeline pays per run.
    try:
        from git_log_to_sqlite_spark.operators import (
            kmeans_fit_sample,
            semantic_dedup,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = kmeans_fit_sample(emb, "vec_id", "embedding", k=8,
                                  max_iter=5, sample_size=1024)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            semantic_dedup(emb, "vec_id", "embedding", cents,
                           threshold=0.3).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_caches(blocking=True)  # round-17 cold-run protocol
            spark.catalog.clearCache()
        extra["semantic_dedup_annotate"] = round(min(runs), 3)
        extra_runs["semantic_dedup_annotate"] = runs
        print(
            f"  [extra] semantic_dedup_annotate: "
            f"{extra['semantic_dedup_annotate']:.3f}s",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001 — extras never gate
        extra_errors["semantic_dedup"] = _fmt_exc(exc)
        print(
            f"  [extra] semantic_dedup: FAILED ({extra_errors['semantic_dedup']})",
            file=sys.stderr,
        )
    finally:
        spark.catalog.clearCache()

    # DSIR selection (round-11 operator, gated same-round as
    # sample_dsir): weights + md5-Gumbel top-n at the gate parameters,
    # then the SAME selection under the production xxhash64 feature
    # hash (round-12 knob) — the pair measures exactly the md5-vs-
    # native-hash cost BASELINE.md names as DSIR's dominant term.
    try:
        from pyspark.sql import functions as F

        from git_log_to_sqlite_spark.operators import dsir_select

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        raw_docs = docs.filter(F.col("doc_id") % 29 != 0)
        tgt_docs = docs.filter(F.col("doc_id") % 29 == 0)
        # release_caches comes from the module-level import; a local
        # re-import here would make the name function-local and
        # UnboundLocalError the EARLIER ivf/semantic blocks

        for hf, key in (("md5", "dsir_select"),
                        ("xxhash64", "dsir_select_xxhash64")):
            # per-leg try: an md5 failure must not skip the xxhash64
            # measurement, and each leg's error lands under ITS key
            try:
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    dsir_select(
                        raw_docs, tgt_docs, "doc_id", "text", n=50,
                        buckets=2048, hash_fn=hf,
                    ).write.mode("overwrite").format("noop").save()
                    runs.append(round(time.perf_counter() - t0, 3))
                    # DROP the operator pin between runs (the round-17
                    # protocol for every extra; this row was cold from
                    # the start): the row exists to track the
                    # per-gram hashing cost (the md5 oracle trade vs
                    # the xxhash64 knob), and a warm rf cache bypasses
                    # exactly that stage — both legs would read the
                    # same cached-selection time. BLOCKING, so async
                    # block eviction cannot overlap the next timed
                    # window.
                    release_caches(blocking=True)
                extra[key] = round(min(runs), 3)
                extra_runs[key] = runs
                print(f"  [extra] {key}: {extra[key]:.3f}s", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 — extras never gate
                extra_errors[key] = _fmt_exc(exc)
                print(f"  [extra] {key}: FAILED ({extra_errors[key]})",
                      file=sys.stderr)
            finally:
                # a mid-leg failure must not leak this leg's pinned
                # frames into the next leg's first timed run
                release_caches(blocking=True)
    except Exception as exc:  # noqa: BLE001 — the shared scan setup
        # a setup failure precedes BOTH legs: record it under both
        # keys so neither reads as silently dropped
        for key in ("dsir_select", "dsir_select_xxhash64"):
            extra_errors.setdefault(key, _fmt_exc(exc))
            print(f"  [extra] {key}: FAILED ({extra_errors[key]})",
                  file=sys.stderr)
    finally:
        spark.catalog.clearCache()

    # Subword-tokenizer Arrow seam (round 15): the stub tokenizer over
    # the full documents table — tracks the mapInPandas transport +
    # per-text Python call cost a real-tokenizer deployment pays, the
    # one Python hot path in the text battery (everything else is
    # codegen). Warm min-of-3, noop sink, extras-class (never gates).
    try:
        from git_log_to_sqlite_spark.operators import subword_token_counts

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            subword_token_counts(docs, "doc_id", "text").write.mode(
                "overwrite"
            ).format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_caches(blocking=True)  # round-17 cold-run protocol
            spark.catalog.clearCache()
        extra["text_subword_tokens_seam"] = round(min(runs), 3)
        extra_runs["text_subword_tokens_seam"] = runs
        print(
            f"  [extra] text_subword_tokens_seam: "
            f"{extra['text_subword_tokens_seam']:.3f}s",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001 — extras never gate
        extra_errors["text_subword_tokens_seam"] = _fmt_exc(exc)
        print(
            f"  [extra] text_subword_tokens_seam: FAILED "
            f"({extra_errors['text_subword_tokens_seam']})",
            file=sys.stderr,
        )
    finally:
        spark.catalog.clearCache()

    calibration_post = _calibrate(spark)

    total = round(sum(timings.values()), 3)
    total_floor = round(sum(timings_floor.values()), 3)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json")
    # COMPACT driver-parsed line: metric/value/queries/sf/calibration
    # only (~700 chars) — the driver captures a bounded stdout tail and
    # round 13's in-line extras grew the JSON past it, nulling the
    # artifact of record.  Everything else lives in the sidecar.
    out = {
        "metric": "headline_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # Harness self-identification (round 17): sha256 prefix of this
        # file's own bytes.  The round-16 driver hint
        # `bench_harness_changed: false` missed a 90-line bench.py diff
        # (VERDICT r16 §What's wrong 3); with the hash in the artifact
        # of record, harness identity across rounds is checkable from
        # the JSON alone — equal hash == byte-identical harness.
        "bench_sha": _self_sha(),
        # Cross-pass per-query floor (passes 1-3, later contention
        # windows): the contention-resistant reading.  `value` itself
        # is pass-1 min-of-3 only — the formula every round except r15
        # used — so it stays comparable vs baseline/earlier rounds.
        "value_floor": total_floor,
        "sf": sf,
        # Contention sentinel: fixed-cost generated-data shuffle+agg,
        # ~0.3 s on this box when idle (band in BASELINE.md).  A value
        # well above the band means the suite ran on a contended box and
        # `value` is not comparable across rounds.
        "calibration_s": round(min(calibration_pre + calibration_post), 3),
        # Full instrumentation (raw runs, extras, per-window
        # calibration, cool-down batches) — sidecar filename, not
        # inlined, to keep this line inside the capture window.
        "detail": os.path.basename(detail_path),
    }
    detail = {
        # Self-identification: the sidecar is overwritten per run, so a
        # reader pairing it with a recorded stdout line checks these
        # match that line's sf/value before trusting the detail.
        "sf": sf,
        "value": total,
        "calibration_runs": {"pre": calibration_pre,
                             "extras": calibration_extras,
                             "post": calibration_post},
        # Round 17: EVERY timed run (headline passes 1-3 and all
        # extras) is cold — operator pins released + session cache
        # cleared between runs — so this field now names every row.
        # Through round 16 only the dsir pair was cold and the other
        # extras' min-of-3 could read pin-warm runs (r16 advisor
        # item 1); kept as "all" so cross-round readers see the
        # protocol boundary from the sidecar alone.
        "extra_cold": "all",
        # Pre-suite calibration batches superseded by a cool-down
        # retry: non-empty means the suite start was delayed 20 s per
        # entry; calibration_runs "pre" is the accepted (best) batch.
        "calibration_cooldown_retries": cooldown_retries,
        # Raw per-query runs (run 1 includes codegen/compile) so a
        # reader can audit variance instead of trusting min-of-3.
        "runs": all_runs,
        # Round-15 second headline pass (+ round-16 conditional third):
        # warm re-samples in later contention windows.  Since round 16
        # these feed ONLY the floor: `queries[name]`/`value` are pass-1
        # min-of-3 (the formula of rounds 1-14 and the frozen
        # baseline); `queries_floor`/`value_floor` take the min across
        # all passes.  Pass 3 ran only for the names listed here —
        # those whose pass-1/pass-2 spread exceeded 2x.
        "runs_pass2": runs_pass2,
        "runs_pass3": runs_pass3,
        "queries_floor": timings_floor,
        "value_floor": total_floor,
        "headline_formula": "value = sum of pass-1 min-of-3 "
                            "(baseline-comparable); value_floor = sum "
                            "of per-query min across passes 1-3; "
                            "since round 17 every run is COLD "
                            "(operator pins released + cache cleared "
                            "between every timed run, all passes)",
        # Non-headline queries (excluded from `value` so the suite
        # total stays comparable across rounds / vs baseline).
        "extra": extra,
        # Raw per-run extras (round 17): same audit surface the
        # headline's `runs` has — the r16 advisor showed min-of-3
        # extras hid pin-warm runs 2-3 with no way to see it.
        "extra_runs": extra_runs,
    }
    if extra_errors:
        detail["extra_errors"] = extra_errors
    if errors:
        # value covers only completed queries — flag the gap loudly.
        out["errors"] = errors
        out["incomplete"] = True
    _write_detail(detail, detail_path, out)
    print(json.dumps(out))
    spark.stop()


def _write_detail(detail: dict, detail_path: str, out: dict) -> None:
    """Write the instrumentation sidecar WITHOUT ever costing the
    stdout line: the compact line is the artifact of record, and an
    unwritable script dir (read-only checkout, full disk) after
    minutes of measured work would otherwise destroy exactly what the
    sidecar split protects. A failed write surfaces as
    ``detail_error`` in the compact line instead."""
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except (OSError, TypeError, ValueError) as exc:
        # TypeError/ValueError: a future extra slipping a
        # non-serializable value (numpy scalar, set) into the detail
        # must degrade the SIDECAR, not the artifact of record
        out["detail_error"] = f"{type(exc).__name__}: {exc}"


if __name__ == "__main__":
    main()
