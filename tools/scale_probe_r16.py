#!/usr/bin/env python
"""Round-16 10x distinct-content scale probe for the MULTIMODAL pair
family (VERDICT.md round-15 item 3) — the one heavy operator family
that had no measured scale curve: ``mm_video_scene_pairs`` (per-frame
dHash feeding the factored substring pipeline) and
``mm_audio_segment_pairs`` (Haitsma-Kalker sub-fingerprint words
through the same windowed inverted-index join).

Protocol is ``scale_probe_r15.py``'s, reused by import: distinct-
content replication of the sf0.1 documents table at 1x/4x/10x (each
replica's tokens carry an ``r{i}_`` prefix so payload BYTES — and
therefore frame hashes and sub-fingerprint words — differ across
replicas; no frame run or word window ever matches cross-replica, the
honest linear regime), warm min-of-2 per stage, an exchange-kind
fingerprint per scale, and a hard zero-Cartesian contract with
BHJ<->SMJ size adaptation reported rather than failed (the round-14
axis-4 sweep proved that trade semantics-preserving).

Per-stage floats: the Python DECODE stage (mapInPandas frame
fingerprinting — the modality's predicted dominant cost, linear by
construction: one Arrow batch per partition, payloads never shuffled)
is timed separately from the full pair pipeline, so a super-linear
total attributes to the JOIN side and not the decode.

Results land in BASELINE.md (round 16) and
``tools/scale_probe_r16_results.json``.  Not part of the gate or
bench — a committed, reproducible measurement harness.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from scale_probe_r15 import (  # noqa: E402
    SCALES,
    plan_kinds,
    replicate_documents,
    timed,
)

from git_log_to_sqlite_spark.operators import multimodal as mm  # noqa: E402
from git_log_to_sqlite_spark.operators.caching import release_caches  # noqa: E402
from git_log_to_sqlite_spark.plans import llm_ops  # noqa: E402
from git_log_to_sqlite_spark.session import get_spark  # noqa: E402


def probe_video_scenes(spark, docs_path: str) -> dict:
    docs = spark.read.parquet(docs_path)
    media = mm.as_media(docs, "doc_id", "text", mime="video/raw")

    def mk_frames():
        return mm.video_frame_dhash(
            media,
            rows=6,
            cols=10,
            frame_bytes=llm_ops._SCENE_FRAME_BYTES,
            grid_fn=mm._luma_grid_stub,
        )

    def mk_pairs():
        return mm.video_shared_scene_pairs(
            media,
            rows=6,
            cols=10,
            frame_bytes=llm_ops._SCENE_FRAME_BYTES,
            min_run_frames=llm_ops._SCENE_MIN_RUN,
            max_df_quantile=llm_ops._SUBSTR_Q,
            quantile_headroom=llm_ops._SUBSTR_HEADROOM,
            grid_fn=mm._luma_grid_stub,
        )

    t_decode, decode_runs = timed(mk_frames)
    t_pairs, pair_runs = timed(mk_pairs)
    return {
        "rows": docs.count(),
        "frame_rows": mk_frames().count(),
        "pair_rows": mk_pairs().count(),
        "t_decode": t_decode,
        "decode_runs": decode_runs,
        "t_pairs_total": t_pairs,
        "pair_runs": pair_runs,
        "t_join_est": round(t_pairs - t_decode, 3),
        "plan_kinds": plan_kinds(mk_pairs()),
    }


def probe_audio_segments(spark, docs_path: str) -> dict:
    docs = spark.read.parquet(docs_path)
    media = mm.as_media(docs, "doc_id", "text", mime="audio/raw")

    def mk_frames():
        return mm.audio_frame_fingerprints(
            media,
            frame_bytes=llm_ops._ASEG_FRAME_BYTES,
            bands=llm_ops._ASEG_BANDS,
        )

    def mk_pairs():
        return mm.audio_shared_segment_pairs(
            media,
            frame_bytes=llm_ops._ASEG_FRAME_BYTES,
            bands=llm_ops._ASEG_BANDS,
            min_run=llm_ops._ASEG_MIN_RUN,
            window=llm_ops._ASEG_WINDOW,
            max_df_quantile=llm_ops._SUBSTR_Q,
            quantile_headroom=llm_ops._SUBSTR_HEADROOM,
        )

    t_decode, decode_runs = timed(mk_frames)
    t_pairs, pair_runs = timed(mk_pairs)
    return {
        "rows": docs.count(),
        "frame_rows": mk_frames().count(),
        "pair_rows": mk_pairs().count(),
        "t_decode": t_decode,
        "decode_runs": decode_runs,
        "t_pairs_total": t_pairs,
        "pair_runs": pair_runs,
        "t_join_est": round(t_pairs - t_decode, 3),
        "plan_kinds": plan_kinds(mk_pairs()),
    }


def probe_image_in_video(spark, docs_path: str) -> dict:
    """PROBE SHAPE (round-16 extension): the still batch is FIXED
    (replica-0's every-41st doc) while the video corpus grows — the
    cross-modal lookup's deployment regime. The corpus-side frame
    decode + banding is an honest linear term (every frame must hash
    once); the pair mass is bounded by the probe side."""
    docs = spark.read.parquet(docs_path)
    stills = mm.as_media(
        docs.filter(
            (F.col("doc_id") < 1_000_000)
            & (F.col("doc_id") % llm_ops._STILL_MOD == 0)
        ),
        "doc_id", "text", mime="image/raw",
    )
    media = mm.as_media(docs, "doc_id", "text", mime="video/raw")

    def mk():
        return mm.image_in_video_frames(
            stills, media, rows=6, cols=10,
            frame_bytes=llm_ops._IIV_FRAME_BYTES, max_hamming=3,
            grid_fn=mm._luma_grid_stub,
        )

    t_total, runs = timed(mk)
    return {
        "rows": docs.count(),
        "n_stills": stills.count(),
        "hit_rows": mk().count(),
        "t_total": t_total,
        "runs": runs,
        "plan_kinds": plan_kinds(mk()),
    }


def probe_fuzzy_decontaminate(spark, docs_path: str) -> dict:
    """PROBE SHAPE: the benchmark is FIXED (replica-0's every-29th
    doc) while the training corpus grows — decontamination's
    deployment regime. Linear simhash scan of train; candidate mass
    bounded by the benchmark's band table."""
    from git_log_to_sqlite_spark.operators import dedup as dd

    docs = spark.read.parquet(docs_path)
    bench = docs.filter(
        (F.col("doc_id") < 1_000_000) & (F.col("doc_id") % 29 == 0)
    )
    train = docs.join(bench.select("doc_id"), "doc_id", "left_anti")

    def mk():
        return dd.fuzzy_decontaminate(
            train, bench, "doc_id", "text", bits=32, bands=4, max_hamming=3
        )

    t_total, runs = timed(mk)
    return {
        "rows": docs.count(),
        "n_bench": bench.count(),
        "kept_rows": mk().count(),
        "t_total": t_total,
        "runs": runs,
        "plan_kinds": plan_kinds(mk()),
    }


def main() -> None:
    import shutil
    import tempfile

    only = set(sys.argv[1:])
    spark = get_spark("scale_probe_r16", cpus="16")
    work = tempfile.mkdtemp(prefix="probe_r16_")
    results: dict = {"sf": 0.1, "scales": list(SCALES), "targets": {}}
    try:
        for name, probe in (
            ("mm_video_scene_pairs", probe_video_scenes),
            ("mm_audio_segment_pairs", probe_audio_segments),
            ("mm_image_in_video_probe", probe_image_in_video),
            ("mm_fuzzy_decontaminate_probe", probe_fuzzy_decontaminate),
        ):
            if only and name not in only:
                continue
            per_scale = {}
            for factor in SCALES:
                path = replicate_documents(spark, work, factor)
                per_scale[f"x{factor}"] = probe(spark, path)
                # drop the operator's pinned window tables between
                # scales (the r15 protocol): both pair operators pin
                # their capped window table, and carrying a prior
                # scale's pin into the next measurement turns that
                # window into eviction churn (the first r16 probe run
                # measured audio x1 at a steady 7.5-9.2 s purely from
                # evicting video x10's pins; released, it reads ~1 s)
                release_caches(blocking=True)
                print(f"  {name} x{factor}: "
                      f"{json.dumps(per_scale[f'x{factor}'])}", file=sys.stderr)
            kinds = [s["plan_kinds"] for s in per_scale.values()]
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
