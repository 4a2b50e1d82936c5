"""Operator-library tests: dedup properties, ANN recall, as-of
semantics, multimodal plumbing. Complements the oracle suite (which
checks SQL-expressible value parity) with semantic properties the
oracle can't state."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from git_log_to_sqlite_spark.operators import (
    asof_join,
    brute_force_topk,
    bucketed_ann_topk,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ordered_row_number,
    ordered_running_sum,
    simhash,
)
from git_log_to_sqlite_spark.operators.multimodal import (
    HAS_PIL,
    _decode_image_stub,
    as_media,
    extract_image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (6, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_survivor_and_counts(docs):
    out = exact_dedup(docs, ["text"], "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 1 in by_id and 2 not in by_id  # min-id survivor
    assert by_id[1]["n_copies"] == 2
    assert len(out) == 5


def test_exact_dedup_idempotent(docs):
    once = exact_dedup(docs, ["text"], "doc_id")
    twice = exact_dedup(once.select("doc_id", "text"), ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in twice.collect()) == sorted(
        r["doc_id"] for r in once.collect()
    )


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    }
    assert pairs.get((1, 2)) == 1.0  # identical docs
    assert (1, 3) in pairs  # one-word change
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_max_df_drops_hot_shingle_pairs(spark):
    # 6 docs share exactly one hot trigram; 2 docs are true near-dups
    # through rare shingles only.
    rows = [(i, f"common common common u{i}a u{i}b u{i}c") for i in range(1, 7)]
    rows += [(7, "x y z w q r"), (8, "x y z w q r")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.1)
    assert len(uncapped.collect()) == 15 + 1  # C(6,2) hot pairs + (7,8)

    from pyspark.sql import Observation

    obs = Observation("cap_metrics")
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.1, max_df=5, observation=obs
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    assert got == {(7, 8): 1.0}  # hot-shingle pairs gone, rare-shingle pair kept
    metrics = obs.get  # first-action semantics: the collect above
    assert metrics["shingles_dropped"] == 1
    assert metrics["pairs_avoided"] == 15


def test_ngram_jaccard_quantile_cap_derives_from_data(spark):
    """max_df_quantile mode: the cap is the in-plan df-quantile, so a
    hot shingle well past the quantile is dropped without any absolute
    constant. 13 doc-pairs share one unique trigram each (d=2); 6 docs
    share one hot trigram (d=6): the p92 cap lands at 2 and only the
    rare-shingle pairs survive."""
    from pyspark.sql import Observation

    rows = [(i, f"common common common u{i}a u{i}b u{i}c") for i in range(1, 7)]
    rows += [
        (100 + 2 * p + s, f"p{p}a p{p}b p{p}c p{p}d")
        for p in range(13)
        for s in (0, 1)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    obs = Observation("qcap_metrics")
    got = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.1,
            max_df_quantile=0.92, observation=obs,
        ).collect()
    }
    # d >= 2 histogram: 13 pair-trigrams x 2 each at d=2, 1 hot at d=6
    # -> ceil(.92 * 27) = 25 <= 26 cum at d=2 -> cap = 2.
    assert got == {(100 + 2 * p, 101 + 2 * p) for p in range(13)}
    assert obs.get["shingles_dropped"] == 1
    assert obs.get["pairs_avoided"] == 15


def test_jaccard_quantile_cap_preserves_pairs(spark, oracle_sf_dir):
    """The headline guarantee behind dedup_ngram_jaccard's cap: at the
    p92 df-quantile the >= threshold pair SET on the real corpus is
    identical to the uncapped pair set (hot shingles only ever carried
    pairs that rare shingles already witness)."""
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.2, max_df_quantile=0.92
        ).collect()
    }
    assert capped == uncapped and len(uncapped) > 0


def test_minhash_exact_dup_has_full_agreement(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert pairs.get((1, 2)) == 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_band_cap_preserves_pairs(spark, oracle_sf_dir):
    """The headline guarantee behind dedup_minhash_lsh's hot-band
    valve: at 10 x p92 of the bucket-size distribution the pair SET on
    the real corpus is identical to uncapped (natural max / bulk stays
    within one order of magnitude; only DEGENERATE keys land past the
    cap). The same must hold for the incremental operator's
    history-side valve."""
    from git_log_to_sqlite_spark.operators import incremental_minhash_dedup

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    uncapped = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", band_size_quantile=0.92
        ).collect()
    }
    assert capped == uncapped and len(uncapped) > 0
    history = docs.filter(F.col("doc_id") % 5 != 0)
    increment = docs.filter(F.col("doc_id") % 5 == 0)
    inc_un = {
        tuple(r)
        for r in incremental_minhash_dedup(
            history, increment, "doc_id", "text"
        ).collect()
    }
    inc_cap = {
        tuple(r)
        for r in incremental_minhash_dedup(
            history, increment, "doc_id", "text", band_size_quantile=0.92
        ).collect()
    }
    assert inc_cap == inc_un and len(inc_un) > 0


def test_band_self_join_salted_row_identical(spark, oracle_sf_dir):
    """salt_buckets on the band self-join (minhash + simhash/hamming —
    the shared :func:`_band_self_pairs` stage): the recall-PRESERVING
    hot-bucket arm. The valve DROPS degenerate buckets (recall loss by
    design, forbidden where a guarantee is promised); salting CONSUMES
    them in parallel with row-identical output — every pair still
    meets exactly once, at a's salt, and the distinct-across-bands is
    unaffected because salting never duplicates a (band, pair)
    meeting. Corpus plants a hot bucket (15 byte-identical docs: every
    band of their signatures collides) beside the real sf docs."""
    from git_log_to_sqlite_spark.operators import simhash_pairs

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    viral = spark.createDataFrame(
        [
            (100000 + i, "viral boilerplate shard every copy identical " * 3)
            for i in range(15)
        ],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").unionByName(viral)

    def norm(out):
        return sorted(map(tuple, out.collect()))

    plain = norm(minhash_lsh_pairs(corpus, "doc_id", "text"))
    # non-vacuous: the planted bucket's 105 within-family pairs are in
    # the set (est_jaccard 1.0 for byte-identical texts)
    fam = [t for t in plain if t[0] >= 100000 and t[1] >= 100000]
    assert len(fam) == 15 * 14 // 2 and all(t[2] == 1.0 for t in fam)
    for s in (4, 32):
        assert (
            norm(minhash_lsh_pairs(corpus, "doc_id", "text", salt_buckets=s))
            == plain
        ), s
    # TARGETED salting (the at-scale form: only buckets >= the
    # threshold replicate) — same rows whether the threshold bites
    # only the planted family (10), everything repeated (2), or
    # nothing at all (10**6 -> runtime-empty hot set, AQE's
    # empty-relation fold must still yield the unsalted semantics)
    for thresh in (10, 2, 10**6):
        assert (
            norm(
                minhash_lsh_pairs(
                    corpus, "doc_id", "text",
                    salt_buckets=8, salt_min_bucket=thresh,
                )
            )
            == plain
        ), thresh
    plain_sh = norm(simhash_pairs(corpus, "doc_id", "text"))
    assert (
        norm(simhash_pairs(corpus, "doc_id", "text", salt_buckets=4))
        == plain_sh
    )
    assert len(plain_sh) >= len(fam)  # identical docs are 0-hamming pairs
    assert (
        norm(
            simhash_pairs(
                corpus, "doc_id", "text",
                salt_buckets=4, salt_min_bucket=10,
            )
        )
        == plain_sh
    )


def test_band_self_join_salted_plan_pinned_and_validated(spark):
    """The salted band join must carry the same load-bearing plan
    shape as the semantic pair join (one shared helper now —
    :func:`~.skew.salted_pair_sides`): both sides explicitly
    co-partitioned at a FIXED count (REPARTITION_BY_NUM — the one
    shuffle origin AQE never rewrites on byte estimates; key-only
    salting measured at the unsalted wall clock in BASELINE.md's
    mega-cell probe), still an equi-join, never a cartesian. Defaults
    stay salt-free, and salt_buckets=0 fails BEFORE any pin on every
    entry point (the banding-validation precedent)."""
    import contextlib
    import io

    from git_log_to_sqlite_spark.operators import (
        fuzzy_decontaminate,
        hamming_pairs,
        hamming_probe,
        incremental_minhash_dedup,
        simhash_pairs,
    )
    from git_log_to_sqlite_spark.operators.caching import _LIVE, release_caches
    from git_log_to_sqlite_spark.operators.dedup import _band_self_pairs

    bands = spark.createDataFrame(
        [(i, 0, "k") for i in range(6)],
        "doc_id long, band int, band_key string",
    )

    def plan_of(df_):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df_.explain("formatted")
        return buf.getvalue()

    salted = plan_of(_band_self_pairs(bands, "doc_id", salt_buckets=4))
    assert salted.count("REPARTITION_BY_NUM") == 2, salted
    assert "CartesianProduct" not in salted
    assert "BroadcastNestedLoopJoin" not in salted
    # default plan carries no salting machinery at all
    assert "REPARTITION_BY_NUM" not in plan_of(_band_self_pairs(bands, "doc_id"))

    # targeted mode: the hot-set derivation + marking joins must keep
    # the pinned co-partitioning and never go cartesian either
    targeted = plan_of(
        _band_self_pairs(bands, "doc_id", salt_buckets=4, salt_min_bucket=3)
    )
    assert targeted.count("REPARTITION_BY_NUM") == 2, targeted
    assert "CartesianProduct" not in targeted
    release_caches()  # the targeted hot set pins

    # the probe-shaped stage carries the identical pins (same shared
    # helper, but its own entry path — both sides renamed, corpus side
    # salted): uniform and targeted both co-partition at a fixed
    # count, default is pin-free
    from git_log_to_sqlite_spark.operators.dedup import _band_probe_pairs

    bands_p = spark.createDataFrame(
        [(100 + i, 0, "k") for i in range(2)],
        "pid long, band int, band_key string",
    )
    for kw in ({"salt_buckets": 4}, {"salt_buckets": 4, "salt_min_bucket": 3}):
        probe_plan = plan_of(
            _band_probe_pairs(bands_p, bands, ["pid"], ["doc_id"], **kw)
        )
        assert probe_plan.count("REPARTITION_BY_NUM") == 2, (kw, probe_plan)
        assert "CartesianProduct" not in probe_plan, kw
        assert "BroadcastNestedLoopJoin" not in probe_plan, kw
    release_caches()  # the targeted hot set pins
    assert "REPARTITION_BY_NUM" not in plan_of(
        _band_probe_pairs(bands_p, bands, ["pid"], ["doc_id"])
    )

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    sig = spark.createDataFrame([(1, 7)], "doc_id long, sig long")
    for call in (
        lambda: _band_self_pairs(bands, "doc_id", salt_buckets=0),
        lambda: minhash_lsh_pairs(docs, "doc_id", "text", salt_buckets=0),
        lambda: simhash_pairs(docs, "doc_id", "text", salt_buckets=0),
        lambda: hamming_pairs(sig, "doc_id", "sig", bits=32, salt_buckets=0),
        # salt_min_bucket without a salt, and a degenerate threshold,
        # both fail before any pin too
        lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", salt_min_bucket=10
        ),
        lambda: simhash_pairs(
            docs, "doc_id", "text", salt_buckets=4, salt_min_bucket=1
        ),
        lambda: hamming_pairs(
            sig, "doc_id", "sig", bits=32, salt_min_bucket=10
        ),
        # the probe-shaped entry points share the rule
        lambda: fuzzy_decontaminate(
            docs, docs, "doc_id", "text", salt_buckets=0
        ),
        lambda: incremental_minhash_dedup(
            docs, docs.limit(1), "doc_id", "text", salt_min_bucket=10
        ),
        lambda: hamming_probe(
            sig.withColumnRenamed("doc_id", "pid"), sig,
            probe_id="pid", corpus_id="doc_id", sig_col="sig",
            bits=32, salt_buckets=4, salt_min_bucket=1,
        ),
    ):
        with pytest.raises(ValueError, match="salt_"):
            call()
        assert _LIVE == []


def test_band_probe_join_salted_row_identical(spark, oracle_sf_dir):
    """Probe-shaped salting (:func:`_band_probe_pairs` behind
    hamming_probe / fuzzy_decontaminate / incremental_minhash_dedup):
    the CORPUS side salts, the small PROBE side replicates — the
    asymmetry that keeps the replication price on the side that can
    afford it. Row-identical output in uniform, targeted, and
    runtime-empty-hot-set modes. fuzzy_decontaminate is the headline:
    its no-cap recall contract previously left it with NO skew arm at
    all (any valve cap is a silent false negative), and salting is
    the arm that preserves the pigeonhole guarantee."""
    from git_log_to_sqlite_spark.operators import (
        fuzzy_decontaminate,
        incremental_minhash_dedup,
    )

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    viral_text = "viral boilerplate shard every copy identical " * 3
    viral = spark.createDataFrame(
        [(100000 + i, viral_text) for i in range(12)],
        "doc_id long, text string",
    )
    train = docs.select("doc_id", "text").unionByName(viral)
    bench = spark.createDataFrame(
        [(1, viral_text), (2, "unrelated held-out evaluation question")],
        "doc_id long, text string",
    )

    def norm(out):
        return sorted(map(tuple, out.collect()))

    plain = norm(fuzzy_decontaminate(train, bench, "doc_id", "text"))
    # non-vacuous: every viral train member is flagged (hamming 0 to
    # the identical eval doc)
    flagged = {t[0] for t in plain if t[3] == 1}
    assert {100000 + i for i in range(12)} <= flagged
    for kw in (
        {"salt_buckets": 4},
        {"salt_buckets": 8, "salt_min_bucket": 10},
        {"salt_buckets": 8, "salt_min_bucket": 10**6},
    ):
        assert (
            norm(fuzzy_decontaminate(train, bench, "doc_id", "text", **kw))
            == plain
        ), kw

    inc = spark.createDataFrame(
        [(555555, viral_text), (555556, "a brand new never seen document")],
        "doc_id long, text string",
    )
    plain_inc = norm(incremental_minhash_dedup(train, inc, "doc_id", "text"))
    by_id = {t[0]: t for t in plain_inc}
    assert by_id[555555][1] == 100000 or by_id[555555][1] in set(
        r.doc_id for r in docs.select("doc_id").collect()
    )  # matched SOME history doc (min-id pick); definitely not new
    assert by_id[555555][3] == 0
    for kw in (
        {"salt_buckets": 4},
        {"salt_buckets": 8, "salt_min_bucket": 10},
        {"salt_buckets": 8, "salt_min_bucket": 10**6},
    ):
        assert (
            norm(
                incremental_minhash_dedup(
                    train, inc, "doc_id", "text", **kw
                )
            )
            == plain_inc
        ), kw


def test_minhash_band_cap_validation(spark):
    """The two cap spellings are mutually exclusive, and telemetry
    without a cap raises eagerly instead of blocking in
    Observation.get far from the cause."""
    from pyspark.sql import Observation

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mutually exclusive"):
        minhash_lsh_pairs(
            docs, "doc_id", "text", max_band_size=5, band_size_quantile=0.9
        )
    with pytest.raises(ValueError, match="observation requires a cap"):
        minhash_lsh_pairs(
            docs, "doc_id", "text", observation=Observation("x")
        )


def test_minhash_valve_no_hot_buckets_reports_zero(spark):
    """Valve telemetry when the valve does NOT fire must report 0/0,
    not fail: pre-fix, AQE's empty-relation propagation pruned the
    runtime-empty anti-join build side together with its observe node,
    so Observation.get raised from a metrics row that never
    materialized — in BOTH no-fire shapes. Case 1: no repeated band
    buckets at all (token sets fully disjoint across docs, so no two
    signatures can share a band key — the d>=2 histogram is empty and
    the observed sums were additionally SQL NULL). Case 2: repeated
    buckets exist but none lands over the cap."""
    from pyspark.sql import Observation

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(8))) for i in range(1, 7)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation("novalve")
    got = minhash_lsh_pairs(
        docs, "doc_id", "text", band_size_quantile=0.92, observation=obs
    ).collect()
    assert got == []
    assert obs.get == {"bands_dropped": 0, "pairs_avoided": 0}

    # case 2: one repeated bucket (the identical pair), cap far above it
    rows2 = rows + [(100, "same text twins here today"), (101, "same text twins here today")]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    obs2 = Observation("undercap")
    got2 = minhash_lsh_pairs(
        docs2, "doc_id", "text", max_band_size=50, observation=obs2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got2} == {(100, 101)}
    assert obs2.get == {"bands_dropped": 0, "pairs_avoided": 0}


def test_valve_telemetry_no_fire_all_operators(spark):
    """Every valve-bearing operator must report 0-metrics (never raise,
    never None) when nothing lands over the cap — jaccard's inline
    valve, simhash's band valve, and the incremental probe valve all
    share the AQE empty-build-side pruning hazard."""
    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators import (
        incremental_minhash_dedup,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(8))) for i in range(1, 7)]
    rows += [(100, "same text twins here today"), (101, "same text twins here today")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    obs_j = Observation()
    got = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, max_df=50, observation=obs_j
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}
    assert obs_j.get == {"shingles_dropped": 0, "pairs_avoided": 0}

    obs_s = Observation()
    got = simhash_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_hamming=3,
        max_band_size=50, observation=obs_s,
    ).collect()
    assert (100, 101) in {(r["id_a"], r["id_b"]) for r in got}
    assert obs_s.get == {"bands_dropped": 0, "pairs_avoided": 0}

    obs_i = Observation()
    history = docs.filter(F.col("doc_id") < 100)
    increment = docs.filter(F.col("doc_id") >= 100)
    res = incremental_minhash_dedup(
        history, increment, "doc_id", "text",
        band_size_quantile=0.92, observation=obs_i,
    ).collect()
    assert len(res) == 2
    assert obs_i.get == {"bands_dropped": 0, "rows_dropped": 0}


def test_minhash_valve_telemetry_when_firing(spark):
    """The firing case through the self-join shape: a degenerate key
    (many identical docs) must be dropped AND reported — pre-fix the
    duplicated CollectMetrics node (one observed frame on both sides
    of the band self-join) meant Observation.get raised even when the
    valve fired."""
    from pyspark.sql import Observation

    # bulk: 13 twin pairs (d=2 band buckets) anchoring p92 at 2;
    # degenerate: one 40-doc identical-text key landing at d=40 >> 10x2
    rows = [
        (10 * p + s, " ".join(f"p{p}w{j}" for j in range(8)))
        for p in range(13)
        for s in (0, 1)
    ]
    rows += [(1000 + i, "degenerate boilerplate template page") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation()
    got = minhash_lsh_pairs(
        docs, "doc_id", "text", band_size_quantile=0.92, observation=obs
    ).collect()
    m = obs.get
    assert m["bands_dropped"] >= 1
    assert m["pairs_avoided"] >= 40 * 39 // 2
    # the degenerate clique's pairs are gone from the output
    assert not any(r["id_a"] >= 1000 for r in got)


def test_simhash_pairs_pigeonhole_exact(spark, oracle_sf_dir):
    """With bands > max_hamming the banding stage is EXACT by
    pigeonhole: the pair set must equal a driver-side brute-force
    Hamming scan over the signatures — on the real corpus."""
    from git_log_to_sqlite_spark.operators import simhash, simhash_pairs

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    ids = sorted(sigs)
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            docs, "doc_id", "text", bands=4, max_hamming=3
        ).collect()
    }
    assert got == want and len(want) > 0


def test_simhash_pairs_validation(spark):
    from git_log_to_sqlite_spark.operators import simhash, simhash_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, "doc_id", "text", bands=3, max_hamming=3)
    with pytest.raises(ValueError, match="divide evenly"):
        simhash_pairs(docs, "doc_id", "text", bits=32, bands=5, max_hamming=2)
    # > 60 bits would silently band on constant-zero slices (the md5
    # token hash is at most 60 bits) — rejected up front
    with pytest.raises(ValueError, match=r"\[1, 60\]"):
        simhash(docs, "doc_id", "text", bits=64)
    with pytest.raises(ValueError, match=r"\[1, 60\]"):
        simhash_pairs(docs, "doc_id", "text", bits=64, bands=4, max_hamming=3)


def test_simhash_pairs_wide_signatures(spark, oracle_sf_dir):
    """The corpus-scale configuration (bits=60, bands=4 -> 15-bit
    slices, ~32k band keys instead of 256): pigeonhole exactness must
    hold against a brute-force Hamming scan of the 60-bit signatures,
    and all signatures actually use the high bits (no constant-zero
    slice degeneracy)."""
    from git_log_to_sqlite_spark.operators import simhash, simhash_pairs

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "doc_id", "text", bits=60).collect()
    }
    assert any(s >> 32 for s in sigs.values()), "high bits never set"
    ids = sorted(sigs)
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            docs, "doc_id", "text", bits=60, bands=4, max_hamming=3
        ).collect()
    }
    assert got == want


def test_spread_skips_shuffle_shaped_plans(spark, oracle_sf_dir):
    """_spread must pass a plan containing exchanges through UNTOUCHED
    (probing it with .rdd would execute the upstream shuffles under
    AQE, and post-shuffle frames are already shuffle.partitions wide),
    while a bare narrow scan still gets the widening repartition."""
    from git_log_to_sqlite_spark.operators.dedup import _spread

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    agged = docs.groupBy("source").agg(F.count("*").alias("n"))
    assert _spread(agged) is agged
    rep = docs.repartition(2)  # explicit repartition states caller intent
    assert _spread(rep) is rep
    # a single-file scan is narrow -> widened
    out = _spread(docs)
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    )


def test_spread_ignores_marker_words_in_column_names(spark, tmp_path):
    """Marker detection must key on plan NODE names, not substrings of
    the whole plan string: a user column named SortKey / JoinDate (or
    a file path containing a marker word) previously false-positived
    the shuffle probe and silently skipped the widening in exactly the
    single-partition case the guard exists for."""
    from git_log_to_sqlite_spark.operators.dedup import _spread

    p = str(tmp_path / "SortedJoinInput")  # path also carries markers
    spark.createDataFrame(
        [(1, "x", "2024-01-01")], "SortKey long, text string, JoinDate string"
    ).coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    assert scan.rdd.getNumPartitions() == 1
    widened = _spread(scan)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert widened.rdd.getNumPartitions() > 1


def test_substring_spans_planted_passages(spark):
    """Hand-computed exact-substring cases: a clean 10-token shared
    passage, a passage split by an interruption (two islands, longest
    = the longer island), and a no-overlap doc that must not pair."""
    from git_log_to_sqlite_spark.operators import substring_span_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG TODAY zeta eta"),
            (2, "one two THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG TODAY three four five six"),
            (3, "completely different text with no shared passage at all here now"),
            (4, "one two THE QUICK BROWN FOX then interrupted JUMPS OVER THE LAZY DOG TODAY"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["longest_run_tokens"], r["n_shared_windows"])
        for r in substring_span_pairs(
            docs, "doc_id", "text", window=4, min_run_tokens=6
        ).collect()
    )
    # 1-2: the 10-token passage = 7 four-token windows, one island.
    # 1-4: runs "THE QUICK BROWN FOX" (4 tokens, 1 window — below
    #      min_run on its own) and "JUMPS OVER THE LAZY DOG TODAY"
    #      (6 tokens, 3 windows): longest 6, cells 1+3=4.
    # 2-4: "one two THE QUICK BROWN FOX" (6 tokens, 3 windows) and the
    #      6-token JUMPS run (3 windows): longest 6, cells 6.
    assert got == [(1, 2, 10, 7), (1, 4, 6, 4), (2, 4, 6, 6)]


def test_substring_spans_match_bruteforce(spark):
    """Property check on a seeded random corpus with planted shared
    passages: (pair set, longest run, match-cell count) must equal a
    brute-force token-level DP over every pair."""
    import random

    from git_log_to_sqlite_spark.operators import substring_span_pairs

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]  # small vocab -> chance runs too
    passages = [
        [rng.choice(vocab) for _ in range(rng.randint(6, 14))] for _ in range(4)
    ]
    texts = {}
    for d in range(1, 13):
        toks = [rng.choice(vocab) for _ in range(rng.randint(8, 25))]
        if d % 3 != 0:  # plant a passage in 2/3 of docs
            p = passages[d % len(passages)]
            at = rng.randint(0, len(toks))
            toks = toks[:at] + p + toks[at:]
        texts[d] = toks
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()], "doc_id long, text string"
    )
    K, MIN_RUN = 3, 5
    got = {
        (r["id_a"], r["id_b"]): (r["longest_run_tokens"], r["n_shared_windows"])
        for r in substring_span_pairs(
            docs, "doc_id", "text", window=K, min_run_tokens=MIN_RUN
        ).collect()
    }

    def brute(a, b):
        best, cells = 0, 0
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    dp[i][j] = dp[i - 1][j - 1] + 1
                    best = max(best, dp[i][j])
        for i in range(len(a) - K + 1):
            for j in range(len(b) - K + 1):
                if a[i:i + K] == b[j:j + K]:
                    cells += 1
        return best, cells

    want = {}
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            best, cells = brute(texts[ids[x]], texts[ids[y]])
            if best >= MIN_RUN:
                want[(ids[x], ids[y])] = (best, cells)
    assert got == want and len(want) > 0


def test_substring_spans_cap_lower_bounds(spark):
    """The df cap drops boilerplate windows and SPLITS runs containing
    them — reported runs are lower bounds, never inventions. With the
    shared hot window dropped (it appears in every doc), the two
    12-token twin passages split into two sub-runs around it."""
    from git_log_to_sqlite_spark.operators import substring_span_pairs

    hot = "BOILER PLATE HOT WINDOW"  # 4 tokens, one k=4 window when aligned
    rows = [
        (i, f"u{i}a u{i}b {hot} u{i}c u{i}d") for i in range(1, 9)
    ]  # 8 docs all containing the hot window -> df 8 > cap 4
    rows += [
        (100, f"p1 p2 p3 p4 {hot} q1 q2 q3 q4"),
        (101, f"p1 p2 p3 p4 {hot} q1 q2 q3 q4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"]): r["longest_run_tokens"]
        for r in substring_span_pairs(
            docs, "doc_id", "text", window=4, min_run_tokens=4
        ).collect()
    }
    assert uncapped[(100, 101)] == 12  # the full twin text
    capped = {
        (r["id_a"], r["id_b"]): r["longest_run_tokens"]
        for r in substring_span_pairs(
            docs, "doc_id", "text", window=4, min_run_tokens=4, max_df=4
        ).collect()
    }
    # every window containing a hot token pair... the exact windows
    # crossing the boilerplate are rarer (doc-specific neighbours), so
    # only the one fully-boilerplate window exceeds df=4 (10 docs
    # carry it). Dropping it splits the twins' 12-token run into two
    # shorter aligned runs; the reported longest is the larger
    # fragment — strictly less than 12, still >= min_run.
    assert (100, 101) in capped
    assert 4 <= capped[(100, 101)] < 12
    # capped output never invents pairs
    assert set(capped) <= set(uncapped)


def test_substring_spans_telemetry(spark):
    """The substring valve joins the shared eager-telemetry contract:
    windows_dropped / pairs_avoided readable immediately, zeros (not
    None / not a raise) when nothing lands over the cap, real counts
    when a degenerate window fires it."""
    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators import substring_span_pairs

    rows = [
        (100, "p1 p2 p3 p4 p5 p6 p7 p8"),
        (101, "p1 p2 p3 p4 p5 p6 p7 p8"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation()
    got = substring_span_pairs(
        docs, "doc_id", "text", window=4, min_run_tokens=4,
        max_df=50, observation=obs,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}
    assert obs.get == {"windows_dropped": 0, "pairs_avoided": 0}

    # degenerate window shared by 30 docs, cap 10 -> fires
    rows2 = rows + [(i, f"u{i}a HOT WIN DOW TEXT u{i}b") for i in range(30)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    obs2 = Observation()
    substring_span_pairs(
        docs2, "doc_id", "text", window=4, min_run_tokens=4,
        max_df=10, observation=obs2,
    ).collect()
    m = obs2.get
    assert m["windows_dropped"] >= 1 and m["pairs_avoided"] >= 30 * 29 // 2
    with pytest.raises(ValueError, match="observation requires a cap"):
        substring_span_pairs(
            docs, "doc_id", "text", window=4, min_run_tokens=4,
            observation=Observation(),
        )


def test_banding_validation_precedes_pins(spark):
    """Invalid banding arguments must fail BEFORE any pin() side
    effect — pre-fix, simhash_pairs pinned the signature frame and
    then raised, leaking a never-materialized registry entry until
    release_caches()."""
    from git_log_to_sqlite_spark.operators import simhash_pairs
    from git_log_to_sqlite_spark.operators.caching import _LIVE, release_caches
    from git_log_to_sqlite_spark.operators.multimodal import image_near_dup_pairs

    release_caches()
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide evenly"):
        simhash_pairs(docs, "doc_id", "text", bits=32, bands=5)
    assert _LIVE == []
    media = spark.createDataFrame(
        [(1, b"xyz", "image/raw", 3)],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        image_near_dup_pairs(media, max_hamming=5, bands=4)
    assert _LIVE == []
    # observation-without-cap must ALSO fail pre-pin: pre-fix this
    # check lived only in _capped_bands, which runs after the
    # signature pin in every Hamming entry point (ADVICE r9).
    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators.multimodal import audio_near_dup_pairs

    for call in (
        lambda: simhash_pairs(docs, "doc_id", "text", observation=Observation()),
        lambda: image_near_dup_pairs(media, observation=Observation()),
        lambda: audio_near_dup_pairs(media, observation=Observation()),
    ):
        with pytest.raises(ValueError, match="observation requires a cap"):
            call()
        assert _LIVE == []
    # both caps at once is the other _capped_bands-only check hoisted
    with pytest.raises(ValueError, match="mutually exclusive"):
        simhash_pairs(
            docs, "doc_id", "text", max_band_size=2, band_size_quantile=0.9
        )
    assert _LIVE == []
    # the cross-modal probe validates frame_bytes before its pins too
    from git_log_to_sqlite_spark.operators import image_in_video_frames

    with pytest.raises(ValueError, match="frame_bytes"):
        image_in_video_frames(media, media, frame_bytes=0)
    assert _LIVE == []
    # the minhash entry points pin signatures too (the review-pass
    # gap: the Hamming fix alone left these leaking)
    from git_log_to_sqlite_spark.operators import (
        incremental_minhash_dedup,
        minhash_lsh_pairs,
    )

    for call in (
        lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", max_band_size=2, band_size_quantile=0.9
        ),
        lambda: minhash_lsh_pairs(docs, "doc_id", "text", observation=Observation()),
        lambda: incremental_minhash_dedup(
            docs, docs.limit(1), "doc_id", "text",
            max_band_size=2, band_size_quantile=0.9,
        ),
        lambda: incremental_minhash_dedup(
            docs, docs.limit(1), "doc_id", "text", observation=Observation()
        ),
    ):
        with pytest.raises(ValueError, match="mutually exclusive|requires a cap"):
            call()
        assert _LIVE == []


def test_signature_store_exists_distinguishes_missing_from_broken(spark, tmp_path):
    """exists() maps ONLY a missing path to False; any other failure
    (here: an existing directory that is not a parquet table, standing
    in for transient IO) propagates — returning False would make
    ingest()'s guard advise a destructive re-bootstrap of a live
    store."""
    from git_log_to_sqlite_spark.operators import SignatureStore

    missing = SignatureStore(spark, str(tmp_path / "nope"))
    assert not missing.exists()
    broken_dir = tmp_path / "broken"
    broken_dir.mkdir()
    broken = SignatureStore(spark, str(broken_dir))
    with pytest.raises(Exception, match="(?i)unable_to_infer|schema"):
        broken.exists()


def test_incremental_substring_matches_batch_cross_split(spark, oracle_sf_dir):
    """The incremental operator's contract: on the real corpus its
    (inc, hist) pair set with runs and cell counts must equal the
    BATCH operator's pair set restricted to cross-split pairs (both
    uncapped — the batch cap derives from the whole corpus, the
    incremental cap from history only, so equality is the uncapped
    invariant). Increment-internal pairs are deliberately absent."""
    from git_log_to_sqlite_spark.operators import (
        incremental_substring_spans,
        substring_span_pairs,
    )

    d = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    history = d.filter(F.col("doc_id") % 5 != 0)
    increment = d.filter(F.col("doc_id") % 5 == 0)
    batch = {
        (r["id_a"], r["id_b"]): (r["longest_run_tokens"], r["n_shared_windows"])
        for r in substring_span_pairs(
            d, "doc_id", "text", window=6, min_run_tokens=12
        ).collect()
    }
    want = {}
    for (a, b), v in batch.items():
        a_inc, b_inc = a % 5 == 0, b % 5 == 0
        if a_inc != b_inc:  # exactly one endpoint in the increment
            want[(a, b) if a_inc else (b, a)] = v
    got = {
        (r["inc_id"], r["hist_id"]): (
            r["longest_run_tokens"], r["n_shared_windows"]
        )
        for r in incremental_substring_spans(
            history, increment, "doc_id", "text", window=6, min_run_tokens=12
        ).collect()
    }
    assert got == want and len(want) > 0


def test_incremental_substring_persisted_window_table(spark, oracle_sf_dir, tmp_path):
    """The production path: history's window_table persisted as
    parquet and passed via history_windows must reproduce the
    derived-from-text result exactly — history text never
    re-tokenized. Also pins the validation errors."""
    from git_log_to_sqlite_spark.operators import (
        incremental_substring_spans,
        window_table,
    )

    d = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    history = d.filter(F.col("doc_id") % 5 != 0)
    increment = d.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "hist_windows")
    window_table(history, "doc_id", "text", 6).write.parquet(path)
    stored = spark.read.parquet(path)
    from_text = {
        tuple(r)
        for r in incremental_substring_spans(
            history, increment, "doc_id", "text",
            window=6, min_run_tokens=12, max_df_quantile=0.92,
        ).collect()
    }
    from_store = {
        tuple(r)
        for r in incremental_substring_spans(
            None, increment, "doc_id", "text",
            window=6, min_run_tokens=12, max_df_quantile=0.92,
            history_windows=stored,
        ).collect()
    }
    assert from_store == from_text and len(from_text) > 0

    with pytest.raises(ValueError, match="exactly one of"):
        incremental_substring_spans(
            history, increment, "doc_id", "text", history_windows=stored
        )
    with pytest.raises(ValueError, match="missing columns"):
        incremental_substring_spans(
            None, increment, "doc_id", "text",
            history_windows=stored.drop("pos"),
        )


def test_incremental_substring_salted_row_identical(
    spark, oracle_sf_dir, tmp_path
):
    """salt_buckets on the substring probe join (history windows
    salted per (id, pos) row, increment replicated — the last
    probe-shaped join to gain the arm): row-identical spans in
    uniform, targeted, and runtime-empty-hot-set modes on a history
    carrying a planted hot boilerplate passage; WindowStore threads
    the knobs; bad salt args fail before any pin."""
    from git_log_to_sqlite_spark.operators import (
        WindowStore,
        incremental_substring_spans,
    )
    from git_log_to_sqlite_spark.operators.caching import (
        _LIVE,
        release_caches,
    )

    d = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    boiler = (
        "shared legal boilerplate passage repeated verbatim in every "
        "single copy here"
    )
    hot = spark.createDataFrame(
        [
            (100000 + i, f"doc {i} unique prefix {boiler} unique suffix {i}")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    history = d.filter(F.col("doc_id") % 5 != 0).unionByName(hot)
    increment = spark.createDataFrame(
        [
            (900000, f"probe document carrying {boiler} and nothing else"),
            (900001, "a fully novel document with no shared runs at all"),
        ],
        "doc_id long, text string",
    )

    def norm(**kw):
        return sorted(
            tuple(r)
            for r in incremental_substring_spans(
                history, increment, "doc_id", "text",
                window=6, min_run_tokens=6, **kw,
            ).collect()
        )

    plain = norm()
    hits = {t[1] for t in plain if t[0] == 900000}
    assert {100000 + i for i in range(12)} <= hits  # non-vacuous
    assert norm(salt_buckets=4) == plain
    assert norm(salt_buckets=8, salt_min_bucket=10) == plain
    assert norm(salt_buckets=8, salt_min_bucket=10**6) == plain

    def run_store(path, **kw):
        st = WindowStore(
            spark, str(tmp_path / path), id_col="doc_id", window=6
        )
        st.bootstrap(history, "text")
        ann = sorted(map(tuple, st.ingest(
            increment, "text", min_run_tokens=6, **kw
        ).collect()))
        return ann, st.read().count()

    splain = run_store("w_plain")
    assert run_store("w_t", salt_buckets=4, salt_min_bucket=10) == splain

    release_caches()  # the direct targeted calls' hot-set pins
    stb = WindowStore(spark, str(tmp_path / "w_plain"), id_col="doc_id",
                      window=6)
    for call in (
        lambda: incremental_substring_spans(
            history, increment, "doc_id", "text", salt_buckets=0
        ),
        lambda: stb.ingest(increment, "text", salt_min_bucket=10),
    ):
        with pytest.raises(ValueError, match="salt_"):
            call()
        assert _LIVE == []


def test_incremental_substring_history_valve(spark):
    """Degenerate HISTORY boilerplate (one window in 2,000 history
    docs) must be anti-filtered before the probe join: each of the 10
    increment docs carrying it would otherwise match all 2,000.
    Telemetry reports the probe shape (rows_dropped = occurrences),
    and a planted increment-history twin passage still surfaces."""
    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators import incremental_substring_spans

    n = 2000
    hist_rows = [(i, f"u{i}a u{i}b COMMON BOILER PLATE STUB u{i}c") for i in range(n)]
    # 20 planted twin PAIRS inside history (d=2 windows) anchor the
    # history p92 at 2 -> cap 20 << the d=2000 boilerplate window
    hist_rows += [
        (50_000 + 2 * p + s, " ".join(f"p{p}w{j}" for j in range(8)))
        for p in range(20)
        for s in (0, 1)
    ]
    inc_rows = [(100_000 + i, f"v{i}x COMMON BOILER PLATE STUB v{i}y") for i in range(10)]
    inc_rows += [(100_500 + p, " ".join(f"p{p}w{j}" for j in range(8))) for p in range(20)]
    history = spark.createDataFrame(hist_rows, "doc_id long, text string")
    increment = spark.createDataFrame(inc_rows, "doc_id long, text string")
    obs = Observation()
    got = {
        (r["inc_id"], r["hist_id"]): r["longest_run_tokens"]
        for r in incremental_substring_spans(
            history, increment, "doc_id", "text", window=4, min_run_tokens=4,
            max_df_quantile=0.92, observation=obs,
        ).collect()
    }
    assert got == {
        (100_500 + p, 50_000 + 2 * p + s): 8
        for p in range(20)
        for s in (0, 1)
    }
    m = obs.get
    assert m["windows_dropped"] == 1 and m["rows_dropped"] == n


def test_substring_spans_validation(spark):
    from git_log_to_sqlite_spark.operators import substring_span_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window must be >= 2"):
        substring_span_pairs(docs, "doc_id", "text", window=1)
    with pytest.raises(ValueError, match="min_run_tokens"):
        substring_span_pairs(docs, "doc_id", "text", window=8, min_run_tokens=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        substring_span_pairs(
            docs, "doc_id", "text", max_df=5, max_df_quantile=0.9
        )
    # short docs yield no windows, no crash
    assert (
        substring_span_pairs(docs, "doc_id", "text", window=8, min_run_tokens=8)
        .count()
        == 0
    )


def test_simhash_similar_docs_close(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])  # near-dup closer


def test_simhash_matches_pure_python_reference(spark):
    """The round-17 signature shape (narrow two-aggregate form with
    the redundant token-stream DISTINCT removed — the suite-context
    A/B winner over both the round-16 form and a one-pass 60-buffer
    variant) must compute bit-for-bit the declared md5-majority
    signature — an INDEPENDENT reference, not a retired Spark form, so
    a future reshaping cannot drift both sides together. Covers both
    token-hash widths (32-bit frozen oracle form and the 60-bit
    banding form)."""
    import hashlib

    texts = {
        1: "alpha beta gamma alpha",        # in-doc repeat (dedup'd)
        2: "alpha beta gamma",              # same token SET as doc 1
        3: "delta epsilon zeta eta theta",
        4: "",                              # empty text -> [""] token
    }

    def ref(text: str, bits: int) -> int:
        hex_chars = 8 if bits <= 32 else 15
        tokens = sorted(set(text.split(" ")))
        weights = [0] * bits
        for t in tokens:
            h = int(hashlib.md5(t.encode()).hexdigest()[:hex_chars], 16)
            for i in range(bits):
                weights[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(bits) if weights[i] > 0)

    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    for bits in (32, 60):
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash(df, "doc_id", "text", bits=bits).collect()
        }
        want = {k: ref(v, bits) for k, v in texts.items()}
        assert got == want, (bits, got, want)
    # shape pin: the round-16 form ran a DISTINCT over the exploded
    # (id, token) stream — the one corpus-sized exchange here, and
    # semantically redundant (array_distinct dedups within the doc,
    # ids separate docs). The final form keeps the two narrow
    # aggregate pairs ((id, i) partials then the signature fold; 4
    # HashAggregate nodes) but must never regrow the distinct's third
    # pair or its exchange.
    plan = simhash(df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("HashAggregate") == 4
    assert plan.count("Exchange") <= 2


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """Planted clusters (the driver's embeddings table is near-random —
    top-10 cosine ~0.3, labels carry no similarity signal — so recall
    must be tested on data where neighbors exist by construction)."""
    import hashlib
    import math

    def unit(seed: str, dims: int = 16) -> list[float]:
        vals = []
        for d in range(dims):
            h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
            vals.append((int(h[:8], 16) / 0xFFFFFFFF) * 2 - 1)
        norm = math.sqrt(sum(v * v for v in vals))
        return [v / norm for v in vals]

    rows, vid = [], 0
    for c in range(4):
        center = unit(f"center{c}")
        for i in range(25):
            jitter = unit(f"jit{c}:{i}")
            vec = [cv + 0.15 * jv for cv, jv in zip(center, jitter)]
            rows.append((vid, vec, c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )


def test_ann_recall_on_clustered_data(clustered_vectors):
    e = clustered_vectors
    q = e.filter(F.col("vec_id") < 12)
    exact = brute_force_topk(q, e, "vec_id", "embedding", k=5)
    approx = bucketed_ann_topk(q, e, "vec_id", "embedding", "cluster", k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall > 0.9, f"bucketed ANN recall too low on tight clusters: {recall:.2f}"


def test_ivf_ann_recall_on_clustered_data(clustered_vectors):
    """IVF with a FITTED k-means quantizer on planted tight clusters:
    single-probe recall must be near-exact (each cluster maps onto one
    Voronoi cell), and results must be deterministic across runs."""
    from git_log_to_sqlite_spark.operators import ivf_ann_topk, kmeans

    e = clustered_vectors
    # interleaved init ids: one lowest-k seed per planted cluster (the
    # same init-quality control test_kmeans_recovers_planted_clusters
    # documents — callers order ids to pick seeds)
    fit = e.withColumn("kid", (F.col("vec_id") % 25) * 4 + F.col("cluster"))
    _, centroids = kmeans(fit, "kid", "embedding", k=4, max_iter=10)
    q = e.filter(F.col("vec_id") < 12)
    exact = brute_force_topk(q, e, "vec_id", "embedding", k=5)
    ivf = ivf_ann_topk(q, e, "vec_id", "embedding", centroids, n_probe=1, k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    iv = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(ex & iv) / len(ex)
    assert recall > 0.9, f"IVF single-probe recall on tight clusters: {recall:.2f}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(
            q, e, "vec_id", "embedding", centroids, n_probe=1, k=5
        ).collect()
    }
    assert again == iv


def test_embedding_dedup_ann_matches_all_pairs(spark, clustered_vectors):
    """The ANN-fed dedup must reproduce the exact all-pairs min-id
    survivor set on planted near-dups: doubled vectors (cosine ~1 with
    their twin) are dropped, everything else survives — candidate
    generation through IVF cells may only change COST, not the result,
    on data where near-dups are genuinely close."""
    from git_log_to_sqlite_spark.operators import embedding_dedup_ann, kmeans

    base = clustered_vectors  # 100 well-separated vectors in 4 clusters
    twins = base.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
        "cluster",
    )
    corpus = base.unionByName(twins)
    fit = corpus.withColumn("kid", (F.col("vec_id") % 25) * 4 + F.col("cluster"))
    _, centroids = kmeans(fit, "kid", "embedding", k=4, max_iter=10)

    got = {
        r["vec_id"]
        for r in embedding_dedup_ann(
            corpus, "vec_id", "embedding", centroids, threshold=0.95, n_probe=2
        ).collect()
    }
    # exact all-pairs reference (driver-side: 134 vectors)
    import math

    rows = {r["vec_id"]: list(r["embedding"]) for r in corpus.collect()}

    def cos(u, v):
        du = math.sqrt(sum(x * x for x in u))
        dv = math.sqrt(sum(x * x for x in v))
        return sum(x * y for x, y in zip(u, v)) / (du * dv)

    want = {
        i
        for i in rows
        if not any(cos(rows[i], rows[j]) >= 0.95 for j in rows if j < i)
    }
    assert got == want
    # every planted twin has its base (smaller id, cosine ~1) -> dropped
    assert not {i for i in rows if i >= 1000} & got
    assert len(got) > 0


def test_ivf_index_persisted_probe(clustered_vectors, tmp_path):
    """The build-once/probe-many deployment: a persisted cell-
    partitioned index must reproduce the in-memory operator exactly,
    and the probe join must DYNAMICALLY PRUNE the partitioned scan
    (the broadcast query side's cell keys reach the file source as a
    dynamic pruning filter), so a batch probing m of k cells reads
    ~m/k of the index."""
    import contextlib
    import io

    from git_log_to_sqlite_spark.operators import IvfIndex, ivf_ann_topk, kmeans

    e = clustered_vectors
    fit = e.withColumn("kid", (F.col("vec_id") % 25) * 4 + F.col("cluster"))
    _, centroids = kmeans(fit, "kid", "embedding", k=4, max_iter=10)

    idx = IvfIndex(e.sparkSession, str(tmp_path / "ivf"))
    corpus_df = fit.select("kid", "embedding").withColumnRenamed("kid", "vec_id")
    # fit_sample_size=None pins the full-corpus distributed Lloyd's —
    # this test's contract is build == the in-memory kmeans fit
    idx.build(corpus_df, k=4, max_iter=10, fit_sample_size=None)
    assert idx.centroids() == centroids  # same deterministic fit

    q = fit.select(F.col("kid").alias("vec_id"), "embedding").filter(
        F.col("vec_id") < 12
    )
    corpus = fit.select(F.col("kid").alias("vec_id"), "embedding")
    mem = {
        tuple(r)
        for r in ivf_ann_topk(
            q, corpus, "vec_id", "embedding", centroids, n_probe=2, k=5
        ).collect()
    }
    probe = idx.probe(q, n_probe=2, k=5)
    assert {tuple(r) for r in probe.collect()} == mem and len(mem) > 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    # STATIC partition pruning (round 14): the probed cell set reaches
    # the scan as an IN partition filter. The previous dynamic-pruning
    # assertion held only because this test's probe side carries a
    # Filter — Spark's DPP insertion requires a selective predicate on
    # the build side, so a bare batch (LocalRelation / checkpoint /
    # plain table, the real deployment shape) got NO pruning and read
    # the full index (measured: 64/64 files at 8x replication).
    plan_text = buf.getvalue().lower()
    assert "partitionfilters" in plan_text and "cell" in plan_text
    assert " in (" in plan_text or " in(" in plan_text, (
        "probed cell set must reach the index scan as a static IN "
        "partition filter"
    )


def test_ivf_probe_prunes_unfiltered_batch(clustered_vectors, tmp_path):
    """The deployment-shape pruning guarantee: a probe batch with NO
    filter on it (a bare createDataFrame batch — the case Spark's
    dynamic partition pruning silently skips) must still read only the
    probed cells' files, measured on the scan's own metrics, and
    return exactly the in-memory operator's result."""
    from git_log_to_sqlite_spark.operators import IvfIndex, ivf_ann_topk, kmeans

    e = clustered_vectors
    fit = e.withColumn("kid", (F.col("vec_id") % 25) * 4 + F.col("cluster"))
    _, centroids = kmeans(fit, "kid", "embedding", k=4, max_iter=10)
    idx = IvfIndex(e.sparkSession, str(tmp_path / "ivf"))
    corpus_df = fit.select("kid", "embedding").withColumnRenamed("kid", "vec_id")
    idx.build(corpus_df, k=4, max_iter=10, fit_sample_size=None)

    # bare batch: one query vector, n_probe=1 → exactly one probed cell
    one = corpus_df.limit(1).collect()
    bare = e.sparkSession.createDataFrame(one, corpus_df.schema)
    res = idx.probe(bare, n_probe=1, k=5)
    got = {tuple(r) for r in res.collect()}
    mem = {
        tuple(r)
        for r in ivf_ann_topk(
            bare, corpus_df, "vec_id", "embedding", centroids,
            n_probe=1, k=5,
        ).collect()
    }
    assert got == mem and len(got) > 0

    # measured on the executed scan: only the probed cell's partition
    # was read (cells are near-balanced by construction, so one cell
    # is well under half the index)
    total_rows = corpus_df.count()
    scanned = _index_scan_rows(res)
    assert scanned < total_rows / 2, (
        f"unfiltered probe batch read {scanned} of {total_rows} index "
        "rows — partition pruning did not happen"
    )

    # and it must survive append (the daily-ingest growth path): new
    # files land inside the cell= partitions, so the same bare-batch
    # probe stays pruned — measured again, not inferred from layout
    grown = corpus_df.select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    idx.append(grown)
    res2 = idx.probe(bare, n_probe=1, k=5)
    res2.collect()
    total2 = 2 * total_rows
    scanned2 = _index_scan_rows(res2)
    assert 0 < scanned2 < total2 / 2, (
        f"post-append probe read {scanned2} of {total2} index rows"
    )


def test_semantic_store_history_probe_prunes_kept_scan(spark, tmp_path):
    """SemanticStore.ingest's history probe must read only the kept
    partitions of the batch's occupied cells (the _probed_store_side
    contract — static pruning, since DPP skips the pinned-batch join
    shape), measured on the executed scan, and ingest must still blame
    history duplicates correctly through the pruned scan."""
    import math

    from git_log_to_sqlite_spark.operators import SemanticStore
    from git_log_to_sqlite_spark.operators.similarity import _semantic_ranked

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    store = SemanticStore(spark, str(tmp_path / "s"), threshold=0.98)
    store.bootstrap(
        spark.createDataFrame(
            [(1, at(0)), (2, at(40)), (3, at(179)), (4, at(140))],
            "vec_id long, embedding array<double>",
        ),
        cents,
    )
    # bare one-cell batch (cell 0: x > 0)
    batch = spark.createDataFrame(
        [(10, at(5)), (11, at(12))], "vec_id long, embedding array<double>"
    )
    ranked = _semantic_ranked(
        batch, "vec_id", "embedding", store.centroids_df(), None, None,
        expect_dim=2, guard_context="test",
    )
    side = store._probed_store_side(ranked)
    rows = side.collect()
    kept_cell0 = {r["_hid"] for r in rows}
    assert all(r["cell"] == 0 for r in rows) and len(rows) > 0
    # measured: the scan itself read only cell 0's partition rows
    kept_total = store.read().count()
    scanned = _index_scan_rows(side)
    assert 0 < scanned < kept_total, (
        f"kept scan read {scanned} of {kept_total} rows — the history "
        "probe did not prune unprobed cell partitions"
    )
    assert scanned == len(rows)
    # end-to-end through ingest: cell-0 batch rows still blame the
    # cell-0 history row they duplicate
    res = {r["vec_id"]: r for r in store.ingest(batch).collect()}
    assert res[10]["dup_source"] == "history" and res[10]["dup_of"] in kept_cell0

    # pruning must survive the store lifecycle: compact() rewrites the
    # files and ingest appends — if either demoted or split the cell
    # layout, the probe would silently fall back to full scans (this
    # is measured, not layout-asserted: cell= dirs existing does not
    # prove the scan pruned)
    store.compact(num_files=2)
    side2 = store._probed_store_side(ranked)
    rows2 = side2.collect()
    total2 = store.read().count()
    scanned2 = _index_scan_rows(side2)
    assert 0 < scanned2 < total2 and scanned2 == len(rows2)


def _index_scan_rows(res) -> int:
    """numOutputRows of the largest executed FileSourceScanExec under
    ``res``'s plan (the index scan), walked through AQE wrappers."""
    rows = []

    def walk(node):
        nm = node.getClass().getSimpleName()
        if nm == "FileSourceScanExec":
            opt = node.metrics().get("numOutputRows")
            if not opt.isEmpty():
                rows.append(opt.get().value())
            return
        if nm == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if "QueryStageExec" in nm:
            walk(node.plan())
            return
        if nm == "ReusedExchangeExec":
            walk(node.child())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(res._jdf.queryExecution().executedPlan())
    return max(rows) if rows else 0


def test_kmeans_fit_sample_quality_and_determinism(clustered_vectors, tmp_path):
    """The bounded-sample quantizer fit (IvfIndex.build's default):
    deterministic across runs (md5-total sample order + argmin ties),
    recovers the planted clusters as cleanly as the full fit (every
    planted cluster lands in one Voronoi cell), and the index built
    with it reproduces the in-memory operator under ITS OWN centroids
    — the build == probe consistency the persisted deployment needs."""
    from git_log_to_sqlite_spark.operators import (
        IvfIndex,
        assign_clusters,
        ivf_ann_topk,
        kmeans_fit_sample,
    )

    e = clustered_vectors
    c1 = kmeans_fit_sample(e, "vec_id", "embedding", k=4, max_iter=10,
                           sample_size=64)
    c2 = kmeans_fit_sample(e, "vec_id", "embedding", k=4, max_iter=10,
                           sample_size=64)
    assert c1 == c2 and len(c1) == 4  # deterministic fit

    # quality: every planted cluster lands whole in one distinct cell
    # (clustered_vectors' "cluster" col is the planted label — renamed
    # so assign_clusters' output column can't shadow it)
    assigned2 = assign_clusters(
        e.select("vec_id", F.col("cluster").alias("planted"),
                 F.col("embedding").alias("_v")),
        "_v", c1,
    )
    cells = {}
    for r in assigned2.collect():
        cells.setdefault(r["planted"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in cells.values())  # one cell per cluster
    assert len({next(iter(v)) for v in cells.values()}) == 4  # distinct cells

    # sampled-fit index == in-memory operator under the same centroids
    idx = IvfIndex(e.sparkSession, str(tmp_path / "ivf_sample"))
    idx.build(e.select("vec_id", "embedding"), k=4, max_iter=10)  # default path
    got_c = idx.centroids()
    q = e.filter(F.col("vec_id") < 12).select("vec_id", "embedding")
    mem = {
        tuple(r)
        for r in ivf_ann_topk(
            q, e.select("vec_id", "embedding"), "vec_id", "embedding",
            got_c, n_probe=2, k=5,
        ).collect()
    }
    got = {tuple(r) for r in idx.probe(q, n_probe=2, k=5).collect()}
    assert got == mem and len(got) > 0

    with pytest.raises(ValueError, match="sample_size"):
        kmeans_fit_sample(e, "vec_id", "embedding", k=8, sample_size=4)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_fit_sample(
            e.filter(F.col("vec_id") < 2), "vec_id", "embedding", k=4
        )


def test_ivf_index_append_grows_without_refit(clustered_vectors, tmp_path):
    """The daily-ingest shape of the persisted index: append() assigns
    new vectors to the EXISTING cells and appends to the partitioned
    parquet — probing the grown index must equal probing an index
    whose build saw everything, because the quantizer (model state) is
    identical and assignment is deterministic. Also: appended mass is
    visible to cell_sizes(), and an un-built path fails fast instead
    of creating an empty-quantizer store (the SignatureStore ingest
    contract)."""
    from git_log_to_sqlite_spark.operators import IvfIndex, ivf_ann_topk

    e = clustered_vectors.select("vec_id", "embedding")
    first = e.filter(F.col("vec_id") % 2 == 0)
    second = e.filter(F.col("vec_id") % 2 == 1)

    idx = IvfIndex(e.sparkSession, str(tmp_path / "ivf_grow"))
    idx.build(first, k=4, max_iter=10, fit_sample_size=64)
    cents = idx.centroids()
    q = e.filter(F.col("vec_id") < 12)
    before = {tuple(r) for r in idx.probe(q, n_probe=2, k=5).collect()}
    idx.append(second)
    assert idx.centroids() == cents  # append never touches the quantizer

    # grown index == the in-memory operator over the FULL corpus under
    # the same quantizer (assignment is deterministic, so append(half)
    # is indistinguishable from having indexed everything at build)
    got = {tuple(r) for r in idx.probe(q, n_probe=2, k=5).collect()}
    want = {
        tuple(r)
        for r in ivf_ann_topk(
            q, e, "vec_id", "embedding", cents, n_probe=2, k=5
        ).collect()
    }
    assert got == want and len(got) > 0
    assert got != before  # the appended half participates

    # appended mass visible; totals add up
    sizes = {r["cell"]: r["n_vectors"] for r in idx.cell_sizes().collect()}
    assert sum(sizes.values()) == e.count()

    # un-built path fails fast
    empty = IvfIndex(e.sparkSession, str(tmp_path / "ivf_nope"))
    assert not empty.exists()
    with pytest.raises(ValueError, match="build\\(\\) first"):
        empty.append(second)


def _ref_semantic_dedup(rows, centroids, threshold):
    """Brute-force reference of SemDeDup's exact rule: nearest-centroid
    assignment (squared euclid, ties to the lower index), rank within
    cell by (centroid_sim ASC, id ASC), drop iff ANY earlier-ranked
    member is >= threshold cosine-similar, blaming the lowest-ranked
    such member."""
    import math

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    cells = {}
    for i, v in rows:
        d = min(
            (sum((x - c) ** 2 for x, c in zip(v, cen)), j)
            for j, cen in enumerate(centroids)
        )[1]
        cells.setdefault(d, []).append((i, v))
    out = {}
    for cell, members in cells.items():
        ranked = sorted(
            members, key=lambda iv: (cos(iv[1], centroids[cell]), iv[0])
        )
        for pos, (i, v) in enumerate(ranked):
            dup_of = None
            for j, w in ranked[:pos]:
                if cos(v, w) >= threshold:
                    dup_of = j
                    break
            out[i] = (cell, dup_of)
    return out


def test_semantic_dedup_matches_brute_force(clustered_vectors):
    """The distributed annotation equals the reference rule on the
    planted-cluster corpus, end to end: same cells, same drop set,
    same blame — and the operator is deterministic across runs."""
    from git_log_to_sqlite_spark.operators import kmeans_fit_sample, semantic_dedup

    e = clustered_vectors.select("vec_id", "embedding")
    cents = kmeans_fit_sample(e, "vec_id", "embedding", k=4, max_iter=10,
                              sample_size=64)
    rows = [(r["vec_id"], list(r["embedding"])) for r in e.collect()]
    want = _ref_semantic_dedup(rows, cents, threshold=0.9)

    got = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["is_kept"])
        for r in semantic_dedup(e, "vec_id", "embedding", cents,
                                threshold=0.9).collect()
    }
    assert len(got) == len(rows)  # annotate-don't-filter: every row survives
    for i, (cell, dup_of) in want.items():
        assert got[i] == (cell, dup_of, int(dup_of is None)), i
    assert any(v[1] is not None for v in got.values())  # corpus has sem-dups

    again = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["is_kept"])
        for r in semantic_dedup(e, "vec_id", "embedding", cents,
                                threshold=0.9).collect()
    }
    assert again == got

    # partitioning-invariant: rank is row_number over (csim, id) and
    # every similarity is a pure per-pair expression, so a different
    # physical layout must not move a single annotation
    shuffled = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["is_kept"])
        for r in semantic_dedup(e.repartition(7), "vec_id", "embedding",
                                cents, threshold=0.9).collect()
    }
    assert shuffled == got


def test_semantic_dedup_chain_and_cell_scope(spark):
    """The paper's exact semantics on a planted 2-D corpus: (a) the
    upper-triangular rule drops a WHOLE chain a~b~c even when a !~ c,
    each member blaming its lowest-RANKED earlier neighbor (c blames
    b, not a — no transitive closure to the root, and b being itself
    dropped does not exempt c); (b) keep order is farthest-from-
    centroid-first (a, the farthest, is the survivor); (c) pairs
    never cross cells — an exact copy of a in the OTHER cell is
    kept (the documented recall limit)."""
    import math

    from git_log_to_sqlite_spark.operators import semantic_dedup

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    rows = [
        (1, at(20)),                      # cell 0, rank 1 (farthest)
        (2, at(10)),                      # ~ id 1 (cos10 ~ .985)
        (3, at(0)),                       # ~ id 2, but NOT ~ id 1 (cos20 ~ .94)
        (4, [-v for v in at(20)]),        # cell 1: mirror of id 1, kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["is_kept"])
        for r in semantic_dedup(df, "vec_id", "embedding", cents,
                                threshold=0.98).collect()
    }
    assert got[1] == (0, None, 1)
    assert got[2] == (0, 1, 0)
    assert got[3] == (0, 2, 0)  # blames b (nearest earlier), not the root
    assert got[4] == (1, None, 1)  # cross-cell twin survives by design


def test_assign_clusters_table_equals_literal_form(clustered_vectors):
    """The large-k assignment (centroids as a broadcast one-row DATA
    array) must equal the literal-plan form EXACTLY — same distances,
    same (distance, cell) struct tie-break — in both the direct-fold
    and the rounded dot-identity modes; and it must add no shuffle:
    the corpus never moves (the only non-broadcast exchanges are the
    k-row centroid side's SinglePartition collapse into the one-row
    array — O(k), not O(corpus); no hash/range partitioning of the
    corpus appears)."""
    from git_log_to_sqlite_spark.operators import (
        assign_clusters,
        assign_clusters_table,
        kmeans_fit_sample,
    )

    e = clustered_vectors.select("vec_id", "embedding")
    spark = e.sparkSession
    cents = kmeans_fit_sample(e, "vec_id", "embedding", k=4, max_iter=10,
                              sample_size=64)
    cdf = spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    for rt in (None, 6):
        want = {
            (r["vec_id"], r["cluster"])
            for r in assign_clusters(e, "embedding", cents,
                                     round_to=rt).collect()
        }
        got_df = assign_clusters_table(e, "embedding", cdf, round_to=rt)
        got = {(r["vec_id"], r["cluster"]) for r in got_df.collect()}
        assert got == want and len({c for _, c in got}) == 4

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    corpus_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        or "Exchange rangepartitioning" in ln
        or "RoundRobin" in ln
    ]
    assert corpus_shuffles == [], corpus_shuffles


def test_semantic_dedup_table_centroids_equal_literal(clustered_vectors):
    """semantic_dedup with a (cell, centroid) DataFrame (the large-k
    path: one-row broadcast assignment + broadcast join for
    centroid_sim) must produce the IDENTICAL annotation — including
    bit-identical centroid_sim, whose norms come from a Python
    math.sqrt in the literal path and a JVM sqrt-fold in the table
    path (same IEEE left-fold, so no ulp can diverge) — with and
    without the rounding knobs."""
    from git_log_to_sqlite_spark.operators import (
        kmeans_fit_sample,
        semantic_dedup,
    )

    e = clustered_vectors.select("vec_id", "embedding")
    spark = e.sparkSession
    cents = kmeans_fit_sample(e, "vec_id", "embedding", k=4, max_iter=10,
                              sample_size=64)
    cdf = spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    for kw in ({}, {"round_to": 6, "dist_round_to": 6}):
        want = {
            tuple(r)
            for r in semantic_dedup(e, "vec_id", "embedding", cents,
                                    threshold=0.9, **kw).collect()
        }
        got = {
            tuple(r)
            for r in semantic_dedup(e, "vec_id", "embedding", cdf,
                                    threshold=0.9, **kw).collect()
        }
        assert got == want and len(got) == e.count()


def test_semantic_dedup_zero_norm_never_dropped(spark):
    """A zero-norm vector (failed encoder, empty input) makes every
    cosine involving it 0/0 = NaN, and Spark compares NaN LARGER than
    any number — unguarded, `sim >= threshold` would mark the zero
    vector a 'duplicate' of an arbitrary cell-mate. The nanvl guard
    must keep zero vectors (never dropped, never blamed, ranked last)
    while leaving real duplicates' annotations untouched."""
    import math

    from git_log_to_sqlite_spark.operators import semantic_dedup

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    rows = [
        (1, at(20)),
        (2, at(10)),            # genuine dup of 1 at threshold .98
        (3, [0.0, 0.0]),        # zero norm -> all its cosines NaN
        (4, [0.0, 0.0]),        # second zero vector: also kept (NaN pair)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["dup_of"], r["is_kept"])
        for r in semantic_dedup(df, "vec_id", "embedding", cents,
                                threshold=0.98).collect()
    }
    assert got[1] == (None, 1)
    assert got[2] == (1, 0)        # the real dup still drops
    assert got[3] == (None, 1)     # zero vectors are never semantic dups
    assert got[4] == (None, 1)     # ...even of each other (exact dedup's job)


def test_semantic_dedup_salted_pair_join_row_identical(spark):
    """The hot-cell ACTION arm behind the round-12 telemetry (the
    mega-cell probe measured the unsalted pair join quadratic AND
    serialized — one cell is one join key): salt_buckets=S salts the
    a-side by id hash and replicates the b-side S ways, so every
    (a, b) pair still meets exactly once and the annotation is
    ROW-IDENTICAL to the unsalted plan — salting is an execution
    strategy, never a semantics change (capping is the forbidden
    one). Corpus plants the hard cases: a 12-member hot cell with an
    upper-triangular chain (a~b~c, a !~ c: both b and c drop), a
    second cell, and a zero-norm vector (NaN cosines — never dropped,
    never blamed, in both plans)."""
    import math

    from git_log_to_sqlite_spark.operators import semantic_dedup
    from git_log_to_sqlite_spark.operators.similarity import (
        _semantic_annotate,
    )

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    # hot cell 0: 12 members, 3-degree ladder -> chains at a ~4.5deg
    # threshold; cell 1: one close pair; plus one zero vector
    rows = [(i, at(3 * i)) for i in range(12)]
    rows += [(20, at(180)), (21, at(178)), (22, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    threshold = math.cos(math.radians(4.5))

    def norm(df_):
        # the zero vector's centroid_sim is NaN by design, and
        # nan != nan would fail tuple equality on identical rows
        return sorted(
            tuple("NaN" if isinstance(x, float) and x != x else x for x in r)
            for r in map(tuple, df_.collect())
        )

    plain = norm(semantic_dedup(
        df, "vec_id", "embedding", cents, threshold=threshold))
    for s in (2, 4, 7):
        salted = semantic_dedup(df, "vec_id", "embedding", cents,
                                threshold=threshold, salt_buckets=s)
        assert norm(salted) == plain, s
    # TARGETED form: only cells >= salt_min_cell replicate — identical
    # rows whether the threshold bites the 12-member hot cell only
    # (10), every cell (2), or none (10**6: runtime-empty hot set,
    # AQE's empty-relation fold must keep unsalted semantics)
    for mc in (10, 2, 10**6):
        targeted = semantic_dedup(df, "vec_id", "embedding", cents,
                                  threshold=threshold, salt_buckets=4,
                                  salt_min_cell=mc)
        assert norm(targeted) == plain, mc
    # non-vacuous: the chain dropped somebody and kept somebody in
    # the hot cell, and the zero vector survived
    by_id = dict((t[0], t[3]) for t in plain)
    assert any(v is not None for k, v in by_id.items() if k < 12)
    assert any(v is None for k, v in by_id.items() if 0 < k < 12)
    assert by_id[22] is None

    # plan shape: the salted pair join replicates b via a Generate and
    # stays an equi-join (never a cartesian); salt is a join key, so
    # the hot cell hashes across salt_buckets partitions
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        semantic_dedup(df, "vec_id", "embedding", cents,
                       threshold=threshold, salt_buckets=4
                       ).explain("formatted")
    plan = buf.getvalue()
    assert "Generate" in plan and "explode(" in plan, plan
    assert "CartesianProduct" not in plan
    # the only nested-loop joins are renderings of the 1-row
    # centroid-array attach of the table-form assignment (round 15
    # quantizer default; the cached subtree re-renders it with fresh
    # ids, so ids are not countable here) — every occurrence must be
    # the Cross BuildRight scalar-attach shape; the salted PAIR join
    # itself stays an equi-join, pinned by the co-partitioning asserts
    # below
    import re

    bnlj_lines = [l for l in plan.splitlines()
                  if "BroadcastNestedLoopJoin" in l]
    tree_lines = [l for l in bnlj_lines if not l.strip().startswith("(")]
    header_lines = [l for l in bnlj_lines if l.strip().startswith("(")]
    # every TREE rendering (including re-renderings inside cached /
    # reused subtrees) must be the Cross BuildRight scalar-attach
    assert tree_lines and all(
        "Cross BuildRight" in l for l in tree_lines
    ), bnlj_lines
    # resolve the detail-section headers "(id) BroadcastNestedLoopJoin"
    # back to tree ids: every header id must be one the tree pinned as
    # Cross BuildRight above — a NEW nested-loop join could not sneak
    # in via a details block whose tree line this test never saw
    attach_ids = {
        m.group(1)
        for l in tree_lines
        for m in [re.search(r"BroadcastNestedLoopJoin Cross BuildRight \((\d+)\)", l)]
        if m
    }
    header_ids = {
        m.group(1)
        for l in header_lines
        for m in [re.match(r"\((\d+)\) BroadcastNestedLoopJoin", l.strip())]
        if m
    }
    assert header_ids <= attach_ids, (header_ids, attach_ids, bnlj_lines)
    # the load-bearing half of the fix: both pair-join sides are
    # explicitly co-partitioned on (cell, salt) with a FIXED count
    # (REPARTITION_BY_NUM — the one shuffle origin AQE never
    # rewrites); without it AQE broadcast-converts or coalesces the
    # salt away on byte estimates and the hot cell re-serializes
    # (measured at the unsalted 720 s in BASELINE.md's probe). Count
    # only the hash-partitioned (cell, salt) co-partitions: the
    # table-form centroid frame adds SinglePartition
    # REPARTITION_BY_NUM lines (the one-row model-state move, a
    # different class)
    copart = [l for l in plan.splitlines()
              if "REPARTITION_BY_NUM" in l and "hashpartitioning" in l]
    assert len(copart) == 2, plan

    with pytest.raises(ValueError, match="salt_buckets"):
        _semantic_annotate(df.limit(0), "vec_id", 0.9, None, salt_buckets=0)
    with pytest.raises(ValueError, match="salt_min_cell"):
        _semantic_annotate(
            df.limit(0), "vec_id", 0.9, None, salt_min_cell=100
        )


def test_semantic_store_salt_buckets_pass_through(spark, tmp_path):
    """SemanticStore(salt_buckets=S) must reproduce the unsalted
    store bit for bit across bootstrap AND ingest — the knob rides
    BOTH intra-batch annotate stages AND the history probe join
    (probe shape: store side salted per kept row, batch replicated;
    the backfill-regime arm — a hot cell's |batch cell| x |kept cell|
    product is one join key unsalted). Uniform, targeted, and
    runtime-empty-hot-set modes all bit-equal."""
    import math

    from git_log_to_sqlite_spark.operators import SemanticStore

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [0.0, 1.0]]
    schema = "vec_id long, embedding array<double>"
    boot = [(i, at(6 * i)) for i in range(10)]
    batch = [(100 + i, at(6 * i + 1)) for i in range(5)]      # history dups
    batch += [(200, at(45.0)), (201, at(45.5)), (202, at(46.0))]  # batch chain

    def run(path, s, mc=None):
        store = SemanticStore(
            spark, path, threshold=0.9995, salt_buckets=s, salt_min_cell=mc
        )
        store.bootstrap(spark.createDataFrame(boot, schema), cents)
        ann = sorted(map(tuple, store.ingest(
            spark.createDataFrame(batch, schema)).collect()))
        kept = sorted(r["vec_id"] for r in store.read().collect())
        return ann, kept

    plain = run(str(tmp_path / "plain"), 1)
    assert run(str(tmp_path / "salted"), 3) == plain
    # targeted: threshold bites the store's populated cells (2), and
    # a runtime-empty hot set (10**6 — AQE's empty-relation fold must
    # keep the unsalted semantics on the history probe too)
    assert run(str(tmp_path / "targeted"), 3, mc=2) == plain
    assert run(str(tmp_path / "empty_hot"), 3, mc=10**6) == plain
    # non-vacuous: both drop sources actually fired under the fixture,
    # so the salted annotate path was exercised on real drops
    ann, kept = plain
    sources = [r[4] for r in ann]
    assert sources.count("history") == 5
    assert sources.count("batch") >= 1
    assert len(kept) == 10 + (len(batch) - 5 - sources.count("batch"))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="salt_buckets"):
        SemanticStore(spark, str(tmp_path / "bad"), salt_buckets=0)


def test_semantic_dedup_cell_stats_observation(spark):
    """The round-11 scale watch: semantic_dedup was the one pair stage
    without a cell-occupancy observable. Planted mega-cell — six
    vectors crowd cell 0, two sit in cell 1 — and the telemetry must
    report the EXACT candidate mass the upper-triangular join pays
    (sum d(d-1)/2 = 15 + 1), eagerly at operator-call time (readable
    BEFORE the annotation is consumed, the round-9 AQE-loss doctrine),
    while the annotation itself is unchanged by arming the valve
    (annotate-don't-cap: capping would void the paper's drop rule)."""
    import math

    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators import semantic_dedup

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    rows = [(i, at(i * 3)) for i in range(6)]      # 0..15 deg: cell 0
    rows += [(10, at(180)), (11, at(177))]         # cell 1 pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    obs = Observation("semdedup_cells")
    armed = semantic_dedup(df, "vec_id", "embedding", cents,
                           threshold=0.9, observation=obs)
    m = obs.get  # eager: already complete, no action on `armed` yet
    assert m["cells"] == 2
    assert m["max_cell_rows"] == 6
    assert m["pair_mass"] == 15 + 1
    plain = semantic_dedup(df, "vec_id", "embedding", cents, threshold=0.9)
    assert sorted(map(tuple, armed.collect())) == \
        sorted(map(tuple, plain.collect()))

    # the large-k table-centroids path shares the ranked frame, so the
    # same valve must fire with identical metrics there
    cdf = spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).repartition(1)
    obs_t = Observation("semdedup_cells_table")
    semantic_dedup(df, "vec_id", "embedding", cdf,
                   threshold=0.9, observation=obs_t)
    assert obs_t.get == m


def test_semantic_store_cell_stats_observation(spark, tmp_path):
    """Both store paths carry the mega-cell valve: bootstrap observes
    the corpus-sized ranked frame (where the |corpus|^2/2 degenerate
    risk lives), each ingest observes its batch's — a fresh
    Observation per call, matching pyspark's single-use contract.
    Also pins the _dim() memoization introduced alongside: the
    quantizer dim is cached after bootstrap's first read."""
    import math

    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators import SemanticStore

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    store = SemanticStore(spark, str(tmp_path / "semstore"), threshold=0.98)
    ob = Observation("boot_cells")
    store.bootstrap(
        spark.createDataFrame(
            [(1, at(0)), (2, at(40)), (3, at(179))],
            "vec_id long, embedding array<double>"),
        cents, observation=ob)
    assert ob.get["cells"] == 2
    assert ob.get["max_cell_rows"] == 2   # cell 0 holds {1, 2}
    assert ob.get["pair_mass"] == 1
    assert store._dim_cache == 2          # memoized during bootstrap

    oi = Observation("ingest_cells")
    res = store.ingest(
        spark.createDataFrame(
            [(10, at(5)), (11, at(10)), (12, at(15))],
            "vec_id long, embedding array<double>"),
        observation=oi)
    assert oi.get["cells"] == 1           # today's batch crowds cell 0
    assert oi.get["max_cell_rows"] == 3
    assert oi.get["pair_mass"] == 3
    assert res.count() == 3


def test_semantic_store_ingest_no_broadcast_plan_equivalence(spark, tmp_path):
    """The backfill contract behind ingest's deliberately UNHINTED
    history join (the round-11 docstring promise, now executed): a
    daily-increment batch broadcasts by estimate, but a backfill-scale
    batch must DEGRADE to a shuffled cell join instead of hitting the
    8 GB broadcast cliff a hard hint would force. Forcing the degraded
    regime (autoBroadcastJoinThreshold=-1 — the planner's view of
    'too big to broadcast') must change the plan, not the answer:
    identical annotation, blame ids, and kept set. Bootstrap runs
    under the default conf both times; only the ingest differs."""
    import math

    from git_log_to_sqlite_spark.operators import SemanticStore

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # threshold 0.9995 <-> a ~1.81deg similarity cut. Bootstrap rows
    # sit 4deg apart (no intra-boot drops); the batch plants 1deg
    # history dups, 0.1deg intra-batch pairs at boot midpoints
    # (>= 1.95deg from any boot row — no history hit), exercising
    # both drop sources in both plan regimes.
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    boot = [(i, at(4 * i)) for i in range(40)]
    batch = [(200 + i, at(4 * i + 1)) for i in range(20)]
    batch += [(300 + i, at(4 * i + 1.95)) for i in range(20, 39)]
    batch += [(400 + i, at(4 * i + 2.05)) for i in range(20, 39)]

    def run(path, threshold_conf):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        store = SemanticStore(spark, path, threshold=0.9995)
        store.bootstrap(spark.createDataFrame(boot, schema), cents)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold_conf)
        try:
            ann = sorted(
                map(tuple,
                    store.ingest(spark.createDataFrame(batch, schema))
                    .collect())
            )
            kept = sorted(r["vec_id"] for r in store.read().collect())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        return ann, kept

    broadcast_regime = run(str(tmp_path / "s_bcast"), "10485760")
    shuffled_regime = run(str(tmp_path / "s_shuffle"), "-1")
    assert broadcast_regime == shuffled_regime
    # non-vacuous: both drop sources fired, and the novel half landed
    ann, kept = broadcast_regime
    sources = [r[4] for r in ann]
    assert sources.count("history") == 20
    assert sources.count("batch") == 19
    assert len(kept) == 40 + 19


def test_semantic_dedup_matches_duckdb_twin(spark, oracle_sf_dir):
    """Cross-engine determinism of the FULL SemDeDup annotation under
    the rounding knobs (round_to=6, dist_round_to=6) with pinned
    centroids — the sim_ann_ivf_assign evidence shape, pre-staging
    this operator's round-12 driver-gate row: cell assignment uses
    the rounded dot-identity distance, both cosines round to 6 dp
    before every comparison and ordering, so DuckDB reproduces cells,
    centroid_sim, the whole drop set, and every blame id exactly.
    Threshold 0.3 because the synthetic embeddings are near-random
    (top cos ~0.3): a semantic threshold would drop nothing and the
    test would pass vacuously — asserted non-vacuous below."""
    import math

    from git_log_to_sqlite_spark.operators import semantic_dedup

    from .oracle_harness import compare, duck_connection

    cent_ids = (3, 11, 19, 27)
    thr = 0.3
    cos6 = (
        "ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        "  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    csim6 = (
        "ROUND(list_dot_product(e.embedding::DOUBLE[], c.c)"
        " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        "  * sqrt(list_dot_product(c.c, c.c))), 6)"
    )
    sql = f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             embedding::DOUBLE[] AS c
      FROM embeddings WHERE vec_id IN {cent_ids}),
    sqd AS (
      SELECT e.vec_id, c.cell,
             ROUND(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                   - 2 * list_dot_product(e.embedding::DOUBLE[], c.c)
                   + list_dot_product(c.c, c.c), 6) AS d
      FROM embeddings e CROSS JOIN cents c),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rnk
        FROM sqd) t WHERE rnk = 1),
    ranked AS (
      SELECT a.vec_id, a.cell, {csim6} AS csim,
             ROW_NUMBER() OVER (PARTITION BY a.cell
                                ORDER BY {csim6} ASC, a.vec_id ASC) AS rnk
      FROM asg a
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN cents c ON c.cell = a.cell),
    drops AS (
      SELECT rb.vec_id, MIN(ra.rnk) AS _r
      FROM ranked ra JOIN ranked rb
        ON ra.cell = rb.cell AND ra.rnk < rb.rnk
      JOIN embeddings a ON a.vec_id = ra.vec_id
      JOIN embeddings b ON b.vec_id = rb.vec_id
      WHERE {cos6} >= {thr}
      GROUP BY rb.vec_id),
    blame AS (
      SELECT d.vec_id, r.vec_id AS dup_of
      FROM drops d JOIN ranked rd ON rd.vec_id = d.vec_id
      JOIN ranked r ON r.cell = rd.cell AND r.rnk = d._r)
    SELECT r.vec_id, r.cell, r.csim AS centroid_sim, b.dup_of,
           CAST(b.dup_of IS NULL AS INT) AS is_kept
    FROM ranked r LEFT JOIN blame b USING (vec_id)
    """
    e = spark.read.parquet(f"{oracle_sf_dir}/embeddings.parquet")
    cent_rows = (
        e.filter(F.col("vec_id").isin(*cent_ids)).orderBy("vec_id").collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in cent_rows]
    df = semantic_dedup(e, "vec_id", "embedding", cents, threshold=thr,
                        round_to=6, dist_round_to=6)
    con = duck_connection(oracle_sf_dir)
    try:
        ok, msg = compare(df, con, sql, name="semantic_dedup_twin")
        assert ok, msg
    finally:
        con.close()
    assert df.filter(F.col("is_kept") == 0).count() > 0  # non-vacuous


def test_ivf_append_rejects_wrong_dim(clustered_vectors, tmp_path):
    """append validates EVERY vector's dimensionality against the
    stored quantizer inside the assignment projection: zip_with pads
    mismatched dims with nulls, so an unchecked wrong-dim vector
    would be cell-assigned by a null-poisoned distance and corrupt
    the index permanently. The guard is per-row (a sampled pre-check
    passes a mixed batch whose FIRST row is fine), and a failed
    append must leave the index untouched — the job aborts before
    the parquet commit."""
    from git_log_to_sqlite_spark.operators import IvfIndex

    e = clustered_vectors.select("vec_id", "embedding")
    spark = e.sparkSession
    idx = IvfIndex(spark, str(tmp_path / "ivf_dim"))
    idx.build(e, k=4, max_iter=5, fit_sample_size=64)
    before = {r["cell"]: r["n_vectors"] for r in idx.cell_sizes().collect()}
    dim = len(idx.centroids()[0])

    # mixed batch: first row valid, second row one dim short — the
    # case a sampled first()-check waves through
    mixed = spark.createDataFrame(
        [
            (100001, [0.5] * dim),
            (100002, [0.5] * (dim - 1)),
        ],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="quantizer dim"):
        idx.append(mixed)
    after = {r["cell"]: r["n_vectors"] for r in idx.cell_sizes().collect()}
    assert after == before  # failed append committed nothing

    # right LENGTH but a NULL element — zip_with would null-poison the
    # distance and array_min would pick a meaningless cell; the guard
    # counts NON-NULL elements, so this must also fail pre-commit
    nullelem = spark.createDataFrame(
        [(100003, [0.5] * (dim - 1) + [None])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="quantizer dim"):
        idx.append(nullelem)
    assert {
        r["cell"]: r["n_vectors"] for r in idx.cell_sizes().collect()
    } == before

    # the valid-only batch still appends
    idx.append(mixed.filter(F.size("embedding") == dim))
    assert sum(
        r["n_vectors"] for r in idx.cell_sizes().collect()
    ) == sum(before.values()) + 1


def test_ann_probe_chunking_is_exact(clustered_vectors, tmp_path):
    """The documented escape hatch of the probe-side broadcast HARD
    CONTRACT (IvfIndex.probe / bucketed_ann_topk force-broadcast the
    query batch, so oversized batches must be chunked): per-query
    top-k is independent across chunks, so chunked probes unioned
    must equal the single-batch probe EXACTLY — for both the
    persisted index and the bucketed operator."""
    from git_log_to_sqlite_spark.operators import IvfIndex, bucketed_ann_topk

    e = clustered_vectors
    idx = IvfIndex(e.sparkSession, str(tmp_path / "ivf_chunk"))
    idx.build(e.select("vec_id", "embedding"), k=4, max_iter=5)
    q = e.filter(F.col("vec_id") < 12).select("vec_id", "embedding")
    whole = {tuple(r) for r in idx.probe(q, n_probe=2, k=5).collect()}
    chunked = set()
    for lo, hi in ((0, 6), (6, 12)):
        part = q.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        chunked |= {tuple(r) for r in idx.probe(part, n_probe=2, k=5).collect()}
    assert chunked == whole and len(whole) > 0

    qb = e.filter(F.col("vec_id") < 12)
    whole_b = {
        tuple(r)
        for r in bucketed_ann_topk(
            qb, e, "vec_id", "embedding", "cluster", k=5
        ).collect()
    }
    chunked_b = set()
    for lo, hi in ((0, 6), (6, 12)):
        part = qb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        chunked_b |= {
            tuple(r)
            for r in bucketed_ann_topk(
                part, e, "vec_id", "embedding", "cluster", k=5
            ).collect()
        }
    assert chunked_b == whole_b and len(whole_b) > 0


def test_lsh_bucket_keeps_clusters_together(clustered_vectors):
    from git_log_to_sqlite_spark.operators import lsh_bucket

    e = clustered_vectors.withColumn(
        "bucket", lsh_bucket(F.col("embedding"), dims=16, num_planes=3)
    )
    rows = e.select("vec_id", "cluster", "bucket").collect()
    from collections import Counter

    # determinism: re-computing assigns identical buckets
    again = {r["vec_id"]: r["bucket"] for r in e.select("vec_id", "bucket").collect()}
    assert all(again[r["vec_id"]] == r["bucket"] for r in rows)

    # a cluster whose center sits near a hyperplane legitimately splits
    # (single-probe LSH), so assert the AVERAGE majority share across
    # clusters beats random bucketing (1/8 per bucket) by a wide margin
    shares = []
    for c in range(4):
        buckets = Counter(r["bucket"] for r in rows if r["cluster"] == c)
        shares.append(buckets.most_common(1)[0][1] / sum(buckets.values()))
    assert sum(shares) / len(shares) > 0.55, shares


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 250, 11), (2, 50, 12)], "k long, ts long, qid long"
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0, 1), (1, 200, 2.0, 2), (1, 100, 9.0, 3), (2, 60, 3.0, 4)],
        "k long, ts long, v double, tie long",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tie_col="tie",
    )
    got = {r["qid"]: r["v_asof"] for r in out.collect()}
    assert got[10] == 9.0  # ts=100 tie -> highest tie id wins
    assert got[11] == 2.0  # latest prior event
    assert got[12] is None  # no event at/before ts=50


def test_multimodal_plumbing(docs):
    # the stub decoder is pinned explicitly: payloads here are text, and
    # the test must behave identically whether or not PIL is installed
    media = as_media(docs, "doc_id", "text", mime="text/plain")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_image_features(media, decoder=_decode_image_stub).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["width"] >= 16 and r["height"] >= 16
        assert 0.0 <= r["mean_luma"] <= 1.0
    # deterministic stub: same payload -> same features
    f = {r["media_id"]: (r["width"], r["height"], r["mean_luma"]) for r in feats}
    assert f[1] == f[2]
    frames = sample_frames(media, every_nth_byte=8).collect()
    assert {r["media_id"] for r in frames} == {1, 2, 3, 4, 5, 6}
    n1 = len([r for r in frames if r["media_id"] == 1])
    assert n1 == len("the quick brown fox jumps over the lazy dog") // 8


def test_multimodal_resize_roundtrips_binary(docs):
    from git_log_to_sqlite_spark.operators.multimodal import resize_images

    media = as_media(docs, "doc_id", "text", mime="text/plain")
    out = resize_images(media, width=8, height=4)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = out.collect()
    assert len(rows) == 6
    for r in rows:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["payload"]) == 8 * 4 == r["byte_len"]
    # deterministic stub: identical payloads resize identically
    by_id = {r["media_id"]: bytes(r["payload"]) for r in rows}
    assert by_id[1] == by_id[2]


def test_salted_aggregate_matches_plain(spark):
    """Salting must be invisible in the result: same groups, same
    counts/sums/extrema as the unsalted plan."""
    from git_log_to_sqlite_spark.operators import salted_aggregate

    rows = [(i, "hot" if i % 10 else f"cold{i}", i % 7) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "id long, k string, v long")
    got = {
        r["k"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in salted_aggregate(
            df, keys=["k"],
            aggs={"n": ("count", "id"), "total": ("sum", "v"),
                  "vmin": ("min", "v"), "vmax": ("max", "v")},
            salt_from="id", buckets=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in df.groupBy("k").agg(
            F.count("id").alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("vmin"), F.max("v").alias("vmax"),
        ).collect()
    }
    assert got == want


def test_salted_aggregate_rejects_non_mergeable(spark):
    from git_log_to_sqlite_spark.operators import salted_aggregate

    df = spark.createDataFrame([(1, "a", 1.0)], "id long, k string, v double")
    with pytest.raises(ValueError, match="not mergeable"):
        salted_aggregate(df, ["k"], {"a": ("avg", "v")}, salt_from="id")


def test_salted_join_matches_plain(spark):
    """The salted equi-join returns exactly the plain join's rows."""
    from git_log_to_sqlite_spark.operators import salted_join

    fact = spark.createDataFrame(
        [(i, 1 if i % 5 else i % 3) for i in range(1, 201)], "fid long, k long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(3)], "k long, label string")
    got = sorted(
        (r["fid"], r["k"], r["label"])
        for r in salted_join(fact, dim, on="k", fact_unique="fid", buckets=4).collect()
    )
    want = sorted(
        (r["fid"], r["k"], r["label"]) for r in fact.join(dim, "k").collect()
    )
    assert got == want


def test_multiprobe_beats_single_probe_recall(clustered_vectors):
    """Multi-probe LSH must recover at least the single-probe recall
    (it searches a strict superset of cells) and clear an absolute
    floor on planted clusters."""
    from git_log_to_sqlite_spark.operators import lsh_bucket, multiprobe_ann_topk

    e = clustered_vectors.withColumn(
        "lsh", lsh_bucket(F.col("embedding"), dims=16, num_planes=3)
    )
    q = e.filter(F.col("vec_id") < 12)
    exact = brute_force_topk(q, e, "vec_id", "embedding", k=5)
    single = bucketed_ann_topk(q, e, "vec_id", "embedding", "lsh", k=5)
    multi = multiprobe_ann_topk(
        q, clustered_vectors, "vec_id", "embedding", dims=16, num_planes=3, k=5
    )
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    sg = {(r["query_id"], r["neighbor_id"]) for r in single.collect()}
    mp = {(r["query_id"], r["neighbor_id"]) for r in multi.collect()}
    r_single = len(ex & sg) / len(ex)
    r_multi = len(ex & mp) / len(ex)
    assert r_multi >= r_single, (r_multi, r_single)
    # measured: single-probe 0.45, multi-probe 0.95 on this fixture
    assert r_multi > 0.85, f"multiprobe recall too low: {r_multi:.2f}"


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 250, 11), (2, 500, 12)], "k long, ts long, qid long"
    )
    right = spark.createDataFrame(
        [(1, 120, 1.0, 1), (1, 260, 2.0, 2), (2, 900, 3.0, 3)],
        "k long, ts long, v double, tie long",
    )
    fwd = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tie_col="tie", direction="forward",
    )
    got = {r["qid"]: r["v_asof"] for r in fwd.collect()}
    assert got == {10: 1.0, 11: 2.0, 12: 3.0}  # nearest following event

    tol = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tie_col="tie", direction="forward",
        tolerance_seconds=50,
    )
    got_tol = {r["qid"]: r["v_asof"] for r in tol.collect()}
    # qid=12's match is 400s away -> nulled by the 50s tolerance
    assert got_tol == {10: 1.0, 11: 2.0, 12: None}


def test_ordered_running_sum_matches_global_window(spark):
    from pyspark.sql import Window

    # shuffled insert order + enough rows to span several range partitions
    rows = [((i * 7919) % 1000, (i % 13) + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(11)
    got = ordered_running_sum(df, ["k"], "v", out_col="cum", num_partitions=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select("k", "v", F.sum("v").over(w).alias("cum"))
    assert sorted(map(tuple, got.select("k", "v", "cum").collect())) == sorted(
        map(tuple, want.collect())
    )
    # the data-sized windows must all carry a partition spec (the local
    # window partitions by __ordered_pid). Round 16: numeric-keyed
    # calls use the VALUE-BUCKETED form — a pinned (lazily cached)
    # frame with a broadcast (min,max) attach — instead of the
    # localCheckpoint boundary, whose eager=False was NOT lazy under
    # AQE (upstream stages materialized at construction) and whose
    # LogicalRDD severed Catalyst's view of the pipeline.
    plan = got._jdf.queryExecution().executedPlan().toString()
    specs = [l for l in plan.splitlines() if "windowspecdefinition" in l.lower()]
    assert any("__ordered_pid" in s for s in specs)
    # the pinned (lazily cached) bucketed frame marks the new path —
    # the retired checkpoint form had no InMemoryRelation. (A bare
    # "no ExistingRDD" pin is wrong HERE: this test's createDataFrame
    # input itself scans as ExistingRDD; the parquet-input pins in
    # test_plans.py carry that stronger assertion.)
    assert "inmemory" in plan.lower()


def test_ordered_numeric_construction_is_lazy(spark):
    """The round-16 contract: constructing a numeric-keyed ordered op
    (and the composites built on it) fires ZERO Spark jobs. The
    retired localCheckpoint(eager=False) form was not lazy under AQE
    (Dataset.checkpoint -> queryExecution.toRdd ->
    AdaptiveSparkPlanExec materializes every upstream stage at
    construction — measured 10 jobs / seconds of data work per
    pretrain-composite construction)."""
    import time

    tracker = spark.sparkContext._jsc.statusTracker()
    df = spark.createDataFrame([(i, 1) for i in range(200)], "k long, v long")
    ordered_running_sum(df, ["k"], "v")  # warm (pin registry, py4j)
    before = len(tracker.getJobIdsForGroup(None))
    ordered_running_sum(df, ["k"], "v")
    time.sleep(0.5)  # async subquery futures would land here
    assert len(tracker.getJobIdsForGroup(None)) == before


def test_ordered_bucketed_edge_keys_match_global_window(spark):
    """Null / NaN / duplicated / negative keys through the
    value-bucketed path must equal the global-window reference —
    bucketing is monotone so ANY bounds give the same cum values."""
    from pyspark.sql import Window

    rows = [
        (None, 1.0), (float("nan"), 3.0), (2.5, 1.0), (1.5, 2.0),
        (-7.25, 4.0), (0.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "k double, v double")
    got = {
        (str(r["k"]), r["cum"])
        for r in ordered_running_sum(df, ["k"], "v", out_col="cum").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (str(r["k"]), r["cum"])
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == want


def test_ordered_null_keys_without_nan_take_bucket_zero(spark):
    """Null first-order keys with NO NaN in the frame — the round-16
    edge test's NaN row poisons max into NaN, collapsing EVERY row
    into one bucket, so it never exercised the null pid branch on a
    healthy multi-bucket range. Without the explicit
    ``when(key.isNull(), 0)`` branch, ``least(NULL, n-1)`` SKIPS the
    null and returns ``n-1``: nulls land in the TOP bucket while the
    local window sorts them FIRST, so their running sums would count
    every non-null row's contribution as an offset — wrong results,
    not just imbalance."""
    from pyspark.sql import Window

    rows = [(None, 10.0), (None, 20.0)] + [
        (float(i), 1.0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k double, v double").repartition(7)
    got = {
        (str(r["k"]), r["cum"])
        for r in ordered_running_sum(
            df, ["k", "v"], "v", out_col="cum", num_partitions=8
        ).collect()
    }
    w = Window.orderBy("k", "v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (str(r["k"]), r["cum"])
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == want
    # the two null rows sort first: their cums are 10 and 30, and no
    # non-null row's offset may include them twice or miss them
    assert ("None", 10.0) in got and ("None", 30.0) in got


def test_ordered_all_equal_keys_single_bucket_still_correct(spark):
    """Degenerate range (every first-order key equal) collapses to one
    bucket — correct, just unparallel; the tie-break columns keep the
    total order."""
    from pyspark.sql import Window

    rows = [(7, i, 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, t long, v long").repartition(5)
    got = ordered_running_sum(df, ["k", "t"], "v", out_col="cum")
    w = Window.orderBy("k", "t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("k", "t", F.sum("v").over(w).alias("cum"))
    assert sorted(map(tuple, got.select("k", "t", "cum").collect())) == sorted(
        map(tuple, want.collect())
    )


def test_ordered_row_number_matches_global_window(spark):
    from pyspark.sql import Window

    rows = [(f"h{(i * 31) % 200:03d}", i % 5) for i in range(1000)]
    df = spark.createDataFrame(rows, "h string, pos int").repartition(9)
    got = ordered_row_number(df, ["h", "pos"], out_col="id", num_partitions=8)
    w = Window.orderBy("h", "pos")
    want = df.select("h", "pos", F.row_number().over(w).cast("long").alias("id"))
    assert sorted(map(tuple, got.select("h", "pos", "id").collect())) == sorted(
        map(tuple, want.collect())
    )


def test_image_near_dup_planted_twins(spark):
    """dHash + hamming_pairs over a raw-grid payload format (the
    grid_fn seam makes the perceptual-hash math testable without
    Pillow): planted near-identical images — a twin with exactly 2
    flipped difference bits, an exact copy, a 4-bit variant, and an
    unrelated image — must pair exactly as a brute-force Hamming scan
    over the signatures says, with the twins inside max_hamming=3 and
    everything else outside."""
    import random

    from git_log_to_sqlite_spark.operators.multimodal import (
        image_dhash,
        image_near_dup_pairs,
    )

    rows, cols = 6, 10
    W = cols + 1
    rng = random.Random(3)
    base = [rng.choice([40, 200]) for _ in range(rows * W)]

    def flip_rows(g, which):
        out = list(g)
        for r in which:
            prev = out[r * W + W - 2]
            last = out[r * W + W - 1]
            # invert the row's final comparison (last cell touches
            # only that one bit)
            out[r * W + W - 1] = 30 if last > prev else 210
        return out

    imgs = {
        1: base,
        2: flip_rows(base, [0, 1]),           # hamming 2 vs img 1
        3: flip_rows(base, [2, 3, 4, 5]),     # hamming 4 vs 1, 6 vs 2
        4: [rng.choice([40, 200]) for _ in range(rows * W)],  # unrelated
        5: list(base),                        # exact copy: hamming 0
    }
    media = spark.createDataFrame(
        [(i, bytes(g), "image/raw", len(g)) for i, g in imgs.items()],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    grid_fn = lambda p, r, c: list(p[: r * (c + 1)])  # noqa: E731

    sigs = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(media, rows, cols, grid_fn=grid_fn).collect()
    }
    assert sigs[1] == sigs[5]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[1], sigs[2]) == 2
    assert ham(sigs[1], sigs[3]) == 4
    assert ham(sigs[2], sigs[3]) == 6

    want = {
        (a, b): ham(sigs[a], sigs[b])
        for a in sigs
        for b in sigs
        if a < b and ham(sigs[a], sigs[b]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(
            media, rows, cols, max_hamming=3, grid_fn=grid_fn
        ).collect()
    }
    assert got == want
    assert got[(1, 2)] == 2 and got[(1, 5)] == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_multimodal_salt_passthrough_row_identical(spark):
    """The four Hamming-modality wrappers (image/audio/video near-dup,
    cross-modal image-in-video) thread salt_buckets / salt_min_bucket
    through to the shared pair/probe stages with row-identical output
    — the knobs are pure execution strategy, and the stage-level
    semantics are proven in the band-join tests; this pins the wrapper
    plumbing, plus the before-the-pin validation (a bad salt arg must
    not leak a signature-pin registry entry)."""
    import random

    from git_log_to_sqlite_spark.operators.caching import (
        _LIVE,
        release_caches,
    )
    from git_log_to_sqlite_spark.operators.multimodal import (
        audio_near_dup_pairs,
        image_in_video_frames,
        image_near_dup_pairs,
        video_near_dup_pairs,
    )

    def payload(seed, n=600):
        r = random.Random(seed)
        return bytes(r.randrange(256) for _ in range(n))

    fam = payload("fam")
    media = spark.createDataFrame(
        [(i, fam, "application/octet-stream", len(fam)) for i in range(1, 7)]
        + [
            (10 + i, payload(f"solo{i}"), "application/octet-stream", 600)
            for i in range(3)
        ],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    stills = media.filter("media_id >= 10")
    grid_fn = lambda p, r, c: list(p[: r * (c + 1)])  # noqa: E731

    def norm(df_):
        return sorted(map(tuple, df_.collect()))

    ops = (
        lambda **s: image_near_dup_pairs(media, grid_fn=grid_fn, **s),
        lambda **s: audio_near_dup_pairs(media, **s),
        lambda **s: video_near_dup_pairs(media, grid_fn=grid_fn, **s),
        lambda **s: image_in_video_frames(
            stills, media, grid_fn=grid_fn, **s
        ),
    )
    for op in ops:
        plain = norm(op())
        assert len(plain) > 0  # the 6-copy family pairs at hamming 0
        assert norm(op(salt_buckets=3)) == plain
        assert norm(op(salt_buckets=4, salt_min_bucket=4)) == plain
        release_caches()
        with pytest.raises(ValueError, match="salt_"):
            op(salt_buckets=0)
        assert _LIVE == []


def test_audio_near_dup_planted_twins(spark):
    """Haitsma-Kalker fingerprint + hamming_pairs over a raw-energy
    payload format (the energy_fn seam makes the bit math testable
    without an audio decoder): operator signatures must equal a pure-
    python reference of the same derivation, volume shifts must be
    invariant (the double difference cancels level), and the pair set
    must equal a brute-force Hamming scan."""
    import random

    from git_log_to_sqlite_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    F_, B = 7, 11
    rng = random.Random(11)

    def clip():
        return [[rng.randint(0, 200) for _ in range(B)] for _ in range(F_)]

    def ref_fp(e):
        h = 0
        for f in range(1, F_):
            for b in range(B - 1):
                d = (e[f][b] - e[f][b + 1]) - (e[f - 1][b] - e[f - 1][b + 1])
                h = (h << 1) | (1 if d > 0 else 0)
        return h

    base = clip()
    louder = [[v + 40 for v in row] for row in base]  # level shift
    perturbed = [list(row) for row in base]
    perturbed[3][4] += 90  # local spectral change -> a few bit flips
    clips = {1: base, 2: louder, 3: perturbed, 4: clip(), 5: clip()}
    media = spark.createDataFrame(
        [
            (i, bytes(v for row in e for v in row), "audio/raw",
             F_ * B)
            for i, e in clips.items()
        ],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    energy_fn = lambda p, fr, ba: [  # noqa: E731 — parse the raw grid
        [float(p[f * ba + b]) for b in range(ba)] for f in range(fr)
    ]
    got_sigs = {
        r["media_id"]: r["afp"]
        for r in audio_fingerprint(media, F_, B, energy_fn=energy_fn).collect()
    }
    assert got_sigs == {i: ref_fp(e) for i, e in clips.items()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert got_sigs[1] == got_sigs[2]  # volume-invariant
    assert 1 <= ham(got_sigs[1], got_sigs[3]) <= 6  # local change, few bits

    k = max(3, ham(got_sigs[1], got_sigs[3]))
    want = {
        (a, b): ham(got_sigs[a], got_sigs[b])
        for a in clips
        for b in clips
        if a < b and ham(got_sigs[a], got_sigs[b]) <= k
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup_pairs(
            media, F_, B, max_hamming=k, energy_fn=energy_fn
        ).collect()
    }
    assert got == want and (1, 2) in got

    with pytest.raises(ValueError, match="60-bit"):
        audio_fingerprint(media, frames=9, bands=10)
    with pytest.raises(ValueError, match="frames >= 2"):
        audio_fingerprint(media, frames=1, bands=11)


def test_video_near_dup_planted_twins(spark):
    """Frame-vote video fingerprint + hamming_pairs over a raw-grid
    frame format (frame_bytes=66 makes every payload slice one 6x11
    luma grid, so the grid_fn seam parses it directly): the per-frame
    hashes must equal image_dhash of the same chunks (the shared
    _grid_dhash cannot drift between modalities), the clip signature
    must equal a pure-python majority-vote reference, and planted
    twins — a re-encoded copy, a trimmed clip, a minority-edited
    clip, a majority-edited clip — must pair exactly as a
    brute-force Hamming scan over the clip signatures says."""
    import random

    from git_log_to_sqlite_spark.operators.multimodal import (
        image_dhash,
        video_fingerprint,
        video_frame_dhash,
        video_near_dup_pairs,
    )

    rows, cols = 6, 10
    W = cols + 1
    fb = rows * W  # 66: one frame slice == one raw grid
    rng = random.Random(7)
    base = [rng.choice([40, 200]) for _ in range(rows * W)]
    other = [rng.choice([40, 200]) for _ in range(rows * W)]

    def flip_rows(g, which):
        out = list(g)
        for r in which:
            prev = out[r * W + W - 2]
            last = out[r * W + W - 1]
            out[r * W + W - 1] = 30 if last > prev else 210  # 1 bit per row
        return out

    edited = flip_rows(base, [0, 1])  # hamming 2 vs base, per frame
    clips = {
        1: [base] * 9,
        2: [base] * 9,                          # re-encoded: same frames
        3: [base] * 5,                          # trimmed: fewer frames
        4: [edited] * 5 + [base] * 4,           # majority edited -> 2 bits
        5: [base] * 7 + [edited] * 2,           # minority edited -> 0 bits
        6: [other] * 9,                         # unrelated
    }
    media = spark.createDataFrame(
        [
            (i, b"".join(bytes(g) for g in frames), "video/raw", fb * len(frames))
            for i, frames in clips.items()
        ],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    grid_fn = lambda p, r, c: list(p[: r * (c + 1)])  # noqa: E731

    # per-frame hashes == image_dhash of the same chunks, frame counts right
    frame_rows = video_frame_dhash(
        media, rows, cols, frame_bytes=fb, grid_fn=grid_fn
    ).collect()
    got_frames = {}
    for r in frame_rows:
        got_frames.setdefault(r["media_id"], {})[r["frame_no"]] = r["dhash"]
    assert {i: len(f) for i, f in got_frames.items()} == {
        i: len(frames) for i, frames in clips.items()
    }
    still = spark.createDataFrame(
        [(0, bytes(base), "image/raw", fb), (1, bytes(edited), "image/raw", fb)],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    stills = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(still, rows, cols, grid_fn=grid_fn).collect()
    }
    assert got_frames[1][0] == stills[0] and got_frames[4][0] == stills[1]

    # clip signature == pure-python majority vote of the frame hashes
    def ref_vote(hashes):
        n = len(hashes)
        v = 0
        for k in range(rows * cols):
            if 2 * sum((h >> k) & 1 for h in hashes) > n:
                v |= 1 << k
        return v

    want_sigs = {
        i: ref_vote([got_frames[i][f] for f in sorted(got_frames[i])])
        for i in clips
    }
    got_sigs = {
        r["media_id"]: r["vfp"]
        for r in video_fingerprint(
            media, rows, cols, frame_bytes=fb, grid_fn=grid_fn
        ).collect()
    }
    assert got_sigs == want_sigs
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert got_sigs[1] == got_sigs[2] == got_sigs[3]  # re-encode + trim survive
    assert got_sigs[5] == got_sigs[1]  # minority edit out-voted
    assert ham(got_sigs[1], got_sigs[4]) == 2  # majority edit flips its bits

    # pair set == brute-force Hamming scan over the clip signatures
    want = {
        (a, b): ham(got_sigs[a], got_sigs[b])
        for a in clips
        for b in clips
        if a < b and ham(got_sigs[a], got_sigs[b]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in video_near_dup_pairs(
            media, rows, cols, frame_bytes=fb, max_hamming=3, grid_fn=grid_fn
        ).collect()
    }
    assert got == want
    assert got[(1, 2)] == 0 and got[(1, 3)] == 0 and got[(1, 4)] == 2
    assert all(6 not in pair for pair in got)

    # exact ties vote to 0 (deterministic for even frame counts): two
    # frames disagreeing on 6 bits -> those bits all land 0
    tie = spark.createDataFrame(
        [(9, bytes(base) + bytes(flip_rows(base, range(rows))), "video/raw", 2 * fb)],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    [tie_row] = video_fingerprint(
        tie, rows, cols, frame_bytes=fb, grid_fn=grid_fn
    ).collect()
    tie_hashes = {
        r["frame_no"]: r["dhash"]
        for r in video_frame_dhash(
            tie, rows, cols, frame_bytes=fb, grid_fn=grid_fn
        ).collect()
    }
    assert tie_row["vfp"] == ref_vote([tie_hashes[0], tie_hashes[1]])
    disagree = tie_hashes[0] ^ tie_hashes[1]
    assert disagree != 0 and (tie_row["vfp"] & disagree) == 0

    # short payload (< one frame) is its own single frame
    short = spark.createDataFrame(
        [(10, b"abc", "video/raw", 3)],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    assert video_frame_dhash(short, rows, cols, frame_bytes=fb).count() == 1

    with pytest.raises(ValueError, match="60-bit"):
        video_fingerprint(media, rows=8, cols=10)


def test_grid_dhash_batch_equals_scalar():
    """The vectorized batch hasher (the Arrow-batch hot path) must be
    bit-identical to the scalar reference on random grids, including
    equal-luma plateaus (strict > on both paths), over-long grids
    (sliced like the scalar form's indexing), and empty batches."""
    import random

    from git_log_to_sqlite_spark.operators.multimodal import (
        _grid_dhash,
        _grid_dhash_batch,
    )

    rng = random.Random(17)
    for rows, cols in ((6, 10), (3, 4), (1, 1)):
        n = rows * (cols + 1)
        grids = [
            [rng.choice([0, 1, 40, 200, 255]) for _ in range(n)]
            for _ in range(50)
        ]
        grids.append([7] * n)  # all-equal plateau -> hash 0
        assert _grid_dhash_batch(grids, rows, cols) == [
            _grid_dhash(g, rows, cols) for g in grids
        ]
    over = [[rng.randrange(256) for _ in range(100)] for _ in range(5)]
    assert _grid_dhash_batch(over, 6, 10) == [_grid_dhash(g, 6, 10) for g in over]
    assert _grid_dhash_batch([], 6, 10) == []
    # the zero-copy BYTES fast path (exact-length bytes grids — the
    # stub's and the PIL provider's output) must agree with both the
    # scalar reference and the list fallback on the same values
    bgrids = [bytes(rng.randrange(256) for _ in range(66)) for _ in range(64)]
    want = [_grid_dhash(g, 6, 10) for g in bgrids]
    assert _grid_dhash_batch(bgrids, 6, 10) == want
    assert _grid_dhash_batch([list(g) for g in bgrids], 6, 10) == want
    # a mixed batch (one list grid) must drop to the fallback, not crash
    assert _grid_dhash_batch([bgrids[0], list(bgrids[1])], 6, 10) == want[:2]
    # fractional lumas (a custom averaging grid_fn) must not truncate:
    # 1.5 > 1.2 is a set bit the int cast would erase
    fr = [1.2, 1.5] + [0.0] * 64
    got_fr = _grid_dhash_batch([fr], 6, 10)
    assert got_fr == [_grid_dhash(fr, 6, 10)]
    assert got_fr[0] & (1 << 59)  # the (0,0) comparison survived


def _aligned_run_lengths(sa, sb):
    """Brute-force reference shared by the video-scene and
    audio-segment tests: lengths of every maximal run of equal
    elements between sequences ``sa`` and ``sb`` at a fixed alignment,
    across all diagonals."""
    out = []
    for diag in range(-len(sb) + 1, len(sa)):
        run = 0
        for pb in range(len(sb)):
            pa = pb + diag
            if 0 <= pa < len(sa) and sa[pa] == sb[pb]:
                run += 1
            else:
                if run:
                    out.append(run)
                run = 0
        if run:
            out.append(run)
    return out


def _span_expect(seqs, min_run, window=1):
    """Expected (longest, n_cells) per pair from the run lengths: a
    run of t elements carries t - window + 1 complete window cells
    (none when t < window); pairs report iff the longest observable
    run >= min_run."""
    want = {}
    for x in seqs:
        for y in seqs:
            if x < y:
                runs = [t for t in _aligned_run_lengths(seqs[x], seqs[y])
                        if t >= window]
                if runs and max(runs) >= min_run:
                    want[(x, y)] = (
                        max(runs), sum(t - window + 1 for t in runs)
                    )
    return want


def test_video_shared_scene_pairs_planted(spark):
    """Scene-level video dedup (the substring machinery over per-frame
    hashes): a 6-frame scene spliced into an otherwise-different clip,
    an exact clip copy, and sub-threshold 1-2 frame overlaps must
    resolve exactly as a brute-force longest-aligned-run scan over the
    frame-hash sequences says; a degenerate black frame planted across
    the corpus is capped with honest telemetry, splitting only the
    runs that crossed it."""
    import random

    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators.multimodal import (
        _grid_dhash,
        video_shared_scene_pairs,
    )

    rows_, cols = 6, 10
    fb = rows_ * (cols + 1)  # 66: one slice per frame grid
    rng = random.Random(23)

    def frame():
        return bytes(rng.choice([30, 90, 160, 220]) for _ in range(fb))

    a = [frame() for _ in range(12)]
    g = [frame() for _ in range(12)]
    clips = {
        1: a,
        2: g[0:3] + a[2:8] + [g[3]],       # 6-frame scene from clip 1
        3: [frame() for _ in range(8)],    # unrelated
        4: list(a),                        # exact copy: run 12
        5: [a[0], g[9], a[2], a[3], g[10]],  # runs of 1 and 2: below 4
    }
    media = spark.createDataFrame(
        [(i, b"".join(fs), "video/raw", fb * len(fs)) for i, fs in clips.items()],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    grid_fn = lambda p, r, c: p[: r * (c + 1)]  # noqa: E731 — raw grid

    # brute-force reference over the scalar frame-hash sequences
    seqs = {
        i: [_grid_dhash(f, rows_, cols) for f in fs] for i, fs in clips.items()
    }
    want = _span_expect(seqs, min_run=4)
    got = {
        (r["id_a"], r["id_b"]): (r["longest_run_frames"], r["n_shared_frames"])
        for r in video_shared_scene_pairs(
            media, rows_, cols, frame_bytes=fb, min_run_frames=4, grid_fn=grid_fn
        ).collect()
    }
    assert got == want
    assert got[(1, 2)][0] == 6 and got[(1, 4)][0] == 12 and got[(2, 4)][0] == 6
    assert (1, 5) not in got and not any(3 in p for p in got)

    # degenerate black frame across every clip: the cap drops it and
    # reports honest telemetry; run recovery elsewhere is untouched
    black = bytes([0]) * fb
    capped_clips = {i: [black] + fs + [black] for i, fs in clips.items()}
    media_b = spark.createDataFrame(
        [(i, b"".join(fs), "video/raw", fb * len(fs))
         for i, fs in capped_clips.items()],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    obs = Observation()
    got_b = {
        (r["id_a"], r["id_b"]): r["longest_run_frames"]
        for r in video_shared_scene_pairs(
            media_b, rows_, cols, frame_bytes=fb, min_run_frames=4,
            max_df=4, grid_fn=grid_fn, observation=obs,
        ).collect()
    }
    assert obs.get["frames_dropped"] >= 1 and obs.get["pairs_avoided"] > 0
    # interior scenes survive the cap (black frames were at the edges)
    assert got_b[(1, 2)] == 6 and got_b[(1, 4)] == 12

    from git_log_to_sqlite_spark.operators import release_caches

    release_caches()  # the capped runs pin the frame table
    with pytest.raises(ValueError, match="min_run_frames"):
        video_shared_scene_pairs(media, min_run_frames=0)
    with pytest.raises(ValueError, match="mutually exclusive"):
        video_shared_scene_pairs(media, max_df=2, max_df_quantile=0.9)
    with pytest.raises(ValueError, match="requires a cap"):
        video_shared_scene_pairs(media, observation=Observation())


def test_audio_shared_segment_pairs_planted(spark):
    """Segment-level audio dedup (the substring machinery over
    Haitsma-Kalker sub-fingerprint sequences): a 6-frame segment
    spliced into another clip, a volume-shifted full copy (the double
    difference cancels level, so every sub-fingerprint matches), and
    unrelated audio must resolve exactly as a brute-force longest-
    aligned-run scan; planted silence (the degenerate zero-word) is
    capped with honest telemetry."""
    import random

    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators.multimodal import (
        audio_shared_segment_pairs,
    )

    BA = 11
    rng = random.Random(31)

    def fr():
        return [rng.randint(0, 200) for _ in range(BA)]

    a = [fr() for _ in range(14)]
    clips = {
        1: a,
        2: [fr(), fr(), fr()] + a[4:10] + [fr()],   # 6 copied frames
        3: [[v + 35 for v in row] for row in a],    # louder full copy
        4: [fr() for _ in range(10)],               # unrelated
    }

    def payload(frames):
        return bytes(v for row in frames for v in row)

    media = spark.createDataFrame(
        [(i, payload(fs), "audio/raw", BA * len(fs)) for i, fs in clips.items()],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    energy = lambda p, fb, ba: [  # noqa: E731 — parse raw frame rows
        [float(p[f * ba + b]) for b in range(ba)] for f in range(len(p) // ba)
    ]

    def subfps(e):
        out = []
        for f in range(1, len(e)):
            h = 0
            for b in range(BA - 1):
                d = (e[f][b] - e[f][b + 1]) - (e[f - 1][b] - e[f - 1][b + 1])
                h = (h << 1) | (1 if d > 0 else 0)
            out.append(h)
        return out

    seqs = {i: subfps(fs) for i, fs in clips.items()}
    assert seqs[1] == seqs[3]  # volume invariance, sequence-exact

    # windowed join keys (the 10-bit-word scale fix): runs report in
    # words, cells in complete window positions (t - window + 1)
    want = _span_expect(seqs, min_run=4, window=4)
    got = {
        (r["id_a"], r["id_b"]): (r["longest_run_subfps"], r["n_shared_subfps"])
        for r in audio_shared_segment_pairs(
            media, frame_bytes=BA, bands=BA, min_run=4, window=4,
            energy_fn=energy,
        ).collect()
    }
    assert got == want
    assert got[(1, 3)][0] == 13 and got[(1, 2)][0] == 5  # 6 frames = 5 words
    assert got[(1, 2)][1] == 2  # a 5-word run carries 2 four-word windows
    assert not any(4 in p for p in got)

    # planted trailing silence (8 frames -> a 7-zero-word run -> 4
    # complete all-zero windows per clip): the degenerate window key
    # repeats across every clip; the cap drops it and reports, the
    # interior segments survive
    silent = [[0] * BA] * 8
    media_s = spark.createDataFrame(
        [(i, payload(fs + silent), "audio/raw", BA * (len(fs) + 8))
         for i, fs in clips.items()],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    obs = Observation()
    got_s = {
        (r["id_a"], r["id_b"]): r["longest_run_subfps"]
        for r in audio_shared_segment_pairs(
            media_s, frame_bytes=BA, bands=BA, min_run=4, window=4,
            max_df=8, energy_fn=energy, observation=obs,
        ).collect()
    }
    assert obs.get["subfps_dropped"] >= 1 and obs.get["pairs_avoided"] > 0
    assert got_s[(1, 3)] >= 13 and got_s[(1, 2)] == 5

    # the default length-proportional stub path runs end-to-end (the
    # seam every real deployment replaces; regressions must not hide
    # behind the custom energy_fn the planted cases use)
    stub_rows = audio_shared_segment_pairs(
        media, frame_bytes=16, bands=BA, min_run=4, window=4
    ).collect()
    assert isinstance(stub_rows, list)  # identical clips 1/3 diverge
    from git_log_to_sqlite_spark.operators import audio_frame_fingerprints

    n_words = audio_frame_fingerprints(media, frame_bytes=16, bands=BA).count()
    assert n_words > 0

    from git_log_to_sqlite_spark.operators import release_caches

    release_caches()  # the capped runs pin the window table
    with pytest.raises(ValueError, match="min_run"):
        audio_shared_segment_pairs(media, min_run=0)
    with pytest.raises(ValueError, match="must be >= window"):
        audio_shared_segment_pairs(media, min_run=2, window=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        audio_shared_segment_pairs(media, max_df=2, max_df_quantile=0.9)
    with pytest.raises(ValueError, match="requires a cap"):
        audio_shared_segment_pairs(media, observation=Observation())
    with pytest.raises(ValueError, match="frame_bytes"):
        audio_shared_segment_pairs(media, frame_bytes=0)


def test_hamming_probe_matches_brute_force(spark):
    """The probe-shaped Hamming lookup must equal a brute-force probe
    x corpus scan at every max_hamming (pigeonhole exactness across
    two sides), cap the CORPUS side with probe-shape telemetry
    (rows_dropped), and reject colliding id names."""
    import random

    from pyspark.sql import Observation

    from git_log_to_sqlite_spark.operators import hamming_probe

    rng = random.Random(41)
    corpus_sigs = [(i, rng.getrandbits(32)) for i in range(60)]
    # probes: two planted near-matches + copies + randoms
    probe_sigs = [
        (100, corpus_sigs[3][1]),                    # exact
        (101, corpus_sigs[7][1] ^ 0b101),            # hamming 2
        (102, corpus_sigs[7][1] ^ 0b10011),          # hamming 3
        (103, rng.getrandbits(32)),
        (104, rng.getrandbits(32)),
    ]
    corpus = spark.createDataFrame(corpus_sigs, "cid long, sig long")
    probe = spark.createDataFrame(probe_sigs, "pid long, sig long")

    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    want = {
        (p, c, ham(sp, sc))
        for p, sp in probe_sigs
        for c, sc in corpus_sigs
        if ham(sp, sc) <= 3
    }
    got = {
        tuple(r)
        for r in hamming_probe(
            probe, corpus, "pid", "cid", "sig", bits=32, bands=4, max_hamming=3
        ).collect()
    }
    assert got == want and (100, 3, 0) in got and (101, 7, 2) in got

    # corpus-side valve: a degenerate all-zero corpus bucket is capped
    # with probe-shape telemetry; the planted matches elsewhere survive
    degen = corpus.unionByName(
        spark.createDataFrame([(i, 0) for i in range(500, 540)], "cid long, sig long")
    )
    obs = Observation()
    got_d = {
        tuple(r)
        for r in hamming_probe(
            probe, degen, "pid", "cid", "sig", bits=32, bands=4, max_hamming=3,
            max_band_size=10, observation=obs,
        ).collect()
    }
    m = obs.get
    assert m["bands_dropped"] >= 1 and m["rows_dropped"] >= 40
    assert (100, 3, 0) in got_d and (101, 7, 2) in got_d
    from git_log_to_sqlite_spark.operators import release_caches

    release_caches()  # the capped run pins the valve's hot set

    with pytest.raises(ValueError, match="disjoint"):
        hamming_probe(probe, corpus, "sig", "sig", "sig", bits=32)
    with pytest.raises(ValueError, match="requires a cap"):
        hamming_probe(
            probe, corpus, "pid", "cid", "sig", bits=32, observation=Observation()
        )


def test_image_in_video_frames_planted(spark):
    """Cross-modal content lookup: a still planted verbatim in one
    clip and as a 2-bit variant in another must surface as (still_id,
    media_id, frame_no) matches exactly as a brute-force scan over
    the frame hashes says — the shared grid hash makes a still and a
    frame of the same content hash identically by construction."""
    import random

    from git_log_to_sqlite_spark.operators import image_in_video_frames
    from git_log_to_sqlite_spark.operators.multimodal import _grid_dhash

    rows_, cols = 6, 10
    W = cols + 1
    fb = rows_ * W
    rng = random.Random(47)

    def frame():
        return bytes(rng.choice([40, 200]) for _ in range(fb))

    target = frame()
    variant = bytearray(target)
    # flip the final comparison of rows 0 and 1 -> exactly 2 bits
    for r in (0, 1):
        prev, last = variant[r * W + W - 2], variant[r * W + W - 1]
        variant[r * W + W - 1] = 30 if last > prev else 210
    variant = bytes(variant)

    clips = {
        1: [frame(), frame(), target, frame()],
        2: [frame(), variant, frame()],
        3: [frame() for _ in range(4)],
    }
    media = spark.createDataFrame(
        [(i, b"".join(fs), "video/raw", fb * len(fs)) for i, fs in clips.items()],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    stills = spark.createDataFrame(
        [(900, target, "image/raw", fb), (901, frame(), "image/raw", fb)],
        "media_id long, payload binary, mime_type string, byte_len int",
    )
    grid_fn = lambda p, r, c: p[: r * (c + 1)]  # noqa: E731

    still_sigs = {900: _grid_dhash(target, rows_, cols)}
    still_sigs[901] = _grid_dhash(
        stills.filter(F.col("media_id") == 901).collect()[0]["payload"],
        rows_, cols,
    )
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    want = {
        (s, m_, f, ham(ssig, _grid_dhash(fr, rows_, cols)))
        for s, ssig in still_sigs.items()
        for m_, fs in clips.items()
        for f, fr in enumerate(fs)
        if ham(ssig, _grid_dhash(fr, rows_, cols)) <= 3
    }
    got = {
        tuple(r)
        for r in image_in_video_frames(
            stills, media, rows_, cols, frame_bytes=fb, max_hamming=3,
            grid_fn=grid_fn,
        ).collect()
    }
    assert got == want
    assert (900, 1, 2, 0) in got and (900, 2, 1, 2) in got
    assert not any(t[0] == 901 for t in got)


def test_hamming_store_multi_day_ingest(spark, tmp_path):
    """The Hamming family's daily-ingest loop (HammingStore — one
    store class for every <= 60-bit modality): three days of signature
    batches must (a) resolve a day-2 near-copy of a day-1 item to the
    day-1 id; (b) resolve a day-3 copy of the day-2 DUPLICATE to the
    day-1 original — proving flagged items' signatures are never
    appended; (c) pick the closest match with deterministic ties;
    (d) grow the store by exactly the novel items; (e) fail fast on
    an un-bootstrapped path."""
    import random

    from git_log_to_sqlite_spark.operators import HammingStore

    rng = random.Random(53)
    base = {i: rng.getrandbits(60) for i in range(20)}
    store = HammingStore(spark, str(tmp_path / "hstore"), id_col="mid",
                         sig_col="sig", bits=60)
    assert not store.exists()
    with pytest.raises(FileNotFoundError, match="bootstrap"):
        store.ingest(spark.createDataFrame([(1, 2)], "mid long, sig long"))
    store.bootstrap(
        spark.createDataFrame(list(base.items()), "mid long, sig long")
    )

    def ingest(rows):
        return {
            r["mid"]: (r["dup_of"], r["best_hamming"], r["is_new"])
            for r in store.ingest(
                spark.createDataFrame(rows, "mid long, sig long"),
                bands=4, max_hamming=3,
            ).collect()
        }

    # day 1: one novel item, one 2-bit near-copy of bootstrap item 7
    novel_sig = rng.getrandbits(60)
    d1 = ingest([(101, novel_sig), (102, base[7] ^ 0b101)])
    assert d1[101] == (None, None, 1)
    assert d1[102] == (7, 2, 0)

    # day 2: a 1-bit variant of day-1's NOVEL item -> resolves to 101
    # (the append is live); an exact copy of the day-1 DUPLICATE's
    # signature -> resolves to 7, NOT 102 (102 was never appended)
    d2 = ingest([(201, novel_sig ^ 0b1), (202, base[7] ^ 0b101)])
    assert d2[201] == (101, 1, 0)
    assert d2[202] == (7, 2, 0)

    # day 3: equidistant tie between bootstrap ids 3 and 4 (plant two
    # history sigs 2 bits from the probe) -> min (hamming, id) struct
    probe = rng.getrandbits(60)
    store2 = HammingStore(spark, str(tmp_path / "hstore2"), id_col="mid",
                          sig_col="sig", bits=60)
    store2.bootstrap(spark.createDataFrame(
        [(3, probe ^ 0b11), (4, probe ^ 0b1100), (9, rng.getrandbits(60))],
        "mid long, sig long",
    ))
    [r] = store2.ingest(
        spark.createDataFrame([(301, probe)], "mid long, sig long"),
        bands=4, max_hamming=3,
    ).collect()
    assert (r["dup_of"], r["best_hamming"]) == (3, 2)

    # store grew by exactly the novel items: 20 bootstrap + 101
    assert store.read().count() == 21
    assert {r["mid"] for r in store.read().collect()} == set(base) | {101}


def test_band_stores_salt_passthrough_row_identical(spark, tmp_path):
    """SignatureStore.ingest / HammingStore.ingest thread the probe-
    shaped salt knobs through to their operators (history side salted,
    batch replicated — the SemanticStore precedent) with bit-identical
    annotations AND store growth in uniform, targeted, and runtime-
    empty-hot-set modes; bad salt args fail before any pin."""
    import random

    from git_log_to_sqlite_spark.operators import HammingStore, SignatureStore
    from git_log_to_sqlite_spark.operators.caching import (
        _LIVE,
        release_caches,
    )

    rng = random.Random(7)
    base = [(i, rng.getrandbits(60)) for i in range(12)]
    # hot history bucket: identical signatures — every band collides
    hot = [(100 + i, base[0][1]) for i in range(10)]
    batch = [(500, base[0][1] ^ 0b1), (501, rng.getrandbits(60))]

    def run_h(path, **kw):
        st = HammingStore(spark, str(tmp_path / path), id_col="mid",
                          sig_col="sig", bits=60)
        st.bootstrap(spark.createDataFrame(base + hot, "mid long, sig long"))
        ann = sorted(map(tuple, st.ingest(
            spark.createDataFrame(batch, "mid long, sig long"),
            bands=4, max_hamming=3, **kw,
        ).collect()))
        return ann, sorted(r["mid"] for r in st.read().collect())

    plain = run_h("h_plain")
    assert plain[0][0][4] == 0  # the near-copy matched history
    assert run_h("h_u", salt_buckets=4) == plain
    assert run_h("h_t", salt_buckets=4, salt_min_bucket=5) == plain
    assert run_h("h_e", salt_buckets=4, salt_min_bucket=10**6) == plain

    viral_text = "viral boilerplate every copy identical " * 3
    docs = [(i, f"some shared prefix words document number {i} " * 2)
            for i in range(8)]
    viral = [(50 + i, viral_text) for i in range(8)]
    inc = [(900, viral_text), (901, "a genuinely brand new document")]

    def run_s(path, **kw):
        st = SignatureStore(spark, str(tmp_path / path), id_col="doc_id")
        st.bootstrap(
            spark.createDataFrame(docs + viral, "doc_id long, text string"),
            "text",
        )
        ann = sorted(map(tuple, st.ingest(
            spark.createDataFrame(inc, "doc_id long, text string"),
            "text", **kw,
        ).collect()))
        return ann, sorted(r["doc_id"] for r in st.read().collect())

    splain = run_s("s_plain")
    by_id = {t[0]: t for t in splain[0]}
    assert by_id[900][3] == 0 and by_id[901][3] == 1  # non-vacuous
    assert run_s("s_u", salt_buckets=4) == splain
    assert run_s("s_t", salt_buckets=4, salt_min_bucket=5) == splain

    # the no-leak assertion below is about THIS test's calls: clear
    # whatever pins earlier suite tests may have left (the sibling
    # salted tests' release-then-assert pattern — _LIVE is global)
    release_caches()
    stb = HammingStore(spark, str(tmp_path / "h_plain"), id_col="mid",
                       sig_col="sig", bits=60)
    sts = SignatureStore(spark, str(tmp_path / "s_plain"), id_col="doc_id")
    bdf = spark.createDataFrame(batch, "mid long, sig long")
    idf = spark.createDataFrame(inc, "doc_id long, text string")
    for call in (
        lambda: stb.ingest(bdf, salt_buckets=0),
        lambda: stb.ingest(bdf, salt_buckets=4, salt_min_bucket=1),
        lambda: sts.ingest(idf, "text", salt_min_bucket=10),
    ):
        with pytest.raises(ValueError, match="salt_"):
            call()
        assert _LIVE == []


def test_semantic_store_multi_day_ingest(spark, tmp_path):
    """The embedding modality's daily-ingest loop (SemanticStore —
    incremental SemDeDup): (a) a day-1 novel item is live history for
    day 2; (b) a copy of a day-1 DUPLICATE resolves to the bootstrap
    ORIGINAL (flagged vectors never append); (c) history blame WINS
    over batch blame; (d) the batch-internal upper-triangular rule
    still applies among store-missed rows (keep-farthest-from-
    centroid order, dup_source='batch'); (e) an assignment tie
    breaks to the lower cell; (f) the store grows by exactly the
    kept rows; (g) un-bootstrapped ingest fails fast."""
    import math

    import pytest

    from git_log_to_sqlite_spark.operators import SemanticStore

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    store = SemanticStore(spark, str(tmp_path / "semstore"),
                          threshold=0.98)
    assert not store.exists()
    with pytest.raises(FileNotFoundError, match="bootstrap"):
        store.ingest(spark.createDataFrame(
            [(1, at(0))], "vec_id long, embedding array<double>"))

    boot = [(10, at(0)), (11, at(30)), (20, at(180))]
    store.bootstrap(
        spark.createDataFrame(boot, "vec_id long, embedding array<double>"),
        cents,
    )
    assert {r["vec_id"] for r in store.read().collect()} == {10, 11, 20}

    def ingest(rows):
        return {
            r["vec_id"]: (r["dup_of"], r["dup_source"], r["is_kept"])
            for r in store.ingest(
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<double>")
            ).collect()
        }

    # day 1: novel; two history near-dups (one also batch-similar to
    # the other — history must win); a batch-internal pair with no
    # history hit (the farther-from-centroid member survives)
    d1 = ingest([(101, at(15)), (102, at(2)), (103, at(3)),
                 (104, at(44)), (105, at(46))])
    assert d1[101] == (None, None, 1)
    assert d1[102] == (10, "history", 0)
    assert d1[103] == (10, "history", 0)   # history beats batch-mate 102
    assert d1[105] == (None, None, 1)      # 46deg: farther from centroid
    assert d1[104] == (105, "batch", 0)    # intra-day drop, blames 105

    # day 2: day-1 novel is live; dup-of-a-dup resolves to the
    # ORIGINAL; the other cell matches too; an exact-tie assignment
    # (90deg equidistant) goes to the lower cell and is kept
    d2 = ingest([(201, at(16)), (202, at(2)), (203, at(179)),
                 (204, at(90))])
    assert d2[201] == (101, "history", 0)  # day-1 append is live
    assert d2[202] == (10, "history", 0)   # 102 never appended
    assert d2[203] == (20, "history", 0)
    assert d2[204] == (None, None, 1)
    [cell204] = [r["cell"] for r in store.read().collect()
                 if r["vec_id"] == 204]
    assert cell204 == 0                    # tie -> lower cell id

    assert {r["vec_id"] for r in store.read().collect()} == {
        10, 11, 20, 101, 105, 204
    }

    # (h) the IvfIndex.append guard contract: a wrong-dim or
    # null-element vector fails the job BEFORE the parquet commit —
    # zip_with would null-poison its distances into cell 0 and the
    # NULL similarities would annotate it kept, permanently corrupting
    # the kept table
    before = {r["vec_id"] for r in store.read().collect()}
    # [0.5]: under-length; [0.5, None]: right count of non-nulls would
    # NOT excuse it either way; [0.5, 0.5, None]: the subtle hole — an
    # OVER-length vector whose null padding leaves exactly dim
    # non-nulls must still fail (nn == dim alone would wave it in)
    for bad in ([0.5], [0.5, None], [0.5, 0.5, None]):
        with pytest.raises(Exception, match="quantizer dim"):
            store.ingest(spark.createDataFrame(
                [(999, bad)], "vec_id long, embedding array<double>"))
    assert {r["vec_id"] for r in store.read().collect()} == before

    # (i) compact() preserves the cell-partitioned layout: the store
    # stays readable, the next partitioned append still works, and
    # cell= directories survive (a flat rewrite would demote cell to
    # a data column and break the following read with conflicting
    # directory structures)
    import os

    store.compact(num_files=2)
    assert {r["vec_id"] for r in store.read().collect()} == before
    d3 = ingest([(401, at(60))])  # novel; proves post-compact appends
    assert d3[401] == (None, None, 1)
    assert {r["vec_id"] for r in store.read().collect()} == before | {401}
    assert any(
        e.startswith("cell=") for e in os.listdir(store.path)
    )


def test_fuzzy_decontaminate_flags_near_dup_leakage(spark):
    """Fuzzy decontamination (simhash distance vs the eval set): a
    verbatim eval copy and a lightly-perturbed copy must flag, clean
    documents must not, the annotation must equal a brute-force
    simhash Hamming scan (pigeonhole exactness on the signature
    distance), and all train rows survive the left join."""
    from git_log_to_sqlite_spark.operators import (
        fuzzy_decontaminate,
        release_caches,
        simhash,
    )

    evals = [
        (900, "the quick brown fox jumps over the lazy dog near the river"),
        (901, "pack my box with five dozen liquor jugs for the long trip"),
    ]
    train = [
        (1, evals[0][1]),                                    # verbatim copy
        (2, evals[1][1] + " today"),                         # light perturbation
        (3, "a completely different document about spark partitioning"),
        (4, "another unrelated text concerning shuffle exchanges and joins"),
        (5, None),  # token-less row: simhash emits NO signature for it,
        # so a signature-frame annotation spine would silently drop it —
        # the train table itself must be the spine
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(evals, "doc_id long, text string")

    got = {
        r["doc_id"]: (r["matched_evals"], r["best_hamming"], r["contaminated"])
        for r in fuzzy_decontaminate(
            tdf, edf, "doc_id", "text", bits=60, bands=6, max_hamming=5
        ).collect()
    }
    release_caches()
    assert set(got) == {1, 2, 3, 4, 5}  # every train row annotated
    assert got[5] == (0, None, 0)  # NULL text: clean, still present

    # brute-force reference over the same signatures
    tsig = {r["doc_id"]: r["simhash"]
            for r in simhash(tdf, "doc_id", "text", 60).collect()}
    esig = {r["doc_id"]: r["simhash"]
            for r in simhash(edf, "doc_id", "text", 60).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    for tid in tsig:
        hams = [ham(tsig[tid], s) for s in esig.values()]
        matches = [h for h in hams if h <= 5]
        want = (len(matches), min(matches) if matches else None,
                1 if matches else 0)
        assert got[tid] == want, (tid, got[tid], want)
    assert got[1][2] == 1 and got[1][1] == 0  # verbatim: hamming 0
    assert got[2][2] == 1 and 0 < got[2][1] <= 5  # perturbed copy flags
    assert got[3][2] == 0 and got[4][2] == 0


def test_image_dhash_validation_and_stub_plumbing(docs):
    """The 60-bit budget is enforced, and the default Pillow-or-stub
    grid path runs end-to-end on arbitrary binary payloads."""
    from git_log_to_sqlite_spark.operators.multimodal import image_dhash

    media = as_media(docs, "doc_id", "text", mime="text/plain")
    with pytest.raises(ValueError, match="60-bit"):
        image_dhash(media, rows=8, cols=8)
    rows = image_dhash(media).collect()
    assert len(rows) == media.count()
    assert all(0 <= r["dhash"] < (1 << 60) for r in rows)
    # audio stub plumbing end-to-end on the same payloads
    from git_log_to_sqlite_spark.operators.multimodal import audio_fingerprint

    arows = audio_fingerprint(media).collect()
    assert len(arows) == media.count()
    assert all(0 <= r["afp"] < (1 << 60) for r in arows)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this environment")
def test_image_near_dup_real_pil_recompressed_twin(spark):
    """Real-decoder path (runs where Pillow exists): a resized and
    re-encoded twin of a gradient image must land within Hamming 3 of
    the original — the decode-resize normalizes scale and encoding."""
    import io

    from PIL import Image

    from git_log_to_sqlite_spark.operators.multimodal import image_near_dup_pairs

    def png(img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    grad = Image.new("L", (64, 48))
    grad.putdata([(x * 4 + y) % 256 for y in range(48) for x in range(64)])
    twin = grad.resize((32, 24))  # rescaled + re-encoded
    flat = Image.new("L", (64, 48), color=200)  # unrelated
    media = spark.createDataFrame(
        [(1, png(grad)), (2, png(twin)), (3, png(flat))],
        "media_id long, payload binary",
    ).selectExpr("media_id", "payload", "'image/png' AS mime_type",
                 "CAST(length(payload) AS INT) AS byte_len")
    got = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in got and not any(3 in p for p in got)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this environment")
def test_multimodal_real_pil_decode(spark):
    """Real-decoder path: only runs where Pillow exists. Builds a tiny
    PNG in-process and checks the decoded dimensions round-trip."""
    import io

    from PIL import Image

    from git_log_to_sqlite_spark.operators.multimodal import resize_images

    buf = io.BytesIO()
    Image.new("L", (20, 10), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    media = as_media(df, "doc_id", "payload", mime="image/png")
    feats = extract_image_features(media).collect()
    assert (feats[0]["width"], feats[0]["height"]) == (20, 10)
    assert abs(feats[0]["mean_luma"] - 128 / 255) < 0.01
    resized = resize_images(media, width=8, height=8).collect()
    with Image.open(io.BytesIO(resized[0]["payload"])) as out:
        assert out.size == (8, 8)


def test_kmeans_recovers_planted_clusters(clustered_vectors):
    from git_log_to_sqlite_spark.operators import kmeans

    # interleave ids so the deterministic lowest-k init picks one seed
    # per planted cluster (callers control init quality by ordering)
    e = clustered_vectors.withColumn(
        "kid", (F.col("vec_id") % 25) * 4 + F.col("cluster")
    )
    assigned, centroids = kmeans(e, "kid", "embedding", k=4, max_iter=10)
    assert len(centroids) == 4 and len(centroids[0]) == 16
    rows = assigned.select("cluster", F.col("kid")).collect()
    from collections import Counter

    purity_num = 0
    for km_cluster in range(4):
        truth = Counter(r["kid"] % 4 for r in rows if r["cluster"] == km_cluster)
        if truth:
            purity_num += truth.most_common(1)[0][1]
    purity = purity_num / len(rows)
    assert purity > 0.9, f"kmeans purity too low on tight clusters: {purity:.2f}"


def test_kmeans_deterministic_across_runs(clustered_vectors):
    from git_log_to_sqlite_spark.operators import kmeans

    a, ca = kmeans(clustered_vectors, "vec_id", "embedding", k=3, max_iter=4)
    b, cb = kmeans(clustered_vectors, "vec_id", "embedding", k=3, max_iter=4)
    assert ca == cb
    ra = sorted((r["vec_id"], r["cluster"]) for r in a.collect())
    rb = sorted((r["vec_id"], r["cluster"]) for r in b.collect())
    assert ra == rb


def test_dsir_weights_match_python_reference(spark):
    """DSIR importance weights equal an independent pure-python
    implementation of the same math (hashed unigram+bigram bags,
    Laplace-smoothed log-ratio, total-mass normalization) on a toy
    corpus — and the raw document that parrots the target's phrasing
    outranks the off-domain ones. Also: the annotation spine is the
    raw table itself (a NULL-text doc annotates 0.0 and survives) and
    the result is partitioning-invariant."""
    import hashlib
    import math

    from git_log_to_sqlite_spark.operators import dsir_weights

    B = 64
    target = [(900, "theorem proof lemma proof theorem"),
              (901, "proof by induction on the lemma")]
    raw = [
        (1, "theorem proof lemma induction"),    # on-domain
        (2, "cat video funny cat compilation"),  # off-domain
        (3, "proof theorem proof"),              # on-domain, short
        (4, None),                               # feature-less
    ]

    def grams(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def feats(rows):
        out = {}
        for _id, text in rows:
            if text is None:
                continue
            for g in grams(text):
                f = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B
                out.setdefault(_id, {}).setdefault(f, 0)
                out[_id][f] += 1
        return out

    rf, tf = feats(raw), feats(target)
    rc, tc = {}, {}
    for d in rf.values():
        for f, c in d.items():
            rc[f] = rc.get(f, 0) + c
    for d in tf.values():
        for f, c in d.items():
            tc[f] = tc.get(f, 0) + c
    norm = math.log(sum(tc.values()) + B) - math.log(sum(rc.values()) + B)
    want = {}
    for _id, d in rf.items():
        w = sum(
            c * (math.log(tc.get(f, 0) + 1) - math.log(rc.get(f, 0) + 1))
            for f, c in d.items()
        ) - sum(d.values()) * norm
        want[_id] = round(w, 6)
    want[4] = 0.0

    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(rdf, tdf, "doc_id", "text",
                              buckets=B).collect()
    }
    assert got == pytest.approx(want, abs=1e-6)
    assert got[1] > got[2] and got[3] > got[2]  # on-domain outranks

    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(rdf.repartition(5), tdf, "doc_id", "text",
                              buckets=B).collect()
    }
    assert again == got


def test_dsir_select_null_id_never_wins(spark):
    """A NULL-id row (upstream outer-join junk) must not displace a
    legitimate winner: the clamp is NULL-PRESERVING (a plain least()
    SKIPS null args, which would hand the junk row u = 1-2^-53 and a
    near-maximal Gumbel ~36.7), so its score stays NULL and sorts
    last under the descending selection."""
    from git_log_to_sqlite_spark.operators import dsir_select

    raw = spark.createDataFrame(
        [(1, "theorem proof"), (2, "cat video"), (None, "theorem proof")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(900, "theorem proof lemma")], "doc_id long, text string"
    )
    sel = dsir_select(raw, tgt, "doc_id", "text", n=2, buckets=64).collect()
    assert {r["doc_id"] for r in sel} == {1, 2}  # NULL id sorted out


def test_dsir_select_matches_duckdb_twin(spark, oracle_sf_dir):
    """Cross-engine determinism of the FULL DSIR selection (weights +
    md5-Gumbel top-n) — pre-staging this operator's round-12 gate
    row: DuckDB reproduces every bucket id (the shared 15-hex md5
    idiom), every Laplace log-ratio (CAST AS DOUBLE before ln), the
    6-dp weights, and the Gumbel-perturbed winner ORDER exactly."""
    from git_log_to_sqlite_spark.operators import dsir_select

    from .oracle_harness import duck_connection

    B, MOD, N = 2048, 29, 50
    gram_sql = """unnest(list_concat(
        string_split(text, ' '),
        list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])
      )) AS g"""
    sql = f"""
    WITH raw AS (SELECT doc_id, text FROM documents WHERE doc_id % {MOD} <> 0),
    tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % {MOD} = 0),
    rg AS (SELECT doc_id, {gram_sql} FROM raw),
    tg AS (SELECT doc_id, {gram_sql} FROM tgt),
    rf AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT % {B} AS f,
                  COUNT(*) AS c
           FROM rg GROUP BY doc_id, f),
    tf AS (SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % {B} AS f,
                  COUNT(*) AS c
           FROM tg GROUP BY f),
    rcnt AS (SELECT f, SUM(c) AS rc FROM rf GROUP BY f),
    tcnt AS (SELECT f, SUM(c) AS tc FROM tf GROUP BY f),
    ratio AS (
      SELECT COALESCE(rcnt.f, tcnt.f) AS f,
             ln(CAST(COALESCE(tc, 0) + 1 AS DOUBLE))
               - ln(CAST(COALESCE(rc, 0) + 1 AS DOUBLE)) AS lr
      FROM rcnt FULL JOIN tcnt ON rcnt.f = tcnt.f),
    tot AS (
      SELECT ln(CAST((SELECT SUM(tc) FROM tcnt) + {B} AS DOUBLE))
               - ln(CAST((SELECT SUM(rc) FROM rcnt) + {B} AS DOUBLE)) AS norm),
    per_doc AS (
      SELECT rf.doc_id,
             SUM(rf.c * ratio.lr) - SUM(rf.c) * (SELECT norm FROM tot) AS w
      FROM rf JOIN ratio ON ratio.f = rf.f
      GROUP BY rf.doc_id),
    weights AS (
      SELECT raw.doc_id,
             ROUND(COALESCE(per_doc.w, 0.0), 6) AS log_weight
      FROM raw LEFT JOIN per_doc ON per_doc.doc_id = raw.doc_id)
    SELECT doc_id, log_weight,
           ROUND(log_weight
                 - ln(-ln(least(
                     (('0x' || substr(md5('dsir|' || doc_id::VARCHAR), 1, 15))::BIGINT + 1.0)
                       / 1152921504606846976.0,
                     1.0 - pow(2.0, -53)))), 6) AS score
    FROM weights
    ORDER BY score DESC, doc_id ASC LIMIT {N}
    """
    d = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    raw = d.filter(F.col("doc_id") % MOD != 0)
    tgt = d.filter(F.col("doc_id") % MOD == 0)
    got = [
        (r["doc_id"], r["log_weight"], r["score"])
        for r in dsir_select(raw, tgt, "doc_id", "text", n=N,
                             buckets=B).collect()
    ]
    con = duck_connection(oracle_sf_dir)
    try:
        want = [tuple(r) for r in con.execute(sql).fetchall()]
    finally:
        con.close()
    assert len(got) == N
    assert got == [
        (i, pytest.approx(w, abs=1e-6), pytest.approx(s, abs=1e-6))
        for i, w, s in want
    ]


def test_dsir_hash_fn_equivalence_shape(spark):
    """The production-hash contract behind the hash_fn knob
    (BASELINE.md names the md5-per-gram hashing as DSIR's dominant
    cost): xxhash64 assigns different buckets than md5, but the
    estimator's SHAPE survives any well-mixed feature hash — under
    BOTH hashes every target-look-alike raw doc outweighs every junk
    doc, all weights are finite (the Laplace smoothing guarantee is
    hash-independent), and the selection cardinality is identical.
    md5 stays the default, so the gated sample_dsir twin never sees
    the knob."""
    import pytest

    from git_log_to_sqlite_spark.operators import dsir_select, dsir_weights

    tgt_text = "the quick brown fox jumps over the lazy dog"
    rdf = spark.createDataFrame(
        [(i, tgt_text) for i in range(10)]
        + [(100 + i, f"zz{i} qq{i} ww{i} ee{i} rr{i} tt{i}")
           for i in range(10)],
        "doc_id long, text string",
    )
    tdf = spark.createDataFrame(
        [(i, tgt_text) for i in range(8)], "doc_id long, text string"
    )

    for hf in ("md5", "xxhash64"):
        w = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_weights(
                rdf, tdf, "doc_id", "text", buckets=4096, hash_fn=hf
            ).collect()
        }
        assert len(w) == 20
        assert all(v == v and abs(v) < 1e6 for v in w.values()), hf
        assert min(w[i] for i in range(10)) > \
            max(w[100 + i] for i in range(10)), hf
        sel = dsir_select(rdf, tdf, "doc_id", "text", n=5,
                          buckets=4096, hash_fn=hf).collect()
        assert len(sel) == 5
        assert all(r["score"] == r["score"] for r in sel), hf
    with pytest.raises(ValueError, match="hash_fn"):
        dsir_weights(rdf, tdf, "doc_id", "text", hash_fn="sha1").collect()


def test_weighted_reservoir_biases_toward_heavy_weights(spark):
    from git_log_to_sqlite_spark.operators import weighted_reservoir

    rows = [(i, 10.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "item_id long, w double")
    got = weighted_reservoir(df, "item_id", "w", k=30)
    ids = [r["item_id"] for r in got.collect()]
    assert len(ids) == 30
    heavy = sum(1 for i in ids if i < 100)
    # E[heavy] ≈ 27 of 30 at a 10:1 weight ratio; the sample is
    # deterministic (md5 keys), so this is a fixed, stable assertion
    assert heavy > 20, f"weighting not biasing selection: {heavy}/30 heavy"


def test_weighted_reservoir_deterministic_and_weight_gated(spark):
    from git_log_to_sqlite_spark.operators import weighted_reservoir

    rows = [(i, float(i % 5)) for i in range(50)]  # weight 0 -> excluded
    df = spark.createDataFrame(rows, "item_id long, w double")
    a = sorted(r["item_id"] for r in weighted_reservoir(df, "item_id", "w", k=10).collect())
    b = sorted(r["item_id"] for r in weighted_reservoir(df, "item_id", "w", k=10).collect())
    assert a == b
    assert all(i % 5 != 0 for i in a)  # zero-weight rows never sampled


def test_chunk_documents_coverage_and_overlap(spark):
    from git_log_to_sqlite_spark.operators import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks: starts 0,4,8
            (2, "a b c"),  # shorter than one chunk
            (3, " ".join(f"u{i}" for i in range(8))),  # exactly chunk_size
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_size=8, stride=4)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1 (10 toks): last start = ceil((10-8)/4)*4 = 4 -> two chunks;
    # doc 3 (exactly 8 toks): one chunk, no redundant tail subset
    assert {(d, c) for d, c in rows} == {(1, 0), (1, 1), (2, 0), (3, 0)}
    assert rows[(1, 0)]["chunk_text"] == " ".join(f"t{i}" for i in range(8))
    assert rows[(1, 1)]["chunk_text"] == " ".join(f"t{i}" for i in range(4, 10))
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert rows[(2, 0)]["chunk_tokens"] == 3
    # overlap: consecutive chunks share chunk_size - stride tokens
    assert rows[(1, 0)]["chunk_text"].split()[4:] == rows[(1, 1)]["chunk_text"].split()[:4]
    # every token of doc 1 appears in at least one chunk
    covered = {t for (d, _), r in rows.items() if d == 1 for t in r["chunk_text"].split()}
    assert covered == {f"t{i}" for i in range(10)}


def test_domain_mix_rates_and_determinism(spark):
    from git_log_to_sqlite_spark.operators import domain_mix

    rows = [(i, f"d{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, dom string")
    rates = {"d0": 1.0, "d1": 0.5, "d2": 0.0}
    a = domain_mix(df, "id", "dom", rates, default_rate=0.25)
    kept = {r["id"]: r["dom"] for r in a.collect()}
    by_dom = {d: sum(1 for v in kept.values() if v == d) for d in ("d0", "d1", "d2", "d3")}
    assert by_dom["d0"] == 500  # rate 1.0 keeps everything
    assert by_dom["d2"] == 0  # rate 0.0 keeps nothing
    assert 0.35 * 500 < by_dom["d1"] < 0.65 * 500  # binomial around 250
    assert 0.10 * 500 < by_dom["d3"] < 0.40 * 500  # default 0.25 applies
    # pure function of the data: second run identical
    b = {r["id"] for r in domain_mix(df, "id", "dom", rates, 0.25).collect()}
    assert set(kept) == b


def test_curate_corpus_retention_telemetry(spark, oracle_sf_dir):
    """The curation pipeline's Observation metrics must report the
    input -> post-filter -> post-dedup retention funnel from INSIDE the
    single plan execution (CollectMetrics, no stage re-runs), and the
    numbers must equal independently recomputed stage counts."""
    from git_log_to_sqlite_spark.plans.llm_ops import curate_corpus
    from git_log_to_sqlite_spark.plans.registry import table

    d = table(spark, oracle_sf_dir, "documents")
    telemetry = {}
    out = curate_corpus(d, telemetry=telemetry)
    packed_rows = out.count()  # the one action; metrics ride along

    got = {name: obs.get for name, obs in telemetry.items()}
    assert set(got) == {"input", "post_filter", "post_dedup"}

    toks = F.size(F.split(F.col("text"), " "))
    kept = d.filter(
        (F.col("lang") == "en")
        & F.col("n_chars").between(100, 20000)
        & (toks >= 20)
    )
    n_input = d.count()
    n_kept = kept.count()
    n_surv = kept.select(F.md5("text")).distinct().count()

    assert got["input"]["rows"] == n_input
    assert got["post_filter"]["rows"] == n_kept
    assert got["post_dedup"]["rows"] == n_surv == packed_rows
    # funnel is monotone and the dedup stage conserves nothing it shouldn't
    assert n_input >= n_kept >= n_surv > 0
    assert got["post_filter"]["tokens"] >= got["post_dedup"]["tokens"] > 0


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """Equivalence against an independent reference implementation:
    pandas.merge_asof computes the same nearest-prior/next semantics
    with a completely different algorithm (sorted merge scan vs the
    union + last(ignorenulls) window). 200 random queries x 200 random
    points across 8 keys, both directions, with and without tolerance;
    any drift in boundary handling (ties, exact-equal timestamps,
    out-of-tolerance nulling) fails loudly."""
    import pandas as pd

    from git_log_to_sqlite_spark.operators.asof import asof_join

    rng = random.Random(20240813)
    n_keys = 8
    left_rows = [
        (i, rng.randrange(n_keys), rng.randrange(0, 100_000))
        for i in range(200)
    ]
    right_rows = [
        (j, rng.randrange(n_keys), rng.randrange(0, 100_000), float(j))
        for j in range(200)
    ]
    # force some exact-equal timestamps across sides (boundary case)
    for k in range(20):
        qid, key, ts = left_rows[k]
        right_rows[k] = (right_rows[k][0], key, ts, right_rows[k][3])

    left = spark.createDataFrame(left_rows, "qid long, k long, ts long")
    right = spark.createDataFrame(right_rows, "rid long, k long, rts long, val double")

    for direction in ("backward", "forward"):
        for tol in (None, 5_000.0):
            got = asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                value_cols=["val"], tie_col="rid",
                direction=direction, tolerance_seconds=tol,
            )
            got_map = {r["qid"]: r["val_asof"] for r in got.collect()}

            lpd = pd.DataFrame(left_rows, columns=["qid", "k", "ts"]).sort_values("ts")
            # pandas breaks right-side ts ties by position: sort so the
            # LAST row at each (k, rts) is the max rid — the survivor
            # rule tie_col="rid" (highest wins) declares.
            rpd = (
                pd.DataFrame(right_rows, columns=["rid", "k", "rts", "val"])
                .sort_values(["rts", "rid"])
            )
            want_df = pd.merge_asof(
                lpd, rpd, left_on="ts", right_on="rts", by="k",
                direction=direction,
                tolerance=int(tol) if tol is not None else None,
            )
            want = {
                int(r.qid): (None if pd.isna(r.val) else float(r.val))
                for r in want_df.itertuples()
            }
            assert got_map == want, (direction, tol)


def test_operator_cache_lifecycle(spark, oracle_sf_dir):
    """The pin() registry contract: a repeated invocation with the same
    input must NOT re-persist (no "already cached" warning, no registry
    growth — the planner substitutes the live InMemoryRelation by
    sameResult), and release_caches() frees exactly the pinned frames."""
    from git_log_to_sqlite_spark.operators import caching, release_caches
    from git_log_to_sqlite_spark.operators.text import tfidf_topk

    spark.catalog.clearCache()
    release_caches()
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")

    ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, max_df_quantile=0.92
    ).count()
    n_first = len(caching._LIVE)
    # per-doc sizes + per-shingle counts + pinned hot-shingle set
    # (round 9: _hot_key_set pins the filtered hot set) + postings
    assert n_first == 4
    ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, max_df_quantile=0.92
    ).count()
    assert len(caching._LIVE) == n_first  # equivalent plan -> no new pin

    minhash_lsh_pairs(docs, "doc_id", "text").count()
    assert len(caching._LIVE) == n_first + 1  # + signature table
    tfidf_topk(docs, "doc_id", "text", k=3).count()
    assert len(caching._LIVE) == n_first + 2  # + tf table

    assert release_caches() == n_first + 2
    assert caching._LIVE == []
    # everything unpersisted: the session cache is empty again
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()


def test_cache_scope_releases_only_inner_pins(spark, oracle_sf_dir):
    """cache_scope() frees frames pinned inside the with-body while
    leaving earlier pins (a caller's own operator results) live."""
    from git_log_to_sqlite_spark.operators import cache_scope, caching, release_caches

    spark.catalog.clearCache()
    release_caches()
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")

    minhash_lsh_pairs(docs, "doc_id", "text").count()
    outer = list(caching._LIVE)
    assert outer
    with cache_scope():
        ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.2, max_df_quantile=0.92
        ).count()
        assert len(caching._LIVE) > len(outer)
    assert caching._LIVE == outer  # inner pins released, outer intact
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in outer)
    release_caches()


def test_pin_hash_gated_dedup(spark):
    """pin()'s duplicate check is semanticHash-gated (round 16): a
    same-result re-pin still short-circuits (no duplicate registry
    entry, second frame returned unpersisted), a different plan still
    registers, and every registered entry memoizes its hash so later
    pin() calls compare Python ints instead of running a JVM
    sameResult per live entry."""
    from git_log_to_sqlite_spark.operators import caching
    from git_log_to_sqlite_spark.operators.caching import pin, release_caches

    spark.catalog.clearCache()
    release_caches()
    a = pin(spark.range(100).selectExpr("id", "id * 2 AS dbl"))
    assert len(caching._LIVE) == 1
    assert isinstance(getattr(a, "_pin_semhash", None), int)
    dup = pin(spark.range(100).selectExpr("id", "id * 2 AS dbl"))
    assert len(caching._LIVE) == 1  # sameResult short-circuit held
    # the short-circuited frame was returned WITHOUT registering (its
    # storageLevel still reads the cached level — CacheManager resolves
    # by plan equivalence — so the registry length and the absent
    # memo attribute are the short-circuit's observable markers)
    assert "_pin_semhash" not in dup.__dict__
    other = pin(spark.range(100).selectExpr("id", "id * 3 AS tpl"))
    assert len(caching._LIVE) == 2
    assert isinstance(getattr(other, "_pin_semhash", None), int)
    release_caches()


# ----------------------------------------------------------------------
# Round 7: decontamination, repetition quality, token-budget sampling
# ----------------------------------------------------------------------


def test_decontaminate_planted_leak(spark):
    from git_log_to_sqlite_spark.operators import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains bench 4-grams "alpha beta gamma delta" and
            # "beta gamma delta epsilon" verbatim -> 2 shared grams
            (1, "xx alpha beta gamma delta epsilon yy"),
            # clean: shares tokens but no 4-gram
            (2, "alpha beta xx gamma delta yy epsilon zeta"),
            # too short for any 4-gram
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}, "every train row must be annotated"
    assert out[1]["contaminated"] == 1 and out[1]["shared_ngrams"] == 2
    assert out[2]["contaminated"] == 0 and out[2]["shared_ngrams"] == 0
    assert out[3]["contaminated"] == 0 and out[3]["shared_ngrams"] == 0


def test_decontaminate_counts_distinct_grams_once(spark):
    """A train doc repeating the same leaked 4-gram counts it ONCE
    (shingles are per-document distinct)."""
    from git_log_to_sqlite_spark.operators import decontaminate

    bench = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a b c d x a b c d")], "doc_id long, text string"
    )
    row = decontaminate(train, bench, "doc_id", "text").collect()[0]
    assert row["shared_ngrams"] == 1 and row["contaminated"] == 1


def test_repetition_stats_hand_computed(spark):
    from git_log_to_sqlite_spark.operators import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b"),  # dup 2/4; bigrams [a a, a a, a b] top 2/3
            (2, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # all distinct
            (3, "solo"),  # 1 token: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["dup_token_frac"] == 0.5
    assert out[1]["top_bigram_frac"] == round(2 / 3, 6)
    assert out[1]["passes_repetition_gate"] == 0  # top 2/3 > 1/5
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == round(1 / 9, 6)
    assert out[2]["passes_repetition_gate"] == 1
    assert out[3]["dup_token_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["passes_repetition_gate"] == 1


def test_token_budget_monotone_deterministic_and_bounded(spark):
    from git_log_to_sqlite_spark.operators import token_budget_sample

    random.seed(7)
    rows = [
        (i, f"dom{i % 3}", random.randint(50, 400)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, dom string, w long")

    def keep_ids(budget):
        out = token_budget_sample(df, "id", "w", budget, domain_col="dom")
        return {r["id"]: r["cum_before"] for r in out.collect()}

    small, big = keep_ids(1000), keep_ids(4000)
    assert set(small) <= set(big), "budget fill must be monotone in the budget"
    assert small == keep_ids(1000), "md5 coin: exactly reproducible"
    # admission bound: everything admitted started under budget, and
    # every non-empty domain admits at least its first row
    assert all(c < 1000 for c in small.values())
    doms = {r["dom"] for r in df.select("dom").distinct().collect()}
    kept_doms = {
        r["dom"]
        for r in token_budget_sample(df, "id", "w", 1, domain_col="dom")
        .select("dom").distinct().collect()
    }
    assert kept_doms == doms, "budget 1 still admits one row per domain"


def test_incremental_dedup_best_match_column(spark):
    """best_match=True adds the history id that ACHIEVES best_est
    (ties to the smaller id) — distinct from dup_of, which is the
    min-id bookkeeping survivor and need not be the best match."""
    from git_log_to_sqlite_spark.operators import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog tonight again"
    partial = "the quick brown fox jumps over a sleepy cat this morning ok"
    history = spark.createDataFrame(
        [(5, partial), (20, base), (21, base)],
        "doc_id long, text string",
    )
    increment = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    out = incremental_minhash_dedup(
        history, increment, "doc_id", "text", best_match=True
    ).collect()
    row = {r["doc_id"]: r for r in out}[100]
    assert row["best_est"] == 1.0  # exact copies agree on every hash
    assert row["best_match_id"] == 20  # est tie between 20/21 -> min id
    if row["dup_of"] == 5:  # partial doc cleared min_agree
        assert row["dup_of"] != row["best_match_id"]
    # default output keeps the original 4-column schema
    cols = incremental_minhash_dedup(
        history, increment, "doc_id", "text"
    ).columns
    assert cols == ["doc_id", "dup_of", "best_est", "is_new"]


def test_incremental_dedup_history_signatures_equivalent(spark, oracle_sf_dir):
    """Passing the precomputed signature table (the SignatureStore
    read shape) must reproduce the text-derived result exactly, and
    the history/history_signatures arguments are mutually exclusive
    and jointly required."""
    from git_log_to_sqlite_spark.operators import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    history = docs.filter(F.col("doc_id") % 5 != 0)
    increment = docs.filter(F.col("doc_id") % 5 == 0)
    base = {
        tuple(r)
        for r in incremental_minhash_dedup(
            history, increment, "doc_id", "text"
        ).collect()
    }
    sigs = minhash_signatures(history, "doc_id", "text")
    got = {
        tuple(r)
        for r in incremental_minhash_dedup(
            None, increment, "doc_id", "text", history_signatures=sigs
        ).collect()
    }
    assert got == base and len(base) > 0

    with pytest.raises(ValueError, match="exactly one"):
        incremental_minhash_dedup(None, increment, "doc_id", "text")
    with pytest.raises(ValueError, match="exactly one"):
        incremental_minhash_dedup(
            history, increment, "doc_id", "text", history_signatures=sigs
        )
    with pytest.raises(ValueError, match="missing columns"):
        incremental_minhash_dedup(
            None, increment, "doc_id", "text",
            history_signatures=sigs.drop("mh_3"),
        )


def test_incremental_dedup_planted_near_dup(spark):
    """A near-dup of a history doc in the increment must resolve to
    that history doc; a novel doc must come back is_new=1; history
    docs that duplicate EACH OTHER must not surface (history never
    self-joins)."""
    from git_log_to_sqlite_spark.operators import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog tonight again"
    history = spark.createDataFrame(
        [
            (10, base),
            (11, base),  # exact dup INSIDE history — must stay invisible
            (12, "an entirely different historical document about engines"),
        ],
        "doc_id long, text string",
    )
    increment = spark.createDataFrame(
        [
            (100, base),  # exact dup of history 10/11
            (101, "completely novel content that matches nothing at all here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in incremental_minhash_dedup(
            history, increment, "doc_id", "text"
        ).collect()
    }
    assert set(out) == {100, 101}, "one row per increment doc, nothing else"
    assert out[100]["is_new"] == 0 and out[100]["dup_of"] == 10  # min hist id
    assert out[100]["best_est"] == 1.0
    assert out[101]["is_new"] == 1 and out[101]["dup_of"] is None


def test_incremental_dedup_agrees_with_batch_pairs(spark, oracle_sf_dir):
    """Cross-validation on the real corpus: the incremental result must
    be exactly the per-increment-doc reduction of the BATCH operator's
    cross-side pairs — same banding, same agreement estimate, so for
    every increment doc: is_new=0 iff some batch pair links it to
    history, dup_of = min such history id, best_est = max agreement."""
    from git_log_to_sqlite_spark.operators import incremental_minhash_dedup

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    history = docs.filter(F.col("doc_id") % 5 != 0)
    increment = docs.filter(F.col("doc_id") % 5 == 0)

    inc_rows = {
        r["doc_id"]: r
        for r in incremental_minhash_dedup(
            history, increment, "doc_id", "text"
        ).collect()
    }
    batch = minhash_lsh_pairs(docs, "doc_id", "text").collect()
    cross: dict[int, list] = {}
    for r in batch:
        a, b = r["id_a"], r["id_b"]
        if a % 5 == 0 and b % 5 != 0:
            cross.setdefault(a, []).append((b, r["est_jaccard"]))
        elif b % 5 == 0 and a % 5 != 0:
            cross.setdefault(b, []).append((a, r["est_jaccard"]))

    assert set(inc_rows) == {r["doc_id"] for r in increment.collect()}
    for doc_id, row in inc_rows.items():
        if doc_id in cross:
            hist_ids = [h for h, _ in cross[doc_id]]
            ests = [e for _, e in cross[doc_id]]
            assert row["is_new"] == 0, doc_id
            assert row["dup_of"] == min(hist_ids), doc_id
            assert row["best_est"] == max(ests), doc_id
        else:
            assert row["is_new"] == 1 and row["dup_of"] is None, doc_id
    assert any(r["is_new"] == 0 for r in inc_rows.values())  # non-vacuous


def test_pretrain_corpus_two_phase_mix_agrees(spark, oracle_sf_dir):
    """mix_via='two_phase' must reproduce the default composite output
    byte-for-byte — on the real corpus AND on a mega-domain synthetic
    (90% of docs in one source, the shape where the per-source window
    would funnel one task) — so the flagship is mega-domain-safe end
    to end without forking the admission logic."""
    import random as _random

    from git_log_to_sqlite_spark.plans.llm_ops import pretrain_corpus
    from git_log_to_sqlite_spark.plans.registry import table

    d = table(spark, oracle_sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    corpus = d.filter(F.col("doc_id") % 29 != 0)

    _random.seed(31)
    # vocabulary wide enough that random 60-token docs pass the
    # distinct-token quality gate (needs >= 30% distinct tokens)
    words = [f"w{j}" for j in range(400)]
    rows = [
        (
            i,
            "mega" if i % 10 else f"tail{i % 7}",
            " ".join(_random.choice(words) for _ in range(60)),
        )
        for i in range(500)
    ]
    skewed = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).withColumn("n_chars", F.length("text"))
    skew_bench = skewed.filter(F.col("doc_id") % 97 == 0)
    skew_corpus = skewed.filter(F.col("doc_id") % 97 != 0)

    for c, b in ((corpus, bench), (skew_corpus, skew_bench)):
        base = {tuple(r) for r in pretrain_corpus(c, b).collect()}
        two = {
            tuple(r)
            for r in pretrain_corpus(c, b, mix_via="two_phase").collect()
        }
        assert two == base and len(base) > 0


def test_pretrain_corpus_retention_telemetry(spark, oracle_sf_dir):
    """The pre-training pipeline's Observation funnel (input ->
    post_quality -> post_decontam -> post_mix) must equal
    independently recomputed stage counts from the standalone
    operators — one execution, no stage re-runs."""
    from git_log_to_sqlite_spark.operators import (
        decontaminate,
        token_budget_sample,
    )
    from git_log_to_sqlite_spark.operators.text import repetition_gate
    from git_log_to_sqlite_spark.plans.llm_ops import pretrain_corpus
    from git_log_to_sqlite_spark.plans.registry import table

    d = table(spark, oracle_sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    corpus = d.filter(F.col("doc_id") % 29 != 0)

    telemetry = {}
    out = pretrain_corpus(corpus, bench, telemetry=telemetry)
    packed_rows = out.count()  # the one action; metrics ride along
    got = {name: obs.get for name, obs in telemetry.items()}
    assert set(got) == {"input", "post_quality", "post_decontam", "post_mix"}

    quality = corpus.filter(
        repetition_gate(F.col("text")) & F.col("n_chars").between(50, 20000)
    )
    n_quality = quality.count()
    clean = (
        decontaminate(quality, bench, "doc_id", "text", ngram_n=4)
        .filter("contaminated = 0")
        .join(quality, "doc_id")
    )
    n_clean = clean.count()
    surv = clean.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(source, doc_id)").alias("source"),
        F.min("n_chars").alias("n_chars"),
    )
    n_mix = token_budget_sample(
        surv, "doc_id", "n_chars", 4000, domain_col="source"
    ).count()

    assert got["input"]["rows"] == corpus.count()
    assert got["post_quality"]["rows"] == n_quality
    assert got["post_decontam"]["rows"] == n_clean
    assert got["post_mix"]["rows"] == n_mix == packed_rows
    assert corpus.count() >= n_quality >= n_clean >= n_mix > 0


def test_decontaminate_empty_benchmark_flags_nothing(spark):
    """An empty benchmark (or one with only too-short docs) must yield
    zero contamination — not an error — since its gram set is empty."""
    from git_log_to_sqlite_spark.operators import decontaminate

    bench = spark.createDataFrame([], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    out = decontaminate(train, bench, "doc_id", "text").collect()
    assert {r["doc_id"]: r["contaminated"] for r in out} == {1: 0, 2: 0}


def test_incremental_dedup_empty_sides(spark):
    """Empty increment -> empty result; empty history -> every
    increment doc is new. Both must run, not error."""
    from git_log_to_sqlite_spark.operators import incremental_minhash_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_minhash_dedup(docs, empty, "doc_id", "text").count() == 0
    out = incremental_minhash_dedup(empty, docs, "doc_id", "text").collect()
    assert len(out) == 2 and all(r["is_new"] == 1 for r in out)


def test_token_budget_empty_and_single_row(spark):
    from git_log_to_sqlite_spark.operators import token_budget_sample

    empty = spark.createDataFrame([], "id long, dom string, w long")
    assert token_budget_sample(empty, "id", "w", 100, domain_col="dom").count() == 0
    one = spark.createDataFrame([(1, "d", 999)], "id long, dom string, w long")
    rows = token_budget_sample(one, "id", "w", 1, domain_col="dom").collect()
    assert len(rows) == 1 and rows[0]["cum_before"] == 0


def test_repetition_stats_routes_agree(spark, oracle_sf_dir):
    """The zero-shuffle array route and the explode/aggregate scale
    route (for book-length docs) must produce byte-identical results on
    the real corpus AND on crafted edge docs."""
    from git_log_to_sqlite_spark.operators.text import repetition_stats

    edge = spark.createDataFrame(
        [(1, "a a a b"), (2, "solo"), (3, ""), (4, "x y x y x y")],
        "doc_id long, text string",
    )
    corpus = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    for df in (edge, corpus):
        a = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
        b = {
            r["doc_id"]: r
            for r in repetition_stats(df, "doc_id", "text", via="explode").collect()
        }
        assert set(a) == set(b)
        for k in a:
            assert a[k] == b[k], (k, a[k], b[k])


def test_cache_scope_survives_external_clearcache(spark):
    """Round-7 review fix: cache_scope tracks membership by identity,
    not a list-length mark — after an external clearCache() pruned dead
    pre-scope entries, frames pinned INSIDE the scope must still be
    released at scope exit (an index mark pointed below them and leaked
    the pins)."""
    from git_log_to_sqlite_spark.operators import cache_scope, pin, release_caches
    from git_log_to_sqlite_spark.operators import caching

    release_caches()
    a = pin(spark.range(10).selectExpr("id * 2 AS v"))
    a.count()
    spark.catalog.clearCache()  # a is now dead but still registered
    with cache_scope():
        b = pin(spark.range(10).selectExpr("id * 3 AS w"))
        b.count()
        assert b.storageLevel.useMemory or b.storageLevel.useDisk
    assert not (b.storageLevel.useMemory or b.storageLevel.useDisk), (
        "inner pin must be released at scope exit even after external clearCache"
    )
    assert all(id(d) != id(b) for d in caching._LIVE)
    release_caches()


def test_repetition_stats_rejects_unknown_route(spark):
    from git_log_to_sqlite_spark.operators.text import repetition_stats

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="via"):
        repetition_stats(df, "doc_id", "text", via="exploded")


def test_token_hofs_stay_capture_free(spark):
    """Regression guard for the round-7 O(n^2) finding: shingles() and
    the repetition bigram builder must stay zip_with-over-slices (array
    ARGUMENTS evaluate once) — an index-lambda over sequence() that
    references the tokens construction from inside the lambda re-runs
    it per element. The expression tree is inspected symbolically; a
    reintroduction of transform(sequence...) with a captured array
    flips this before it costs anyone a 60x slowdown."""
    from pyspark.sql import functions as F

    from git_log_to_sqlite_spark.operators.dedup import shingles
    from git_log_to_sqlite_spark.operators.text import repetition_parts

    sh_expr = str(shingles(F.split(F.col("t"), " "), 3)._jc).lower()
    assert "zip_with" in sh_expr
    # the index-lambda form contained "transform(sequence("
    assert "transform(sequence(" not in sh_expr.replace(" ", "")

    _, _, _, top = repetition_parts(F.col("t"))
    top_expr = str(top._jc).lower().replace(" ", "")
    assert "transform(sequence(" not in top_expr
    assert "aggregate(sort_array" in top_expr or "aggregate(sortarray" in top_expr


def test_token_budget_two_phase_route_agrees(spark, oracle_sf_dir):
    """The mega-domain two-phase route (global ordered prefix sum +
    per-domain offsets, no single-task-per-domain window) must produce
    the identical keep set and cum_before values as the window route,
    on the real corpus and on a skewed synthetic (one giant domain)."""
    from git_log_to_sqlite_spark.operators import token_budget_sample

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    random.seed(13)
    skewed = spark.createDataFrame(
        [(i, "big" if i % 10 else f"small{i % 7}", random.randint(10, 99))
         for i in range(400)],
        "doc_id long, source string, n_chars long",
    ).repartition(16)

    for df, budget in ((docs, 2000), (skewed, 500)):
        a = {
            r["doc_id"]: r["cum_before"]
            for r in token_budget_sample(
                df, "doc_id", "n_chars", budget, domain_col="source"
            ).collect()
        }
        b = {
            r["doc_id"]: r["cum_before"]
            for r in token_budget_sample(
                df, "doc_id", "n_chars", budget, domain_col="source",
                via="two_phase",
            ).collect()
        }
        assert a == b


def test_token_budget_routes_agree_on_fractional_weights(spark):
    """Fractional (double) weights: both routes must return the SAME
    cum_before type (double — neither route may cast) and values equal
    to float-sum tolerance (the two-phase global sum re-associates the
    additions, so exact equality is only guaranteed for integral
    weights; the admission SET must still match away from ulp-sized
    budget boundaries)."""
    from git_log_to_sqlite_spark.operators import token_budget_sample

    random.seed(29)
    df = spark.createDataFrame(
        [(i, f"s{i % 5}", random.uniform(0.5, 9.5)) for i in range(300)],
        "doc_id long, source string, w double",
    ).repartition(8)
    win = token_budget_sample(df, "doc_id", "w", 50, domain_col="source")
    two = token_budget_sample(
        df, "doc_id", "w", 50, domain_col="source", via="two_phase"
    )
    assert dict(win.dtypes)["cum_before"] == "double"
    assert dict(two.dtypes)["cum_before"] == "double"
    a = {r["doc_id"]: r["cum_before"] for r in win.collect()}
    b = {r["doc_id"]: r["cum_before"] for r in two.collect()}
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)


def test_recommend_salt_threshold_core_guards(spark):
    """The telemetry->knob loop (VERDICT r12 #3): the recommendation
    must flag a planted mega key, stay None on healthy corpora, and
    respect BOTH guards — spread (hot tail exists above the bulk) and
    straggler (that tail's largest key would actually serialize a
    task worth splitting). Parallelism is pinned to the driver's 32
    for the straggler arithmetic: the guard is DELIBERATELY
    parallelism-dependent (four equal hot buckets on four partitions
    are balanced, the same corpus on 32 is one straggler)."""
    from git_log_to_sqlite_spark.operators import recommend_salt_threshold
    from git_log_to_sqlite_spark.operators.dedup import _hot_key_set

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        # healthy: 200 keys x 3 members — nothing above 10 x p92
        healthy = spark.range(600).select((F.col("id") % 200).alias("k"))
        assert recommend_salt_threshold(healthy, ["k"]) is None
        # planted mega key (-1, 500 members) over the same bulk:
        # p92 of the repeated-key sizes = 3, so the recommendation is
        # 10 x 3 + 1 — and _hot_key_set armed with it (the knobs'
        # >= contract == the valve's > rec-1 spelling) captures
        # EXACTLY the planted key
        mega = healthy.unionByName(
            spark.range(500).select(F.lit(-1).alias("k"))
        )
        rec = recommend_salt_threshold(mega, ["k"])
        assert rec == 31
        hot = _hot_key_set(mega, ["k"], rec - 1, None)
        assert [r["k"] for r in hot.collect()] == [-1]
        # hot-but-light: a 41-member key over 10k 4-member keys —
        # the spread guard fires (41 > 10 x p92=4) but its 820 pairs
        # are no critical path next to 60k bulk pairs, so the
        # straggler guard vetoes the salt's replication cost
        light = (
            spark.range(40000)
            .select((F.col("id") % 10000).alias("k"))
            .unionByName(spark.range(41).select(F.lit(-1).alias("k")))
        )
        assert recommend_salt_threshold(light, ["k"]) is None
        # singleton-only corpus: no repeated keys at all -> None
        # (the empty-histogram path, coalesced zeros end to end)
        singles = spark.range(100).select(F.col("id").alias("k"))
        assert recommend_salt_threshold(singles, ["k"]) is None
        with pytest.raises(ValueError):
            recommend_salt_threshold(healthy, ["k"], spread=0)
        with pytest.raises(ValueError):
            recommend_salt_threshold(healthy, ["k"], straggler_factor=0.0)
        with pytest.raises(ValueError):
            recommend_salt_threshold(healthy, ["k"], salt_buckets=0)
        # salt_buckets pass-through (round-14 ADVICE): the armed join
        # shuffles to max(shuffle.partitions, salt_buckets), so the
        # straggler guard's even share must be computed at that SAME
        # count. The hot-but-light corpus above is vetoed at 32
        # partitions (820-pair max key vs a ~1.9k even share), but at
        # salt_buckets=256 the even share shrinks ~8x below the max
        # key's mass — the key IS the critical path at that
        # parallelism and the guard arms: rec = 10 x p92(=4) + 1.
        assert (
            recommend_salt_threshold(light, ["k"], salt_buckets=256) == 41
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_fixed_partition_count_announces_surprising_counts(spark, caplog):
    """_fixed_partition_count (round-14 ADVICE): the pigeonhole bump
    (salt_buckets above the configured shuffle partition count) must be
    announced on this module's own logger — the pinned repartition is
    AQE-exempt, so a silently widened count is otherwise invisible
    until stage metrics — while in-range bucket counts stay silent."""
    import logging

    from git_log_to_sqlite_spark.operators.skew import (
        _fixed_partition_count,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        logger = "git_log_to_sqlite_spark.operators.skew"
        with caplog.at_level(logging.WARNING, logger=logger):
            assert _fixed_partition_count(spark, 8) == 32
            assert not caplog.records
            assert _fixed_partition_count(spark, 128) == 128
        assert any(
            "pigeonhole" in r.getMessage() for r in caplog.records
        ), [r.getMessage() for r in caplog.records]
        # conf-unreadable AND bucket-bumped: exactly ONE line — the
        # fallback already reports the final bumped count, so the
        # pigeonhole warning is suppressed for it (no duplicate,
        # conflicting-sounding pair for the same call). The live conf
        # validates its values, so the managed-'auto' case is driven
        # through a stub exposing the two attributes the helper reads.
        caplog.clear()

        class _AutoConf:
            def get(self, key):
                return "auto"

        class _ManagedSession:
            conf = _AutoConf()
            sparkContext = spark.sparkContext

        big = spark.sparkContext.defaultParallelism + 64
        with caplog.at_level(logging.WARNING, logger=logger):
            assert _fixed_partition_count(_ManagedSession(), big) == big
        assert len(caplog.records) == 1, [
            r.getMessage() for r in caplog.records
        ]
        assert "unreadable" in caplog.records[0].getMessage()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_recommend_salt_knob_wrappers_and_noop_path(spark, oracle_sf_dir):
    """The public wrappers arm the knobs from a raw corpus: the band
    form flags the planted viral-boilerplate buckets on real sf docs
    and stays None without the plant; the cell form flags a planted
    mega cell and stays None on a balanced quantizer. The helpers are
    diagnostic-ONLY: the advised operators' default plans are
    byte-identical whether or not a recommendation ran (the no-op
    mutation check — no pins, no cache entries, no conf writes)."""
    import io
    import contextlib
    import math

    from git_log_to_sqlite_spark.operators import (
        minhash_lsh_pairs,
        recommend_salt_min_bucket,
        recommend_salt_min_cell,
        semantic_dedup,
    )
    from git_log_to_sqlite_spark.operators.dedup import (
        _band_keys,
        _hot_key_set,
        minhash_signatures,
    )

    def plan(df):
        import re

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # strip the session-monotonic counters (attribute exprIds,
        # plan/cache ids) — they advance on EVERY query the session
        # ran in between, so "byte-identical plan" means identical
        # after this normalization and nothing else may differ
        out = re.sub(r"#\d+|plan_id=\d+|cached \d+", "#", buf.getvalue())
        return re.sub(r"lambda [a-z]+_\d+", "lambda v", out)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        docs = spark.read.parquet(
            f"{oracle_sf_dir}/documents.parquet"
        ).select("doc_id", "text")
        assert recommend_salt_min_bucket(docs, "doc_id", "text") is None
        viral = spark.createDataFrame(
            [
                (100000 + i, "viral boilerplate shard every copy identical " * 3)
                for i in range(100)
            ],
            "doc_id long, text string",
        )
        corpus = docs.unionByName(viral)
        spark.catalog.clearCache()
        before = plan(minhash_lsh_pairs(corpus, "doc_id", "text"))
        spark.catalog.clearCache()
        rec_b = recommend_salt_min_bucket(corpus, "doc_id", "text")
        # the hot set the recommendation selects is exactly the
        # plant: one bucket per band of the identical-signature
        # family, every member a viral doc id
        assert rec_b is not None and 2 <= rec_b <= 100
        bands = _band_keys(
            minhash_signatures(corpus, "doc_id", "text", 8, 3),
            "doc_id", 8, 2,
        )
        hot = _hot_key_set(bands, ["band", "band_key"], rec_b - 1, None)
        assert hot.count() == 4  # 8 hashes / 2 rows -> 4 bands
        hot_members = bands.join(hot, ["band", "band_key"], "left_semi")
        assert hot_members.filter(F.col("doc_id") < 100000).count() == 0
        spark.catalog.clearCache()
        after = plan(minhash_lsh_pairs(corpus, "doc_id", "text"))
        assert before == after  # byte-identical default plan

        def at(deg):
            r = math.radians(deg)
            return [math.cos(r), math.sin(r)]

        cents = [at(360 * j / 20) for j in range(20)]
        balanced = spark.createDataFrame(
            [(i * 1000 + j, at(360 * j / 20)) for j in range(20) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        assert recommend_salt_min_cell(balanced, "embedding", cents) is None
        rows = [(i * 1000 + j, at(360 * j / 20)) for j in range(20) for i in range(3)]
        rows += [(90000 + i, at(0.001)) for i in range(400)]
        megacell = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        spark.catalog.clearCache()
        before = plan(
            semantic_dedup(megacell, "vec_id", "embedding", cents, threshold=0.9)
        )
        spark.catalog.clearCache()
        # 403-member cell over a 3-member bulk: 10 x p92(=3) + 1
        rec_c = recommend_salt_min_cell(megacell, "embedding", cents)
        assert rec_c == 31
        spark.catalog.clearCache()
        after = plan(
            semantic_dedup(megacell, "vec_id", "embedding", cents, threshold=0.9)
        )
        assert before == after  # byte-identical default plan
        # the loop end to end: feed the recommendation straight into
        # the knob it names — output row-identical to unsalted
        def rows(df_):
            return sorted(
                tuple("NaN" if isinstance(x, float) and x != x else x for x in r)
                for r in map(tuple, df_.collect())
            )

        plain = rows(
            semantic_dedup(megacell, "vec_id", "embedding", cents, threshold=0.9)
        )
        armed = rows(
            semantic_dedup(
                megacell, "vec_id", "embedding", cents, threshold=0.9,
                salt_buckets=4, salt_min_cell=rec_c,
            )
        )
        assert armed == plain
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.clearCache()


def test_append_assignment_never_shuffles_the_data(clustered_vectors, tmp_path):
    """IvfIndex.append's scale contract ('one codegen projection, no
    shuffle beyond the partitioned write'): the assignment plan's only
    exchanges move the k-row centroid model state (a SinglePartition
    collapse of k rows + its one-row broadcast) — the appended
    vectors themselves must never hash-shuffle, at any corpus size by
    construction. Measured on the executed plan the daily-ingest path
    builds."""
    from git_log_to_sqlite_spark.operators import IvfIndex
    from git_log_to_sqlite_spark.operators.clustering import (
        assign_clusters_table,
    )
    from git_log_to_sqlite_spark.operators.similarity import (
        _as_double,
        vnorm,
    )

    e = clustered_vectors
    idx = IvfIndex(e.sparkSession, str(tmp_path / "ivf"))
    idx.build(
        e.select("vec_id", "embedding"), k=4, max_iter=3,
        fit_sample_size=None,
    )
    cdf = e.sparkSession.read.parquet(f"{idx.path}/centroids")
    new = e.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("_cv"),
        vnorm(F.col("embedding")).alias("_cn"),
    )
    af = assign_clusters_table(new, "_cv", cdf)
    af.collect()
    plan = af._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln.strip() for ln in plan.splitlines() if "Exchange" in ln
    ]
    # the executed adaptive plan may render the k-row centroid branch
    # more than once; the CONTRACT is about exchange KINDS: every one
    # is either the model-state broadcast or the k-row SinglePartition
    # collapse feeding it — never a hash shuffle of the data
    assert exchanges, plan
    assert all(
        "BroadcastExchange" in ln or "SinglePartition" in ln
        for ln in exchanges
    ), exchanges
    assert not any("hashpartitioning" in ln for ln in exchanges), (
        "the appended data hash-shuffled — the O(increment) append "
        "contract is broken"
    )


# ---------------------------------------------------------------------------
# Subword tokenizer seam (round 15): equivalence-shaped tests on the
# stub — the Arrow seam must change the TRANSPORT of the count, never
# its value, so every assertion compares the mapInPandas path against
# the JVM codegen column computing the same segmentation.


def test_subword_seam_matches_jvm_bpe_ish_column(spark, oracle_sf_dir):
    """The default stub counts the exact BPE-ish segments token_counts
    derives JVM-side (the Python regex is kept character-identical to
    the JVM pattern), so the Arrow path must equal the codegen column
    on every document of the real corpus."""
    from git_log_to_sqlite_spark.operators import (
        subword_token_counts,
        token_counts,
    )

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    jvm = {
        r["doc_id"]: r["bpe_ish_tokens"]
        for r in token_counts(docs, "text").select("doc_id", "bpe_ish_tokens").collect()
    }
    seam = {
        r["doc_id"]: r["subword_tokens"]
        for r in subword_token_counts(docs, "doc_id", "text").collect()
    }
    assert seam == jvm and len(seam) > 0


def test_pack_token_shards_seam_row_identical_to_jvm_basis(spark, oracle_sf_dir):
    """pack_token_shards with a whitespace-counting tokenizer_fn through
    the Arrow seam is ROW-IDENTICAL to the default JVM whitespace
    basis — i.e. the knob swaps the count's transport, and the prefix
    sum / shard assignment downstream see exactly the same numbers.
    The Python counter mirrors F.split(text, ' ') semantics (split on
    single spaces, empties kept)."""
    from git_log_to_sqlite_spark.operators import pack_token_shards

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    base = sorted(
        tuple(r) for r in pack_token_shards(docs, "doc_id", "text").collect()
    )
    seam = sorted(
        tuple(r)
        for r in pack_token_shards(
            docs, "doc_id", "text",
            tokenizer_fn=lambda t: len(t.split(" ")) if t else 0,
        ).collect()
    )
    assert base == seam and len(base) > 0


def test_subword_seam_custom_tokenizer_and_empty_text(spark):
    """A custom tokenizer_fn (the real-tokenizer slot) is applied
    per-text with the documented null/empty -> 0 contract, and shard
    budgeting reflects ITS counts, not the whitespace basis."""
    from git_log_to_sqlite_spark.operators import (
        pack_token_shards,
        subword_token_counts,
    )

    rows = [(0, "aa bb"), (1, ""), (2, None), (3, "cc dd ee")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # "tokenizer" that charges 3 tokens per character — deterministic
    # and deliberately unlike any whitespace count
    fn = lambda t: 3 * len(t) if t else 0  # noqa: E731
    got = {
        r["doc_id"]: r["subword_tokens"]
        for r in subword_token_counts(df, "doc_id", "text", fn).collect()
    }
    assert got == {0: 15, 1: 0, 2: 0, 3: 24}
    packed = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_token_shards(df, "doc_id", "text", budget=16,
                                   tokenizer_fn=fn).collect()
    }
    # cum: 15, 15, 15, 39 -> shards floor((cum-1)/16): 0, 0, 0, 2
    assert packed == {0: (15, 0), 1: (0, 0), 2: (0, 0), 3: (24, 2)}


def test_pack_token_shards_default_basis_null_text_counts_zero(spark):
    """The DEFAULT (JVM whitespace) basis must count null text as 0
    tokens — the raw size(split(NULL)) would yield -1 and poison every
    downstream cum_tokens/shard_id with a negative (round-15 ADVICE).
    Empty string stays 1 (split('', ' ') = ['']): the whitespace-basis
    oracle semantics, deliberately unlike the seam's empty -> 0."""
    from git_log_to_sqlite_spark.operators import pack_token_shards

    rows = [(0, "aa bb"), (1, None), (2, ""), (3, "cc dd ee")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_token_shards(df, "doc_id", "text", budget=4).collect()
    }
    # n_tokens: 2, 0, 1, 3; cum: 2, 2, 3, 6 -> floor((cum-1)/4): 0,0,0,1
    assert packed == {0: (2, 0), 1: (0, 0), 2: (1, 0), 3: (3, 1)}
    assert all(n >= 0 and s >= 0 for n, s in packed.values())


def test_pack_token_shards_default_basis_dotted_columns(spark):
    """pack_token_shards' DEFAULT (JVM) basis must accept dotted/spaced
    column names like the tokenizer_fn path does — both bases route
    through the same safe-name aliasing (round-16 review note)."""
    from git_log_to_sqlite_spark.operators import pack_token_shards

    df = spark.createDataFrame(
        [(0, "aa bb"), (1, "cc dd ee")], ["doc id.v-1", "my.text"]
    )
    packed = {
        r["doc id.v-1"]: (r["n_tokens"], r["shard_id"])
        for r in pack_token_shards(
            df, "doc id.v-1", "my.text", budget=4
        ).collect()
    }
    assert packed == {0: (2, 0), 1: (3, 1)}


def test_subword_seam_id_column_needing_backticks(spark):
    """The mapInPandas schema is built as a StructType, not an
    interpolated DDL string — an id column whose name needs quoting
    (dots/spaces/hyphens) must pass through intact (round-15 ADVICE)."""
    from git_log_to_sqlite_spark.operators import subword_token_counts

    df = spark.createDataFrame(
        [(0, "aa bb"), (1, "cc")], ["doc id.v-1", "text"]
    )
    out = subword_token_counts(df, "doc id.v-1", "text")
    assert out.columns == ["doc id.v-1", "subword_tokens"]
    got = {r["doc id.v-1"]: r["subword_tokens"] for r in out.collect()}
    assert set(got) == {0, 1} and all(v > 0 for v in got.values())


def test_subword_seam_plan_is_single_scan_projection(spark, oracle_sf_dir):
    """The seam is a pure projection: one scan, zero exchanges — the
    tokenizer must never induce a shuffle (the scale contract that
    makes it affordable at corpus size)."""
    from git_log_to_sqlite_spark.operators import subword_token_counts

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    out = subword_token_counts(docs, "doc_id", "text")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# Large-k probe fan-out (round 15): the literal _nearest_cells
# expression inlines k x dims literal nodes, and its analysis+codegen
# cost GROWS with k (measured: ~28-50 s per 100-row batch at k=80 vs
# ~4 s at k=8) — so past _LITERAL_FANOUT_MAX cells IvfIndex switches
# to nearest_cells_table, the one-row broadcast centroid array. These
# pin the switch's correctness face: both forms are EQUAL, not just
# similar.


def test_nearest_cells_table_equals_literal_fanout(spark, oracle_sf_dir):
    """nearest_cells_table must reproduce the literal fan-out's ORDERED
    n_probe cell list per vector — same distances, same (distance,
    cell) struct tie-break — on the real embeddings table against a
    k=40 quantizer (above the switch threshold), in both the
    direct-fold and rounded dot-identity modes."""
    from git_log_to_sqlite_spark.operators import nearest_cells_table
    from git_log_to_sqlite_spark.operators.similarity import _nearest_cells

    emb = spark.read.parquet(f"{oracle_sf_dir}/embeddings.parquet").limit(200)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(40).collect()
    ]
    cdf = spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)], "cell int, centroid array<double>"
    )
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
    for rt in (None, 6):
        want = {
            (r["vec_id"], tuple(r["_pc"]))
            for r in base.select(
                "vec_id", _nearest_cells("_v", cents, 3, round_to=rt).alias("_pc")
            ).collect()
        }
        got = {
            (r["vec_id"], tuple(r["_probe_cells"]))
            for r in nearest_cells_table(base, "_v", cdf, 3, round_to=rt).collect()
        }
        assert got == want and len(got) == 200


def test_ivf_probe_table_path_equals_literal_path(clustered_vectors, tmp_path, monkeypatch):
    """An IvfIndex built and probed above the switch threshold (k=24 >
    _LITERAL_FANOUT_MAX) must return the IDENTICAL neighbor set as the
    literal path forced on the SAME index files — the fan-out form is
    an execution detail, never a semantics knob. Also pins that the
    table path still prunes: the probed-cell set collected from the
    fan-out bounds the scan exactly as before."""
    from git_log_to_sqlite_spark.operators import IvfIndex
    from git_log_to_sqlite_spark.operators import similarity as sim_mod

    spark = clustered_vectors.sparkSession
    idx = IvfIndex(spark, str(tmp_path / "ivf_bigk"))
    idx.build(clustered_vectors.select("vec_id", "embedding"), k=24, max_iter=5)
    probes = clustered_vectors.select("vec_id", "embedding").filter(
        F.col("vec_id") < 20
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", 16)
    table_path = rows(idx.probe(probes, n_probe=2, k=3, round_to=6))
    monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", 10_000)
    literal_path = rows(idx.probe(probes, n_probe=2, k=3, round_to=6))
    assert table_path == literal_path and len(table_path) > 0


def test_ivf_build_table_assignment_equals_literal(clustered_vectors, tmp_path, monkeypatch):
    """build() above the threshold assigns cells via the centroid
    TABLE; the resulting on-disk index (cell per vector) must be
    byte-identical to the literal assignment's on the same fitted
    quantizer."""
    from git_log_to_sqlite_spark.operators import IvfIndex
    from git_log_to_sqlite_spark.operators import similarity as sim_mod

    spark = clustered_vectors.sparkSession
    corpus = clustered_vectors.select("vec_id", "embedding")

    def cells(path, fanout_max):
        monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", fanout_max)
        idx = IvfIndex(spark, str(tmp_path / path))
        idx.build(corpus, k=24, max_iter=5)
        return sorted(
            (r["neighbor_id"], r["cell"])
            for r in spark.read.parquet(f"{tmp_path / path}/index").collect()
        )

    table_cells = cells("ivf_table", 16)
    literal_cells = cells("ivf_literal", 10_000)
    assert table_cells == literal_cells and len(table_cells) == 100


@pytest.mark.parametrize("op", ["topk", "dedup"])
def test_in_memory_ann_table_form_equals_literal(clustered_vectors, monkeypatch, op):
    """ivf_ann_topk / embedding_dedup_ann above the fan-out threshold
    (k=24) switch assignment AND probe fan-out to the centroid-table
    forms — row-identical to the literal path forced on the same
    centroids (the same contract the persisted IvfIndex pins)."""
    from git_log_to_sqlite_spark.operators import (
        embedding_dedup_ann,
        ivf_ann_topk,
        kmeans_fit_sample,
    )
    from git_log_to_sqlite_spark.operators import similarity as sim_mod

    e = clustered_vectors.select("vec_id", "embedding")
    cents = kmeans_fit_sample(e, "vec_id", "embedding", k=24, max_iter=5,
                              sample_size=64)
    queries = e.filter(F.col("vec_id") < 10)

    def run():
        if op == "topk":
            return sorted(
                tuple(r)
                for r in ivf_ann_topk(
                    queries, e, "vec_id", "embedding", cents,
                    n_probe=2, k=3, round_to=6, dist_round_to=6,
                ).collect()
            )
        return sorted(
            tuple(r)
            for r in embedding_dedup_ann(
                e, "vec_id", "embedding", cents, threshold=0.9, n_probe=2
            ).collect()
        )

    monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", 16)
    table_rows = run()
    monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", 10_000)
    literal_rows = run()
    assert table_rows == literal_rows and len(table_rows) > 0


def test_kmeans_large_k_table_assignment_equals_literal(clustered_vectors, monkeypatch):
    """The distributed Lloyd's loop above the fan-out threshold (k=20)
    pays the centroid-table assignment per iteration; its fitted
    centroids AND final assignment must equal the literal path's
    exactly (the per-iteration arithmetic and tie-break are the pinned
    table-form contract, so the iterate sequence cannot diverge)."""
    from git_log_to_sqlite_spark.operators import kmeans
    from git_log_to_sqlite_spark.operators import similarity as sim_mod

    e = clustered_vectors.select("vec_id", "embedding")

    def run():
        assigned, cents = kmeans(e, "vec_id", "embedding", k=20, max_iter=4)
        return sorted((r["vec_id"], r["cluster"]) for r in assigned.collect()), cents

    monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", 16)
    table_assigned, table_cents = run()
    monkeypatch.setattr(sim_mod, "_LITERAL_FANOUT_MAX", 10_000)
    literal_assigned, literal_cents = run()
    assert table_cents == literal_cents
    assert table_assigned == literal_assigned and len(table_assigned) == 100
