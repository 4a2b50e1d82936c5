"""Operator-vs-oracle suite (SURVEY.md section 5.2.2): every registered
query runs on Spark AND DuckDB at sf0.01; results must match exactly
after canonicalization. This is a stricter local mirror of the
driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from git_log_to_sqlite_spark import plans

from .oracle_harness import compare, duck_connection

ORACLE_SPECS = [s for s in plans.REGISTRY.values() if s.oracle]
ROWS_ONLY_SPECS = [s for s in plans.REGISTRY.values() if not s.oracle]


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_query_matches_oracle(spec, spark, oracle_sf_dir, duck):
    df = spec.fn(spark, oracle_sf_dir)
    ok, msg = compare(df, duck, spec.oracle, name=spec.name)
    assert ok, msg


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_queries_run(spec, spark, oracle_sf_dir):
    df = spec.fn(spark, oracle_sf_dir)
    assert df.count() >= 0 and len(df.columns) > 0


def test_approx_count_distinct_bound(spark, oracle_sf_dir):
    """approx_* correctness is a bound, never a hash (SURVEY 2.2)."""
    df = plans.REGISTRY["agg_approx_distinct"].fn(spark, oracle_sf_dir)
    for row in df.collect():
        exact, approx = row["exact_parts"], row["approx_parts"]
        assert abs(approx - exact) / exact < 0.1, row


def test_approx_percentile_bound(spark, oracle_sf_dir):
    """Sketch quantile must land within 2% relative of the exact
    median at this data scale."""
    df = plans.REGISTRY["agg_approx_percentile"].fn(spark, oracle_sf_dir)
    for row in df.collect():
        exact, approx = row["exact_median"], row["approx_median"]
        assert abs(approx - exact) / exact < 0.02, row


def test_stratified_sample_fractions_and_determinism(spark, oracle_sf_dir):
    """Sampling is property-tested: per-stratum rates near the target
    fractions, and the seed makes the row set exactly reproducible."""
    fn = plans.REGISTRY["sample_stratified"].fn
    base = plans.REGISTRY["text_langid"].fn  # any docs query gives totals
    from git_log_to_sqlite_spark.plans.registry import table as t

    totals = {
        r["lang"]: r["n"]
        for r in t(spark, oracle_sf_dir, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    s1 = fn(spark, oracle_sf_dir)
    got = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    want = {"en": 0.5, "es": 0.2, "de": 0.1}
    for lang, frac in want.items():
        if totals.get(lang, 0) >= 50:  # enough mass for a bound
            rate = got.get(lang, 0) / totals[lang]
            assert abs(rate - frac) < 0.15, (lang, rate, frac)
    assert set(got) <= set(want)  # unlisted strata never sampled
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in fn(spark, oracle_sf_dir).collect())
    assert ids1 == ids2, "same seed must reproduce the same sample"
