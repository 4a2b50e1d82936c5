"""Property tests (SURVEY.md section 5.2.4, hypothesis): invariants
that must hold for ANY input, not just the golden fixtures.

Each property materializes one small Spark job per example; example
counts are tuned so the whole module stays in tens of seconds.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from git_log_to_sqlite_spark.config import Config
from git_log_to_sqlite_spark.etl.pipeline import apply_author_map
from git_log_to_sqlite_spark.operators.dedup import exact_dedup, md5_long, shingles

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8
)
_email = st.builds(lambda u, d: f"{u}@{d}.test", _name, _name)

_commit_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _name, _email), min_size=1, max_size=20
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(rows=_commit_rows, mapping=st.dictionaries(_email, _name, max_size=5))
@settings(**_SETTINGS)
def test_author_map_preserves_rows_and_touches_only_name(sess, rows, mapping):
    """R16 invariant: the broadcast-join override NEVER changes the row
    count (a dup-keyed map would fan out) and only author_name moves."""
    df = sess.createDataFrame(
        [(i, n, e) for i, (i_, n, e) in enumerate(rows) for _ in [i_]],
        "commit_id long, author_name string, author_email string",
    )
    cfg = Config(author_map=mapping)
    out = apply_author_map(df, cfg, sess)
    assert out.count() == df.count()
    joined = (
        df.alias("i")
        .join(out.alias("o"), "commit_id")
        .select(
            F.col("i.author_email").alias("email_in"),
            F.col("o.author_email").alias("email_out"),
            F.col("i.author_name").alias("name_in"),
            F.col("o.author_name").alias("name_out"),
        )
    )
    for r in joined.collect():
        assert r["email_out"] == r["email_in"]  # other columns untouched
        want = mapping.get(r["email_in"], r["name_in"])
        assert r["name_out"] == want


@given(
    arrays=st.lists(
        st.lists(_name, min_size=0, max_size=6), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_explode_collect_roundtrip(sess, arrays):
    """explode then collect_list+sort reconstructs each array as a
    multiset (R22 and its inverse)."""
    df = sess.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "id long, xs array<string>"
    )
    back = (
        df.select("id", F.explode_outer("xs").alias("x"))
        .filter(F.col("x").isNotNull())
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("x")).alias("xs_back"))
    )
    got = {r["id"]: r["xs_back"] for r in back.collect()}
    for i, a in enumerate(arrays):
        assert got.get(i, []) == sorted(a)


@given(
    docs=st.lists(
        st.tuples(st.text(alphabet="ab ", min_size=0, max_size=30)),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_idempotent_and_partitions_input(sess, docs):
    """dedup is idempotent; survivors+drops partition the input; the
    survivor count equals the number of distinct contents."""
    df = sess.createDataFrame(
        [(i, t) for i, (t,) in enumerate(docs)], "doc_id long, body string"
    )
    d1 = exact_dedup(df, ["body"], "doc_id")
    n_distinct = df.select("body").distinct().count()
    assert d1.count() == n_distinct
    d2 = exact_dedup(d1.drop("n_copies"), ["body"], "doc_id")
    assert sorted(r["doc_id"] for r in d2.collect()) == sorted(
        r["doc_id"] for r in d1.collect()
    )
    # copies add back up to the input row count
    total = d1.agg(F.sum("n_copies")).collect()[0][0]
    assert total == df.count()


@given(
    texts=st.lists(
        st.text(alphabet="xyz ", min_size=0, max_size=40), min_size=1, max_size=10
    ),
    n=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_shingles_bounded_distinct_and_hash_range(sess, texts, n):
    """|shingles(doc, n)| <= max(0, tokens-n+1), entries distinct, and
    md5_long stays a non-negative 60-bit value."""
    df = sess.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    toks = F.split(F.col("t"), " ")
    out = df.select(
        "id",
        F.size(toks).alias("n_tok"),
        shingles(toks, n).alias("sh"),
    ).select(
        "id",
        "n_tok",
        F.size("sh").alias("n_sh"),
        F.size(F.array_distinct("sh")).alias("n_uniq"),
        F.explode_outer("sh").alias("one"),
    ).withColumn("h", md5_long(F.col("one")))
    for r in out.collect():
        assert r["n_sh"] <= max(0, r["n_tok"] - n + 1)
        assert r["n_sh"] == r["n_uniq"]
        if r["h"] is not None:
            assert 0 <= r["h"] < (1 << 60)
