"""LLM-training-data pipeline operators over the ``documents`` table:
exact dedup, n-gram Jaccard near-dup, MinHash-LSH, SimHash, language
ID, quality scoring, token counting, fingerprinting, and the general
event-time as-of join.

Hash functions are md5-based in BOTH engines (Spark ``md5`` == DuckDB
``md5`` on the same UTF-8 bytes; the hex prefix parses to the same
integer), so even the sketch-based operators (MinHash, SimHash) are
exactly oracle-checkable — rare for LSH implementations and a
deliberate design choice here.

Scale notes are on each operator; the common theme: every pairwise
operator goes through an equi-join on a derived key (shingle, band,
bucket) — never a cross join — so the shuffle is proportional to
candidate pairs, not n^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table

# --- shared building blocks -------------------------------------------

def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _shingles(tok_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Guarded so short docs yield an
    empty array (Spark's sequence() runs BACKWARD when start > stop)."""
    idx = F.sequence(F.lit(0), F.size(tok_col) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(tok_col, i + off) for off in range(n)]
    )
    return F.when(
        F.size(tok_col) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def _md5_long(col: Column, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative BIGINT.
    15 hex chars = 60 bits, safely inside int64. DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


_SQL_MD5_LONG = "('0x' || substr(md5({x}), 1, {n}))::BIGINT"

_SQL_SHINGLES = """
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, len(string_split(text,' ')) - 2),
             i -> string_split(text,' ')[i] || ' ' ||
                  string_split(text,' ')[i+1] || ' ' ||
                  string_split(text,' ')[i+2]))) AS shingle
    FROM documents
"""


# ----------------------------------------------------------------------
# Deduplication
# ----------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content, deterministic survivor "
    "(min id). One shuffle on the 128-bit fingerprint; at 100 TB "
    "group on the hash, never the raw text (shuffle carries 32 bytes "
    "per row, not the document).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("survivor_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    """,
    doc="Exact n-gram Jaccard near-dup: shingle -> inverted-index "
    "equi-join on shingle -> pair-count -> Jaccard filter. The join "
    "fans out per shared shingle, so shuffle volume tracks true "
    "similarity mass, not n^2. Hot (stop-) shingles are the skew risk "
    "at scale — AQE skew-join splits them; a df-frequency cap is the "
    "semantic fix when the corpus needs it.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(_shingles(_tokens())).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


_MINHASH_K = 8  # hash functions; bands of 2 -> 4 LSH bands

@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    mh AS (
      SELECT doc_id, j,
             MIN({_SQL_MD5_LONG.format(x="j::VARCHAR || ':' || shingle", n=15)}) AS minh
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASH_K - 1})) AS j) perms
      GROUP BY doc_id, j),
    bands AS (
      SELECT doc_id, j // 2 AS band,
             string_agg(minh::VARCHAR, ',' ORDER BY j) AS band_key
      FROM mh GROUP BY doc_id, j // 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(SUM(CASE WHEN ma.minh = mb.minh THEN 1 ELSE 0 END) AS DOUBLE)
             / {_MINHASH_K} AS est_jaccard
    FROM cand
    JOIN mh ma ON ma.doc_id = doc_a
    JOIN mh mb ON mb.doc_id = doc_b AND ma.j = mb.j
    GROUP BY doc_a, doc_b
    HAVING SUM(CASE WHEN ma.minh = mb.minh THEN 1 ELSE 0 END) >= {_MINHASH_K} * 0.25
    """,
    doc="MinHash + LSH near-dup — the scale path for fuzzy dedup: "
    "shingle -> K minhashes (md5-keyed, deterministic in both engines) "
    "-> band keys -> candidate pairs via band equi-join (never n^2) -> "
    "estimated Jaccard from signature agreement. At 100 TB each stage "
    "is a hash shuffle on a compact key; signature size (K x 8 bytes) "
    "is independent of document length.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(_shingles(_tokens())).alias("shingle"))
    mh = (
        sh.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(_MINHASH_K - 1))))
        .withColumn(
            "h",
            _md5_long(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("shingle"))),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("minh"))
    )
    bands = (
        mh.withColumn("band", (F.col("j") / 2).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "minh"))),
                    lambda s: s["minh"].cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ma, mb = mh.alias("ma"), mh.alias("mb")
    agree = F.sum(
        F.when(F.col("ma.minh") == F.col("mb.minh"), 1).otherwise(0)
    )
    return (
        cand.join(ma, F.col("doc_a") == F.col("ma.doc_id"))
        .join(mb, (F.col("doc_b") == F.col("mb.doc_id")) & (F.col("ma.j") == F.col("mb.j")))
        .groupBy("doc_a", "doc_b")
        .agg((agree.cast("double") / _MINHASH_K).alias("est_jaccard"), agree.alias("_n"))
        .filter(F.col("_n") >= _MINHASH_K * 0.25)
        .select("doc_a", "doc_b", "est_jaccard")
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text,' '))) AS token
      FROM documents),
    bits AS (
      SELECT doc_id, i,
             SUM(CASE WHEN (({_SQL_MD5_LONG.format(x='token', n=8)}) >> i) & 1 = 1
                      THEN 1 ELSE -1 END) AS weight
      FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) pos
      GROUP BY doc_id, i)
    SELECT doc_id,
           CAST(SUM(CASE WHEN weight > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM bits GROUP BY doc_id
    """,
    doc="32-bit SimHash signature per document (bitwise majority over "
    "md5 token hashes). Near-dup candidates are then signature pairs "
    "within small Hamming distance — compact enough to broadcast or "
    "band on bit-slices. Deterministic md5 basis makes it oracle-exact.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("token")
    ).distinct()
    # SQL-form shiftright/shiftleft: the Python API only takes literal
    # shift amounts, the SQL expressions accept a column.
    bits = (
        toks.withColumn("h", _md5_long(F.col("token"), hex_chars=8))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(31))))
        .withColumn(
            "bit_weight",
            F.when(F.expr("(shiftright(h, i) & 1) = 1"), 1).otherwise(-1),
        )
        .groupBy("doc_id", "i")
        .agg(F.sum("bit_weight").alias("weight"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("weight") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), i)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("simhash")
    )


# ----------------------------------------------------------------------
# Text analysis
# ----------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "value"),
    "es": ("el", "la", "de", "y", "valor"),
    "de": ("der", "die", "das", "und", "wert"),
}


@register(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '),
            x -> x IN {tuple(_LANG_MARKERS['en'])})) AS n_en,
        len(list_filter(string_split(text,' '),
            x -> x IN {tuple(_LANG_MARKERS['es'])})) AS n_es,
        len(list_filter(string_split(text,' '),
            x -> x IN {tuple(_LANG_MARKERS['de'])})) AS n_de
      FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN n_en = 0 AND n_es = 0 AND n_de = 0 THEN 'und'
                WHEN n_en >= n_es AND n_en >= n_de THEN 'en'
                WHEN n_es >= n_de THEN 'es'
                ELSE 'de' END AS predicted_lang,
           CAST(n_en AS INT) AS n_en_markers
    FROM scored
    """,
    doc="Marker-stopword language ID (n-gram-heuristic class): count "
    "language markers, argmax with a deterministic tie order. Pure "
    "column expressions — no UDF in the hot path.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    def marker_count(markers: tuple[str, ...]) -> Column:
        # single-arg lambda: a 2-arg lambda would be read as (elem, idx)
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    counts = {lang: marker_count(m) for lang, m in _LANG_MARKERS.items()}
    pred = (
        F.when(
            (counts["en"] == 0) & (counts["es"] == 0) & (counts["de"] == 0), "und"
        )
        .when((counts["en"] >= counts["es"]) & (counts["en"] >= counts["de"]), "en")
        .when(counts["es"] >= counts["de"], "es")
        .otherwise("de")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        counts["en"].alias("n_en_markers"),
    )


@register(
    "text_quality",
    oracle="""
    SELECT doc_id,
           n_chars,
           CAST(length(string_split(text, ' ')) AS INT) AS n_tokens,
           ROUND(CAST(n_chars AS DOUBLE) / length(string_split(text, ' ')), 6)
             AS chars_per_token,
           ROUND(CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                 / n_chars, 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(string_split(text,' '),
                 x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                 / length(string_split(text, ' ')), 6) AS stopword_ratio,
           CASE WHEN n_chars BETWEEN 100 AND 20000
                 AND length(string_split(text, ' ')) >= 20
                THEN 1 ELSE 0 END AS passes_length_gate
    FROM documents
    """,
    doc="Heuristic quality scoring: length stats, punctuation density, "
    "stopword ratio, and a pass/fail length gate — the standard "
    "pre-training filter battery as pure expressions.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in"))
    )
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[.,;:!?]"), 0))
    return d.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 6).alias("chars_per_token"),
        F.round(punct.cast("double") / F.col("n_chars"), 6).alias("punct_ratio"),
        F.round(stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.when(
            F.col("n_chars").between(100, 20000) & (n_tokens >= 20), 1
        )
        .otherwise(0)
        .alias("passes_length_gate"),
    )


@register(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(length(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS INT) AS bpe_ish_tokens,
           CAST(length(list_distinct(string_split(text, ' '))) AS INT) AS unique_tokens,
           ROUND(CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / length(string_split(text, ' ')), 6) AS unique_ratio
    FROM documents
    """,
    doc="Token counting: whitespace split + a BPE-ish regex segmenter "
    "(letters / digits / punctuation runs) + type-token ratio.",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )
    uniq = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(bpe).alias("bpe_ish_tokens"),
        uniq.alias("unique_tokens"),
        F.round(uniq.cast("double") / F.size(toks), 6).alias("unique_ratio"),
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fingerprint
      FROM documents)
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS cluster_size
    FROM fp
    """,
    doc="Bag-of-words document fingerprint: md5 of the sorted distinct "
    "token set — groups token-permutation duplicates that exact dedup "
    "misses. Window count exposes cluster sizes.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.sort_array(F.array_distinct(F.split(F.lower("text"), " "))), " ")
    )
    w = Window.partitionBy("fingerprint")
    return d.select("doc_id", fp.alias("fingerprint")).withColumn(
        "cluster_size", F.count("*").over(w)
    )


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           md5(text) AS content_hash,
           source AS modality_hint
    FROM documents WHERE doc_id < 200
    """,
    doc="Multimodal column plumbing: text bytes stand in for an opaque "
    "binary payload (image/audio); typed metadata travels beside it. "
    "The decode/feature-extract stage is operators/multimodal.py "
    "(Pandas-UDF over mapInPandas, stubbed deterministically).",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.md5("text").alias("content_hash"),
        F.col("source").alias("modality_hint"),
    )


# ----------------------------------------------------------------------
# General event-time as-of join
# ----------------------------------------------------------------------

@register(
    "asof_event_value",
    oracle="""
    WITH q AS (
      SELECT o_orderkey, o_custkey,
             make_timestamp(2024, 1, CAST(dayofmonth(o_orderdate) AS INT), 12, 0, 0)
               AS cutoff_ts
      FROM orders WHERE o_custkey < 150 AND o_orderkey < 3000)
    SELECT o_orderkey, o_custkey, cutoff_ts,
           (SELECT e.value FROM events e
             WHERE e.user_id = q.o_custkey AND e.ts <= q.cutoff_ts
             ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_value
    FROM q
    """,
    doc="True per-row as-of join (nearest prior event value) via the "
    "union + last(ignorenulls) window trick: one shuffle on the key, "
    "one ordered pass — no range-join explosion, scales to billions "
    "of events. SURVEY 2.2's as-of row.",
)
def asof_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") < 150) & (F.col("o_orderkey") < 3000)
    )
    cutoff = F.make_timestamp(
        F.lit(2024), F.lit(1), F.dayofmonth("o_orderdate"), F.lit(12), F.lit(0), F.lit(0)
    )
    queries = o.select(
        F.col("o_custkey").alias("key"),
        cutoff.alias("ts"),
        F.lit(1).alias("is_query"),
        F.col("o_orderkey"),
        F.lit(None).cast("double").alias("event_value"),
        F.lit(None).cast("long").alias("tie_id"),
    )
    e = table(spark, sf_dir, "events")
    points = e.select(
        F.col("user_id").alias("key"),
        F.col("ts"),
        F.lit(0).alias("is_query"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("value").alias("event_value"),
        F.col("event_id").alias("tie_id"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "is_query", "tie_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = queries.unionByName(points).withColumn(
        "asof_value", F.last("event_value", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("is_query") == 1).select(
        "o_orderkey",
        F.col("key").alias("o_custkey"),
        F.col("ts").alias("cutoff_ts"),
        "asof_value",
    )
