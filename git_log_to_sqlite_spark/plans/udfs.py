"""UDF surface (SURVEY.md section 2.2 "UDF surface"): every Python
extension point Spark offers, each with a DuckDB oracle where the
function is pure and SQL-expressible.

Scale notes baked into each choice:

* Row-at-a-time Python UDFs pay a per-row serialize/deserialize through
  the Python worker — they exist here to prove the surface, and the
  docstring of each names the built-in that replaces it in a hot path.
* ``pandas_udf`` moves whole Arrow batches (1000s of rows per
  roundtrip) — the only acceptable Python hot path at 100 TB.
* ``applyInPandas`` shuffles on the grouping key; group size must fit
  one worker's memory, so keys are chosen with bounded cardinality
  per group (here: nation -> ~2.4k customers each at sf1).
* Grouped-agg pandas UDFs combine per-group but are NOT partial-
  aggregating (no map-side combine) — fine for medium groups, swap for
  built-in expressions when the group count is small and rows huge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .registry import register, table


# --- scalar Python UDF -------------------------------------------------


@F.udf(returnType=T.IntegerType())
def _digit_checksum(s):
    """Sum of decimal digits of the trailing number in a string.
    Pure; matches the SQL reduction in the oracle."""
    if s is None:
        return None
    digits = [c for c in s if c.isdigit()]
    return sum(int(c) for c in digits)


@register(
    "udf_scalar_python",
    oracle="""
    SELECT c_custkey,
           CAST(list_sum(list_transform(regexp_extract_all(c_name, '[0-9]'),
                                        x -> CAST(x AS INT))) AS INT)
             AS name_digit_sum
    FROM customer WHERE c_custkey < 400
    """,
    doc="Row-at-a-time Python UDF (the slow path, kept off hot paths; "
    "the same result is expressible JVM-side with aggregate(split(...)) "
    "— see fn_array for the built-in idiom).",
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    return c.select(
        "c_custkey", _digit_checksum(F.col("c_name")).alias("name_digit_sum")
    )


# --- vectorized (Arrow) scalar pandas UDF ------------------------------


@pandas_udf(T.DoubleType())
def _net_price(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    # Arrow-batched: one Python roundtrip per ~10k-row batch, numpy math.
    # Round at 6 dp: the product of 2-dp operands has <= 6 decimal
    # digits, so there are no half-way ties (numpy rounds half-even,
    # DuckDB half-away — at 4 dp they disagree on exact .00005s).
    return (extended * (1.0 - discount) * (1.0 + tax)).round(6)


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6)
             AS net_price
    FROM lineitem WHERE l_orderkey < 1000
    """,
    doc="Vectorized scalar pandas UDF (Arrow batches). Rounded to 6 dp "
    "— tie-free (see _net_price), identical IEEE operands both engines.",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


# --- grouped-map applyInPandas -----------------------------------------

_ZSCORE_SCHEMA = (
    "c_nationkey bigint, c_custkey bigint, acctbal double, bal_zscore double"
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-nation z-score of account balance — a whole-group transform
    (needs the group's mean/std, so it is genuinely grouped-map shaped;
    population std to match the SQL window form exactly)."""
    mu = pdf["acctbal"].mean()
    sigma = pdf["acctbal"].std(ddof=0)
    pdf = pdf.copy()
    pdf["bal_zscore"] = ((pdf["acctbal"] - mu) / sigma).round(6)
    return pdf


@register(
    "udf_grouped_map",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal AS acctbal,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / stddev_pop(c_acctbal) OVER (PARTITION BY c_nationkey), 6)
             AS bal_zscore
    FROM customer
    """,
    doc="applyInPandas grouped-map: per-nation z-score. One shuffle on "
    "the group key; each group is one pandas frame on one worker, so "
    "the key must bound group size (nation does).",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", F.col("c_acctbal").alias("acctbal")
    )
    return c.groupBy("c_nationkey").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


# --- grouped-agg pandas UDAF -------------------------------------------


@pandas_udf(T.DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    # grouped-agg eval type: whole group per call, scalar out
    return round(float((price * qty).sum() / qty.sum()), 6)


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped-agg pandas UDAF (quantity-weighted mean price). No "
    "map-side combine — at scale prefer the two-sum built-in form "
    "(sum(x*w)/sum(w)) which partial-aggregates; this proves the "
    "extension point.",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _weighted_avg_price("l_extendedprice", "l_quantity").alias("wavg_price")
    )


# --- UDTF-shaped: 1 row -> N rows via array-returning UDF + explode ----


@F.udf(returnType=T.ArrayType(T.StructType([
    T.StructField("pos", T.IntegerType()),
    T.StructField("word", T.StringType()),
])))
def _positioned_words(s: str):
    if s is None:
        return []
    return [(i, w) for i, w in enumerate(s.split(" ")) if w]


@register(
    "udf_table_function",
    oracle="""
    SELECT p_partkey,
           CAST(pos - 1 AS INT) AS pos,
           word
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word,
                 generate_subscripts(string_split(p_name, ' '), 1) AS pos
          FROM part WHERE p_partkey < 200)
    WHERE word <> ''
    """,
    doc="UDTF surface: array-of-struct returning UDF + explode = one "
    "row in, N rows out (the pre-3.5 portable UDTF idiom; built-in "
    "posexplode(split()) is the JVM-side equivalent for this case).",
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey", F.explode(_positioned_words(F.col("p_name"))).alias("e")
    ).select("p_partkey", F.col("e.pos").alias("pos"), F.col("e.word").alias("word"))


# --- native Python UDTF (Spark >= 3.5) ---------------------------------


@register(
    "udf_native_udtf",
    oracle="""
    SELECT p_partkey,
           CAST(pos - 1 AS INT) AS pos,
           word
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word,
                 generate_subscripts(string_split(p_name, ' '), 1) AS pos
          FROM part WHERE p_partkey < 150)
    WHERE word <> ''
    """,
    doc="Native Python UDTF (class with eval yielding rows) invoked "
    "via LATERAL — the first-class 1->N extension point; compare "
    "udf_table_function for the pre-3.5 array+explode idiom.",
)
def udf_native_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class WordSplitter:
        def eval(self, s: str):
            if s:
                for i, w in enumerate(s.split(" ")):
                    if w:
                        yield (i, w)

    spark.udtf.register("_word_splitter", WordSplitter)
    table(spark, sf_dir, "part").filter(F.col("p_partkey") < 150).createOrReplaceTempView(
        "_udtf_part"
    )
    return spark.sql(
        """
        SELECT p_partkey, s.pos, s.word
        FROM _udtf_part, LATERAL _word_splitter(p_name) s
        """
    )


# --- mapInPandas: batch-iterator transform (schema-changing) -----------


def _price_bands(batches):
    """mapInPandas: iterator of Arrow batches in, iterator out.
    Constant memory regardless of partition size — the per-batch loop
    never materializes a partition."""
    for pdf in batches:
        out = pd.DataFrame(
            {
                "p_partkey": pdf["p_partkey"],
                "band": pd.cut(
                    pdf["p_retailprice"],
                    bins=[0, 1000, 1500, 2000, float("inf")],
                    labels=["lo", "mid", "hi", "lux"],
                ).astype(str),
            }
        )
        yield out


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_retailprice <= 1000 THEN 'lo'
                WHEN p_retailprice <= 1500 THEN 'mid'
                WHEN p_retailprice <= 2000 THEN 'hi'
                ELSE 'lux' END AS band
    FROM part WHERE p_partkey < 500
    """,
    doc="mapInPandas batch-iterator transform (price banding). The "
    "narrow (no-shuffle) Python path: used where per-batch Python "
    "logic is genuinely needed — multimodal decode uses this shape.",
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select("p_partkey", "p_retailprice").mapInPandas(
        _price_bands, "p_partkey bigint, band string"
    )
