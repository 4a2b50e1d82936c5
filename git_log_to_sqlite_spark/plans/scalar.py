"""Scalar expression surface: string / regex / date / math /
conditional / cast / JSON / array functions.

All pure Column expressions (whole-stage codegen) over single-table
scans — the oracle checks value semantics, the .explain checks in
tests/test_plans.py confirm projection pushdown (ReadSchema lists only
the referenced columns).

Cross-engine gotchas handled here:
  * DuckDB year()/month()/... return BIGINT -> cast to Spark's INT
  * DuckDB dayofweek() is 0=Sunday, Spark is 1=Sunday -> +1
  * pmod() vs %: DuckDB % keeps the dividend sign -> ((x%n)+n)%n
  * month difference computed structurally ((y2-y1)*12 + (m2-m1)) —
    Spark months_between and DuckDB date_diff('month') disagree on
    partial months
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table


@register(
    "fn_strings",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS INT) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           p_brand || ':' || p_type AS brand_type,
           trim(p_name) AS name_trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_type, ' ', '_') AS type_snake,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           CASE WHEN p_name LIKE 'a%' THEN 1 ELSE 0 END AS starts_a
    FROM part WHERE p_partkey < 500
    """,
    doc="String function suite over part.",
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.when(F.col("p_name").like("a%"), 1).otherwise(0).alias("starts_a"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
           CASE WHEN regexp_matches(c_name, '[05]$') THEN 1 ELSE 0 END AS ends_0_or_5,
           CAST(length(regexp_extract_all(c_mktsegment, '[AEIOU]')) AS INT) AS n_vowels
    FROM customer WHERE c_custkey < 300
    """,
    doc="regexp extract/replace/match/count. Spark regexp_replace is "
    "global by default; DuckDB needs the 'g' flag.",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", r"[0-9]+", "#").alias("name_masked"),
        F.when(F.col("c_name").rlike(r"[05]$"), 1).otherwise(0).alias("ends_0_or_5"),
        F.size(F.regexp_extract_all(F.col("c_mktsegment"), F.lit("[AEIOU]"), 0)).alias(
            "n_vowels"
        ),
    )


@register(
    "fn_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(dayofweek(o_orderdate) AS INT) + 1 AS order_dow,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS order_week,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INT) AS days_to_2002,
           (2002 - CAST(year(o_orderdate) AS INT)) * 12
             + (1 - CAST(month(o_orderdate) AS INT)) AS months_to_2002
    FROM orders WHERE o_orderkey < 1000
    """,
    doc="Date/time function suite with the engine-specific width and "
    "day-of-week offsets normalized in the oracle.",
)
def fn_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("week", F.col("o_orderdate")).alias("order_week"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        (
            (F.lit(2002) - F.year("o_orderdate")) * 12
            + (F.lit(1) - F.month("o_orderdate"))
        ).alias("months_to_2002"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 50000.0), 6) AS abs_centered,
           ROUND(l_extendedprice, 2) AS price_2dp,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(pow(1 + l_tax, 2), 6) AS tax_sq,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem WHERE l_orderkey < 400
    """,
    doc="Math function suite; pmod expressed as ((x%n)+n)%n in the "
    "oracle (DuckDB % keeps dividend sign).",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000.0), 6).alias("abs_centered"),
        F.round(F.col("l_extendedprice"), 2).alias("price_2dp"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bal_tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 1000.0) AS bal_cap1k,
           CASE WHEN c_nationkey IN (1, 2, 3) THEN 1 ELSE 0 END AS in_nations_123
    FROM customer
    """,
    doc="CASE WHEN / coalesce / nullif / greatest / least / IN.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
        F.when(F.col("c_nationkey").isin(1, 2, 3), 1).otherwise(0).alias("in_nations_123"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderstatus = 'O' AS INT) AS is_open
    FROM orders WHERE o_orderkey < 500
    """,
    doc="Cast matrix across the section 1.2 types. double->BIGINT "
    "truncates toward zero in both engines; decimal->string renders "
    "the same scale. price_dec round-trips through DECIMAL(18,2) but is "
    "emitted as DOUBLE: engines agree on the value, but raw DECIMAL "
    "output renders differently in downstream hashers (price_str keeps "
    "the decimal string-render coverage).",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        dec.cast("double").alias("price_dec"),
        dec.cast("string").alias("price_str"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        (F.col("o_orderstatus") == "O").cast("int").alias("is_open"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type
    """,
    doc="JSON field extraction (get_json_object) + typed aggregation "
    "over the extracted value.",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "fn_from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
    FROM events WHERE event_id < 2000
    """,
    doc="from_json into a typed struct, then struct field access "
    "(schema-on-read over a JSON string column).",
)
def fn_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = F.from_json("props", "k BIGINT")
    return e.select("event_id", parsed.getField("k").alias("k_typed"))


@register(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(length(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(list_distinct(string_split(text, ' '))) AS INT)
             AS n_unique_tokens,
           CASE WHEN list_contains(string_split(text, ' '), 'spark')
                THEN 1 ELSE 0 END AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
             AS first5_sorted,
           string_split(text, ' ')[1] AS first_token
    FROM documents
    """,
    doc="Array surface: split / size / distinct / contains / sorted "
    "slice / element access, serialized to scalars for hashing.",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ",").alias(
            "first5_sorted"
        ),
        F.get(toks, 0).alias("first_token"),
    )


@register(
    "fn_explode",
    oracle="""
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
    GROUP BY token
    """,
    doc="explode (UNNEST) of the tokenized text -> token frequency "
    "table; the generate operator fans out ~100x, then partial "
    "aggregation collapses before the shuffle.",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="Map surface: from_json into MapType, map_keys / element_at "
    "access (oracle reads the same field through JSON since DuckDB has "
    "no MAP literal from JSON).",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.select("event_type", (F.element_at(m, "k") % 10).alias("k_bucket"))
        .groupBy("event_type", "k_bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fn_higher_order",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '), t -> upper(t)), ',')
             AS upper_toks,
           CAST(len(list_filter(string_split(p_name, ' '), t -> length(t) > 3)) AS INT)
             AS n_long_toks,
           CAST(list_sum(list_transform(string_split(p_name, ' '), t -> length(t)))
                AS BIGINT) AS total_len,
           CASE WHEN len(list_filter(string_split(p_name, ' '),
                                     t -> t LIKE 'a%')) > 0
                THEN 1 ELSE 0 END AS any_a
    FROM part WHERE p_partkey < 400
    """,
    doc="Higher-order array lambdas (transform / filter / aggregate / "
    "exists) — per-element logic stays a Column expression inside "
    "codegen, the idiom that keeps array-heavy pipelines off the "
    "Python path entirely.",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        # array_join-serialized: the gate's pandas canonicalizer cannot
        # sort raw array columns (unhashable list), same idiom as fn_array.
        F.array_join(F.transform(toks, lambda t: F.upper(t)), ",").alias("upper_toks"),
        F.size(F.filter(toks, lambda t: F.length(t) > 3)).alias("n_long_toks"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_len"),
        F.exists(toks, lambda t: t.like("a%")).cast("int").alias("any_a"),
    )
