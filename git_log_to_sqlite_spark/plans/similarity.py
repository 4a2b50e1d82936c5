"""Similarity search over the ``embeddings`` table
(``embedding: array<float>``, 64-dim).

Two paths, per SURVEY 2.2's similarity rows:

* brute-force cosine top-k — the exactness baseline: broadcast the
  (small) query set against the candidate corpus; the dot product is a
  JVM-side ``aggregate(zip_with(...))`` fold, no Python in the loop.
* IVF-style bucketed ANN — the scale path: restrict candidates to the
  query's coarse bucket (here the given ``label`` as the quantizer
  cell) so each query scans corpus/|buckets| vectors. Recall vs the
  brute-force baseline is asserted in tests/test_similarity.py.

Floating-point note: each cosine is a 64-term double fold — identical
operand order in both engines — rounded to 4 dp, far above any
accumulation noise (~1e-13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM fold)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_SQL_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
    "  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@register(
    "sim_cosine_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_SQL_COS}, 4) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_SQL_COS}, 4) DESC, b.vec_id)
               AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id < 8 AND a.vec_id <> b.vec_id
    ) t WHERE rn <= 5
    """,
    doc="Brute-force cosine top-5 for 8 query vectors: broadcast the "
    "query side, fold the dot product JVM-side, rank per query. The "
    "exactness baseline every ANN variant is measured against.",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("cv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "sim_ann_bucketed",
    oracle=f"""
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_SQL_COS}, 4) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_SQL_COS}, 4) DESC, b.vec_id)
               AS rn
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 8
    ) t WHERE rn <= 5
    """,
    doc="IVF-style bucketed ANN: equi-join on the coarse-quantizer cell "
    "(label) replaces the cross join, cutting each query's scan to "
    "corpus/|cells|. At 100 TB the cells come from a k-means fit (or "
    "LSH bucket) and the same equi-join shape holds; recall vs "
    "sim_cosine_topk is asserted in tests.",
)
def sim_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        _as_double("embedding").alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        _as_double("embedding").alias("cv"),
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(c, (F.col("q_label") == F.col("c_label")) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "sim_pairs_threshold",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_SQL_COS}, 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 64 AND b.vec_id < 64
      AND {_SQL_COS} >= 0.8
    """,
    doc="All-pairs similarity above a threshold on a bounded slice — "
    "the verification stage of a near-dup-by-embedding pipeline "
    "(candidates come from LSH/IVF at scale; the threshold check is "
    "this exact form).",
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 64)
    a = e.select(F.col("vec_id").alias("vec_a"), _as_double("embedding").alias("av"))
    b = e.select(F.col("vec_id").alias("vec_b"), _as_double("embedding").alias("bv"))
    sim = cosine(F.col("av"), F.col("bv"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(sim >= 0.8)
        .select("vec_a", "vec_b", F.round(sim, 4).alias("cos_sim"))
    )


@register(
    "sim_centroid_per_label",
    oracle="""
    WITH dims AS (
      SELECT label, i,
             ROUND(AVG(embedding[i]::DOUBLE), 6) AS centroid_dim
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS i) d
      GROUP BY label, i)
    SELECT label, CAST(i AS INT) AS dim_index, centroid_dim FROM dims
    """,
    doc="Per-cluster centroid (first 4 dims shown): the k-means "
    "update step / IVF cell statistics as a grouped aggregate over "
    "exploded dimensions.",
)
def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("dim_index"),
            _as_double("embedding").alias("v"),
        )
        .select(
            "label",
            "dim_index",
            F.get(F.col("v"), F.col("dim_index") - 1).alias("dim_val"),
        )
        .groupBy("label", "dim_index")
        .agg(F.round(F.avg("dim_val"), 6).alias("centroid_dim"))
        .select("label", "dim_index", "centroid_dim")
    )
