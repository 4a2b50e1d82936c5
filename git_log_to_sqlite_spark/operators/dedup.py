"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Design rules for 100 TB:
  * group/join on compact derived keys (128-bit hash, 60-bit minhash,
    band key) — the shuffle never carries document bodies;
  * every pairwise stage is an equi-join on a derived key (shingle,
    LSH band), so cost tracks candidate mass, not n^2;
  * hashes are md5-based and deterministic — results are reproducible
    across runs, engines, and cluster layouts (no seed drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_long(col: Column, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative BIGINT
    (15 hex = 60 bits, inside int64)."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a tokens array. Guarded so
    short docs yield [] (Spark's sequence() runs backward when
    start > stop)."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    gram = lambda i: F.concat_ws(" ", *[F.get(tokens, i + k) for k in range(n)])  # noqa: E731
    return F.when(
        F.size(tokens) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup with a deterministic survivor.

    Groups on a 128-bit content hash (never the raw content: the
    shuffle key is 32 bytes/row at any document size) and keeps the
    min/max id. Returns the input columns of the surviving rows plus
    ``n_copies``.
    """
    fp = F.md5(F.concat_ws("\x00", *content_cols))
    w = Window.partitionBy("_fp").orderBy(
        F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    )
    return (
        df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("_fp")))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Long-format MinHash signatures: (id, j, minh) for j in
    [0, num_hashes). Signature size is num_hashes x 8 bytes regardless
    of document length."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.split(F.col(text_col), " "), shingle_n)).alias("shingle"),
    )
    return (
        sh.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
        .withColumn(
            "h", md5_long(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("shingle")))
        )
        .groupBy("_id", "j")
        .agg(F.min("h").alias("minh"))
        .withColumnRenamed("_id", id_col)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    min_agree: float = 0.25,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    Returns (id_a, id_b, est_jaccard). Candidates come from an
    equi-join on (band, band_key) — two docs collide iff one band of
    their signatures matches exactly, so the join output is the
    candidate set itself, never n^2.
    """
    mh = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    bands = (
        mh.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
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
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    ma, mb = mh.alias("ma"), mh.alias("mb")
    agree = F.sum(F.when(F.col("ma.minh") == F.col("mb.minh"), 1).otherwise(0))
    return (
        cand.join(ma, F.col("id_a") == F.col(f"ma.{id_col}"))
        .join(
            mb,
            (F.col("id_b") == F.col(f"mb.{id_col}")) & (F.col("ma.j") == F.col("mb.j")),
        )
        .groupBy("id_a", "id_b")
        .agg((agree.cast("double") / num_hashes).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_agree)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.2,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard pairs >= threshold via an inverted-index
    equi-join on the shingle. Hot shingles are the skew risk — AQE
    skew-join splits them; pass a pre-filtered df to cap document
    frequency when the corpus needs it."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.split(F.col(text_col), " "), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        pairs.join(sa, F.col("id_a") == F.col("sa._id"))
        .join(sb, F.col("id_b") == F.col("sb._id"))
        .filter(jac >= threshold)
        .select("id_a", "id_b", jac.alias("jaccard"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash signature (bitwise majority over md5 token
    hashes). Near-dup = small Hamming distance between signatures;
    signatures are 8 bytes/doc, so the pair stage can band on bit
    slices or broadcast."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    ).distinct()
    weights = (
        toks.withColumn("h", md5_long(F.col("token"), hex_chars=8))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))))
        .withColumn(
            "bit_weight", F.when(F.expr("(shiftright(h, i) & 1) = 1"), 1).otherwise(-1)
        )
        .groupBy("_id", "i")
        .agg(F.sum("bit_weight").alias("weight"))
    )
    return (
        weights.groupBy("_id")
        .agg(
            F.sum(
                F.when(F.col("weight") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)"))
                .otherwise(0)
            )
            .cast("long")
            .alias("simhash")
        )
        .withColumnRenamed("_id", id_col)
    )
