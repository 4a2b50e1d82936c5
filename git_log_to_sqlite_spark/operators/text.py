"""Text-analysis operators: language ID, quality stats, token counts,
document fingerprinting. All pure Column expressions — the whole
battery runs inside whole-stage codegen in one scan pass — except the
one deliberate Arrow seam, :func:`subword_token_counts`, which carries
a real subword tokenizer (stub-or-real, the Pillow convention from
``operators.multimodal``) when a deployment budgets BPE tokens rather
than whitespace tokens."""

from __future__ import annotations

import re as _re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "value"),
    "es": ("el", "la", "de", "y", "valor"),
    "de": ("der", "die", "das", "und", "wert"),
}


def _marker_count(tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def lang_id(df: DataFrame, text_col: str, out_col: str = "predicted_lang") -> DataFrame:
    """Marker-stopword language ID with a deterministic argmax order.
    The n-gram-heuristic class of detector: cheap, seedless, and good
    enough for corpus routing; swap the marker table per deployment."""
    toks = F.split(F.col(text_col), " ")
    counts = {lang: _marker_count(toks, m) for lang, m in LANG_MARKERS.items()}
    pred = F.when(
        (counts["en"] == 0) & (counts["es"] == 0) & (counts["de"] == 0), "und"
    )
    pred = pred.when(
        (counts["en"] >= counts["es"]) & (counts["en"] >= counts["de"]), "en"
    ).when(counts["es"] >= counts["de"], "es").otherwise("de")
    return df.withColumn(out_col, pred)


def add_text_stats(
    df: DataFrame, text_col: str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> DataFrame:
    """Quality-scoring battery: token counts, char/token ratio,
    punctuation density, stopword ratio, and a pass/fail length gate —
    the standard pre-training filters as one projection."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = _marker_count(toks, stopwords)
    punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.,;:!?]"), 0))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("chars_per_token", F.round(n_chars.cast("double") / n_tokens, 6))
        .withColumn("punct_ratio", F.round(punct.cast("double") / n_chars, 6))
        .withColumn("stopword_ratio", F.round(stop.cast("double") / n_tokens, 6))
        .withColumn(
            "passes_length_gate",
            (n_chars.between(100, 20000) & (n_tokens >= 20)).cast("int"),
        )
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex segments (letter / digit /
    punctuation runs) + type-token ratio."""
    toks = F.split(F.col(text_col), " ")
    bpe = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )
    uniq = F.size(F.array_distinct(toks))
    return (
        df.withColumn("ws_tokens", F.size(toks))
        .withColumn("bpe_ish_tokens", F.size(bpe))
        .withColumn("unique_tokens", uniq)
        .withColumn("unique_ratio", F.round(uniq.cast("double") / F.size(toks), 6))
    )


# --------------------------------------------------------------------------
# Subword tokenizer seam (round 15): whitespace/regex counts above are
# the oracle-stable gate basis, but a 100 TB pipeline budgets SUBWORD
# tokens, and real tokenizers (tiktoken, HF) are Python libraries — so
# the production knob is an Arrow-batched mapInPandas seam, the exact
# convention of operators.multimodal's Pillow decode seam: a plain
# per-text Python callable, real when its library is importable, a
# deterministic stub otherwise, pinnable explicitly in tests.

#: the BPE-ish segmentation of :func:`token_counts`, as a Python regex —
#: kept character-identical to the JVM pattern so the Arrow seam is
#: equivalence-testable against the codegen column.
_BPE_ISH_PATTERN = _re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")


def _count_subword_stub(text: str | None) -> int:
    """Deterministic stand-in tokenizer: counts the same BPE-ish
    segments token_counts derives JVM-side. Real tokenizers plug in
    with the identical ``(str) -> int`` signature."""
    if not text:
        return 0
    return len(_BPE_ISH_PATTERN.findall(text))


try:  # real tokenizer when importable (absent from this container)
    import tiktoken  # type: ignore[import-not-found]

    _TIKTOKEN_ENC = tiktoken.get_encoding("cl100k_base")

    def _count_subword_tiktoken(text: str | None) -> int:
        return len(_TIKTOKEN_ENC.encode(text)) if text else 0

    HAS_TOKENIZER = True
except Exception:  # pragma: no cover - environment-dependent
    HAS_TOKENIZER = False

#: default subword counter — real when tiktoken is importable, stub
#: otherwise (the multimodal ``decode_image`` convention)
count_subword_tokens: Callable[[str | None], int] = (
    _count_subword_tiktoken if HAS_TOKENIZER else _count_subword_stub
)


def _q(name: str) -> str:
    """Backtick-quote a column name so a dotted/spaced user column
    ("a.b", "doc id") resolves as the column, not a struct path."""
    return "`" + name.replace("`", "``") + "`"


def subword_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer_fn: Callable[[str | None], int] | None = None,
    out_col: str = "subword_tokens",
) -> DataFrame:
    """``(id_col, subword_tokens)`` via Arrow-batched ``mapInPandas``.

    ``tokenizer_fn`` is any per-text ``(str) -> int`` counter — it is
    pickled to the Python workers once and applied per Arrow batch
    (vectorized transport, per-row function), so a real BPE tokenizer
    costs one Python call per document, never a row-at-a-time UDF
    round-trip. Defaults to :data:`count_subword_tokens`. Null/empty
    text counts 0 by contract (stubs and the tiktoken wrapper agree).

    Scale shape: a pure projection — one scan, zero shuffles; the id
    type is carried from the input schema so downstream joins need no
    cast."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    counter = tokenizer_fn or count_subword_tokens
    if out_col in ("_sw_id", "_sw_text") or id_col == "_sw_text":
        raise ValueError(
            "_sw_id/_sw_text are reserved by the tokenizer seam's "
            f"internal aliasing; got id_col={id_col!r} out_col={out_col!r}"
        )

    # StructType built programmatically, NOT a DDL f-string: an id
    # column whose name needs quoting (dots, spaces, hyphens) would
    # mis-parse or error out of an interpolated DDL schema.  The seam
    # additionally runs on SAFE temp names ("_sw_id"/"_sw_text") and
    # renames back afterwards: PySpark's own mapInPandas re-resolves
    # every input column by bare name (``Dataset.apply``), which parses
    # "a.b" as struct access — so a dotted/spaced user column can only
    # cross the Arrow boundary under an alias.
    out_schema = StructType(
        [
            StructField("_sw_id", df.schema[id_col].dataType),
            StructField(out_col, IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "_sw_id": pdf["_sw_id"],
                    out_col: [int(counter(t)) for t in pdf["_sw_text"]],
                }
            )

    mapped = df.select(
        F.col(_q(id_col)).alias("_sw_id"), F.col(_q(text_col)).alias("_sw_text")
    ).mapInPandas(run, schema=out_schema)
    return mapped.withColumnRenamed("_sw_id", id_col)


def pack_token_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 4096,
    tokenizer_fn: Callable[[str | None], int] | None = None,
) -> DataFrame:
    """Token-budget shard packing: running token sum over the
    deterministic ``id_col`` order, ``shard_id = floor((cum-1)/budget)``
    — the training-data sequence-packing shape, over
    ``operators.ordered.ordered_running_sum`` (two-phase parallel
    prefix sum; no data-sized single-reducer window).

    Token basis: whitespace tokens JVM-side by default (the
    oracle-stable gate basis of the ``text_pack_shards`` query); pass
    ``tokenizer_fn`` to budget real subword tokens through the
    :func:`subword_token_counts` Arrow seam instead — same plan shape,
    the count projection just moves to the Python workers.

    Null texts count 0 tokens on BOTH bases: the raw JVM expression
    ``size(split(NULL))`` would yield -1 (non-ANSI) and poison every
    downstream ``cum_tokens``/``shard_id`` with a negative, so the
    default basis coalesces nulls to 0 to match the Arrow seam's
    documented null contract.  Empty string stays 1 on the default
    basis (``split('', ' ') = ['']`` — the whitespace-basis oracle
    semantics) while the seam counts it 0; gate data has no empties so
    the bases agree where the oracle looks."""
    from .ordered import ordered_running_sum

    # both bases run on SAFE temp names (the tokenizer seam's own
    # discipline), so a dotted/spaced id or text column works the same
    # whichever basis is active; the id renames back on the way out
    safe = df.select(
        F.col(_q(id_col)).alias("_pk_id"), F.col(_q(text_col)).alias("_pk_text")
    )
    if tokenizer_fn is None:
        toks = safe.select(
            "_pk_id",
            F.when(F.col("_pk_text").isNull(), F.lit(0))
            .otherwise(F.size(F.split(F.col("_pk_text"), " ")))
            .alias("n_tokens"),
        )
    else:
        toks = subword_token_counts(
            safe, "_pk_id", "_pk_text", tokenizer_fn, out_col="n_tokens"
        )
    packed = ordered_running_sum(toks, ["_pk_id"], "n_tokens", out_col="cum_tokens")
    return packed.select(
        F.col("_pk_id").alias(id_col),
        "n_tokens",
        F.floor((F.col("cum_tokens") - 1) / budget).cast("int").alias("shard_id"),
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Bag-of-words fingerprint: md5 of the sorted distinct lowercased
    token set — catches token-permutation duplicates exact dedup
    misses (a rolling-hash/winnowing variant slots in here for
    order-sensitive fingerprints)."""
    fp = F.md5(
        F.array_join(
            F.sort_array(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))), " "
        )
    )
    return df.withColumn(out_col, fp)


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (``idf = ln((N+1)/(df+1)) + 1``) with a deterministic term
    tie-break.

    Plan shape: explode -> per-(doc, term) count [shuffle 1] ->
    per-term document frequency [shuffle 2, |vocab| rows out] -> join
    back on term (AQE picks broadcast while the vocabulary fits, plain
    equi-join when it doesn't) -> per-doc ranking window [shuffle 3,
    partitioned by document so no global sort]. The corpus size N rides
    in as a crossJoined 1-row aggregate — no driver-side count() in the
    plan (and the count scan itself reads only parquet footers).

    ``tf`` is persisted: it feeds BOTH the docfreq aggregate and the
    join's probe side, and Spark reuses neither branch (the round-6
    jaccard finding — differing partials below the exchange block
    ReusedExchange), so without the cache the corpus is scanned,
    exploded, and tf-shuffled twice. The cached frame is the
    post-aggregation (doc, term, count) table — strictly smaller than
    the exploded term stream it replaces; MEMORY_AND_DISK spills under
    pressure.
    """
    from .caching import pin

    terms = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = pin(terms.groupBy("_id", "term").agg(F.count("*").alias("tf")))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tf_idf", F.col("tf") * idf)
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("tf_idf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            "tf",
            F.round("tf_idf", 6).alias("tf_idf"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window document chunking — the context-length shaping
    step of a training/RAG pipeline: token windows of ``chunk_size``
    starting every ``stride`` tokens (overlap = chunk_size - stride),
    one output row per (document, chunk).

    Pure Column expressions (sequence of starts -> transform to token
    slices -> posexplode), so the ~(n/stride)x fan-out happens inside
    whole-stage codegen with no shuffle at all: chunking is a
    map-side-only operator and downstream stages partition the CHUNK
    rows, never the parent documents. Chunk ids are the window index —
    deterministic, so chunk tables are stable join keys across runs.

    Start positions stop at the first window that reaches the last
    token (the final chunk may be shorter than ``chunk_size``; every
    token is covered at least once and no chunk is a strict subset of
    its predecessor — the standard text-splitter convention).

    The token array is BOUND through a projection before the slicing
    transform: the slice lambda references it per start position, and
    an array referenced from inside a HOF lambda is re-evaluated per
    element (the O(n^2) finding in operators.dedup.shingles) — binding
    makes it an attribute read. CollapseProject leaves the binding
    projection intact because inlining would duplicate a non-cheap
    expression across its many references.
    """
    bound = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # last start = smallest multiple of stride covering the tail:
    # ceil((n - chunk_size) / stride) * stride, clamped to >= 0.
    # floor((x + stride-1)/stride) over small ints is exact in double,
    # and the DuckDB oracle twin computes the identical expression.
    last = F.greatest(
        F.floor((n - F.lit(chunk_size) + F.lit(stride - 1)) / F.lit(stride))
        * stride,
        F.lit(0),
    ).cast("int")
    starts = F.sequence(F.lit(0), last, F.lit(stride))
    chunk_arr = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
    return bound.select(
        F.col(id_col),
        F.posexplode(chunk_arr).alias("chunk_id", "_ctoks"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join("_ctoks", " ").alias("chunk_text"),
        F.size("_ctoks").alias("chunk_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, via: str = "array"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rule
    family, adapted to token counts): per document,

    * ``dup_token_frac`` — fraction of token occurrences that repeat an
      earlier token (``(n - n_distinct) / n``);
    * ``top_bigram_frac`` — fraction of all token bigrams taken by the
      most frequent bigram;
    * ``passes_repetition_gate`` — 1 iff ``top_bigram_frac <= 1/5`` and
      ``dup_token_frac <= 7/10``. The gate compares in INTEGER
      arithmetic (``top*5 <= n_bigrams``, ``(n-u)*10 <= 7*n``) so the
      cut is exact — no float-rounding boundary can flip it between
      engines or runs.

    Looping text is the classic failure mode cheap length/stopword
    filters miss; these two signals catch it. Two physical routes with
    identical results (equivalence-tested):

    * ``via="array"`` (default): pure Column expressions (sequence ->
      transform bigrams, array_distinct + filter counting) — one
      codegen projection, ZERO shuffle, runs at scan speed. The per-row
      top-bigram scan is O(distinct x total) on the token count: the
      right choice for chunk/paragraph/web-page sized text.
    * ``via="explode"``: bigram stream -> per-(doc, gram) count ->
      per-doc max/sum — two map-side-combinable aggregates (shuffle
      keys are (doc, gram-hash)-sized). O(n log n)-ish instead of
      O(n*u) per doc: the route for book-length documents where the
      quadratic per-row scan would stall a task, at the price of
      shuffling the bigram stream.
    """
    if via not in ("array", "explode"):
        raise ValueError(f"via must be 'array' or 'explode', got {via!r}")
    if via == "explode":
        toks = F.split(F.col(text_col), " ")
        base = df.select(
            F.col(id_col),
            F.size(toks).alias("_n"),
            F.size(F.array_distinct(toks)).alias("_u"),
        )
        # zip_with over shifted slices (not an index lambda) — see the
        # repetition_parts perf note.
        grams = df.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.concat_ws(" ", a, b),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("_gram"),
        )
        per_doc = (
            grams.groupBy(id_col, "_gram")
            .agg(F.count("*").alias("_c"))
            .groupBy(id_col)
            .agg(
                F.max("_c").alias("_top"),
                F.sum("_c").cast("int").alias("_nb"),
            )
        )
        j = base.join(per_doc, id_col, "left").select(
            F.col(id_col),
            "_n",
            "_u",
            F.coalesce(F.col("_top"), F.lit(0)).alias("_top"),
            F.coalesce(F.col("_nb"), F.lit(0)).alias("_nb"),
        )
        return j.select(
            F.col(id_col),
            F.round((F.col("_n") - F.col("_u")).cast("double") / F.col("_n"), 6)
            .alias("dup_token_frac"),
            F.when(
                F.col("_nb") > 0,
                F.round(F.col("_top").cast("double") / F.col("_nb"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
            (
                (F.col("_top") * 5 <= F.col("_nb"))
                & ((F.col("_n") - F.col("_u")) * 10 <= 7 * F.col("_n"))
            )
            .cast("int")
            .alias("passes_repetition_gate"),
        )
    n, n_uniq, n_bigrams, top_cnt = repetition_parts(F.col(text_col))
    dup_frac = F.round((n - n_uniq).cast("double") / n, 6)
    top_frac = F.when(
        n_bigrams > 0, F.round(top_cnt.cast("double") / n_bigrams, 6)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        dup_frac.alias("dup_token_frac"),
        top_frac.alias("top_bigram_frac"),
        repetition_gate(F.col(text_col)).cast("int").alias(
            "passes_repetition_gate"
        ),
    )


def repetition_parts(text: Column) -> tuple[Column, Column, Column, Column]:
    """The repetition battery's building blocks as Columns:
    ``(n_tokens, n_unique_tokens, n_bigrams, top_bigram_count)`` — the
    ONE definition both ``repetition_stats`` and composite pipelines
    (``pipeline_pretrain_corpus``) gate on, so the two can never
    disagree.

    ``top_bigram_count`` is the max RUN LENGTH over the sorted gram
    array, folded in ONE ``aggregate`` pass. The obvious formulation —
    ``array_max(transform(array_distinct(grams), d ->
    size(filter(grams, g == d))))`` — re-evaluates the ``grams``
    CONSTRUCTION (split -> sequence -> transform -> concat_ws) once per
    distinct element, because a higher-order function's array argument
    is an expression re-evaluated at each invocation, not a bound
    value: measured ~30 ms/row on 40-token docs (15 s for 500 rows vs
    ~0.3 s for this form). A single aggregate evaluates its input
    array exactly once. ``prev`` starts as "" which no real bigram can
    equal (concat_ws always inserts the separator, so the shortest
    bigram is a single space)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    # zip_with over shifted slices, NOT an index lambda over sequence():
    # an array referenced from inside a HOF lambda is re-evaluated per
    # element (same finding as operators.dedup.shingles — O(n^2)).
    grams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(grams)
    top_cnt = F.aggregate(
        F.sort_array(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, g: F.struct(
            g.alias("prev"),
            F.when(g == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best, F.when(g == a.prev, a.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda a: a.best,
    )
    return n, n_uniq, n_bigrams, top_cnt


def repetition_gate(text: Column) -> Column:
    """Boolean pass/fail of the repetition gate in INTEGER arithmetic
    (``top*5 <= n_bigrams`` and ``(n-u)*10 <= 7*n``) — exact, so no
    float-rounding boundary can flip it between engines or runs."""
    n, n_uniq, n_bigrams, top_cnt = repetition_parts(text)
    return (top_cnt * 5 <= n_bigrams) & ((n - n_uniq) * 10 <= 7 * n)
