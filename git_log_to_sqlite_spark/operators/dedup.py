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

import re
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .caching import pin
from .skew import _quantile_cap  # noqa: F401 — re-export; see note at
# the round-14 relocation comment (the shared quantile statistic moved
# to skew so skew no longer imports dedup; this direction is cycle-free
# because skew's remaining dedup references are docstring-only)

if TYPE_CHECKING:
    from pyspark.sql import Observation

# Logical-plan node names whose presence means the plan already
# contains (or states intent about) an exchange, matched at node-name
# position in the tree string — see _spread. Prefix match, so
# RepartitionByExpression / Deduplicate / GlobalLimit variants hit.
_SHUFFLE_NODE_RE = re.compile(
    r"^[\s:+\-]*(?:Repartition|Aggregate|Join|Window|Sort|Deduplicate"
    r"|Distinct|GlobalLimit|Except|Intersect)",
    re.MULTILINE,
)


def md5_long(col: Column, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative BIGINT
    (15 hex = 60 bits, inside int64)."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def ngram_chain(tokens: Column, n: int) -> Column:
    """Positional word n-grams WITH multiplicity (a bag, in document
    order). Guarded so short docs yield [] (slice with a non-positive
    length only exists in the untaken CASE branch).

    Built as a zip_with chain over n shifted slices — NEVER as
    ``transform(sequence(...), i -> ...get(tokens, i+k)...)``: a
    higher-order function's array ARGUMENT is evaluated once, but an
    array referenced from inside its LAMBDA is re-evaluated per
    element, so the index-lambda form re-runs the whole ``tokens``
    construction (typically ``split``) once per shingle — O(tokens^2)
    per document. Measured on 200 x 2000-token docs: 18.7 s
    (index-lambda) vs 0.3 s (this form), identical outputs. This is
    the ONE place the chain lives: :func:`shingles` distincts it,
    DSIR's hashed bigram features consume the raw bag."""
    L = F.size(tokens) - (n - 1)
    parts = [F.slice(tokens, k + 1, L) for k in range(n)]
    acc = parts[0]
    for k in range(1, n):
        acc = F.zip_with(acc, parts[k], lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(tokens) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a tokens array — the deduped
    form of :func:`ngram_chain` (see it for the zip_with-vs-
    index-lambda rationale)."""
    return F.when(
        F.size(tokens) >= n, F.array_distinct(ngram_chain(tokens, n))
    ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(text_col: str, n: int) -> Column:
    """One-row-per-distinct-n-gram explode expression over a text
    column. A Column, not a per-frame closure: it resolves against
    whatever frame selects it (both sides of decontaminate, the
    pretrain pipeline's corpus and benchmark) by column NAME."""
    return F.explode(shingles(F.split(F.col(text_col), " "), n))


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the input has at least default-parallelism partitions
    before a compute-heavy explode: a single-file scan arrives as ONE
    partition and would serialize the shingle/hash work on one core.
    The repartition shuffles only the raw rows (cheap relative to the
    explode it unlocks); inputs that are already wide pass through.

    The probe is the PHYSICAL partition count
    (``df.rdd.getNumPartitions()``): every cheaper proxy is unsound
    under FileSourceScan's partition packing (``len(inputFiles())``
    fails in both directions — many tiny files pack into 1-2
    partitions via openCostInBytes, so a high file count skips the
    widening exactly when the explode would serialize, and
    through-shuffle leaf files make an already-wide aggregated frame
    look narrow; byte-size estimates re-implement the packing logic
    they try to avoid).

    The probe runs ONLY on shuffle-free plans (scan / filter /
    project / generate), where ``.rdd`` compiles whole-stage codegen
    but launches no job. On a plan containing exchanges the probe
    itself would EXECUTE them — under AQE, ``.rdd`` forces the final
    physical plan, which submits and awaits every upstream query
    stage — and the real action would then run the same shuffles
    again, doubling the work. Those plans skip the guard instead:
    anything below a shuffle is already ``spark.sql.shuffle.
    partitions`` wide (and an explicit repartition states the
    caller's intent), so the single-partition pathology this guard
    exists for cannot occur there."""
    sc = df.sparkSession.sparkContext
    try:
        analyzed = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        analyzed = ""
    # Match shuffle markers only where NODE NAMES render in the tree
    # string: at the start of a line, after the tree-branch prefix
    # (":  ", "+- ", ":- ", indentation). A bare substring scan
    # false-positives on user COLUMN names (SortKey#12, JoinDate#3)
    # or file paths echoed inside a node's bracket list, silently
    # skipping the widening in exactly the single-partition case this
    # guard exists for. Subquery plans print as indented sub-trees in
    # the analyzed string, so their nodes still match here. Prefix
    # (not word) match keeps RepartitionByExpression etc. covered.
    if _SHUFFLE_NODE_RE.search(analyzed):
        return df
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup with a deterministic survivor.

    Groups on a 128-bit content hash (never the raw content: the
    shuffle key is 32 bytes/row at any document size) and keeps the
    min/max id. Returns the input columns of the surviving rows plus
    ``n_copies``. ``id_col`` must be unique and non-null (the table-
    key contract every id column here carries): a NULL id can never
    survive (min/max skip NULLs, and NULL == NULL is not true).
    """
    fp = F.md5(F.concat_ws("\x00", *content_cols))
    # ONE unordered window for both the survivor pick and the count
    # (ids are unique, so min/max id IS the row_number-1 survivor).
    # The previous two-spec form (row_number over an ordered window +
    # count over an unordered one) planned TWO Window nodes, each
    # buffering every duplicate family on one task, and the count
    # window sat between the rank filter and its window, blocking the
    # WindowGroupLimit pushdown entirely (probed: no WindowGroupLimit
    # in the plan). This form buffers each family once, with no
    # per-family sort on the id — the viral-family exposure stays
    # linear (inherent: n_copies needs the whole family) but pays one
    # pass instead of two sorted ones. The registry's `dedup_exact`
    # twin is the groupBy-aggregate form — partial-combine, fully
    # skew-proof — for when no per-row annotation is needed.
    w = Window.partitionBy("_fp")
    keeper = (F.min if keep == "min" else F.max)(F.col(id_col)).over(w)
    return (
        df.withColumn("_fp", fp)
        .withColumn("_keep", keeper)
        .withColumn("n_copies", F.count("*").over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_fp", "_keep")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Wide-format MinHash signatures: (id, mh_0 .. mh_{k-1}).

    All K minhashes are computed as K min-aggregates in ONE groupBy
    pass over the exploded shingles — no K-fold row explosion and no
    per-(id, j) shuffle (the naive long-format plan shuffles K x
    |shingles| rows; this shuffles |shingles| rows once and reduces
    map-side). Signature size is K x 8 bytes regardless of document
    length.
    """
    df = _spread(df)
    sh = df.select(
        F.col(id_col).alias("_id"),
        exploded_shingles(text_col, shingle_n).alias("shingle"),
    )
    mins = [
        F.min(md5_long(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("_id").agg(*mins).withColumnRenamed("_id", id_col)


def _band_keys(
    mh: DataFrame, id_col: str, num_hashes: int, rows_per_band: int
) -> DataFrame:
    """Project wide signatures to (id, band, band_key) rows — a pure
    codegen fan-out (array of structs + explode), no aggregate."""
    n_bands = num_hashes // rows_per_band
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return mh.select(F.col(id_col), F.explode(band_entries).alias("e")).select(
        id_col, F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
    )


def _hot_key_set(
    keyed: DataFrame,
    key_cols: list[str],
    max_abs: int | None,
    quantile: float | None,
    quantile_headroom: int = 1,
    observation: "Observation | None" = None,
    dropped_name: str = "keys_dropped",
    avoided: str = "pairs",
) -> DataFrame:
    """The ONE hot-key derivation every skew valve shares (jaccard
    shingles, minhash/simhash band buckets, substring windows —
    previously three drifting copies): (1) a map-combinable count per
    key over ``keyed`` — partial counts combine map-side, so the count
    shuffle is skew-free by construction; (2) cap = ``max_abs``, or
    ``quantile_headroom`` x the q-quantile of the repeated-key count
    distribution (:func:`_quantile_cap`, derived in-plan and broadcast
    back; the headroom multiply is integer and mirrored in every SQL
    oracle twin, so the engines cannot diverge by a rounding ulp);
    (3) the above-cap key set, returned PINNED — one row per
    degenerate key, near-zero rows in natural corpora, and the
    quantile chain above it is three tiny serialized stages that
    would otherwise re-execute on every consumption.

    Exactly one of ``max_abs`` / ``quantile`` must be set; callers
    validate mutual exclusion in their own parameter vocabulary.
    Telemetry is EAGER (see :func:`_capped_bands`'s docstring for the
    three measured AQE failure modes of a lazily-planned valve
    observation): ``dropped_name`` counts capped keys, and ``avoided``
    picks the second metric — ``"pairs"`` reports ``pairs_avoided`` =
    sum d(d-1)/2 over capped keys (self-join callers), ``"rows"``
    reports ``rows_dropped`` = sum d (probe-side callers). Sums
    coalesce to 0 so an empty d>=2 histogram reports honest zeros,
    never SQL NULL.
    """
    counts = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= 2)
    )
    if quantile is not None or observation is not None:
        # quantile route: counts is consumed twice (histogram, then
        # hot filter) — 16 B per distinct repeated key, the smallest
        # aggregate in any caller. Absolute route with telemetry: the
        # eager metrics job below would re-aggregate the stream
        # without the pin. pin() registers it for release_caches().
        counts = pin(counts)
    if quantile is not None:
        # 1-row broadcast: every count row sees the derived cap (a
        # BuildRight nested-loop join whose build side is ONE row —
        # the broadcast-scalar plan, not a data x data nested loop).
        hot = counts.crossJoin(
            F.broadcast(
                _quantile_cap(
                    counts.select(F.col("d").cast("long").alias("d")), quantile
                )
            )
        )
        cap = F.col("_max_df") * F.lit(quantile_headroom)
    else:
        hot = counts
        cap = F.lit(max_abs)
    if observation is not None:
        d = F.col("d").cast("long")
        if avoided == "pairs":
            second = F.coalesce(
                F.sum(F.when(d > cap, d * (d - 1) / 2).otherwise(0)), F.lit(0)
            ).cast("long").alias("pairs_avoided")
        else:
            second = F.coalesce(
                F.sum(F.when(d > cap, d).otherwise(0)), F.lit(0)
            ).cast("long").alias("rows_dropped")
        hot.observe(
            observation,
            F.coalesce(F.sum((d > cap).cast("long")), F.lit(0)).alias(
                dropped_name
            ),
            second,
        ).count()  # JVM-only drain; completes the Observation
    return pin(hot.filter(F.col("d").cast("long") > cap).select(*key_cols))


def _validate_band_caps(
    max_band_size: int | None,
    band_size_quantile: float | None,
    observation: "Observation | None",
) -> None:
    """Valve-argument validation shared by every band-valve caller —
    invoked by each ENTRY POINT before its signature pin (a check that
    fires only inside :func:`_capped_bands` runs after the pin and
    leaks a never-materialized cache-registry entry until
    ``release_caches()``), and again by ``_capped_bands`` itself for
    direct callers."""
    if max_band_size is not None and band_size_quantile is not None:
        raise ValueError("max_band_size and band_size_quantile are mutually exclusive")
    if (
        observation is not None
        and max_band_size is None
        and band_size_quantile is None
    ):
        raise ValueError(
            "observation requires a cap (max_band_size or "
            "band_size_quantile); without one it would never be "
            "attached and Observation.get would block/raise far "
            "from the cause"
        )


def _validate_df_caps(
    max_df: int | None,
    max_df_quantile: float | None,
    observation: "Observation | None",
) -> None:
    """Occurrence-cap argument validation shared by every
    inverted-index caller (batch/incremental substring, video scenes,
    audio segments) — the ``max_df`` vocabulary twin of
    :func:`_validate_band_caps`, called by each entry point BEFORE
    any pin and again by :func:`_span_pairs_from_windows` for direct
    callers."""
    if max_df is not None and max_df_quantile is not None:
        raise ValueError("max_df and max_df_quantile are mutually exclusive")
    if observation is not None and max_df is None and max_df_quantile is None:
        raise ValueError(
            "observation requires a cap (max_df or max_df_quantile); "
            "without one it would never be attached and Observation.get "
            "would block/raise far from the cause"
        )


def _capped_bands(
    bands: DataFrame,
    max_band_size: int | None,
    band_size_quantile: float | None,
    observation: "Observation | None" = None,
    quantile_headroom: int = 10,
    join_shape: str = "self",
) -> DataFrame:
    """Hot-band skew valve: anti-filter degenerate band buckets out of
    an (id, band, band_key) table BEFORE it feeds a band equi-join.

    A band bucket with d documents emits d(d-1)/2 candidate pairs —
    quadratic in the hottest key, exactly the blowup a stop-shingle
    causes in the jaccard inverted index. Degenerate band keys are a
    real corpus pathology: near-empty documents all minhash to the
    same few values, and templated boilerplate collapses whole shards
    onto one band key. The valve is the same two-phase shape as the
    jaccard df cap: (1) a map-combinable count per (band, band_key) —
    partial counts combine map-side, so the count shuffle is skew-free
    by construction; (2) the above-cap bucket set anti-filters the
    bands table before the self/probe join, so the join never sees a
    hot key and candidate mass stays bounded by cap x buckets.

    The quantile route is a SPREAD guard, not a tail cut: cap =
    ``quantile_headroom`` x the q-quantile of the repeated-bucket-size
    distribution (:func:`_quantile_cap`). Two reasons it differs from
    the jaccard cap's direct quantile. (a) Each LSH band carries
    rows_per_band/num_hashes of the whole signature, so buckets
    moderately past the bulk DO witness unique true pairs (measured at
    sf0.1: the one d=13 bucket against a p92 of 3 carries 77 pairs no
    other band re-finds) — a direct tail quantile would shed recall.
    (b) A degenerate bucket inflates its own histogram's tail, so as
    q -> 1 the derived cap converges to the degenerate size and the
    valve never fires — the failure mode it exists for. Anchoring at
    the bulk (p92) and granting an order-of-magnitude headroom keeps
    every naturally-sized bucket (natural max / p92 stays within one
    magnitude — zipfian band keys are exactly what minhashing
    destroys) while any degenerate key, which lands orders of
    magnitude out, is dropped no matter how it skews the tail.

    The anti-join is deliberately unhinted, mirroring the jaccard
    hot-set join: the hot bucket set is tiny in natural corpora (the
    planner broadcasts it from size estimates) but grows with corpus
    pathology, where the planner degrades to a memory-safe shuffle
    anti-join on the same (band, band_key) key the candidate join
    shuffles on anyway.

    ``max_band_size`` (absolute, applied as-is) and
    ``band_size_quantile`` (the spread guard above) are mutually
    exclusive; with neither, the bands pass through unfiltered (and
    ``observation`` would never attach, so it raises). Telemetry
    follows ``join_shape``: ``"self"`` (the batch operator's
    self-join) reports ``bands_dropped`` + ``pairs_avoided`` =
    sum d(d-1)/2 over dropped buckets; ``"probe"`` (the incremental
    operator, where this table is the build side of an
    increment x history join) reports ``bands_dropped`` +
    ``rows_dropped`` = sum d — the candidates avoided there are
    |increment bucket| x d, unknowable from this side alone, and
    reporting the self-join formula would overstate the win by the
    ratio of history to increment bucket sizes.

    Telemetry is EAGER: when ``observation`` is passed, the metrics
    are computed at call time by a dedicated tiny job over the count
    table (pinned, so the consuming query reuses it — the extra job
    aggregates one cached row per repeated bucket), and
    ``Observation.get`` is readable immediately. This is the only
    shape that survives Spark's runtime machinery, all measured on
    this box: (a) a CollectMetrics node inside an AQE query stage —
    anywhere below the exchanges the consuming band join needs — does
    not propagate its metrics row once the corpus is big enough for
    AQE to wrap stages, and Observation.get fails on an empty row;
    (b) when the valve does not fire, AQE's empty-relation
    propagation prunes the runtime-empty anti-join build side
    together with any observe node inside it; (c) a self-join of one
    observed frame duplicates the CollectMetrics node and the metrics
    row again never materializes. Observing a root-level frame that
    the operator itself consumes exactly once sidesteps all three.
    The observed sums also coalesce to 0 — an empty d>=2 histogram
    makes SQL sum-over-empty NULL, and the honest no-hot-bucket
    report is 0, not None.
    """
    if join_shape not in ("self", "probe"):
        raise ValueError(f"join_shape must be 'self' or 'probe', got {join_shape!r}")
    _validate_band_caps(max_band_size, band_size_quantile, observation)
    if max_band_size is None and band_size_quantile is None:
        return bands
    hot = _hot_key_set(
        bands,
        ["band", "band_key"],
        max_band_size,
        band_size_quantile,
        quantile_headroom=quantile_headroom,
        observation=observation,
        dropped_name="bands_dropped",
        avoided="pairs" if join_shape == "self" else "rows",
    )
    return bands.join(hot, ["band", "band_key"], "left_anti")


def _validate_salting(salt_buckets: int, salt_min_bucket: int | None) -> None:
    """Salt-argument validation shared by every band-join entry point
    — called BEFORE any pin (the :func:`_validate_band_caps` rule) and
    again by :func:`_band_self_pairs` for direct callers. Delegates to
    the one shared validator (:func:`~.skew._validate_pair_salting`)
    in this family's parameter vocabulary."""
    from .skew import _validate_pair_salting

    _validate_pair_salting(salt_buckets, salt_min_bucket, "salt_min_bucket")


def _band_self_pairs(
    bands: DataFrame,
    id_col: str,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Candidate ``(id_a, id_b)`` pairs from an (id, band, band_key)
    table: self-join on the bucket key with ``id_a < id_b``, distinct
    across bands — the ONE band self-join both LSH families share
    (minhash band keys via :func:`minhash_lsh_pairs`, simhash /
    perceptual bit slices via :func:`hamming_pairs`; previously two
    identical inline copies). Sides are column-renamed projections,
    not aliases: an alias does not survive the salting branch's
    ``withColumn``/``repartition``, renamed columns do.

    ``salt_buckets > 1`` engages :func:`~.skew.salted_pair_sides` —
    the recall-PRESERVING arm against a hot bucket, complementing the
    :func:`_capped_bands` valve's recall-shedding drop: a degenerate
    bucket with d members is ONE join key, so one task pays its
    d(d-1)/2 pairs serially; salting spreads that work over S tasks
    with row-identical output (every pair still meets exactly once,
    at a's salt — the ``distinct`` across bands is unaffected because
    salting never duplicates a (band, pair) meeting). Default 1 keeps
    the gated plans' join shape unchanged. Arm it when the valve's
    telemetry reports hot buckets the caller cannot afford to DROP
    (e.g. fuzzy decontamination, where the docstring voids the recall
    guarantee under any cap).

    ``salt_min_bucket`` makes the salt TARGETED — the production form
    at corpus scale: only buckets with >= that many members are
    salted/replicated (derived by the valve's own
    :func:`_hot_key_set` count, map-combinable and skew-free), every
    other bucket's shuffle volume is unchanged. Without it the whole
    b-side replicates S ways — fine at probe scale, a non-starter on
    a corpus-sized bands table, and measured on this box to overtake
    its own win as S grows (BASELINE.md's hot-band probe). Note the
    regime: at small corpus the unsalted join broadcast-converts and
    the stream side rides the signature groupBy's id partitioning —
    already parallel, salting only adds cost; the knob is for the
    at-scale SMJ regime where the bucket key IS the shuffle key and
    one hot bucket is one task."""
    _validate_salting(salt_buckets, salt_min_bucket)
    a = bands.select(
        F.col("band").alias("_band_a"),
        F.col("band_key").alias("_bk_a"),
        F.col(id_col).alias("id_a"),
    )
    b = bands.select(
        F.col("band").alias("_band_b"),
        F.col("band_key").alias("_bk_b"),
        F.col(id_col).alias("id_b"),
    )
    pair_cond = (
        (F.col("_band_a") == F.col("_band_b"))
        & (F.col("_bk_a") == F.col("_bk_b"))
        & (F.col("id_a") < F.col("id_b"))
    )
    if salt_buckets > 1:
        from .skew import salted_pair_sides

        hot_a = hot_b = None
        if salt_min_bucket is not None:
            hot = _hot_key_set(
                bands, ["band", "band_key"], salt_min_bucket - 1, None
            )
            hot_a = hot.select(
                F.col("band").alias("_band_a"),
                F.col("band_key").alias("_bk_a"),
            )
            hot_b = hot.select(
                F.col("band").alias("_band_b"),
                F.col("band_key").alias("_bk_b"),
            )
        a, b, salt_cond = salted_pair_sides(
            a,
            b,
            ["_band_a", "_bk_a"],
            ["_band_b", "_bk_b"],
            "id_a",
            salt_buckets,
            hot_a=hot_a,
            hot_b=hot_b,
        )
        pair_cond = pair_cond & salt_cond
    return a.join(b, pair_cond).select("id_a", "id_b").distinct()


def _band_probe_pairs(
    bands_p: DataFrame,
    bands_c: DataFrame,
    p_ids: list[str],
    c_ids: list[str],
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs from a probe-bands x corpus-bands equi-join on
    (band, band_key) — the PROBE-shaped twin of
    :func:`_band_self_pairs`, shared by :func:`hamming_probe` and
    :func:`incremental_minhash_dedup` (previously two inline copies).
    Returns ``(*p_ids, *c_ids)`` distinct.

    ``salt_buckets > 1`` is the same recall-preserving hot-bucket arm,
    with the sides chosen for the probe shape's asymmetry: the CORPUS
    side (100 TB of history/train — the big one) takes the
    deterministic per-row salt, and the PROBE side (a daily increment,
    an eval suite — the small one) replicates S ways, so the
    replication price lands on the side that can afford it. A hot
    bucket's |probe bucket| x |corpus bucket| candidate product — one
    join key, one task, and invisible to AQE's byte-based sizing
    because the explosion is downstream of the shuffle read — spreads
    over S tasks with row-identical output (each (p, c) match meets
    exactly once, at c's salt). ``salt_min_bucket`` targets the salt
    at corpus buckets >= that size (hotness measured on the CORPUS
    side, matching the probe-shape valve's ``join_shape='probe'``
    counting); everything below keeps salt 0 and its shuffle volume
    unchanged. This is the arm :func:`fuzzy_decontaminate` can
    actually use: its docstring forbids the capping valve (a capped
    train bucket is a silent false negative), and salting preserves
    the pigeonhole recall guarantee by construction.

    Arming precondition (the round-13 regime law, BASELINE.md): the
    single-key serialization this arm fixes only EXISTS when the
    join shuffles. A probe side small enough to broadcast gives a
    BroadcastHashJoin, which parallelizes a hot bucket's product
    over the corpus side's input splits — no hot task, nothing to
    salt, and arming (whose co-partition pin forces the shuffled
    join) can only lose. Arm for backfill-scale probes; never for a
    broadcastable daily increment."""
    _validate_salting(salt_buckets, salt_min_bucket)
    if salt_buckets <= 1:
        return (
            bands_p.join(bands_c, ["band", "band_key"])
            .select(*p_ids, *c_ids)
            .distinct()
        )
    from .skew import salted_pair_sides

    a = bands_c.select(
        F.col("band").alias("_band_c"),
        F.col("band_key").alias("_bk_c"),
        *c_ids,
    )
    b = bands_p.select(
        F.col("band").alias("_band_p"),
        F.col("band_key").alias("_bk_p"),
        *p_ids,
    )
    pair_cond = (F.col("_band_c") == F.col("_band_p")) & (
        F.col("_bk_c") == F.col("_bk_p")
    )
    hot_a = hot_b = None
    if salt_min_bucket is not None:
        hot = _hot_key_set(
            bands_c, ["band", "band_key"], salt_min_bucket - 1, None
        )
        hot_a = hot.select(
            F.col("band").alias("_band_c"), F.col("band_key").alias("_bk_c")
        )
        hot_b = hot.select(
            F.col("band").alias("_band_p"), F.col("band_key").alias("_bk_p")
        )
    a, b, salt_cond = salted_pair_sides(
        a,
        b,
        ["_band_c", "_bk_c"],
        ["_band_p", "_bk_p"],
        list(c_ids),
        salt_buckets,
        hot_a=hot_a,
        hot_b=hot_b,
    )
    return a.join(b, pair_cond & salt_cond).select(*p_ids, *c_ids).distinct()


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    min_agree: float = 0.25,
    shingle_n: int = 3,
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    Returns (id_a, id_b, est_jaccard). Candidates come from an
    equi-join on (band, band_key) — two docs collide iff one band of
    their signatures matches exactly, so the join output is the
    candidate set itself, never n^2. Working from wide signatures,
    band keys are a projection (no extra aggregate) and the agreement
    estimate is a column comparison on a single joined row per pair
    (no K-row re-join).

    ``max_band_size`` / ``band_size_quantile`` engage the hot-band
    skew valve (:func:`_capped_bands`): degenerate band buckets — the
    one quadratic-risk surface of the band join — are anti-filtered
    before the self-join, bounding candidate mass by cap x buckets.
    Pass an :class:`~pyspark.sql.Observation` to receive
    ``bands_dropped`` / ``pairs_avoided`` telemetry. ``salt_buckets``
    is the recall-PRESERVING alternative when a hot bucket must be
    consumed rather than dropped: the self-join spreads each bucket's
    pair work over S tasks with row-identical output; add
    ``salt_min_bucket`` to salt ONLY buckets that size or larger —
    the bounded-replication production form (:func:`_band_self_pairs`).
    """
    _validate_band_caps(  # before the pin — a bad call must not leak a cache entry
        max_band_size, band_size_quantile, observation
    )
    _validate_salting(salt_buckets, salt_min_bucket)  # same rule
    # The signature table is referenced 4x downstream (both band-join
    # branches + both agreement joins); without persisting, Spark
    # recomputes the shingle explode + K-way min aggregate per branch.
    # Signatures are K x 8 bytes/doc — tiny relative to the corpus.
    # pin() registers the cache for release_caches()/cache_scope().
    mh = pin(minhash_signatures(df, id_col, text_col, num_hashes, shingle_n))
    bands = _capped_bands(
        _band_keys(mh, id_col, num_hashes, rows_per_band),
        max_band_size,
        band_size_quantile,
        observation,
    )

    cand = _band_self_pairs(bands, id_col, salt_buckets, salt_min_bucket)
    ma = mh.select(
        F.col(id_col).alias("_ida"), *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(num_hashes)]
    )
    mb = mh.select(
        F.col(id_col).alias("_idb"), *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(num_hashes)]
    )
    agree = sum(
        F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    return (
        cand.join(ma, F.col("id_a") == F.col("_ida"))
        .join(mb, F.col("id_b") == F.col("_idb"))
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / num_hashes).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_agree)
    )


def recommend_salt_min_bucket(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    quantile: float = 0.92,
    spread: int = 10,
    straggler_factor: float = 2.0,
) -> "int | None":
    """Derive a recommended ``salt_min_bucket`` for this corpus at
    these banding parameters, from the band-bucket size distribution
    the hot-band valve observes (:func:`~.skew.
    recommend_salt_threshold` — the shared spread + straggler
    guards). ``None`` means don't arm: every bucket sits near the
    bulk, or the hottest bucket's pair mass is too light to be the
    critical path. A non-None value passes verbatim to
    :func:`minhash_lsh_pairs` ``salt_min_bucket`` at the SAME banding
    parameters — the recommendation is a property of THIS band-bucket
    distribution, so it does NOT transfer to :func:`simhash_pairs` /
    :func:`hamming_pairs`, whose buckets come from signature
    bit-slices: for those, feed their own band frames
    (:func:`_sig_bands`) to the core helper with the
    ``["band", "band_key"]`` keys.
    Diagnostic-only: no pins, no effect on any subsequent plan — but
    the convenience costs one corpus pass (the shingle explode + K-way
    min signature build); at production scale, prefer handing
    :func:`~.skew.recommend_salt_threshold` the band frame your
    pipeline already computes instead of re-deriving it here."""
    from .skew import recommend_salt_threshold

    mh = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    bands = _band_keys(mh, id_col, num_hashes, rows_per_band)
    return recommend_salt_threshold(
        bands,
        ["band", "band_key"],
        quantile=quantile,
        spread=spread,
        straggler_factor=straggler_factor,
    )


# _quantile_cap lives in skew.py since round 14: the recommend helper
# made the skew <-> dedup cycle load-bearing in both directions (dedup
# pulled salted_pair_sides, skew pulled _quantile_cap via a
# function-body import); lifting the shared quantile statistic into
# skew makes every import point one direction (dedup -> skew).  The
# module-top re-export keeps dedup._quantile_cap valid for existing
# callers and docstring references.


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.2,
    shingle_n: int = 3,
    max_df: int | None = None,
    max_df_quantile: float | None = None,
    observation: "Observation | None" = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs >= threshold via an inverted index.

    Plan shape: ONE groupBy(shingle) builds the posting list (sorted
    doc ids per shingle), then each posting list explodes into its
    (i < j) id pairs and a second groupBy counts common shingles per
    pair. This replaces the naive shingle self-join (two shuffle
    branches + a join, recomputing the explode on both sides) with two
    shuffles total — same output, about half the shuffle volume.

    The df cap is the skew valve: a hot (stop-)shingle whose posting
    list has d documents contributes d(d-1)/2 pairs — quadratic in the
    hottest key, the thing that falls over first at corpus scale.
    Above-cap shingles are anti-filtered out of the exploded stream
    BEFORE the posting aggregate (round 7: a map-combinable per-shingle
    count derives the hot set, which broadcasts back), so neither the
    collect_list buffer nor the pair explode ever sees a hot shingle —
    a stop-shingle posting array would otherwise be O(corpus), the
    operator's OOM unit. The cap makes the reported jaccard a lower
    bound: hot shingles no longer count toward the intersection, while
    union sizes stay full-corpus. In practice near-dup pairs are
    carried by their rare shingles — at a ~p92 cap the >=0.2 pair SET
    is unchanged at both test SFs while the pair explode shrinks
    measurably.

    Two spellings, mutually exclusive:

    * ``max_df_quantile`` (preferred): the cap is the q-quantile of the
      posting-list-length distribution, derived inside the plan by
      :func:`_quantile_cap` and broadcast back — it scales with the
      corpus instead of baking in an absolute.
    * ``max_df``: an explicit absolute cap, for callers that pre-tuned
      one.

    Pass an :class:`~pyspark.sql.Observation` as ``observation`` to
    receive ``shingles_dropped`` / ``pairs_avoided`` telemetry.
    Telemetry is EAGER — the metrics run as a dedicated tiny job over
    the pinned per-shingle count table at CALL time, and
    ``Observation.get`` is readable immediately. (A lazily-planned
    observe node inside this operator's join subtree loses its
    metrics row under AQE — buried in a query stage, pruned with an
    empty build side, or duplicated — see
    :func:`_capped_bands`'s docstring for the measured failure
    modes.)
    """
    df = _spread(df)
    # 64-bit-hash the shingle immediately: the groupBy/shuffle key is
    # 8 bytes instead of a 20-40 byte trigram string (~10% here, and
    # the dominant shuffle-bytes saving at corpus scale). A collision
    # would merge two shingles' posting lists; at S distinct shingles
    # the probability is ~S^2/2^65 — for S = 10^9, about 3e-2 per
    # CORPUS, and a single collision perturbs one pair count by 1.
    sh = df.select(
        F.col(id_col).alias("_id"),
        exploded_shingles(text_col, shingle_n).alias("shingle"),
    ).select("_id", F.xxhash64("shingle").alias("shingle"))
    # per-doc shingle count is a pure projection (shingles() dedups),
    # NOT an aggregate over the exploded table — zero extra shuffles.
    # Persisted because BOTH sides of the final pair join consume it
    # and neither static planning nor AQE reuses the identical
    # broadcast subtree (verified on the executed plan: 0
    # ReusedExchange) — without the cache the full text column is
    # scanned and shingled twice more. The cached table is two machine
    # words per DOCUMENT (not per shingle), the smallest frame in the
    # operator; it spills via MEMORY_AND_DISK if even that binds.
    sizes = pin(
        df.select(
            F.col(id_col).alias("_id"),
            F.size(shingles(F.split(F.col(text_col), " "), shingle_n)).alias("n_sh"),
        )
    )
    _validate_df_caps(max_df, max_df_quantile, observation)
    if max_df is not None or max_df_quantile is not None:
        # Two-phase cap (round 7): bound the AGGREGATE, not just its
        # output. Filtering posting lists after collect_list still
        # builds the full array for every hot shingle first — a
        # stop-shingle posting is O(corpus), the OOM/skew unit of this
        # operator at scale. Instead: (1) a map-combinable count per
        # shingle (partial counts combine map-side, so the shuffle
        # carries one (shingle, n) pair per shingle per map task —
        # skew-free by construction); (2) the above-cap shingle set
        # anti-filters the exploded stream BEFORE collect_list, so no
        # aggregation buffer ever exceeds cap ids. Costs one extra
        # scan+shingle map pass over the corpus; persisting the
        # exploded (id, shingle) stream instead would cache
        # ~16 B x every shingle occurrence (corpus-sized), strictly
        # worse at scale.
        hot = _hot_key_set(
            sh,
            ["shingle"],
            max_df,
            max_df_quantile,
            quantile_headroom=1,  # direct quantile: rare shingles carry
            # the pairs, so the tight cap is lossless (pair-set tests)
            observation=observation,
            dropped_name="shingles_dropped",
            avoided="pairs",
        )
        # No broadcast HINT on the anti-join: the hot set is the top
        # (1-q) fraction of distinct repeated shingles, which grows
        # LINEARLY with corpus size — at the 100-TB design point a
        # forced broadcast would be multi-GB and fail outright. Left
        # unhinted, the planner broadcasts from its size estimate while
        # the set is small (verified: the static plan at bench SF still
        # compiles a BroadcastHashJoin LeftAnti, keeping the map-side
        # drop of hot rows before the shuffle — this matters because
        # the join sits below the postings cache boundary, where AQE
        # does not replan) and degrades to a shuffle-side anti-join
        # when the estimate outgrows the threshold. The fallback is
        # memory-safe (sorted streams), AQE-skew-splittable, and
        # shuffles on the same shingle key the collect_list aggregate
        # needs anyway.
        sh = sh.join(hot, "shingle", "left_anti")
    postings = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("_id")).alias("ids")
    ).filter(F.size("ids") >= 2)
    if max_df is not None or max_df_quantile is not None:
        # With a cap every posting list is bounded (<= cap ids), so the
        # postings table is a safe, compact cache; pinning it makes
        # repeat invocations in one session (bench's min-of-3, a
        # notebook iterating on thresholds) skip the corpus scan +
        # explode + collect entirely. Uncapped postings are unbounded
        # and are deliberately NOT cached.
        postings = pin(postings)
    # all (i < j) pairs within one posting list, as a flat struct array
    pair_array = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_array).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    out = (
        pairs.join(sa, F.col("id_a") == F.col("sa._id"))
        .join(sb, F.col("id_b") == F.col("sb._id"))
        .filter(jac >= threshold)
        .select("id_a", "id_b", jac.alias("jaccard"))
    )
    return out


def positional_windows(tokens: Column, k: int) -> Column:
    """Ordered (not distinct) k-token windows of a tokens array:
    element i is the window starting at token i. The same
    zip_with-chain form as :func:`shingles` (and for the same measured
    O(tokens^2) reason the index-lambda form is banned there), minus
    the array_distinct — position identity is the point here. Docs
    shorter than k yield []."""
    L = F.size(tokens) - (k - 1)
    parts = [F.slice(tokens, j + 1, L) for j in range(k)]
    acc = parts[0]
    for j in range(1, k):
        acc = F.zip_with(acc, parts[j], lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(tokens) >= k, acc).otherwise(
        F.array().cast("array<string>")
    )


def window_table(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """``(_id, pos, h)`` positional-window hash table — the
    persistable artifact of the substring modality (the analog of a
    minhash signature table: a daily pipeline materializes history's
    window table once as parquet and every increment probes it via
    :func:`incremental_substring_spans` without re-tokenizing history).
    One row per token position at ~24 B/row; the window text itself
    never persists, only its 8-byte xxhash64."""
    return (
        _spread(df)
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                positional_windows(F.split(F.col(text_col), " "), window)
            ).alias("pos", "gram"),
        )
        .select("_id", "pos", F.xxhash64("gram").alias("h"))
    )


def substring_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_run_tokens: int = 16,
    max_df: int | None = None,
    max_df_quantile: float | None = None,
    quantile_headroom: int = 10,
    observation: "Observation | None" = None,
) -> DataFrame:
    """Exact-substring dedup: for every document pair sharing a
    verbatim token run of >= ``min_run_tokens`` tokens, report the
    longest shared run and the number of shared window cells —
    the passage-level dedup layer document-level operators cannot see
    (a 50-token boilerplate passage copied between otherwise-different
    documents is invisible to minhash/simhash/jaccard; the public
    recipe is Lee et al. 2022's two-layer fuzzy-doc + exact-substring
    dedup, there via suffix arrays — a sequential build with no
    shuffle-parallel form, so this operator re-derives the same
    >=threshold spans from k-token window joins instead).

    EXACT semantics (modulo the two documented trades below): two docs
    share a t-token run iff they share t-k+1 CONSECUTIVE k-token
    windows at a fixed alignment offset, so longest-run recovery is
    gaps-and-islands over matched window positions per (pair,
    diagonal): diag = pos_a - pos_b is constant along a shared run,
    and within one diagonal the matched pos_a values of a run are
    consecutive integers. Match cells are duplicate-free by
    construction — (id_a, pos_a) carries exactly one window, so one
    (id_a, pos_a, diag) cell arises from exactly one posting — which
    lets the island index be a plain row_number with no distinct pass.

    Plan shape (the jaccard inverted-index discipline, never a raw
    self-join): (1) posexplode the ordered window array and hash each
    window to 8 bytes (xxhash64 — the shuffle carries (id, pos, h) =
    ~24 B/cell, never window text; a collision merges two windows'
    postings and the probability is ~W^2/2^65 per corpus, the same
    documented trade as jaccard's shingle hash); (2) a map-combinable
    per-hash occurrence count derives the df-cap hot set, which
    anti-filters the stream BEFORE collect_list, so no posting buffer
    ever exceeds cap cells (cap-before-collect, the round-7
    invariant); (3) postings explode into cross-document occurrence
    pairs — candidate mass is sum(occ^2) bounded by cap x cells, not
    n^2; (4) ONE window function partitioned by (id_a, id_b, diag) —
    millions of small groups, no global window — computes islands,
    and the island aggregate rides the same exchange (grouping on a
    superset of the partition keys needs no re-shuffle).

    Two semantic trades, both lower-bounding (a reported run is always
    real; a real run may be under-reported):

    * The df cap drops BOILERPLATE windows (appearing > cap times
      corpus-wide). A run containing a dropped window splits into
      shorter islands — runs whose every window is hot disappear.
      That is the intended semantics for training-data dedup (the
      passages worth catching are distinctive, and an uncapped hot
      window is this operator's d(d-1)/2 skew unit), and the oracle
      twin applies the identical cap so the engines cannot diverge.
      The quantile route therefore takes the minhash valve's SPREAD
      GUARD form, not jaccard's direct quantile: cap =
      ``quantile_headroom`` x the q-quantile of the repeated-window
      occurrence distribution. Unlike jaccard (where rare shingles
      carry the pairs, so a tight cap is lossless), a shared run's
      CONTINUITY depends on every window along it — and passage
      families (3+ documents sharing one boilerplate passage) are
      common and worth reporting, while a direct p92 cap lands at the
      d=2 bulk and sheds them (measured at sf0.1: 27 of 246 pairs
      lost). An order of magnitude of headroom keeps every natural
      family while degenerate corpus-wide windows, which land orders
      of magnitude out, are still dropped (at 10 x p92 the sf0.1
      pair set equals uncapped exactly).
    * Tokens are single-space splits, matching the repo's other text
      operators; runs are measured in tokens, not characters.

    Returns ``(id_a, id_b, longest_run_tokens, n_shared_windows)``
    with ``longest_run_tokens >= min_run_tokens``. Pass an
    :class:`~pyspark.sql.Observation` (requires a cap) to receive
    eager ``windows_dropped`` / ``pairs_avoided`` telemetry — same
    contract as every valve caller (:func:`_hot_key_set`).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if min_run_tokens < window:
        raise ValueError(
            f"min_run_tokens ({min_run_tokens}) must be >= window ({window}): "
            "a shorter run has no complete window and cannot be observed"
        )
    _validate_df_caps(max_df, max_df_quantile, observation)
    return _span_pairs_from_windows(
        window_table(df, id_col, text_col, window),
        window,
        min_run_tokens,
        max_df,
        max_df_quantile,
        quantile_headroom,
        observation,
    )


def _span_pairs_from_windows(
    w: DataFrame,
    k: int,
    min_run_tokens: int,
    max_df: int | None,
    max_df_quantile: float | None,
    quantile_headroom: int,
    observation: "Observation | None",
    dropped_name: str = "windows_dropped",
) -> DataFrame:
    """The substring pair pipeline downstream of the window table —
    occurrence cap (cap-before-collect), postings, c(c-1)/2 ordered
    pair explode, gaps-and-islands — factored out so ANY ``(_id, pos,
    h)`` positional-hash sequence runs through it: token windows
    (:func:`substring_span_pairs`) and per-frame perceptual hashes
    (:func:`~git_log_to_sqlite_spark.operators.multimodal.
    video_shared_scene_pairs` — shared scenes are verbatim runs in
    frame-hash space, the same gaps-and-islands recovery).  ``k`` is
    the tokens-per-cell width (run length = islands + k - 1; a
    one-frame cell passes k=1).

    Under a cap, ``w`` is consumed twice (the valve's count aggregate
    and the anti-joined main stream).  Whether to pin it is the
    CALLER's trade, not this helper's: text windows are one row per
    token (~24 B x corpus tokens — caching is corpus-sized, and
    re-tokenizing is the cheaper side of the round-7 jaccard
    decision), while the multimodal callers' ``w`` derives from an
    expensive Python decode over far fewer rows (one per frame), so
    THOSE callers pin before passing it here."""
    _validate_df_caps(max_df, max_df_quantile, observation)
    if max_df is not None or max_df_quantile is not None:
        hot = _hot_key_set(
            w,
            ["h"],
            max_df,
            max_df_quantile,
            quantile_headroom=quantile_headroom,
            observation=observation,
            dropped_name=dropped_name,
            avoided="pairs",
        )
        w = w.join(hot, "h", "left_anti")
    postings = (
        w.groupBy("h")
        .agg(F.array_sort(F.collect_list(F.struct("_id", "pos"))).alias("occ"))
        .filter(F.size("occ") >= 2)
    )
    # Ordered (i < j) occurrence pairs via the jaccard slice/transform
    # form — emits c(c-1)/2 cells per posting instead of the c^2 a
    # full double-explode produces (self-pairs + both orientations,
    # then filtered): on the operator's hottest stage that halves the
    # exploded row volume. occ is sorted by (_id, pos), so i < j
    # implies x._id <= y._id and the only cells left to drop are
    # same-document ones. The lambdas reference occ — a materialized
    # aggregate ATTRIBUTE, not a recomputed expression — so the HOF
    # capture rule (shingles() docstring) is not violated.
    pair_array = F.flatten(
        F.transform(
            F.col("occ"),
            lambda x, i: F.transform(
                F.slice(F.col("occ"), i + 2, F.size(F.col("occ"))),
                lambda y: F.struct(
                    x["_id"].alias("id_a"),
                    y["_id"].alias("id_b"),
                    (x["pos"] - y["pos"]).alias("diag"),
                    x["pos"].alias("pos_a"),
                ),
            ),
        )
    )
    m = (
        postings.select(F.explode(pair_array).alias("p"))
        .filter(F.col("p.id_a") < F.col("p.id_b"))
        .select("p.id_a", "p.id_b", "p.diag", "p.pos_a")
    )
    return _island_spans(m, "id_a", "id_b", k, min_run_tokens)


def _island_spans(
    m: DataFrame, a_col: str, b_col: str, k: int, min_run_tokens: int
) -> DataFrame:
    """Gaps-and-islands tail shared by the batch and incremental
    substring operators: match cells (a, b, diag, pos_a) -> per-pair
    longest run + cell count. ONE window partitioned by (a, b, diag)
    — millions of small groups, never global — whose island aggregate
    rides the same exchange (grouping on a superset of the partition
    keys needs no re-shuffle)."""
    isl_w = Window.partitionBy(a_col, b_col, "diag").orderBy("pos_a")
    runs = (
        m.withColumn("grp", F.col("pos_a") - F.row_number().over(isl_w))
        .groupBy(a_col, b_col, "diag", "grp")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    return (
        runs.groupBy(a_col, b_col)
        .agg(
            (F.max("m") + F.lit(k - 1)).alias("longest_run_tokens"),
            F.sum("m").alias("n_shared_windows"),
        )
        .filter(F.col("longest_run_tokens") >= min_run_tokens)
    )


def incremental_substring_spans(
    history: DataFrame | None,
    increment: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_run_tokens: int = 16,
    max_df: int | None = None,
    max_df_quantile: float | None = None,
    quantile_headroom: int = 10,
    history_windows: DataFrame | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Passage-level dedup of a daily batch against accumulated
    history — :func:`substring_span_pairs`' production increment
    shape, mirroring :func:`incremental_minhash_dedup`'s contract:
    history is NEVER self-joined and, when ``history_windows`` is
    passed (a persisted :func:`window_table`), never re-tokenized —
    each day tokenizes only its increment and probes the stored
    (id, pos, h) table.

    Returns ``(inc_id, hist_id, longest_run_tokens,
    n_shared_windows)`` for every increment x history pair sharing a
    verbatim run of >= ``min_run_tokens`` tokens — exact
    gaps-and-islands semantics identical to the batch operator
    restricted to cross-split pairs (equality-tested). Increment-
    internal duplicates are deliberately out of scope (run the batch
    operator within the day), exactly as in the minhash twin.

    The occurrence cap is derived from the HISTORY side only (the
    increment cannot skew a quantile computed before it arrives, and
    history boilerplate is what multiplies every future probe);
    above-cap windows anti-filter the history table BEFORE the probe
    join, so per-window candidate mass is bounded by
    |increment occurrences| x cap. Telemetry reports
    ``windows_dropped`` / ``rows_dropped`` (probe shape — the avoided
    candidates are unknowable from the history side alone, same
    argument as the minhash probe valve).

    ``history_windows`` is deliberately NOT pinned (at scale it is a
    column-pruned parquet scan, and a scan or two is cheaper than
    caching a corpus-scale table — the same rationale as the minhash
    twin's provided signature table). Windows DERIVED from ``history``
    text are pinned when a cap is requested — the valve's count
    aggregation and the probe join each consume the table, and
    re-deriving means re-tokenizing history; without a cap the derived
    table is consumed once and a cache would only add write cost.

    ``salt_buckets`` / ``salt_min_bucket`` are the recall-preserving
    hot-window arm (:func:`~.skew.salted_pair_sides`, the probe
    shape): a boilerplate window occurring d times in history meets
    every increment occurrence on ONE join key — capping it sheds
    real passage matches, salting consumes it over S tasks with
    row-identical output (history side salted per (id, pos) window
    row, increment replicated; downstream gaps-and-islands groups on
    (inc_id, hist_id, diag), so per-salt partials are disjoint pair
    meetings, never double-counted). ``salt_min_bucket`` targets
    history windows with >= that many occurrences (counted on the
    history side, the probe-valve convention). The batch operator
    (:func:`substring_span_pairs`) deliberately has NO salt arm — its
    pair stage is a posting-list explode (one ROW per hot window, the
    jaccard adjudication), not a join.

    The arming regime is the JOIN STRATEGY, not the product size
    (established round 13, BASELINE.md — resolving the round-12
    "crossover unmeasured" note): a daily-scale increment broadcasts
    (the window table sits far under the broadcast threshold), and a
    BroadcastHashJoin has NO single-key serialization to fix — the
    hot key's d_hist x d_inc product parallelizes over the HISTORY
    side's input splits, so the unsalted join stage reads 1.3-2.7 s
    even at 487M one-key products while arming the salt (whose
    co-partition pin deliberately forces the shuffled join) can only
    add overhead: it measured SLOWER at 17M, 152M, AND 487M products
    in this regime — every earlier "product crossover" probe was
    unknowingly here, which is why no crossover ever appeared. The
    serialization the arm exists for is the SMJ/backfill regime —
    an increment too large to broadcast — where one hot window's
    sort-merge group IS one task: forced-SMJ at the same 487M shape,
    the unsalted join stage reads 36-53 s against 7-8 s targeted
    S=16 (5-7.6x), 152-233 s vs 66-95 s end-to-end. So: arm the salt
    only when BOTH hold — the increment is backfill-scale (the join
    would shuffle anyway) and occurrence telemetry shows a hot
    window; never for a broadcastable daily increment, where the
    knob trades a parallel BHJ for the SMJ it then has to salt.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if min_run_tokens < window:
        raise ValueError(
            f"min_run_tokens ({min_run_tokens}) must be >= window ({window}): "
            "a shorter run has no complete window and cannot be observed"
        )
    _validate_df_caps(max_df, max_df_quantile, observation)
    _validate_salting(salt_buckets, salt_min_bucket)  # before any pin
    if (history is None) == (history_windows is None):
        raise ValueError("exactly one of history / history_windows is required")
    if history_windows is not None:
        missing = {"_id", "pos", "h"} - set(history_windows.columns)
        if missing:
            raise ValueError(f"history_windows missing columns: {sorted(missing)}")
        wh = history_windows
    else:
        wh = window_table(history, id_col, text_col, window)
        if max_df is not None or max_df_quantile is not None:
            # consumed twice under a cap (the valve's count aggregation
            # + the probe join): pin so history tokenizes once; see the
            # docstring for why a PROVIDED table stays unpinned
            wh = pin(wh)
    wi = window_table(increment, id_col, text_col, window)
    if max_df is not None or max_df_quantile is not None:
        hot = _hot_key_set(
            wh,
            ["h"],
            max_df,
            max_df_quantile,
            quantile_headroom=quantile_headroom,
            observation=observation,
            dropped_name="windows_dropped",
            avoided="rows",
        )
        wh = wh.join(hot, "h", "left_anti")
    # renamed projections, not aliases (an alias does not survive the
    # salting branch's withColumn/repartition — the _band_self_pairs
    # rule); history = corpus side (salted), increment = probe side
    a = wh.select(
        F.col("h").alias("_h_h"),
        F.col("_id").alias("_hid"),
        F.col("pos").alias("_hpos"),
    )
    b = wi.select(
        F.col("h").alias("_h_i"),
        F.col("_id").alias("_iid"),
        F.col("pos").alias("_ipos"),
    )
    pair_cond = F.col("_h_i") == F.col("_h_h")
    if salt_buckets > 1:
        from .skew import salted_pair_sides

        hot_a = hot_b = None
        if salt_min_bucket is not None:
            hot = _hot_key_set(wh, ["h"], salt_min_bucket - 1, None)
            hot_a = hot.select(F.col("h").alias("_h_h"))
            hot_b = hot.select(F.col("h").alias("_h_i"))
        a, b, salt_cond = salted_pair_sides(
            a, b, ["_h_h"], ["_h_i"], ["_hid", "_hpos"], salt_buckets,
            hot_a=hot_a, hot_b=hot_b,
        )
        pair_cond = pair_cond & salt_cond
    m = b.join(a, pair_cond).select(
        F.col("_iid").alias("inc_id"),
        F.col("_hid").alias("hist_id"),
        (F.col("_ipos") - F.col("_hpos")).alias("diag"),
        F.col("_ipos").alias("pos_a"),
    )
    return _island_spans(m, "inc_id", "hist_id", window, min_run_tokens)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash signature (bitwise majority over md5 token
    hashes). Near-dup = small Hamming distance between signatures;
    signatures are 8 bytes/doc, so the pair stage can band on bit
    slices or broadcast.

    ``bits`` <= 60 (the md5-derived token hash is at most 15 hex chars
    = 60 bits, keeping the signature a non-negative BIGINT). The token
    hash width is 32 bits for ``bits`` <= 32 (frozen: the 32-bit
    signatures are oracle-pinned) and 60 bits above — wider signatures
    exist for :func:`simhash_pairs`' banding keyspace, which must grow
    with the corpus (see its docstring).

    Shape (round 17, guide §2.4 "remove shuffles outright" + §1.1
    "empirical beats the ideal"): the narrow two-aggregate form —
    md5 fold projected ONCE per token row, bit-index explode,
    map-combinable (id, i) partial sums, then the per-doc signature
    fold — WITHOUT the retired form's DISTINCT over the exploded
    (id, token) stream. That distinct was the one corpus-sized
    exchange here and was semantically redundant (``array_distinct``
    already dedups within the document, and cross-document repeats
    carry different ids, so the stream was already unique); with it
    gone, map-side partial aggregation compresses the remaining two
    exchanges to ``bits`` rows per doc and one row per doc.

    A ONE-pass variant (all ``bits`` majorities as sum-aggregates in a
    single 60-buffer groupBy, the :func:`minhash_signatures` trick)
    was implemented and interleaved-A/B'd against this form through
    every consumer: 2x faster in a tight single-plan loop, but 25-50%
    SLOWER in suite context at both widths (the wide 60-buffer update
    path never gets hot in a mixed-query JVM), while this narrow form
    wins in every context — dedup_simhash 1.0 -> 0.48 s,
    dedup_simhash_pairs 2.05 -> 1.65 s, mm_fuzzy_decontaminate
    1.9 -> 1.36 s cold min-of-6 vs the round-16 form
    (tools/simhash_pairs_ab_r17_results.json; signatures verified
    value-identical at both widths across all three forms).
    """
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60], got {bits}")
    hex_chars = 8 if bits <= 32 else 15
    # h projected BELOW the bit explode so md5 folds once per token
    # row, not once per (token, bit) row
    toks = _spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    ).select("_id", md5_long(F.col("token"), hex_chars=hex_chars).alias("h"))
    weights = (
        toks.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))))
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


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via SimHash bit-slice banding — the pair
    stage :func:`simhash`'s docstring promises. Returns ``(id_a, id_b,
    hamming)`` for every pair within ``max_hamming`` bits.

    Candidates come from an equi-join on (band, band_key) where the
    key is one of ``bands`` contiguous ``bits/bands``-bit slices of
    the signature. With ``bands > max_hamming`` the candidate stage is
    EXACT by pigeonhole: a pair differing in <= max_hamming bits
    cannot differ in every one of the bands slices, so it must agree
    exactly on at least one — recall 1.0 by construction, no
    probabilistic argument needed (the standard Manku/Jain/Sarma
    near-duplicate web-crawl decomposition). The verify stage is one
    ``bit_count(xor)`` per candidate on the two joined 8-byte
    signatures.

    SIZE THE SLICE WIDTH TO THE CORPUS — unlike minhash band keys
    (unbounded keyspace), a bit slice has only ``2^(bits/bands)``
    distinct values, and since signature bits are near-uniform the
    band join carries an irreducible ~``n^2 * bands / 2^(bits/bands)``
    candidate floor even on perfectly benign data (every bucket holds
    ~n/2^width rows; no valve can fire on a uniform distribution —
    the hot-band valve here bounds only DEGENERATE keys, e.g.
    near-empty docs majority-voting to one signature, which land far
    above the uniform bucket size). The 32/4 default (8-bit slices,
    256 keys) is a tiny-corpus/test configuration; at millions of
    documents use ``bits=60, bands=4`` (15-bit slices, ~32k keys) and
    beyond that shard the corpus or raise ``bands`` together with
    ``max_hamming`` budget — the honest limit of one-round simhash
    banding. An ABSOLUTE ``max_band_size`` below the uniform bucket
    size n/2^width would anti-filter EVERY bucket and silently return
    zero pairs — prefer the quantile spread guard, which tracks the
    distribution.

    Otherwise the scale shape mirrors :func:`minhash_lsh_pairs`:
    signatures are pinned (8 bytes/doc), band keys are a pure
    projection, and dropping a hot band trades the pigeonhole
    exactness on pairs whose ONLY agreeing slice was the degenerate
    one — the same documented trade as the minhash valve.
    """
    # Validate EVERYTHING before the pin: a bad call must fail before
    # any side effect — pin() registers a persist in the cache
    # registry, and an invalid-arguments exception after it would leak
    # that never-materialized entry until release_caches().
    _validate_banding(
        bits, bands, max_hamming, max_band_size, band_size_quantile, observation
    )
    _validate_salting(salt_buckets, salt_min_bucket)  # same before-the-pin rule
    sig = pin(simhash(df, id_col, text_col, bits))
    return hamming_pairs(
        sig,
        id_col,
        "simhash",
        bits=bits,
        bands=bands,
        max_hamming=max_hamming,
        max_band_size=max_band_size,
        band_size_quantile=band_size_quantile,
        observation=observation,
        salt_buckets=salt_buckets,
        salt_min_bucket=salt_min_bucket,
    )


def _validate_banding(
    bits: int,
    bands: int,
    max_hamming: int,
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
) -> None:
    """Shared banding-argument validation for the Hamming pair stage —
    called by every entry point BEFORE any side effect (pins run first
    otherwise and would leak registry entries on invalid calls).  The
    valve-argument checks (cap mutual exclusion, observation-requires-
    a-cap) live here too, not only in :func:`_capped_bands`: the
    entry points pin the signature frame before the bands stage runs,
    so a check that fires only inside ``_capped_bands`` would leak a
    never-materialized cache-registry entry until ``release_caches()``
    — the exact failure this pre-pin validation exists to prevent."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole recall guarantee"
        )
    if bits % bands != 0:
        raise ValueError(f"bits ({bits}) must divide evenly into {bands} bands")
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60], got {bits}")
    _validate_band_caps(max_band_size, band_size_quantile, observation)


def _sig_bands(
    sig: DataFrame, key_cols: list[str], sig_col: str, bits: int, bands: int
) -> DataFrame:
    """Explode a signature table into its ``(key_cols..., band,
    band_key)`` bit-slice rows — the shared candidate-key projection
    of the self-join (:func:`hamming_pairs`) and probe
    (:func:`hamming_probe`) stages."""
    width = bits // bands
    mask = (1 << width) - 1
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(sig_col), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        *[F.col(c) for c in key_cols], F.explode(band_entries).alias("e")
    ).select(
        *key_cols, F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
    )


def hamming_probe(
    probe: DataFrame,
    corpus: DataFrame,
    probe_id: "str | list[str]",
    corpus_id: "str | list[str]",
    sig_col: str,
    bits: int,
    bands: int = 4,
    max_hamming: int = 3,
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Probe-shaped Hamming lookup: every (probe row, corpus row) pair
    within ``max_hamming`` bits — the content-ID / lookup twin of
    :func:`hamming_pairs`, mirroring
    :func:`incremental_minhash_dedup`'s shape: the CORPUS is never
    self-joined (a query batch against a billion-signature index must
    not pay the index's own pair mass), candidates come from the
    probe-bands x corpus-bands equi-join on (band, band_key), and the
    pigeonhole guarantee (``bands > max_hamming``) is EXACT across
    the two sides exactly as within one. Returns one row per match:
    ``(*probe_id, *corpus_id, hamming)`` — the two id sets must be
    disjoint column names (alias before calling; a probe that is a
    subset of the corpus matches itself at hamming 0, filter if
    unwanted). In production the corpus side is a persisted signature
    table (``SignatureStore`` for minhash; the same parquet shape
    works for any <= 60-bit signature), so a lookup never re-hashes
    the corpus.

    The hot-band valve caps the CORPUS side only (``join_shape=
    'probe'``: candidates per band key are |probe bucket| x |corpus
    bucket|, so capping the corpus bucket bounds every key at
    |probe| x cap — and telemetry reports ``rows_dropped``, the
    honest per-side number). Same keyspace-sizing caveat as
    :func:`simhash_pairs`: size ``bits/bands`` to the CORPUS.
    ``salt_buckets`` / ``salt_min_bucket`` are the recall-preserving
    hot-bucket arm for when capping is not acceptable — corpus side
    salted, probe side replicated (:func:`_band_probe_pairs`)."""
    p_ids = [probe_id] if isinstance(probe_id, str) else list(probe_id)
    c_ids = [corpus_id] if isinstance(corpus_id, str) else list(corpus_id)
    clash = set(p_ids) & set(c_ids)
    if clash:
        raise ValueError(
            f"probe and corpus id columns must be disjoint, both have {sorted(clash)}"
        )
    _validate_banding(
        bits, bands, max_hamming, max_band_size, band_size_quantile, observation
    )
    _validate_salting(salt_buckets, salt_min_bucket)  # before the valve's pin
    bands_c = _capped_bands(
        _sig_bands(corpus, c_ids, sig_col, bits, bands),
        max_band_size,
        band_size_quantile,
        observation,
        join_shape="probe",
    )
    bands_p = _sig_bands(probe, p_ids, sig_col, bits, bands)
    cand = _band_probe_pairs(
        bands_p, bands_c, p_ids, c_ids, salt_buckets, salt_min_bucket
    )
    sp = probe.select(
        *[F.col(c) for c in p_ids], F.col(sig_col).alias("_sp")
    )
    sc = corpus.select(
        *[F.col(c) for c in c_ids], F.col(sig_col).alias("_sc")
    )
    ham = F.bit_count(F.col("_sp").bitwiseXOR(F.col("_sc")))
    return (
        cand.join(sp, p_ids)
        .join(sc, c_ids)
        .filter(ham <= max_hamming)
        .select(*p_ids, *c_ids, ham.cast("int").alias("hamming"))
    )


def hamming_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    bands: int = 4,
    max_hamming: int = 3,
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Pairs within ``max_hamming`` bits over ANY precomputed
    fixed-width signature column — the bit-slice band machinery
    :func:`simhash_pairs` runs on text simhashes, factored out so
    every <= 60-bit signature modality shares one pair stage (text
    simhash, image dHash via
    :func:`~git_log_to_sqlite_spark.operators.multimodal.image_dhash`,
    any future perceptual hash). Same pigeonhole-EXACT guarantee
    (``bands > max_hamming``), same ``bit_count(xor)`` verify, same
    hot-band valve, and the same keyspace-sizing caveat as
    :func:`simhash_pairs` — size ``bits/bands`` to the corpus.

    ``sig`` must carry one row per id; signatures are non-negative
    BIGINTs below 2^bits. Returns ``(id_a, id_b, hamming)``.
    ``salt_buckets`` / ``salt_min_bucket`` are the recall-preserving
    hot-bucket arm (:func:`_band_self_pairs`) — relevant here above
    all, because the bit-slice keyspace is BOUNDED
    (``2^(bits/bands)`` values), so an under-sized slice width
    concentrates mass in few buckets by construction.
    """
    _validate_banding(
        bits, bands, max_hamming, max_band_size, band_size_quantile, observation
    )
    _validate_salting(salt_buckets, salt_min_bucket)  # before the valve's pin
    bands_df = _capped_bands(
        _sig_bands(sig, [id_col], sig_col, bits, bands),
        max_band_size,
        band_size_quantile,
        observation,
    )
    cand = _band_self_pairs(bands_df, id_col, salt_buckets, salt_min_bucket)
    sa = sig.select(F.col(id_col).alias("_ida"), F.col(sig_col).alias("_sa"))
    sb = sig.select(F.col(id_col).alias("_idb"), F.col(sig_col).alias("_sb"))
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.join(sa, F.col("id_a") == F.col("_ida"))
        .join(sb, F.col("id_b") == F.col("_idb"))
        .filter(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram_n: int = 4,
    flag_col: str = "contaminated",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    any token ``ngram_n``-gram with a held-out benchmark/eval corpus —
    the leakage filter every pre-training pipeline runs before a model
    ever sees the data (the public recipe: n-gram overlap against the
    eval suites, as in the GPT-3/PaLM appendices).

    Returns one row per TRAIN document: ``(id, shared_ngrams,
    contaminated)`` where ``shared_ngrams`` counts the distinct n-grams
    the document shares with the benchmark (``shingles`` emits the
    per-document distinct gram set, so the count needs no extra
    distinct) and ``contaminated`` is the 0/1 gate. All train rows are
    kept (left join) so the output is a drop-in annotation table.

    Scale shape — the asymmetry IS the design: benchmarks are MBs while
    the corpus is 100 TB, so the benchmark's distinct gram set is
    broadcast (one small-side shuffle to distinct it, then a hash set
    on every executor) and the train side filters its exploded gram
    stream map-side via a broadcast LEFT SEMI join BEFORE any shuffle —
    the only rows that ever reach the aggregation exchange are actual
    hits, which are rare by construction. The final annotate join is an
    id-only projection against the tiny hit table (AQE broadcasts it).
    Never join two exploded 100-TB gram streams to find leakage.

    HARD CONTRACT on the ``benchmark`` side: the broadcast is FORCED
    (the hint is what guarantees the map-side filter; unhinted, a bad
    size estimate on the post-distinct aggregate could silently plan a
    corpus-wide shuffle semi-join), so the distinct gram set must fit
    a broadcast — it scales with total benchmark tokens, and an
    executor holds one copy (~32 B/gram hashed-set overhead: a 1M-gram
    eval suite is tens of MB — fine; a "benchmark" of GBs is not).
    Callers decontaminating against something corpus-sized are using
    the wrong operator: that is corpus-vs-corpus overlap, i.e.
    :func:`ngram_jaccard_pairs` / :func:`minhash_lsh_pairs` territory.
    """
    gram = exploded_shingles(text_col, ngram_n)
    bench_grams = benchmark.select(gram.alias("gram")).distinct()
    train_grams = _spread(train).select(
        F.col(id_col).alias("_id"), gram.alias("gram")
    )
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("_id")
        .agg(F.count("*").alias("shared_ngrams"))
    )
    shared = F.coalesce(F.col("shared_ngrams"), F.lit(0).cast("long"))
    return (
        train.select(id_col)
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            shared.alias("shared_ngrams"),
            (shared > 0).cast("int").alias(flag_col),
        )
    )


def fuzzy_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    flag_col: str = "contaminated",
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: flag training
    documents whose simhash is within ``max_hamming`` bits of any
    eval document — the fuzzy complement of :func:`decontaminate`
    (exact n-gram overlap): a lightly-paraphrased or
    whitespace-perturbed eval document shares few exact n-grams but
    lands a handful of simhash bits away, and document-level leakage
    of that kind is what this catches. Returns one row per TRAIN
    document: ``(id, matched_evals, best_hamming, contaminated)`` —
    all train rows kept (left join), a drop-in annotation table like
    its exact sibling.

    Scale shape: :func:`simhash` both sides (one corpus pass each,
    8 B/doc signatures), then :func:`hamming_probe` with the TRAIN
    side as the corpus and the benchmark as the probe — the benchmark
    is MBs while the corpus is 100 TB, so the probe's band table is
    the tiny side of the equi-join and the train corpus is never
    self-joined; pigeonhole exactness (``bands > max_hamming``)
    means recall 1.0 on the signature distance — WHEN UNCAPPED.
    Any valve cap (``max_band_size`` / ``band_size_quantile``) VOIDS
    that guarantee in the dangerous direction: the valve anti-filters
    hot TRAIN band buckets, so capped-away train docs are silently
    exempted from matching — false negatives, the one failure mode a
    decontamination operator must not hide. ``rows_dropped > 0`` in
    the telemetry means some train docs were never probed. Default
    to NO cap here (the benchmark side is tiny, so per-bucket
    candidate mass is bounded by |benchmark bucket| x |train bucket|
    with the probe side already small); reach for the valve only if
    a degenerate bucket (near-empty documents majority-voting to one
    signature) actually materializes, and treat its telemetry as a
    recall warning, not bookkeeping. ``salt_buckets`` /
    ``salt_min_bucket`` are the arm that needs NO such warning — the
    recall-preserving answer to a hot train bucket this operator was
    previously not allowed to have: the train side salts, the tiny
    eval side replicates, matches are row-identical and the
    pigeonhole guarantee holds untouched (:func:`_band_probe_pairs`).
    Reach for the salt FIRST; the valve remains for corpora where
    shedding the degenerate bucket is an accepted recall trade. Same
    honest limit as every
    simhash operator: the
    signature distance is a document-LEVEL proxy — passage-level
    leakage belongs to :func:`decontaminate` or the substring
    operators."""
    _validate_banding(
        bits, bands, max_hamming, max_band_size, band_size_quantile, observation
    )
    _validate_salting(salt_buckets, salt_min_bucket)  # before the pins
    sig_t = pin(
        simhash(train, id_col, text_col, bits).withColumnRenamed(
            id_col, "_train_id"
        )
    )
    # pinned: hamming_probe consumes the probe side twice (band
    # projection + signature join-back) — the benchmark is MBs, so
    # the pin is cheap and saves a second tokenize+hash pass (the
    # caller-owns-the-pin doctrine the multimodal callers follow)
    sig_b = pin(
        simhash(benchmark, id_col, text_col, bits).withColumnRenamed(
            id_col, "_eval_id"
        )
    )
    matches = hamming_probe(
        sig_b,
        sig_t,
        probe_id="_eval_id",
        corpus_id="_train_id",
        sig_col="simhash",
        bits=bits,
        bands=bands,
        max_hamming=max_hamming,
        max_band_size=max_band_size,
        band_size_quantile=band_size_quantile,
        observation=observation,
        salt_buckets=salt_buckets,
        salt_min_bucket=salt_min_bucket,
    )
    hits = matches.groupBy("_train_id").agg(
        F.count(F.lit(1)).alias("matched_evals"),
        F.min("hamming").alias("best_hamming"),
    )
    matched = F.coalesce(F.col("matched_evals"), F.lit(0).cast("long"))
    # the annotation spine is `train` itself, NOT the pinned sig_t:
    # simhash emits no row for a token-less document (NULL/empty
    # text), and collapses duplicate ids, so a sig_t spine would
    # silently DROP those train rows from the annotation — breaking
    # the all-train-rows-survive contract (and the DuckDB twin, whose
    # spine is the documents table). The id-only scan is column-
    # pruned; that one cheap pass is the price of the contract.
    return (
        train.select(id_col)
        .join(hits.withColumnRenamed("_train_id", id_col), id_col, "left")
        .select(
            id_col,
            matched.alias("matched_evals"),
            F.col("best_hamming"),
            (matched > 0).cast("int").alias(flag_col),
        )
    )


def incremental_minhash_dedup(
    history: DataFrame | None,
    increment: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    min_agree: float = 0.25,
    shingle_n: int = 3,
    max_band_size: int | None = None,
    band_size_quantile: float | None = None,
    observation: "Observation | None" = None,
    history_signatures: DataFrame | None = None,
    best_match: bool = False,
    salt_buckets: int = 1,
    salt_min_bucket: int | None = None,
) -> DataFrame:
    """Dedup a new batch against the historical corpus WITHOUT
    re-pairing history with itself — the daily-ingest shape of fuzzy
    dedup: 100 TB of history is already deduped; only the increment
    needs checking, and only against history (+ itself is a separate
    ``minhash_lsh_pairs`` call on the small increment).

    Returns one row per INCREMENT document: ``(id, dup_of, best_est,
    is_new)`` — ``dup_of`` is the smallest history id among matches
    with signature agreement >= ``min_agree`` (deterministic pick),
    ``best_est`` the highest agreement estimate, ``is_new`` = 1 when no
    history match clears the bar. All increment rows are kept. NOTE:
    ``dup_of`` and ``best_est`` aggregate INDEPENDENTLY — the reported
    pair need not be the same history document (min-id is the stable
    survivor key for dedup bookkeeping; max-est is the match
    confidence). Pass ``best_match=True`` for an extra
    ``best_match_id`` column: the history id that ACHIEVES the best
    estimate (ties broken to the smaller id) — the "which doc is this
    a copy of" production answer.

    Scale shape: history contributes ONLY its signature table (K x 8
    bytes/doc — in production a persisted/bucketed table maintained
    across ingests, so the 100-TB text is never re-scanned; here it is
    derived and pinned). The band equi-join is increment-bands x
    history-bands — candidate mass tracks collisions, never
    |history| x |increment| — and the agreement estimate compares the
    two signature rows per candidate. History never self-joins: the
    only quadratic-risk surface is band-key skew — closed by the same
    hot-band valve the batch operator carries (``max_band_size`` /
    ``band_size_quantile``, :func:`_capped_bands`). The valve counts
    and filters the HISTORY side only: candidates per band key are
    |increment bucket| x |history bucket|, so capping the history
    bucket bounds every key's candidate mass at |increment| x cap —
    linear in the (small) increment even when the increment itself
    carries a degenerate key, while removing a hot history bucket
    removes the key from the join outright. ``salt_buckets`` /
    ``salt_min_bucket`` are the recall-PRESERVING alternative when a
    hot history bucket must be consumed, not dropped: history side
    salted, increment replicated (:func:`_band_probe_pairs`).

    Pass ``history_signatures`` (a wide ``(id, mh_0..mh_{K-1})`` table,
    e.g. :meth:`SignatureStore.read`) INSTEAD of ``history`` to run
    against a persisted signature table — the production ingest shape.
    A provided table is deliberately NOT pinned: at scale it is a
    parquet scan (K x 8 B/doc, column-pruned) and its two consumers
    (band projection, agreement join) each re-scan more cheaply than a
    100-TB-history cache could ever be held; derived-from-text
    signatures keep the pin since deriving them re-shingles the
    corpus.
    """
    if (history is None) == (history_signatures is None):
        raise ValueError(
            "exactly one of history / history_signatures is required"
        )
    _validate_band_caps(  # before the pins — a bad call must not leak a cache entry
        max_band_size, band_size_quantile, observation
    )
    _validate_salting(salt_buckets, salt_min_bucket)  # same rule
    if history_signatures is not None:
        missing = {id_col, *(f"mh_{j}" for j in range(num_hashes))} - set(
            history_signatures.columns
        )
        if missing:
            raise ValueError(f"history_signatures missing columns: {sorted(missing)}")
        mh_h = history_signatures
    else:
        mh_h = pin(
            minhash_signatures(history, id_col, text_col, num_hashes, shingle_n)
        )
    mh_i = pin(minhash_signatures(increment, id_col, text_col, num_hashes, shingle_n))
    bands_h = _capped_bands(
        _band_keys(mh_h, id_col, num_hashes, rows_per_band),
        max_band_size,
        band_size_quantile,
        observation,
        join_shape="probe",
    )
    bands_i = _band_keys(mh_i, id_col, num_hashes, rows_per_band)
    # shared probe-pair stage: increment = probe (small, replicates
    # under a salt), history = corpus (big, salted per row)
    cand = _band_probe_pairs(
        bands_i.withColumnRenamed(id_col, "_inc"),
        bands_h.withColumnRenamed(id_col, "_hist"),
        ["_inc"],
        ["_hist"],
        salt_buckets,
        salt_min_bucket,
    )
    mi = mh_i.select(
        F.col(id_col).alias("_inc"),
        *[F.col(f"mh_{j}").alias(f"i_{j}") for j in range(num_hashes)],
    )
    mht = mh_h.select(
        F.col(id_col).alias("_hist"),
        *[F.col(f"mh_{j}").alias(f"h_{j}") for j in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"i_{j}") == F.col(f"h_{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    aggs = [
        F.min("_hist").alias("dup_of"),
        F.max("est").alias("best_est"),
    ]
    if best_match:
        # min_by over (-est, id): the HIGHEST estimate wins and ties go
        # to the SMALLER id. Negating est (always a double) instead of
        # the id keeps the tie-break type-agnostic — a max_by on
        # struct(est, -id) would NULL-cast (or ANSI-throw on) string
        # ids and silently lose determinism.
        aggs.append(
            F.expr("min_by(_hist, struct(-est, _hist))").alias("best_match_id")
        )
    matches = (
        cand.join(mi, "_inc")
        .join(mht, "_hist")
        .withColumn("est", agree.cast("double") / num_hashes)
        .filter(F.col("est") >= min_agree)
        .groupBy("_inc")
        .agg(*aggs)
    )
    out_cols = [
        id_col,
        "dup_of",
        "best_est",
        F.col("dup_of").isNull().cast("int").alias("is_new"),
    ]
    if best_match:
        out_cols.append("best_match_id")
    return (
        increment.select(id_col)
        .join(matches.withColumnRenamed("_inc", id_col), id_col, "left")
        .select(*out_cols)
    )


class _ParquetStore:
    """Shared persistence machinery of the per-modality history stores
    (:class:`SignatureStore` for minhash, :class:`WindowStore` for
    exact-substring): a plain append-only parquet table with an
    existence probe that maps ONLY a missing path to False, a lazy
    read, a fail-fast bootstrap guard, and staged-swap compaction.
    One implementation so a fix to any of them lands once."""

    def __init__(self, spark, path: str) -> None:
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        """True iff the store's table exists at the path.

        Only a genuinely-missing path maps to False. Any OTHER failure
        (transient IO, permissions, a momentarily unreachable object
        store) propagates: conflating it with "never bootstrapped"
        would make :meth:`ingest`'s fail-fast guard advise calling
        bootstrap() — whose mode("overwrite") would destroy a live
        history table — on a store that merely hiccuped.
        """
        from pyspark.errors import AnalysisException

        try:
            self.spark.read.parquet(self.path).schema
            return True
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e):
                return False
            raise

    def read(self) -> DataFrame:
        from ..sources.schema_cache import read_parquet_cached

        return read_parquet_cached(self.spark, self.path)

    #: subclass hint for the fail-fast message — the bootstrap call
    #: shape differs per store (text stores take (corpus, text_col),
    #: the signature store takes a signatures frame)
    _bootstrap_hint = "bootstrap(corpus, text_col)"

    #: partition columns of the store's table, () for flat layouts —
    #: compact() preserves them (see its docstring)
    _partition_cols: tuple = ()

    def _require_bootstrapped(self) -> None:
        if not self.exists():
            # Fail HERE, not as a path-not-found AnalysisException from
            # the lazy self.read() deep inside an operator — the first
            # ingest against a never-bootstrapped store is a caller
            # setup error with an obvious fix.
            raise FileNotFoundError(
                f"{type(self).__name__} at {self.path!r} has no table "
                f"yet; call {self._bootstrap_hint} once before the "
                "first ingest()"
            )

    def compact(self, num_files: int | None = None) -> None:
        """Rewrite the store into ``num_files`` parquet files (default:
        the session's default parallelism) — the offline maintenance
        pass for ingest cadences where one appended file-set per day
        makes small files dominate the scan. Content is append-only,
        so compaction is rewrite-identical; the rewrite lands in a
        sibling temp dir and swaps in via the Hadoop FileSystem API
        (works on any scheme the session can reach). Run between
        ingests, not concurrently with one.

        Subclasses whose table is PARTITIONED (``_partition_cols``)
        keep their layout: the rewrite clusters by the partition
        columns and writes partitionBy them — a flat rewrite would
        demote the partition column to data, silently lose partition
        pruning, and make the NEXT partitioned append produce Spark's
        'Conflicting directory structures' failure on read."""
        sc = self.spark.sparkContext
        n = num_files or sc.defaultParallelism
        tmp = self.path.rstrip("/") + "__compact_tmp"
        old = self.path.rstrip("/") + "__compact_old"
        w = self.read()
        if self._partition_cols:
            (
                w.repartition(n, *self._partition_cols)
                .write.mode("overwrite")
                .partitionBy(*self._partition_cols)
                .parquet(tmp)
            )
        else:
            w.repartition(n).write.mode("overwrite").parquet(tmp)
        hpath = sc._jvm.org.apache.hadoop.fs.Path
        fs = hpath(self.path).getFileSystem(sc._jsc.hadoopConfiguration())
        # staged swap, no delete-before-rename: a crash between the two
        # renames leaves the data intact at __compact_old (manual
        # recovery: rename it back); the store is never deleted while
        # it is the only copy
        fs.delete(hpath(old), True)
        if not fs.rename(hpath(self.path), hpath(old)):
            raise IOError(f"compaction stage-out failed: {self.path} -> {old}")
        if not fs.rename(hpath(tmp), hpath(self.path)):
            fs.rename(hpath(old), hpath(self.path))  # roll back
            raise IOError(f"compaction swap failed: {tmp} -> {self.path}")
        fs.delete(hpath(old), True)


class SignatureStore(_ParquetStore):
    """Persisted MinHash signature table maintained across daily
    ingests — the production contract :func:`incremental_minhash_dedup`
    promises: the 100-TB history TEXT is never re-scanned, only its
    K x 8 B/doc signature table is, and each day's novel documents
    append their signatures so tomorrow's batch dedups against them.

    Layout: plain parquet, wide signatures ``(id, mh_0..mh_{K-1})``,
    one appended file-set per ingest. Deliberately NOT bucketed: with
    the increment orders of magnitude smaller than history, both
    consuming joins build/broadcast on the INCREMENT side (band probe
    and agreement join), so history is scanned map-side and never
    shuffled — a shape no bucketing improves — and band keys cannot
    pre-bucket the wide table anyway (each row projects to
    num_hashes/rows_per_band band keys). Compact the file count
    offline if ingest cadence makes small files dominate; content is
    append-only so compaction is a rewrite-identical operation.

    :meth:`ingest` is the daily loop body: annotate the batch against
    the store, then append the novel documents' signatures. The
    annotation is materialized (``localCheckpoint``) BEFORE the append
    so the returned frame can never lazily re-read the store post-
    append and see the batch's own signatures as "history".
    """

    def __init__(
        self,
        spark,
        path: str,
        id_col: str = "doc_id",
        num_hashes: int = 8,
        shingle_n: int = 3,
    ) -> None:
        super().__init__(spark, path)
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.shingle_n = shingle_n

    def signatures_for(self, df: DataFrame, text_col: str) -> DataFrame:
        """Wide signatures of ``df`` under the store's parameters."""
        return minhash_signatures(
            df, self.id_col, text_col, self.num_hashes, self.shingle_n
        )

    def bootstrap(self, corpus: DataFrame, text_col: str) -> None:
        """Initialize (overwrite) the store from a deduped corpus."""
        self.signatures_for(corpus, text_col).write.mode("overwrite").parquet(
            self.path
        )

    def ingest(
        self,
        batch: DataFrame,
        text_col: str,
        rows_per_band: int = 2,
        min_agree: float = 0.25,
        max_band_size: int | None = None,
        band_size_quantile: float | None = None,
        salt_buckets: int = 1,
        salt_min_bucket: int | None = None,
    ) -> DataFrame:
        """Dedup ``batch`` against the store and append the novel
        documents' signatures. Returns the materialized per-batch
        annotation ``(id, dup_of, best_est, is_new)``.
        ``salt_buckets`` / ``salt_min_bucket`` ride through to
        :func:`incremental_minhash_dedup`'s probe-shaped salt arm
        (history side salted, batch replicated — row-identical, the
        recall-preserving alternative to the capping valve).

        Every cache this call creates — the batch signature pin, the
        operator's internal twin of it, and (under the quantile valve)
        the per-batch history band-count pin — lives inside a
        cache_scope, so a long-lived foreachBatch loop neither
        accumulates one pinned frame per micro-batch nor lets a later
        batch's valve read a STALE pre-append count table through
        sameResult cache substitution. The scope also cannot evict a
        cache the CALLER owns: a pre-existing equivalent pin makes the
        inner pin() a no-op, and cache_scope releases only frames
        pinned inside the body. The append happens inside the scope;
        ``res`` is checkpointed first, so nothing returned depends on
        the released caches or can lazily re-read the store
        post-append."""
        from .caching import cache_scope

        _validate_salting(salt_buckets, salt_min_bucket)  # before the pin
        self._require_bootstrapped()
        with cache_scope():
            sigs = pin(self.signatures_for(batch, text_col))
            res = incremental_minhash_dedup(
                None,
                batch,
                self.id_col,
                text_col,
                num_hashes=self.num_hashes,
                rows_per_band=rows_per_band,
                min_agree=min_agree,
                shingle_n=self.shingle_n,
                max_band_size=max_band_size,
                band_size_quantile=band_size_quantile,
                history_signatures=self.read(),
                salt_buckets=salt_buckets,
                salt_min_bucket=salt_min_bucket,
            ).localCheckpoint(eager=True)
            new_ids = res.filter(F.col("is_new") == 1).select(self.id_col)
            sigs.join(new_ids, self.id_col, "left_semi").write.mode(
                "append"
            ).parquet(self.path)
        return res


class HammingStore(_ParquetStore):
    """Persisted <= 60-bit signature table maintained across daily
    ingests — the Hamming-family analog of :class:`SignatureStore`,
    and the production contract :func:`hamming_probe` promises: the
    binary corpus (images, audio, video, simhashed text) is DECODED
    once, only its 16 B/item ``(id, sig)`` table is probed, and each
    day's novel items append their signature so tomorrow's batch
    dedups against them.

    Modality-agnostic by design: the store holds SIGNATURES, not
    payloads — the caller picks the hasher (``image_dhash``,
    ``audio_fingerprint``, ``video_fingerprint``, ``simhash``) and
    passes its output to :meth:`bootstrap` / :meth:`ingest`, so one
    store class serves every <= 60-bit modality and the decode cost
    stays wherever the caller's Arrow-batched mapInPandas ran it.

    :meth:`ingest` is the daily loop body: probe the batch against
    the store (:func:`hamming_probe` — history never self-joins),
    annotate ``(id, sig, dup_of, best_hamming, is_new)``, then append
    ONLY the novel items' signatures. The annotation is materialized
    (``localCheckpoint``) before the append so the returned frame can
    never lazily re-read the store post-append and see the batch's
    own signatures as history — the same ordering contract as every
    sibling store. BATCH-INTERNAL duplicates are deliberately out of
    scope, exactly as in :func:`incremental_minhash_dedup`: two
    identical novel signatures in one batch both annotate
    ``is_new=1`` and both append — run :func:`hamming_pairs` on the
    (small) batch first if the day's data may self-duplicate."""

    _bootstrap_hint = "bootstrap(signatures)"

    def __init__(
        self,
        spark,
        path: str,
        id_col: str = "media_id",
        sig_col: str = "sig",
        bits: int = 60,
    ) -> None:
        super().__init__(spark, path)
        self.id_col = id_col
        self.sig_col = sig_col
        self.bits = bits

    def bootstrap(self, signatures: DataFrame) -> None:
        """Initialize (overwrite) the store from a deduped corpus's
        signature table (``id_col``, ``sig_col``)."""
        signatures.select(self.id_col, self.sig_col).write.mode(
            "overwrite"
        ).parquet(self.path)

    def ingest(
        self,
        signatures: DataFrame,
        bands: int = 4,
        max_hamming: int = 3,
        max_band_size: int | None = None,
        band_size_quantile: float | None = None,
        observation: "Observation | None" = None,
        salt_buckets: int = 1,
        salt_min_bucket: int | None = None,
    ) -> DataFrame:
        """Dedup a batch's signature table against the store and
        append the novel items' signatures. Returns the materialized
        annotation ``(id, sig, dup_of, best_hamming, is_new)`` —
        ``dup_of`` is the closest history item (ties to the smaller
        id: min over (hamming, id) structs, deterministic),
        ``is_new`` = 1 when no history signature is within
        ``max_hamming``. Cache hygiene mirrors
        :meth:`SignatureStore.ingest` (everything in a cache_scope;
        checkpoint before append). ``salt_buckets`` /
        ``salt_min_bucket`` ride through to :func:`hamming_probe`'s
        probe-shaped salt arm (history side salted, batch
        replicated)."""
        from .caching import cache_scope

        _validate_banding(
            self.bits, bands, max_hamming, max_band_size,
            band_size_quantile, observation,
        )
        _validate_salting(salt_buckets, salt_min_bucket)  # same rule
        self._require_bootstrapped()
        with cache_scope():
            sigs = pin(signatures.select(self.id_col, self.sig_col))
            hist = self.read().withColumnRenamed(self.id_col, "_hist_id")
            matches = hamming_probe(
                sigs,
                hist,
                probe_id=self.id_col,
                corpus_id="_hist_id",
                sig_col=self.sig_col,
                bits=self.bits,
                bands=bands,
                max_hamming=max_hamming,
                max_band_size=max_band_size,
                band_size_quantile=band_size_quantile,
                observation=observation,
                salt_buckets=salt_buckets,
                salt_min_bucket=salt_min_bucket,
            )
            best = matches.groupBy(self.id_col).agg(
                F.min(F.struct("hamming", "_hist_id")).alias("_best")
            )
            res = (
                sigs.join(best, self.id_col, "left")
                .select(
                    self.id_col,
                    self.sig_col,
                    F.col("_best._hist_id").alias("dup_of"),
                    F.col("_best.hamming").alias("best_hamming"),
                    F.when(F.col("_best").isNull(), F.lit(1))
                    .otherwise(F.lit(0))
                    .alias("is_new"),
                )
                .localCheckpoint(eager=True)
            )
            res.filter(F.col("is_new") == 1).select(
                self.id_col, self.sig_col
            ).write.mode("append").parquet(self.path)
        return res


class WindowStore(_ParquetStore):
    """Persisted positional-window table maintained across daily
    ingests — the exact-substring analog of :class:`SignatureStore`,
    and the production contract :func:`incremental_substring_spans`
    promises: the 100-TB history TEXT is never re-tokenized, only its
    ``(_id, pos, h)`` window table (~24 B/token, window text never
    stored) is probed, and each day's novel documents append their
    windows so tomorrow's batch is checked against them.

    Layout: plain parquet, one appended file-set per ingest, NOT
    bucketed — the probe join shuffles on the 8-byte window hash that
    both sides derive, and with the increment orders of magnitude
    smaller than history the planner builds on the increment side;
    pre-bucketing by ``h`` would help only the full shuffle fallback
    and is easy to add at write time if a deployment measures that
    shape. :meth:`compact` (inherited) handles small-file buildup.

    :meth:`ingest` is the daily loop body: annotate the batch against
    the store, then append the NOVEL documents' windows — novel
    meaning no shared run of >= ``min_run_tokens`` with history, the
    same keep-one-copy policy as the signature store (documents that
    merely contain a historical passage are flagged, kept out of the
    store, and left to the caller's trim/drop policy). The annotation
    is materialized (``localCheckpoint``) BEFORE the append so the
    returned frame can never lazily re-read the store post-append and
    see the batch's own windows as "history".
    """

    def __init__(
        self,
        spark,
        path: str,
        id_col: str = "doc_id",
        window: int = 8,
    ) -> None:
        super().__init__(spark, path)
        self.id_col = id_col
        self.window = window

    def windows_for(self, df: DataFrame, text_col: str) -> DataFrame:
        """``(_id, pos, h)`` window table of ``df`` under the store's
        parameters."""
        return window_table(df, self.id_col, text_col, self.window)

    def bootstrap(self, corpus: DataFrame, text_col: str) -> None:
        """Initialize (overwrite) the store from a deduped corpus."""
        self.windows_for(corpus, text_col).write.mode("overwrite").parquet(
            self.path
        )

    def ingest(
        self,
        batch: DataFrame,
        text_col: str,
        min_run_tokens: int = 16,
        max_df: int | None = None,
        max_df_quantile: float | None = None,
        quantile_headroom: int = 10,
        salt_buckets: int = 1,
        salt_min_bucket: int | None = None,
    ) -> DataFrame:
        """Check ``batch`` for shared passages against the store and
        append the novel documents' windows. Returns the materialized
        per-batch annotation ``(id, max_run_tokens, n_hist_matches,
        best_match_id, is_new)`` — ``best_match_id`` is the history
        document with the LONGEST shared run (ties to the smaller id,
        via the same type-agnostic min_by-on-(-run, id) form as the
        signature store's best match), NULL for novel documents.

        Cache discipline mirrors :meth:`SignatureStore.ingest`: the
        batch window pin, the operator's internal twin of it
        (sameResult reuse), and any valve pins live inside a
        cache_scope, so a long-lived foreachBatch loop neither leaks a
        pin per micro-batch nor serves a later batch a STALE
        pre-append cache; the annotation is checkpointed before the
        append inside the scope. ``salt_buckets`` /
        ``salt_min_bucket`` ride through to
        :func:`incremental_substring_spans`' probe-shaped salt arm
        (history windows salted, batch replicated)."""
        from .caching import cache_scope

        _validate_salting(salt_buckets, salt_min_bucket)  # before the pin
        self._require_bootstrapped()
        with cache_scope():
            wb = pin(self.windows_for(batch, text_col))
            pairs = incremental_substring_spans(
                None,
                batch,
                self.id_col,
                text_col,
                window=self.window,
                min_run_tokens=min_run_tokens,
                max_df=max_df,
                max_df_quantile=max_df_quantile,
                quantile_headroom=quantile_headroom,
                history_windows=self.read(),
                salt_buckets=salt_buckets,
                salt_min_bucket=salt_min_bucket,
            )
            per_doc = pairs.groupBy(F.col("inc_id").alias(self.id_col)).agg(
                F.max("longest_run_tokens").alias("max_run_tokens"),
                F.count(F.lit(1)).alias("n_hist_matches"),
                F.expr(
                    "min_by(hist_id, struct(-longest_run_tokens, hist_id))"
                ).alias("best_match_id"),
            )
            res = (
                batch.select(self.id_col)
                .join(per_doc, self.id_col, "left")
                .select(
                    self.id_col,
                    F.coalesce(F.col("max_run_tokens"), F.lit(0)).alias(
                        "max_run_tokens"
                    ),
                    F.coalesce(F.col("n_hist_matches"), F.lit(0)).alias(
                        "n_hist_matches"
                    ),
                    "best_match_id",
                    F.when(F.col("max_run_tokens").isNull(), 1)
                    .otherwise(0)
                    .alias("is_new"),
                )
                .localCheckpoint(eager=True)
            )
            new_ids = res.filter(F.col("is_new") == 1).select(self.id_col)
            wb.join(
                new_ids.withColumnRenamed(self.id_col, "_id"), "_id", "left_semi"
            ).write.mode("append").parquet(self.path)
        return res
