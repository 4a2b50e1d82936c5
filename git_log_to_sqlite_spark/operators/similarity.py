"""Similarity search over embedding columns (``array<float|double>``).

* ``brute_force_topk`` — exact baseline: broadcast the query side, fold
  the dot product JVM-side (``aggregate(zip_with(...))``), rank per
  query. Right when |queries| x |corpus| comparisons fit the cluster.
* ``bucketed_ann_topk`` — the scale path: an IVF-style coarse quantizer
  assigns each vector to a cell; candidates come from an equi-join on
  the cell id, cutting each query's scan to corpus/|cells| (recall
  traded for the probe count; tests assert recall vs brute force).

No Python in the hot path: a 64-dim cosine is ~130 JVM arithmetic ops
inside codegen; a Pandas UDF would move the whole corpus through Arrow
for the same arithmetic.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.schema_cache import read_parquet_cached

if TYPE_CHECKING:
    from pyspark.sql import Observation


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


as_double = _as_double  # public: cast an embedding column once, in a side projection
dot = _dot  # public: raw dot fold — expects double arrays (as_double first)


def vnorm(arr: Column) -> Column:
    """L2 norm of an array column (casts to double, JVM-side fold).

    Compute this ONCE PER VECTOR in each side's projection (aliased
    next to the cast vector) and divide the pair dot by the two norm
    COLUMNS — never call :func:`cosine` on joined rows: a pairwise
    cosine re-folds both self-norms per candidate, tripling the
    per-pair arithmetic (3 O(dims) folds instead of 1) on the
    operator's hottest path. Same expression tree per value, so the
    result is bit-identical either way.
    """
    v = _as_double(arr)
    return F.sqrt(_dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (JVM-side fold).

    For one-shot row-local use. In a pair JOIN, precompute
    :func:`vnorm` per side instead (see its docstring) — this form
    re-evaluates both self-norms for every joined pair.
    """
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _topk(joined: DataFrame, sim: Column, k: int, round_to: int | None) -> DataFrame:
    """Shared ranking tail of every top-k operator: project
    (query_id, neighbor_id, cos_sim), rank per query (similarity desc,
    neighbor id tie-break — deterministic), keep k. ``round_to``
    rounds BEFORE ranking so tie behavior matches the SQL oracles."""
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        joined.select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


#: quantizer size up to which IvfIndex/kmeans/in-memory-ANN build
#: their assignment/fan-out expressions from centroid LITERALS instead
#: of the one-row broadcast centroid table
#: (``clustering.assign_clusters_table`` / ``nearest_cells_table``).
#: DEFAULT 0 — the table form everywhere — because it measured faster
#: or at parity at EVERY k tried (round 15, interleaved same-window
#: A/Bs at sf0.1: probe k=8 min 1.05 s table vs 1.49 s literal; build
#: k=8 1.34 vs 1.68 s; and at k=80 the literal expression's
#: analysis+codegen alone cost 28-50 s per 100-row batch vs
#: milliseconds of data work, since the literal plan GROWS with k
#: while the table plan is O(1) in analyzer cost). The literal form
#: remains the cross-checkable reference: identical arithmetic and
#: (distance, cell) tie-break, equality-asserted against the table
#: form in tests by raising this knob.
_LITERAL_FANOUT_MAX = 0


def _nearest_cells(
    vec_col_name: str,
    centroids: list[list[float]],
    n_probe: int,
    round_to: int | None = None,
) -> Column:
    """The IVF probe expression: indices of the ``n_probe`` nearest
    centroids (squared euclidean, ties to the lower cell id via struct
    ordering) — shared by every quantizer consumer so probe ordering
    can never drift between the in-memory, persisted, and dedup
    paths. ``round_to`` selects the cross-engine-stable rounded
    distance (see ``clustering._sq_dist``) for oracle-gated use."""
    from .clustering import _sq_dist

    dists = F.array(
        *[
            F.struct(
                _sq_dist(vec_col_name, cen, round_to).alias("d"),
                F.lit(j).alias("c"),
            )
            for j, cen in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(dists), 1, n_probe), lambda s: s["c"])


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector: (query_id, neighbor_id,
    cos_sim). The query side is broadcast — keep it small; the corpus
    streams through one pass. ``round_to`` rounds the similarity BEFORE
    ranking (deterministic cross-engine tie behavior)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
        vnorm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
        vnorm(F.col(vec_col)).alias("_cn"),
    )
    # norms fold once per VECTOR (side projections); the pair stage
    # pays one O(dims) dot, not three
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    joined = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    return _topk(joined, sim, k, round_to)


def lsh_bucket(
    vec_col: Column, dims: int, num_planes: int = 4, seed: str = "lsh"
) -> Column:
    """Sign-LSH coarse quantizer: bucket id from the sign pattern of
    ``num_planes`` deterministic random-hyperplane projections.

    Hyperplanes are derived from md5 of (seed, plane, dim) — no RNG
    state, so bucket assignment is reproducible across runs, engines,
    and cluster layouts. Vectors at cosine angle theta collide per
    plane with probability 1 - theta/pi (the SimHash bound), so tight
    clusters stay together. Use as the ``bucket_col`` input of
    ``bucketed_ann_topk`` when no fitted quantizer exists.
    """
    import hashlib

    def weight(p: int, d: int) -> float:
        h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
        return (int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0

    v = _as_double(vec_col)
    bucket = F.lit(0)
    for p in range(num_planes):
        plane = F.array(*[F.lit(weight(p, d)) for d in range(dims)])
        proj = _dot(v, plane)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def multiprobe_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    num_planes: int = 4,
    k: int = 5,
    round_to: int | None = None,
) -> DataFrame:
    """Multi-probe sign-LSH ANN: each query searches its own cell PLUS
    every Hamming-1 neighbor cell (flip one hyperplane sign).

    A vector near a hyperplane lands arbitrarily on either side — the
    recall failure mode of single-cell probing. Probing the
    ``num_planes`` adjacent cells recovers those borderline neighbors
    for (1 + num_planes)/2^num_planes of the corpus scanned per query,
    versus 1/2^num_planes single-probe — the classic recall/cost knob.
    Corpus vectors keep ONE cell id (storage unchanged); only the
    query side fans out, so the probe count never re-shuffles the
    corpus.
    """
    bucket = lsh_bucket(F.col(vec_col), dims, num_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        bucket.alias("_cb"),
        _as_double(F.col(vec_col)).alias("_cv"),
        vnorm(F.col(vec_col)).alias("_cn"),
    )
    probes = F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probes).alias("_qb"),
        _as_double(F.col(vec_col)).alias("_qv"),
        vnorm(F.col(vec_col)).alias("_qn"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    joined = F.broadcast(q).join(
        c, (F.col("_qb") == F.col("_cb")) & (F.col("query_id") != F.col("neighbor_id"))
    )
    return _topk(joined, sim, k, round_to)


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    n_probe: int = 2,
    k: int = 5,
    round_to: int | None = None,
    dist_round_to: int | None = None,
) -> DataFrame:
    """IVF ANN with a FITTED coarse quantizer — the production index
    shape: ``centroids`` come from :func:`~git_log_to_sqlite_spark.
    operators.clustering.kmeans` (data-adaptive Voronoi cells), each
    corpus vector lives in its nearest-centroid cell, and each query
    probes its ``n_probe`` nearest cells. Candidate mass per query is
    ~``n_probe/k_cells`` of the corpus, but unlike random hyperplanes
    the cells follow the data's density, so the same scanned fraction
    buys more recall (asserted vs sign-LSH multiprobe at the bench SF).

    Scale shape: centroids are MODEL STATE (k x dims doubles inlined
    as literals — the same contract as ``assign_clusters``), so both
    cell assignments are pure codegen projections; the probe fan-out
    multiplies only the QUERY side (broadcast), the corpus keeps one
    row per vector and is never re-shuffled; norms fold once per
    vector per side. In a persisted deployment the corpus side
    (cell, vector, norm) is written once at index-build time and
    every query batch is an equi-join against it.

    ``dist_round_to`` switches assignment AND probe to the
    cross-engine-stable rounded distance (``clustering._sq_dist``) so
    a SQL oracle can reproduce the cell decisions exactly — the
    oracle-gated deterministic tail of this operator (the iterative
    k-means FIT stays outside any oracle; pass its output, or any
    pinned centroid list, here).
    """
    from .clustering import (
        assign_clusters,
        assign_clusters_table,
        nearest_cells_table,
    )

    # same literal-vs-table trade as IvfIndex (see _LITERAL_FANOUT_MAX):
    # past a few dozen cells the literal expressions' analysis+codegen
    # cost grows with k and dominates the wall clock
    use_table = len(centroids) > _LITERAL_FANOUT_MAX
    cdf = (
        _centroids_frame(corpus.sparkSession, centroids) if use_table else None
    )
    corpus_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
        vnorm(F.col(vec_col)).alias("_cn"),
    )
    if use_table:
        c = assign_clusters_table(corpus_sel, "_cv", cdf, round_to=dist_round_to)
    else:
        c = assign_clusters(corpus_sel, "_cv", centroids, round_to=dist_round_to)
    c = c.withColumnRenamed("cluster", "_cc")
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
        vnorm(F.col(vec_col)).alias("_qn"),
    )
    if use_table:
        q = nearest_cells_table(
            q_base, "_qv", cdf, n_probe, round_to=dist_round_to
        ).select(
            "query_id",
            F.explode("_probe_cells").alias("_qc"),
            "_qv",
            "_qn",
        )
    else:
        q = q_base.select(
            "query_id",
            F.explode(
                _nearest_cells("_qv", centroids, n_probe, round_to=dist_round_to)
            ).alias("_qc"),
            "_qv",
            "_qn",
        )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    joined = F.broadcast(q).join(
        c, (F.col("_qc") == F.col("_cc")) & (F.col("query_id") != F.col("neighbor_id"))
    )
    return _topk(joined, sim, k, round_to)


def embedding_dedup_ann(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    n_probe: int = 2,
) -> DataFrame:
    """Corpus-scale embedding near-dup dedup — the production shape the
    bounded all-pairs query (``dedup_embedding_cosine``) documents:
    IVF cells generate the candidate pairs, an exact cosine verifies
    them, and every vector with a smaller-id neighbor >= ``threshold``
    is dropped (min-id survivor, no transitive chaining). Returns the
    surviving rows' ``(id, cell)``.

    Candidate generation is cell-local: each vector's ``n_probe``
    nearest cells (probe side, exploded — n_probe rows per vector)
    equi-join the corpus's primary-cell table on the cell id, so
    candidate mass is sum over cells of |probers into cell| x |cell| —
    never n^2 — and the exact cosine runs only on candidates. BOTH
    probe directions count: the join keeps ``id_a != id_b`` and marks
    ``greatest(id_a, id_b)`` as the duplicate, so a boundary pair is
    caught when EITHER vector probes the other's primary cell (an
    ``id_a < id_b`` candidate filter would silently halve boundary
    recall — only the direction where the smaller id does the probing
    would survive). Residual misses need both directions to fail —
    the standard IVF recall contract; exact parity vs the all-pairs
    form is asserted on planted near-dups in tests. Degenerate inputs
    (thousands of identical vectors) belong to exact dedup first,
    which groups them in one hash shuffle; cell balance is the
    quantizer's job (re-fit when the corpus drifts).
    """
    from .clustering import (
        assign_clusters,
        assign_clusters_table,
        nearest_cells_table,
    )

    # literal-vs-table trade, as everywhere a quantizer meets a plan
    # (see _LITERAL_FANOUT_MAX)
    use_table = len(centroids) > _LITERAL_FANOUT_MAX
    cdf = _centroids_frame(df.sparkSession, centroids) if use_table else None
    corpus_sel = df.select(
        F.col(id_col).alias("_idb"),
        _as_double(F.col(vec_col)).alias("_bv"),
        vnorm(F.col(vec_col)).alias("_bn"),
    )
    if use_table:
        c = assign_clusters_table(corpus_sel, "_bv", cdf)
    else:
        c = assign_clusters(corpus_sel, "_bv", centroids)
    c = c.withColumnRenamed("cluster", "_cell")
    a_base = df.select(
        F.col(id_col).alias("_ida"),
        _as_double(F.col(vec_col)).alias("_av"),
        vnorm(F.col(vec_col)).alias("_an"),
    )
    if use_table:
        a = nearest_cells_table(a_base, "_av", cdf, n_probe).select(
            "_ida",
            F.explode("_probe_cells").alias("_pcell"),
            "_av",
            "_an",
        )
    else:
        a = a_base.select(
            "_ida",
            F.explode(_nearest_cells("_av", centroids, n_probe)).alias("_pcell"),
            "_av",
            "_an",
        )
    sim = _dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn"))
    dup_ids = (
        a.join(
            c,
            (F.col("_pcell") == F.col("_cell")) & (F.col("_ida") != F.col("_idb")),
        )
        .filter(sim >= threshold)
        .select(F.greatest(F.col("_ida"), F.col("_idb")).alias(id_col))
        .distinct()
    )
    return (
        c.select(F.col("_idb").alias(id_col), F.col("_cell").alias("cell"))
        .join(dup_ids, id_col, "left_anti")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "list[list[float]] | DataFrame",
    threshold: float = 0.95,
    round_to: int | None = None,
    dist_round_to: int | None = None,
    observation: "Observation | None" = None,
    salt_buckets: int = 1,
    salt_min_cell: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
    SEMANTIC dedup — near-duplicate *meanings* (a paraphrase, a
    re-render, a boilerplate variant) whose embeddings sit within
    ``threshold`` cosine of each other, which exact/minhash dedup
    cannot see and which the paper showed can be removed at scale
    with minimal quality loss. The paper's exact shape: quantize the
    corpus into k cells, and WITHIN each cell rank members in a
    deterministic priority order, dropping any member within
    ``threshold`` of ANY earlier-ranked member — kept or itself
    dropped (the upper-triangular max-similarity rule, NOT a
    kept-only scan and NOT transitive-closure grouping: a chain
    a~b~c with a !~ c drops both b and c). Pairs never cross cells —
    that is the scheme's scalability contract AND its documented
    recall limit (a boundary pair split across cells survives; the
    paper accepts this, unlike :func:`embedding_dedup_ann`'s n_probe
    recovery — use that operator when cross-cell recall matters more
    than the keep-order semantics).

    Keep order follows the paper's finding that keeping the examples
    FARTHEST from the centroid works best: rank within a cell by
    (centroid_sim ASC, id ASC); a member is dropped iff some
    lower-rank member is >= ``threshold`` cosine-similar, and
    ``dup_of`` is the lowest-ranked such earlier member
    (deterministic, engine-independent under the rounding knobs).
    Returns ALL rows annotated ``(id, cell, centroid_sim, dup_of,
    is_kept)`` — the same annotate-don't-filter contract as
    :func:`~git_log_to_sqlite_spark.operators.dedup.fuzzy_decontaminate`.

    Scale shape: the quantizer is model state
    (:func:`~git_log_to_sqlite_spark.operators.clustering.
    kmeans_fit_sample` — O(sample) at any corpus size); cell
    assignment and both cosines are pure JVM codegen folds; the rank
    window and the pair join share ONE hash partitioning on the cell
    id (the window's exchange is reused for the join sides), and
    candidate mass is sum over cells of |cell|^2/2 — bounded by k,
    the paper's knob. ``centroids`` takes EITHER a Python list OR a
    ``(cell, centroid)`` DataFrame; both run the TABLE form by
    default (round 15: a list converts to the k-row model-state frame
    unless ``_LITERAL_FANOUT_MAX`` is raised — the literal expression
    measured no faster even at k=8, and at the paper's LAION setting
    — k ~ 11k x 768 dims — its k x dims literal nodes choke the
    analyzer, not the executors): assignment via
    :func:`~git_log_to_sqlite_spark.operators.clustering.
    assign_clusters_table`'s one-row broadcast array, centroid_sim
    via a broadcast hash join to the k-row table; identical
    arithmetic and tie-breaks to the raised-knob literal reference,
    asserted equal in tests; ``IvfIndex`` stores exactly this table. Degenerate inputs (thousands of
    EXACT copies) belong to exact dedup first, which groups them in
    one hash shuffle instead of |cell|^2 cosine pairs. ``round_to``
    rounds both cosines before comparing/ordering and
    ``dist_round_to`` selects the cross-engine-stable assignment
    distance — together they make the whole annotation reproducible
    by a SQL oracle (the ``sim_ann_ivf_assign`` precedent).

    ``observation`` arms the cell-size telemetry every other pair
    stage in this repo carries (:func:`_observe_cell_stats`):
    SemDeDup's candidate mass is sum |cell|(|cell|-1)/2, bounded by
    the k knob ONLY while the quantizer actually spreads the corpus —
    a degenerate corpus (every embedding near-identical, or a
    quantizer fitted on unrepresentative data) concentrates in one
    mega-cell that silently pays |corpus|^2/2. Per the paper the fix
    is upstream (exact-dedup first; refit with larger k), so this
    valve OBSERVES and never caps — capping would void the
    upper-triangular semantics the way the fuzzy_decontaminate
    docstring warns.

    ``salt_buckets`` is the telemetry's ACTION arm when refitting is
    not an option and the hot cell's members are genuinely distinct
    (post-exact-dedup): the pair join parallelizes each cell over S
    salted tasks with row-identical output (see
    :func:`_semantic_annotate` — the mega-cell probe's 10k-row cell
    consumed 721 s unsalted vs the alarm's 1.4 s; salting is the
    semantics-preserving way to spend cores on it). Default 1: the
    gate plan (`sem_dedup_assign`) and every healthy-quantizer run
    keep the unsalted single-pass shape. ``salt_min_cell`` targets
    the salt at cells that size or larger, so only the hot cells pay
    the S-way replication — the at-scale form
    (:func:`_semantic_annotate`)."""
    ranked = _semantic_ranked(
        df, id_col, vec_col, centroids, round_to, dist_round_to
    )
    if observation is not None:
        _observe_cell_stats(ranked, observation)
    return _semantic_annotate(
        ranked, id_col, threshold, round_to, salt_buckets, salt_min_cell
    )


def _centroids_frame(spark, centroids: "list[list[float]]") -> DataFrame:
    """The k-row ``(cell, centroid)`` model-state frame every
    persisted quantizer writes (IvfIndex.build, SemanticStore.
    bootstrap), built via the ARROW local path: a pandas input
    converts driver-side to Arrow batches and lands as a JVM
    LocalRelation — no pickled partitions and no Python workers at
    execution. The tuple-list ``createDataFrame`` form spreads the
    rows over defaultParallelism pickled partitions instead, and its
    write measured 0.57–1.7 s against 0.25–0.31 s here for the same
    8 rows (value-identical output; BASELINE.md round-13 notes) —
    pure Python-worker round-trip cost for a k-row table.
    ``repartition(1)``, NOT ``coalesce(1)``: one output file for the
    model state, and on a LocalRelation the shuffle is a trivial
    JVM move of k rows (the serial Python-worker deserialize trap
    coalesce used to hit is gone with the workers themselves)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cell": range(len(centroids)),
            "centroid": [[float(x) for x in c] for c in centroids],
        }
    )
    return spark.createDataFrame(
        pdf, "cell int, centroid array<double>"
    ).repartition(1)


def recommend_salt_min_cell(
    df: DataFrame,
    vec_col: str,
    centroids: "list[list[float]] | DataFrame",
    quantile: float = 0.92,
    spread: int = 10,
    straggler_factor: float = 2.0,
    dist_round_to: int | None = None,
) -> "int | None":
    """Derive a recommended ``salt_min_cell`` for this corpus under
    this quantizer, from the cell-occupancy distribution
    :func:`_observe_cell_stats` reports (:func:`~.skew.
    recommend_salt_threshold` — the shared spread + straggler
    guards). ``None`` means don't arm: the quantizer spreads the
    corpus (every cell near the bulk occupancy), or the largest
    cell's pair mass is too light to be the critical path. A non-None
    value passes verbatim to :func:`semantic_dedup` /
    :class:`SemanticStore` ``salt_min_cell``. Runs the assignment
    only (no rank window, no cosine — cheaper than the operator it
    advises); ``centroids`` takes either form
    (:func:`~.clustering.assign_clusters` literals or the
    :func:`~.clustering.assign_clusters_table` large-k table), with
    ``dist_round_to`` matching the operator call so the advised plan
    assigns identically. Diagnostic-only: no pins, no effect on any
    subsequent plan — but the convenience costs one corpus pass (the
    k-way assignment fold); at production scale, prefer handing
    :func:`~.skew.recommend_salt_threshold` a cell-assigned frame
    your pipeline already has (the SemDeDup ranked frame, a store's
    kept table) instead of re-assigning here."""
    from .clustering import assign_clusters, assign_clusters_table
    from .skew import recommend_salt_threshold

    base = df.select(_as_double(F.col(vec_col)).alias("_v"))
    if isinstance(centroids, DataFrame):
        assigned = assign_clusters_table(
            base, "_v", centroids, round_to=dist_round_to
        )
    else:
        assigned = assign_clusters(
            base, "_v", centroids, round_to=dist_round_to
        )
    return recommend_salt_threshold(
        assigned.select(F.col("cluster").alias("cell")),
        ["cell"],
        quantile=quantile,
        spread=spread,
        straggler_factor=straggler_factor,
    )


def _observe_cell_stats(ranked: DataFrame, observation: "Observation") -> None:
    """Cell-occupancy telemetry for the SemDeDup family — the one pair
    stage that had no observable for its degenerate input (the VERDICT
    r11 scale watch). Emits, over the PINNED ranked frame:

    * ``cells`` — occupied cell count,
    * ``max_cell_rows`` — the largest cell's membership (a mega-cell
      detector: max_cell_rows ~ corpus size means the quantizer is
      not doing its job and the pair join will pay ~|corpus|^2/2),
    * ``pair_mass`` — sum d(d-1)/2 over cells, the EXACT candidate
      row count the upper-triangular join will produce.

    EAGER, per the round-9 doctrine (`_capped_bands` docstring: a
    lazily-planned observe node under AQE loses its metrics row when
    stage-wrapped/pruned/duplicated): a dedicated tiny aggregate
    rooted on the pinned frame, drained JVM-side with ``.count()`` at
    operator-call time — it doubles as the pin's materialization, so
    the annotate stage that follows reads the cache. Deliberately
    annotate-don't-cap: shedding members would break the paper's
    drop rule, so a pipeline alerts on the metrics instead (the
    documented mitigations: exact-dedup first, larger k)."""
    counts = ranked.groupBy("cell").agg(F.count(F.lit(1)).alias("d"))
    d = F.col("d").cast("long")
    # d(d-1)/2 via shiftright: pure long arithmetic (d(d-1) is always
    # even), so the sum is EXACT where the float-division form would
    # round past 2^53 — i.e. precisely the mega-cell regime this valve
    # exists to detect. (The long multiply itself overflows at
    # d ~ 3e9 rows in ONE cell — beyond that the ANSI overflow error
    # is itself the alarm.)
    counts.observe(
        observation,
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("long").alias("cells"),
        F.coalesce(F.max(d), F.lit(0)).cast("long").alias("max_cell_rows"),
        F.coalesce(F.sum(F.shiftright(d * (d - 1), 1)), F.lit(0))
        .cast("long")
        .alias("pair_mass"),
    ).count()


def _checked_embedding(vec_col: str, dim: int, context: str) -> Column:
    """Per-row vector-validity guard shared by the persistent stores
    (IvfIndex.append, SemanticStore.bootstrap/ingest): counting
    NON-NULL elements against the quantizer dim rejects BOTH a
    wrong-length vector and a right-length one carrying NULL elements
    (an upstream outer join's classic residue) — either would
    null-poison the zip_with distances into a meaningless cell and
    permanently corrupt a persisted table. Inline in the assignment
    projection (free next to the k dot products), so a bad batch
    fails the job BEFORE the parquet commit and a mixed batch cannot
    slip past a sampled pre-check."""
    vec = _as_double(F.col(vec_col))
    nn = F.size(F.filter(vec, lambda x: x.isNotNull()))
    # BOTH conditions: nn == dim alone would pass an over-length
    # vector whose null padding leaves exactly dim non-nulls (a
    # schema-migration backfill shape) — still a null-poisoned
    # assignment
    return F.when((F.size(vec) == dim) & (nn == dim), vec).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{context}: vector dim "),
                F.size(vec).cast("string"),
                F.lit(" (non-null "),
                nn.cast("string"),
                F.lit(
                    f") != quantizer dim {dim} — wrong-dim or "
                    "null-element vectors would be cell-assigned by "
                    "null-poisoned distances; rebuild if the embedding "
                    "space changed"
                ),
            )
        )
    )


def _semantic_ranked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "list[list[float]] | DataFrame",
    round_to: int | None,
    dist_round_to: int | None,
    expect_dim: int | None = None,
    guard_context: str = "",
) -> DataFrame:
    """SemDeDup's assignment+rank stage, shared by the batch operator
    and SemanticStore (which must run it exactly once per ingest):
    returns the PINNED ``(_id, _v, _n, cell, _csim, _rank)`` frame.
    Pinned because it feeds both self-join sides and the annotation
    spine, whose pruned ReadSchemas differ — structurally different
    subtrees, so ReuseExchange never fires and the scan -> assignment
    (k distance folds) -> cosine -> window tree would execute three
    times (measured: 3 scans, 2 window executions, 0 reuses at the
    bench SF; ~2x wall clock). One row per vector, input-proportional
    — the same trade as every pair-stage pin in this repo; the
    table-path centroid columns are dropped BEFORE the pin so high
    dims don't double the cache bytes. ``expect_dim`` arms the
    per-row :func:`_checked_embedding` guard (store callers)."""
    import math

    from .caching import pin
    from .clustering import assign_clusters, assign_clusters_table

    vec = (
        _checked_embedding(vec_col, expect_dim, guard_context)
        if expect_dim is not None
        else _as_double(F.col(vec_col))
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        vec.alias("_v"),
        vnorm(F.col(vec_col)).alias("_n"),
    )
    if (
        not isinstance(centroids, DataFrame)
        and len(centroids) > _LITERAL_FANOUT_MAX
    ):
        # honor the quantizer-wide default (round 15: the table form
        # measured faster at every k tried): a literal LIST converts
        # to the k-row model-state frame unless the knob is raised
        centroids = _centroids_frame(df.sparkSession, centroids)
    if isinstance(centroids, DataFrame):
        # table path: centroids as DATA (see assign_clusters_table)
        # — assignment via the one-row broadcast array, centroid_sim
        # via a broadcast hash join back to the k-row table. Same
        # arithmetic, O(1) analyzer cost at any k.
        ranked = assign_clusters_table(
            base, "_v", centroids, round_to=dist_round_to
        ).withColumnRenamed("cluster", "cell")
        cenj = centroids.select(
            "cell",
            F.col("centroid").alias("_cen"),
            F.sqrt(_dot(F.col("centroid"), F.col("centroid"))).alias("_cen_n"),
        )
        ranked = ranked.join(F.broadcast(cenj), "cell")
        cden = F.col("_n") * F.col("_cen_n")
        cnum = _dot(F.col("_v"), F.col("_cen"))
    else:
        ranked = assign_clusters(
            base, "_v", centroids, round_to=dist_round_to
        ).withColumnRenamed("cluster", "cell")
        cen_arr = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        cen_norms = F.array(
            *[F.lit(math.sqrt(sum(x * x for x in c))) for c in centroids]
        )
        cden = F.col("_n") * F.get(cen_norms, F.col("cell"))
        cnum = _dot(F.col("_v"), F.get(cen_arr, F.col("cell")))
    # zero-norm guard #1: a zero vector (failed encoder, empty input)
    # would make this 0/0 — a hard DIVIDE_BY_ZERO under ANSI mode.
    # NaN-out its centroid_sim instead: NaN sorts GREATEST, so zero
    # vectors deterministically rank LAST in their cell (ties by id).
    csim = F.when(cden > 0, cnum / cden).otherwise(F.lit(float("nan")))
    if round_to is not None:
        csim = F.round(csim, round_to)
    return pin(
        ranked.withColumn("_csim", csim)
        .drop("_cen", "_cen_n")  # csim is materialized; don't cache k x dims per row
        .withColumn(
            "_rank",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(F.asc("_csim"), F.asc("_id"))
            ),
        )
    )


def _semantic_annotate(
    ranked: DataFrame,
    id_col: str,
    threshold: float,
    round_to: int | None,
    salt_buckets: int = 1,
    salt_min_cell: int | None = None,
) -> DataFrame:
    """SemDeDup's upper-triangular drop stage over a pinned
    :func:`_semantic_ranked` frame: cell-local (rank_a < rank_b) pair
    join, drop b on >= threshold cosine, blame the lowest-ranked such
    a (min (rank, id) structs — deterministic).

    ``salt_buckets`` recovers PARALLELISM on hot cells without
    touching the semantics: the pair join's only equi-key is the cell
    id, so one oversized cell is ONE join key — one task pays that
    cell's d(d-1)/2 pairs serially, no matter how many cores idle
    (measured in BASELINE.md's mega-cell probe: a 10k-row cell's 50M
    pairs ran 87x slower than 16 cells carrying 3.1M, quadratic AND
    serialized; AQE's skew split cannot divide a single key's sort-
    merge group). With ``salt_buckets=S > 1`` the a-side gets a
    deterministic id-hash salt, the b-side replicates S ways
    (:func:`~.skew.salted_pair_sides` — the shared AQE-proof shape,
    :func:`~.skew._salt`'s deterministic-never-rand() rule), and the
    join keys on
    (cell, salt): every (a, b) pair still meets exactly once — at
    a's salt — so the output is row-identical to the unsalted plan,
    while the hot cell's pair work spreads over S tasks. Price:
    S x the b-side shuffle volume, so the default stays 1 for
    healthy quantizers; arm it when :func:`_observe_cell_stats`
    reports a max_cell_rows worth splitting. Unlike CAPPING (which
    the fuzzy_decontaminate doctrine forbids here — shedding members
    voids the paper's drop rule), salting is a pure execution
    strategy: the recall guarantee is untouched.

    Scope note: the salt parallelizes the PAIR JOIN only. The rank
    window upstream still sorts each cell in one task (row_number
    requires its partition on one reducer) — but that term is
    O(d log d) per cell against the join's O(d^2), so at mega-cell
    d the join dominates by ~d/log d (the probe's 10k-row cell:
    ranked build ~1.4 s vs 720.9 s unsalted join); the window is the
    lesser term precisely when salting matters.

    ``salt_min_cell`` makes the salt TARGETED — the production form
    at corpus scale: only cells with >= that many members salt and
    replicate (a map-combinable cell count derives the hot set;
    :func:`~.skew.salted_pair_sides` marks both sides), every other
    cell keeps salt 0 and its shuffle volume UNCHANGED. Without it
    the whole b-side (the entire ranked corpus) replicates S ways —
    acceptable for a one-off rescue on a mid-size corpus, a
    non-starter at 100 TB. Pick the threshold from the cell-stats
    telemetry's max_cell_rows.  The contract is ``salt_min_cell >= 2``
    (enforced by :func:`~.skew._validate_pair_salting` here and in
    :class:`SemanticStore`): the shared :func:`~.dedup._hot_key_set`
    derivation pre-filters to repeated cells (d >= 2), which is
    behavior-identical to the inline derivation it replaced exactly
    because 1 is rejected — a singleton cell emits no pairs, so it
    could never need the salt anyway."""
    from .skew import _validate_pair_salting

    _validate_pair_salting(salt_buckets, salt_min_cell, "salt_min_cell")
    a = ranked.select(
        F.col("cell").alias("_ca"), F.col("_rank").alias("_ra"),
        F.col("_id").alias("_ia"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = ranked.select(
        F.col("cell").alias("_cb"), F.col("_rank").alias("_rb"),
        F.col("_id").alias("_ib"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    pair_cond = (F.col("_ca") == F.col("_cb")) & (F.col("_ra") < F.col("_rb"))
    if salt_buckets > 1:
        # the shared AQE-proof salting shape (deterministic a-side
        # id-hash salt, b-side replicated S ways, both sides
        # co-partitioned on (cell, salt) at a FIXED partition count —
        # the full why, including the two measured AQE defeat modes
        # of key-only salting, lives on the helper)
        from .skew import salted_pair_sides

        hot_a = hot_b = None
        if salt_min_cell is not None:
            # the shared hot-key derivation (single-sourced with the
            # band valves: map-combinable count, > cap-1 == the
            # >= salt_min_cell contract, returned pinned for the two
            # marking consumers)
            from .dedup import _hot_key_set

            hot = _hot_key_set(ranked, ["cell"], salt_min_cell - 1, None)
            hot_a = hot.select(F.col("cell").alias("_ca"))
            hot_b = hot.select(F.col("cell").alias("_cb"))
        a, b, salt_cond = salted_pair_sides(
            a, b, ["_ca"], ["_cb"], "_ia", salt_buckets,
            hot_a=hot_a, hot_b=hot_b,
        )
        pair_cond = pair_cond & salt_cond
    # zero-norm guard #2: a pair cosine involving a zero vector would
    # be 0/0 — DIVIDE_BY_ZERO under ANSI, and under non-ANSI a NaN
    # that Spark compares LARGER than any number, which would mark
    # every zero vector a "duplicate" of an arbitrary unrelated
    # cell-mate. A zero-norm pair carries no similarity evidence, so
    # it scores -inf: zero vectors are never dropped and never blamed
    # (identical zero vectors belong to exact dedup, which groups
    # them in one hash shuffle).
    pden = F.col("_na") * F.col("_nb")
    sim = F.when(
        pden > 0, _dot(F.col("_va"), F.col("_vb")) / pden
    ).otherwise(F.lit(float("-inf")))
    if round_to is not None:
        sim = F.round(sim, round_to)
    drops = (
        a.join(b, pair_cond)
        .filter(sim >= F.lit(threshold))
        .groupBy(F.col("_ib").alias("_id"))
        .agg(F.min(F.struct("_ra", "_ia"))["_ia"].alias("dup_of"))
    )
    return (
        ranked.join(drops, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            F.col("_csim").alias("centroid_sim"),
            "dup_of",
            F.col("dup_of").isNull().cast("int").alias("is_kept"),
        )
    )


class IvfIndex:
    """Persisted IVF index — the build-once / probe-many deployment of
    :func:`ivf_ann_topk`: the fitted corpus (one row per vector:
    id, cast vector, precomputed norm, assigned cell) lives as parquet
    PARTITIONED BY CELL, and the centroids (model state, k x dims
    doubles) live beside it as a tiny parquet. Each probe batch then
    reads only the probed cells: the batch's cell set is collected
    (bounded by k) and STATICALLY prunes the partitioned scan — see
    :meth:`probe` for why dynamic partition pruning is not relied on
    (measured: it never fired on bare batches) — so a batch probing
    m of k cells reads ~m/k of the index bytes, asserted on the
    executed scan's own metrics in tests. Rebuild
    the index when the corpus drifts (centroid fit is a batch job, the
    same cadence as any ANN index rebuild).
    """

    def __init__(
        self,
        spark,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col

    def build(
        self,
        corpus: DataFrame,
        k: int = 8,
        max_iter: int = 10,
        fit_sample_size: int | None = 4096,
        stage_times: "dict | None" = None,
    ) -> None:
        """Fit the quantizer on ``corpus`` and (over)write the index.

        The fit defaults to the bounded-sample quantizer training
        (:func:`~git_log_to_sqlite_spark.operators.clustering.
        kmeans_fit_sample`, ``fit_sample_size`` vectors): one
        bounded-output job however large the corpus, versus
        ``max_iter`` full scans for the distributed loop — the FAISS
        IVF training shape, and the difference between an O(sample)
        and an O(corpus x iterations) rebuild at 100 TB. Pass
        ``fit_sample_size=None`` for the full-corpus Lloyd's fit.

        BEHAVIOR CHANGE (since the bounded-sample fit landed): the
        default was previously the full-corpus Lloyd's loop, so an
        unchanged ``build()`` call now fits on a 4096-row
        deterministic sample and produces DIFFERENT centroids (and
        slightly different probe recall) than before. The sample is
        md5-ordered, so the new default is still deterministic across
        runs; callers needing the exact pre-change centroids opt out
        with ``fit_sample_size=None``. Also noted in README
        "Behavior changes".

        ``stage_times``: pass a dict to receive per-stage wall-clock
        seconds — ``fit`` (the quantizer training action),
        ``assign_write`` (the cell assignment pipelined into the
        partitioned index write: assignment is a lazy projection the
        write executes, so the two are ONE job by design — timing
        them apart would require an extra materialization), and
        ``centroids_write`` (the k-row model-state write). A rebuild
        is the most contention-variance-prone extra in the bench
        (write amplification), so the per-stage split is what lets a
        reader attribute a slow whole-run number to fit dispatch vs
        write contention instead of re-litigating it from floor lore.
        """
        import time

        from .clustering import (
            assign_clusters,
            assign_clusters_table,
            kmeans,
            kmeans_fit_sample,
        )

        fit = corpus.select(
            self.id_col, _as_double(F.col(self.vec_col)).alias("_v")
        )
        t0 = time.perf_counter()
        if fit_sample_size is None:
            _, centroids = kmeans(fit, self.id_col, "_v", k=k, max_iter=max_iter)
        else:
            centroids = kmeans_fit_sample(
                fit, self.id_col, "_v", k=k, max_iter=max_iter,
                sample_size=fit_sample_size,
            )
        if stage_times is not None:
            stage_times["fit"] = round(time.perf_counter() - t0, 3)
        to_assign = corpus.select(
            F.col(self.id_col).alias("neighbor_id"),
            _as_double(F.col(self.vec_col)).alias("_cv"),
            vnorm(F.col(self.vec_col)).alias("_cn"),
        )
        # same literal-vs-table trade as probe(): table form by
        # default (the literal assignment expression's analysis+codegen
        # cost grows with k and measured no faster even at k=8);
        # identical arithmetic and tie-break, append() always used it
        if len(centroids) <= _LITERAL_FANOUT_MAX:
            indexed = assign_clusters(to_assign, "_cv", centroids)
        else:
            indexed = assign_clusters_table(
                to_assign, "_cv", _centroids_frame(self.spark, centroids)
            )
        indexed = indexed.withColumnRenamed("cluster", "cell")
        t0 = time.perf_counter()
        indexed.write.mode("overwrite").partitionBy("cell").parquet(
            f"{self.path}/index"
        )
        if stage_times is not None:
            stage_times["assign_write"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        _centroids_frame(self.spark, centroids).write.mode("overwrite").parquet(
            f"{self.path}/centroids"
        )
        if stage_times is not None:
            stage_times["centroids_write"] = round(time.perf_counter() - t0, 3)

    def centroids(self) -> list[list[float]]:
        rows = (
            read_parquet_cached(self.spark, f"{self.path}/centroids")
            .orderBy("cell")
            .collect()
        )
        return [list(r["centroid"]) for r in rows]

    def exists(self) -> bool:
        """True iff the index has been built at ``path`` — mapping
        ONLY a missing location (the analyzer's PATH_NOT_FOUND) to
        False, exactly ``SignatureStore.exists``'s contract: any
        other failure — transient IO, permissions, a momentarily
        unreachable object store — propagates, because conflating it
        with "never built" would make :meth:`append`'s guard advise a
        rebuild whose ``mode("overwrite")`` destroys a live index."""
        from pyspark.errors import AnalysisException

        try:
            self.spark.read.parquet(f"{self.path}/centroids").schema
            return True
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc):
                return False
            raise

    def append(self, new_vectors: DataFrame) -> None:
        """Grow the index WITHOUT refitting — the daily-ingest shape of
        the persisted-index family (``SignatureStore.ingest`` for
        minhash, ``WindowStore`` for substring windows): the quantizer
        is model state fitted at build time, so new vectors are
        assigned to the EXISTING cells (one codegen projection, no
        shuffle beyond the partitioned write) and appended to the
        cell-partitioned parquet. The existing index is never
        re-scanned or re-written — an append touches only the new
        rows, so daily growth costs O(increment) however large the
        index. Probes see appended rows immediately (the cell scan
        reads every file of the probed partitions). Rebuild when the
        corpus distribution drifts; :meth:`cell_sizes` is the
        observable (a cell absorbing a disproportionate share of
        appends means the Voronoi tessellation no longer fits the
        data and probe candidate mass is skewing).

        Every appended vector is validated against the stored
        quantizer IN the assignment projection (a per-row
        non-null-element count vs the quantizer dim — free next to
        the k dot products), because ``zip_with`` pads mismatched
        dims with nulls AND propagates null elements: a wrong-dim or
        null-element vector would otherwise be assigned by a
        null-poisoned distance and sit permanently in the wrong
        cell. A sampled pre-check can't catch a mixed batch; the
        inline guard fails the job before the parquet commit, so a
        bad batch leaves the index untouched."""
        if not self.exists():
            raise ValueError(
                f"no index at {self.path}: build() first — appending to "
                "an unbuilt index would silently create an empty-"
                "quantizer store"
            )
        from .clustering import assign_clusters_table

        # assignment via the centroid TABLE the index already persists
        # (assign_clusters_table: one-row broadcast array, identical
        # arithmetic and tie-break to the literal form by test) — no
        # driver collect of the quantizer, so append stays
        # O(increment) even under a large-k coarse quantizer; only the
        # 1-int dim probe touches the driver
        cents_df = read_parquet_cached(self.spark, f"{self.path}/centroids")
        dim = cents_df.select(F.size("centroid")).first()[0]
        checked = _checked_embedding(
            self.vec_col, dim, f"IvfIndex.append at {self.path}"
        )
        assigned = assign_clusters_table(
            new_vectors.select(
                F.col(self.id_col).alias("neighbor_id"),
                checked.alias("_cv"),
                vnorm(F.col(self.vec_col)).alias("_cn"),
            ),
            "_cv",
            cents_df,
        ).withColumnRenamed("cluster", "cell")
        assigned.write.mode("append").partitionBy("cell").parquet(
            f"{self.path}/index"
        )

    def cell_sizes(self) -> DataFrame:
        """``(cell, n_vectors)`` — the index-health observable: cell
        balance is the quantizer's job, and a skewing cell after
        appends is the rebuild signal. Partition-pruned count per
        cell (parquet row-group metadata makes this near-free)."""
        return (
            read_parquet_cached(self.spark, f"{self.path}/index")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )

    def probe(
        self,
        queries: DataFrame,
        n_probe: int = 2,
        k: int = 5,
        round_to: int | None = None,
    ) -> DataFrame:
        """Top-k neighbors per query against the persisted index.

        HARD CONTRACT on ``queries``: the probe side is FORCE-broadcast
        (after the n_probe cell fan-out — n_probe rows per query of
        ~8 B x dims each); unhinted, a bad estimate could shuffle the
        INDEX instead. A probe batch must therefore fit a broadcast
        (tens of MB = ~100k queries at 64 dims); for corpus-sized
        "probes" use :func:`embedding_dedup_ann` (all-vs-index dedup)
        — or chunk the batch and union, which is exact since per-query
        top-k is independent across chunks.

        Partition pruning is STATIC, not dynamic: the batch's probed
        cells are collected (a bounded model-state-class collect —
        at most min(|batch| x n_probe, k) ints, the same class as the
        ``centroids()`` read above) and applied as an ``isin`` filter
        on the partition column, so the scan reads exactly the probed
        cells' files whatever the planner estimates. Spark's dynamic
        partition pruning is NOT relied on because its insertion rule
        requires a selective predicate (a Filter) on the build side,
        and a real probe batch — a LocalRelation, a checkpoint, a
        plain parquet table — has none: measured on an 8x-replicated
        sf0.1 corpus, the DPP-shaped join read all 64 files / 16,000
        rows of the index for a single-cell probe batch (round 14,
        BASELINE.md).

        This makes ``probe`` EAGER: the (bounded) fan-out frame is
        pinned via ``localCheckpoint`` when this method is CALLED —
        one materialization feeds both the cell-set collect and the
        join, so a non-deterministic ``queries`` source (an unordered
        limit, a sample, a table appended to mid-flight) cannot leave
        the pruned scan disagreeing with the cells the join actually
        probes.

        Fan-out form (round 15): by default the assignment runs via
        ``clustering.nearest_cells_table`` — the one-row broadcast
        centroid array with identical arithmetic and tie-break to the
        literal expression (equality-asserted in tests) — because the
        literal form's analysis+codegen GROWS with k (measured: it
        dominated probe wall-clock by k=80, ~28-50 s per 100-row
        batch vs milliseconds of data work) and measured SLOWER even
        at k=8 (interleaved A/B: 1.49 vs 1.05 s min). A deployment
        grows k with the corpus precisely to keep cells bounded, so
        the table form's flat cost curve is the one the index needs;
        raising ``_LITERAL_FANOUT_MAX`` restores the literal codegen
        plan (the reference form the equality tests pin against).
        Under the shipped default (``_LITERAL_FANOUT_MAX = 0``) the
        form choice short-circuits without ANY Spark job: the count
        comparison can never pick the literal branch, so the k-row
        count() (parquet-metadata-only, but still a job dispatch per
        probe call) runs only when the knob is raised."""
        index = read_parquet_cached(self.spark, f"{self.path}/index")
        cents_df = read_parquet_cached(self.spark, f"{self.path}/centroids")
        base = queries.select(
            F.col(self.id_col).alias("query_id"),
            _as_double(F.col(self.vec_col)).alias("_qv"),
            vnorm(F.col(self.vec_col)).alias("_qn"),
        )
        if _LITERAL_FANOUT_MAX > 0 and cents_df.count() <= _LITERAL_FANOUT_MAX:
            fanned = base.select(
                "query_id",
                F.explode(
                    _nearest_cells("_qv", self.centroids(), n_probe)
                ).alias("_qc"),
                "_qv",
                "_qn",
            )
        else:
            from .clustering import nearest_cells_table

            fanned = nearest_cells_table(base, "_qv", cents_df, n_probe).select(
                "query_id",
                F.explode("_probe_cells").alias("_qc"),
                "_qv",
                "_qn",
            )
        q = fanned.localCheckpoint(eager=True)
        probed = sorted(
            r["_qc"] for r in q.select("_qc").distinct().collect()
        )
        index = index.filter(F.col("cell").isin(probed))
        sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
        joined = F.broadcast(q).join(
            index,
            (F.col("_qc") == F.col("cell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        return _topk(joined, sim, k, round_to)


def bucketed_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    k: int = 5,
    round_to: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: candidates restricted to the
    query's coarse cell (``bucket_col``). With balanced cells this is
    a 1/|cells| scan per query; recall depends on quantizer quality.

    HARD CONTRACT on the ``queries`` side: the broadcast is FORCED —
    the hint is what keeps the corpus un-shuffled (each executor
    streams its corpus partitions against the in-memory query batch;
    unhinted, a bad size estimate could silently shuffle the corpus
    on the cell key instead). So the PROBE BATCH must fit a broadcast:
    each query row is its cast vector + norm (~8 B x dims + 16 B), and
    an executor holds one copy — 100k x 64-dim queries is ~50 MB,
    fine; a corpus-sized query side is not. Callers probing with
    something corpus-sized are computing all-pairs similarity and
    want :func:`~git_log_to_sqlite_spark.plans.similarity` 's
    threshold-pair shape or :func:`embedding_dedup_ann` instead;
    otherwise chunk the probe batch and union the results — top-k per
    query is independent across chunks, so chunking is exact."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(bucket_col).alias("_qb"),
        _as_double(F.col(vec_col)).alias("_qv"),
        vnorm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bucket_col).alias("_cb"),
        _as_double(F.col(vec_col)).alias("_cv"),
        vnorm(F.col(vec_col)).alias("_cn"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    joined = F.broadcast(q).join(
        c, (F.col("_qb") == F.col("_cb")) & (F.col("query_id") != F.col("neighbor_id"))
    )
    return _topk(joined, sim, k, round_to)


from .dedup import _ParquetStore


class SemanticStore(_ParquetStore):
    """Persisted KEPT-set for incremental SemDeDup — the embedding
    modality's daily-ingest store, completing the per-modality family
    (:class:`~git_log_to_sqlite_spark.operators.dedup.SignatureStore`
    for minhash, ``WindowStore`` for substring windows,
    ``HammingStore`` for <= 60-bit signatures, :class:`IvfIndex` for
    ANN): the kept corpus's ``(id, vector, norm, cell)`` table lives
    as parquet PARTITIONED BY CELL (``{base}/kept`` — the inherited
    ``_ParquetStore`` machinery points there; ``compact()`` included)
    beside the quantizer's centroid table (``{base}/centroids``),
    each day's batch is annotated against it, and only the batch's
    novel (kept) rows append — history is never re-embedded,
    re-assigned, or self-joined, so daily growth costs O(increment x
    probed-cell mass). Every incoming vector passes the per-row
    :func:`_checked_embedding` guard (the IvfIndex.append contract):
    a wrong-dim or null-element vector fails the job before any
    parquet commit instead of silently poisoning the kept table.

    Priority semantics — the family's first-seen-wins contract, which
    REPLACES batch-mode :func:`semantic_dedup`'s global
    centroid_sim rank (an arrival-order priority is the only one an
    append-only store can honor; the same documented divergence as
    ``incremental_minhash_dedup`` vs global minhash):

    * a batch row within ``threshold`` of a STORED kept row drops,
      blaming the most-similar stored row (ties to the smaller id —
      min over (-sim, id) structs, deterministic);
    * otherwise the batch-INTERNAL upper-triangular rule applies
      (the shared :func:`_semantic_annotate` stage over the SAME
      ranked frame the history probe uses — the batch is scanned and
      assigned exactly once per ingest): a row similar to an
      earlier-ranked batch row drops blaming it — even when that
      earlier row itself dropped against history (the
      kept-or-itself-dropped rule, so a batch that arrives with its
      own near-copies of a historical item resolves them all in one
      ingest);
    * history blame WINS when both apply.

    Flagged rows' vectors are never appended; like every sibling
    store, the returned annotation is checkpointed BEFORE the append
    so it can never lazily re-read the store post-append, and every
    internal pin lives in a cache_scope (bootstrap included — the
    ranked frame is corpus-sized there)."""

    _bootstrap_hint = "bootstrap(corpus, centroids)"
    _partition_cols = ("cell",)  # compact() must keep the cell layout

    def __init__(
        self,
        spark,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.95,
        round_to: int | None = None,
        dist_round_to: int | None = None,
        salt_buckets: int = 1,
        salt_min_cell: int | None = None,
    ) -> None:
        super().__init__(spark, f"{path.rstrip('/')}/kept")
        self.base = path.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.round_to = round_to
        self.dist_round_to = dist_round_to
        #: hot-cell parallelism for the intra-batch/bootstrap pair
        #: stage (see :func:`_semantic_annotate` — row-identical
        #: output, S x b-side shuffle) AND for the history probe join
        #: in :meth:`ingest` (probe shape: store side salted per kept
        #: row, batch replicated — the backfill-regime arm, where a
        #: hot cell's |batch cell| x |kept cell| product is one join
        #: key unsalted; when armed, a small daily batch pays the
        #: pinned co-partitioning shuffles instead of the free
        #: broadcast — pennies on an increment). Validated HERE, not
        #: first inside bootstrap's annotate stage — by then the
        #: centroid table has already been overwritten and the store
        #: would be left half-written. salt_min_cell targets the salt
        #: at hot cells only (bounded replication — the at-scale
        #: form; on the history probe, hotness is measured on the
        #: STORE side, the _band_probe_pairs convention).
        from .skew import _validate_pair_salting

        _validate_pair_salting(salt_buckets, salt_min_cell, "salt_min_cell")
        self.salt_buckets = salt_buckets
        self.salt_min_cell = salt_min_cell
        self._dim_cache: int | None = None

    def centroids_df(self) -> DataFrame:
        return read_parquet_cached(self.spark, f"{self.base}/centroids")

    def _dim(self) -> int:
        # memoized: the quantizer dim is immutable between bootstraps
        # (append-only kept table, centroids written once), so one
        # k-row parquet read per store LIFETIME, not one per ingest.
        # Single-writer contract (the whole store family's): a
        # re-bootstrap through ANOTHER handle/process invalidates this
        # handle entirely (threshold/rounding config could differ
        # too, and its in-flight ingest would race the overwrite) —
        # open a fresh SemanticStore after any external re-bootstrap.
        if self._dim_cache is None:
            self._dim_cache = (
                self.centroids_df().select(F.size("centroid")).first()[0]
            )
        return self._dim_cache

    def bootstrap(
        self,
        corpus: DataFrame,
        centroids: "list[list[float]] | DataFrame",
        observation: "Observation | None" = None,
    ) -> None:
        """Initialize (overwrite) the store: run batch SemDeDup on
        ``corpus`` under ``centroids`` (the fitted quantizer — list or
        ``(cell, centroid)`` table) and persist the KEPT rows'
        ``(id, vector, norm, cell)`` plus the centroid table. The
        bootstrap corpus itself gets the paper's centroid-rank
        priority; arrival order takes over from the first ingest.
        ``observation`` arms :func:`_observe_cell_stats` over the
        corpus-sized ranked frame — the store path's mega-cell valve
        (bootstrap is where the |corpus|^2/2 degenerate risk lives)."""
        from .caching import cache_scope

        self._dim_cache = None  # new quantizer → re-read the dim
        if not isinstance(centroids, DataFrame):
            cdf = _centroids_frame(self.spark, centroids)
        else:
            cdf = centroids
        cdf.write.mode("overwrite").parquet(f"{self.base}/centroids")
        with cache_scope():
            ranked = _semantic_ranked(
                corpus, self.id_col, self.vec_col, self.centroids_df(),
                self.round_to, self.dist_round_to,
                expect_dim=self._dim(),
                guard_context=f"SemanticStore.bootstrap at {self.base}",
            )
            if observation is not None:
                _observe_cell_stats(ranked, observation)
            kept_ids = _semantic_annotate(
                ranked, self.id_col, self.threshold, self.round_to,
                self.salt_buckets, self.salt_min_cell,
            ).filter(F.col("is_kept") == 1).select(self.id_col)
            (
                ranked.select(
                    F.col("_id").alias(self.id_col), "_v", "_n", "cell"
                )
                .join(kept_ids, self.id_col)
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(self.path)
            )

    def _probed_store_side(self, ranked: DataFrame) -> DataFrame:
        """The kept table as the history-probe join's store side,
        STATICALLY pruned to the batch's occupied cells: the cell set
        is collected off the PINNED ranked frame (bounded — at most k
        ints, model-state class) and reaches the cell-partitioned
        kept scan as an ``isin`` partition filter. Spark's dynamic
        partition pruning does NOT cover this join — its insertion
        rule wants a selective predicate on the batch side, which a
        checkpointed/pinned frame never has: measured at sf0.1, a
        one-cell batch scanned all 8 kept partitions (2,000 rows)
        before this filter, 1 partition after (round 14,
        BASELINE.md). A backfill-scale batch occupying every cell
        degrades gracefully (the filter passes all partitions)."""
        probed = sorted(
            r["cell"] for r in ranked.select("cell").distinct().collect()
        )
        return (
            self.read()
            .select(
                F.col(self.id_col).alias("_hid"),
                F.col("_v").alias("_hv"),
                F.col("_n").alias("_hn"),
                "cell",
            )
            .filter(F.col("cell").isin(probed))
        )

    def ingest(
        self, batch: DataFrame, observation: "Observation | None" = None
    ) -> DataFrame:
        """Annotate ``batch`` against the store and append its kept
        rows. Returns the materialized ``(id, cell, centroid_sim,
        dup_of, dup_source, is_kept)`` — ``dup_source`` is 'history'
        or 'batch' (NULL when kept), the audit column telling a
        curation pipeline whether a drop was cross-day or intra-day.

        Plan shape: the batch (daily increment, small) is scanned and
        quantizer-assigned EXACTLY ONCE into the pinned ranked frame,
        which feeds both the history probe (broadcast BY ESTIMATE into
        the kept table's cell-partitioned scan while the batch is
        small — candidate mass is sum over probed cells of
        |batch cell| x |kept cell|, the store never self-joins,
        unprobed cell partitions prune STATICALLY via the batch's
        collected cell set (see the in-body note: DPP skips this
        join shape); a backfill-scale batch
        degrades to a shuffled cell join instead of a broadcast
        cliff — and with the store's ``salt_buckets`` armed, that
        shuffled regime's hot cells spread over S salted tasks,
        row-identical by test) and
        the batch-internal annotate stage. Cache hygiene mirrors
        every sibling ingest: pins in a cache_scope, annotation
        checkpointed before the append. ``observation`` arms
        :func:`_observe_cell_stats` over the batch's ranked frame —
        a skewed BATCH (all of today's vectors landing in one cell)
        multiplies the history probe's candidate mass by that cell's
        kept membership, and the batch-side occupancy is the early
        signal a pipeline can alert on without scanning the store."""
        from .caching import cache_scope

        self._require_bootstrapped()
        with cache_scope():
            ranked = _semantic_ranked(
                batch, self.id_col, self.vec_col, self.centroids_df(),
                self.round_to, self.dist_round_to,
                expect_dim=self._dim(),
                guard_context=f"SemanticStore.ingest at {self.base}",
            )
            if observation is not None:
                _observe_cell_stats(ranked, observation)
            s = self._probed_store_side(ranked)
            pden = F.col("_n") * F.col("_hn")
            sim = F.when(
                pden > 0, _dot(F.col("_v"), F.col("_hv")) / pden
            ).otherwise(F.lit(float("-inf")))
            if self.round_to is not None:
                sim = F.round(sim, self.round_to)
            # deliberately UNHINTED (the jaccard hot-set-join
            # doctrine): the pinned ranked frame gives the planner an
            # accurate size, so a daily-increment batch broadcasts
            # into the statically cell-pruned kept scan
            # (_probed_store_side), while a backfill-scale batch
            # degrades to a shuffled cell join instead of hitting the
            # 8 GB broadcast cliff a hard hint would force
            probe = ranked.select("_id", "_v", "_n", "cell")
            if self.salt_buckets > 1:
                # the store's salt knobs ride the HISTORY probe too
                # (probe shape: store = corpus side, salted per kept
                # row; batch = probe side, replicated): in the
                # backfill SMJ regime a hot cell's
                # |batch cell| x |kept cell| product is one join key
                # — one task, invisible to AQE's byte sizing — and
                # the groupBy below is on _id, so per-salt partials
                # combine without any semantic change. Hotness for
                # salt_min_cell is measured on the STORE side (the
                # _band_probe_pairs convention). Price when armed: a
                # small daily batch pays the pinned co-partitioning
                # shuffles instead of the free broadcast — pennies on
                # an increment, and the knob is opt-in for degenerate
                # corpora (default S=1 keeps the broadcast regime).
                from .dedup import _hot_key_set
                from .skew import salted_pair_sides

                a = s.withColumnRenamed("cell", "_cs")
                b = probe.withColumnRenamed("cell", "_cp")
                hot_a = hot_b = None
                if self.salt_min_cell is not None:
                    # the shared hot-key derivation (single-sourced
                    # with the band valves; > cap-1 == the
                    # >= salt_min_cell contract, returned pinned)
                    hot = _hot_key_set(
                        s, ["cell"], self.salt_min_cell - 1, None
                    )
                    hot_a = hot.select(F.col("cell").alias("_cs"))
                    hot_b = hot.select(F.col("cell").alias("_cp"))
                a, b, salt_cond = salted_pair_sides(
                    a, b, ["_cs"], ["_cp"], "_hid", self.salt_buckets,
                    hot_a=hot_a, hot_b=hot_b,
                )
                joined = b.join(
                    a, (F.col("_cp") == F.col("_cs")) & salt_cond
                )
            else:
                joined = probe.join(s, "cell")
            hist = (
                joined.filter(sim >= F.lit(self.threshold))
                .groupBy(F.col("_id").alias(self.id_col))
                .agg(
                    F.min(
                        F.struct((-sim).alias("ns"), F.col("_hid").alias("i"))
                    )["i"].alias("_hist_dup")
                )
            )
            ann_b = _semantic_annotate(
                ranked, self.id_col, self.threshold, self.round_to,
                self.salt_buckets, self.salt_min_cell,
            ).withColumnRenamed("dup_of", "_batch_dup")
            dup_of = F.coalesce(F.col("_hist_dup"), F.col("_batch_dup"))
            res = (
                ann_b.join(hist, self.id_col, "left")
                .select(
                    self.id_col,
                    "cell",
                    "centroid_sim",
                    dup_of.alias("dup_of"),
                    F.when(F.col("_hist_dup").isNotNull(), F.lit("history"))
                    .when(F.col("_batch_dup").isNotNull(), F.lit("batch"))
                    .alias("dup_source"),
                    dup_of.isNull().cast("int").alias("is_kept"),
                )
                .localCheckpoint(eager=True)
            )
            (
                ranked.select(
                    F.col("_id").alias(self.id_col), "_v", "_n", "cell"
                )
                .join(
                    res.filter(F.col("is_kept") == 1).select(self.id_col),
                    self.id_col,
                )
                .write.mode("append")
                .partitionBy("cell")
                .parquet(self.path)
            )
        return res
