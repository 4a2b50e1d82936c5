"""git-log text -> commits DataFrame, entirely with JVM-side expressions.

Design (SURVEY.md section 3.2): read one text file per repository with
``wholetext=True`` (one row per file — order-safe by construction, no
cross-partition line-ordering problem), split on the \\x01 record
separator into self-contained commit blocks, ``explode``, then parse
each block with higher-order array functions (``split`` / ``filter`` /
``transform`` / ``aggregate``).  No Python UDFs — the whole parse stays
inside whole-stage codegen.

Scale note: the parallel unit is the repository (file), matching the
reference's one-tokio-task-per-repo model (analyzer.rs:217-235) but
scheduled by Spark.  At 100 TB the corpus is many repos, so
file-granular parallelism saturates the cluster; a single pathological
multi-GB log can be pre-split at \\x01 boundaries upstream if needed.

Reference semantics reproduced (file:line in /root/reference):
  * merge exclusion: parent_count < 2            repository.rs:112
  * first-parent + zero-OID root sentinel        repository.rs:119-127,175
  * author name/email sentinels                  repository.rs:163-166
  * summary-only message + sentinel              repository.rs:179
  * epoch-seconds commit time                    repository.rs:178
  * per-commit insertion/deletion sums           repository.rs:154-156
  * rename => keep NEW path                      repository.rs:149-152
  * binary numstat ("-") counts as 0/0           repository.rs:161 (stats
    failure -> (0,0)); file path still recorded
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import commit_summary, with_author_sentinels, zero_oid_parent

# One numstat line: "<ins>\t<del>\t<path>" where ins/del are digits or
# "-" for binary files.
_NUMSTAT_RE = r"^(\d+|-)\t(\d+|-)\t(.+)$"

RECORD_SEP = "\x01"
FIELD_SEP = "\x02"


def _numstat_lines(block: Column) -> Column:
    """All numstat lines of a commit block (skips the header line and
    blank separator lines)."""
    lines = F.split(block, "\n")
    body = F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))
    return F.filter(body, lambda line: line.rlike(_NUMSTAT_RE))


def _count_from(line: Column, group: int) -> Column:
    """Numstat count field -> long; binary-file '-' contributes 0."""
    raw = F.regexp_extract(line, _NUMSTAT_RE, group)
    return F.when(raw == "-", F.lit(0)).otherwise(raw.cast("long"))


def _rename_new_path(path: Column) -> Column:
    """Keep the NEW side of a rename, matching the reference's use of
    the delta's new_file path (repository.rs:149-152).

    numstat rename spellings handled:
      * brace form   ``dir/{old.txt => new.txt}/x`` -> ``dir/new.txt/x``
        (empty sides collapse the doubled slash)
      * plain form   ``old.txt => new.txt``         -> ``new.txt``
    """
    debraced = F.regexp_replace(path, r"\{[^{}]*? => ([^{}]*?)\}", r"$1")
    collapsed = F.regexp_replace(debraced, r"//+", "/")
    return F.when(
        collapsed.rlike(r" => "), F.regexp_extract(collapsed, r" => (.*)$", 1)
    ).otherwise(collapsed)


def parse_git_log(
    spark: SparkSession,
    path: str,
    repository_from_filename: bool = True,
) -> DataFrame:
    """Parse ``git log`` text files into the denormalized commits DataFrame.

    ``path`` may be a file, directory, or glob of per-repository log
    files. Returns schemas.COMMITS columns (changed_files kept as an
    array; explode happens in the load stage, like the reference's
    normalization at analyzer.rs:337-343).
    """
    raw = spark.read.text(path, wholetext=True).withColumn(
        "_file", F.input_file_name()
    )
    return parse_raw_logs(raw, repository_from_filename)


def read_gitlog_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Incremental commit ingestion (SURVEY.md section 1.4 / section 7
    stretch): the file-stream source picks up newly landed per-repo log
    files and the SAME JVM-side parse produces commit rows — the batch
    pipeline's transformations apply unchanged downstream. The unit of
    incrementality is the log file (re-dumping a repo re-emits its
    commits; pair with dropDuplicates on commit_hash or an idempotent
    MERGE sink for exactly-once tables)."""
    raw = (
        spark.readStream.option("wholetext", "true")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
        .withColumn("_file", F.input_file_name())
    )
    return parse_raw_logs(raw, repository_from_filename=True)


def parse_raw_logs(raw: DataFrame, repository_from_filename: bool = True) -> DataFrame:
    """Shared batch/stream parse: (value, _file) rows -> commit rows.
    All transformations are stateless Column expressions, so the same
    plan serves ``spark.read`` and ``spark.readStream`` inputs."""
    repository = (
        F.regexp_extract(F.col("_file"), r"([^/]+?)(\.(log|txt))?$", 1)
        if repository_from_filename
        else F.lit("")
    )

    blocks = (
        raw.select(
            repository.alias("repository"),
            F.explode(F.split(F.col("value"), RECORD_SEP)).alias("block"),
        )
        .withColumn("block", F.regexp_replace(F.col("block"), "\r\n", "\n"))
        .filter(F.trim(F.col("block")) != "")
    )

    header = F.split(F.split_part(F.col("block"), F.lit("\n"), F.lit(1)), FIELD_SEP)
    parents = F.filter(
        F.split(F.trim(header.getItem(1)), " "), lambda p: p != F.lit("")
    )
    numstat = _numstat_lines(F.col("block"))

    parsed = blocks.select(
        "repository",
        F.trim(header.getItem(0)).alias("commit_hash"),
        parents.alias("parents"),
        header.getItem(2).alias("raw_author_name"),
        header.getItem(3).alias("raw_author_email"),
        header.getItem(4).cast("long").alias("commit_epoch"),
        header.getItem(5).alias("raw_message"),
        numstat.alias("numstat"),
    )

    # Error-tolerant filters (R8/R10 equivalents): malformed blocks ->
    # dropped, like the reference's filter_map(ok) at repository.rs:109-111.
    parsed = parsed.filter(
        F.col("commit_hash").rlike(r"^[0-9a-f]{7,40}$")
        & F.col("commit_epoch").isNotNull()
    )

    # Merge exclusion — the tool's defining predicate (repository.rs:112).
    parsed = parsed.filter(F.size("parents") < 2)

    author_name, author_email = with_author_sentinels(
        F.col("raw_author_name"), F.col("raw_author_email")
    )
    insertions = F.aggregate(
        F.col("numstat"),
        F.lit(0).cast("long"),
        lambda acc, line: acc + _count_from(line, 1),
    )
    deletions = F.aggregate(
        F.col("numstat"),
        F.lit(0).cast("long"),
        lambda acc, line: acc + _count_from(line, 2),
    )
    changed_files = F.transform(
        F.col("numstat"),
        lambda line: _rename_new_path(F.regexp_extract(line, _NUMSTAT_RE, 3)),
    )

    return parsed.select(
        F.col("commit_hash"),
        zero_oid_parent(F.get(F.col("parents"), 0)).alias("parent_hash"),
        author_name.alias("author_name"),
        author_email.alias("author_email"),
        commit_summary(F.col("raw_message")).alias("message"),
        F.col("commit_epoch"),
        F.to_timestamp(F.from_unixtime(F.col("commit_epoch"))).alias("commit_ts"),
        insertions.alias("insertions"),
        deletions.alias("deletions"),
        F.col("repository"),
        changed_files.alias("changed_files"),
    )
