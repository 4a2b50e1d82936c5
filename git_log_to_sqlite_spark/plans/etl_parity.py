"""Driver-gated ETL-output parity query.

The reference's whole purpose is the ETL dataflow (SURVEY.md §2.1
R1–R30); until now that path was pytest-verified only. This module
gives it a driver hash row: the gate query runs the REAL pipeline —
git-log text parse → sentinels → merge exclusion → author-map
broadcast join → repositories dimension → logs + changed_files
normalization — over a deterministic embedded fixture, and the oracle
is the hand-derived expected table as literal SQL ``VALUES`` (DuckDB
needs no filesystem access).

The fixture covers every extractor edge case the reference exhibits:

* root commit → zero-OID parent sentinel   (repository.rs:175)
* merge commit (2 parents) excluded         (repository.rs:112)
* missing author name/email sentinels       (repository.rs:163-166)
* empty summary sentinel                    (repository.rs:179)
* author-map email override                 (repository.rs:167-171)
* git@github.com: → https:// URL rewrite    (repository.rs:187-193)
* "(no remote url)" fallback                (repository.rs:192)
* rename numstat (brace + plain form) keeps the NEW path
                                            (repository.rs:149-152)
* binary numstat ("-\t-") counts as 0/0     (repository.rs:161 analog)
* ignored_repositories filtered out          (analyzer.rs:120-126)
* deterministic repository ids (name asc) — the fixed-by-design
  replacement for AUTOINCREMENT             (analyzer.rs:152)
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Config
from ..etl.gitlog import parse_git_log
from ..etl.pipeline import run_pipeline
from ..session import local_frame
from .registry import register

X01, X02 = "\x01", "\x02"


def _commit(h, parents, an, ae, at, s, numstat=()):
    head = f"{X01}{h}{X02}{parents}{X02}{an}{X02}{ae}{X02}{at}{X02}{s}"
    return "\n".join([head, ""] + [f"{i}\t{d}\t{p}" for (i, d, p) in numstat])


def _h(i: int) -> str:
    return format(i, "x").rjust(2, "0") * 20


_ZERO = "0" * 40

_ALPHA_LOG = "\n".join(
    [
        _commit(_h(1), "", "Alice", "alice@example.com", 1700000000,
                "initial import", [(10, 0, "src/main.rs"), (3, 0, "README.md")]),
        _commit(_h(2), _h(1), "", "bob@example.com", 1700000100,
                "fix bug", [(1, 1, "src/main.rs")]),
        _commit(_h(3), _h(2), "Bob", "", 1700000200,
                "tweak", [(2, 0, "docs/guide.md")]),
        _commit(_h(4), _h(3), "Alice", "alice@example.com", 1700000300,
                "", [(1, 0, "src/lib.rs")]),
        # merge commit: excluded by the defining predicate
        _commit(_h(5), f"{_h(4)} {_h(2)}", "Alice", "alice@example.com",
                1700000400, "Merge branch 'feature'", [(7, 7, "src/main.rs")]),
        _commit(_h(6), _h(4), "Carol", "carol@example.com", 1700000500,
                "rename module", [(0, 0, "src/{old.rs => new.rs}")]),
        _commit(_h(7), _h(6), "Carol", "carol@example.com", 1700000600,
                "move + logo",
                [(4, 1, "lib.rs => src2/lib.rs"), ("-", "-", "assets/logo.png")]),
        _commit(_h(8), _h(7), "Dave", "dave@example.com", 1700000700,
                "empty commit"),
    ]
)

_BETA_LOG = "\n".join(
    [
        _commit(_h(10), "", "Eve", "eve@example.com", 1700001000,
                "beta initial", [(100, 0, "beta.py")]),
        _commit(_h(11), _h(10), "Eve", "eve@example.com", 1700001100,
                "beta update", [(2, 2, "beta.py"), (1, 0, "docs/notes.txt")]),
    ]
)

_IGNORED_LOG = _commit(_h(12), "", "Zed", "zed@example.com", 1700002000,
                       "should be ignored", [(1, 0, "x.txt")])

_REPOS_META = [
    ("alpha", "git@github.com:owner/alpha.git"),
    ("beta", None),
    ("ignored-repo", "https://example.com/ignored.git"),
]

_CONFIG = Config(
    ignored_repositories=["ignored-repo"],
    author_map={"alice@example.com": "Alice Canonical"},
)

# Hand-derived expected output (the golden data). Each row:
# (commit_hash, parent_hash, author_name, author_email, message,
#  commit_epoch, insertions, deletions, repository_id, repo_name,
#  repo_url, n_files)
_EXPECTED = [
    (_h(1), _ZERO, "Alice Canonical", "alice@example.com", "initial import",
     1700000000, 13, 0, 1, "alpha", "https://github.com/owner/alpha.git", 2),
    (_h(2), _h(1), "(no author name)", "bob@example.com", "fix bug",
     1700000100, 1, 1, 1, "alpha", "https://github.com/owner/alpha.git", 1),
    (_h(3), _h(2), "Bob", "(no author email)", "tweak",
     1700000200, 2, 0, 1, "alpha", "https://github.com/owner/alpha.git", 1),
    (_h(4), _h(3), "Alice Canonical", "alice@example.com", "(no commit summary)",
     1700000300, 1, 0, 1, "alpha", "https://github.com/owner/alpha.git", 1),
    (_h(6), _h(4), "Carol", "carol@example.com", "rename module",
     1700000500, 0, 0, 1, "alpha", "https://github.com/owner/alpha.git", 1),
    (_h(7), _h(6), "Carol", "carol@example.com", "move + logo",
     1700000600, 4, 1, 1, "alpha", "https://github.com/owner/alpha.git", 2),
    (_h(8), _h(7), "Dave", "dave@example.com", "empty commit",
     1700000700, 0, 0, 1, "alpha", "https://github.com/owner/alpha.git", 0),
    (_h(10), _ZERO, "Eve", "eve@example.com", "beta initial",
     1700001000, 100, 0, 2, "beta", "(no remote url)", 1),
    (_h(11), _h(10), "Eve", "eve@example.com", "beta update",
     1700001100, 3, 2, 2, "beta", "(no remote url)", 2),
]

_ORACLE_VALUES = ",\n      ".join(
    "('{}', '{}', '{}', '{}', '{}', {}, {}, {}, {}, '{}', '{}', {})".format(*row)
    for row in _EXPECTED
)

_ORACLE_SQL = f"""
    SELECT commit_hash, parent_hash, author_name, author_email, message,
           CAST(commit_epoch AS BIGINT) AS commit_epoch,
           CAST(insertions AS BIGINT) AS insertions,
           CAST(deletions AS BIGINT) AS deletions,
           CAST(repository_id AS BIGINT) AS repository_id,
           repo_name, repo_url,
           CAST(n_files AS BIGINT) AS n_files
    FROM (VALUES
      {_ORACLE_VALUES}
    ) AS t(commit_hash, parent_hash, author_name, author_email, message,
           commit_epoch, insertions, deletions, repository_id, repo_name,
           repo_url, n_files)
"""


def _write_fixture_dir() -> str:
    """Materialize the fixture logs at a content-addressed stable path:
    repeated gate/bench/test invocations in one session (or machine)
    reuse the same directory instead of accumulating mkdtemp leftovers,
    and a content change gets a fresh path by construction."""
    import hashlib

    payload = "\x00".join((_ALPHA_LOG, _BETA_LOG, _IGNORED_LOG)).encode()
    digest = hashlib.md5(payload).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"etl_parity_{digest}")
    os.makedirs(d, exist_ok=True)
    for name, text in (
        ("alpha", _ALPHA_LOG),
        ("beta", _BETA_LOG),
        ("ignored-repo", _IGNORED_LOG),
    ):
        path = os.path.join(d, f"{name}.log")
        # Atomic create-or-verify: the digest names the *intended*
        # content, not what's on disk — a file truncated by a crashed
        # run (or pre-created by another tenant of the shared tempdir)
        # must not be trusted just because the path exists. Write to a
        # unique temp file and os.replace() into place so readers never
        # observe a partial file; if the path exists, verify its bytes.
        if os.path.exists(path):
            with open(path, "r", encoding="utf-8") as fh:
                if fh.read() == text:
                    continue
        # The temp file must live OUTSIDE the fixture dir: the parity
        # queries spark.read.text the whole directory, so a leftover
        # .tmp from a crashed run would parse as a phantom repository.
        # gettempdir() is the fixture dir's parent — same filesystem,
        # os.replace stays atomic.
        fd, tmp = tempfile.mkstemp(
            dir=tempfile.gettempdir(), suffix=".etl_parity_tmp"
        )
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                fh.write(text)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return d


@register(
    "etl_logs_parity",
    oracle=_ORACLE_SQL,
    doc="Reference-parity ETL at the gate: embedded git-log fixture -> "
    "parse -> sentinels/merge-filter/author-map/URL-rewrite -> "
    "logs + repositories + changed_files, denormalized back into one "
    "row per commit and hash-compared to the hand-derived golden "
    "VALUES table. The one gate row where the oracle is not DuckDB "
    "recomputing the query but an independently derived expectation.",
)
def etl_logs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs_dir = _write_fixture_dir()
    commits = parse_git_log(spark, logs_dir)
    repos_meta = local_frame(spark, _REPOS_META, "name string, url string")
    res = run_pipeline(spark, commits, repos_meta, config=_CONFIG)

    n_files = (
        res.changed_files.groupBy("commit_hash")
        .agg(F.count("*").alias("n_files"))
    )
    repos = res.repositories.select(
        F.col("id").alias("repository_id"),
        F.col("name").alias("repo_name"),
        F.col("url").alias("repo_url"),
    )
    return (
        res.logs.join(F.broadcast(repos), "repository_id")
        .join(n_files, "commit_hash", "left")
        .select(
            "commit_hash",
            "parent_hash",
            "author_name",
            "author_email",
            "message",
            "commit_epoch",
            "insertions",
            "deletions",
            "repository_id",
            "repo_name",
            "repo_url",
            F.coalesce(F.col("n_files"), F.lit(0)).cast("long").alias("n_files"),
        )
    )


# --- multi-repo dimension parity (round 6) -----------------------------
#
# Exercises the two load-stage paths etl_logs_parity does not reach:
#
# * duplicate-basename repositories collapsing to ONE keyed row with
#   the deterministic min(url) survivor — the fixed-by-design
#   replacement for the reference's `INSERT OR IGNORE` on a non-unique
#   name column (analyzer.rs:300-303), which duplicates rows on re-run
#   and keeps an arbitrary url;
# * the R25 skipped-directories report: scanned paths whose basename
#   is not an analyzed repo name, via broadcast left anti-join
#   (analyzer.rs:255-263), including a trailing-slash path.

_MULTI_REPOS_META = [
    # three discoveries of the same repo basename: min(url) survivor is
    # the git@ form ('g' < 'h'), then URL-normalized.
    ("alpha", "git@github.com:owner/alpha.git"),
    ("alpha", "https://gitlab.com/mirror/alpha.git"),
    ("alpha", None),
    ("beta", None),  # no remote anywhere -> "(no remote url)"
    ("ignored-repo", "https://example.com/ignored.git"),  # config-ignored
]

_SCANNED_DIRS = [
    "/scan/alpha",
    "/scan/beta/",  # trailing slash: basename regex must still match
    "/scan/.cache",
    "/scan/ignored-repo",  # ignored repos are NOT analyzed -> skipped
    "/scan/vendor",
]

_REPOS_SKIPPED_EXPECTED = [
    ("repository", 1, "alpha", "https://github.com/owner/alpha.git"),
    ("repository", 2, "beta", "(no remote url)"),
    ("skipped", None, "/scan/.cache", None),
    ("skipped", None, "/scan/ignored-repo", None),
    ("skipped", None, "/scan/vendor", None),
]

_REPOS_SKIPPED_VALUES = ",\n      ".join(
    "('{}', {}, '{}', {})".format(
        kind,
        "NULL" if rid is None else rid,
        item,
        "NULL" if url is None else f"'{url}'",
    )
    for kind, rid, item, url in _REPOS_SKIPPED_EXPECTED
)

_REPOS_SKIPPED_ORACLE = f"""
    SELECT kind, CAST(id AS BIGINT) AS id, item, CAST(url AS VARCHAR) AS url
    FROM (VALUES
      {_REPOS_SKIPPED_VALUES}
    ) AS t(kind, id, item, url)
"""


@register(
    "etl_repos_skipped_parity",
    oracle=_REPOS_SKIPPED_ORACLE,
    doc="Multi-repo load-stage parity at the gate: duplicate-basename "
    "repository discoveries collapse to one keyed dimension row with "
    "the deterministic min(url) survivor (the fix for the reference's "
    "INSERT OR IGNORE duplication, analyzer.rs:300-303), ids assigned "
    "by name order, URLs normalized; plus the R25 skipped-directories "
    "broadcast anti-join report (analyzer.rs:255-263). Both outputs "
    "unioned into one frame and hash-compared to the hand-derived "
    "golden VALUES table.",
)
def etl_repos_skipped_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs_dir = _write_fixture_dir()
    commits = parse_git_log(spark, logs_dir)
    # Arrow local path for both meta frames (round 14): each is a
    # broadcast build side executed per gate run
    repos_meta = local_frame(spark, _MULTI_REPOS_META, "name string, url string")
    scanned = local_frame(spark, [(p,) for p in _SCANNED_DIRS], "path string")
    res = run_pipeline(
        spark, commits, repos_meta, scanned_dirs=scanned, config=_CONFIG
    )
    repos = res.repositories.select(
        F.lit("repository").alias("kind"),
        F.col("id").cast("long").alias("id"),
        F.col("name").alias("item"),
        F.col("url"),
    )
    skipped = res.skipped.select(
        F.lit("skipped").alias("kind"),
        F.lit(None).cast("long").alias("id"),
        F.col("path").alias("item"),
        F.lit(None).cast("string").alias("url"),
    )
    return repos.unionByName(skipped)
