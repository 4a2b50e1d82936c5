"""Column expressions reproducing the reference's scalar transforms.

Each helper cites the reference behavior it reproduces (file:line
relative to /root/reference). All are pure Column expressions —
Catalyst folds them into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import (
    NO_AUTHOR_EMAIL,
    NO_AUTHOR_NAME,
    NO_COMMIT_SUMMARY,
    NO_REMOTE_URL,
    ZERO_OID,
)


def _sentinel_if_blank(col: Column, sentinel: str) -> Column:
    """NULL or empty string -> sentinel (reference substitutes sentinels
    instead of NULL for missing author fields, repository.rs:163-166)."""
    trimmed = F.trim(col)
    return F.when(col.isNull() | (trimmed == ""), F.lit(sentinel)).otherwise(col)


def with_author_sentinels(name: Column, email: Column) -> tuple[Column, Column]:
    """``"(no author name)"`` / ``"(no author email)"`` fallbacks
    (repository.rs:163-166)."""
    return (
        _sentinel_if_blank(name, NO_AUTHOR_NAME),
        _sentinel_if_blank(email, NO_AUTHOR_EMAIL),
    )


def commit_summary(message: Column) -> Column:
    """Summary-only message: first line, trimmed, with the
    ``"(no commit summary)"`` fallback.

    Matches git2's ``commit.summary()`` semantics used at
    repository.rs:179: the summary is the first paragraph line of the
    message with trailing whitespace trimmed; empty -> sentinel.
    """
    first_line = F.trim(F.split_part(message, F.lit("\n"), F.lit(1)))
    return F.when(
        message.isNull() | (first_line == ""), F.lit(NO_COMMIT_SUMMARY)
    ).otherwise(first_line)


def zero_oid_parent(parent_hash: Column) -> Column:
    """Root commits (no parent) get the 40-zero OID sentinel
    (repository.rs:175)."""
    return F.when(
        parent_hash.isNull() | (F.trim(parent_hash) == ""), F.lit(ZERO_OID)
    ).otherwise(F.trim(parent_hash))


def normalize_remote_url(url: Column) -> Column:
    """Origin remote URL normalization (repository.rs:187-193):
    missing -> ``"(no remote url)"``; literal rewrite
    ``git@github.com:`` -> ``https://github.com/``."""
    filled = F.when(url.isNull() | (F.trim(url) == ""), F.lit(NO_REMOTE_URL)).otherwise(
        F.trim(url)
    )
    return F.regexp_replace(filled, r"^git@github\.com:", "https://github.com/")
