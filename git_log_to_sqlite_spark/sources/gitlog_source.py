"""``gitlog`` Python Data Source: commits straight from git-log text.

The DSv2-style connector the survey flags as the ergonomic path
(SURVEY.md section 4.2): ``spark.read.format("gitlog").load(dir)``
yields the same rows as ``etl.parse_git_log`` without a staging step.

Execution model: ``partitions()`` returns one ``InputPartition`` per
log file (the repository is the parallel unit, matching the
reference's one-task-per-repo model at analyzer.rs:217-235), so a
many-repo corpus fans out across the cluster and each file parses
exactly once, driver-free.

When to use which parser:
  * ``etl.parse_git_log`` — JVM-side higher-order-function parse,
    whole-stage codegen, zero Python: the 100 TB hot path.
  * this connector — per-partition Python parse via the Arrow batch
    channel: connector ergonomics, pushdown-free; fine for ingest-once
    workloads, not for repeated analytical scans.

Reference semantics reproduced (file:line in /root/reference) — same
list as etl/gitlog.py: merge exclusion repository.rs:112, zero-OID
root sentinel repository.rs:175, author sentinels repository.rs:163-166,
summary-only message repository.rs:179, epoch seconds repository.rs:178,
numstat sums repository.rs:154-156, rename new-path repository.rs:149-152,
binary "-" counts as 0 repository.rs:161.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

RECORD_SEP = "\x01"
FIELD_SEP = "\x02"
ZERO_OID = "0" * 40

_NUMSTAT_RE = re.compile(r"^(\d+|-)\t(\d+|-)\t(.+)$")
_HASH_RE = re.compile(r"^[0-9a-f]{7,40}$")
_BRACE_RE = re.compile(r"\{[^{}]*? => ([^{}]*?)\}")
_ARROW_RE = re.compile(r" => (.*)$")

SCHEMA_DDL = (
    "commit_hash string, parent_hash string, author_name string,"
    " author_email string, message string, commit_epoch long,"
    " insertions long, deletions long, repository string,"
    " changed_files array<string>"
)


def _rename_new_path(path: str) -> str:
    debraced = _BRACE_RE.sub(lambda m: m.group(1), path)
    collapsed = re.sub(r"//+", "/", debraced)
    m = _ARROW_RE.search(collapsed)
    return m.group(1) if m else collapsed


def _count(raw: str) -> int:
    return 0 if raw == "-" else int(raw)


def parse_blocks(text: str, repository: str) -> Iterator[tuple]:
    """One tuple per non-merge commit block. Pure function — shared by
    every partition reader and directly unit-testable."""
    for block in text.replace("\r\n", "\n").split(RECORD_SEP):
        if not block.strip():
            continue
        header, _, body = block.partition("\n")
        fields = header.split(FIELD_SEP)
        if len(fields) < 6:
            continue  # malformed block -> dropped (repository.rs:109-111)
        commit_hash = fields[0].strip()
        if not _HASH_RE.match(commit_hash):
            continue
        parents = [p for p in fields[1].strip().split(" ") if p]
        if len(parents) >= 2:  # merge exclusion (repository.rs:112)
            continue
        try:
            epoch = int(fields[4])
        except ValueError:
            continue
        ins = dels = 0
        files: list[str] = []
        for line in body.split("\n"):
            m = _NUMSTAT_RE.match(line)
            if not m:
                continue
            ins += _count(m.group(1))
            dels += _count(m.group(2))
            files.append(_rename_new_path(m.group(3)))
        yield (
            commit_hash,
            parents[0] if parents else ZERO_OID,
            fields[2].strip() or "(no author name)",
            fields[3].strip() or "(no author email)",
            fields[5].splitlines()[0].strip() if fields[5].strip() else "(no commit summary)",
            epoch,
            ins,
            dels,
            repository,
            files,
        )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GitLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gitlog source requires a path: .load(<dir|file|glob>)")

    def partitions(self):
        p = self.path
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "**", "*"), recursive=True))
            files = [f for f in files if os.path.isfile(f)]
        else:
            files = sorted(f for f in glob.glob(p) if os.path.isfile(f))
        if not files:
            raise FileNotFoundError(f"gitlog source matched no files under {p!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        repository = re.sub(
            r"\.(log|txt)$", "", os.path.basename(partition.path)
        )
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            yield from parse_blocks(fh.read(), repository)


class GitLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gitlog"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> GitLogReader:
        return GitLogReader(self.options)


def register_gitlog_source(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(GitLogDataSource)
