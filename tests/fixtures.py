"""Deterministic git-log text fixtures (FIXTURES.md A1-A3).

Covers every extractor edge case the reference exhibits: root commit
(zero-OID parent sentinel), missing author name/email sentinels, empty
summary sentinel, rename numstat (keep new path), binary numstat
("-\t-"), multi-file commits, merge commits (excluded), author-map
override, URL rewrite, ignored repo, and a non-git directory that must
land in skipped_directories.
"""

from __future__ import annotations

from pathlib import Path

X01, X02 = "\x01", "\x02"


def _commit(h, parents, an, ae, at, s, numstat=()):
    head = f"{X01}{h}{X02}{parents}{X02}{an}{X02}{ae}{X02}{at}{X02}{s}"
    lines = [head, ""] + [f"{i}\t{d}\t{p}" for (i, d, p) in numstat]
    return "\n".join(lines)


H = {i: format(i, "x") * 8 for i in range(1, 16)}  # 40-char fake hashes... 8*len(hex)
# build proper 40-char hashes
H = {i: (format(i, "x").rjust(2, "0") * 20) for i in range(1, 16)}

ALPHA_LOG = "\n".join(
    [
        # root commit: no parent -> zero-OID sentinel expected
        _commit(H[1], "", "Alice", "alice@example.com", 1700000000, "initial import",
                [(10, 0, "src/main.rs"), (3, 0, "README.md")]),
        # normal commit, author in author_map (email match -> name override)
        _commit(H[2], H[1], "A. Liddell", "alice@example.com", 1700000100, "add parser",
                [(5, 2, "src/parser.rs")]),
        # missing author name -> sentinel
        _commit(H[3], H[2], "", "bob@example.com", 1700000200, "fix bug",
                [(1, 1, "src/main.rs")]),
        # missing email -> sentinel
        _commit(H[4], H[3], "Bob", "", 1700000300, "tweak",
                [(2, 0, "docs/guide.md")]),
        # empty summary -> sentinel
        _commit(H[5], H[4], "Alice", "alice@example.com", 1700000400, "",
                [(1, 0, "src/lib.rs")]),
        # merge commit (2 parents) -> MUST be excluded
        _commit(H[6], f"{H[5]} {H[2]}", "Alice", "alice@example.com", 1700000500,
                "Merge branch 'feature'", [(7, 7, "src/main.rs")]),
        # rename, brace form -> keep new path
        _commit(H[7], H[5], "Carol", "carol@example.com", 1700000600, "rename module",
                [(0, 0, "src/{old_name.rs => new_name.rs}")]),
        # rename, plain form + binary file
        _commit(H[8], H[7], "Carol", "carol@example.com", 1700000700, "move + logo",
                [(4, 1, "lib.rs => src2/lib.rs"), ("-", "-", "assets/logo.png")]),
        # commit with no files (empty tree diff)
        _commit(H[9], H[8], "Dave", "dave@example.com", 1700000800, "empty commit"),
    ]
)

BETA_LOG = "\n".join(
    [
        _commit(H[10], "", "Eve", "eve@example.com", 1700001000, "beta initial",
                [(100, 0, "beta.py")]),
        _commit(H[11], H[10], "Eve", "eve@example.com", 1700001100, "beta更新 unicode",
                [(2, 2, "beta.py"), (1, 0, "βeta/ünicode.txt")]),
    ]
)

IGNORED_LOG = _commit(H[12], "", "Zed", "zed@example.com", 1700002000, "should be ignored",
                      [(1, 0, "x.txt")])

REPOS_META = [
    ("alpha", "git@github.com:owner/alpha.git"),  # must rewrite to https
    ("beta", None),  # -> "(no remote url)"
    ("ignored-repo", "https://example.com/ignored.git"),
]

AUTHOR_MAP = {"alice@example.com": "Alice Canonical"}
IGNORED_REPOSITORIES = ["ignored-repo"]

SCANNED_DIRS = ["/tmp/scan/alpha", "/tmp/scan/beta", "/tmp/scan/not-a-repo",
                "/tmp/scan/ignored-repo"]


def write_fixture_logs(tmpdir: Path) -> Path:
    logs = tmpdir / "gitlogs"
    logs.mkdir(parents=True, exist_ok=True)
    (logs / "alpha.log").write_text(ALPHA_LOG, encoding="utf-8")
    (logs / "beta.log").write_text(BETA_LOG, encoding="utf-8")
    (logs / "ignored-repo.log").write_text(IGNORED_LOG, encoding="utf-8")
    return logs
