"""Regex database/table router.

Reference semantics (``MatchStrategy``,
/root/reference/src/mysql/mod.rs:21-90): the user supplies db patterns and
table patterns with ``*`` wildcards; the cross-product of patterns is
matched against ``"database.table"``; a bare ``*`` on both sides
short-circuits to match-all.

Spark-first restatement: compile the pattern list to ONE anchored regex and
apply a stateless ``filter`` with ``rlike`` — a narrow transformation, no
shuffle, fully pushdown-friendly. (The reference's sticky ``skip_event``
state, mod.rs:78-89, is unnecessary here: every CDC row carries its own
database/table, so a stateless filter gives identical routing.)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compile_patterns(dbs: list[str], tables: list[str]) -> str:
    """Compile the reference's wildcard patterns into one anchored regex.

    ``*`` is the only metacharacter (glob-style, as in the reference's
    ``new()`` which rewrites ``*`` → ``.*`` before regex-compiling,
    /root/reference/src/mysql/mod.rs:30-56). Everything else is escaped.
    """
    if ("*" in dbs or not dbs) and ("*" in tables or not tables):
        return ".*"

    def glob_to_re(p: str) -> str:
        return ".*".join(re.escape(part) for part in p.split("*"))

    dbs = dbs or ["*"]
    tables = tables or ["*"]
    alts = [
        f"{glob_to_re(d)}\\.{glob_to_re(t)}" for d in dbs for t in tables
    ]
    return "^(" + "|".join(alts) + ")$"


def qualified_name(db_col: str = "database", table_col: str = "table") -> Column:
    return F.concat(F.col(db_col), F.lit("."), F.col(table_col))


def route(
    cdc: DataFrame,
    dbs: list[str],
    tables: list[str],
    db_col: str = "database",
    table_col: str = "table",
) -> DataFrame:
    """Keep only rows whose ``db.table`` matches the configured patterns."""
    pattern = compile_patterns(dbs, tables)
    if pattern == ".*":
        return cdc
    return cdc.filter(qualified_name(db_col, table_col).rlike(pattern))
