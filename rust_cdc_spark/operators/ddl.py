"""DDL event parsing and schema evolution.

Reference surface (Q3, SURVEY.md §2.6): sqlparser-driven recognition of
``ALTER TABLE ADD/DROP/RENAME COLUMN``, ``RENAME TABLE``, ``DROP TABLE``,
``TRUNCATE`` from QueryEvents
(/root/reference/src/delta/mod.rs:550-598), with comment stripping
(``replace_note``, /root/reference/src/mysql/event/mod.rs:18-23). The
reference stops at parsing (apply is ``todo!()`` at delta/mod.rs:597);
here parse AND apply are implemented: the parsed op evolves the source's
schema registry (``StructType``) and, through it, the sink table —
additive changes flow through ``mergeSchema``-style struct widening, and
the map-fallback envelope means in-flight row decoding never breaks.

Parsing uses anchored regexes over the (public, standard) MySQL DDL
grammar subset — deliberately no SQL-parser dependency: the recognized
surface is exactly the reference's five ops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

COMMENT_RE = re.compile(r"/\*.*?\*/\s*", re.DOTALL)


def strip_comments(sql: str) -> str:
    """QueryEvent comment strip (reference ``replace_note``)."""
    return COMMENT_RE.sub("", sql).strip()


@dataclass(frozen=True)
class DdlOp:
    kind: str  # add_column | drop_column | rename_column | rename_table | drop_table | truncate
    table: str
    column: str | None = None
    new_name: str | None = None
    col_type: str | None = None


_IDENT = r"`?(?P<{}>[A-Za-z_][A-Za-z0-9_$]*)`?"
_TBL = _IDENT.format("table")

_PATTERNS = [
    (
        "add_column",
        re.compile(
            rf"ALTER\s+TABLE\s+{_TBL}\s+ADD\s+(?:COLUMN\s+)?{_IDENT.format('column')}\s+(?P<ctype>\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)",
            re.IGNORECASE,
        ),
    ),
    (
        "drop_column",
        re.compile(
            rf"ALTER\s+TABLE\s+{_TBL}\s+DROP\s+(?:COLUMN\s+)?{_IDENT.format('column')}",
            re.IGNORECASE,
        ),
    ),
    (
        "rename_column",
        re.compile(
            rf"ALTER\s+TABLE\s+{_TBL}\s+RENAME\s+(?:COLUMN\s+)?{_IDENT.format('column')}\s+TO\s+{_IDENT.format('new')}",
            re.IGNORECASE,
        ),
    ),
    (
        "rename_table",
        re.compile(
            r"(?:RENAME\s+TABLE\s+" + _TBL + r"\s+TO|ALTER\s+TABLE\s+"
            + _IDENT.format("table2")
            + r"\s+RENAME\s+(?:TO\s+)?)\s*" + _IDENT.format("new"),
            re.IGNORECASE,
        ),
    ),
    (
        "drop_table",
        re.compile(rf"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_TBL}", re.IGNORECASE),
    ),
    ("truncate", re.compile(rf"TRUNCATE\s+(?:TABLE\s+)?{_TBL}", re.IGNORECASE)),
]


def parse_ddl(sql: str) -> DdlOp | None:
    """Recognize the reference's DDL op set; None for anything else
    (reference OpEnum{Add,DropColumn,RenameColumn,RenameTable,...},
    delta/mod.rs:550-598)."""
    sql = strip_comments(sql)
    for kind, pat in _PATTERNS:
        m = pat.match(sql)
        if m:
            g = m.groupdict()
            table = g.get("table") or g.get("table2")
            return DdlOp(
                kind=kind,
                table=table,
                column=g.get("column"),
                new_name=g.get("new"),
                col_type=(g.get("ctype") or "").strip() or None,
            )
    return None


# MySQL DDL type name → Spark type (textual DDL path; wire path uses
# functions/mysql_types.spark_type_for).
_TYPE_RE = re.compile(r"(\w+)(?:\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?")
_TYPE_MAP: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "mediumint": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "text": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "blob": T.BinaryType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "timestamp": T.TimestampType(),
    "time": T.StringType(),
    "year": T.ShortType(),
    "json": T.StringType(),
    "bit": T.BinaryType(),
}


def spark_type_from_ddl(ctype: str) -> T.DataType:
    m = _TYPE_RE.match(ctype.strip().lower())
    if not m:
        return T.StringType()
    name, p, s = m.group(1), m.group(2), m.group(3)
    if name in ("decimal", "numeric"):
        return T.DecimalType(int(p or 10), int(s or 0))
    return _TYPE_MAP.get(name, T.StringType())


def apply_ddl(schema: T.StructType, op: DdlOp) -> T.StructType:
    """Evolve a table StructType by one DDL op. Unknown/irrelevant ops
    return the schema unchanged; drop_table/truncate are table-level
    (handled by the sink, not the schema)."""
    fields = list(schema.fields)
    if op.kind == "add_column":
        if any(f.name == op.column for f in fields):
            return schema
        fields.append(
            T.StructField(op.column, spark_type_from_ddl(op.col_type or "text"), True)
        )
    elif op.kind == "drop_column":
        fields = [f for f in fields if f.name != op.column]
    elif op.kind == "rename_column":
        fields = [
            T.StructField(op.new_name, f.dataType, f.nullable)
            if f.name == op.column
            else f
            for f in fields
        ]
    return T.StructType(fields)
