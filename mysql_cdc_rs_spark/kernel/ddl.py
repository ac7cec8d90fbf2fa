"""DDL statement classification + CREATE/ALTER TABLE parsing (P7/F4).

Parity: the reference prefilters Query-event SQL with a cheap
``contains("CREATE TABLE")`` before invoking the expensive sqlparser AST
(/root/reference/binlog/src/ast/query_parser.rs:23-105 — the prefilter
comment at :25-28 is exactly Catalyst's filter-before-expensive-projection).
Here: ``classify_sql`` is the cheap column-expressible prefilter;
``parse_create_table`` extracts TableInfo{name, columns[(name, type, args)]}
with a hand-rolled tokenizer (sqlglot is not shipped in this sandbox; the
grammar subset matches what the reference's fixtures exercise:
/root/reference/tests/events/5.7/02_query/sql.sql-style CREATE TABLE).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_DDL_RE = re.compile(
    r"^\s*(CREATE|ALTER|DROP|TRUNCATE|RENAME)\s+(TABLE|DATABASE|INDEX|VIEW)",
    re.IGNORECASE,
)
_DML_RE = re.compile(r"^\s*(INSERT|UPDATE|DELETE|REPLACE)\b", re.IGNORECASE)
_TCL_RE = re.compile(r"^\s*(BEGIN|COMMIT|ROLLBACK|XA)\b", re.IGNORECASE)

DDL_PREFILTER = ("CREATE TABLE", "ALTER TABLE")


def classify_sql(sql: str) -> str:
    """ddl | dml | tcl | other — the is_ddl_event analog
    (/root/reference/binlog/src/events/binlog_event.rs:405-414)."""
    if _DDL_RE.match(sql):
        return "ddl"
    if _DML_RE.match(sql):
        return "dml"
    if _TCL_RE.match(sql):
        return "tcl"
    return "other"


@dataclass
class ColumnInfo:
    name: str
    type_name: str
    type_args: tuple[int, ...] = ()
    nullable: bool = True
    unsigned: bool = False


@dataclass
class TableInfo:
    schema: str | None
    table: str
    columns: list[ColumnInfo] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)


_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?:`?(?P<schema>\w+)`?\.)?`?(?P<table>\w+)`?\s*\((?P<body>.*)\)",
    re.IGNORECASE | re.DOTALL,
)
_COL_RE = re.compile(
    r"^`?(?P<name>\w+)`?\s+(?P<type>\w+)(?:\((?P<args>[\d\s,]+)\))?"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_PK_RE = re.compile(r"^PRIMARY\s+KEY\s*\(([^)]*)\)", re.IGNORECASE)


def _split_top_level(body: str) -> list[str]:
    """Split column defs on commas not inside parentheses/quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in body:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"`":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _parse_column_def(part: str) -> ColumnInfo | None:
    cm = _COL_RE.match(part)
    if not cm:
        return None
    args = tuple(
        int(a) for a in (cm.group("args") or "").replace(" ", "").split(",")
        if a
    )
    rest = cm.group("rest").upper()
    return ColumnInfo(
        name=cm.group("name"),
        type_name=cm.group("type").upper(),
        type_args=args,
        nullable="NOT NULL" not in rest,
        unsigned="UNSIGNED" in rest,
    )


def parse_create_table(sql: str) -> TableInfo | None:
    """CREATE TABLE ... -> TableInfo; None when the statement is not a
    parseable CREATE TABLE (caller already prefiltered cheaply)."""
    if not any(p in sql.upper() for p in DDL_PREFILTER):
        return None  # the reference's cost dodge: never parse non-DDL
    m = _CREATE_RE.search(sql)
    if not m:
        return None
    info = TableInfo(schema=m.group("schema"), table=m.group("table"))
    for part in _split_top_level(m.group("body")):
        pk = _PK_RE.match(part)
        if pk:
            info.primary_key = [
                c.strip().strip("`") for c in pk.group(1).split(",")
            ]
            continue
        up = part.upper()
        if up.startswith(("KEY ", "KEY(", "INDEX ", "UNIQUE ", "CONSTRAINT ",
                          "FOREIGN ")):
            continue
        col = _parse_column_def(part)
        if col is not None:
            info.columns.append(col)
    return info


# --- ALTER TABLE (the reference's second AST branch: AddColumn/DropColumn,
#     /root/reference/binlog/src/ast/query_parser.rs:74-95) -----------------

@dataclass
class AlterInfo:
    schema: str | None
    table: str
    add_columns: list[ColumnInfo] = field(default_factory=list)
    drop_columns: list[str] = field(default_factory=list)


_ALTER_RE = re.compile(
    r"ALTER\s+TABLE\s+(?:`?(?P<schema>\w+)`?\.)?`?(?P<table>\w+)`?\s+"
    r"(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_RE = re.compile(r"^ADD\s+(?:COLUMN\s+)?(?P<def>.+)$",
                     re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(r"^DROP\s+(?:COLUMN\s+)?`?(?P<name>\w+)`?$",
                      re.IGNORECASE)


def parse_alter_table(sql: str) -> AlterInfo | None:
    """ALTER TABLE ... ADD/DROP COLUMN ... -> AlterInfo; None otherwise.
    Same cheap prefilter-then-parse split as parse_create_table; unhandled
    operations (RENAME/CHANGE/ALTER COLUMN) are skipped, mirroring the
    reference's todo-fallthrough (query_parser.rs:84-91)."""
    if "ALTER TABLE" not in sql.upper():
        return None
    m = _ALTER_RE.search(sql)
    if not m:
        return None
    info = AlterInfo(schema=m.group("schema"), table=m.group("table"))
    for op in _split_top_level(m.group("body")):
        am = _ADD_RE.match(op)
        if am:
            col = _parse_column_def(am.group("def"))
            if col is not None:
                info.add_columns.append(col)
            continue
        dm = _DROP_RE.match(op)
        if dm:
            info.drop_columns.append(dm.group("name"))
    return info
