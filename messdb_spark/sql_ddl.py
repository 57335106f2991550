"""CREATE TABLE DDL parsing — the reference's entire SQL write surface
(``/root/reference/messdb-sql/src/MessDB/SQL.hs:21-35``;
type mapping ``messdb-sql/src/MessDB/SQL/Schema.hs:59-76``).

Accepts:  CREATE TABLE name (col TYPE [PRIMARY KEY] [NOT NULL], ...)
Key = PRIMARY KEY columns (>=1 required, matching ``SQL/Schema.hs:44``);
non-key columns are nullable unless NOT NULL (``SQL/Schema.hs:49``).

Type names follow the reference's postgres-ish mapping with Spark types:
smallint/int2/int16 → short;  integer/int/int4/int32 → int;
bigint/int8/int64 → long;     real/float4 → float;
"double precision"/float8/double → double;  bytes/bytea → binary;
text/varchar/string → string; plus (our superset, for the driver data)
date, timestamp, boolean, decimal(p,s).

Unsigned word types: the reference's Word8-32 widen to the next signed
Spark type; word64 maps to decimal(20,0) (SURVEY.md §7 risk 4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

_TYPE_MAP: dict[str, T.DataType] = {
    "smallint": T.ShortType(), "int2": T.ShortType(), "int16": T.ShortType(),
    "integer": T.IntegerType(), "int": T.IntegerType(), "int4": T.IntegerType(),
    "int32": T.IntegerType(),
    "bigint": T.LongType(), "int8": T.LongType(), "int64": T.LongType(),
    "tinyint": T.ByteType(),
    "word8": T.ShortType(), "word16": T.IntegerType(), "word32": T.LongType(),
    "word64": T.DecimalType(20, 0),
    "real": T.FloatType(), "float4": T.FloatType(), "float": T.FloatType(),
    "double precision": T.DoubleType(), "float8": T.DoubleType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(), "bytea": T.BinaryType(), "binary": T.BinaryType(),
    "text": T.StringType(), "varchar": T.StringType(), "string": T.StringType(),
    "date": T.DateType(), "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(), "bool": T.BooleanType(),
}

_CREATE_RE = re.compile(
    r"^\s*create\s+table\s+(if\s+not\s+exists\s+)?([A-Za-z_][\w.]*)\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_DECIMAL_RE = re.compile(r"^(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", re.IGNORECASE)


@dataclass(frozen=True)
class CreateTable:
    name: str
    schema: T.StructType
    key_cols: list[str]
    if_not_exists: bool = False


class SqlError(ValueError):
    """``SqlException`` analog (``SQL.hs:41-44``)."""


def _split_columns(body: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _resolve_type(type_str: str) -> T.DataType:
    t = re.sub(r"\s+", " ", type_str.strip().lower())
    m = _DECIMAL_RE.match(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    # varchar(n) → string
    t = re.sub(r"^(varchar|char)\s*\(\s*\d+\s*\)$", r"\1", t)
    if t in _TYPE_MAP:
        return _TYPE_MAP[t]
    raise SqlError(f"unsupported type: {type_str!r}")


def parse_create_table(statement: str) -> CreateTable:
    m = _CREATE_RE.match(statement)
    if not m:
        raise SqlError(f"unsupported statement (only CREATE TABLE): {statement[:80]!r}")
    if_not_exists, name, body = m.group(1) is not None, m.group(2), m.group(3)
    fields: list[T.StructField] = []
    key_cols: list[str] = []
    for coldef in _split_columns(body):
        low = coldef.lower()
        if low.startswith(("primary key", "unique", "check", "foreign key", "constraint")):
            tm = re.match(r"primary\s+key\s*\(([^)]*)\)", low)
            if tm:
                key_cols.extend(c.strip().strip('"') for c in tm.group(1).split(","))
                continue
            raise SqlError(f"unsupported constraint: {coldef!r}")
        cm = re.match(r'^("?[\w]+"?)\s+(.*?)(\s+primary\s+key)?(\s+not\s+null)?\s*$',
                      coldef, re.IGNORECASE)
        if not cm:
            raise SqlError(f"cannot parse column def: {coldef!r}")
        col = cm.group(1).strip('"')
        dtype = _resolve_type(cm.group(2))
        is_key = cm.group(3) is not None
        not_null = cm.group(4) is not None or is_key
        if is_key:
            key_cols.append(col)
        fields.append(T.StructField(col, dtype, nullable=not not_null))
    if not key_cols:
        # the reference requires a key (``SQL/Schema.hs:44`` errors on
        # keyless tables); we follow it.
        raise SqlError("table needs at least one PRIMARY KEY column")
    # key columns are non-null by construction
    fields = [T.StructField(f.name, f.dataType, nullable=f.nullable and f.name not in key_cols)
              for f in fields]
    return CreateTable(name=name, schema=T.StructType(fields), key_cols=key_cols,
                       if_not_exists=if_not_exists)


# ---------------------------------------------------------------------------
# DML statements — INSERT / UPDATE / DELETE (capability superset: the
# reference rejects every non-CREATE statement, ``SQL.hs:41-44``; here
# they lower onto the engine's own operators — INSERT → canonicalize +
# O1 merge upsert, UPDATE → projected rewrite, DELETE → filter rewrite)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class InsertStmt:
    table: str
    columns: list[str] | None      # None = positional over all columns
    source_sql: str                # "VALUES ..." or "SELECT ..."


@dataclass(frozen=True)
class UpdateStmt:
    table: str
    assignments: list[tuple[str, str]]   # (column, SQL expression)
    where: str | None


@dataclass(frozen=True)
class DeleteStmt:
    table: str
    where: str | None


@dataclass(frozen=True)
class MergeStmt:
    """MERGE INTO target USING source ON cond
    [WHEN MATCHED THEN UPDATE SET ... | WHEN MATCHED THEN DELETE]
    [WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs) | INSERT *]
    — the lakehouse upsert statement, lowered onto the engine's
    anti-join merge."""
    target: str
    target_alias: str
    source_sql: str                       # "SELECT ..." (subquery text
    source_alias: str                     # or "SELECT * FROM name")
    on: str
    update_assignments: list[tuple[str, str]] | None   # WHEN MATCHED UPDATE
    matched_delete: bool                               # WHEN MATCHED DELETE
    insert_cols: list[str] | None         # WHEN NOT MATCHED INSERT (...)
    insert_values: list[str] | None
    insert_star: bool                     # WHEN NOT MATCHED INSERT *


_INSERT_RE = re.compile(
    r"^\s*insert\s+into\s+(\w+)\s*(\([^()]*\))?\s*"
    r"((?:values|select)\b.*)$",
    re.IGNORECASE | re.DOTALL)
_DELETE_RE = re.compile(
    r"^\s*delete\s+from\s+(\w+)\s*(?:\bwhere\b(.*))?$",
    re.IGNORECASE | re.DOTALL)
_UPDATE_RE = re.compile(
    r"^\s*update\s+(\w+)\s+set\b(.*)$",
    re.IGNORECASE | re.DOTALL)
_MERGE_RE = re.compile(
    r"^\s*merge\s+into\s+(\w+)(?:\s+as)?(?:\s+(?!using\b)(\w+))?"
    r"\s+using\s+(.*)$",
    re.IGNORECASE | re.DOTALL)


def _scan_top_level(s: str):
    """Yield (index, char) at paren depth 0 and outside single/double
    quoted literals ('' escapes inside strings, SQL-style)."""
    depth = 0
    i, n = 0, len(s)
    quote = None
    while i < n:
        ch = s[i]
        if quote is not None:
            if ch == quote:
                if quote == "'" and i + 1 < n and s[i + 1] == "'":
                    i += 2
                    continue
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            yield i, ch
        i += 1


def _split_top_commas(s: str) -> list[str]:
    """Split on commas at depth 0 outside string literals."""
    cuts = [i for i, ch in _scan_top_level(s) if ch == ","]
    parts, prev = [], 0
    for c in cuts:
        parts.append(s[prev:c])
        prev = c + 1
    parts.append(s[prev:])
    return [p.strip() for p in parts if p.strip()]


def _find_top_keyword(s: str, kw: str) -> int:
    """Index of the first top-level occurrence of word ``kw`` (case-
    insensitive, word-bounded), or -1."""
    low = s.lower()
    kw = kw.lower()
    for i, ch in _scan_top_level(s):
        if low.startswith(kw, i):
            before_ok = i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")
            j = i + len(kw)
            after_ok = j >= len(s) or not (low[j].isalnum() or low[j] == "_")
            if before_ok and after_ok:
                return i
    return -1


def _parse_assignments(set_part: str) -> list[tuple[str, str]]:
    assignments = []
    for item in _split_top_commas(set_part):
        eq = item.find("=")
        if eq <= 0:
            raise SqlError(f"cannot parse SET assignment: {item!r}")
        col = item[:eq].strip().strip('"')
        col = col.split(".")[-1]            # accept t.col on the LHS
        assignments.append((col, item[eq + 1:].strip()))
    if not assignments:
        raise SqlError("UPDATE needs at least one SET assignment")
    return assignments


def _parse_merge(statement: str) -> MergeStmt | None:
    m = _MERGE_RE.match(statement.strip().rstrip(";"))
    if not m:
        return None
    target, target_alias = m.group(1), m.group(2) or m.group(1)
    rest = m.group(3).strip()

    # source: "(subquery) [AS] alias" or "name [[AS] alias]"
    if rest.startswith("("):
        depth = 0
        end = -1
        for i, ch in enumerate(rest):       # literal-blind is fine: the
            if ch == "(":                   # subquery is balanced and a
                depth += 1                  # paren inside a literal also
            elif ch == ")":                 # pairs within it
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise SqlError("unbalanced parens in MERGE source")
        source_sql = rest[1:end].strip()
        rest = rest[end + 1:].strip()
        sm = re.match(r"^(?:as\s+)?(\w+)\s+(?=on\b)", rest,
                      re.IGNORECASE | re.DOTALL)
        if not sm:
            raise SqlError("MERGE subquery source needs an alias")
        source_alias = sm.group(1)
        rest = rest[sm.end():]
    else:
        sm = re.match(r"^(\w+)(?:\s+as)?(?:\s+(?!on\b)(\w+))?\s+(?=on\b)",
                      rest, re.IGNORECASE | re.DOTALL)
        if not sm:
            raise SqlError("cannot parse MERGE source")
        source_alias = sm.group(2) or sm.group(1)
        source_sql = f"SELECT * FROM {sm.group(1)}"
        rest = rest[sm.end():]

    rest = re.sub(r"^on\b", "", rest, flags=re.IGNORECASE).strip()
    wi = _find_top_keyword(rest, "when")
    if wi < 0:
        raise SqlError("MERGE needs at least one WHEN clause")
    on = rest[:wi].strip()
    clause_text = rest[wi:]
    # split into individual WHEN clauses at top level
    idxs = []
    low = clause_text.lower()
    pos = 0
    while True:
        nxt = _find_top_keyword(low[pos:], "when")
        if nxt < 0:
            break
        idxs.append(pos + nxt)
        pos = pos + nxt + 4
    clauses = [clause_text[a:b].strip()
               for a, b in zip(idxs, idxs[1:] + [len(clause_text)])]

    upd = None
    matched_delete = False
    ins_cols = ins_vals = None
    ins_star = False
    for cl in clauses:
        if re.match(r"^when\s+matched\s+then\s+delete\s*$", cl,
                    re.IGNORECASE):
            matched_delete = True
            continue
        mm = re.match(r"^when\s+matched\s+then\s+update\s+set\b(.*)$",
                      cl, re.IGNORECASE | re.DOTALL)
        if mm:
            upd = _parse_assignments(mm.group(1))
            continue
        mi = re.match(r"^when\s+not\s+matched\s+then\s+insert\s*"
                      r"(\*|\(([^()]*)\)\s*values\s*\((.*)\))\s*$",
                      cl, re.IGNORECASE | re.DOTALL)
        if mi:
            if mi.group(1) == "*":
                ins_star = True
            else:
                ins_cols = [c.strip().strip('"')
                            for c in mi.group(2).split(",") if c.strip()]
                ins_vals = _split_top_commas(mi.group(3))
                if len(ins_cols) != len(ins_vals):
                    raise SqlError("MERGE INSERT arity mismatch")
            continue
        raise SqlError(f"unsupported MERGE clause: {cl[:80]!r}")
    if upd is not None and matched_delete:
        raise SqlError("MERGE supports one WHEN MATCHED action "
                       "(UPDATE or DELETE), not both")
    return MergeStmt(target=target, target_alias=target_alias,
                     source_sql=source_sql, source_alias=source_alias,
                     on=on, update_assignments=upd,
                     matched_delete=matched_delete,
                     insert_cols=ins_cols, insert_values=ins_vals,
                     insert_star=ins_star)


def parse_dml(statement: str):
    """Parse one DML statement; returns InsertStmt / UpdateStmt /
    DeleteStmt / MergeStmt, or None if the statement is not DML
    (caller falls through to SELECT passthrough)."""
    mg = _parse_merge(statement)
    if mg is not None:
        return mg
    m = _INSERT_RE.match(statement)
    if m:
        cols = None
        if m.group(2):
            cols = [c.strip().strip('"') for c in
                    m.group(2)[1:-1].split(",") if c.strip()]
        return InsertStmt(table=m.group(1), columns=cols,
                          source_sql=m.group(3).strip())
    m = _UPDATE_RE.match(statement)
    if m:
        rest = m.group(2)
        wi = _find_top_keyword(rest, "where")
        set_part, where = (rest[:wi], rest[wi + 5:].strip()) if wi >= 0 \
            else (rest, None)
        return UpdateStmt(table=m.group(1),
                          assignments=_parse_assignments(set_part),
                          where=where)
    m = _DELETE_RE.match(statement)
    if m:
        where = m.group(2).strip() if m.group(2) else None
        return DeleteStmt(table=m.group(1), where=where)
    return None


@dataclass(frozen=True)
class DropTable:
    name: str
    if_exists: bool


@dataclass(frozen=True)
class AlterAddColumn:
    table: str
    column: str
    dtype: "T.DataType"
    if_not_exists: bool


_DROP_RE = re.compile(
    r"^\s*drop\s+table\s+(if\s+exists\s+)?(\w+)\s*$", re.IGNORECASE)
_TRUNCATE_RE = re.compile(
    r"^\s*truncate\s+table\s+(\w+)\s*$", re.IGNORECASE)
_RENAME_RE = re.compile(
    r"^\s*alter\s+table\s+(\w+)\s+rename\s+to\s+(\w+)\s*$", re.IGNORECASE)
_ALTER_RE = re.compile(
    r"^\s*alter\s+table\s+(\w+)\s+add\s+column\s+(if\s+not\s+exists\s+)?"
    r'("?[\w]+"?)\s+(.+?)\s*$',
    re.IGNORECASE | re.DOTALL)


def parse_drop_table(statement: str) -> DropTable | None:
    m = _DROP_RE.match(statement)
    if not m:
        return None
    return DropTable(name=m.group(2), if_exists=m.group(1) is not None)


def parse_truncate_table(statement: str) -> str | None:
    """TRUNCATE TABLE name → the table name, or None."""
    m = _TRUNCATE_RE.match(statement)
    return m.group(1) if m else None


def parse_rename_table(statement: str) -> tuple[str, str] | None:
    """ALTER TABLE a RENAME TO b → (a, b), or None."""
    m = _RENAME_RE.match(statement)
    return (m.group(1), m.group(2)) if m else None


def parse_alter_add_column(statement: str) -> AlterAddColumn | None:
    m = _ALTER_RE.match(statement)
    if not m:
        return None
    return AlterAddColumn(table=m.group(1),
                          if_not_exists=m.group(2) is not None,
                          column=m.group(3).strip('"'),
                          dtype=_resolve_type(m.group(4)))


@dataclass(frozen=True)
class CtasStmt:
    name: str
    key_cols: list[str] | None     # None → default to first output column
    select_sql: str
    if_not_exists: bool = False


_CTAS_RE = re.compile(
    r"^\s*create\s+table\s+(if\s+not\s+exists\s+)?([A-Za-z_][\w.]*)\s*"
    r"(?:primary\s+key\s*\(([^)]*)\)\s*)?as\s+(select\b.*)$",
    re.IGNORECASE | re.DOTALL)


def parse_ctas(statement: str) -> CtasStmt | None:
    """CREATE TABLE name [PRIMARY KEY (k, ...)] AS SELECT ... — CTAS
    (capability superset: the reference accepts only column-list
    CREATE TABLE, ``SQL.hs:21-35``). The PRIMARY KEY clause names the
    key columns of the new table; omitted, the first output column is
    the key (every table needs one — the relational model is keyed,
    ``SQL/Schema.hs:44``)."""
    m = _CTAS_RE.match(statement.strip().rstrip(";"))
    if m is None:
        return None
    keys = None
    if m.group(3):
        keys = [c.strip() for c in m.group(3).split(",") if c.strip()]
        if not keys:
            raise SqlError("empty PRIMARY KEY column list in CTAS")
    return CtasStmt(name=m.group(2), key_cols=keys,
                    select_sql=m.group(4).strip(),
                    if_not_exists=bool(m.group(1)))


@dataclass(frozen=True)
class InsertOverwriteStmt:
    table: str
    columns: list[str] | None      # None = positional over all columns
    source_sql: str                # "VALUES ..." or "SELECT ..."


_INSERT_OVERWRITE_RE = re.compile(
    r"^\s*insert\s+overwrite\s+(?:table\s+)?(\w+)\s*(\([^()]*\))?\s*"
    r"((?:values|select)\b.*)$",
    re.IGNORECASE | re.DOTALL)


def parse_insert_overwrite(statement: str) -> InsertOverwriteStmt | None:
    """INSERT OVERWRITE [TABLE] t [(cols)] SELECT ... | VALUES ... —
    atomic full-replace of a table's content (the lakehouse refresh
    statement): the table's schema and key columns are kept, the data
    becomes exactly the canonicalized source relation, in one root
    swap (time-travel reversible like TRUNCATE)."""
    m = _INSERT_OVERWRITE_RE.match(statement.strip().rstrip(";"))
    if m is None:
        return None
    cols = None
    if m.group(2):
        cols = [c.strip().strip('"') for c in
                m.group(2)[1:-1].split(",") if c.strip()]
    return InsertOverwriteStmt(table=m.group(1), columns=cols,
                               source_sql=m.group(3).strip())


@dataclass(frozen=True)
class AlterColumnType:
    table: str
    column: str
    dtype: "T.DataType"


_ALTER_TYPE_RE = re.compile(
    r"^\s*alter\s+table\s+(\w+)\s+alter\s+(?:column\s+)?(\"?\w+\"?)\s+"
    r"(?:set\s+data\s+)?type\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

# lossless widenings (SQL-standard-safe; anything else must go through
# an explicit rewrite so data can't silently truncate) — keyed by
# DataType.simpleString()
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "double", "decimal(20,0)"},
    "smallint": {"int", "bigint", "double", "decimal(20,0)"},
    "int": {"bigint", "double", "decimal(20,0)"},
    "bigint": {"decimal(20,0)"},
    "float": {"double"},
}


def is_widening(src: "T.DataType", dst: "T.DataType") -> bool:
    return dst.simpleString() in _WIDENINGS.get(src.simpleString(), set())


def parse_alter_column_type(statement: str) -> AlterColumnType | None:
    """ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE newtype — schema
    widening (capability superset; the reference has no ALTER at
    all)."""
    m = _ALTER_TYPE_RE.match(statement)
    if not m:
        return None
    return AlterColumnType(table=m.group(1),
                           column=m.group(2).strip('"'),
                           dtype=_resolve_type(m.group(3)))
