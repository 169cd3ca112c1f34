"""SQL front-end for table DML/DDL statements on catalog tables.

The reference runs on Databricks, where users issue ``DELETE FROM`` /
``UPDATE`` / ``TRUNCATE TABLE`` / ``ALTER TABLE ADD CONSTRAINT`` /
``RESTORE TABLE`` / ``VACUUM`` against Delta tables as ordinary SQL.
OSS Spark 4.1.2 rejects every one of them on path-based parquet tables
(DELETE/UPDATE need a v2 table with row-level-op support; the rest are
Delta-only syntax). **[extension]** This module is the dialect adapter:
a bounded statement grammar dispatched onto the engine's own
implementations —

    DELETE FROM t WHERE ...      → operators/dml.py:delete_where
    UPDATE t SET a=..., b=...
        [WHERE ...]              → operators/dml.py:update_where
    TRUNCATE TABLE t             → Catalog.truncate
    ALTER TABLE t ADD CONSTRAINT
        name CHECK (expr)        → Catalog.add_constraint
    ALTER TABLE t DROP CONSTRAINT
        name                     → Catalog.drop_constraint
    RESTORE TABLE t TO VERSION
        AS OF n                  → Catalog.restore
    VACUUM t                     → Catalog.vacuum

so a user migrating the reference's notebooks keeps their statements.
Like plans/qualify.py this is a *string-level* adapter, not a SQL
parser: statement heads are matched with the same depth-0,
string/comment-aware token scan, expressions (WHERE predicates, SET
right-hand sides, CHECK bodies) are passed VERBATIM to Spark's own
``F.expr`` — Catalyst owns expression semantics, this module only
finds the clause boundaries. Anything outside the grammar raises
``UnsupportedStatement`` naming what was seen (fail fast, never guess).

Partition pruning is automatic: the table's hive layout is detected
from its directory tree (``catalog.detect_partition_cols``) and passed
to the DML so a DELETE/UPDATE whose matches live in 3 of 3,000 partitions
reads and rewrites only those 3 — the SQL user gets the pruned path
without knowing it exists.
"""

from __future__ import annotations

from ..catalog import detect_partition_cols as _detect_partition_cols
from .qualify import _scan_tokens

__all__ = ["run_table_sql", "UnsupportedStatement"]


class UnsupportedStatement(ValueError):
    """Statement outside the supported DML/DDL grammar."""


def _strip(sql: str) -> str:
    s = sql.strip()
    while s.endswith(";"):
        s = s[:-1].rstrip()
    return s


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas at paren depth 0, skipping string literals and
    backtick identifiers — SET lists contain commas inside function
    calls (``SET a = coalesce(x, 0), b = 1``)."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch in "'\"`":
            q = ch
            i += 1
            while i < n and s[i] != q:
                i += 2 if s[i] == "\\" else 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _ident(tok: str) -> str:
    return tok.strip()


def _tokens(sql: str) -> list[tuple[str, int, int]]:
    return list(_scan_tokens(sql))


def _clause_pos(toks, *keywords):
    """Start offset of the first depth-0 keyword run, or None."""
    kws = [k.upper() for k in keywords]
    for i in range(len(toks) - len(kws) + 1):
        if [t[0] for t in toks[i:i + len(kws)]] == kws:
            return i
    return None


def _table_name(sql: str, toks, idx: int) -> tuple[str, int]:
    """Dotted table name starting at token idx; returns (name, index
    of the first token AFTER the name). Plain identifiers only —
    catalog table names in this engine are unquoted; run_table_sql
    refuses backquoted statements up front (the token scan skips
    backtick spans, so they would silently misparse)."""
    if idx >= len(toks):
        raise UnsupportedStatement(
            f"statement ends where a table name was expected: {sql[:80]}"
        )
    name = _ident(sql[toks[idx][1]:toks[idx][2]])
    j = idx
    while (
        j + 1 < len(toks)
        and sql[toks[j][2]:toks[j + 1][1]].strip() == "."
    ):
        j += 1
        name += "." + _ident(sql[toks[j][1]:toks[j][2]])
    return name, j + 1


def run_table_sql(catalog, sql: str, max_partitions: int = 10_000):
    """Execute one DML/DDL statement against the catalog (grammar in
    the module docstring). Returns: affected-row count (DELETE/UPDATE,
    and INSERT INTO), freed bytes (VACUUM), the restore return value
    (RESTORE), the stats dict (ANALYZE), a DataFrame (SELECT,
    DESCRIBE HISTORY/DETAIL), and None for the remaining metadata
    statements (TRUNCATE, ALTER CONSTRAINT, INSERT OVERWRITE)."""
    s = _strip(sql)
    if "`" in s:
        raise UnsupportedStatement(
            "backquoted identifiers are not supported here — catalog "
            "table names are plain dotted identifiers (the token scan "
            "skips backtick spans, so accepting them would misparse "
            "the statement silently)"
        )
    toks = _tokens(s)
    if not toks:
        raise UnsupportedStatement("empty statement")
    head = toks[0][0]

    if head == "DELETE":
        if len(toks) < 3 or toks[1][0] != "FROM":
            raise UnsupportedStatement(
                f"expected DELETE FROM <table> ..., got: {s[:80]}"
            )
        table, after = _table_name(s, toks, 2)
        wh = _clause_pos(toks[after:], "WHERE")
        if wh is None:
            raise UnsupportedStatement(
                "DELETE without WHERE removes every row — this engine "
                "refuses that as row-level DML (an all-deleted parquet "
                "directory has no schema to read back); use TRUNCATE "
                f"TABLE {table}"
            )
        cond = s[toks[after + wh][2]:].strip()
        from ..operators.dml import delete_where

        return delete_where(
            catalog, table, cond,
            partition_cols=_detect_partition_cols(catalog.path(table)),
            max_partitions=max_partitions,
        )

    if head == "UPDATE":
        if len(toks) < 2:
            raise UnsupportedStatement(f"bad UPDATE: {s[:80]}")
        table, after = _table_name(s, toks, 1)
        set_idx = _clause_pos(toks[after:], "SET")
        if set_idx is None:
            raise UnsupportedStatement(
                f"UPDATE needs a SET clause: {s[:80]}"
            )
        set_tok = toks[after + set_idx]
        wh = _clause_pos(toks[after + set_idx + 1:], "WHERE")
        if wh is None:
            set_body, cond = s[set_tok[2]:], "true"
        else:
            where_tok = toks[after + set_idx + 1 + wh]
            set_body = s[set_tok[2]:where_tok[1]]
            cond = s[where_tok[2]:].strip()
        set_exprs: dict[str, str] = {}
        for item in _split_top_level_commas(set_body):
            col, eq, rhs = item.partition("=")
            if not eq or not rhs.strip():
                raise UnsupportedStatement(
                    f"bad SET item {item!r} (expected col = expr)"
                )
            set_exprs[_ident(col)] = rhs.strip()
        if not set_exprs:
            raise UnsupportedStatement(f"empty SET clause: {s[:80]}")
        from ..operators.dml import update_where

        # allow_partition_move: SQL UPDATE has Delta semantics — a SET
        # on a partition column degrades to update_where's
        # layout-preserving whole-table rewrite instead of refusing
        return update_where(
            catalog, table, set_exprs, cond,
            partition_cols=_detect_partition_cols(catalog.path(table)),
            max_partitions=max_partitions,
            allow_partition_move=True,
        )

    if head in ("SELECT", "WITH"):
        # Read-side time travel: SELECT ... FROM t VERSION AS OF n
        # (Delta syntax). Each depth-0 "<tbl> VERSION AS OF <n>" span
        # is replaced by a temp view over catalog.read_version, then
        # the query runs through the ordinary dialect shims (QUALIFY +
        # three-part names). A VERSION AS OF inside a parenthesized
        # subquery is NOT rewritten (depth-0 scan, same pragmatic
        # boundary as the QUALIFY shim) — it then fails loudly in
        # Spark's parser rather than silently reading the live state.
        import re as _re

        spans = []  # (start, end, table, version)
        for i, (tok, _st, _en) in enumerate(toks):
            if (
                tok == "VERSION"
                and [t[0] for t in toks[i + 1:i + 3]] == ["AS", "OF"]
                and i > 0
            ):
                # walk back over the dotted table name
                j = i - 1
                while (
                    j > 0
                    and s[toks[j - 1][2]:toks[j][1]].strip() == "."
                ):
                    j -= 1
                name, _after = _table_name(s, toks, j)
                m = _re.match(r"\s*(\d+)", s[toks[i + 2][2]:])
                if not m:
                    raise UnsupportedStatement(
                        f"VERSION AS OF needs an integer near: "
                        f"{s[toks[i][1]:toks[i][1] + 60]!r}"
                    )
                spans.append(
                    (
                        toks[j][1],
                        toks[i + 2][2] + m.end(),
                        name,
                        int(m.group(1)),
                    )
                )
        from .qualify import run_sql

        import uuid

        out_sql = s
        vviews = []
        for start, end, name, ver in reversed(spans):
            # unique per statement: a fixed name would let concurrent
            # statements on one session cross-wire snapshots, and a
            # leftover view would serve a stale snapshot to any later
            # query that happened to reference it
            view = f"__vasof_{uuid.uuid4().hex[:12]}"
            catalog.read_version(
                name, version=ver
            ).createOrReplaceTempView(view)
            vviews.append(view)
            out_sql = out_sql[:start] + view + out_sql[end:]
        mapping = catalog.register_all()
        result = run_sql(catalog.spark, out_sql, table_mapping=mapping)
        # spark.sql analyzes eagerly: the returned frame holds the
        # resolved plan, not the view names — safe to drop now
        for view in vviews:
            catalog.spark.catalog.dropTempView(view)
        return result

    if head == "DESCRIBE":
        if len(toks) < 3 or toks[1][0] not in ("HISTORY", "DETAIL"):
            raise UnsupportedStatement(
                "only DESCRIBE HISTORY|DETAIL <table> is supported: "
                f"{s[:80]}"
            )
        table, after = _table_name(s, toks, 2)
        if after != len(toks):
            raise UnsupportedStatement(
                "DESCRIBE HISTORY|DETAIL takes only a table name "
                f"(trailing tokens ignored would mislead): {s[:80]}"
            )
        if toks[1][0] == "DETAIL":
            import json as _json

            d = catalog.describe_detail(table)
            return catalog.spark.createDataFrame(
                [
                    (
                        d["name"], d["location"], d["format"],
                        d["num_files"], d["size_bytes"],
                        d["partition_columns"], d["num_versions"],
                        _json.dumps(d["constraints"], sort_keys=True),
                        d["num_rows"],
                    )
                ],
                "name string, location string, format string, "
                "num_files long, size_bytes long, "
                "partition_columns array<string>, num_versions int, "
                "constraints string, num_rows long",
            )
        rows = catalog.history(table)
        return catalog.spark.createDataFrame(
            [
                (r["version"], r["label"], float(r["snapshot_time"]))
                for r in rows
            ],
            "version int, label string, snapshot_time double",
        )

    if head == "ANALYZE":
        # ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS]
        if len(toks) < 3 or toks[1][0] != "TABLE":
            raise UnsupportedStatement(
                f"expected ANALYZE TABLE <t> COMPUTE STATISTICS: {s[:80]}"
            )
        table, after = _table_name(s, toks, 2)
        tail = [t[0] for t in toks[after:]]
        if tail not in (
            ["COMPUTE", "STATISTICS"],
            ["COMPUTE", "STATISTICS", "FOR", "ALL", "COLUMNS"],
        ):
            raise UnsupportedStatement(
                "expected ANALYZE TABLE <t> COMPUTE STATISTICS "
                f"[FOR ALL COLUMNS], got: {s[:80]}"
            )
        return catalog.analyze(table)

    if head == "INSERT":
        # INSERT INTO t <select> → file-move append (existing bytes
        # untouched); INSERT OVERWRITE t <select> → staging-swap
        # overwrite. The <select> is ordinary Spark SQL run with every
        # warehouse table registered (three-part names shimmed like
        # the transform runner does).
        if len(toks) < 3 or toks[1][0] not in ("INTO", "OVERWRITE"):
            raise UnsupportedStatement(
                f"expected INSERT INTO|OVERWRITE <table> <select>, "
                f"got: {s[:80]}"
            )
        overwrite = toks[1][0] == "OVERWRITE"
        idx = 2
        if toks[idx][0] == "TABLE":
            idx += 1
        table, after = _table_name(s, toks, idx)
        if after >= len(toks) or toks[after][0] != "SELECT":
            raise UnsupportedStatement(
                "INSERT needs a SELECT body (VALUES lists are not "
                f"supported — build a frame and call append()): {s[:80]}"
            )
        from .qualify import run_sql

        select_sql = s[toks[after][1]:]
        mapping = catalog.register_all()
        rows = run_sql(catalog.spark, select_sql, table_mapping=mapping)
        pcols = _detect_partition_cols(catalog.path(table))
        if overwrite:
            catalog.overwrite_via_staging(rows, table, partition_by=pcols)
            return None
        return catalog.append(rows, table, partition_by=pcols)

    if head == "TRUNCATE":
        if len(toks) < 3 or toks[1][0] != "TABLE":
            raise UnsupportedStatement(
                f"expected TRUNCATE TABLE <table>, got: {s[:80]}"
            )
        table, _ = _table_name(s, toks, 2)
        catalog.truncate(table)
        return None

    if head == "ALTER":
        if len(toks) < 3 or toks[1][0] != "TABLE":
            raise UnsupportedStatement(
                f"expected ALTER TABLE <table> ..., got: {s[:80]}"
            )
        table, after = _table_name(s, toks, 2)
        verbs = [t[0] for t in toks[after:after + 2]]
        if verbs == ["ADD", "CONSTRAINT"]:
            if len(toks) < after + 4 or toks[after + 3][0] != "CHECK":
                raise UnsupportedStatement(
                    "expected ALTER TABLE t ADD CONSTRAINT name CHECK "
                    f"(expr), got: {s[:80]}"
                )
            name = _ident(
                s[toks[after + 2][1]:toks[after + 2][2]]
            )
            body = s[toks[after + 3][2]:].strip()
            if not (body.startswith("(") and body.endswith(")")):
                raise UnsupportedStatement(
                    f"CHECK body must be parenthesized: {body[:80]}"
                )
            catalog.add_constraint(table, name, body[1:-1].strip())
            return None
        if verbs == ["DROP", "CONSTRAINT"]:
            if len(toks) <= after + 2:
                raise UnsupportedStatement(
                    f"DROP CONSTRAINT needs a name: {s[:80]}"
                )
            name = _ident(s[toks[after + 2][1]:toks[after + 2][2]])
            catalog.drop_constraint(table, name)
            return None
        raise UnsupportedStatement(
            "only ADD/DROP CONSTRAINT is supported under ALTER TABLE "
            f"(schema changes belong to merge evolve_schema): {s[:80]}"
        )

    if head == "RESTORE":
        # RESTORE TABLE t TO VERSION AS OF n (Delta syntax)
        idx = 2 if len(toks) > 1 and toks[1][0] == "TABLE" else 1
        table, after = _table_name(s, toks, idx)
        tail = [t[0] for t in toks[after:]]
        if tail[:4] != ["TO", "VERSION", "AS", "OF"]:
            raise UnsupportedStatement(
                "expected RESTORE TABLE t TO VERSION AS OF <n>, got: "
                f"{s[:80]}"
            )
        # the version is a numeric literal, which the word-token scan
        # does not yield — take it from the raw tail after OF
        vers = s[toks[after + 3][2]:].strip()
        if not vers.isdigit():
            raise UnsupportedStatement(
                f"VERSION AS OF needs an integer, got {vers!r}"
            )
        return catalog.restore(table, version=int(vers))

    if head == "OPTIMIZE":
        # OPTIMIZE t [ZORDER BY (a, b)] → maintenance.optimize_table
        table, after = _table_name(s, toks, 1)
        tail = [t[0] for t in toks[after:]]
        zorder = None
        if tail[:2] == ["ZORDER", "BY"]:
            body = s[toks[after + 1][2]:].strip()
            if not (body.startswith("(") and body.endswith(")")):
                raise UnsupportedStatement(
                    f"ZORDER BY needs a parenthesized column list: "
                    f"{s[:80]}"
                )
            zorder = [
                _ident(c) for c in body[1:-1].split(",") if c.strip()
            ]
            if not zorder:
                raise UnsupportedStatement(
                    f"empty ZORDER BY column list: {s[:80]}"
                )
        elif tail:
            raise UnsupportedStatement(
                "expected OPTIMIZE <table> [ZORDER BY (cols)], got: "
                f"{s[:80]}"
            )
        from ..maintenance import optimize_table

        return optimize_table(catalog, table, zorder_by=zorder)

    if head == "VACUUM":
        table, after = _table_name(s, toks, 1)
        if after != len(toks):
            raise UnsupportedStatement(
                "only plain VACUUM <table> is supported (retention is "
                f"the catalog's keep_versions policy): {s[:80]}"
            )
        return catalog.vacuum(table)

    raise UnsupportedStatement(
        f"unsupported statement head {head!r} — supported: DELETE, "
        "UPDATE, TRUNCATE, ALTER TABLE ADD/DROP CONSTRAINT, RESTORE, "
        "VACUUM (SELECT queries go through spark.sql / plans.run_sql)"
    )
