"""QUALIFY dialect shim for OSS Spark SQL.

All four of the reference's transform SQL files end with
``QUALIFY ROW_NUMBER() OVER (...) = 1``
(reference bronze/assets/assets.sql:11, bronze/tickers/tickers.sql:31,
silver/prices/prices.sql:14, silver/summary_profile/summary_profile.sql:15).
QUALIFY is a Databricks/Snowflake/DuckDB extension; OSS Spark 4.1.2
raises PARSE_SYNTAX_ERROR on it (verified — SURVEY.md §2.2 P13).

The shim rewrites

    SELECT <cols> FROM <rest> QUALIFY <window-predicate> [ORDER BY ...]

into the standard subquery form

    SELECT * EXCEPT (__qualify__) FROM (
        SELECT *, (<window-predicate>) AS __qualify__
        FROM (SELECT <cols> FROM <rest>)
    ) WHERE __qualify__ [ORDER BY ...]

It is a *string-level dialect adapter*, not an optimizer: the rewritten
query goes straight to Catalyst, which plans the ranking window and
(for the ubiquitous ``row_number() = 1`` shape) applies
InferWindowGroupLimit so only group-top rows survive the sort — the
same physical plan Databricks produces for QUALIFY.

The clause boundary scan is paren-depth aware (an ``ORDER BY`` inside
``OVER (...)`` belongs to the predicate; only a depth-0 ``ORDER BY`` /
``LIMIT`` terminates it) and skips string literals, quoted identifiers
and comments.

Known limitation vs Databricks QUALIFY: because the predicate is
hoisted above the SELECT's projection, it can only reference the
*projected* output columns — not un-projected base columns or LATERAL
VIEW aliases (write ``ORDER BY volume`` rather than ``h.volume`` when
``volume`` is in the select list). Full fidelity would need a real SQL
parser; projected-column predicates cover every QUALIFY in the
reference corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_WORD = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def _scan_tokens(sql: str):
    """Yield (upper_token, start, end) for word tokens at paren depth 0,
    skipping strings ('' / ""), backtick identifiers, and -- comments."""
    i, n, depth = 0, len(sql), 0
    while i < n:
        ch = sql[i]
        if ch == "(":
            depth += 1
            i += 1
        elif ch == ")":
            depth -= 1
            i += 1
        elif ch in "'\"`":
            q = ch
            i += 1
            while i < n:
                if sql[i] == "\\":
                    i += 2
                    continue
                if sql[i] == q:
                    # '' style escaping
                    if i + 1 < n and sql[i + 1] == q:
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            m = _WORD.match(sql, i)
            if m:
                if depth == 0:
                    yield m.group(0).upper(), m.start(), m.end()
                i = m.end()
            else:
                i += 1


def _find_clause(sql: str):
    """Locate the first depth-0 QUALIFY; return (start, pred_end, tail_start).

    The predicate runs from after QUALIFY to the first depth-0
    ORDER/LIMIT/semicolon or end-of-string.
    """
    toks = list(_scan_tokens(sql))
    for idx, (tok, start, end) in enumerate(toks):
        if tok != "QUALIFY":
            continue
        pred_end = len(sql)
        semi = _depth0_semicolon(sql, end)
        if semi is not None:
            pred_end = semi
        for tok2, s2, _ in toks[idx + 1:]:
            if s2 >= pred_end:
                break
            if tok2 in ("ORDER", "LIMIT"):
                pred_end = s2
                break
        return start, pred_end
    return None


def _depth0_semicolon(sql: str, from_pos: int):
    depth = 0
    i = from_pos
    while i < len(sql):
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ";" and depth == 0:
            return i
        elif ch in "'\"`":
            q = ch
            i += 1
            while i < len(sql) and sql[i] != q:
                i += 2 if sql[i] == "\\" else 1
        i += 1
    return None


def rewrite_qualify(sql: str) -> str:
    """Rewrite every QUALIFY clause into a filtered subquery."""
    out = sql
    for _ in range(100):  # bounded: each pass removes one clause
        loc = _find_clause(out)
        if loc is None:
            return out
        start, pred_end = loc
        pred = out[start + len("QUALIFY"): pred_end].strip().rstrip(";").strip()
        head = out[:start].rstrip()
        tail = out[pred_end:].strip()
        out = (
            "SELECT * EXCEPT (__qualify__) FROM (\n"
            f"  SELECT *, ({pred}) AS __qualify__ FROM (\n{head}\n  ) __q_in__\n"
            ") __q_out__ WHERE __qualify__"
        ) + ((" " + tail) if tail else "")
    # Never hand partially rewritten SQL to Catalyst — the leftover
    # QUALIFY would surface as a baffling PARSE_SYNTAX_ERROR pointing
    # at generated text.
    raise ValueError(
        "rewrite_qualify: more than 100 QUALIFY clauses in one statement "
        "(or the rewrite failed to make progress); refusing to emit "
        "partially rewritten SQL"
    )


def rewrite_table_refs(sql: str, mapping: dict[str, str]) -> str:
    """Replace three-part table references (``catalog.schema.table``,
    the reference's Unity-Catalog naming — reference
    silver/prices/prices.sql:12) with their registered flat view names.
    Longest names first so overlapping prefixes can't mis-rewrite."""
    out = sql
    for full in sorted(mapping, key=len, reverse=True):
        out = re.sub(
            rf"(?<![\w.`]){re.escape(full)}(?![\w.`])", mapping[full], out
        )
    return out


def run_sql(
    spark: SparkSession,
    sql: str,
    table_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Execute SQL with dialect shims applied (QUALIFY + three-part
    table references)."""
    if table_mapping:
        sql = rewrite_table_refs(sql, table_mapping)
    return spark.sql(rewrite_qualify(sql))
