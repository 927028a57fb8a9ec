"""Driver-side SQL codegen (SURVEY §3.2 S7; camp_vec_rcmn.py:240-283).

The reference's final stage templates per-business-query SQL from mined
conditions, unions them, and counts distinct customers (F11 regex cleanup,
F12 clause building, U1+A9 assembly). Here the same stage emits ANSI SQL
that both ``spark.sql`` and DuckDB execute — which makes the generated
query itself its own oracle.

Template cleanup reproduces the intended behavior of camp_vec_rcmn.py:251-261:
strip block comments, resolve ``[placeholder]`` slots, drop ``@@...@@``
markers, collapse whitespace, and trim a dangling AND left by removed
placeholders.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_COMMENT = re.compile(r"/\*.*?\*/", re.DOTALL)
_PLACEHOLDER = re.compile(r"\[([A-Za-z0-9_]+)\]")
_MARKER = re.compile(r"@@[A-Za-z0-9_]+@@")
_WS = re.compile(r"\s+")


@dataclass(frozen=True)
class Condition:
    """One mined targeting condition (IR₃ of SURVEY §3.2)."""

    column: str
    op: str  # 'in' | 'equal' | 'between' | 'gte' | 'lte'
    values: tuple

    def clause(self) -> str:
        vals = [_sql_literal(v) for v in self.values]
        if self.op == "in":
            return f"{self.column} IN ({', '.join(vals)})"
        if self.op == "equal":
            return f"{self.column} = {vals[0]}"
        if self.op == "between":
            return f"{self.column} BETWEEN {vals[0]} AND {vals[1]}"
        if self.op == "gte":
            return f"{self.column} >= {vals[0]}"
        if self.op == "lte":
            return f"{self.column} <= {vals[0]}"
        raise ValueError(f"unknown op {self.op!r}")


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        raise ValueError("boolean literals not supported")
    return str(v)


def clean_template(sql: str) -> str:
    """F11: comment strip + marker removal + whitespace collapse."""
    sql = _COMMENT.sub(" ", sql)
    sql = _MARKER.sub(" ", sql)
    sql = _WS.sub(" ", sql).strip()
    return sql


def fill_template(template: str, clauses: dict[str, str]) -> str:
    """Replace ``[name]`` placeholders; unreferenced placeholders vanish.
    A dangling ``WHERE AND`` / leading AND from removed slots is repaired
    (the reference's lstrip('AND'), camp_vec_rcmn.py:263-268)."""

    def sub(m: re.Match) -> str:
        return clauses.get(m.group(1), "")

    sql = _PLACEHOLDER.sub(sub, template)
    sql = clean_template(sql)
    sql = re.sub(r"\bWHERE\s+AND\b", "WHERE", sql)
    sql = re.sub(r"\bWHERE\s*(\)|$)", r"\1", sql)
    sql = re.sub(r"\bAND\s+AND\b", "AND", sql)
    return _WS.sub(" ", sql).strip()


def audience_member_sql(table: str, key: str, conds: list[Condition]) -> str:
    """One per-business-query SELECT (camp_vec_rcmn.py:240-283)."""
    template = f"SELECT {key} AS cust_id FROM {table} /* audience slice */ WHERE [conds]"
    clause = " AND ".join(c.clause() for c in conds) if conds else "1 = 1"
    return fill_template(template, {"conds": clause})


def audience_count_sql(
    slices: list[tuple[str, str, list[Condition]]],
) -> str:
    """U1 + A9: UNION (dedup) of audience slices → COUNT(DISTINCT cust_id)
    (camp_vec_rcmn.py:284-285)."""
    if not slices:
        raise ValueError("no audience slices")
    unions = "\nUNION\n".join(
        audience_member_sql(t, k, cs) for t, k, cs in slices
    )
    return (
        "SELECT COUNT(DISTINCT cust_id) AS audience_cnt FROM (\n"
        + unions
        + "\n) total"
    )
