"""K5 wire adapter: render the warehouse staged-MERGE statement
sequence (CREATE TEMP stage → batched INSERT → keyed MERGE) for a
(table, keys, cols) spec — the SQL the reference sends to its
warehouse (`src/snowflake/load_to_snowflake.py:193-241`,
`realtime_load_to_snowflake.py:225-251`), emitted generically and with
no driver/network dependency.

The engine-side twin of this semantics is
``operators.relational.merge_upsert`` (left-anti + union); the
equivalence is unit-tested by executing the emitted DuckDB-dialect
statements and comparing to the DataFrame result, so the wire adapter
is *checked* against the engine, not merely shaped like the reference.

Dialects:

- ``ansi`` — Snowflake-compatible ``CREATE OR REPLACE TEMPORARY TABLE
  … LIKE`` + ``MERGE INTO`` (what actually ships to a warehouse).
- ``duckdb`` — the same semantics as an ``UPDATE … FROM`` +
  ``INSERT … WHERE NOT EXISTS`` pair (DuckDB 1.0 has no MERGE), used
  by the tests to *execute* the emitted SQL locally.

Scale note: this adapter moves the final, already-aggregated batch
(thousands of rows per window, not the 100 TB raw), which is why a
row-batched INSERT into a temp stage is acceptable — the heavy lifting
stayed in Spark.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"staged_merge_sql: invalid identifier {name!r}")
    return name


def staged_merge_sql(
    table: str,
    keys: list[str],
    cols: list[str],
    stage_table: str = "TEMP_STAGE_TABLE",
    dialect: str = "ansi",
    placeholder: str = "%s",
) -> dict[str, object]:
    """Render the staged-MERGE statement sequence.

    Returns ``{"create_stage": str, "insert": str, "merge": [str, ...]}``
    where ``insert`` is an ``executemany`` template over ``cols`` (one
    ``placeholder`` per column) and ``merge`` is the ordered list of
    statements that fold the stage into ``table``: matched rows get
    every non-key column updated from the stage, unmatched stage rows
    are inserted whole — the reference's WHEN MATCHED / WHEN NOT
    MATCHED pair, and exactly ``relational.merge_upsert``'s semantics
    (idempotent: re-running the same stage is a no-op).
    """
    for name in [table, stage_table, *keys, *cols]:
        _check_ident(name)
    if not keys:
        raise ValueError("staged_merge_sql: at least one key column required")
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"staged_merge_sql: keys not in cols: {missing}")
    val_cols = [c for c in cols if c not in keys]
    if not val_cols:
        raise ValueError("staged_merge_sql: no non-key columns to update")
    if dialect not in ("ansi", "duckdb"):
        raise ValueError(f"staged_merge_sql: unknown dialect {dialect!r}")

    col_list = ", ".join(cols)
    on = " AND ".join(f"target.{k} = source.{k}" for k in keys)
    set_clause = ", ".join(f"{c} = source.{c}" for c in val_cols)
    insert = (
        f"INSERT INTO {stage_table} ({col_list}) "
        f"VALUES ({', '.join([placeholder] * len(cols))})"
    )

    if dialect == "ansi":
        create = (
            f"CREATE OR REPLACE TEMPORARY TABLE {stage_table} LIKE {table}"
        )
        merge = [
            f"MERGE INTO {table} AS target\n"
            f"USING {stage_table} AS source\n"
            f"ON {on}\n"
            f"WHEN MATCHED THEN UPDATE SET\n    "
            + ",\n    ".join(f"target.{c} = source.{c}" for c in val_cols)
            + "\nWHEN NOT MATCHED THEN\n"
            f"    INSERT ({col_list})\n"
            f"    VALUES ({', '.join(f'source.{c}' for c in cols)})"
        ]
    else:  # duckdb: MERGE unrolled into UPDATE + anti-joined INSERT
        create = (
            f"CREATE OR REPLACE TEMPORARY TABLE {stage_table} AS "
            f"SELECT * FROM {table} LIMIT 0"
        )
        not_exists = " AND ".join(f"t.{k} = source.{k}" for k in keys)
        merge = [
            f"UPDATE {table} AS target SET {set_clause} "
            f"FROM {stage_table} AS source WHERE {on}",
            f"INSERT INTO {table} ({col_list}) "
            f"SELECT {col_list} FROM {stage_table} AS source "
            f"WHERE NOT EXISTS (SELECT 1 FROM {table} AS t WHERE {not_exists})",
        ]
    return {"create_stage": create, "insert": insert, "merge": merge}
