"""Order-insensitive DataFrame↔SQL comparison used by the local
correctness harness (scripts/check_correctness.py) and the test suite —
a faithful replica of the round driver's gate: row count, column names,
and a value hash over (columns sorted by name, rows sorted, values
canonicalized)."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canon_lines(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def compare(
    scols: list[str],
    srows: list[tuple],
    ocols: list[str],
    orows: list[tuple],
) -> list[str]:
    """Returns a list of problems; empty = match."""
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
        if sh != oh:
            ls, lo = canon_lines(scols, srows), canon_lines(ocols, orows)
            diff = next(
                (f"spark={a!r} oracle={b!r}" for a, b in zip(ls, lo) if a != b),
                "tail rows differ",
            )
            problems.append(f"valuehash {sh} != {oh}; first diff: {diff}")
    return problems
