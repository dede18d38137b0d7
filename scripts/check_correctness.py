#!/usr/bin/env python
"""Local replica of the round driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and TWO order-insensitive value hashes:

- **raw mode** — per-value ``canon()`` on raw fetched rows (the
  original local gate);
- **pandas mode** — both sides converted to pandas
  (``toPandas()`` / ``fetchdf()``), columns sorted, ``sort_values``
  over all columns, sha256 of ``to_csv``. This mirrors the round
  driver's canonicalizer and catches what raw mode cannot: DuckDB
  HUGEINT output (windowed integer SUMs) arrives as float64 and
  renders ``5.0`` vs Spark's ``5``, and array-typed cells crash
  ``sort_values`` exactly as they crash the driver.

Any red row here will be red in CORRECTNESS_r{N}.json — run this
before committing registry changes.

``--describe`` additionally DESCRIBEs every oracle in DuckDB and
flags output columns typed HUGEINT or ``[]``/STRUCT/MAP — the two
classes the driver harness cannot canonicalize.

Usage: python scripts/check_correctness.py [--sf DIR] [--only name,...]
                                           [--describe] [--no-pandas]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BAD_ORACLE_TYPES = ("HUGEINT", "[]", "STRUCT", "MAP")


def describe_sweep(con, oracles: dict[str, str]) -> int:
    """Flag oracle output types the driver's pandas canonicalizer
    mangles (HUGEINT → float64) or crashes on (nested types)."""
    bad = 0
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"DESCRIBE-FAIL {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        for col, typ, *_ in rows:
            if any(t in typ.upper() for t in BAD_ORACLE_TYPES):
                print(f"BAD-TYPE {name}.{col}: {typ}")
                bad += 1
    return bad


def pandas_canon_hash(pdf) -> str:
    """Driver-mirroring canonical hash: sorted columns, sort_values
    over all columns, sha256 of the CSV rendering. Raises TypeError on
    unsortable cells (arrays) — the same failure the driver reports."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]


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


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--describe", action="store_true")
    ap.add_argument("--no-pandas", action="store_true")
    ap.add_argument(
        "--py-oracles", action="store_true",
        help="substitute oracle_py() Python-replay oracles where "
             "registered (stress SFs where the SQL oracle is "
             "impractically slow); results are marked oracle='py'")
    ap.add_argument("--json", default=None, help="write per-query results to this JSON file")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from real_time_stock_market_data_pipeline__spark.session import get_spark

    con = duckdb.connect()
    # Cap DuckDB's worker-thread fan-out: the checker shares a process
    # with a 32-thread Spark JVM (plus streaming-query thread churn),
    # and DuckDB spawning one thread per core on top of that has been
    # observed to trip transient allocation failures (surfacing as
    # OutOfMemoryException / jemalloc EAGAIN) right after heavy Spark
    # activity. 8 threads is plenty for the oracle SQL.
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    py_oracles = (
        entrymod.oracle_py() if args.py_oracles
        and hasattr(entrymod, "oracle_py") else {}
    )

    if args.describe:
        n_bad = describe_sweep(con, oracles)
        print(f"describe sweep: {n_bad} bad oracle output columns")
        if n_bad:
            return 1

    spark = get_spark("check-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_skipped = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Engine vs oracle time are recorded SEPARATELY (round-9
        # verdict ask #2): at stress SFs some oracles deliberately
        # replay an uncollapsed quadratic single-node definition, so a
        # merged `sec` misreads oracle cost as engine cost. spark_sec
        # also absorbs the pandas leg's toPandas() re-execution;
        # oracle_sec absorbs the pandas leg's oracle re-execution.
        t0 = time.time()
        spark_sec = oracle_sec = 0.0
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {"status": "fail",
                             "problems": [f"spark error: {type(e).__name__}"],
                             "sec": round(time.time() - t0, 2)}
            continue
        spark_sec = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle, rows-only)")
            n_pass += 1
            results[name] = {"status": "rows_only", "rows": len(srows),
                             "sec": round(time.time() - t0, 2),
                             "spark_sec": round(spark_sec, 2)}
            continue
        oracle_kind = "py" if name in py_oracles else "sql"
        opdf = None
        t_oracle = time.time()
        try:
            if oracle_kind == "py":
                opdf = py_oracles[name](con)
                ocols = list(opdf.columns)
                orows = [
                    tuple(r)
                    for r in opdf.itertuples(index=False, name=None)
                ]
            else:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {"status": "fail",
                             "problems": [f"duckdb error: {type(e).__name__}"],
                             "sec": round(time.time() - t0, 2)}
            continue
        oracle_sec = time.time() - t_oracle
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"valuehash spark={sh} duck={oh}")
                # show first differing line for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"      first diff:\n      spark: {a}\n      duck : {b}")
                        break
        pandas_leg = None
        if not problems and not args.no_pandas:
            # driver-mirroring pandas canonicalization
            try:
                t_sp = time.time()
                spdf = sdf.toPandas()
                spark_sec += time.time() - t_sp
                sph = pandas_canon_hash(spdf)
                t_op = time.time()
                opdf2 = (opdf if opdf is not None
                         else con.execute(oracles[name]).df())
                oracle_sec += time.time() - t_op
                oph = pandas_canon_hash(opdf2)
            except Exception as e:
                # the pandas leg RE-EXECUTES the oracle; at stress SFs a
                # heavy oracle (recursive-CTE pagerank at 1M events) can
                # exhaust DuckDB's memory on the second run. The raw
                # value-hash above already compared equal, so resource
                # exhaustion of the ORACLE is not an engine mismatch —
                # record it distinctly instead of as a failure.
                if "OutOfMemory" in type(e).__name__ or "OutOfMemory" in str(e):
                    print(f"      note {name}: pandas leg skipped "
                          f"(oracle re-execution OOM; raw hash already equal)"
                          f"\n      detail: {type(e).__name__}: "
                          f"{str(e)[:300]}")
                    pandas_leg = "skipped_oom"
                    n_skipped += 1
                else:
                    problems.append(
                        f"pandas-canon err: {type(e).__name__}: {e}"
                    )
            else:
                if sph != oph:
                    problems.append(f"pandas-hash spark={sph} duck={oph}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
            results[name] = {"status": "fail", "problems": problems,
                             "rows": len(srows), "sec": round(dt, 2)}
        else:
            print(f"PASS  {name}: {len(srows)} rows, {dt:.1f}s "
                  f"(spark {spark_sec:.1f}s / oracle {oracle_sec:.1f}s)")
            n_pass += 1
            results[name] = {"status": "pass", "rows": len(srows),
                             "sec": round(dt, 2),
                             "spark_sec": round(spark_sec, 2),
                             "oracle_sec": round(oracle_sec, 2)}
            if pandas_leg is not None:
                results[name]["pandas_leg"] = pandas_leg
            if oracle_kind != "sql":
                results[name]["oracle"] = oracle_kind
    print(f"\n{n_pass} pass / {n_fail} fail"
          + (f" ({n_skipped} pandas-leg skips)" if n_skipped else ""))
    if args.json:
        import json

        Path(args.json).write_text(json.dumps(
            {"sf_dir": args.sf, "n_pass": n_pass, "n_fail": n_fail,
             "n_skipped": n_skipped, "queries": results}, indent=1))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
