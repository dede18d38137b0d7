#!/usr/bin/env python
"""Generate a larger-SF stress fixture by replicating the driver's
sf0.1 testdata with key-shifted copies (default ×10 ≈ sf1.0).

The driver's own testdata is read-only and tops out at sf0.1; this
builds `.localdata/sf1.0/` (gitignored) so the full oracle sweep can be
run at 10× data — the cheapest way to surface operators whose fan-out
(rolling_median explode, dau_wau ×7, LSH collision volume) or
driver-enumerated dimensions misbehave as data grows. Correctness
comparisons stay meaningful because Spark AND DuckDB read the same
generated files.

Replication rules (copy i of K):
- fact tables get disjoint key ranges: ``event_id/doc_id/vec_id/
  o_orderkey/l_orderkey += i * stride`` (stride = max key + 1), so
  uniqueness and the orders⋈lineitem FK are preserved;
- every other column is copied verbatim — timestamps keep their range
  (week/watermark assumptions unchanged), users/dims keep their
  cardinality (density grows, the realistic scale direction);
- dimension tables (region nation customer supplier part) are copied
  once, as at real scale-ups.

Exact duplicates across copies are a feature for the dedup family:
every document gains K-1 exact clones, so LSH/SimHash candidate volume
grows ~K²/2 per group — precisely the stress the banded designs must
absorb without going all-pairs.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_ONCE = ["region", "nation", "customer", "supplier", "part"]
#: fact table -> key columns to shift; tables sharing a stride name
#: shift together to keep FKs intact
SCALED = {
    "events": (["event_id"], "events"),
    "documents": (["doc_id"], "documents"),
    "embeddings": (["vec_id"], "embeddings"),
    "orders": (["o_orderkey"], "orderkey"),
    "lineitem": (["l_orderkey"], "orderkey"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".localdata/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset to generate (default: all); used "
        "for the x100 quadratic-family fixture where only documents/"
        "embeddings are needed",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    dst = Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)

    for name in COPY_ONCE:
        if only is not None and name not in only:
            continue
        t = pq.read_table(f"{args.src}/{name}.parquet")
        pq.write_table(t, dst / f"{name}.parquet")
        print(f"{name:12s} {t.num_rows:9d} rows (copied)")

    # shared strides so orders.o_orderkey and lineitem.l_orderkey shift
    # in lockstep
    strides: dict[str, int] = {}
    for name, (keys, stride_name) in SCALED.items():
        if only is not None and name not in only:
            continue
        t = pq.read_table(f"{args.src}/{name}.parquet")
        m = max(
            pc.max(t.column(k)).as_py() for k in keys
        )
        strides[stride_name] = max(strides.get(stride_name, 0), int(m) + 1)

    for name, (keys, stride_name) in SCALED.items():
        if only is not None and name not in only:
            continue
        t = pq.read_table(f"{args.src}/{name}.parquet")
        stride = strides[stride_name]
        copies = []
        for i in range(args.copies):
            c = t
            for k in keys:
                idx = c.schema.get_field_index(k)
                shifted = pc.add(c.column(k), pa.scalar(i * stride, pa.int64()))
                c = c.set_column(idx, c.schema.field(k), shifted.cast(c.schema.field(k).type))
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, dst / f"{name}.parquet")
        print(f"{name:12s} {out.num_rows:9d} rows (x{args.copies}, stride {stride})")

    total_mb = sum(
        os.path.getsize(dst / f) for f in os.listdir(dst)
    ) / 1e6
    print(f"wrote {dst} ({total_mb:.0f} MB)")


if __name__ == "__main__":
    main()
