#!/usr/bin/env python3
"""Build a ~sf1 stress slice by replicating the sf0.1 tables 10x with
key offsets, for the one-off scale smoke recorded in SCALE.md.

The data goes to /tmp (never committed): this checks that the heavy
queries scale ~linearly between sf0.1 and sf1 under AQE — catching
anything accidentally quadratic — not that their answers are pretty.
Replication keeps every distribution except uniqueness: texts and
embeddings repeat 10x verbatim (each replica offsets its ids), which
is itself a useful stress for the dedup/LSH buckets (10x hotter keys
than the generator ever makes, pushing against the maxBucket guards).

Key offsets keep id spaces disjoint per replica and BELOW the 1e6
PlantOffset used by the planted-near-dup queries. Join keys that must
keep their cross-table relationships (orderkey) are offset on both
sides; dimension keys (partkey/suppkey/custkey) stay unchanged so RI
joins still match.

Usage: make_sf1.py [src_dir] [dst_dir]   (defaults: /root/testdata/sf0.1 /tmp/sf1)
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10

# table -> {column: per-replica offset}
OFFSETS = {
    "documents": {"doc_id": 10_000},
    # label offsets too: semdedup's within-cluster all-pairs stage is
    # quadratic in CLUSTER size by design, and the k that assigns
    # labels grows with N precisely so cluster size stays flat — a
    # replica keeping its own label space models that (10x data, 10x
    # clusters, unchanged cluster size), where shared labels would
    # model the misconfiguration (10x cluster size -> 100x pairs).
    "embeddings": {"vec_id": 10_000, "label": 100},
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "orders": {"o_orderkey": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    # pure dimensions: copied once, not replicated (joins stay valid)
    "region": None, "nation": None, "customer": None,
    "supplier": None, "part": None,
}


def main(src: str, dst: str) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    for table, offsets in OFFSETS.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        if offsets is None:
            pq.write_table(t, f"{dst}/{table}.parquet")
            print(f"{table}: copied {t.num_rows} rows")
            continue
        # The offsets are sized to CURRENT table key ranges; if the
        # source tables are ever regenerated larger, replica id ranges
        # would silently overlap and corrupt the smoke's dedup/join
        # behavior — fail loudly instead.
        for name, off in offsets.items():
            mm = pc.min_max(t.column(name))
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            assert 0 <= mn and mx < off, (
                f"{table}.{name}: id range [{mn}, {mx}] not within "
                f"[0, {off}); replicas would overlap — raise the offset")
        parts = []
        for i in range(REPLICAS):
            cols = []
            for name in t.column_names:
                col = t.column(name)
                if name in offsets and i > 0:
                    col = pc.add(col, pa.scalar(i * offsets[name],
                                                type=col.type))
                cols.append(col)
            parts.append(pa.table(cols, names=t.column_names))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    main(src, dst)
