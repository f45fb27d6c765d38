#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir
written by graft.Verify, run the matching oracle SQL in DuckDB over the
same sf directory and compare rows/schema/values (columns sorted by
name, rows sorted by all columns).

Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa


def fetch_exact(cursor) -> pd.DataFrame:
    """Fetch via Arrow, rendering DECIMAL columns as exact digit
    strings instead of letting pandas collapse them to lossy float64
    (the r15 blind spot: >int64 DECIMAL(38,0) values looked equal in
    float64 but hashed differently at the driver). Also flags any wide
    decimal surviving to a final schema — those are banned (cast to
    string or rescale into BIGINT at the query edge)."""
    tbl = cursor.arrow()
    if isinstance(tbl, pa.RecordBatchReader):
        tbl = tbl.read_all()
    cols = []
    for i, field in enumerate(tbl.schema):
        col = tbl.column(i)
        if pa.types.is_decimal(field.type):
            if field.type.precision > 18:
                # exact digit-string compare for the dangerous class
                print(f"  [WIDE DECIMAL] column '{field.name}' is "
                      f"{field.type} in a FINAL schema — driver hash "
                      "hazard; cast to string on both engines")
                col = col.cast(pa.string())
            elif field.type.precision > 15:
                # 16-18 significant digits exceed float64's 2^53 exact
                # integer range — two DIFFERENT values can collide in
                # float64 and fake a PASS (ADVICE r16). Digit strings,
                # canonicalized so engine scale differences (1.50 vs
                # 1.500) don't fake a FAIL.
                col = pa.compute.cast(col, pa.string())
                # strip trailing FRACTIONAL zeros only (guard: a bare
                # integer like "1500" must stay intact), then a bare dot
                col = pa.compute.replace_substring_regex(
                    col, r"^(-?\d+\.\d*?)0+$", r"\1")
                col = pa.compute.replace_substring_regex(
                    col, r"\.$", "")
            else:
                # <=15-digit decimals stay float64 (exact there; scale
                # formatting may differ engine-to-engine)
                col = col.cast(pa.float64())
        cols.append(col)
    return pa.table(dict(zip(tbl.schema.names, cols))).to_pandas()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = fetch_exact(con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'"))
        if name not in oracle:
            results[name] = f"rows_only rows={len(spark_df)}" + (
                " EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = fetch_exact(con.execute(oracle[name]))
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:160]}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        dtype_diff = [(c, str(a[c].dtype), str(b[c].dtype))
                      for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
        if dtype_diff:
            # surface but don't fail: the driver may or may not compare
            # dtypes this strictly
            print(f"  [dtype note] {name}: {dtype_diff}")
        if len(a) != len(b):
            results[name] = f"ROWS_MISMATCH spark={len(a)} duck={len(b)}"
            continue
        # value compare with exact equality (dtype-coerced)
        mism = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.astype(object).where(pd.notna(av), None) ==
                      bv.astype(object).where(pd.notna(bv), None))
                bad = int((~eq).sum())
            except Exception as e:
                bad = -1
            if bad:
                mism.append((c, bad))
        if mism:
            results[name] = f"VALUE_MISMATCH {mism}"
            # show a sample diff for first bad column
            c = mism[0][0]
            neq = a[c].astype(object) != b[c].astype(object)
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  {name}.{c}[{i}]: spark={a[c][i]!r} duck={b[c][i]!r}")
        else:
            results[name] = f"OK rows={len(a)}"
    # An oracle key with NO dump dir means the query THREW inside
    # graft.Verify (it catches per-query and keeps going) — that must
    # fail this gate loudly, not shrink the denominator silently.
    missing = sorted(set(oracle) - set(results))
    for name in missing:
        results[name] = "MISSING_DUMP (query failed in Verify — " \
            "see its stderr)"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    ro = sum(1 for v in results.values() if v.startswith("rows_only"))
    for k, v in results.items():
        print(f"{k:26s} {v}")
    print(f"\n{ok} OK / {len(results) - ro} oracled, {ro} rows-only")
    return 0 if ok == len(results) - ro else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
