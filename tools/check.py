#!/usr/bin/env python3
"""Dev-only local replica of the driver's t2 correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB against
views named after the testdata tables, and compares with the parquet
Verify wrote: columns sorted by name, exact value equality (our
determinism contract is bit-exact), both in produced order and as
sorted multisets.

Usage: python3 tools/check.py [sfDir] [verifyOut]
"""
import duckdb, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"  # NaN != NaN would fail identical rows
    return v


def rows_of(df):
    cols = sorted(df.columns)
    df = df[cols]
    return cols, [tuple(norm_cell(c) for c in row) for row in df.itertuples(index=False)]


def cmp_rows(a, b):
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return f"row {i}: {ra} vs {rb}"
    return None


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        try:
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            want = con.sql(oracle[name]).df()
            gc, gr = rows_of(got)
            wc, wr = rows_of(want)
            if gc != wc:
                print(f"FAIL {name}: schema {gc} vs {wc}")
                continue
            err = cmp_rows(gr, wr)
            if err:
                err_sorted = cmp_rows(sorted(gr, key=repr), sorted(wr, key=repr))
                tag = "ordered-only" if err_sorted is None else "value"
                print(f"FAIL {name} ({tag}): {err}")
                continue
            print(f"ok   {name} ({len(gr)} rows)")
            n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
    print(f"== {n_ok}/{len(oracle)} oracled queries match ==")
    sys.exit(0 if n_ok == len(oracle) else 1)


if __name__ == "__main__":
    main()
