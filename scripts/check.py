#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against its DuckDB oracle (columns sorted by name, rows sorted,
exact cell compare; float mismatches reported with max abs diff).

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import duckdb, glob, json, math, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.sql(sql).df()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); n_fail += 1; continue
        exp = exp.sort_values(by=list(exp.columns), kind="mergesort").reset_index(drop=True)
        got = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                diffs = [(x, y) for x, y in zip(e, g)
                         if not ((isinstance(x, float) and isinstance(y, float)
                                  and math.isnan(x) and math.isnan(y)) or x == y)]
                if diffs:
                    mx = max((abs(x - y) for x, y in diffs
                              if not (math.isnan(x) or math.isnan(y))),
                             default=float("nan"))
                    bad.append(f"{c}: {len(diffs)} cells differ, maxabs={mx:.3e} e.g. {diffs[0]}")
            else:
                neq = e.astype(str) != g.astype(str)
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c}: {neq.sum()} cells differ e.g. exp={e[i]!r} got={g[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}"); n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
