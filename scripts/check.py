#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against its DuckDB oracle (columns sorted by name, rows sorted,
exact cell compare; float mismatches reported with max abs diff).

STRICT on representation: an oracle column whose pandas dtype is float
while the Spark dump is integer (DuckDB promotes sum(INTEGER) to
HUGEINT -> pandas float64) is a FAIL even when the values compare equal,
because the driver's hash gate compares string renderings ("3.0" != "3").
This is exactly the class that made q_media_features / q_image_features /
q_session_threads driver-red while judge-green in round 5.

Emits <outDir>/check_report.json: per-query status, per-column dtypes on
both sides, and on any mismatch the first differing (row, column,
spark_value, oracle_value) triple — so a red row ships its own diagnosis.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import duckdb, glob, json, math, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
report = {}
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    rec = {"status": "pass", "rows": None, "dtypes_oracle": {},
           "dtypes_spark": {}, "first_diff": None, "detail": None}
    report[name] = rec
    try:
        exp = con.sql(sql).df()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            rec.update(status="fail", detail="no spark output")
            n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        rec["dtypes_oracle"] = {c: str(exp[c].dtype) for c in exp.columns}
        rec["dtypes_spark"] = {c: str(got[c].dtype) for c in got.columns}
        if list(exp.columns) != list(got.columns):
            msg = f"columns exp={list(exp.columns)} got={list(got.columns)}"
            print(f"FAIL {name}: {msg}")
            rec.update(status="fail", detail=msg); n_fail += 1; continue
        if len(exp) != len(got):
            msg = f"rows exp={len(exp)} got={len(got)}"
            print(f"FAIL {name}: {msg}")
            rec.update(status="fail", detail=msg); n_fail += 1; continue
        rec["rows"] = len(exp)
        exp = exp.sort_values(by=list(exp.columns), kind="mergesort").reset_index(drop=True)
        got = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            # representation strictness: int-on-one-side, float-on-the-other
            # hashes differently in the driver gate even when values match.
            if (e.dtype.kind == "f") != (g.dtype.kind == "f") and \
               {e.dtype.kind, g.dtype.kind} <= {"i", "u", "f"}:
                bad.append(f"{c}: dtype mismatch oracle={e.dtype} spark={g.dtype}"
                           " (HUGEINT promotion? cast the oracle ::BIGINT)")
                if rec["first_diff"] is None:
                    rec["first_diff"] = {"row": 0, "col": c,
                                         "spark": f"dtype {g.dtype}",
                                         "oracle": f"dtype {e.dtype}"}
                continue
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                diffs = [(i, x, y) for i, (x, y) in enumerate(zip(e, g))
                         if not ((isinstance(x, float) and isinstance(y, float)
                                  and math.isnan(x) and math.isnan(y)) or x == y)]
                if diffs:
                    mx = max((abs(x - y) for _, x, y in diffs
                              if not (math.isnan(x) or math.isnan(y))),
                             default=float("nan"))
                    i0, x0, y0 = diffs[0]
                    bad.append(f"{c}: {len(diffs)} cells differ, maxabs={mx:.3e}"
                               f" e.g. row {i0} oracle={x0!r} spark={y0!r}")
                    if rec["first_diff"] is None:
                        rec["first_diff"] = {"row": int(i0), "col": c,
                                             "spark": repr(y0), "oracle": repr(x0)}
            else:
                neq = e.astype(str) != g.astype(str)
                if neq.any():
                    i = int(neq.idxmax())
                    bad.append(f"{c}: {neq.sum()} cells differ"
                               f" e.g. row {i} oracle={e[i]!r} spark={g[i]!r}")
                    if rec["first_diff"] is None:
                        rec["first_diff"] = {"row": i, "col": c,
                                             "spark": repr(g[i]), "oracle": repr(e[i])}
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            rec.update(status="fail", detail="; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
    except Exception as ex:
        msg = f"{type(ex).__name__}: {ex}"
        print(f"FAIL {name}: {msg}")
        rec.update(status="fail", detail=msg); n_fail += 1

with open(f"{outdir}/check_report.json", "w") as f:
    json.dump(report, f, indent=1, default=str)
print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total"
      f" (report: {outdir}/check_report.json)")
sys.exit(1 if n_fail else 0)
