#!/usr/bin/env python3
"""Derive the crawl-storm corpus (the CORRECTNESS_SCALE leg) from an sf
dir — persisted so the duplication-regime gate is reproducible instead
of an ad-hoc derivation:

  - documents: every doc with doc_id % 10 == 0 duplicated x10 at
    disjoint id offsets (the 10%-storm-pages mix that keeps the docFreq
    caps binding without degenerating the whole text family);
  - embeddings: unioned x10 wholesale at disjoint vec_id offsets (every
    vector becomes a 10-copy blob — the LSH bucket-storm regime);
  - events: unioned x10 with offset event_ids and IDENTICAL payloads
    (ts/type/value/props) — the series-family duplication-insensitivity
    leg (round-13 verdict ask #7): resample/ffill/EWM/FSM outputs must
    not move when exact duplicate observations arrive;
  - all other tables copied verbatim.

Both engines then read the SAME derived parquet, so the gate tests the
queries, not the derivation.

Usage: python3 scripts/storm_gen.py <sfDir> <outDir>
"""
import duckdb, os, shutil, sys

sf, out = sys.argv[1], sys.argv[2]
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

n_doc = con.sql(f"SELECT max(doc_id) + 1 FROM '{sf}/documents.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT * FROM '{sf}/documents.parquet'
  UNION ALL
  SELECT doc_id + {n_doc} * (k + 1) AS doc_id, text, lang, source, n_chars
  FROM '{sf}/documents.parquet', range(9) AS r(k)
  WHERE doc_id % 10 = 0
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

n_vec = con.sql(f"SELECT max(vec_id) + 1 FROM '{sf}/embeddings.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT * FROM '{sf}/embeddings.parquet'
  UNION ALL
  SELECT vec_id + {n_vec} * (k + 1) AS vec_id, embedding, label
  FROM '{sf}/embeddings.parquet', range(9) AS r(k)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

n_ev = con.sql(f"SELECT max(event_id) + 1 FROM '{sf}/events.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT * FROM '{sf}/events.parquet'
  UNION ALL
  SELECT event_id + {n_ev} * (k + 1) AS event_id, ts, user_id, event_type,
         value, props
  FROM '{sf}/events.parquet', range(9) AS r(k)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    src = f"{sf}/{t}.parquet"
    if os.path.exists(src):
        shutil.copyfile(src, f"{out}/{t}.parquet")

for t in ["documents", "embeddings", "events"]:
    c = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {c} rows")
