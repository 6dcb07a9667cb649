#!/usr/bin/env python3
"""Assemble CORRECTNESS_SCALE.json from a storm-corpus check run:
run scripts/storm_gen.py, then graft.Verify at the storm dir with the
gate query subset, then scripts/check.py, then this.

Usage: python3 scripts/scale_gate.py <checkReport.json> <outPath>
"""
import json, sys

report = json.load(open(sys.argv[1]))
out = {
    "metric": "scale_correctness",
    "derivation": ("crawl re-visit storm (scripts/storm_gen.py): sf0.1 "
        "documents with doc_id%10==0 duplicated x10 at disjoint id offsets "
        "(9,500 docs, 10% storm pages); embeddings unioned x10 wholesale "
        "(20,000 vectors); events unioned x10 with offset event_ids and "
        "identical payloads (1,000,000 rows - the series-family "
        "duplication-insensitivity leg). Both engines read the SAME derived "
        "parquet, so the gate tests the queries, not the derivation."),
    "note": ("capped gate twins stay cell-exact in the regime their caps "
        "bind; the series rows (resample/ffill, EWM, z-score FSM) pin that "
        "exact-duplicate observations do not move bucketed/FSM outputs. "
        "A WHOLESALE x10 document duplication degenerates the text family "
        "to empty agreement (every shingle crosses the global cap) - the "
        "mixed storm keeps the caps binding with non-trivial outputs. "
        "Round 14 also measured the series rows cell-IDENTICAL to their "
        "clean-sf0.1 outputs (true duplication-insensitivity)."),
    "queries": report,
}
with open(sys.argv[2], "w") as f:
    json.dump(out, f)
    f.write("\n")
n_pass = sum(1 for v in report.values() if v.get("status") == "pass")
print(f"{n_pass}/{len(report)} pass -> {sys.argv[2]}")
