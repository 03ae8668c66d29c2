#!/usr/bin/env python3
"""Alternate EXACT sf1 checks for the two oracles whose DuckDB replay is
super-linear (oracle-side ceiling, not an engine one — see BENCH_NOTES
"Round 8: full-surface sf1 correctness gate").

  d_shingle_jaccard: ScaleUp's per-replica vocabulary bijection preserves
  shingle sets within a replica and shares no shingle across replicas, so
  the exact sf1 truth is the DuckDB sf0.1 truth x FACTOR replicas with
  every doc column shifted by r * docStep (10^4). Compare all rows.

  em_cosine_neardup: the gate's corpus plants every pair (i, i+10^6) by
  construction and random 64-dim vectors never reach cosine 0.95, so the
  exact sf1 truth is the full planted set over all sf1 vectors at
  sim_micro exactly 10^6.

Usage: python3 tools/alt_sf1.py <sf01Dir> <sf1Dir> <verifyOutDir> [factor]
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf01, sf1, out = sys.argv[1], sys.argv[2], sys.argv[3]
factor = int(sys.argv[4]) if len(sys.argv) > 4 else 10
DOC_STEP = 10_000

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = True

def spark_out(name):
    return pq.read_table(glob.glob(f"{out}/{name}/*.parquet")[0]).to_pandas()

# ---- d_shingle_jaccard ----
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf01}/documents.parquet')")
truth01 = con.execute(oracle["d_shingle_jaccard"]).fetchdf()
reps = []
for r in range(factor):
    t = truth01.copy()
    for c in t.columns:
        if c.startswith("doc_"):
            t[c] = t[c] + r * DOC_STEP
    reps.append(t)
truth = pd.concat(reps, ignore_index=True)
got = spark_out("d_shingle_jaccard")
cols = sorted(truth.columns)
truth = truth[cols].sort_values(cols).reset_index(drop=True)
got = got[cols].sort_values(cols).reset_index(drop=True)
if len(truth) != len(got) or not truth.equals(got.astype(truth.dtypes.to_dict())):
    ok = False
    print(f"FAIL d_shingle_jaccard: {len(got)} rows vs {len(truth)} expected")
else:
    print(f"PASS d_shingle_jaccard: {len(got)} rows == sf0.1 truth x {factor} shifted replicas")

# ---- em_cosine_neardup ----
import pyarrow.dataset as pds
got = spark_out("em_cosine_neardup").sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
emb_ids = pd.Series(sorted(
    pds.dataset(f"{sf1}/embeddings.parquet").to_table(columns=["vec_id"])
       .to_pandas()["vec_id"]))
planted = pd.DataFrame({
    "vec_a": emb_ids, "vec_b": emb_ids + 1_000_000,
    "sim_micro": 1_000_000}).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
if len(got) != len(planted) or not (
        got["vec_a"].values == planted["vec_a"].values).all() or not (
        got["vec_b"].values == planted["vec_b"].values).all() or not (
        got["sim_micro"].values == planted["sim_micro"].values).all():
    ok = False
    extra = len(got) - len(planted)
    print(f"FAIL em_cosine_neardup: {len(got)} rows vs {len(planted)} planted ({extra:+d})")
else:
    print(f"PASS em_cosine_neardup: exactly the {len(planted)} planted pairs, recall 1.0, all sim 10^6")

# ---- em_semdedup_approx ----
# Same planted-set truth (identical vectors share the argmin cluster and
# every band bucket, random vectors never reach 0.95), plus the fixed-K
# contract: every cluster id < 64. The cluster column itself is
# engine-internal (depends on seed ranks), so it is range-checked, and the
# value columns are compared exactly.
got = spark_out("em_semdedup_approx").sort_values(["drop_id"]).reset_index(drop=True)
planted = pd.DataFrame({
    "keep_id": emb_ids, "drop_id": emb_ids + 1_000_000,
    "best_sim_micro": 1_000_000}).sort_values(["drop_id"]).reset_index(drop=True)
if len(got) != len(planted) or not (
        got["keep_id"].values == planted["keep_id"].values).all() or not (
        got["drop_id"].values == planted["drop_id"].values).all() or not (
        got["best_sim_micro"].values == planted["best_sim_micro"].values).all() or not (
        (got["cluster"].values >= 0) & (got["cluster"].values < 64)).all():
    ok = False
    extra = len(got) - len(planted)
    print(f"FAIL em_semdedup_approx: {len(got)} rows vs {len(planted)} planted ({extra:+d})")
else:
    print(f"PASS em_semdedup_approx: exactly the {len(planted)} planted pairs, recall 1.0, clusters < 64")

sys.exit(0 if ok else 1)
