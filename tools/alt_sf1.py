#!/usr/bin/env python3
"""Alternate EXACT sf1 checks for the oracles whose DuckDB replay is
super-linear or over the temp budget at sf1 (oracle-side ceilings, not
engine ones — see BENCH_NOTES "Round 8: full-surface sf1 correctness
gate").

  d_shingle_jaccard: ScaleUp's per-replica vocabulary bijection preserves
  shingle sets within a replica and shares no shingle across replicas, so
  the exact sf1 truth is the DuckDB sf0.1 truth x FACTOR replicas with
  every doc column shifted by r * docStep (10^4). Compare all rows.

  em_cosine_neardup: the gate's corpus plants every pair (i, i+10^6) by
  construction and random 64-dim vectors never reach cosine 0.95, so the
  exact sf1 truth is the full planted set over all sf1 vectors at
  sim_micro exactly 10^6.

  em_semdedup_approx: same planted-set truth plus the fixed-K contract.

  em_ivfpq_residual: the composed residual replay spills >70 GB of DuckDB
  temp at sf1 — the OUTPUT is validated exactly instead (distances
  recomputed from raw embeddings, dense rank order, TOPK per query).

Each section runs only if its Spark output exists under <verifyOutDir>,
so the script works against both full and filtered Verify dumps.

Usage: python3 tools/alt_sf1.py <sf01Dir> <sf1Dir> <verifyOutDir> [factor]
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pds
import pandas as pd

sf01, sf1, out = sys.argv[1], sys.argv[2], sys.argv[3]
factor = int(sys.argv[4]) if len(sys.argv) > 4 else 10
DOC_STEP = 10_000

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = True

def spark_out(name):
    return pq.read_table(glob.glob(f"{out}/{name}/*.parquet")[0]).to_pandas()

def has_out(name):
    return bool(glob.glob(f"{out}/{name}/*.parquet"))

emb_ids = None
def load_emb_ids():
    global emb_ids
    if emb_ids is None:
        emb_ids = pd.Series(sorted(
            pds.dataset(f"{sf1}/embeddings.parquet").to_table(columns=["vec_id"])
               .to_pandas()["vec_id"]))
    return emb_ids

# ---- d_shingle_jaccard ----
if has_out("d_shingle_jaccard"):
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
if has_out("em_cosine_neardup"):
    got = spark_out("em_cosine_neardup").sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    ids = load_emb_ids()
    planted = pd.DataFrame({
        "vec_a": ids, "vec_b": ids + 1_000_000,
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
# Planted-set truth (identical vectors share the argmin cluster and every
# band bucket, random vectors never reach 0.95), plus the fixed-K
# contract: every cluster id < 64. The cluster column itself is
# engine-internal (depends on seed ranks), so it is range-checked, and the
# value columns are compared exactly.
if has_out("em_semdedup_approx"):
    got = spark_out("em_semdedup_approx").sort_values(["drop_id"]).reset_index(drop=True)
    ids = load_emb_ids()
    planted = pd.DataFrame({
        "keep_id": ids, "drop_id": ids + 1_000_000,
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

# ---- em_ivfpq_residual ----
# Output validated exactly against the raw embeddings: every returned
# d2_micro must equal the true micro-quantized L2 of its (qid, vec_id)
# pair, ranks must be the dense (d2_micro asc, vec_id asc) order within
# qid, exactly TOPK rows per qid, no self-matches. (The probe/shortlist
# structure is replayed in full at sf0.01/sf0.1 where the oracle fits.)
# em_ivfpq_residual_filtered (r17: same spill ceiling as its siblings)
# additionally asserts the metadata predicate: every returned candidate
# carries label % 3 = 0.
for name in ("em_ivfpq_residual", "em_ivfpq_residual_persisted",
              "em_ivfpq_residual_append", "em_ivfpq_residual_filtered"):
  if has_out(name):
    got = spark_out(name)
    con1 = duckdb.connect()
    import os
    ep = f"{sf1}/embeddings.parquet"
    if os.path.isdir(ep):  # Spark-written table: a dir of part files
        ep = f"{ep}/*.parquet"
    con1.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{ep}')")
    con1.register("got", got)
    bad_d2 = con1.execute("""
      WITH e2 AS (SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                  FROM embeddings)
      SELECT count(*) FROM got g
        JOIN e2 q ON q.vec_id = g.qid JOIN e2 x ON x.vec_id = g.vec_id
      WHERE g.d2_micro <> CAST(floor(list_reduce(
              list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(generate_series(1, 64),
                  i -> (q.emb[i] - x.emb[i]) * (q.emb[i] - x.emb[i]))),
              (a, x) -> a + x) * 1000000.0 + 0.5) AS BIGINT)
         OR g.qid = g.vec_id""").fetchone()[0]
    bad_pred = 0
    if name == "em_ivfpq_residual_filtered":
        bad_pred = con1.execute("""
          SELECT count(*) FROM got g JOIN embeddings e ON e.vec_id = g.vec_id
          WHERE e.label % 3 <> 0""").fetchone()[0]
    g = got.sort_values(["qid", "d2_micro", "vec_id"]).reset_index(drop=True)
    rank_ok = (g.groupby("qid").cumcount() + 1 == g["rn"]).all()
    per_q = got.groupby("qid").size()
    if bad_d2 or bad_pred or not rank_ok or not (per_q == 5).all():
        ok = False
        print(f"FAIL {name}: {bad_d2} wrong distances, {bad_pred} predicate "
              f"violations, rank_ok={rank_ok}, "
              f"per-qid sizes {sorted(per_q.unique())}")
    else:
        print(f"PASS {name}: all {len(got)} output distances exact, "
              f"dense (d2, vec_id) ranks, TOPK rows per query")

sys.exit(0 if ok else 1)
