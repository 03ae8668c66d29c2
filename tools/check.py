#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir (Spark parquet result), runs the
matching SQL from oracle_sql.json in DuckDB against the raw parquet
tables of sfDir, sorts columns by name and rows by all columns, and
compares value-by-value (exact, like a hash match).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# cap DuckDB's buffer at a fraction of RAM so an unexpectedly heavy oracle
# spills to .tmp instead of OOM-killing the whole compare (r17: the
# em_ivfpq_residual_filtered sf1 replay ballooned past the default 80%-of-RAM
# limit and took the process down mid-sweep; the documented-ceiling gates are
# CHECK_SKIPped, this guard is for the next surprise)
con.execute(f"SET memory_limit='{os.environ.get('CHECK_MEM', '24GB')}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table (e.g. ScaleUp output): a dir of part files
        p = f"{p}/*.parquet"
    if glob.glob(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        if t == "events":
            # ScaleUp output is Spark-written: Spark reads the driver's
            # TIMESTAMP(NANOS) ts as long ns (nanosAsLong) and can only
            # write it back as BIGINT. DuckDB v1.0.0 reads the driver's
            # NANOS column as a microsecond TIMESTAMP (truncating), and
            # every oracle is written against that reading — reproduce it
            # exactly so the epoch_us(ts) oracles bind at any scale.
            (ty,) = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if ty == "BIGINT":
                con.execute("CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array cells (numpy arrays/lists) are unhashable and break sort_values;
    # convert to tuples so array-valued columns can participate in the
    # canonical row order (the compare itself already handles them)
    for c in df.columns:
        # detect via ANY non-null value, not just row 0 — a column whose
        # first row is None but holds arrays later must still be converted
        if len(df) and df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
skip = set(os.environ.get("CHECK_SKIP", "").split(",")) - {""}

# Registry = the manifest Verify writes before running anything (so crashed
# queries surface as err rows, not absence — VERDICT r8 #5); fall back to
# the output dirs for pre-manifest dumps.
manifest_path = f"{out_dir}/queries.json"
if os.path.exists(manifest_path):
    names = json.load(open(manifest_path))
else:
    names = [os.path.basename(d) for d in sorted(glob.glob(f"{out_dir}/*"))
             if os.path.isdir(d)]

fails, passes, rows_only = [], [], []
for name in names:
    d = f"{out_dir}/{name}"
    if (only is not None and name not in only) or name in skip:
        continue
    if not os.path.isdir(d):
        fails.append((name, "no spark output (query never ran)"));  continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        err = ""
        if os.path.exists(f"{d}/_error"):
            err = ": " + open(f"{d}/_error").read().strip()
        fails.append((name, f"no spark output{err}"));  continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        import time as _t; _t0 = _t.time()
        duck_df = con.execute(oracle[name]).fetchdf()
        print(f"[check] {name} oracle {_t.time()-_t0:.1f}s", file=sys.stderr, flush=True)
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    s, o = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(o.columns):
        fails.append((name, f"columns {list(s.columns)} vs {list(o.columns)}")); continue
    if len(s) != len(o):
        fails.append((name, f"rows {len(s)} vs {len(o)}")); continue
    bad = None
    for c in s.columns:
        a, b = s[c].to_numpy(), o[c].to_numpy()
        # the driver's hash is type-sensitive: an oracle column rendered as
        # float64 (e.g. an uncast DuckDB HUGEINT) against a Spark integer
        # column hash-mismatches even when every value is equal. Catch that
        # representational leak locally, before the driver sees it.
        kinds = {a.dtype.kind, b.dtype.kind}
        if kinds == {'f', 'i'} or kinds == {'f', 'u'}:
            which = "oracle" if b.dtype.kind == 'f' else "spark"
            bad = (f"col {c}: dtype leak — spark {a.dtype} vs oracle {b.dtype} "
                   f"({which} side is float; driver hash would fail even on "
                   f"equal values — CAST the {which} aggregate to BIGINT)")
            break
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            a = a.astype(np.float64); b = b.astype(np.float64)
            neq = ~((a == b) | (np.isnan(a) & np.isnan(b)))
        else:
            try:
                neq = a != b
            except Exception:
                neq = np.array([x != y for x, y in zip(a, b)])
        n = int(np.sum(neq))
        if n:
            i = int(np.argmax(neq))
            bad = f"col {c}: {n}/{len(a)} differ, first @{i}: {a[i]!r} vs {b[i]!r}"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(rows_only)}: {' '.join(n for n,_ in rows_only)}")
print(f"FAIL {len(fails)}:")
for n, why in fails:
    print(f"  {n}: {why}")
sys.exit(1 if fails else 0)
