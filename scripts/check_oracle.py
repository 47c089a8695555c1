#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (columns sorted by name, rows
sorted, exact value compare)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark output")); print(f"FAIL {name}: no spark output"); continue
        spark = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        ora = con.execute(sql).fetchdf()
        spark = spark.reindex(sorted(spark.columns), axis=1)
        ora = ora.reindex(sorted(ora.columns), axis=1)
        if list(spark.columns) != list(ora.columns):
            fails.append((name, f"cols {list(spark.columns)} vs {list(ora.columns)}"))
            print(f"FAIL {name}: cols {list(spark.columns)} vs {list(ora.columns)}"); continue
        if [str(t) for t in spark.dtypes] != [str(t) for t in ora.dtypes]:
            print(f"WARN {name}: dtypes {[str(t) for t in spark.dtypes]} vs {[str(t) for t in ora.dtypes]}")
        sv = spark.sort_values(by=list(spark.columns)).reset_index(drop=True)
        ov = ora.sort_values(by=list(ora.columns)).reset_index(drop=True)
        if len(sv) != len(ov):
            fails.append((name, f"rows {len(sv)} vs {len(ov)}"))
            print(f"FAIL {name}: rows {len(sv)} vs {len(ov)}"); continue
        mismatch = None
        for c in sv.columns:
            a, b = sv[c].tolist(), ov[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                eq = (x == y) or (isinstance(x, float) and isinstance(y, float)
                                  and (math.isnan(x) and math.isnan(y) or x == y))
                if not eq:
                    mismatch = (c, i, x, y); break
            if mismatch: break
        if mismatch:
            c, i, x, y = mismatch
            fails.append((name, f"val col={c} row={i}: {x!r} vs {y!r}"))
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} oracle={y!r}")
        else:
            print(f"OK   {name}  rows={len(sv)}")
    except Exception as e:
        fails.append((name, str(e))); print(f"ERR  {name}: {e}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
