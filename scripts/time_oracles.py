#!/usr/bin/env python3
"""Time every oracle SQL on its own (driver-robustness probe: one
wedged oracle can zero a whole round's correctness artifact — see the
round-4/5 lesson). Prints the slowest N and flags anything > budget."""
import sys, json, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        times.append((time.time() - t0, name, "ok"))
    except Exception as e:
        times.append((time.time() - t0, name, f"ERR {e}"))
times.sort(reverse=True)
slow = [t for t in times if t[0] > budget]
for dt, name, st in times[:12]:
    print(f"{dt:8.2f}s  {name}  {st if st != 'ok' else ''}")
print(f"\ntotal={sum(t[0] for t in times):.1f}s n={len(times)} "
      f"over_budget({budget}s)={len(slow)}")
sys.exit(1 if slow else 0)
