#!/usr/bin/env python3
"""Round-6 judge item 2: direct libm-fragility audit of the oracle suite.

The q139 failure class: an oracle that floors/rounds a data-dependent
transcendental (ln/sqrt/exp/pow) can hash-differ across DuckDB builds
whose libm rounds one ulp apart at some input. Instead of a static
boundary-distance scan, this audit PERTURBS every transcendental result
by ±~1.35 ulp (multiply by 1 +/- 3e-16, via DuckDB macros substituted
into the oracle text) and re-runs the oracle: if the perturbed output
differs anywhere from the unperturbed output, a one-ulp libm shift CAN
flip that gate -> convert it to the rank-only or JVM-fixture pattern.

Usage: audit_libm_boundary.py [sf_dir] [verify_out_dir]
(needs oracle_sql.json in verify_out_dir; zonal/bm25 fixtures in /tmp
from a prior Verify run). Exits nonzero if any gate is fragile.
"""
import sys, json, re
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

FUNCS1 = ["ln", "sqrt", "exp"]          # 1-arg transcendentals in use
FUNCS2 = ["pow", "power"]               # 2-arg
ALL = FUNCS1 + FUNCS2
pat = re.compile(r"\b(" + "|".join(ALL) + r")\(")

targets = {n: sql for n, sql in oracle.items() if pat.search(sql)}
print(f"auditing {len(targets)}/{len(oracle)} oracles that call {ALL}")


def connect(eps):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if eps is not None:
        for f in FUNCS1:
            con.execute(f"CREATE MACRO __p_{f}(a) AS {f}(a) * (1 + ({eps}))")
        for f in FUNCS2:
            con.execute(f"CREATE MACRO __p_{f}(a, b) AS {f}(a, b) * (1 + ({eps}))")
    return con


def run(con, sql, perturb):
    if perturb:
        sql = pat.sub(lambda m: f"__p_{m.group(1)}(", sql)
    df = con.execute(sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


base_con = connect(None)
fragile = []
for name in sorted(targets):
    sql = targets[name]
    try:
        base = run(base_con, sql, False)
    except Exception as e:
        print(f"SKIP {name}: base oracle failed: {e}")
        continue
    verdicts = []
    for eps in ("3e-16", "-3e-16"):
        con = connect(eps)
        try:
            pert = run(con, sql, True)
            same = base.equals(pert)
            if not same:
                diff = (base != pert) & ~(base.isna() & pert.isna())
                cols = [c for c in base.columns if diff[c].any()]
                verdicts.append(f"eps={eps} DIFFERS in {cols}")
        except Exception as e:
            verdicts.append(f"eps={eps} ERROR {e}")
        finally:
            con.close()
    if verdicts:
        fragile.append(name)
        print(f"FRAGILE {name}: " + "; ".join(verdicts))
    else:
        print(f"OK      {name}")

print()
if fragile:
    print(f"{len(fragile)} fragile gate(s): {fragile}")
    sys.exit(1)
print(f"all {len(targets)} transcendental-using oracles are stable under "
      "±1.35-ulp libm perturbation")
