#!/usr/bin/env python3
"""Dev-loop oracle parity checker (mirrors the driver's t2 gate).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB against views over
<sfDir>/*.parquet, sorts columns by name, and compares values.
Dev-only tooling — the Scala library has no Python dependency.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("%.10g" % v)
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return out

# DuckDB output types with no clean Spark counterpart. The driver's
# hash-compare is type-sensitive (r13 verdict: integer SUM returns INT128
# in DuckDB vs LONG in Spark — rows+schema green, hash red). pandas
# coerces these silently, so the audit must run on DESCRIBE, not on the
# materialized frame.
BANNED_TYPES = ("HUGEINT", "UHUGEINT")

def type_audit(con, name, sql):
    """Return list of (column, dtype) pairs whose DuckDB output type Spark
    can't produce — any hit means the oracle needs an explicit CAST."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if any(b in r[1].upper() for b in BANNED_TYPES)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            banned = type_audit(con, name, sql)
            if banned:
                n_fail += 1
                print(f"FAIL {name}: oracle output has banned DuckDB types "
                      f"(wrap in CAST): {banned}")
                continue
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).df()
            s, d = canon(spark_df), canon(duck_df)
            if s == d:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: spark {len(s)} rows vs duck {len(d)} rows")
                for i, (a, b) in enumerate(zip(s, d)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark: {a}\n   duck:  {b}")
                        break
                if len(s) != len(d):
                    print(f"   spark cols: {sorted(spark_df.columns)}")
                    print(f"   duck cols:  {sorted(duck_df.columns)}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
