#!/usr/bin/env python3
"""Oracle output-type lint — closes the round-14 blind spot for good.

Usage: python3 tools/lint_oracle_types.py <verify_outdir> <sfdir>

Runs every oracle SQL in <verify_outdir>/oracle_sql.json through DuckDB
(DESCRIBE only — no Spark needed) and FAILS on any output column whose
type has no Spark-parquet analog the driver's hasher would accept:
HUGEINT / int128 (DuckDB's sum(BIGINT) result) being the proven killer.
Dev tooling only — not part of the shipped library.
"""
import sys, os, json
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

BANNED = ("HUGEINT", "INT128", "UHUGEINT")

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            bad = [(c, str(t).upper()) for c, t in zip(rel.columns, rel.types)
                   if any(b in str(t).upper() for b in BANNED)]
        except Exception as e:
            print(f"FAIL {name}: oracle does not run: {e}")
            n_fail += 1
            continue
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL {name}: banned oracle output type(s) {cols} "
                  f"— cast OUTSIDE the aggregate (CAST(sum(x) AS BIGINT))")
            n_fail += 1
    print(f"== {len(oracles) - n_fail} clean, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
