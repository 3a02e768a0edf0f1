#!/usr/bin/env python3
"""Local feedback loop mirroring the driver's correctness gate.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares: row count, column names, and a
hash of all values with columns sorted by name (rows sorted by all
columns). NOT part of the shipped library — dev tooling only.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib
    h = hashlib.sha256()
    for r in normed:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        resdir = f"{outdir}/{name}"
        files = glob.glob(f"{resdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            ora_rel = con.sql(sql)
            ora_cols = [c.lower() for c in ora_rel.columns]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(spark_cols) != sorted(ora_cols):
            problems.append(f"cols spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
        if len(spark_rows) != len(ora_rows):
            problems.append(f"rows spark={len(spark_rows)} oracle={len(ora_rows)}")
        if not problems:
            hs = table_hash(spark_rows, spark_cols)
            ho = table_hash(ora_rows, ora_cols)
            if hs != ho:
                problems.append("value hash mismatch")
                # show first differing row for debugging
                order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                order_o = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
                ns = sorted(tuple(norm_cell(r[i]) for i in order_s) for r in spark_rows)
                no = sorted(tuple(norm_cell(r[i]) for i in order_o) for r in ora_rows)
                for a, b in zip(ns, no):
                    if a != b:
                        print(f"  first diff:\n    spark : {a}\n    oracle: {b}")
                        break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
