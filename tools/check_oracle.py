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

_INT64_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"}
_FLOAT_FAMILY = {"FLOAT", "DOUBLE"}

def _types_compatible(a, b):
    """Widths the driver's hasher treats as equal. HUGEINT is NEVER
    compatible with anything Spark writes (the round-14 blind spot)."""
    if a == b:
        return True
    if a in _INT64_FAMILY and b in _INT64_FAMILY:
        return True
    if a in _FLOAT_FAMILY and b in _FLOAT_FAMILY:
        return True
    return False

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
            spark_types = [str(t).upper() for t in spark_rel.types]
            spark_rows = spark_rel.fetchall()
            ora_rel = con.sql(sql)
            ora_cols = [c.lower() for c in ora_rel.columns]
            ora_types = [str(t).upper() for t in ora_rel.types]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        # The driver's value hasher distinguishes physical integer/decimal
        # widths that Python repr() erases (round-14 root cause: DuckDB
        # sum(BIGINT) -> HUGEINT vs Spark int64). Mirror it: fail on any
        # oracle column whose DuckDB type has no Spark parquet analog, and
        # on any type mismatch between matching column names.
        for c, t in zip(ora_cols, ora_types):
            if "HUGEINT" in t or "INT128" in t:
                problems.append(f"oracle col '{c}' is {t} (no int64 parquet analog; cast OUTSIDE the aggregate)")
        s_by = dict(zip(spark_cols, spark_types))
        o_by = dict(zip(ora_cols, ora_types))
        for c in sorted(set(s_by) & set(o_by)):
            st, ot = s_by[c], o_by[c]
            if st != ot and not _types_compatible(st, ot):
                problems.append(f"type mismatch col '{c}': spark={st} oracle={ot}")
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
