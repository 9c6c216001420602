#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare.

Usage: compare_oracle.py <verifyOutDir> <sfDir> [query ...]

Emulates the correctness gate: for each query with an oracle, load the
Spark parquet dump and run the oracle SQL in DuckDB over the sf parquet
tables, sort columns by name, and compare row count / column names /
cell values (exact; floats via repr).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"{name}: NO SPARK DUMP")
            failures += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        rows_match = len(sdf) == len(odf)
        schema_match = scols == ocols
        hash_match = False
        if rows_match and schema_match:
            a = [tuple(norm(v) for v in row) for row in sdf[scols].itertuples(index=False)]
            b = [tuple(norm(v) for v in row) for row in odf[ocols].itertuples(index=False)]
            hash_match = sorted(a) == sorted(b)
            if not hash_match:
                diff = [(x, y) for x, y in zip(sorted(a), sorted(b)) if x != y][:3]
                print(f"{name}: VALUE MISMATCH first diffs: {diff}")
        ok = rows_match and schema_match and hash_match
        if not ok:
            failures += 1
        print(f"{name}: rows={rows_match}({len(sdf)}/{len(odf)}) "
              f"schema={schema_match} hash={hash_match}"
              + ("" if schema_match else f" spark={scols} oracle={ocols}"))
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)

main()
