#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: for each parquet dump
written by `graft.Verify <sfDir> <outDir>`, run the matching oracle SQL from
oracle_sql.json in DuckDB over the same sfDir tables and compare:
  - schema: same column-name set
  - rows: same row count
  - values: exact multiset equality after sorting columns by name and rows
    by value (floats compared exactly first, then with 1e-9 tolerance as a
    diagnostic)
Usage: tools/local_verify.py <outDir> <sfDir>
"""
import sys, json, math, glob, os
import duckdb

def canon(v):
    if isinstance(v, float):
        return v
    return v

def rows_key(row):
    return tuple((str(type(v)), str(v)) for v in row)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    con.execute("SET enable_progress_bar=false")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_match = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_cols = [d[0] for d in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows")
            n_rows_only += 1
            continue
        try:
            duck_rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: schema {sorted(spark_cols)} vs {sorted(duck_cols)}")
            n_fail += 1
            continue
        # reorder columns by sorted name (the driver's compare order)
        sp_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        du_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        sp = sorted([tuple(r[i] for i in sp_idx) for r in spark_rows], key=rows_key)
        du = sorted([tuple(r[i] for i in du_idx) for r in duck_rows], key=rows_key)
        if len(sp) != len(du):
            print(f"FAIL {name}: rowcount {len(sp)} vs {len(du)}")
            n_fail += 1
            continue
        exact = sp == du
        if exact:
            print(f"MATCH {name}: {len(sp)} rows")
            n_match += 1
            continue
        # diagnostic: tolerance compare
        close = True
        first_diff = None
        for a, b in zip(sp, du):
            for x, y in zip(a, b):
                if x == y:
                    continue
                if isinstance(x, float) and isinstance(y, float) and \
                        (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)):
                    continue
                close = False
                if first_diff is None:
                    first_diff = (a, b)
            if not close and first_diff:
                break
        tag = "CLOSE(float-tol)" if close else "FAIL"
        print(f"{tag} {name}: {len(sp)} rows; first diff: {first_diff}")
        n_fail += 1
    print(f"\nsummary: {n_match} match, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
