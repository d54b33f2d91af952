#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sf_dir> <verify_out_dir>

For each query dir under verify_out, loads the Spark parquet result, runs
the oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
sf_dir), sorts columns by name, and compares row counts + values exactly.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def load_spark(result_dir):
    files = sorted(glob.glob(os.path.join(result_dir, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])

def norm_cell(v):
    # normalize for comparison: pyarrow scalars -> python
    if hasattr(v, "as_py"):
        v = v.as_py()
    if isinstance(v, float):
        return ("f", repr(v))
    return ("v", str(v))

def table_to_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = list(zip(*data)) if data else []
    out = []
    for r in rows:
        out.append(tuple(norm_cell(x) for x in r))
    return cols, sorted(out)

def duck_to_rows(rel):
    import pyarrow as pa
    tbl = rel.arrow()
    if isinstance(tbl, pa.RecordBatchReader):
        tbl = tbl.read_all()
    return table_to_rows(tbl)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_tbl = load_spark(qdir)
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({spark_tbl.num_rows} rows)")
            n_skip += 1
            continue
        try:
            cols_d, rows_d = duck_to_rows(con.sql(oracles[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        cols_s, rows_s = table_to_rows(spark_tbl)
        if cols_s != cols_d:
            print(f"FAIL {name}: columns {cols_s} vs {cols_d}"); n_fail += 1; continue
        if len(rows_s) != len(rows_d):
            print(f"FAIL {name}: rows {len(rows_s)} vs {len(rows_d)}"); n_fail += 1; continue
        if rows_s != rows_d:
            bad = [(a, b) for a, b in zip(rows_s, rows_d) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(rows_s)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
