#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sf_dir> <verify_out_dir>

For each query dir under verify_out, loads the Spark parquet result, runs
the oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
sf_dir), sorts columns by name, and compares row counts + values exactly.
"""
import sys, json, glob, os, re
import duckdb
import pyarrow.parquet as pq

# Version-sensitive SQL constructs that evaluate differently across DuckDB
# releases (round-1 driver gate failed 4 locally-green oracles on these).
# Each entry: (regex, message).
LINT_RULES = [
    (re.compile(r"'0x'\s*\|\|", re.I),
     "hex-string-to-int cast ('0x' || ...): compare the md5 prefix as a "
     "STRING instead (fixed-width lowercase hex sorts numerically)"),
    (re.compile(r"date_diff\s*\(\s*'day'", re.I),
     "date_diff('day', ts, ts) boundary semantics shift across versions: "
     "use CAST(x AS DATE) - CAST(y AS DATE) integer subtraction"),
]

# double->decimal cast rounding has drifted across DuckDB releases
# (cole_roundtrip_decimal failed the round-7 driver gate on values that
# were cell-identical under local DuckDB 1.0.0). A decimal built by
# casting a double is only safe when it is immediately folded back to
# DOUBLE (the dsumSql pattern — any half-ulp drift re-collapses); a
# decimal that SURFACES in the result is compared/hashed in the decimal
# domain and inherits the cast's version-dependent rounding.
DOUBLE_COLS = (r"l_extendedprice|l_quantity|l_discount|l_tax|o_totalprice"
               r"|ps_supplycost|s_acctbal|c_acctbal|p_retailprice")
CAST_DEC_RX = re.compile(
    r"CAST\s*\(\s*(?:" + DOUBLE_COLS + r")\s+AS\s+DECIMAL", re.I)

def lint_oracle(name, sql):
    """Warn on constructs known to drift between DuckDB versions."""
    warnings = []
    for rx, msg in LINT_RULES:
        if rx.search(sql):
            warnings.append(f"LINT {name}: {msg}")
    # Any SUM( not directly wrapped in CAST( — catches HUGEINT divergence.
    for m in re.finditer(r"SUM\s*\(", sql, re.I):
        prefix = sql[max(0, m.start() - 24):m.start()].rstrip()
        if not re.search(r"CAST\s*\(\s*(FLOOR\s*\(\s*)?(COALESCE\s*\(\s*)?$",
                         prefix, re.I):
            warnings.append(
                f"LINT {name}: SUM( at offset {m.start()} has no enclosing "
                "CAST — DuckDB integer SUM returns HUGEINT, Spark BIGINT")
            break
    for m in CAST_DEC_RX.finditer(sql):
        # exempt the fold-back-to-DOUBLE idiom: the decimal is an
        # aggregation intermediate and never surfaces in the result
        if not re.search(r"AS\s+DOUBLE", sql[m.end():m.end() + 120], re.I):
            warnings.append(
                f"LINT {name}: CAST(<double col> AS DECIMAL) at offset "
                f"{m.start()} surfaces a decimal built by double cast — "
                "rounding drifts across DuckDB versions; build from "
                "integer units (CAST(ROUND(x*100) AS BIGINT) then "
                "rescale) or compare in the unscaled-int64 domain")
            break
    return warnings

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

def norm_dtype(t):
    """Coarse arrow-type class, like the driver's type-sensitive hash:
    HUGEINT arrives as decimal128(38,0) and must NOT equal int64."""
    import pyarrow.types as pt
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    return str(t)

def table_to_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    types = {c: norm_dtype(tbl.schema.field(c).type) for c in cols}
    rows = list(zip(*data)) if data else []
    out = []
    for r in rows:
        out.append(tuple(norm_cell(x) for x in r))
    return cols, types, sorted(out)

def duck_to_rows(rel):
    import pyarrow as pa
    tbl = rel.arrow()
    if isinstance(tbl, pa.RecordBatchReader):
        tbl = tbl.read_all()
    return table_to_rows(tbl)  # (cols, types, rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = n_warn = 0
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
        # lint hits are advisory: they flag constructs that have drifted
        # across DuckDB versions, but only the actual dtype/value compare
        # below decides pass/fail (a correctly-typed result passes even if
        # its SQL spells SUM without the canonical CAST nesting)
        for w in lint_oracle(name, oracles[name]):
            print(f"WARN {w}")
            n_warn += 1
        try:
            cols_d, types_d, rows_d = duck_to_rows(con.sql(oracles[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        cols_s, types_s, rows_s = table_to_rows(spark_tbl)
        if cols_s != cols_d:
            print(f"FAIL {name}: columns {cols_s} vs {cols_d}"); n_fail += 1; continue
        bad_types = {c: (types_s[c], types_d[c]) for c in cols_s
                     if types_s[c] != types_d[c]}
        if bad_types:
            print(f"FAIL {name}: dtype mismatch (spark vs duckdb): {bad_types}")
            n_fail += 1
            continue
        if len(rows_s) != len(rows_d):
            print(f"FAIL {name}: rows {len(rows_s)} vs {len(rows_d)}"); n_fail += 1; continue
        if rows_s != rows_d:
            bad = [(a, b) for a, b in zip(rows_s, rows_d) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(rows_s)} rows)")
        n_pass += 1
    warn = f", {n_warn} lint warnings" if n_warn else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only{warn}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
