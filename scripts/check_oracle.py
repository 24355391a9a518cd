#!/usr/bin/env python3
"""Dev-only local correctness checker mimicking the driver's DuckDB compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result and the
DuckDB oracle result, sort columns by name, sort rows, compare values
(floats to 1e-9 after the engine-side rounding). Reports per-query
row-count / schema / value match. NOT part of the shipped library.
"""
import sys, json, glob, os
import duckdb


def norm_rows(rows):
    def key(r):
        return tuple((x is None, str(type(x)), str(x)) for x in r)
    return sorted(rows, key=key)


def values_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float) and a != a and b != b:
        return True  # NaN == NaN for compare purposes (pandas NULL-floats)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return abs(float(a) - float(b)) <= 1e-9
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        # scale fixtures under target/ are Spark-written DIRECTORIES named
        # <table>.parquet; the driver fixtures are single files
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = pat + "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{pat}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    dump_dirs = sorted(d for d in glob.glob(os.path.join(out_dir, "*"))
                       if os.path.isdir(d))
    for d in dump_dirs:
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "EMPTY_DUMP"
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_types = dict(zip(got_rel.columns, map(str, got_rel.types)))
        got = got_rel.fetchdf()
        got_cols = sorted(got.columns)
        got_rows = norm_rows([tuple(r[c] for c in got_cols)
                              for _, r in got.iterrows()])
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(got_rows)})"
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_types = dict(zip(exp_rel.columns, map(str, exp_rel.types)))
            exp = exp_rel.fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        exp_cols = sorted(exp.columns)
        if exp_cols != got_cols:
            results[name] = f"SCHEMA_MISMATCH spark={got_cols} duck={exp_cols}"
            continue
        # The driver hashes TYPED values: a DuckDB HUGEINT (sum-promotion)
        # against a Spark BIGINT hash-mismatches even when every value is
        # equal, so type drift must fail here, before the driver round-trip.
        type_bad = [(c, got_types[c], exp_types[c]) for c in got_cols
                    if got_types[c] != exp_types[c]]
        if type_bad:
            results[name] = "TYPE_MISMATCH " + " ".join(
                f"{c}: spark={g} duck={e}" for c, g, e in type_bad)
            continue
        exp_rows = norm_rows([tuple(r[c] for c in exp_cols)
                              for _, r in exp.iterrows()])
        if len(exp_rows) != len(got_rows):
            results[name] = (f"ROWCOUNT_MISMATCH spark={len(got_rows)} "
                             f"duck={len(exp_rows)}")
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if not all(values_eq(x, y) for x, y in zip(g, e)):
                bad = (i, g, e)
                break
        results[name] = "OK" if bad is None else \
            f"VALUE_MISMATCH row{bad[0]} spark={bad[1]} duck={bad[2]}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v == "OK")
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok} OK, {n_rows_only} rows-only, "
          f"{len(results) - n_ok - n_rows_only} FAILING of {len(results)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
