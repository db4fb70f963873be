#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over <sfDir>'s parquet tables,
loads the corresponding Spark result parquet from <verifyOutDir>, and
compares row count, column names, and values (columns sorted by name,
rows sorted by all columns — tolerant of row-order differences but not
value differences).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def dtype_skews(got: pd.DataFrame, exp: pd.DataFrame):
    """Columns where the DuckDB result dtype != the Spark parquet dtype.

    The driver's value hash is dtype-sensitive even when values compare
    equal — a windowed sum DuckDB types HUGEINT (surfacing as float64 or
    object) against Spark's int64 broke a9 in round 6, and a float drift
    broke q26 in round 3.  This lint catches the skew even when the
    tolerant compare below passes."""
    skews = []
    for c in got.columns:
        g, e = got[c].dtype, exp[c].dtype
        if g == e:
            continue
        # both datetime after norm() coercion → fine
        if pd.api.types.is_datetime64_any_dtype(got[c]) and \
           pd.api.types.is_datetime64_any_dtype(exp[c]):
            continue
        skews.append((c, str(g), str(e)))
    return skews

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skew = 0
    # Registry-manifest completeness gate (round-14: s20 had no oracle row
    # because the dump predated the commit — the artifact was silently
    # SHORTER than the registry).  queries.json carries the full
    # SparkEntry.queries key set; every name must have a result dir and
    # every result dir must be a registered name, or the round FAILS loud.
    manifest_path = f"{out_dir}/queries.json"
    if os.path.exists(manifest_path):
        man = json.load(open(manifest_path))
        names = set(man["names"])
        dumped = {os.path.basename(d.rstrip("/"))
                  for d in glob.glob(f"{out_dir}/*/")}
        if man.get("filtered"):
            print(f"NOTE manifest: filtered run ({len(dumped)}/{man['count']} "
                  "dumped) — completeness check skipped (local iteration only)")
        else:
            if len(names) != man["count"]:
                print(f"FAIL manifest: count={man['count']} but {len(names)} names")
                n_fail += 1
            for m in sorted(names - dumped):
                print(f"FAIL manifest: {m} registered but not dumped "
                      "(query failed or stale artifact)")
                n_fail += 1
            for m in sorted(dumped - names):
                print(f"FAIL manifest: {m} dumped but not in the registry "
                      "(stale out dir?)")
                n_fail += 1
            for m in sorted(set(oracle) - names):
                print(f"FAIL manifest: oracle SQL for unregistered query {m}")
                n_fail += 1
    else:
        print("FAIL manifest: queries.json missing (pre-round-15 Verify dump?)")
        n_fail += 1
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}"); n_fail += 1; continue
        skews = dtype_skews(got, exp)
        for c, g, e in skews:
            print(f"SKEW {name}: col {c} spark={g} duck={e} "
                  "(values may match but the driver's hash is dtype-sensitive)")
        n_skew += len(skews)
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n  {str(e).splitlines()[-1] if str(e) else e}")
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad_cols = [c for c in got.columns if diff[c].any()]
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"    col {c} row {idx}: spark={got[c][idx]!r} duck={exp[c][idx]!r}")
            n_fail += 1
    # queries without oracle → rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n} rows {'(OK)' if n > 0 else '(EMPTY!)'}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skew} dtype-skew / {len(oracle)} oracled")
    return 1 if (n_fail or n_skew) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
