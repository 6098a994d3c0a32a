#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares: column names (sorted), dtypes, row count, and
exact values (rows sorted by all columns to be order-insensitive; we also
report whether the unsorted order matches, since our queries are ORDER BY'd).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written corpora (the x10 spot-gate's SynthCorpus output) are
        # directories of part files; the driver corpora are single files.
        # DuckDB validates the pattern at CREATE VIEW, so tables absent from
        # a synthesized corpus are skipped (their queries aren't in the run).
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    import glob
    import os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    # missing_from_run (ADVICE r14): a query that crashed during Verify has
    # an oracle key but no result dir — without this, check only iterates
    # dirs that exist and a partial run looks green.
    missing = sorted(set(oracle) - set(names))
    for name in missing:
        print(f"FAIL {name}: MISSING from run (oracle present, no result dir)")
        n_fail += 1
    for name in names:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got_n, exp_n = norm(got), norm(exp)
        if list(got_n.columns) != list(exp_n.columns):
            print(f"FAIL {name}: columns {list(got_n.columns)} != {list(exp_n.columns)}")
            n_fail += 1
            continue
        if len(got_n) != len(exp_n):
            print(f"FAIL {name}: rowcount {len(got_n)} != {len(exp_n)}")
            n_fail += 1
            continue
        dt_g = [str(t) for t in got_n.dtypes]
        dt_e = [str(t) for t in exp_n.dtypes]
        schema_note = "" if dt_g == dt_e else f" [dtypes differ: {dt_g} vs {dt_e}]"
        cols = list(got_n.columns)
        gs = got_n.sort_values(cols).reset_index(drop=True)
        es = exp_n.sort_values(cols).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(gs, es, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ{schema_note}\n  {str(e)[:500]}")
            # show first diffs
            neq = (gs != es) & ~(gs.isna() & es.isna())
            bad = neq.any(axis=1)
            print("  spark:", gs[bad].head(3).to_dict("records"))
            print("  duck :", es[bad].head(3).to_dict("records"))
            n_fail += 1
            continue
        ordered = got_n.reset_index(drop=True).equals(
            exp_n.reset_index(drop=True)) if len(got_n) else True
        print(f"PASS {name}: rows={len(got_n)} ordered={ordered}{schema_note}")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
