#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Loads each <outDir>/<name> result parquet, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB (tables = views over the sfDir
parquet), sorts columns by name + rows by all columns, and compares
values exactly (hash of the canonical repr).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetime units: pandas 2.x assert_frame_equal with
    # check_dtype=False still compares raw ints for datetime64[ns] vs
    # datetime64[us], so align everything to microseconds
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional sharding for long sf1 gates: run disjoint partitions of
    # the SAME dump in parallel, then concatenate the shard outputs
    # into the one gate artifact.  only=q1,q2 / skip=q1,q2
    only, skip = None, set()
    for a in sys.argv[3:]:
        if a.startswith("only="):
            only = set(a[5:].split(","))
        elif a.startswith("skip="):
            skip = set(a[5:].split(","))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res_dir.rstrip("/"))
        if (only is not None and name not in only) or name in skip:
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no result parquet"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        if name not in oracle:
            status = "ROWS " if len(got) > 0 else "FAIL "
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_rows_only += 1 if len(got) > 0 else 0
            n_fail += 0 if len(got) > 0 else 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch:\n{str(e)[:1500]}")
            # show first differing cells for debugging
            for c in g.columns:
                neq = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col={c} row={i}: got={g[c][i]!r} want={w[c][i]!r}")
            n_fail += 1; continue
        print(f"PASS  {name}: rows={len(g)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
