#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query
output under <outDir>, run its oracle SQL in DuckDB over the same sf tables
and compare (sort columns by name, sort rows, compare values).

Usage: python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/graft-verify
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def typed_repr(df: pd.DataFrame) -> pd.DataFrame:
    """Stringify values the way a type-sensitive hash sees them: an int64
    200200 and a HUGEINT/float64 200200.0 must differ. This is the lint
    that catches oracle aggregates missing a ::BIGINT cast (DuckDB widens
    sum(BIGINT) to HUGEINT -> pandas float64/object) even when the raw
    values are identical."""
    return df.astype(str)

fails = []
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name} (no spark output)")
        fails.append(name)
        continue
    try:
        spark_df = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        duck_df = canon(con.execute(sql).df())
    except Exception as e:
        print(f"ERROR    {name}: {str(e)[:200]}")
        fails.append(name)
        continue
    ok_shape = spark_df.shape == duck_df.shape and list(spark_df.columns) == list(duck_df.columns)
    if not ok_shape:
        print(f"SHAPE    {name}: spark {spark_df.shape} {list(spark_df.columns)} "
              f"vs duck {duck_df.shape} {list(duck_df.columns)}")
        fails.append(name)
        continue
    try:
        pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                      check_exact=True)
        # Driver-mirroring typing lint: values equal is not enough — the
        # driver's hash is type-sensitive, so stringified frames must
        # match exactly too (int64 200200 vs HUGEINT 200200.0 is a FAIL).
        sr, dr = typed_repr(spark_df), typed_repr(duck_df)
        if not sr.equals(dr):
            neq = (sr != dr)
            cols = [c for c in sr.columns if neq[c].any()]
            print(f"TYPING   {name}: value-equal but repr-mismatch in {cols} "
                  f"(oracle likely missing a ::BIGINT cast)")
            rows = neq.any(axis=1)
            print("  spark:", sr[rows].head(2).to_dict("records"))
            print("  duck :", dr[rows].head(2).to_dict("records"))
            fails.append(name)
            continue
        print(f"OK       {name}  rows={len(spark_df)}")
    except AssertionError as e:
        print(f"VALUES   {name}: {str(e).splitlines()[-1][:200]}")
        # show first differing rows
        neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
        rows = neq.any(axis=1)
        print("  spark:", spark_df[rows].head(3).to_dict("records"))
        print("  duck :", duck_df[rows].head(3).to_dict("records"))
        fails.append(name)

rows_only = [q for q in {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
             if q not in oracles]
print(f"\n{len(oracles) - len(fails)}/{len(oracles)} oracle queries match; "
      f"rows-only (no oracle): {sorted(rows_only)}")
sys.exit(1 if fails else 0)
