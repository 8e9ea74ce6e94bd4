#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
    python3 tools/check.py [sfDir] [outDir] [--only q30,q31] [--skip-verify]

Runs `sbt "runMain graft.Verify <sfDir> <outDir>"`, then for every query in
<outDir>/oracle_sql.json: executes the SQL in DuckDB with views over the same
parquet tables, loads the Spark parquet result, and compares row count, schema
(column names + dtypes after sorting columns by name), and a value hash.
Mirrors what CORRECTNESS_r{N}.json reports so parity bugs surface locally.
"""
import json, os, re, subprocess, sys

import duckdb
import pandas as pd
import numpy as np
import pyarrow.dataset as pads


def canon_dtype(d) -> str:
    """datetime64 resolution (ns from pyarrow vs us from DuckDB) is
    repr-identical and driver-tolerated; decimal-as-object vs float64 is
    NOT — that mismatch stays loud."""
    return re.sub(r"datetime64\[\w+\]", "datetime64", str(d))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    # Sort columns by name (driver semantics), then hash a canonical repr.
    df = df.reindex(sorted(df.columns), axis=1)
    import hashlib
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.map(lambda v: repr(v) if not isinstance(v, (list, np.ndarray))
                         else repr([x for x in v]))
        elif np.issubdtype(s.dtype, np.floating):
            vals = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN/None")
        else:
            vals = s.astype(str)
        h.update(("\n".join(vals.tolist()) + "|").encode())
    return h.hexdigest()[:16]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(o) for o in only):
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: spark result missing"); n_fail += 1; continue
        try:
            # Read the Spark side via pyarrow — DRIVER semantics. A DuckDB
            # read normalizes decimal128 to float64 on both sides, which is
            # exactly how r4/r5's q69 repr mismatch never reproduced locally:
            # pyarrow materializes decimal columns as Python Decimal objects,
            # whose repr-hash differs from the oracle's float64.
            # date_as_object=False: the driver hash-matches date/timestamp
            # columns (r5: q01/q29/q33 all green), so render them as
            # datetime64 like DuckDB does; decimals stay Python Decimal
            # objects — the faithful part.
            spark_df = pads.dataset(spark_path, format="parquet") \
                .to_table().to_pandas(date_as_object=False)
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        problems = []
        if len(spark_df) != len(oracle_df):
            problems.append(f"rows {len(spark_df)} vs {len(oracle_df)}")
        sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
        if sc != oc:
            problems.append(f"cols {sc} vs {oc}")
        else:
            sd = [canon_dtype(spark_df[c].dtype) for c in sc]
            od = [canon_dtype(oracle_df[c].dtype) for c in oc]
            if sd != od:
                problems.append(f"dtypes {list(zip(sc, sd, od))}")
            elif value_hash(spark_df) != value_hash(oracle_df):
                problems.append("hash mismatch")
                for c in sc:
                    a, b = spark_df[c], oracle_df[c]
                    try:
                        eq = (a.fillna("<N>") == b.fillna("<N>")).all() \
                            if a.dtype == b.dtype else False
                    except Exception:
                        eq = "?"
                    if eq is not True:
                        problems.append(f"  col {c} differs")
        if problems:
            print(f"FAIL {name}: {'; '.join(p for p in problems)}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
