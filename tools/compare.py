#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle differential check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--json <path>]

With --json, also writes a machine-readable per-query artifact (the
ADVERSARIAL_r{N}.json round gate).

Reads <verifyOutDir>/oracle_sql.json (dumped by graft.Verify), runs each
SQL in DuckDB over the parquet tables in <sfDir>, loads the Spark result
parquet from <verifyOutDir>/<name>/, sorts columns by name on both
sides, and compares row-by-row. Prints a per-query PASS/FAIL summary.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # pyarrow list columns come back as numpy arrays; normalize to
    # tuples (of Python scalars) so both engines' rows compare equal
    if hasattr(v, "tolist") and not hasattr(v, "split"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def _kind(dtype) -> str:
    k = getattr(dtype, "kind", "?")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return "other"


def _dtype_clash(duck: pd.DataFrame, spark: pd.DataFrame) -> str:
    """Columns where one engine yields ints and the other floats —
    equal-valued but hash-divergent under a typed compare."""
    clashes = []
    for c in duck.columns:
        kd, ks = _kind(duck[c].dtype), _kind(spark[c].dtype)
        # pandas promotes nullable ints to float64; only flag the
        # all-values-integral float vs int case when there are no NaNs
        # (a NaN column legitimately differs in dtype, not meaning)
        if {kd, ks} == {"int", "float"}:
            fcol = duck[c] if kd == "float" else spark[c]
            if not fcol.isna().any():
                clashes.append(f"{c}: duck={duck[c].dtype} spark={spark[c].dtype}")
    return "; ".join(clashes)


def frame_rows(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if len(sys.argv) > 4 and sys.argv[3] == "--json":
        json_out = sys.argv[4]
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"MISSING  {name} (no spark output)")
            results[name] = "missing"
            n_fail += 1
            continue
        try:
            duck = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e)[:200]}")
            results[name] = "orafail: " + str(e)[:200]
            n_fail += 1
            continue
        files = sorted(spark_dir.glob("*.parquet"))
        spark = pd.concat([pq.read_table(f).to_pandas() for f in files]) if files else pd.DataFrame()
        ok = True
        reasons = []
        clash = None
        if sorted(duck.columns) != sorted(spark.columns):
            ok = False
            reasons.append(f"cols duck={sorted(duck.columns)} spark={sorted(spark.columns)}")
        elif (clash := _dtype_clash(duck, spark)):
            # int-vs-float column kind mismatch: values may still
            # compare equal here (598 == 598.0) but the driver-side
            # hash of typed values would diverge — fail loudly.
            ok = False
            reasons.append("dtype clash: " + clash)
        elif len(duck) != len(spark):
            ok = False
            reasons.append(f"rows duck={len(duck)} spark={len(spark)}")
        else:
            a, b = frame_rows(duck), frame_rows(spark)
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    ok = False
                    reasons.append(f"row {i}: duck={x} spark={y}")
                    if len(reasons) >= 4:
                        break
        if ok:
            n_pass += 1
            results[name] = f"pass ({len(spark)} rows)"
            print(f"PASS     {name} ({len(spark)} rows)")
        else:
            n_fail += 1
            results[name] = "fail: " + " | ".join(reasons[:4])[:300]
            print(f"FAIL     {name}: " + " | ".join(reasons[:4]))
    print(f"\n{n_pass} pass / {n_fail} fail of {n_pass + n_fail}")
    if json_out:
        Path(json_out).write_text(json.dumps(
            {"sf": sf_dir, "out": out_dir, "pass": n_pass, "fail": n_fail,
             "queries": results}, indent=0) + "\n")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
