#!/usr/bin/env python3
"""Local dry-run of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <outDir> [key ...]

Mimics the driver: for each query key, load the Spark-written parquet from
<outDir>/<key>/, run the oracle SQL from <outDir>/oracle_sql.json in DuckDB
with each harness table registered as a view over <sfDir>/<table>.parquet,
sort columns by name, and compare values. Reports per-key PASS/FAIL with
diagnostics (schema diff, row-count diff, first mismatching cells).
"""
import sys, os, json, glob
import datetime
import math
from decimal import Decimal
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# The Spark side MUST be read with pyarrow, not through DuckDB (round-4
# verdict): DuckDB coerces parquet DECIMAL columns to float64 exactly like
# the oracle side, masking representation-type mismatches the driver's
# pyarrow-based hash DOES see (Decimal('917.23') != 917.23). Reading with
# pyarrow makes this dry-run fail precisely when the driver would.
def load_spark_result(outdir, key):
    files = sorted(glob.glob(os.path.join(outdir, key, "*.parquet")))
    if not files:
        return None
    frames = [pq.read_table(f).to_pandas() for f in files]
    return pd.concat(frames, ignore_index=True)


# NOTE: rows are compared positionally WITHOUT sorting, on purpose — the
# driver's hash compare may be order-sensitive, so every query must emit a
# total ORDER BY; sorting here would mask a missing/ambiguous ordering that
# the driver could then flag. (Columns are sorted by name to match the
# driver's column canonicalization.)
def _norm_cell(v):
    # Recursive (round-8 advice: depth-1 tuple() left inner lists/dicts
    # as plain x == y, where [nan] == [nan] is False and -0.0/Decimal
    # strictness was masked): ndarrays/lists → tuples all the way down,
    # dict-valued structs → sorted (key, value) tuples.
    if hasattr(v, "tolist"):  # ndarray (and numpy scalars)
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if type(v) is datetime.date:
        # pyarrow reads Spark DATE columns as datetime.date objects
        # while DuckDB's .df() yields datetime64 Timestamps; the driver
        # hashes these as EQUAL (q_date_funcs green in every round), so
        # normalize dates to Timestamps. Decimal stays strict on
        # purpose — the driver DOES flag Decimal-vs-float64 (round 4).
        return pd.Timestamp(v)
    return v


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(_norm_cell)
    return df


# Representation kind of a column, at the granularity the driver's
# pyarrow-based hash distinguishes (round-7 postmortem): an int64 column
# and a float64 column of equal values hash DIFFERENTLY, as do float64 vs
# object-of-Decimal. Python's `==` (Decimal('4') == 4, 4.0 == 4) would
# mask all of these, so kinds are compared before any value comparison.
def col_kind(s):
    k = s.dtype.kind  # i/u int, f float, b bool, M datetime, O object
    if k in "iu":
        return "int"
    if k in "fbM":
        return {"f": "float", "b": "bool", "M": "timestamp"}[k]

    def kind_of(v):
        if isinstance(v, Decimal):
            return "decimal"
        if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
            return "timestamp"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, (str, bytes)):
            return "str"
        return "nested"

    # Scan ALL values (round-8 advice: first-non-null-only let a column
    # that is int in early rows and float/Decimal later slip past the
    # drift gate, where Python's 4 == 4.0 then masked the repr diff the
    # driver's hash would flag). Mixed columns report the full kind set.
    kinds = set()
    for v in s:
        try:
            if pd.isna(v):
                continue
        except (TypeError, ValueError):
            pass
        kinds.add(kind_of(v))
    if not kinds:
        return "empty"  # all-null: no representation to clash on
    return "|".join(sorted(kinds))


# Exact cell equality under the driver's hash semantics: NaN==NaN, but
# Decimal never equals a plain number, and +0.0 never equals -0.0 (the
# driver hashes the byte representation; IEEE -0.0 has the sign bit set —
# the round-7 q_agg_corr failure). Recurses into arrays/structs (tuples).
def cell_eq(x, y):
    # numpy scalar → Python scalar first (round-10 advice): np.bool_ is
    # NOT a bool subclass, so the bool-strictness below would spuriously
    # flag Python-bool vs np.bool_ (object-dtype vs bool-dtype loads of
    # the same BOOLEAN column) and would MISS np.bool_ vs int. .item()
    # normalizes every numpy scalar kind; arrays don't reach here
    # (norm() tuples them).
    import numpy as np
    if isinstance(x, np.generic):
        x = x.item()
    if isinstance(y, np.generic):
        y = y.item()
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(x, Decimal) != isinstance(y, Decimal):
        return False
    # lists/dicts can only reach here un-normalized (defensive — norm()
    # converts both to tuples); recurse rather than fall through to ==
    if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
        return len(x) == len(y) and all(cell_eq(a, b) for a, b in zip(x, y))
    if isinstance(x, dict) and isinstance(y, dict):
        return x.keys() == y.keys() and all(
            cell_eq(v, y[k]) for k, v in x.items())
    # bool-vs-number strictness (round-9 advice): Python bool ⊂ int makes
    # True == 1, but the driver hashes the byte representation where a
    # BOOLEAN and an int differ. Mirror the Decimal asymmetry check —
    # exactly one side bool → mismatch (nested bools dodge col_kind's
    # drift gate, which reports nested columns only as 'nested').
    if isinstance(x, bool) != isinstance(y, bool):
        return False
    # int-vs-float strictness inside nested values (round-8 advice),
    # mirroring the Decimal check: 4 == 4.0 in Python but the driver
    # hashes the representation. bool==bool falls through to plain ==.
    if not isinstance(x, bool) and not isinstance(y, bool):
        if (type(x) is int) != (type(y) is int) and \
                isinstance(x, (int, float)) and isinstance(y, (int, float)):
            return False
    if isinstance(x, float) and isinstance(y, float) and x == 0.0 and y == 0.0:
        return math.copysign(1.0, x) == math.copysign(1.0, y)
    return x == y


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    npass = nfail = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        spark_df = load_spark_result(outdir, key)
        if spark_df is None:
            print(f"FAIL {key}: no spark result parquet")
            nfail += 1
            continue
        try:
            duck_df = con.execute(oracle[key]).df()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            nfail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {key}: columns spark={list(a.columns)} duck={list(b.columns)}")
            nfail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {key}: rows spark={len(a)} duck={len(b)}")
            nfail += 1
            continue
        # dtype-drift gate: int64 vs float64 (or float64 vs Decimal object)
        # columns hash differently in the driver even when values compare
        # equal in Python — fail before the value loop would mask it.
        drift = [(c, col_kind(a[c]), col_kind(b[c])) for c in a.columns]
        drift = [(c, ka, kb) for c, ka, kb in drift
                 if ka != kb and "empty" not in (ka, kb)]
        if drift:
            print(f"FAIL {key}: column repr drift (spark vs duck): {drift}")
            nfail += 1
            continue
        mismatch = []
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                # Exact equality on purpose (mimics the driver's value
                # hash): queries must round floats onto a shared grid.
                if not cell_eq(x, y):
                    mismatch.append((c, i, x, y))
                    if len(mismatch) >= 3:
                        break
            if len(mismatch) >= 3:
                break
        if mismatch:
            print(f"FAIL {key}: value mismatches {mismatch}")
            nfail += 1
        else:
            print(f"PASS {key} ({len(a)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
