#!/usr/bin/env python3
"""Unit selftest for scripts/check.py's compare semantics.

Pins the dry-run to the driver's byte-representation hash semantics on the
edge cases that plain Python `==` masks (rounds 7-9 advice items). Run:
    python3 scripts/check_selftest.py
Exits non-zero on the first violated expectation.
"""
import math
import sys
import os
from decimal import Decimal

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import cell_eq, col_kind, norm  # noqa: E402

failures = []
n_checked = 0


def expect(name, got, want):
    global n_checked
    n_checked += 1
    if got != want:
        failures.append(f"{name}: got {got}, want {want}")


# --- cell_eq scalar semantics -------------------------------------------
expect("NaN == NaN", cell_eq(float("nan"), float("nan")), True)
expect("-0.0 != +0.0", cell_eq(-0.0, 0.0), False)
expect("Decimal != float", cell_eq(Decimal("4"), 4.0), False)
expect("Decimal != int", cell_eq(Decimal("4"), 4), False)
expect("Decimal == Decimal", cell_eq(Decimal("4"), Decimal("4")), True)
expect("int != float (4 vs 4.0)", cell_eq(4, 4.0), False)
# round-9 advice: bool-vs-number must mismatch (Python True == 1)
expect("bool != int (True vs 1)", cell_eq(True, 1), False)
expect("bool != float (False vs 0.0)", cell_eq(False, 0.0), False)
expect("bool == bool", cell_eq(True, True), True)

# --- nested (norm'd tuples) ---------------------------------------------
expect("[NaN] == [NaN]",
       cell_eq((float("nan"),), (float("nan"),)), True)
expect("[-0.0] != [0.0]", cell_eq((-0.0,), (0.0,)), False)
expect("nested bool vs 1", cell_eq((True,), (1,)), False)
expect("nested int vs float", cell_eq((4,), (4.0,)), False)
expect("nested Decimal vs float", cell_eq((Decimal("1"),), (1.0,)), False)
expect("struct value drift",
       cell_eq((("k", 1),), (("k", 1.0),)), False)

# --- norm(): recursion + ndarray handling --------------------------------
df = pd.DataFrame({"a": [np.array([1.0, float("nan")]), [[-0.0]]]})
n = norm(df)
expect("norm ndarray -> tuple", n["a"][0], (1.0, n["a"][0][1]))
expect("norm NaN preserved inside tuple", math.isnan(n["a"][0][1]), True)
expect("norm nested list depth-2", n["a"][1], ((-0.0,),))
expect("norm keeps -0.0 sign",
       math.copysign(1.0, n["a"][1][0][0]), -1.0)

# --- col_kind: full-column scan + mixed kinds ----------------------------
expect("int column", col_kind(pd.Series([1, 2], dtype="int64")), "int")
expect("mixed int/float object column",
       col_kind(pd.Series([1, 2.0], dtype=object)), "float|int")
expect("late Decimal caught (not first-value-only)",
       col_kind(pd.Series([1, 2, Decimal("3")], dtype=object)),
       "decimal|int")
expect("all-null column", col_kind(pd.Series([None, None], dtype=object)),
       "empty")

if failures:
    print("check_selftest FAILURES:")
    for f in failures:
        print("  " + f)
    sys.exit(1)
print(f"check_selftest: all {n_checked} expectations hold")
