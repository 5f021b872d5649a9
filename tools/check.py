#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB (tables = views over the
sf dir parquet files), loads the corresponding Spark result parquet, sorts
columns by name + rows, and compares values exactly (floats must match to
1e-12 relative; exact mismatches are reported).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kind_class(dtype):
    """Collapse a pandas dtype into the class the driver's hasher cares
    about. Integer widths are normalized by the driver (int32 vs int64 is
    green historically); int-vs-float and object-vs-numeric are NOT — the
    hasher materializes them differently (64437.0 vs 64437) and fails the
    hash even when every value compares numerically equal."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "object"


def dtype_divergence(want, got):
    """Return list of (col, oracle_class, spark_class) pairs that WILL fail
    the driver hash regardless of value equality."""
    bad = []
    for c in want.columns:
        wk, gk = kind_class(want[c].dtype), kind_class(got[c].dtype)
        if wk == gk:
            continue
        pair = {wk, gk}
        # int-vs-float: the class that burned rounds 13+14 (DuckDB
        # sum(BIGINT) -> HUGEINT -> float64 vs Spark int64). object-vs-
        # numeric: same failure shape via string/decimal materialization.
        # EXCEPTION: float-vs-int where the float side is nullable-int-
        # promoted is indistinguishable here, so we do NOT except it —
        # cast the oracle instead (house rule: CAST(sum(..) AS BIGINT)).
        if pair == {"int", "float"} or \
                ("object" in pair and ("int" in pair or "float" in pair)):
            bad.append((c, wk, gk))
    return bad


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # a filtered Verify run (3rd arg) writes oracle_sql.partial.json so the
    # driver can never mistake a partial dump for the full gate; accept it
    # here for local iteration, preferring the NEWEST of the two (a stale
    # full-run file must not shadow the fresh partial just written)
    import os
    candidates = [p for p in (f"{out_dir}/oracle_sql.json",
                              f"{out_dir}/oracle_sql.partial.json")
                  if os.path.exists(p)]
    if not candidates:
        raise FileNotFoundError(f"{out_dir}/oracle_sql[.partial].json")
    chosen = max(candidates, key=os.path.getmtime)
    oracle = json.load(open(chosen))
    # name the gate surface loudly: a partial file silently shadowing the
    # full set would otherwise report "all pass" over a subset
    print(f"oracle: {os.path.basename(chosen)} ({len(oracle)} queries)")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        want, got = want[wcols], got[gcols]
        div = dtype_divergence(want, got)
        if div:
            desc = ", ".join(f"{c}: oracle={w} spark={g}" for c, w, g in div)
            print(f"FAIL {name}: dtype divergence ({desc}) — values may be "
                  f"equal but this WILL fail the driver hash; cast the "
                  f"oracle (e.g. CAST(sum(..) AS BIGINT))")
            n_fail += 1
            continue
        wrows = sorted(map(tuple, want.itertuples(index=False)), key=repr)
        grows = sorted(map(tuple, got.itertuples(index=False)), key=repr)
        if len(wrows) != len(grows):
            print(f"FAIL {name}: row count differs: "
                  f"oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        for wr, gr in zip(wrows, grows):
            for w, g in zip(wr, gr):
                if isinstance(w, float) and isinstance(g, float):
                    if math.isnan(w) and math.isnan(g):
                        continue
                    if w != g:
                        exact = False
                        if not math.isclose(w, g, rel_tol=1e-12,
                                            abs_tol=1e-12):
                            bad = (w, g)
                elif norm(w) != norm(g):
                    bad = (w, g)
                if bad:
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: value mismatch: oracle={bad[0]!r} "
                  f"spark={bad[1]!r} ({len(wrows)} rows)")
            n_fail += 1
        else:
            tag = "" if exact else "  (float ulp diff — tolerated locally, "\
                "may fail driver hash!)"
            print(f"PASS {name}: {len(wrows)} rows{tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
