#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the same
sf tables, sorts columns by name, and compares values exactly — the same
shape as the driver's hash compare (row/schema/hash).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (pd.NaT etc.)
            return True
    except Exception:
        pass
    return a == b


def main():
    # Usage: check_oracles.py <sfDir> <outDir> [--only q1,q2,...]
    # --only restricts the compare to named queries (targeted re-gate
    # after a focused change, paired with graft.Verify's name args).
    # Without it, every oracle must have a dump — absence is a FAIL.
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = None
    rest = sys.argv[3:]
    if rest:
        # strict: a bare/misplaced --only must not silently run the
        # full (possibly stale) compare instead of the intended subset.
        # Explicit exits, not assert — asserts vanish under `python -O`
        # and this validation IS the defense.
        if rest[0] != "--only" or len(rest) != 2:
            sys.exit(f"usage: check_oracles.py <sfDir> <outDir> "
                     f"[--only q1,q2]; got extra args {rest}")
        only = set(rest[1].split(","))
        if not only or not all(only):
            sys.exit(f"empty query name in --only: {rest[1]!r}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        missing = only - set(oracles)
        if missing:
            sys.exit(f"--only names not in oracle_sql.json: {missing}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    # Surface the ANN recall gate in this local stand-in too: the gate
    # lives in Verify (below-floor dumps are deleted so the DRIVER's
    # rows-check fails), but this script iterates only oracled queries,
    # so without this a recall failure would be invisible to its exit
    # code. ann_recall.json carries every measured value.
    import os
    recall_path = f"{out_dir}/ann_recall.json"
    if os.path.exists(recall_path):
        for name, g in sorted(json.load(open(recall_path)).items()):
            if only is not None and name not in only:
                continue
            if g["pass"]:
                print(f"PASS {name} (recall {g['recall']:.2f} >= "
                      f"floor {g['floor']:.2f})")
                n_pass += 1
            else:
                print(f"FAIL {name}: recall {g['recall']:.2f} below "
                      f"floor {g['floor']:.2f} (dump deleted by Verify)")
                n_fail += 1
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"!= {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        sg = {c: str(got[c].dtype) for c in got.columns}
        sw = {c: str(want[c].dtype) for c in want.columns}
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                if not cells_equal(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        elif sg != sw:
            print(f"WARN {name}: values match, dtypes differ: {sg} vs {sw}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
