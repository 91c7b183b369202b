#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name and rows by value, and compares
cell-by-cell (exact; floats compared bitwise after float64 cast).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# The driver's hash treats integer widths up to 64-bit as equivalent
# (r01: Spark INT row_number vs DuckDB BIGINT hash-matched) but HUGEINT
# (int128, e.g. un-cast windowed SUM) as distinct.
_INT_WIDTHS = {"TINYINT": "BIGINT", "SMALLINT": "BIGINT",
               "INTEGER": "BIGINT", "UTINYINT": "BIGINT",
               "USMALLINT": "BIGINT", "UINTEGER": "BIGINT"}


def _canon_type(t):
    t = str(t)
    return _INT_WIDTHS.get(t, t)


def _cell(v):
    if isinstance(v, float):
        # canonicalize NaN so NaN cells compare equal (tuple equality
        # otherwise always fails on NaN)
        return "NaN" if math.isnan(v) else float(v)
    return v


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(_cell(v) for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # Un-shrinkable inventory: the emitted result dirs must be exactly the
    # declared oracle keys — a query that silently fell out of the gate
    # (or an oracle without a result) is a hard FAIL, not a skip.
    import os
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    # ABSOLUTE pin: both the oracle keys and the result dirs must equal
    # the committed inventory file — a pack edit that shrinks BOTH sides
    # in lockstep (which the relative checks below cannot see) fails here.
    inv_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "src", "main", "resources", "graft",
                            "inventory.txt")
    inventory = {ln.strip() for ln in open(inv_path) if ln.strip()}
    # local-iteration escape for SPARK_GRAFT_VERIFY_ONLY subsets; the
    # driver never sets it, so the real gate always pins
    if os.environ.get("GRAFT_CHECK_PARTIAL"):
        inventory = set(oracle) | dirs
    for label, got in (("oracle keys", set(oracle)), ("result dirs", dirs)):
        if got != inventory:
            missing = sorted(inventory - got)
            extra = sorted(got - inventory)
            print(f"FAIL inventory: {label} ({len(got)}) != committed "
                  f"inventory ({len(inventory)})"
                  + (f"; missing: {','.join(missing)}" if missing else "")
                  + (f"; extra: {','.join(extra)}" if extra else ""))
            n_bad += 1
    for missing in sorted(set(oracle) - dirs):
        print(f"FAIL {missing}: declared in oracle_sql.json but no result dir")
        n_bad += 1
    for extra in sorted(dirs - set(oracle)):
        print(f"FAIL {extra}: result dir with no oracle entry")
        n_bad += 1
    for name, sql in sorted(oracle.items()):
        if name not in dirs:
            continue  # already counted as FAIL above
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got_proj = con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel")
            got_types = [_canon_type(t) for t in got_proj.types]
            got = norm(got_proj.fetchall())
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp_proj = con.sql(f"SELECT {', '.join(exp_cols)} FROM exp_rel")
            exp_types = [_canon_type(t) for t in exp_proj.types]
            exp = norm(exp_proj.fetchall())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # The driver sorts rows with pandas before hashing; array/binary
        # cells (ndarray / bytearray) are unhashable there and the whole
        # query records `err`. Mimic that strictness so such outputs
        # fail locally too.
        try:
            import pandas as pd
            for df in (got_proj.df(), exp_proj.df()):
                if len(df.columns):
                    df.sort_values(by=list(df.columns), inplace=True)
                pd.util.hash_pandas_object(df, index=False)
        except (TypeError, ValueError) as e:
            # ndarray cells raise ValueError from sort_values, bytearray
            # raises TypeError from the hash — both mean driver `err`
            print(f"FAIL {name}: driver-unhashable output ({e})")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
        elif got_types != exp_types:
            # the driver's hash is type-tagged: HUGEINT vs BIGINT fails
            # even when every value matches
            diffs = [f"{c}: {g} != {e}" for c, g, e
                     in zip(got_cols, got_types, exp_types) if g != e]
            print(f"FAIL {name}: column types differ — {'; '.join(diffs)}")
            n_bad += 1
        elif got != exp:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff at sorted row {i}:")
                    print(f"    got {g}")
                    print(f"    exp {e}")
                    for a, b in zip(g, e):
                        if a != b and isinstance(a, float) and isinstance(b, float):
                            print(f"    float delta: {a!r} vs {b!r} "
                                  f"ulp-ish {abs(a - b):.3e}")
                    break
            else:
                if len(got) != len(exp):
                    print(f"    row-count only; first extra: "
                          f"{(got[len(exp):] or exp[len(got):])[0]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
