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


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(float(v) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = norm(con.sql(
                f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = norm(con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
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
