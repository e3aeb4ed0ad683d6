#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query dumped
by graft.Verify, run its DuckDB oracle SQL on the same parquet tables and
compare (schema = column-name set, rows = values with columns sorted by name).
Usage: compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_bad += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_bad += 1
            continue
        try:
            gv = g.reset_index(drop=True)
            wv = w.reset_index(drop=True)
            eq = True
            for c in g.columns:
                a, b = gv[c], wv[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        eq = False
                        break
                else:
                    # None/NaN on both sides counts as equal (pandas object
                    # `==` yields False for None == None)
                    both_na = pd.isna(a) & pd.isna(b)
                    if not (both_na | (a.astype(object) == b.astype(object))).all():
                        eq = False
                        break
            if eq:
                print(f"OK   {name} ({len(g)} rows)")
            else:
                bad = c
                mism = (gv[bad].astype(object) != wv[bad].astype(object))
                idx = mism[mism].index[:3]
                print(f"FAIL {name}: column '{bad}' differs, e.g. rows {list(idx)}: "
                      f"spark={list(gv.loc[idx, bad])} oracle={list(wv.loc[idx, bad])}")
                n_bad += 1
        except Exception as e:
            print(f"FAIL {name}: compare error {e}")
            n_bad += 1
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'} / {len(oracles)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
