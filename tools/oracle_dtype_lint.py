#!/usr/bin/env python3
"""Oracle dtype lint — closes the gap that compare.py's value-tolerant
comparison leaves open: the round driver's hash is DTYPE-sensitive, so a
DuckDB oracle whose integer aggregate comes back HUGEINT (-> pandas
float64) fails the gate even when every value matches the Spark BIGINT
output (the r7 q12_priority_by_status failure).

For every oracle in <verifyOutDir>/oracle_sql.json this runs the SQL in
DuckDB against <sfDir> and compares the resulting pandas dtype KIND per
column with the Spark parquet dump's dtype kind:

  ERROR  cross-kind mismatch (e.g. oracle float64 vs spark int64) —
         the driver's hash will refuse this even with identical values.
  WARN   same-kind width difference (e.g. int32 vs int64) — survives the
         driver today but is fragile; prefer explicit CASTs.

Run per round BEFORE committing new oracles:
  python3 tools/oracle_dtype_lint.py /root/testdata/sf0.01 target/verify_out
Exit code 1 on any ERROR.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Kinds that hash identically for the driver's purposes: signed/unsigned int
# collapse, datetime kinds collapse.
KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool",
              "O": "obj", "M": "datetime", "m": "timedelta", "S": "obj", "U": "obj"}


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_err = n_warn = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception:
            continue  # missing dumps are compare.py's problem, not the lint's
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ERROR {name}: oracle sql error: {e}")
            n_err += 1
            continue
        for c in sorted(set(got.columns) & set(want.columns)):
            gk = KIND_CLASS.get(got[c].dtype.kind, got[c].dtype.kind)
            wk = KIND_CLASS.get(want[c].dtype.kind, want[c].dtype.kind)
            if gk != wk:
                print(f"ERROR {name}.{c}: spark {got[c].dtype} vs oracle {want[c].dtype}"
                      f" — add an explicit CAST in the oracle (or align the Spark type)")
                n_err += 1
            elif str(got[c].dtype) != str(want[c].dtype):
                print(f"WARN  {name}.{c}: spark {got[c].dtype} vs oracle {want[c].dtype}"
                      f" (same kind, different width)")
                n_warn += 1
    print(f"dtype lint: {n_err} errors, {n_warn} warnings / {len(oracles)} oracles")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
