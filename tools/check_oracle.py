#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's t2 gate.

Run after `sbt "runMain graft.Verify <sfDir> <outDir>"`:

    python3 tools/check_oracle.py <sfDir> <outDir>

For each query: load our parquet result and the DuckDB-oracle result,
sort columns by name, sort rows, normalize values, and diff. Not part
of the shipped library (the Scala build never depends on this).
"""
import json
import math
import sys

import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr: exact-match check
    return str(v)


def table_rows(rel):
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    rows = [tuple(norm_cell(r[i]) for i in idx) for r in rel.fetchall()]
    return cols, sorted(rows)


# The driver's hash is type-sensitive where this checker str-normalizes:
# a DuckDB type with no Spark analogue (HUGEINT from SUM over BIGINT,
# UHUGEINT, unparameterized DECIMAL widening) hash-mismatches even when
# every value agrees (r13's e2e_crawl_frontier). Flag them up front so
# the value diff below can't mask a typing bug.
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def type_sweep(con, oracle):
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except Exception:
            continue  # SQL errors surface in the main loop
        for col, typ, *_ in desc:
            if any(t in typ.upper() for t in BAD_ORACLE_TYPES):
                print(f"TYPE {name}: column {col} is {typ} "
                      f"(cast to BIGINT/DOUBLE in the oracle SQL)")
                bad.append(name)
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    type_failed = set(type_sweep(con, oracle))
    failed = list(type_failed)
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got = table_rows(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            failed.append(name)
            continue
        try:
            exp_cols, exp = table_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failed.append(name)
        elif got != exp:
            print(f"FAIL {name}: {len(got)} rows vs {len(exp)} rows")
            only_got = [r for r in got if r not in set(exp)][:3]
            only_exp = [r for r in exp if r not in set(got)][:3]
            for r in only_got:
                print(f"   only-ours: {r}")
            for r in only_exp:
                print(f"   only-oracle: {r}")
            failed.append(name)
        elif name in type_failed:
            # Values agree, but the driver's hash is type-sensitive:
            # don't print a misleading OK line for a gate the summary
            # counts as failed.
            print(f"FAIL {name}: values match but an output column has "
                  f"a driver-hash-hostile type (see TYPE line above)")
        else:
            print(f"OK   {name}: {len(got)} rows")
    failed = sorted(set(failed))
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
