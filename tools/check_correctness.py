"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at a
given sf dir, compares row count + order-insensitive values (sorted columns by
name, rows sorted) and prints a verdict per query.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from mimic_spark.session import get_spark

    spark = get_spark(parallelism=8, app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            sdata = df.collect()
            scols = df.columns
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {len(sdata)} rows")
                n_rowsonly += 1
                continue
            o = con.execute(oracles[name])
            ocols = [d[0] for d in o.description]
            odata = o.fetchall()
            odf = con.execute(oracles[name]).df()
            sc, srows = _canon(scols, [tuple(r) for r in sdata])
            oc, orows = _canon(ocols, odata)
            # The driver's value-hash is pandas-dtype-sensitive (e.g. DuckDB
            # sum(BIGINT)->HUGEINT lands as object dtype and hash-mismatches
            # int64 even when values are equal) — flag dtype kind drift here.
            sdf = df.limit(1).toPandas()
            okinds = {c: odf[c].dtype.kind for c in odf.columns}
            skinds = {c: sdf[c].dtype.kind for c in sdf.columns}
            kind_drift = {
                c: (skinds[c], okinds[c])
                for c in skinds
                if c in okinds and skinds[c] != okinds[c]
                # only numeric/bool drift is hash-hazardous (dates come back
                # as object-of-date on the Spark side and datetime64 on the
                # DuckDB side, and the driver's hash tolerates that)
                and (skinds[c] in "iufb" or okinds[c] in "iufb")
                # empty-result or all-NULL columns legitimately differ
                and not odf[c].isna().all() and len(odf)
            }
            if sc != oc:
                print(f"FAIL {name}: columns {sc} != {oc}")
                n_fail += 1
            elif kind_drift:
                print(f"FAIL {name}: pandas dtype-kind drift (driver hash-sensitive): {kind_drift}")
                n_fail += 1
            elif len(srows) != len(orows):
                print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
                n_fail += 1
            elif srows != orows:
                bad = next(
                    (a, b) for a, b in zip(srows, orows) if a != b
                )
                print(f"FAIL {name}: value mismatch, first diff:\n  spark={bad[0]}\n  duck ={bad[1]}")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(srows)} rows")
                n_pass += 1
        except Exception:
            print(f"ERROR {name}:")
            traceback.print_exc()
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
