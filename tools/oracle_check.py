#!/usr/bin/env python
"""Local mimic of the driver's correctness harness.

Runs every `queries()` entry from __spark_entry__ on Spark and its
`oracle_sql()` twin on DuckDB over the same parquet tables, then compares
row count, schema (column names), and a canonical value hash (columns sorted
by name, rows sorted by all columns, floats rounded via repr).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _canon(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: repr(v))
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].map(lambda v: repr(round(float(v), 6)))
    pdf = pdf.astype(str)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    blob = pdf.to_csv(index=False).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # twins whose builders read the compare-scale table (lang_id_logreg's
    # embedded weights) must read THIS sf_dir, mirroring the driver (whose
    # compare scale is the env default)
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entry
    from libpostal_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:28s} SPARK-ERR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:28s} no_oracle rows={len(sdf)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"{name:28s} ORACLE-ERR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        h1, h2 = _canon(sdf), _canon(odf)
        ok = rows and schema and h1 == h2
        print(
            f"{name:28s} {'OK' if ok else 'MISMATCH'} rows={len(sdf)}/{len(odf)}"
            f" schema={schema} hash={'=' if h1 == h2 else f'{h1}!={h2}'}"
        )
        if not ok:
            failures += 1
            if not schema:
                print(f"  spark cols: {sorted(sdf.columns)}")
                print(f"  oracle cols: {sorted(odf.columns)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
