"""Local stand-in for the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` on DuckDB at sf0.01,
compare row count, column names, and exact values (columns sorted by
name, rows sorted by all columns) — stricter than a hash, and it
prints the first differing cells for debugging.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ml_data_pipeline_spark import queries as registry  # noqa: E402
from ml_data_pipeline_spark.session import build_session  # noqa: E402
from ml_data_pipeline_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, (np.floating,)):
        return norm_cell(float(v))
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        try:
            return v.item()
        except Exception:
            return v
    return v


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        rows.append(tuple(norm_cell(r[c]) for c in cols))
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return cols, rows


def main(only: list[str] | None = None):
    # VALIDATE_TZ=America/New_York re-runs the whole gate under a
    # non-UTC session timezone on BOTH engines — pins that no oracle
    # depends on the session tz (the repo invariant for timestamps).
    tz = os.environ.get("VALIDATE_TZ")
    spark = build_session(
        app_name="validate-oracles",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": tz} if tz else None,
    )
    con = duckdb.connect()
    if tz:
        con.sql(f"SET TimeZone='{tz}'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = registry.queries()
    os_ = registry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"skip  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sr = canon(sdf)
        oc, orows = canon(odf)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            failures.append(name)
            continue
        if len(sr) != len(orows):
            print(f"FAIL  {name}: rows {len(sr)} vs {len(orows)}")
            failures.append(name)
            continue
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sr, orows)) if a != b
        ]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; first at {i}:")
            print(f"      spark : {a}")
            print(f"      duckdb: {b}")
            failures.append(name)
        else:
            print(f"ok    {name} ({len(sr)} rows)")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
