"""Repr-strict simulation of the driver's correctness comparison.

Stricter than tools/check_oracle.py: converts the Spark result via
``toPandas()`` and the DuckDB result via ``.df()`` (the conversion path
the driver's hasher sees) and compares cell-by-cell ``repr`` — which is
how the r04/r05 HUGEINT→float64 hash-reds were finally reproduced
locally. A MISMATCH here that check_oracle passes usually means a pandas
dtype split; the known-benign case is DATE columns (Spark gives
``datetime.date``, DuckDB ``Timestamp`` — historically driver-green, see
retention_cohorts r04), which this tool reports as ``DATE-SPLIT`` rather
than MISMATCH. Usage:

    python tools/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon_cell(v):
    if isinstance(v, pd.Timestamp) and v.time() == datetime.time():
        return f"DATEISH:{v.date().isoformat()}"
    if isinstance(v, datetime.datetime) and v.time() == datetime.time():
        return f"DATEISH:{v.date().isoformat()}"
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return f"DATEISH:{v.isoformat()}"
    return repr(v)


def canon(df: pd.DataFrame, strict: bool) -> list[str]:
    cols = sorted(df.columns)
    conv = repr if strict else _canon_cell
    return sorted(
        "|".join(conv(v) for v in r.tolist())
        for _, r in df[cols].iterrows()
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not Path(sf_dir).is_dir():
        print("ERROR: positional args: driver_sim.py [sf_dir] [names...]")
        return 2
    import __spark_entry__ as em
    from vectordb_etl_spark.session import get_spark

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = em.queries(), em.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            bad.append(name)
            continue
        strict_match = canon(sdf, True) == canon(ddf, True)
        if strict_match:
            print(f"MATCH {name}")
        elif canon(sdf, False) == canon(ddf, False):
            print(f"DATE-SPLIT {name} (benign: date vs timestamp pandas "
                  "dtypes; values equal)")
        else:
            print(f"MISMATCH {name}")
            for x, y in zip(canon(sdf, False), canon(ddf, False)):
                if x != y:
                    print(f"  spark: {x[:200]}")
                    print(f"  duck : {y[:200]}")
                    break
            bad.append(name)
    print(f"\n{len(bad)} mismatches" + (f": {bad}" if bad else ""))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
