"""Local twin of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified tuple). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

Besides the lenient value hash, a pandas dtype-KIND parity check models the
driver's conversion path: the driver hashes pandas frames, where Spark's
``toPandas`` yields int64 for a no-NULL bigint column while DuckDB's
``.df()`` yields float64 for any HUGEINT (= ``sum(BIGINT)``) column — so
"407" vs "407.0" hash-reds even though the values are equal. Any column
where one side lands integer-kind and the other float-kind is reported as a
failure here even when the lenient hash matches (this exact class was the
r04/r05 driver-red root cause; fix = ``CAST(... AS BIGINT)`` in the oracle).
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()


_SPARK_INT_TYPES = ("tinyint", "smallint", "int", "bigint", "long")
_SPARK_FLOAT_TYPES = ("float", "double")


def _spark_pandas_kind(spark_type: str, has_null: bool) -> str | None:
    """Kind the column takes after Spark toPandas (arrow off): integral
    types stay int64 ('i') unless NULLs force float64 ('f'); floats are
    float64; DATE becomes object-dtype datetime.date ('O') while
    TIMESTAMP becomes datetime64 ('M') — the date-vs-timestamp split is
    the same hash-red class as int-vs-float (DuckDB DATE arrives 'M'),
    so it is flagged too (closes the r06 retention_cohorts exception).
    Other types return None (exempt from the parity check)."""
    if spark_type in _SPARK_INT_TYPES:
        return "f" if has_null else "i"
    if spark_type in _SPARK_FLOAT_TYPES:
        return "f"
    if spark_type == "date":
        return "O"
    if spark_type.startswith("timestamp"):
        return "M"
    return None


def kind_mismatches(
    spark_dtypes: list[tuple[str, str]],
    srows: list[tuple],
    duck_df,
) -> list[str]:
    """Columns whose pandas dtype-kind would differ between the driver's
    Spark toPandas frame and its DuckDB .df() frame (int-vs-float only —
    that is the class that hash-reds despite equal values)."""
    out = []
    scols = [c for c, _ in spark_dtypes]
    for i, (col, styp) in enumerate(spark_dtypes):
        if col not in duck_df.columns:
            continue
        has_null = any(r[i] is None for r in srows)
        sk = _spark_pandas_kind(styp, has_null)
        dkind = duck_df[col].dtype.kind
        dk = "i" if dkind in "iu" else ("f" if dkind == "f" else None)
        if sk == "M":
            # Spark TIMESTAMP: only the datetime64 twin is comparable;
            # other DuckDB kinds are out of scope for this check
            dk = "M" if dkind == "M" else None
            sk = None if dk is None else "M"
        elif sk == "O":
            # Spark DATE ('O'): a DuckDB twin arriving datetime64 ('M')
            # OR numeric ('i'/'u'/'f') is a guaranteed hash-red
            # ('2020-01-01' never equals '2020-01-01 00:00:00' or an
            # epoch number as canonical text) — flag both; only the
            # O-vs-O case (both object dtype) is exempt (ADVICE r07)
            if dkind == "M":
                dk = "M"
            elif dkind in "iuf":
                dk = f"num:{dkind}"
            else:
                dk = None
        if sk and dk and sk != dk:
            out.append(f"{col} (spark {styp}->{sk} vs duckdb {dk})")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not Path(sf_dir).is_dir():
        print(
            f"ERROR: sf_dir {sf_dir!r} is not a directory — arguments are "
            "POSITIONAL: check_oracle.py [sf_dir] [query_name ...]"
        )
        return 2

    import __spark_entry__ as entrymod
    from vectordb_etl_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise produce a vacuous "0 failures"
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"PASS (rows-only) {name}: {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = (
            ok_count and ok_cols and frame_hash(scols, srows) == frame_hash(dcols, drows)
        )
        try:
            duck_df = con.execute(oracles[name]).df()
            kinds_bad = kind_mismatches(sdf.dtypes, srows, duck_df)
        except Exception as e:  # pragma: no cover - diagnostic path only
            kinds_bad = [f"<kind-check error: {e}>"]
        status = "PASS" if ok_hash and not kinds_bad else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} "
            f"kinds={'ok' if not kinds_bad else kinds_bad} "
            f"[{time.time()-t0:.1f}s]"
        )
        if kinds_bad and ok_hash:
            failures.append(name)
        if not ok_hash:
            failures.append(name)
            # print first differing canonical row to aid debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            a = sorted("\x01".join(_canon(r[i]) for i in order_s) for r in srows)
            b = sorted("\x01".join(_canon(r[i]) for i in order_d) for r in drows)
            for x, y in zip(a, b):
                if x != y:
                    print(f"  spark: {x[:300]}")
                    print(f"  duck : {y[:300]}")
                    break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
