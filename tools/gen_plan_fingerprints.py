"""Regenerate tools/plan_fingerprints.json — the per-query plan-shape
baseline that tests/test_plans.py guards against.

Builds every registered query's DataFrame at sf0.001 under the SAME session
shape as the test fixture (local[4], 4 shuffle partitions) and records
{exchange, broadcast_hash_join, python_eval} counts from the physical plan.
Run after intentionally changing a query's plan:

    python tools/gen_plan_fingerprints.py

then review the diff — an exchange or python_eval count going UP in the
diff is exactly the regression the guard exists to catch; commit it only
when the gain is deliberate and justified.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
OUT = REPO / "tools" / "plan_fingerprints.json"


def main() -> int:
    import __spark_entry__ as entry
    from vectordb_etl_spark.plans.inspect import plan_fingerprint
    from vectordb_etl_spark.session import get_spark

    spark = get_spark(
        "plan_fp", shuffle_partitions=4, extra_conf={"spark.master": "local[4]"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fps: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        try:
            fps[name] = plan_fingerprint(fn(spark, SF_DIR))
        except Exception as e:  # a query failing to BUILD is its own bug
            print(f"ERROR building {name}: {e}", file=sys.stderr)
            return 1
        print(f"{name}: {fps[name]}", file=sys.stderr)
    OUT.write_text(json.dumps(dict(sorted(fps.items())), indent=1) + "\n")
    print(f"wrote {OUT} ({len(fps)} queries)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
