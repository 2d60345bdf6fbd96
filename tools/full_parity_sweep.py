"""Full-registry oracle parity at an arbitrary SF (default sf0.1) in a
foreign (non-UTC, default-conf) session, with a per-query wall budget so
a quadratic DuckDB oracle cannot stall the sweep. Skips are REPORTED,
never silent.

Rationale (round 10): the driver verifies at sf0.01 and the window
mirror covers 50 queries at sf0.1 — this sweep runs ALL oracles at
sf0.1 and caught two real SF-dependent bugs the gates could not:
theil_sen's lower-median rank filter used Spark's double `/` (0 rows
whenever C(|days|,2) was even) and pareto's round(double, 12) hit a
half-ulp boundary where DuckDB's multiply-based round and Spark's
BigDecimal round disagree. Run once per round after registry changes:

    python tools/full_parity_sweep.py [sf_dir] [budget_s]
"""
from __future__ import annotations

import signal
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from dynaledger_spark.plans.registry import load_all  # noqa: E402
from tests.oracle_compare import compare, duck_connection  # noqa: E402


class _Timeout(Exception):
    pass


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("full_parity_sweep")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    duck = duck_connection(sf)

    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    ok = rows_only = 0
    skipped: list[tuple[str, float]] = []
    failed: list[tuple[str, str]] = []
    for name, spec in reg.items():
        t0 = time.time()
        signal.alarm(budget)
        try:
            if spec.oracle is None:
                assert spec.build(spark, sf).count() >= 0
                rows_only += 1
            else:
                compare(spec.build(spark, sf), duck, spec.oracle)
                ok += 1
        except _Timeout:
            skipped.append((name, round(time.time() - t0, 1)))
        except Exception as ex:  # noqa: BLE001 — report and continue
            failed.append((name, str(ex)[:300]))
        finally:
            signal.alarm(0)
            spark.catalog.clearCache()
        print(f"{name}: {round(time.time() - t0, 1)}s", flush=True)
    print(
        f"RESULT sf={sf} ok={ok} rows_only={rows_only} "
        f"skipped={len(skipped)} failed={len(failed)}"
    )
    for n, t in skipped:
        print(f"SKIPPED {n} after {t}s (budget {budget}s)")
    for n, e in failed:
        print(f"FAILED {n}: {e}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
