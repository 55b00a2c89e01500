"""Pre-flight the driver's correctness gate, end to end.

Replicates what the round driver actually does — NOT what the test
suite does: a PLAIN ``SparkSession`` (no engine tuning; the loaders
must self-configure nanos-timestamp handling and UTC — the class of
difference that once bit raw parquet reads), the ``__spark_entry__``
module's ``entry``/``queries``/``oracle_sql`` dicts under their
DRIVER-FACING keys (x-prefixed overflow names included), and the
first-50-sorted window rule.  Every priority entry runs in Spark and,
where oracle-backed, against its DuckDB twin via the same comparator
the tests use.

Usage::

    python tools/preflight_driver.py [sf_dir] [--window-only]

Default sf_dir is the driver's t2 scale (/root/testdata/sf0.01);
``--window-only`` checks just the 50 certified slots (the default
checks every entry, overflow included).  Prints one line per query
and a final PASS/FAIL summary; exits non-zero on any mismatch.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle import compare  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    window_only = "--window-only" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # the driver's session: plain, no tuning
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    entry_rows = mod.entry(spark).count()
    print(f"entry: {entry_rows} rows (smoke {'OK' if entry_rows >= 0 else 'FAIL'})")

    qs = mod.queries()
    sqls = mod.oracle_sql()
    names = sorted(qs)[:50] if window_only else list(qs)
    failures: list[str] = []
    rows_only = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            if name in sqls:
                problems = compare(df, sqls[name], sf_dir)
                status = "match" if not problems else "MISMATCH " + "; ".join(problems)
            else:
                n = df.count()
                assert len(df.schema.fields) > 0
                status = f"rows-only ({n} rows)"
                rows_only += 1
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            status = f"ERROR {type(exc).__name__}: {exc}"
        wall = time.perf_counter() - t0
        print(f"{name}: {status} [{wall:.2f}s]")
        if status.startswith(("MISMATCH", "ERROR")):
            failures.append(name)

    print(
        f"\n{len(names)} checked ({rows_only} rows-only), "
        f"{len(failures)} failures"
    )
    if failures:
        print("FAIL:", ", ".join(failures))
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
