"""Dump ``.explain("formatted")`` for catalog queries to text files.

Measurement-only helper for the optimization rounds: captures the
physical plan of every headline query (plus any extra names given)
into ``plans/<tag>/<query>_<suffix>.txt`` so plan-shape claims in
OPTIMIZATION notes are checkable without running Spark.

Usage::

    python tools/dump_plans.py r15 before            # all HEADLINE
    python tools/dump_plans.py r15 after q62 q97     # selected queries
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_podcast_etl_spark.plans.catalog import CATALOG  # noqa: E402
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plans.py <tag> <suffix> [qNN ...]")
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    import bench

    if names:
        picked = []
        for a in names:
            match = [
                n for n in sorted(CATALOG)
                if n == a or n.split("_", 1)[0] == a
            ]
            if not match:
                raise SystemExit(f"no catalog query matches {a!r}")
            picked.extend(match)
    else:
        picked = list(bench.HEADLINE)
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dump_plans", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in picked:
        df = CATALOG[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
