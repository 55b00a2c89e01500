"""S6 JDBC seam — LIVE roundtrip against embedded Apache Derby
(r8 VERDICT "do this" #7).

The reference warehouses episodes in MySQL with batched
``INSERT IGNORE`` (``/root/reference/src/lambda_2.py:205-238``); the
recorded-call tests in test_jdbc_store.py certify the orchestration
but stop at the save boundary.  Spark ships the Derby jars (its Hive
metastore backend), so this module drives the REAL
``df.write.jdbc`` / ``spark.read.jdbc`` path end to end:

    write → read-back → idempotent re-write → overlapping batch

against an on-disk embedded database.  Skipped with a reason when the
Derby driver is absent (non-Spark-distribution classpaths).
"""

from __future__ import annotations

import pytest

from serverless_podcast_etl_spark.sources.jdbc import JdbcTableStore

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def store(spark, tmp_path):
    # keep derby.log out of the repo root: Derby fixes its home (and
    # log destination) at ENGINE BOOT, which the availability probe's
    # Class.forName already triggers via driver autoload — so the
    # property must be set before the probe, not merely before the
    # first connection
    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    if not _derby_available(spark):
        pytest.skip(f"{_DRIVER} not on the JVM classpath")
    return JdbcTableStore(
        spark,
        url=f"jdbc:derby:{tmp_path}/wh;create=true",
        properties={"driver": _DRIVER},
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "episode_id bigint, podcast_id bigint, episode_title string"
    )


def test_derby_write_readback_idempotent_rewrite(spark, store):
    table = "episodes"
    # mode=append auto-creates the table on first write — the
    # bootstrap step (the reference provisions its MySQL DDL via
    # Terraform; insert_ignore, like the reference's executemany,
    # assumes the table exists because it reads back its keys)
    store.append(table, _batch(spark, [(1, 10, "intro")]))

    first = _batch(
        spark, [(1, 10, "intro"), (2, 10, "follow-up"), (3, 11, "pilot")]
    )
    # INSERT IGNORE: key 1 already stored → only 2 and 3 land
    assert store.insert_ignore(table, first, keys=["episode_id"]) == 2

    back = store.read(table)
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, 10, "intro"),
        (2, 10, "follow-up"),
        (3, 11, "pilot"),
    ]
    # column-pruned key read-back (the scan insert_ignore issues)
    keys_only = store.read(table, columns=["episode_id"])
    assert keys_only.columns == ["episode_id"]
    assert sorted(r[0] for r in keys_only.collect()) == [1, 2, 3]

    # idempotent re-write: the exact batch again appends NOTHING —
    # the reference's INSERT IGNORE rerun-noop contract
    assert store.insert_ignore(table, first, keys=["episode_id"]) == 0
    assert store.read(table).count() == 3

    # overlapping batch: one duplicate key (stale retry) + one new row
    mixed = _batch(spark, [(3, 11, "pilot (retry)"), (4, 11, "finale")])
    assert store.insert_ignore(table, mixed, keys=["episode_id"]) == 1
    assert {r["episode_id"] for r in store.read(table).collect()} == {
        1,
        2,
        3,
        4,
    }
