"""S6 JDBC seam: orchestration contract tested with recorded
reader/writer calls (no JDBC driver jar ships in this container; the
live path is ``df.write.jdbc`` mode=append, exercised here up to the
save boundary)."""

from __future__ import annotations

import pytest

from serverless_podcast_etl_spark.sources.jdbc import JdbcTableStore


class RecordingStore(JdbcTableStore):
    """Overrides the two I/O edges; everything between (key pruning,
    batch dedup, anti-join, append gating) runs for real in Spark."""

    def __init__(self, spark, existing_df):
        super().__init__(
            spark, url="jdbc:mysql://example.invalid:3306/wh"
        )
        self._existing = existing_df
        self.read_calls: list[tuple[str, list[str] | None]] = []
        self.appended: list[tuple[str, list[tuple]]] = []

    def read(self, table, columns=None):
        self.read_calls.append((table, columns))
        return self._existing.select(*columns) if columns else self._existing

    def append(self, table, df):
        self.appended.append((table, sorted(tuple(r) for r in df.collect())))


@pytest.fixture()
def existing(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b")], "podcast_id long, podcast_title string"
    )


def test_insert_ignore_appends_only_new_keys(spark, existing):
    store = RecordingStore(spark, existing)
    incoming = spark.createDataFrame(
        [(2, "b-dup"), (3, "c"), (3, "c-again"), (4, "d")],
        "podcast_id long, podcast_title string",
    )
    n = store.insert_ignore("podcast_dimension", incoming, keys=["podcast_id"])
    # key 2 exists; 3 dedups within the batch (first wins); 3+4 append
    assert n == 2
    [(table, rows)] = store.appended
    assert table == "podcast_dimension"
    assert [r[0] for r in rows] == [3, 4]
    # the existing-side read must be pruned to the key columns only
    assert store.read_calls == [("podcast_dimension", ["podcast_id"])]


def test_insert_ignore_noop_skips_write(spark, existing):
    store = RecordingStore(spark, existing)
    dup = spark.createDataFrame(
        [(1, "a"), (2, "b")], "podcast_id long, podcast_title string"
    )
    assert store.insert_ignore("podcast_dimension", dup, keys=["podcast_id"]) == 0
    assert store.appended == []  # re-delivery is a no-op, no JDBC write


def test_key_pruned_read_selects_columns(spark):
    """Pruning is a .select on the loaded relation — Spark pushes the
    projection into the JDBC query with dialect-correct quoting (a
    hand-built unquoted subquery broke against Derby's quoted
    identifiers; see tests/test_jdbc_derby_roundtrip.py)."""
    store = JdbcTableStore(spark, url="jdbc:mysql://example.invalid/wh")
    reader_conf = {}
    selected = []

    class FakeFrame:
        def select(self, *cols):
            selected.append(list(cols))
            return self

    # capture the options the reader would send without loading
    class FakeReader:
        def format(self, fmt):
            reader_conf["format"] = fmt
            return self

        def option(self, k, v):
            reader_conf[k] = v
            return self

        def load(self):
            return FakeFrame()

    store.spark = type("S", (), {"read": FakeReader()})()
    store.read("episode_dimension", columns=["link"])
    assert reader_conf["format"] == "jdbc"
    assert reader_conf["dbtable"] == "episode_dimension"
    assert reader_conf["url"].startswith("jdbc:mysql://")
    assert selected == [["link"]]


def test_natural_keys_default(spark, existing):
    # omitting keys falls back to the schema's natural UNIQUE key
    store = RecordingStore(spark, existing.select("podcast_title"))
    incoming = spark.createDataFrame(
        [(9, "a"), (10, "z")], "podcast_id long, podcast_title string"
    )
    n = store.insert_ignore("podcast_dimension", incoming)
    assert n == 1  # "a" exists by natural key (podcast_title), "z" is new
    assert store.read_calls[0] == ("podcast_dimension", ["podcast_title"])
