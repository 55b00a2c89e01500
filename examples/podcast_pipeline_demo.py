"""Runnable end-to-end demo: feeds → warehouse → dashboard queries.

Usage:  python examples/podcast_pipeline_demo.py [warehouse_dir]

Builds the synthetic RSS + audio fixtures the test suite uses, runs
the full batch pipeline (ingest → chunk/transcribe/reduce → NLP
alignment → dimension loads), then answers the reference dashboard's
queries from the loaded warehouse — the workflow a user of the
reference runs, end to end on Spark.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_podcast_etl_spark.pipeline import analytics  # noqa: E402
from serverless_podcast_etl_spark.pipeline.runner import (  # noqa: E402
    run_full_pipeline,
)
from serverless_podcast_etl_spark.pipeline.warehouse import Warehouse  # noqa: E402
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="wh_")
    spark = get_spark(app_name="podcast-pipeline-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from fixtures import make_audio, make_rss_docs  # noqa: E402

    wh = Warehouse(spark, root)
    counts = run_full_pipeline(
        wh,
        make_rss_docs(spark),
        make_audio(spark, episode_ids=[1, 2, 3], chunk_bytes=200),
        chunk_bytes=200,
    )
    print(f"warehouse at {root}; rows loaded: {counts}")

    pods = wh.read("podcast_dimension")
    eps = wh.read("episode_dimension")
    sents = wh.read("sentence_dimension")
    ents = wh.read("entity_dimension")

    print("\n-- podcasts --")
    analytics.distinct_podcasts(pods).show(truncate=False)
    etype = ents.filter("episode_id = 1").groupBy("entity_type").count().orderBy(
        "count", ascending=False
    ).first()["entity_type"]
    print(f"-- top {etype} mentions (episode 1) --")
    analytics.entity_mention_counts(ents, episode_id=1, entity_type=etype).show(
        5, truncate=False
    )
    print(f"-- sentiment distribution (episode 1, {etype}) --")
    analytics.sentiment_distribution(
        ents, sents, episode_id=1, entity_type=etype
    ).show()
    print("-- rolling sentiment series (episode 1, first rows) --")
    analytics.sentiment_timeseries(sents, episode_id=1).show(5)
    print("-- next undownloaded episode of first podcast --")
    title = pods.orderBy("podcast_id").first()["podcast_title"]
    analytics.next_undownloaded_episode(eps, pods, title).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
