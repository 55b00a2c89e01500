"""tar.gz staging extraction (S11/S12).

The reference consumes Comprehend job output as ``.tar.gz`` archives:
sentiment output is untarred and its ``output`` member read line-by-
line as JSONL (src/lambda_71.py:16-46); entities output is the same
archive shape read as one whole JSON document (src/lambda_72.py:16-40).

Spark-first re-expression: archives load one-row-per-file via the
``binaryFile`` source, and a ``mapInPandas`` stage opens each archive
in memory (``tarfile`` over ``BytesIO`` — no temp files, no driver
round-trip) emitting one row per JSONL line (with its 0-based
``line_index``, the positional contract Comprehend's ONE_DOC_PER_LINE
mode defines) or one row per member.  Parallelism = number of
archives; each archive is decompressed exactly once, executor-side.
Downstream parsing stays schema-on-read: callers apply ``from_json``
with the explicit result schema, like the reference's hardcoded paths.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

ARCHIVE_LINES_SCHEMA = "archive string, member string, line_index long, line string"
ARCHIVE_TEXT_SCHEMA = "archive string, member string, text string"


def read_targz(
    spark: SparkSession, path: str, glob: str = "*.tar.gz"
) -> DataFrame:
    """Load archives as (path, content) rows via the binaryFile source
    — the S3-notification edge (suffix-filtered ``.tar.gz``,
    main.tf:612-621/660-669) becomes a ``pathGlobFilter``."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )


def _iter_members(
    content: bytes, member: str | None
) -> Iterator[tuple[str, bytes]]:
    with tarfile.open(fileobj=io.BytesIO(content), mode="r:gz") as tar:
        for info in tar:
            if not info.isfile():
                continue
            # match on basename: Comprehend writes the member as
            # 'output' but tools may prefix directories
            name = info.name.rsplit("/", 1)[-1]
            if member is not None and name != member:
                continue
            fh = tar.extractfile(info)
            if fh is None:
                continue
            yield info.name, fh.read()


def extract_targz_lines(
    archives: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    member: str | None = "output",
    encoding: str = "utf-8",
) -> DataFrame:
    """S11: one output row per text line of each matching member.

    ``line_index`` is the 0-based line number within the member — the
    zip-join key for ONE_DOC_PER_LINE sentiment output
    (src/lambda_71.py:38-46 reads the ``output`` member line-by-line).
    Trailing empty lines are skipped, matching the reference's
    ``for line in f`` + per-line ``json.loads`` (which never sees a
    final newline as a document).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, members, idxs, lines = [], [], [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for name, data in _iter_members(bytes(content), member):
                    for i, line in enumerate(
                        data.decode(encoding).splitlines()
                    ):
                        if line == "":
                            continue
                        paths.append(path)
                        members.append(name)
                        idxs.append(i)
                        lines.append(line)
            yield pd.DataFrame(
                {
                    "archive": paths,
                    "member": members,
                    "line_index": pd.array(idxs, dtype="int64"),
                    "line": lines,
                }
            )

    return archives.select(path_col, content_col).mapInPandas(
        run, ARCHIVE_LINES_SCHEMA
    )


def extract_targz_text(
    archives: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    member: str | None = "output",
    encoding: str = "utf-8",
) -> DataFrame:
    """S12: one output row per matching member, whole text — the
    ONE_DOC_PER_FILE entities shape (src/lambda_72.py:34-40 reads the
    extracted file with a single ``json.loads``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, members, texts = [], [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for name, data in _iter_members(bytes(content), member):
                    paths.append(path)
                    members.append(name)
                    texts.append(data.decode(encoding))
            yield pd.DataFrame(
                {"archive": paths, "member": members, "text": texts}
            )

    return archives.select(path_col, content_col).mapInPandas(
        run, ARCHIVE_TEXT_SCHEMA
    )
