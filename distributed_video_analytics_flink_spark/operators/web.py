"""Web-corpus ingest queries: the WARC front door, driver-checked.

The fixture segments are built in-query by the engine's own writer
(``sources/warc.py::build_warc`` — fixed dates, gzip mtime=0, so both
engines and every run see byte-identical input), the same pattern the
audio family uses for its clips: closed-form fixtures, VALUES oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.registry import query

_HTML_A = b"<html><head><title>t</title></head><body>alpha beta gamma</body></html>"
_HTML_B = b"<html><body>delta epsilon</body></html>"


def _fixture_segments() -> dict[str, bytes]:
    """Three deterministic segments: a plain .warc, a gzipped twin with
    different pages, and a truncated segment (readable prefix + tail
    corruption) — the permissive contract is part of the checked
    surface."""
    from distributed_video_analytics_flink_spark.sources.warc import build_warc

    seg_a = build_warc(
        [
            dict(warc_type="warcinfo", body=b"software: dvafs-fixture\r\n"),
            dict(
                warc_type="response",
                target_uri="http://fixture.example/a",
                http_body=_HTML_A,
                status=200,
            ),
            dict(
                warc_type="request",
                target_uri="http://fixture.example/a",
                body=b"GET /a HTTP/1.1\r\n",
                content_type="application/http; msgtype=request",
            ),
        ]
    )
    seg_b = build_warc(
        [
            dict(
                warc_type="response",
                target_uri="http://fixture.example/b",
                http_body=_HTML_B,
                status=200,
            ),
            dict(
                warc_type="response",
                target_uri="http://fixture.example/gone",
                http_body=b"not here",
                status=404,
            ),
        ],
        gzipped=True,
    )
    good = build_warc(
        [
            dict(
                warc_type="response",
                target_uri="http://fixture.example/c",
                http_body=b"ok",
                status=200,
            ),
            dict(
                warc_type="response",
                target_uri="http://fixture.example/cut",
                http_body=b"x" * 64,
                status=200,
            ),
        ]
    )
    seg_c = good[:-40]  # second record's payload truncated
    return {"seg-a.warc": seg_a, "seg-b.warc.gz": seg_b, "seg-c.warc": seg_c}


@query(
    "corpus_warc_ingest",
    oracle="""
    SELECT * FROM (VALUES
      ('seg-a.warc',    'warcinfo', CAST(NULL AS VARCHAR),        CAST(NULL AS INTEGER), 'ok'),
      ('seg-a.warc',    'response', 'http://fixture.example/a',   200, 'ok'),
      ('seg-a.warc',    'request',  'http://fixture.example/a',   CAST(NULL AS INTEGER), 'ok'),
      ('seg-b.warc.gz', 'response', 'http://fixture.example/b',   200, 'ok'),
      ('seg-b.warc.gz', 'response', 'http://fixture.example/gone', 404, 'ok'),
      ('seg-c.warc',    'response', 'http://fixture.example/c',   200, 'ok'),
      ('seg-c.warc',    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), 'WarcError')
    ) AS t(segment, warc_type, target_uri, http_status, err_class)
    """,
)
def corpus_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC segment ingest end-to-end as driver evidence: the engine's
    own writer builds three deterministic segments (plain, gzipped
    member layout, truncated), ``spark.read.format("warc")`` parses them
    — one InputPartition per segment, records materialized inside the
    partition — and the projected rows are VALUES-pinned: every record
    of every layout, the HTTP status surfaced from application/http
    payloads, gzip transparency (seg-b parses identically to plain),
    and the permissive-tail contract (seg-c yields its readable prefix
    PLUS one error row instead of a dead task).

    100 TB shape: Common Crawl is ~100k segments x ~1 GB per crawl —
    the per-file partition model IS the layout's natural parallelism;
    the projection drops ``body`` before any exchange, so page bytes
    never move between executors (they do cross the one Python->JVM
    Arrow hop — the Python Data Source API doesn't push projection into
    the reader; see sources/warc_datasource.py for the honest
    accounting)."""
    import os
    import shutil
    import tempfile

    from distributed_video_analytics_flink_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)
    root = tempfile.mkdtemp(prefix="dvafs-warc-")
    try:
        seg_dir = os.path.join(root, "segments")
        os.makedirs(seg_dir)
        for name, blob in _fixture_segments().items():
            with open(os.path.join(seg_dir, name), "wb") as fh:
                fh.write(blob)
        rows = (
            spark.read.format("warc")
            .load(seg_dir)
            .select(
                "segment",
                "warc_type",
                "target_uri",
                "http_status",
                F.coalesce(
                    F.substring_index("error", ":", 1), F.lit("ok")
                ).alias("err_class"),
            )
            .collect()  # bounded: 7 fixture records
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        "segment string, warc_type string, target_uri string,"
        " http_status int, err_class string",
    )


@query(
    "corpus_warc_text_stats",
    oracle="""
    SELECT * FROM (VALUES
      ('http://fixture.example/a', 't alpha beta gamma', CAST(4 AS BIGINT)),
      ('http://fixture.example/b', 'delta epsilon',    CAST(2 AS BIGINT)),
      ('http://fixture.example/c', 'ok',               CAST(1 AS BIGINT))
    ) AS t(target_uri, text, n_tokens)
    """,
)
def corpus_warc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC leg composed into the text pipeline: 200-status
    text/html responses -> crude tag-strip text extraction (the
    regexp_replace baseline every corpus build starts from before a
    real boilerplate remover) -> whitespace token counts, all inside
    Catalyst — decode/regexp/split never leave the JVM, and because the
    projection touches only http-filtered rows, the warcinfo/request/
    error records are dropped at the scan edge.

    VALUES-pinned end to end: extracted text AND token counts for every
    qualifying page across all three fixture layouts (plain, gzip,
    truncated-tail) — the 404 page and the truncated record must NOT
    appear. 100 TB shape: one scan of the segment directory, filter +
    projection only; the extracted text column is what feeds
    text_quality_score / text_langid / dedup downstream."""
    import os
    import shutil
    import tempfile

    from distributed_video_analytics_flink_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)
    root = tempfile.mkdtemp(prefix="dvafs-warctext-")
    try:
        seg_dir = os.path.join(root, "segments")
        os.makedirs(seg_dir)
        for name, blob in _fixture_segments().items():
            with open(os.path.join(seg_dir, name), "wb") as fh:
                fh.write(blob)
        text = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.decode("body", "UTF-8"), "<[^>]*>", " "),
                "\\s+",
                " ",
            )
        )
        rows = (
            spark.read.format("warc")
            .load(seg_dir)
            .filter(
                (F.col("http_status") == 200)
                & F.col("http_content_type").startswith("text/html")
            )
            .select(
                "target_uri",
                text.alias("text"),
                F.size(F.split(text, " ")).cast("long").alias("n_tokens"),
            )
            .collect()  # bounded: 3 qualifying fixture pages
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [tuple(r) for r in rows], "target_uri string, text string, n_tokens long"
    )
