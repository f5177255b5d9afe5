"""SQL function surface: engine capabilities reachable from ``spark.sql``
(SURVEY.md §7.1 — "SQL names registered via spark.udf.register + temp views
so every capability is reachable from both DataFrame and SQL surfaces").

Two registration layers:

- **Pure-SQL temporary functions** (Spark SQL scalar UDFs, ``CREATE
  TEMPORARY FUNCTION … RETURN <expr>``): the bodies are higher-order-function
  expressions, so they stay fully Catalyst-visible — inlined into the plan,
  codegen'd, never crossing a Python boundary. Covers the reference's
  derivation transforms (T8 day, T9 image path — SURVEY §2.2), content
  fingerprints, token statistics, MinHash shingles, quantized dot/cosine,
  and a 16-bit SimHash identical to ``dedup.py::_simhash_signatures``.
- **One Python UDF** for the numpy motion kernel (``dvaf_motion_boxes``) —
  the SQL-ergonomic form of CV1-CV5. The hot path remains the Arrow-batched
  secondary-sort pipeline in ``operators.video``; per-row dispatch overhead
  here is negligible against the numpy work on ~1 MB frames.

``register_all(spark, sf_dir)`` = functions + testdata temp views, after
which every registered query's semantics can be written as plain SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_video_analytics_flink_spark.operators.dedup import (
    _DUCK_SHINGLES,
    _DUCK_SIMHASH_CTE,
)
from distributed_video_analytics_flink_spark.operators.registry import query
from distributed_video_analytics_flink_spark.schemas import MOTION_BOX
from distributed_video_analytics_flink_spark.sources.tables import register_views

_STOP_ARRAY = "array('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"

# name -> (signature, return type, body). Bodies may repeat subexpressions
# (e.g. split()) — Catalyst's common-subexpression elimination handles the
# scalar ones, and these are the ergonomic forms; the registered queries in
# dedup.py/text_analysis.py keep the hand-hoisted hot-path shapes.
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # T8: UTC day derivation (CassandraService.java:153)
    "dvaf_day": ("ts TIMESTAMP", "STRING", "date_format(ts, 'yyyy-MM-dd')"),
    # T9: image-path formatting (VideoProcessor.java:197-198)
    "dvaf_image_path": (
        "dir STRING, cam STRING, ts TIMESTAMP",
        "STRING",
        "format_string('%s/%s-T-%d.png', dir, cam, unix_millis(ts))",
    ),
    "dvaf_fingerprint": ("t STRING", "STRING", "md5(lower(trim(t)))"),
    "dvaf_ws_tokens": ("t STRING", "INT", "size(split(t, ' '))"),
    "dvaf_stopword_ratio": (
        "t STRING",
        "DOUBLE",
        f"size(filter(split(t, ' '), x -> array_contains({_STOP_ARRAY}, x)))"
        " / cast(size(split(t, ' ')) as double)",
    ),
    # word-3-gram shingles (the MinHash unit in dedup.py). if() guard, not
    # greatest(..., 0): Spark's sequence(1, 0) descends and slice() throws
    # on index 0 — short inputs must return an empty array.
    "dvaf_shingles": (
        "t STRING",
        "ARRAY<STRING>",
        "if(size(split(t, ' ')) < 3, array(),"
        " transform(sequence(1, size(split(t, ' ')) - 2),"
        " i -> concat_ws(' ', slice(split(t, ' '), i, 3))))",
    ),
    # exact-integer quantized dot product (similarity.py::_dot_q, Q=1e12)
    "dvaf_dot_q": (
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
        "BIGINT",
        "aggregate(zip_with(a, b, (x, y) ->"
        " cast(round(cast(x as double) * cast(y as double) * 1e12) as bigint)),"
        " cast(0 as bigint), (acc, v) -> acc + v)",
    ),
    # cosine from quantized dots: the 1e12 scale cancels between num/denom
    "dvaf_cosine": (
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
        "DOUBLE",
        "dvaf_dot_q(a, b) / (sqrt(cast(dvaf_dot_q(a, a) as double))"
        " * sqrt(cast(dvaf_dot_q(b, b) as double)))",
    ),
    # 16-bit SimHash, bit-identical to dedup.py::_simhash_signatures
    "dvaf_simhash16": (
        "t STRING",
        "BIGINT",
        "aggregate("
        " transform(split(t, ' '), tok ->"
        "  cast(conv(substring(md5(tok), 1, 4), 16, 10) as bigint)),"
        " array_repeat(cast(0 as bigint), 16),"
        " (acc, h) -> zip_with(acc, sequence(0, 15),"
        "  (a, b) -> a + if(((h >> b) & 1) = 1, 1, -1)),"
        " acc -> aggregate(zip_with(acc, sequence(0, 15),"
        "  (s, b) -> if(s > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))),"
        "  cast(0 as bigint), (x, y) -> x + y))",
    ),
}


def register_functions(spark: SparkSession) -> None:
    """Register every engine SQL function (idempotent — CREATE OR REPLACE)."""
    for name, (sig, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) RETURNS {ret} RETURN {body}"
        )

    from distributed_video_analytics_flink_spark.functions.motion import detect_motion_boxes

    def _boxes(prev: bytes | None, cur: bytes | None, rows: int, cols: int):
        if cur is None:
            return []
        return detect_motion_boxes(prev, cur, rows, cols)

    spark.udf.register("dvaf_motion_boxes", _boxes, T.ArrayType(MOTION_BOX))

    # UDAF surface: an Arrow-batched grouped-aggregate pandas UDF. Exact
    # percentiles of a group that can't be expressed as algebraic partial
    # aggregates are the canonical custom-UDAF case; pandas median matches
    # SQL quantile_cont(0.5) (midpoint interpolation).
    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    spark.udf.register("dvaf_median", _median)

    # UDTF surface: one input row -> N output rows, SQL-callable as a
    # LATERAL table function. The hot path for shingling stays the JVM-side
    # explode in dedup.py; this is the registration/ergonomics form.
    class _ShingleRows:
        def eval(self, text: str):
            if text is None:
                return
            w = text.split(" ")
            for i in range(max(len(w) - 2, 0)):
                yield i, " ".join(w[i : i + 3])

    spark.udtf.register(
        "dvaf_shingle_rows",
        F.udtf(_ShingleRows, returnType="pos int, shingle string"),
    )


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Functions + testdata temp views: the full SQL-reachable surface."""
    register_functions(spark)
    return register_views(spark, sf_dir)


@query(
    "sql_udf_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
           len(string_split(text, ' ')) AS ws_tokens
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def sql_udf_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked proof of the SQL surface: the fingerprint/token-count
    capabilities invoked purely through ``spark.sql`` over registered views
    and SQL UDFs (no DataFrame-API expressions at the call site)."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, dvaf_fingerprint(text) AS fingerprint,
               dvaf_ws_tokens(text) AS ws_tokens
        FROM documents WHERE doc_id % 7 = 0
        """
    )


@query(
    "sql_udaf_median",
    oracle="""
    SELECT l_returnflag, quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF through the SQL surface: the registered grouped-agg
    pandas UDF aggregates inside a SQL GROUP BY exactly like a built-in.
    Arrow ships each group's column as one batch; partial aggregation does
    not apply (exact medians are holistic), so the shuffle carries raw
    values — the inherent cost of a holistic aggregate, not a plan defect."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, dvaf_median(CAST(l_quantity AS DOUBLE)) AS median_qty
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_udtf_shingles",
    oracle=f"""
    WITH sh AS (SELECT unnest({_DUCK_SHINGLES}) AS shingle FROM documents)
    SELECT shingle, COUNT(*) AS n FROM sh
    GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 20
    """,
)
def sql_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDTF through the SQL surface: LATERAL correlation expands each
    document into its word-3-gram shingle rows, then a plain SQL aggregate
    ranks the commonest shingles — proving one-row-to-N-rows table functions
    compose with the relational surface."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.shingle, COUNT(*) AS n
        FROM documents d, LATERAL dvaf_shingle_rows(d.text) s
        GROUP BY s.shingle ORDER BY n DESC, s.shingle ASC LIMIT 20
        """
    )


@query(
    "sql_udf_simhash",
    oracle=f"""
    WITH {_DUCK_SIMHASH_CTE}
    SELECT doc_id, simhash16 FROM sh
    """,
)
def sql_udf_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash via the SQL scalar UDF — same oracle as ``dedup_simhash``,
    independently re-derived through a per-document higher-order expression
    instead of the explode + 16-conditional-sum aggregation. Two genuinely
    different Spark plans hash-matching one oracle pins both."""
    register_all(spark, sf_dir)
    return spark.sql("SELECT doc_id, dvaf_simhash16(text) AS simhash16 FROM documents")
