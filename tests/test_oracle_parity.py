"""Oracle-parity gate (local mirror of the driver's t2 check): every
registered query with an oracle must hash-match DuckDB on the same tables;
oracle-less queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from distributed_video_analytics_flink_spark import operators as ops
from tests.conftest import ORACLE_SF_DIR
from tests.oracle_harness import compare, diff_sample, duck_connection

_SPECS = list(ops.QUERIES.values())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(ORACLE_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("spec", [s for s in _SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_match(spark, duck, spec):
    df = spec.fn(spark, ORACLE_SF_DIR)
    result = compare(df, duck, spec.oracle)
    if not result["hash_match"]:
        only_spark, only_duck = diff_sample(spec.fn(spark, ORACLE_SF_DIR), duck, spec.oracle)
        pytest.fail(
            f"{spec.name}: {result}\n  only-spark: {only_spark}\n  only-duck: {only_duck}"
        )


@pytest.mark.parametrize("spec", [s for s in _SPECS if not s.oracle], ids=lambda s: s.name)
def test_rows_only(spark, spec):
    df = spec.fn(spark, ORACLE_SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_documents_fixture_is_ascii():
    """Fixture contract for multimodal_binary_features' oracle: its DuckDB
    side reads codepoints (ascii()) while the Spark side reads utf-8
    bytes — identical on pure-ASCII text, silently divergent past it.
    Pure ASCII iff the utf-8 encoding adds no bytes (every multi-byte
    codepoint would). Checked at every generated scale factor so a
    testdata regeneration cannot un-notice the assumption (ADVICE r5)."""
    import glob

    import duckdb

    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "no documents fixtures found"
    con = duckdb.connect()
    for path in paths:
        (n_non_ascii,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()
        assert n_non_ascii == 0, (
            f"{path}: {n_non_ascii} non-ASCII documents — "
            "multimodal_binary_features' oracle must move to byte-based "
            "stats (encode(text)) before this fixture is used"
        )
    con.close()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every oracle key must exist in queries
    qs = e.queries()
    for name in e.oracle_sql():
        assert name in qs


def test_documents_fixture_has_no_empty_text():
    """Fixture contract for multimodal_image_roundtrip, kept as
    defense-in-depth: the empty-text oracle divergence itself is FIXED
    as of r15 (the oracle now computes ``GREATEST(CEIL(len/192), 1)``,
    matching the engine's ``max(1, ceil(len/192))`` clamp on all inputs),
    but a NULL text would still crash the engine's mapInPandas roundtrip
    (``bytes(None)``) while the oracle emits a NULL row — so a testdata
    regeneration that introduces empty/null text fails HERE, loudly,
    instead of hash-mismatching a driver round."""
    import glob

    import duckdb

    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "no documents fixtures found"
    con = duckdb.connect()
    for path in paths:
        (n_empty,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            "WHERE text IS NULL OR length(text) = 0"
        ).fetchone()
        assert n_empty == 0, f"{path}: {n_empty} empty/null texts"
