"""README's and COVERAGE.md's registry counts must match the live
registry (no doc drift — r9 VERDICT #4 extended the guard to COVERAGE.md
after its counts silently went stale)."""

import re

from distributed_video_analytics_flink_spark.operators import QUERIES, oracle_sql

README = "/root/repo/README.md"
COVERAGE = "/root/repo/COVERAGE.md"


def test_readme_query_counts_match_registry():
    text = open(README).read()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "README lost its registered-queries count line"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(QUERIES)} — "
        "update README.md's package map"
    )
    m = re.search(r"(\d+) with DuckDB\s+oracles", text)
    assert m, "README lost its oracle count line"
    assert int(m.group(1)) == len(oracle_sql()), (
        f"README says {m.group(1)} oracles, registry has {len(oracle_sql())}"
    )


def test_coverage_query_counts_match_registry():
    text = open(COVERAGE).read()
    m = re.search(r"(\d+) registered queries, (\d+)\s+with oracles", text)
    assert m, "COVERAGE.md lost its registry count line"
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(QUERIES)}"
    )
    assert int(m.group(2)) == len(oracle_sql()), (
        f"COVERAGE.md says {m.group(2)} oracles, registry has {len(oracle_sql())}"
    )


def test_no_other_stale_registry_counts():
    """Any OTHER 'N registered queries' phrase in the two docs must also
    carry the live count — one guard for every future count mention."""
    for path in (README, COVERAGE):
        for m in re.finditer(r"(\d+) registered queries", open(path).read()):
            assert int(m.group(1)) == len(QUERIES), (
                f"{path} has a stale count: {m.group(0)}"
            )
