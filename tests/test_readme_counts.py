"""README's registry counts must match the live registry (no doc drift)."""

import re

from distributed_video_analytics_flink_spark.operators import QUERIES, oracle_sql

README = "/root/repo/README.md"


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
