"""The driver checks only the first 50 registered queries; registration
order is keyed on least-recently-driver-checked evidence read from the
CORRECTNESS_r*.json files. That rotation logic is load-bearing for the
round cadence (every query must re-earn green rows every few rounds), so
its row-classification rules are pinned here against synthetic files.
"""

from __future__ import annotations

import json

from distributed_video_analytics_flink_spark.operators import _last_checked_round


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 5, "oracle_rows": 5, "err": None}
HASH_FAIL = {**GREEN, "hash_match": False}
ERR = {"rows_match": None, "schema_match": None, "hash_match": None,
       "spark_rows": None, "oracle_rows": None, "err": "AnalysisException: boom"}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 40, "oracle_rows": None, "err": "no_oracle"}


def test_green_rows_count_latest_round_wins(tmp_path):
    _write(tmp_path, 1, {"q_a": GREEN, "q_b": GREEN})
    _write(tmp_path, 3, {"q_a": GREEN})
    last = _last_checked_round(str(tmp_path))
    assert last == {"q_a": 3, "q_b": 1}


def test_failed_rows_are_not_evidence(tmp_path):
    _write(tmp_path, 2, {"q_hash_fail": HASH_FAIL, "q_err": ERR, "q_ok": GREEN})
    last = _last_checked_round(str(tmp_path))
    assert "q_hash_fail" not in last  # must re-enter the window
    assert "q_err" not in last
    assert last["q_ok"] == 2


def test_rows_only_counts_as_checked(tmp_path):
    _write(tmp_path, 2, {"q_stream": ROWS_ONLY})
    assert _last_checked_round(str(tmp_path)) == {"q_stream": 2}


def test_failure_after_green_still_reenters_window(tmp_path):
    """A regression (green in r1, broken by r3) must not hide behind the old
    evidence: the max round only advances on green rows, but ordering uses
    the green round — the query sorts with its r1 evidence, ahead of
    queries green in later rounds. (The r3 NTZ regression scenario.)"""
    _write(tmp_path, 1, {"q_regressed": GREEN, "q_fresh": GREEN})
    _write(tmp_path, 3, {"q_regressed": ERR, "q_fresh": GREEN})
    last = _last_checked_round(str(tmp_path))
    assert last["q_regressed"] == 1  # stale evidence -> early window slot
    assert last["q_fresh"] == 3


def test_corrupt_file_degrades_gracefully(tmp_path):
    (tmp_path / "CORRECTNESS_r05.json").write_text("{not json")
    _write(tmp_path, 6, {"q_a": GREEN})
    assert _last_checked_round(str(tmp_path)) == {"q_a": 6}


def test_missing_dir_returns_empty(tmp_path):
    assert _last_checked_round(str(tmp_path / "nope")) == {}


# --- source-hash binding (ADVICE r4: a rewrite must invalidate evidence) ---

from distributed_video_analytics_flink_spark.operators import (  # noqa: E402
    _SIDECAR,
    _query_source_hash,
)
from distributed_video_analytics_flink_spark.operators.registry import (  # noqa: E402
    QUERIES,
)

REAL = "pricing_summary"  # any long-lived registered query


def test_first_observation_records_current_hash_and_counts(tmp_path):
    _write(tmp_path, 2, {REAL: GREEN})
    last = _last_checked_round(str(tmp_path))
    assert last[REAL] == 2
    sidecar = json.loads((tmp_path / _SIDECAR).read_text())
    assert sidecar[REAL]["2"] == _query_source_hash(QUERIES[REAL])


def test_rewritten_query_loses_its_evidence(tmp_path):
    _write(tmp_path, 2, {REAL: GREEN})
    (tmp_path / _SIDECAR).write_text(
        json.dumps({REAL: {"2": "hash-of-the-old-source"}})
    )
    last = _last_checked_round(str(tmp_path))
    assert REAL not in last  # re-enters the window immediately
    # and the stale record is NOT overwritten: the old round stays invalid
    sidecar = json.loads((tmp_path / _SIDECAR).read_text())
    assert sidecar[REAL]["2"] == "hash-of-the-old-source"


def test_matching_hash_keeps_evidence(tmp_path):
    _write(tmp_path, 3, {REAL: GREEN})
    (tmp_path / _SIDECAR).write_text(
        json.dumps({REAL: {"3": _query_source_hash(QUERIES[REAL])}})
    )
    assert _last_checked_round(str(tmp_path))[REAL] == 3


def test_unregistered_names_count_without_hash_binding(tmp_path):
    """Synthetic/renamed names can't be hash-bound (no source to hash) and
    must not be dropped — they also must not create sidecar entries."""
    _write(tmp_path, 2, {"q_not_registered": GREEN})
    assert _last_checked_round(str(tmp_path)) == {"q_not_registered": 2}
    assert not (tmp_path / _SIDECAR).exists()
