"""CLI surface (__main__.py): list / run / explain / output / probe,
driven through main() with an injected session."""

from __future__ import annotations

from distributed_video_analytics_flink_spark.__main__ import main
from tests.conftest import SF_DIR


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary\toracle" in out
    assert "video_motion_batch\trows-only" in out


def test_cli_run_and_explain(spark, capsys):
    assert main(["run", "agg_distinct", "--sf-dir", SF_DIR], spark=spark) == 0
    out = capsys.readouterr().out
    assert "n_userids" in out or "user" in out or "+" in out  # table rendered
    assert main(["run", "agg_distinct", "--sf-dir", SF_DIR, "--explain"], spark=spark) == 0
    assert "HashAggregate" in capsys.readouterr().out
    assert main(["run", "nope_not_a_query"], spark=spark) == 2


def test_cli_run_output(spark, tmp_path, capsys):
    out_path = str(tmp_path / "cli_out")
    assert main(
        ["run", "dedup_fingerprint", "--sf-dir", SF_DIR, "--output", out_path],
        spark=spark,
    ) == 0
    assert spark.read.parquet(out_path).count() > 0


def test_cli_probe_reference_videos(spark, capsys):
    import os

    if not os.path.isdir("/root/reference/dvaf/videos"):
        import pytest

        pytest.skip("reference videos not present in this environment")
    assert main(["probe", "/root/reference/dvaf/videos"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "avc1" in out
