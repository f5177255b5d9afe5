"""Pins for the jusText-family block classifier (operators/web.py::
html_extract_columns): tag-case insensitivity, script/style/comment
removal, nested-tag anchors, the link-density boundary, and the
too-short rule."""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.web import (
    _HTML_MIN_BLOCK_CHARS,
    html_extract_columns,
)


def _extract(spark, html):
    mt, nb, nc, bc = html_extract_columns("html")
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        mt.alias("t"), nb.alias("b"), nc.alias("c"), bc.alias("x")
    ).collect()[0]


def test_uppercase_tags_and_comments(spark):
    r = _extract(
        spark,
        "<HTML><BODY><!-- <p>ghost block</p> -->"
        "<P>An uppercase paragraph with enough characters to keep.</P>"
        "</BODY></HTML>",
    )
    assert r.t == "An uppercase paragraph with enough characters to keep."
    assert (r.b, r.c, r.x) == (1, 1, 0)


def test_script_and_style_subtrees_never_leak(spark):
    r = _extract(
        spark,
        "<body><script>if (a < b) { document.write('<p>x</p>'); }</script>"
        "<style>.nav { color: red } </style>"
        "<p>Real sentence content that is plainly long enough here.</p></body>",
    )
    assert r.t == "Real sentence content that is plainly long enough here."
    assert r.c == 1 and r.b == 1


def test_nested_tags_inside_anchor_count_fully(spark):
    # anchor text = 'bold link text' (14 chars incl. nested <b>);
    # block text = 26 chars -> 4*14 = 56 > 26 -> boilerplate
    r = _extract(
        spark,
        "<body><p>menu <a href='/'><b>bold</b> link text</a> here</p></body>",
    )
    assert r.c == 0 and r.b == 1 and r.x == len("menu bold link text here")


def test_link_density_boundary_is_inclusive(spark):
    # exactly 1/4 link density must be KEPT (4*link == len), with the
    # block also exactly at the 20-char length minimum
    anchor = "linky"  # 5 chars -> block must be 20 chars
    pad = "z" * (4 * len(anchor) - len(f" {anchor} tail"))
    html = f"<body><p>{pad} <a href='/'>{anchor}</a> tail</p></body>"
    r = _extract(spark, html)
    assert len(f"{pad} {anchor} tail") == 4 * len(anchor) == 20
    assert r.c == 1, (r, pad)


def test_min_length_threshold(spark):
    short = "x" * (_HTML_MIN_BLOCK_CHARS - 1)
    keep = "y" * _HTML_MIN_BLOCK_CHARS
    r = _extract(spark, f"<body><p>{short}</p><p>{keep}</p></body>")
    assert r.t == keep and (r.b, r.c, r.x) == (2, 1, len(short))
