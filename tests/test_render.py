"""Render tier: the dashboard HTML is well-formed, bars follow the
data, and the presentation cap rejects unaggregated inputs."""

from __future__ import annotations

import pytest

from databeats_spark.registry import queries
from databeats_spark.render import (
    MAX_ROWS,
    bar_chart_svg,
    distribution_strip_svg,
    render_dashboard,
    table_html,
)
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def test_dashboard_renders_and_is_selfcontained(spark, tmp_path):
    out_file = tmp_path / "dash.html"
    html_text = render_dashboard(spark, SF_SMOKE, out_path=str(out_file))
    assert out_file.exists()
    assert html_text.startswith("<!doctype html>")
    assert html_text.count("<svg") == 4  # three bar charts + distribution strip
    assert html_text.count("<circle") > 0  # the strip's decile dots
    assert "<table>" in html_text  # pricing summary table
    assert "<script" not in html_text and "http" not in html_text  # no external deps


def test_bar_chart_matches_data_order_and_scale(spark):
    df = queries()["top_customers"](spark, SF_SMOKE)
    rows = df.collect()
    svg = bar_chart_svg(df, "c_name", "total_spend", "t")
    # one bar per row, first (largest) bar is the widest
    widths = [
        int(part.split('width="')[1].split('"')[0])
        for part in svg.split("<rect")[1:]
    ]
    assert len(widths) == len(rows)
    assert widths[0] == max(widths)


def test_presentation_cap_rejects_full_tables(spark):
    docs = load_tables(spark, SF_SMOKE, ["lineitem"]).lineitem
    with pytest.raises(ValueError, match="presentation cap"):
        table_html(docs, "raw", max_rows=MAX_ROWS)


def test_html_escapes_values(spark):
    df = spark.createDataFrame([("<b>&x", 1.0)], "label string, v double")
    svg = bar_chart_svg(df, "label", "v", "esc <script>")
    assert "<b>&x" not in svg and "&lt;b&gt;" in svg
    assert "<script>" not in svg


def test_distribution_strip_over_audio_comparison(spark):
    """The fifth reference panel (audio_dashboard's RainCloud,
    app.py:93-97): a per-artist feature distribution renders as one
    box+whisker+decile strip per group, with correct geometry — the
    group with the larger median draws its median tick further right."""
    rows = [("Artist A", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("Artist B", float(v)) for v in (6, 7, 8, 9, 10)
    ]
    df = spark.createDataFrame(rows, "artist_name string, energy double")
    svg = distribution_strip_svg(df, "artist_name", "energy", "Energy distribution")
    assert svg.count('class="box"') == 2  # one strip per artist
    assert svg.count('class="med"') == 2
    assert svg.count('class="dot"') == 26  # 13 quantile dots per strip
    med_xs = [float(p.split('x1="')[1].split('"')[0]) for p in svg.split('<line class="med"')[1:]]
    assert med_xs[0] < med_xs[1]  # A's median (3) left of B's (8)
    assert "Artist A" in svg and "(n=5)" in svg


def test_distribution_strip_caps_groups(spark):
    """The presentation cap applies to the number of GROUPS (one
    collected row per group), not the input size: a million-row input
    with two groups is fine; >MAX_ROWS groups is rejected."""
    import pyspark.sql.functions as F

    many_groups = spark.range(MAX_ROWS + 1).select(
        F.col("id").cast("string").alias("g"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ValueError, match="presentation cap"):
        distribution_strip_svg(many_groups, "g", "v", "too many")
