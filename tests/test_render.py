"""Render tier: the dashboard HTML is well-formed, bars follow the
data, and the presentation cap rejects unaggregated inputs."""

from __future__ import annotations

import pytest

from databeats_spark.registry import queries
from databeats_spark.render import MAX_ROWS, bar_chart_svg, render_dashboard, table_html
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def test_dashboard_renders_and_is_selfcontained(spark, tmp_path):
    out_file = tmp_path / "dash.html"
    html_text = render_dashboard(spark, SF_SMOKE, out_path=str(out_file))
    assert out_file.exists()
    assert html_text.startswith("<!doctype html>")
    assert html_text.count("<svg") == 3  # three bar-chart sections
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
