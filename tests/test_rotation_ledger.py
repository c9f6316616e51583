"""Mechanical window-debt ledger (VERDICT r8 item 7).

The driver's CORRECTNESS gate covers only ``registry()[:50]``; a query
that never earns a driver-green row is verified only by local gates.
That debt used to be tracked as hand-maintained prose in CLAUDE.md (28
entries by r9). These pins make it mechanical: a registry query with no
clean row in ANY committed ``CORRECTNESS_r*.json`` MUST sit inside the
current ``_WINDOW`` — adding a query without rotating it into the
window is a test failure, not an editorial note.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.rotation_report import ledger  # noqa: E402


def test_never_verified_queries_are_in_current_window():
    led = ledger()
    uncovered = led["uncovered_never_verified"]
    assert not uncovered, (
        "registry queries with no driver-green row in any "
        f"CORRECTNESS_r*.json are outside the front-50 window: {uncovered} "
        "— prepend them to _WINDOW in databeats_spark/registry/__init__.py"
    )


def test_ledger_shape_is_sane():
    from databeats_spark.registry import registry

    led = ledger()
    assert led["registry_size"] >= 263  # never shrinks round-over-round
    assert len(led["current_window"]) == 50
    assert len(led["recommended_front_50"]) == 50
    # every window / recommendation name is a real registry query
    # (ADVICE r9: the old union-with-itself assertion was a tautology)
    names = {s.name for s in registry()}
    assert set(led["current_window"]) <= names
    assert set(led["recommended_front_50"]) <= names


def test_every_rows_only_tier_has_an_oracle_carrying_twin():
    """The certifying-twin mapping must be TOTAL: a rows-only
    approximate tier with no *_exact twin has no correctness
    certificate at all, and a twin without an oracle certifies
    nothing (VERDICT r11 item 3)."""
    from databeats_spark.registry import certifying_twins, registry

    specs = {s.name: s for s in registry()}
    twins = certifying_twins()
    rows_only = {n for n, s in specs.items() if not s.has_oracle}
    assert set(twins) == rows_only, (
        f"rows-only tiers without a certifying twin: {rows_only - set(twins)}"
    )
    for tier, twin in twins.items():
        assert specs[twin].has_oracle, f"{twin} certifies {tier} but has no oracle"


def test_stale_certifying_twins_are_in_current_window():
    """A twin whose hash-green is older than TWIN_MAX_AGE rounds is a
    silently aging certificate for its approximate tier — it must hold
    a window slot until re-certified."""
    led = ledger()
    assert not led["uncovered_stale_twins"], (
        "certifying twins with certificates older than the staleness "
        f"bound sit outside the front-50 window: {led['uncovered_stale_twins']}"
        " — prepend them to _WINDOW"
    )


def test_changed_queries_are_in_current_window():
    """A query whose builder or oracle changed this round has green
    history that covers NOTHING — it must re-certify. Mechanized in
    r11 (previously a CLAUDE.md precedent the report could not see)."""
    led = ledger()
    assert not led["uncovered_changed"], (
        "CHANGED_QUERIES outside the front-50 window: "
        f"{led['uncovered_changed']} — prepend them to _WINDOW"
    )
