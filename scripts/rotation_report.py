#!/usr/bin/env python
"""Driver-window rotation report.

The grading driver's CORRECTNESS gate checks only ``registry()[:50]``.
This script unions every recorded ``CORRECTNESS_r*.json``, reports
which registry queries have never earned a driver-green row, and
prints the recommended front-50 for the NEXT round: never-verified
queries first (oracle-carrying before rows-only), then any bench
headliner whose green row is NOT from the latest recorded round (a
headliner is never more than one round stale, but a just-re-certified
one doesn't burn a slot — r10 policy), then the STALEST green rows
first, so re-verification debt retires oldest-first and every query's
latest green row keeps cycling forward.

Run at the start of each round; mirror its recommendation in
``databeats_spark/registry/__init__.py``'s ``_WINDOW``. Queries whose
builder or oracle changed mid-round should be PREPENDED to ``_WINDOW``
as they land (they carry fresh regression risk no history covers).

``--json`` additionally writes the machine-readable ledger to
``artifacts/ROTATION.json`` (VERDICT r8 item 7); the companion pytest
``tests/test_rotation_ledger.py`` recomputes the same ledger and FAILS
when a never-driver-verified query is outside the current window — the
stale-verification risk is mechanical, not editorial prose in CLAUDE.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_rounds(repo: str = REPO) -> dict[str, int]:
    """name -> latest round with a CLEAN driver row.

    A row only counts as a driver signal when it is clean: hard errors
    (err carries a traceback) and explicit mismatches must re-enter the
    window until green. ``err == "no_oracle"`` rows (rows-only checks)
    count — that is the strongest signal the driver can give them.
    """
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        data = json.load(open(path))
        rows = data.get("queries", data)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") not in (None, "no_oracle"):
                continue
            if False in (row.get("rows_match"), row.get("schema_match"), row.get("hash_match")):
                continue
            last_green[name] = max(rnd, last_green.get(name, 0))
    return last_green


# A certifying twin older than this many rounds gets a forced window
# slot (same mechanism as a stale bench headliner). The bound mirrors
# the "max oracle staleness under ~4 rounds" steady-state target: the
# twin IS the approximate tier's correctness certificate, so its age is
# the tier's certificate age (VERDICT r11 item 3).
TWIN_MAX_AGE = 3


def ledger() -> dict:
    """Machine-readable rotation state over the live registry."""
    from databeats_spark.registry import CHANGED_QUERIES, certifying_twins, registry

    last_green = driver_green_rounds()
    latest_round = max(last_green.values(), default=0)
    specs = list(registry())
    index_of = {s.name: i for i, s in enumerate(specs)}  # O(1) sort key
    oracle_flags = {s.name: s.has_oracle for s in specs}
    never = [s.name for s in specs if s.name not in last_green]
    front = [s for s in specs if s.name in never and s.has_oracle]
    front += [s for s in specs if s.name in never and not s.has_oracle]
    # Bench headliners get a forced slot only when their latest green
    # row is NOT from the latest recorded round (r10 policy, VERDICT r9
    # item 1): a headliner the driver just re-certified doesn't need to
    # burn a slot the staleness burn-down could use — it re-enters the
    # moment it is one round stale, so a headliner is never more than
    # one round behind while ~14 extra slots per round retire old debt.
    in_front = {s.name for s in front}
    # Changed-this-round queries re-certify ahead of headliners: their
    # green history predates the change, so it covers nothing (r11 —
    # previously a CLAUDE.md precedent the report could not see).
    for s in specs:
        if s.name in CHANGED_QUERIES and s.name not in in_front:
            front.append(s)
            in_front.add(s.name)
    # Certifying twins whose hash-green is older than TWIN_MAX_AGE
    # re-certify with forced slots, oldest first: the approximate tier
    # they certify is rows-only forever, so the twin's staleness IS the
    # tier's certificate staleness (VERDICT r11 item 3).
    twins = certifying_twins()
    twin_staleness = {
        tier: {
            "twin": twin,
            "tier_last_green": last_green.get(tier, 0),
            "twin_last_green": last_green.get(twin, 0),
            "certificate_age": latest_round - last_green.get(twin, 0),
        }
        for tier, twin in sorted(twins.items())
    }
    stale_twins = sorted(
        (t["twin"] for t in twin_staleness.values() if t["certificate_age"] > TWIN_MAX_AGE),
        key=lambda n: (last_green.get(n, 0), index_of[n]),
    )
    for name in stale_twins:
        if name not in in_front:
            front.append(specs[index_of[name]])
            in_front.add(name)
    for s in specs:
        if s.bench and s.name not in in_front and last_green.get(s.name, 0) < latest_round:
            front.append(s)
            in_front.add(s.name)
    by_age = sorted(
        (s for s in specs if s.name not in in_front),
        key=lambda s: (last_green.get(s.name, 0), index_of[s.name]),
    )
    for s in by_age:
        if len(front) >= 50:
            break
        front.append(s)
    window = [s.name for s in specs[:50]]
    recommended = [s.name for s in front[:50]]
    return {
        "registry_size": len(specs),
        "never_driver_verified": never,
        "last_green_round": last_green,
        "has_oracle": oracle_flags,
        "current_window": window,
        "recommended_front_50": recommended,
        "window_misses_recommendation": [n for n in recommended if n not in set(window)],
        "uncovered_never_verified": [n for n in never if n not in set(window)],
        "changed_queries": list(CHANGED_QUERIES),
        "uncovered_changed": [n for n in CHANGED_QUERIES if n not in set(window)],
        "twin_staleness": twin_staleness,
        "stale_twins": stale_twins,
        "uncovered_stale_twins": [n for n in stale_twins if n not in set(window)],
    }


def main() -> None:
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        rows = rows.get("queries", rows)
        print(f"{os.path.basename(path)}: {len(rows)} rows")

    led = ledger()
    print(f"\nregistry: {led['registry_size']} queries; "
          f"never driver-verified: {len(led['never_driver_verified'])}")
    for n in led["never_driver_verified"]:
        print(f"  {n} ({'oracle' if led['has_oracle'].get(n) else 'rows-only'})")

    print("\ncertifying-twin staleness (certificate age in rounds):")
    for tier, t in led["twin_staleness"].items():
        flag = "  <-- FORCED (stale)" if t["twin"] in set(led["stale_twins"]) else ""
        print(f"  {tier:28s} twin green r{t['twin_last_green']:<2d} age {t['certificate_age']}{flag}")

    print("\nrecommended front-50 for next round:")
    for i, n in enumerate(led["recommended_front_50"]):
        print(f"  {i:2d} {n}")
    missing = led["window_misses_recommendation"]
    print(f"\ncurrent window misses {len(missing)} of the recommendation: {missing}")

    if "--json" in sys.argv:
        out = os.path.join(REPO, "artifacts", "ROTATION.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(led, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
