"""The driver oracle-checks the first 50 entries of __spark_entry__.queries();
_ordered() must rotate that window from recorded CORRECTNESS history so every
registered query eventually gets an official row: latest-check-not-green
first (fix re-confirmation — a standing red row outranks exploration),
then never-checked, then green oldest-check-first.
"""

from __future__ import annotations

import __spark_entry__ as entry


def _row(green=True, err=None):
    return {
        "rows_match": green,
        "schema_match": green,
        "hash_match": green,
        "err": err,
    }


def test_window_excludes_previously_green(monkeypatch):
    names = {f"q{i:03d}": None for i in range(8)}
    hist = {f"q{i:03d}": (3, True) for i in range(4)}  # q000-003 green in r3
    monkeypatch.setattr(entry, "_coverage_history", lambda: hist)
    ordered = entry._ordered(names)
    assert ordered[:4] == ["q004", "q005", "q006", "q007"]
    assert ordered[4:] == ["q000", "q001", "q002", "q003"]


def test_failed_rechecked_before_green(monkeypatch):
    names = {"a": None, "b": None, "c": None}
    hist = {"a": (3, True), "b": (3, False), "c": (2, True)}
    monkeypatch.setattr(entry, "_coverage_history", lambda: hist)
    # b failed its latest check -> first; then green oldest-first (c r2 < a r3)
    assert entry._ordered(names) == ["b", "c", "a"]


def test_priority_breaks_ties_within_class(monkeypatch):
    names = {"zz": None, "aa": None}
    monkeypatch.setattr(entry, "_coverage_history", lambda: dict())
    monkeypatch.setattr(entry, "_PRIORITY", ["zz", "aa"])
    assert entry._ordered(names) == ["zz", "aa"]


def test_modified_since_check_fronts_before_never_checked(monkeypatch):
    """A green whose source hash changed since its official check outranks
    never-checked queries (its official row misstates the CURRENT code) but
    not standing reds; unknown recorded hash degrades to unmodified."""
    names = {"red": None, "old_green": None, "fresh": None, "rewritten": None}
    hist = {"red": (4, False), "old_green": (3, True), "rewritten": (5, True)}
    monkeypatch.setattr(entry, "_coverage_history", lambda: hist)
    monkeypatch.setattr(
        entry,
        "_recorded_hashes",
        lambda: {"5": {"rewritten": "hash-at-check"}, "3": {}},
    )
    monkeypatch.setattr(
        entry, "_current_hashes", lambda: {"rewritten": "hash-now"}
    )
    # legacy (pre-machinery-digest) form must also mismatch, or the
    # grandfather rule would classify the rewrite as unmodified
    monkeypatch.setattr(
        entry, "_legacy_hashes", lambda: {"rewritten": "hash-now-legacy"}
    )
    assert entry._ordered(names) == ["red", "rewritten", "fresh", "old_green"]


def test_unchanged_recorded_hash_stays_green_class(monkeypatch):
    names = {"stable": None, "fresh": None}
    monkeypatch.setattr(
        entry, "_coverage_history", lambda: {"stable": (5, True)}
    )
    monkeypatch.setattr(
        entry, "_recorded_hashes", lambda: {"5": {"stable": "same"}}
    )
    monkeypatch.setattr(entry, "_current_hashes", lambda: {"stable": "same"})
    assert entry._ordered(names) == ["fresh", "stable"]


def test_rewritten_greens_land_in_next_window(monkeypatch):
    """Rewrite-flagged greens (source hash changed since their official
    check) must land inside the driver's next 50-query window, behind reds
    but ahead of every unmodified green — asserted against a SYNTHETIC
    history only. Rule (see TESTING.md): rotation tests never read the live
    CORRECTNESS_r*.json / QUERY_HASHES.json — round artifacts mutate each
    round, so any assertion about the current round's transition state is
    a time bomb (the r7 suite went red exactly this way)."""
    names = {f"g{i:03d}": None for i in range(60)}  # 60 stale greens
    names.update({f"rw{i}": None for i in range(8)})  # 8 rewritten greens
    hist = {n: (5, True) for n in names}
    monkeypatch.setattr(entry, "_coverage_history", lambda: hist)
    monkeypatch.setattr(
        entry,
        "_recorded_hashes",
        lambda: {"5": {n: f"old-{n}" for n in names}},
    )
    cur = {n: f"old-{n}" for n in names}
    cur.update({f"rw{i}": "rewritten" for i in range(8)})
    monkeypatch.setattr(entry, "_current_hashes", lambda: cur)
    leg = {n: f"old-legacy-{n}" for n in names}  # mismatches everywhere:
    # recorded hashes here are post-transition style, so the legacy form
    # must not mask the 8 genuine rewrites (nor un-modify the 60 stable
    # greens, whose recorded hash equals their CURRENT hash already)
    monkeypatch.setattr(entry, "_legacy_hashes", lambda: leg)
    window = set(entry._ordered(names)[:50])
    for i in range(8):
        assert f"rw{i}" in window, f"rw{i}"


def test_real_history_parses_and_orders_everything():
    # Reads the live repo artifacts, but asserts only ROUND-INVARIANT
    # structural properties (uniqueness, class ordering) — never the
    # membership of a specific query in a specific round's window.
    ordered = entry._ordered(dict.fromkeys(entry.queries()))
    assert len(ordered) == len(set(ordered))
    hist = entry._coverage_history()
    # repo history exists (r01-r03 committed): every name in the first-50
    # window must be one the driver has never checked, as long as any
    # never-checked queries remain.
    never = [n for n in ordered if n not in hist]
    red = [n for n in ordered if n in hist and not hist[n][1]]
    # red rows lead the window; never-checked fill the rest
    assert ordered[: len(red)] == red or not red
    if len(red) + len(never) >= 50:
        assert all((n in never or n in red) for n in ordered[:50])


def test_record_tool_keys_next_official_round(tmp_path, monkeypatch):
    """record_query_hashes must file the current hashes under round =
    max(existing CORRECTNESS round) + 1 — the round whose official check
    runs against exactly this code. Mis-keying would make _ordered()
    compare a checked query against the wrong round's hash and silently
    disable rewrite detection."""
    import json

    from tools import record_query_hashes as r

    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r05.json").write_text("{}")
    monkeypatch.setattr(r, "HERE", str(tmp_path))
    monkeypatch.setattr(
        entry, "_current_hashes", lambda: {"q": "h"}, raising=True
    )
    # record_query_hashes imports _current_hashes from __spark_entry__ at
    # call time via sys.path; patch the entry module it will resolve
    import sys

    monkeypatch.setitem(sys.modules, "__spark_entry__", entry)
    assert r.main() == 0
    data = json.loads((tmp_path / "QUERY_HASHES.json").read_text())
    assert list(data) == ["6"] and data["6"] == {"q": "h"}


def test_legacy_hash_match_grandfathers_pre_transition_records(monkeypatch):
    """A green whose recorded hash was written with the pre-r14 formula
    (function+oracle only) and whose function/oracle are UNCHANGED must
    stay in the green class even though the machinery-inclusive hash
    differs — the one-time transition rule that keeps the formula change
    itself from fronting the entire registry at once."""
    names = {"fresh": None, "grandfathered": None}
    monkeypatch.setattr(
        entry, "_coverage_history", lambda: {"grandfathered": (8, True)}
    )
    monkeypatch.setattr(
        entry, "_recorded_hashes", lambda: {"8": {"grandfathered": "legacy-h"}}
    )
    monkeypatch.setattr(
        entry, "_current_hashes", lambda: {"grandfathered": "machinery-h"}
    )
    monkeypatch.setattr(
        entry, "_legacy_hashes", lambda: {"grandfathered": "legacy-h"}
    )
    assert entry._ordered(names) == ["fresh", "grandfathered"]
