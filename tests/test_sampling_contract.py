"""The correctness-ledger sampling contract (README: 'Correctness-
ledger sampling contract'): the driver samples a ~50-query prefix of
``queries()``, so full-ledger convergence is a property of the
ordering ``_coverage_order`` emits. These assertions keep a future
round from silently breaking it."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    import __spark_entry__ as entrymod

    return entrymod


def _pins(entrymod):
    return {
        name: getattr(entrymod, name)
        for name in dir(entrymod)
        if name.startswith("_R") and name.endswith("_BACKLOG")
    }


def _latest_rows():
    latest = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for n, r in json.load(fh).items():
                if isinstance(r, dict):
                    latest[n] = r
    return latest


def test_pins_are_disjoint_and_registered():
    entrymod = _entry()
    registry = entrymod.queries()
    pins = _pins(entrymod)
    seen = {}
    for pin_name, names in pins.items():
        for n in names:
            assert n not in seen, (
                f"{n} appears in both {seen[n]} and {pin_name} — a query "
                "must live in exactly one pin"
            )
            seen[n] = pin_name
            assert n in registry, (
                f"{pin_name} pins {n!r} which is not in the registry — "
                "renamed or dropped queries must leave their pin too"
            )


def test_every_entry_is_pinned_or_predates_the_pin_era():
    """Every registry entry is either in exactly one pin or already
    has a green driver hash row from the pre-pin era (rounds 1–2).
    An entry that is neither would depend on the rank-3 fallback for
    coverage — legal for _coverage_order but invisible to the pin
    bookkeeping the README documents, so new rounds must pin."""
    entrymod = _entry()
    registry = entrymod.queries()
    pinned = {n for names in _pins(entrymod).values() for n in names}
    latest = _latest_rows()
    unaccounted = [
        n
        for n in registry
        if n not in pinned
        and not (
            n in latest and latest[n].get("hash_match") is True
        )
        and not (n in latest and latest[n].get("rows_match") is True)
    ]
    assert not unaccounted, (
        "registry entries with neither a pin nor any driver ledger "
        f"row: {unaccounted} — add them to the current round's "
        "_R{N}_BACKLOG"
    )


def test_unsampled_entries_form_the_prefix():
    """The driver samples a prefix, so every entry whose hash gate
    still owes a green row must sort before every entry that already
    has one — otherwise convergence stalls."""
    entrymod = _entry()
    ordered = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    latest = _latest_rows()

    def owes(n):
        if n not in latest:
            return True
        return n in oracles and latest[n].get("hash_match") is not True

    owing = [n for n in ordered if owes(n)]
    if owing:
        last_owing = max(ordered.index(n) for n in owing)
        ahead = [n for n in ordered[: last_owing + 1] if not owes(n)]
        assert not ahead, (
            "green-ledger entries sorted ahead of entries still owing "
            f"a hash row: {ahead[:5]} ..."
        )


def test_current_round_addition_budget():
    """≤ ~35 adds per round (README rule 3): the newest pin plus any
    older still-unsampled entries must fit the driver's ~50-row
    sample, or the oldest entries starve."""
    entrymod = _entry()
    ordered = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    latest = _latest_rows()
    owing = [
        n
        for n in ordered
        if n not in latest
        or (n in oracles and latest[n].get("hash_match") is not True)
    ]
    assert len(owing) <= 50, (
        f"{len(owing)} entries owe a driver hash row — more than one "
        "~50-row sample can absorb; stop adding queries this round"
    )
