"""Evidence-rotation invariants (VERDICT r5 item 9).

The driver's correctness harness samples the first ~50 registry entries;
at 188+ entries a hand-curated head can let new work go externally
unwitnessed for rounds.  These tests pin the derived policy: the window
head is oldest-driver-evidence-first, never-witnessed entries lead, and
the canary block stays inside the window.
"""

from __future__ import annotations

from arrow_ballista_spark.queries import (
    _CANARIES,
    _EVIDENCE_RESET,
    _WINDOW,
    _derive_head_rotation,
    load_all,
)
from arrow_ballista_spark.queries.rotation_state import LAST_GREEN

REG = load_all()


def _age(n: str) -> int:
    # effective evidence age: oracle/fixture changes reset to 0 until
    # re-witnessed at-or-after the stamped round (self-healing)
    from arrow_ballista_spark.queries import _effective_age

    return _effective_age(n, LAST_GREEN)


def test_head_is_argmin_of_last_green_round():
    names = list(REG)
    head = _derive_head_rotation(names)
    fill = _WINDOW - len(_CANARIES)
    ages = sorted(_age(n) for n in names if n not in _CANARIES)
    head_ages = [_age(n) for n in head[:fill]]
    # the non-canary head IS the fill smallest evidence ages, in order
    assert head_ages == ages[:fill]
    # and the very first entry is a global argmin
    assert _age(head[0]) == min(_age(n) for n in names)


def test_never_witnessed_entries_lead_the_window():
    head = list(REG)[:_WINDOW]
    never = [
        n for n in REG
        if _age(n) == 0 and n not in _CANARIES
    ]
    k = len(never)
    assert k <= _WINDOW - len(_CANARIES), (
        "more never-witnessed entries than window fill — grow _WINDOW or "
        "split across rounds explicitly"
    )
    assert head[:k] == never


def test_canaries_inside_window_and_registered():
    head = list(REG)[:_WINDOW]
    for c in _CANARIES:
        assert c in REG, f"canary {c} not in registry"
        assert c in head, f"canary {c} fell outside the driver window"


def test_registry_order_matches_derivation():
    assert list(REG)[: _WINDOW] == _derive_head_rotation(list(REG))[:_WINDOW]
