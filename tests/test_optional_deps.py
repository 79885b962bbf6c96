"""Meta-pin of the OPTIONAL-DEPENDENCY skips (r8 VERDICT #4).

Two checks in this suite can only run when the environment grows a
library the container currently lacks. Both must surface as explicit,
reasoned skips under ``pytest -rs`` — never a silent ``return`` — so a
real regression can't hide behind an optional import, and an
environment upgrade flips them to RUN (scipy) or to a loud port
directive (protobuf/transformWithState). This module asserts the
expected state for whichever environment it finds itself in:

  - scipy        -> tests/test_round8_ops.py::test_ks_two_sample_scipy_crosscheck
  - google.protobuf (transformWithStateInPandas)
                 -> tests/test_streaming.py::test_transform_with_state_probe
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

TESTS = Path(__file__).resolve().parent

# dependency -> (test file, the pinned skip-reason fragment)
KNOWN_OPTIONAL = {
    "scipy": (
        "test_round8_ops.py",
        "scipy not installed in this env",
    ),
    "google": (
        "test_streaming.py",
        "runtime still lacks google.protobuf",
    ),
}


def test_optional_dep_skips_are_pinned():
    """Each optional-dep test carries its exact skip-reason string —
    if someone rewords or deletes the skip, this meta test fails and
    the `-rs` audit trail breaks visibly instead of silently."""
    for dep, (fname, reason) in KNOWN_OPTIONAL.items():
        src = (TESTS / fname).read_text()
        assert reason in src, (
            f"{fname} lost its pinned skip reason for optional dep {dep!r}"
        )
        # the skip must be a pytest.skip, not a bare return
        assert "pytest.skip(" in src, f"{fname} no longer skips via pytest.skip"


def test_optional_dep_inventory_matches_env():
    """Record which optional deps are present. When one APPEARS, the
    corresponding test stops skipping on its own (scipy cross-check
    runs; the transformWithState probe fails loudly directing the
    port) — this inventory just documents the expectation so `pytest
    -rs` output can be diffed against it."""
    present = {
        dep: importlib.util.find_spec(dep) is not None for dep in KNOWN_OPTIONAL
    }
    # No assertion on absence — the env may legitimately grow these.
    # But the mapping itself must stay total: every known-optional dep
    # resolves to an existing test file.
    for dep, (fname, _) in KNOWN_OPTIONAL.items():
        assert (TESTS / fname).exists(), f"{fname} missing for {dep}"
    # Surface the inventory in the pytest output for the round log.
    print(f"optional-dep inventory: {present}")
