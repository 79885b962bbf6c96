"""Pins for bench.py's regression gate (r9 VERDICT #2/#3).

Round 9 proved two failure modes in the bench harness itself:
(a) the 22 stderr ALARM lines printed AFTER the stdout JSON displaced
    the JSON out of the driver's merged 2000-char tail (BENCH_r09.json
    parsed: null) — so the JSON line must be the LAST output;
(b) host CPU steal moved every query uniformly ~1.2x and tripped the
    HARD gate (exit 3) on identical code — so the HARD escalation must
    divide out UNIFORM drift (median anchor ratio) while a single-group
    regression (median ~1) still fails.
"""

from __future__ import annotations

import re
from pathlib import Path

import bench

REPO = Path(__file__).resolve().parent.parent


def test_json_line_is_printed_after_alarms():
    """Source-order pin: main() must run the alarm block (stderr) before
    printing the stdout JSON line, so the JSON is the last thing in the
    driver's merged tail."""
    src = (REPO / "bench.py").read_text()
    body = src[src.index("def main()") : src.index("def _round_groups")
               if src.index("def _round_groups") > src.index("def main()")
               else len(src)]
    # locate within main()'s body only
    main_body = src[src.index("def main()"):]
    main_body = main_body[: main_body.index("\ndef ")]
    alarm_at = main_body.index("_alarm_on_subtotal_regressions(")
    print_at = main_body.index("print(line)")
    assert alarm_at < print_at, (
        "alarms must print before the JSON line or they displace it from"
        " the driver's 2000-char tail (BENCH_r09 parsed: null)"
    )
    assert body  # silence the unused intermediate


def test_host_drift_uniform_slowdown_detected():
    minima = {f"q{i}": 1.0 for i in range(10)}
    timings = {f"q{i}": 1.55 for i in range(10)}
    assert bench._host_drift(timings, minima) == 1.55


def test_host_drift_single_query_regression_is_not_drift():
    minima = {f"q{i}": 1.0 for i in range(10)}
    timings = {f"q{i}": 1.0 for i in range(10)}
    timings["q3"] = 5.0  # one regressed query must not move the median
    assert bench._host_drift(timings, minima) == 1.0


def test_host_drift_clamped_and_needs_anchors():
    # clamp: a 10x uniform blowup is a config regression, not weather
    minima = {f"q{i}": 1.0 for i in range(10)}
    assert bench._host_drift({f"q{i}": 10.0 for i in range(10)}, minima) == bench.DRIFT_CAP
    # too few anchors -> no excuse
    assert bench._host_drift({"q0": 2.0}, {"q0": 1.0}) == 1.0


def _fake_prior(groups: dict[str, list[str]], old_subtotals: dict[str, float],
                minima: dict[str, float]):
    prior = {k: ("BENCH_rXX.json", v) for k, v in old_subtotals.items()}
    return prior, minima


def test_degraded_host_does_not_trip_hard_gate(monkeypatch, capsys):
    """Identical code on a 1.55x-steal host: every anchor and every
    subtotal up 1.55x -> soft ALARM yes, HARD no (exit 0)."""
    names = [f"q{i}" for i in range(10)]
    monkeypatch.setattr(bench, "_round_groups", lambda: {"r01_comparable_subtotal": names})
    minima = {n: 1.0 for n in names}
    monkeypatch.setattr(
        bench, "_prior_bench_data",
        lambda sf: _fake_prior({}, {"r01_comparable_subtotal": 10.0}, minima),
    )
    timings = {n: 1.55 for n in names}
    hard, drift = bench._alarm_on_subtotal_regressions(timings, "0.1")
    assert drift == 1.55
    assert hard is False
    err = capsys.readouterr().err
    assert "ALARM" in err and "ALARM_HARD" not in err


def test_injected_plan_regression_still_trips_hard_gate(monkeypatch, capsys):
    """A real regression concentrated in one group (e.g. a dropped
    broadcast hint): anchors elsewhere stay flat, drift ~1, the group's
    adjusted ratio stays >1.5 -> exit 3 path."""
    slow = [f"s{i}" for i in range(4)]
    flat = [f"q{i}" for i in range(10)]
    monkeypatch.setattr(
        bench, "_round_groups",
        lambda: {"r01_comparable_subtotal": flat, "r02_comparable_subtotal": flat + slow},
    )
    minima = {n: 1.0 for n in flat}  # anchors = the healthy queries
    monkeypatch.setattr(
        bench, "_prior_bench_data",
        lambda sf: _fake_prior(
            {},
            {"r01_comparable_subtotal": 10.0, "r02_comparable_subtotal": 14.0},
            minima,
        ),
    )
    timings = {n: 1.0 for n in flat}
    timings.update({n: 3.0 for n in slow})  # group2: 10+12=22 vs 14 = 1.57x
    hard, drift = bench._alarm_on_subtotal_regressions(timings, "0.1")
    assert drift == 1.0
    assert hard is True
    assert "ALARM_HARD" in capsys.readouterr().err


def test_uniform_blowup_beyond_cap_still_fails(monkeypatch):
    """DRIFT_CAP bounds what uniformity can excuse: a uniform 3.2x
    (> DRIFT_CAP * HARD_RATIO) blowup fails even though it is uniform —
    that is a session-config regression, not host weather."""
    names = [f"q{i}" for i in range(10)]
    monkeypatch.setattr(bench, "_round_groups", lambda: {"r01_comparable_subtotal": names})
    minima = {n: 1.0 for n in names}
    monkeypatch.setattr(
        bench, "_prior_bench_data",
        lambda sf: _fake_prior({}, {"r01_comparable_subtotal": 10.0}, minima),
    )
    timings = {n: 3.2 for n in names}
    hard, drift = bench._alarm_on_subtotal_regressions(timings, "0.1")
    assert drift == bench.DRIFT_CAP
    assert hard is True


_TS_RE = re.compile(r'"host_drift"')


def test_payload_carries_drift_field():
    """The stdout JSON records the drift estimate so a judge reading
    BENCH_r{N}.json can see how much uniformity was divided out."""
    src = (REPO / "bench.py").read_text()
    assert '"host_drift": drift' in src
