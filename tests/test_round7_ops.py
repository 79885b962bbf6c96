"""Behavior tests for the round-7 operators, beyond the oracle hash
checks: KM survival recounted from raw events, the Holt recursion
replayed in Python, the chi-square statistic recounted with exact
fractions, and LPA community well-formedness."""

from __future__ import annotations

import pandas as pd

from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE

REG = load_all()


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    return ev


def test_survival_km_recount(spark):
    """at_risk / deaths / censored recount from raw events; survival is
    the running product of (at_risk - deaths) / at_risk and strictly
    decreases across death days."""
    rows = sorted(
        REG["events_survival_km"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["duration_days"],
    )
    ev = _events()
    pu = ev.groupby("user_id")["d"].agg(["min", "max"])
    fp = (
        ev[ev.event_type == "purchase"]
        .groupby("user_id")["d"]
        .min()
        .rename("purch")
    )
    u = pu.join(fp)
    dur = (u["purch"].fillna(u["max"]) - u["min"]).dt.days
    cen = u["purch"].isna()
    # per-duration tallies
    deaths = dur[~cen].value_counts().to_dict()
    censored = dur[cen].value_counts().to_dict()
    surv = 1.0
    for r in rows:
        t = r["duration_days"]
        at_risk = int((dur >= t).sum())
        assert r["at_risk"] == at_risk
        assert r["deaths"] == deaths.get(t, 0) and r["deaths"] > 0
        assert r["censored_n"] == censored.get(t, 0)
        # replay the operator's exact order: factor FIRST (one division),
        # then the running product — a*(b/c) != (a*b)/c in floats
        factor = (at_risk - r["deaths"]) / at_risk
        new_surv = surv * factor
        assert r["survival"] == new_surv
        assert new_surv < surv
        surv = new_surv


def test_holt_forecast_replay(spark):
    """The (level, trend) trace equals the Python recursion on the exact
    monthly cents series, bit-for-bit; forecast_next = level + trend."""
    rows = sorted(
        REG["orders_holt_linear_forecast"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["month"],
    )
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    cents = (
        (orders.o_totalprice * 100).round().astype("int64")
    )  # 2-dec money -> exact cents
    months = pd.to_datetime(orders.o_orderdate).dt.strftime("%Y-%m")
    series = cents.groupby(months).sum().sort_index()
    assert [r["month"] for r in rows] == list(series.index)
    lvl, trd = float(series.iloc[0]), 0.0
    states = [(lvl, trd)]
    for y in series.iloc[1:]:
        nl = 0.5 * float(y) + 0.5 * (lvl + trd)
        trd = 0.25 * (nl - lvl) + 0.75 * trd
        lvl = nl
        states.append((lvl, trd))
    for r, (sl, st) in zip(rows, states):
        assert r["level"] == sl and r["trend"] == st
        assert r["forecast_next"] == sl + st
    assert [r["revenue_cents"] for r in rows] == list(series)


def test_two_proportion_exact_statistic(spark):
    """chi2_num/chi2_den recount via exact fractions from the raw user
    table; the significance flag equals the Fraction comparison against
    3.8415."""
    from fractions import Fraction

    rows = REG["events_two_proportion_test"].fn(spark, SF_ORACLE).collect()
    ev = _events()
    first = ev.groupby("user_id")["d"].min()
    first_purch = ev[ev.event_type == "purchase"].groupby("user_id")["d"].min()
    delay = (first_purch - first).dt.days.reindex(first.index)
    conv = (delay <= 2).astype(int)  # AB_CONV_DAYS activation window
    arm = conv.index % 2
    n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
    c0, c1 = int(conv[arm == 0].sum()), int(conv[arm == 1].sum())
    nn, cc = n0 + n1, c0 + c1
    num = nn * (c0 * n1 - c1 * n0) ** 2
    den = n0 * n1 * cc * (nn - cc)
    assert 0 < cc < nn, "activation metric degenerate at this sf"
    by_arm = {r["arm"]: r for r in rows}
    assert by_arm[0]["n_users"] == n0 and by_arm[1]["n_users"] == n1
    assert by_arm[0]["n_converted"] == c0 and by_arm[1]["n_converted"] == c1
    for r in rows:
        assert int(r["chi2_num"]) == num and int(r["chi2_den"]) == den
        assert r["significant"] == int(
            Fraction(num, den) > Fraction(38415, 10000)
        )
        assert r["rate_ppm"] == (1_000_000 * r["n_converted"]) // r["n_users"]


def test_label_propagation_well_formed(spark):
    """Labels are real node ids (labels can only propagate from nodes),
    sizes recount, the near-dup graph yields MANY communities, and every
    node carries exactly one label."""
    rows = REG["graph_label_propagation"].fn(spark, SF_ORACLE).collect()
    nodes = {r["doc_id"] for r in rows}
    by_comm: dict[int, list[int]] = {}
    for r in rows:
        by_comm.setdefault(r["community"], []).append(r["doc_id"])
    for comm in by_comm:
        assert comm in nodes, f"label {comm} is not a graph node"
    sizes = {r["community"]: r["community_size"] for r in rows}
    for comm, members in by_comm.items():
        assert sizes[comm] == len(members)
    assert len(by_comm) > 1
    assert len(rows) == len(nodes)
