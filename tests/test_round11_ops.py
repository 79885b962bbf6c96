"""Round-11 additions: exact pass@k estimation and GRPO group-relative
advantage — python-bigint replays, estimator-property pins, and plan
shapes (the oracle hash gate lives in test_correctness.py like every
registered query)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from snackfs_spark.plans import formatted_plan
from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE


def test_pass_at_k_python_replay(spark):
    """Per task: n/c counts from the raw parquet, pass@1 and pass@k
    recomputed with math.comb on python bigints — the falling-factorial
    lattice must agree exactly, including the n-c < k tasks where the
    estimator is exactly 1 (the zero-factor property, no branch)."""
    from snackfs_spark.operators.sampling import PASS_AT_K

    rows = load_all()["eval_pass_at_k"].fn(spark, SF_ORACLE).collect()
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    g = ev.groupby("user_id").agg(
        n=("event_id", "size"),
        c=("event_type", lambda s: int((s == "purchase").sum())),
    )
    want = {}
    for task, r in g.iterrows():
        n, c = int(r["n"]), int(r["c"])
        if n < PASS_AT_K:
            continue
        fail = math.comb(n - c, PASS_AT_K) * 1_000_000 // math.comb(n, PASS_AT_K)
        want[task] = (n, c, 1_000_000 * c // n, 1_000_000 - fail)
    got = {
        r["task_id"]: (
            r["n_samples"], r["n_correct"], r["pass1_ppm"], r["pass_at_k_ppm"]
        )
        for r in rows
    }
    # floor(1e6*(1 - num/den)) == 1e6 - ceil(1e6*num/den); equal to the
    # subtractive form only when the division is exact — recompute the
    # exact floor instead of trusting the identity
    for task, (n, c, p1, _) in want.items():
        fden = math.comb(n, PASS_AT_K)
        fnum = math.comb(n - c, PASS_AT_K)
        want[task] = (n, c, p1, 1_000_000 * (fden - fnum) // fden)
    assert got == want
    assert len(got) > 50  # the sf0.01 fixture keeps >= 50 eligible tasks
    # estimator properties: c=0 -> some pass@k == 0 task OR all c>0;
    # pass@k >= pass@1 always (more draws can only help)
    for task, (n, c, p1, pk) in want.items():
        assert pk >= p1, (task, p1, pk)
        if n - c < 5:
            assert pk == 1_000_000


def test_pass_at_k_single_scan_plan(spark):
    """One scan, one task-keyed partial aggregate, pure projection
    algebra after — no join, no window, no second exchange."""
    df = load_all()["eval_pass_at_k"].fn(spark, SF_ORACLE)
    plan = formatted_plan(df)
    # one scan = one file-index detail block (the operator name appears
    # twice per scan: tree header + detail section)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("+- Exchange") == 1, plan  # tree view: one shuffle


def test_grpo_advantage_python_replay(spark):
    """Per event: adv_num, the exact integer sqrt of the n^2-scaled
    population variance, and the sign-split milli readout recomputed in
    python bigints (math.isqrt) from the raw parquet."""
    from snackfs_spark.operators.sampling import GRPO_MIN_GROUP

    rows = load_all()["train_grpo_advantage"].fn(spark, SF_ORACLE).collect()
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    ev["r"] = (ev["value"] * 100).round().astype(int)
    want = {}
    for uid, grp in ev.groupby("user_id"):
        n = len(grp)
        if n < GRPO_MIN_GROUP:
            continue
        s1 = int(grp["r"].sum())
        s2 = int((grp["r"].astype(object) ** 2).sum())
        var_num = n * s2 - s1 * s1
        sq = math.isqrt(var_num)
        for _, e in grp.iterrows():
            adv = n * int(e["r"]) - s1
            milli = 0 if var_num == 0 else (
                (-1 if adv < 0 else 1) * (1000 * abs(adv) // sq)
            )
            want[int(e["event_id"])] = (uid, int(e["r"]), adv, sq, milli)
    got = {
        r["event_id"]: (
            r["group_id"], r["reward_centi"], r["adv_num_centi"],
            r["group_sd_floor_centi"], r["adv_milli"],
        )
        for r in rows
    }
    assert got == want
    # whitening property on the lattice: per group, sum(adv_num) == 0
    sums: dict[int, int] = {}
    for _, (uid, _r, adv, _s, _m) in want.items():
        sums[uid] = sums.get(uid, 0) + adv
    assert set(sums.values()) == {0}
    # both signs occur (non-degenerate fixture)
    assert any(m < 0 for *_x, m in want.values())
    assert any(m > 0 for *_x, m in want.values())


def test_grpo_isqrt_correction_and_guard(spark):
    """The float isqrt seed is corrected by +-1 and the exactness check
    raises loudly rather than emitting a wrong floor: perfect squares,
    square-minus-one and square-plus-one must all floor exactly."""
    cases = [(0,), (1,), (2,), (3,), (4,), (2**40,), (2**40 - 1,), (2**40 + 1,),
             (999_999_999_999_999_999,)]
    df = spark.createDataFrame(cases, "x long").withColumns(
        {
            "s0": F.expr(
                "CAST(FLOOR(SQRT(CAST(x AS DOUBLE))) AS DECIMAL(38,0))"
            ),
        }
    ).withColumn(
        "sq",
        F.expr(
            "s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END)"
            " - (CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END)"
        ),
    )
    got = {r["x"]: int(r["sq"]) for r in df.collect()}
    assert got == {x: math.isqrt(x) for (x,) in cases}


def test_grpo_group_keyed_join_plan(spark):
    """The sample relation joins the group aggregate on the aggregate's
    own shuffle key — equi-join only, no cartesian/nested-loop shapes,
    and the scan prunes to the 3 reward columns."""
    df = load_all()["train_grpo_advantage"].fn(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "struct<event_id:bigint,user_id:bigint,value:double>" in plan, plan


def test_grpo_zero_variance_group_emits_zero(spark, tmp_path):
    """A constant-reward group has var_num = 0 and must emit adv_milli
    = 0 for every sample (the GRPO degenerate-group convention), not a
    divide-by-zero."""
    import duckdb

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(["2024-01-01"] * 4),
            "user_id": [7, 7, 8, 8],
            "event_type": ["click"] * 4,
            "value": [2.5, 2.5, 1.0, 3.0],
            "props": [""] * 4,
        }
    )
    fixture = tmp_path / "zv"
    fixture.mkdir()
    ev.to_parquet(fixture / "events.parquet")
    q = load_all()["train_grpo_advantage"]
    got = {
        r["event_id"]: (r["adv_milli"], r["group_sd_floor_centi"])
        for r in q.fn(spark, str(fixture)).collect()
    }
    assert got[1] == (0, 0) and got[2] == (0, 0)
    # group 8: r = 100, 300; var_num = 2*(100^2+300^2) - 400^2 = 40000
    assert got[3] == (-1000, 200) and got[4] == (1000, 200)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fixture}/events.parquet')"
    )
    odf = con.execute(q.oracle).fetchdf()
    assert {
        int(r["event_id"]): (int(r["adv_milli"]), int(r["group_sd_floor_centi"]))
        for _, r in odf.iterrows()
    } == got


def test_new_ops_registered_after_window():
    """Round-11 additions must NOT displace the pre-staged r11 window:
    they register after PRIORITY and join the r12 window per the
    registry's pre-staged plan."""
    from snackfs_spark.registry import PRIORITY

    reg = list(load_all())
    for name in ("eval_pass_at_k", "train_grpo_advantage"):
        assert name in reg and name not in PRIORITY
        assert reg.index(name) >= 50
