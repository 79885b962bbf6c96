"""Behavior tests for the round-8 operators, beyond the oracle hash
checks: link-prediction pairs recounted from the edge relation, KMV
estimates held to the published 1/sqrt(K) error bound against exact
distincts, NDCG/AP recomputed from the shared ranking pipeline, MASE
replayed in pandas, association-rule measures recounted from supports,
and the streaming CDC state pinned to its batch arg-max twin.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE

REG = load_all()


def test_jaccard_link_prediction_recount(spark):
    """Predicted links are NON-edges with >= 1 common neighbor, and
    every row's jaccard_ppm is exactly 1e6*common div (d1+d2-common)
    recomputed from the token graph's own edge relation."""
    from snackfs_spark.operators.graph import _token_graph

    rows = REG["graph_jaccard_link_prediction"].fn(spark, SF_ORACLE).collect()
    assert rows, "no predicted links at sf0.01"
    _, edges, _ = _token_graph(spark, SF_ORACLE)
    und = {
        tuple(sorted((r["w1"], r["w2"]))) for r in edges.collect()
    }
    nbrs: dict[str, set[str]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in rows:
        pair = (r["w1"], r["w2"])
        assert pair not in und, f"predicted an existing edge {pair}"
        common = nbrs[r["w1"]] & nbrs[r["w2"]]
        assert r["common_nbrs"] == len(common) >= 1
        assert r["deg1"] == len(nbrs[r["w1"]])
        assert r["deg2"] == len(nbrs[r["w2"]])
        union = r["deg1"] + r["deg2"] - r["common_nbrs"]
        assert r["jaccard_ppm"] == (1_000_000 * r["common_nbrs"]) // union


def test_kmv_estimates_within_bound(spark, duck):
    """KMV distinct estimates are within 3/sqrt(K) relative error of
    the exact per-type distincts, and union/intersection estimates
    bracket the exact set sizes at the same tolerance."""
    from snackfs_spark.operators.relational import KMV_K

    rows = REG["approx_kmv_theta_sketch"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    tol = 3.0 / math.sqrt(KMV_K)
    exact = dict(
        duck.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        for side, est in (("ta", r["est_a"]), ("tb", r["est_b"])):
            ex = exact[r[side]]
            assert abs(est - ex) <= tol * ex, (r[side], est, ex)
        (ex_union,) = duck.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events "
            "WHERE event_type IN (?, ?)",
            [r["ta"], r["tb"]],
        ).fetchone()
        (ex_int,) = duck.execute(
            """SELECT COUNT(*) FROM
               (SELECT user_id FROM events WHERE event_type = ?
                INTERSECT
                SELECT user_id FROM events WHERE event_type = ?)""",
            [r["ta"], r["tb"]],
        ).fetchone()
        assert abs(r["est_union"] - ex_union) <= tol * ex_union
        # intersection error is relative to the UNION (theta-sampled
        # from the union's key space), the standard theta-sketch bound
        assert abs(r["est_intersect"] - ex_int) <= tol * ex_union


def test_ndcg_recount(spark):
    """DCG/IDCG recomputed from the shared ranking pipeline's own topk
    + relevance relations; ndcg_ppm in [0, 1e6] and dcg <= idcg."""
    from snackfs_spark.operators.textstats import (
        NDCG_K,
        _NDCG_W,
        _retrieval_rank_rel,
    )

    rows = {r["query_id"]: r for r in REG["eval_ndcg_at_k"].fn(spark, SF_ORACLE).collect()}
    qsize, topk, rel, nrel = _retrieval_rank_rel(spark, SF_ORACLE)
    rel_set = {(r["query_id"], r["doc_id"]) for r in rel.collect()}
    tk = pd.DataFrame([r.asDict() for r in topk.collect()])
    nr = {r["query_id"]: r["n_rel"] for r in nrel.collect()}
    for qid, r in rows.items():
        hits = tk[(tk.query_id == qid) & (tk.rn <= NDCG_K)]
        dcg = sum(
            _NDCG_W[int(h.rn)]
            for h in hits.itertuples()
            if (qid, h.doc_id) in rel_set
        )
        idcg = sum(_NDCG_W[i] for i in range(1, min(nr.get(qid, 0), NDCG_K) + 1))
        assert r["dcg_micro"] == dcg
        assert r["idcg_micro"] == idcg
        assert r["dcg_micro"] <= r["idcg_micro"]
        expected = (1_000_000 * dcg) // idcg if idcg else 0
        assert r["ndcg_ppm"] == expected
        assert 0 <= r["ndcg_ppm"] <= 1_000_000


def test_average_precision_recount(spark):
    """AP recomputed as the mean of ppm-floored precisions at relevant
    ranks over the top-BM25_TOP list."""
    from snackfs_spark.operators.textstats import BM25_TOP, _retrieval_rank_rel

    rows = {r["query_id"]: r for r in REG["eval_pr_auc"].fn(spark, SF_ORACLE).collect()}
    qsize, topk, rel, nrel = _retrieval_rank_rel(spark, SF_ORACLE)
    rel_set = {(r["query_id"], r["doc_id"]) for r in rel.collect()}
    tk = pd.DataFrame([r.asDict() for r in topk.collect()])
    nr = {r["query_id"]: r["n_rel"] for r in nrel.collect()}
    for qid, r in rows.items():
        hits = tk[tk.query_id == qid].sort_values("rn")
        cum = 0
        sum_p = 0
        for h in hits.itertuples():
            is_rel = (qid, h.doc_id) in rel_set
            cum += is_rel
            if is_rel:
                sum_p += (1_000_000 * cum) // int(h.rn)
        assert r["sum_p_ppm"] == sum_p
        n_rel = nr.get(qid, 0)
        expected = sum_p // min(n_rel, BM25_TOP) if n_rel else 0
        assert r["ap_ppm"] == expected
        assert 0 <= r["ap_ppm"] <= 1_000_000


def test_seasonal_naive_mase_recount(spark):
    """Forecast lag, per-month errors and the series MASE replayed in
    pandas over the zero-filled month axis."""
    from snackfs_spark.operators.windows import SN_LAG

    rows = sorted(
        REG["orders_seasonal_naive_mase"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["month"],
    )
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    o["mo"] = pd.to_datetime(o.o_orderdate).dt.to_period("M")
    cents = (o.o_totalprice.round(2) * 100).round().astype("int64")
    y = cents.groupby(o.mo).sum()
    axis = pd.period_range(y.index.min(), y.index.max(), freq="M")
    y = y.reindex(axis, fill_value=0)
    assert [r["month"] for r in rows] == [str(p) for p in axis]
    fc = y.shift(SN_LAG)
    prev = y.shift(1)
    num = int((y - fc).abs().dropna().sum())
    cn = int(fc.notna().sum())
    den = int((y - prev).abs().dropna().sum())
    cd = int(prev.notna().sum())
    expected_mase = (1_000_000 * num * cd) // (den * cn)
    for i, r in enumerate(rows):
        assert r["revenue_cents"] == int(y.iloc[i])
        if i < SN_LAG:
            assert r["seasonal_forecast_cents"] is None
            assert r["abs_err_cents"] is None
        else:
            assert r["seasonal_forecast_cents"] == int(y.iloc[i - SN_LAG])
            assert r["abs_err_cents"] == abs(int(y.iloc[i]) - int(y.iloc[i - SN_LAG]))
        assert r["mase_ppm"] == expected_mase


def test_association_rules_recount(spark):
    """Confidence and lift recounted from raw basket supports; every
    rule clears the confidence floor and mirrors a frequent pair."""
    from snackfs_spark.operators.mining import BASKET_MINSUP, RULE_MIN_CONF_PPM

    rows = REG["mining_association_rules"].fn(spark, SF_ORACLE).collect()
    assert rows, "no rules at sf0.01"
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    n_baskets = li.l_orderkey.nunique()
    support = li.groupby("l_partkey").size()
    pair_support = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g.l_partkey)
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair_support[(a, b)] = pair_support.get((a, b), 0) + 1
    for r in rows:
        a, c = r["antecedent"], r["consequent"]
        key = (min(a, c), max(a, c))
        assert pair_support[key] == r["pair_support"] >= BASKET_MINSUP
        assert int(support[a]) == r["support_ante"] >= BASKET_MINSUP
        assert int(support[c]) == r["support_cons"] >= BASKET_MINSUP
        conf = (1_000_000 * r["pair_support"]) // r["support_ante"]
        lift = (1_000_000 * r["pair_support"] * n_baskets) // (
            r["support_ante"] * r["support_cons"]
        )
        assert r["confidence_ppm"] == conf >= RULE_MIN_CONF_PPM
        assert r["lift_ppm"] == lift


def test_streaming_cdc_upsert_equals_batch_twin(spark):
    """The drained streaming state table equals the batch arg-max over
    the same events — Structured Streaming's incremental-plan contract
    — and tombstones flag exactly the keys whose last event is an
    error."""
    import pyspark.sql.functions as F

    from snackfs_spark.functions import ts_str

    got = {
        r["user_id"]: r
        for r in REG["streaming_cdc_upsert"].fn(spark, SF_ORACLE).collect()
    }
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    ) if dict(
        spark.read.parquet(f"{SF_ORACLE}/events.parquet").dtypes
    )["ts"] == "bigint" else spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value", "ts"), F.struct("ts", "event_id")
            ).alias("last"),
            F.count(F.lit(1)).cast("long").alias("n_changes"),
        )
        .select(
            "user_id",
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
            ts_str(F.col("last.ts")).alias("last_ts"),
            "n_changes",
            (F.col("last.event_type") == "error").cast("long").alias("tombstoned"),
        )
    )
    want = {r["user_id"]: r for r in batch.collect()}
    assert got.keys() == want.keys()
    for uid, w in want.items():
        assert got[uid].asDict() == w.asDict(), uid
    assert any(r["tombstoned"] == 1 for r in got.values())
    assert any(r["tombstoned"] == 0 for r in got.values())


def test_modularity_recount(spark):
    """Q recomputed in exact python ints from the same LPA labels and
    candidate edges; per-community contributions and the global ppm
    must match, and sum(contrib) / 4m^2 must equal q_num/q_den."""
    from snackfs_spark.operators.dedup import minhash_bands_df
    from snackfs_spark.operators.graph import graph_label_propagation

    rows = REG["graph_modularity_score"].fn(spark, SF_ORACLE).collect()
    labels = {
        r["doc_id"]: r["community"]
        for r in graph_label_propagation(spark, SF_ORACLE).collect()
    }
    bands = minhash_bands_df(spark, SF_ORACLE).collect()
    buckets: dict[tuple, list] = {}
    for b in bands:
        buckets.setdefault((b["band"], b["band_sig"]), []).append(b["doc_id"])
    cand = set()
    for docs in buckets.values():
        ds = sorted(set(docs))
        for i, a in enumerate(ds):
            for b2 in ds[i + 1 :]:
                cand.add((a, b2))
    m = len(cand)
    deg: dict[int, int] = {}
    intra: dict[int, int] = {}
    for a, b2 in cand:
        deg[a] = deg.get(a, 0) + 1
        deg[b2] = deg.get(b2, 0) + 1
        if labels[a] == labels[b2]:
            intra[labels[a]] = intra.get(labels[a], 0) + 1
    dsum: dict[int, int] = {}
    nn: dict[int, int] = {}
    for doc, c in labels.items():
        dsum[c] = dsum.get(c, 0) + deg[doc]
        nn[c] = nn.get(c, 0) + 1
    q_num = sum(4 * m * intra.get(c, 0) - dsum[c] ** 2 for c in nn)
    q_den = 4 * m * m
    for r in rows:
        c = r["community"]
        assert r["n_nodes"] == nn[c]
        assert r["intra_edges"] == intra.get(c, 0)
        assert r["degree_sum"] == dsum[c]
        assert int(r["contrib_num"]) == 4 * m * intra.get(c, 0) - dsum[c] ** 2
        assert int(r["q_num"]) == q_num
        assert int(r["q_den"]) == q_den
        # both engines truncate toward zero (verified in-round); python
        # // floors, so mirror the truncation explicitly
        tppm = abs(1_000_000 * q_num) // q_den
        assert r["q_ppm"] == (tppm if q_num >= 0 else -tppm)
    # LPA on a near-dup candidate graph should find real structure
    assert rows[0]["q_ppm"] > 0


def test_apportionment_sums_to_budget_exactly(spark):
    """Hamilton quotas: sum(final_quota) == budget EXACTLY, every final
    quota within 1 of the exact ideal share, and the leftover goes to
    the largest remainders."""
    from snackfs_spark.operators.sampling import APPORTION_BUDGET

    rows = REG["corpus_budget_apportionment"].fn(spark, SF_ORACLE).collect()
    assert sum(r["final_quota"] for r in rows) == APPORTION_BUDGET
    total = sum(r["tokens"] for r in rows)
    for r in rows:
        ideal = APPORTION_BUDGET * r["tokens"] / total
        assert r["floor_quota"] == (APPORTION_BUDGET * r["tokens"]) // total
        assert r["remainder_num"] == (APPORTION_BUDGET * r["tokens"]) % total
        assert abs(r["final_quota"] - ideal) < 1.0
    # extras went to the strictly largest remainders (ties by source)
    got_extra = sorted(
        (-r["remainder_num"], r["source"]) for r in rows if r["extra_token"]
    )
    no_extra = sorted(
        (-r["remainder_num"], r["source"]) for r in rows if not r["extra_token"]
    )
    assert all(e < n for e in got_extra for n in no_extra[:1]) or not no_extra


def test_triplet_mining_recount(spark):
    """Hardest positive/negative recounted from a numpy cosine matrix;
    violation flag is exactly cos_neg + margin > cos_pos."""
    import numpy as np

    from snackfs_spark.operators.similarity import (
        TRIPLET_ANCHORS,
        TRIPLET_MARGIN,
    )

    rows = {r["anchor_id"]: r for r in REG["emb_triplet_mining"].fn(spark, SF_ORACLE).collect()}
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    vecs = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    labels = emb.label.to_numpy()
    ids = emb.vec_id.to_numpy()
    norms = np.linalg.norm(vecs, axis=1)
    margin = float(TRIPLET_MARGIN)
    assert len(rows) == TRIPLET_ANCHORS
    for a_i in range(TRIPLET_ANCHORS):
        ai = int(np.where(ids == a_i)[0][0])
        cos = vecs @ vecs[ai] / (norms * norms[ai])
        same = (labels == labels[ai]) & (ids != a_i)
        diff = labels != labels[ai]
        # ties broken to the smallest cand_id, matching the windows
        pos_pool = sorted(zip(cos[same], ids[same]), key=lambda t: (t[0], t[1]))
        neg_pool = sorted(zip(cos[diff], ids[diff]), key=lambda t: (-t[0], t[1]))
        r = rows[a_i]
        assert r["pos_id"] == pos_pool[0][1]
        assert r["neg_id"] == neg_pool[0][1]
        assert abs(r["pos_cosine"] - pos_pool[0][0]) < 1e-9
        assert abs(r["neg_cosine"] - neg_pool[0][0]) < 1e-9
        assert r["violates_margin"] == int(
            r["neg_cosine"] + margin > r["pos_cosine"]
        )


def test_ab_power_grid_recount(spark):
    """Detectability and required n replayed with python Fractions:
    required_n is the exact ceil, detectable iff n_per_arm clears it,
    and required n is monotone decreasing in effect size."""
    from fractions import Fraction

    from snackfs_spark.operators.sampling import (
        AB_POWER_EFFECTS_PPM,
        AB_POWER_Z2_DEN,
        AB_POWER_Z2_NUM,
    )

    rows = sorted(
        REG["sample_ab_power_grid"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["effect_ppm"],
    )
    assert [r["effect_ppm"] for r in rows] == sorted(AB_POWER_EFFECTS_PPM)
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    first = ev.groupby("user_id")["d"].min()
    purch = ev[ev.event_type == "purchase"].groupby("user_id")["d"].min()
    conv = ((purch - first).dt.days <= 2).reindex(first.index, fill_value=False)
    arm0 = first.index % 2 == 0
    n0, c0 = int(arm0.sum()), int(conv[arm0].sum())
    n_arm = min(n0, len(first) - n0)
    z2 = Fraction(AB_POWER_Z2_NUM, AB_POWER_Z2_DEN)
    prev_req = None
    for r in rows:
        e = Fraction(r["effect_ppm"], 1_000_000)
        p1 = Fraction(c0, n0)
        p2 = p1 + e
        var = p1 * (1 - p1) + p2 * (1 - p2)
        req = z2 * var / (e * e)
        req_ceil = -((-req.numerator) // req.denominator)
        assert r["n_per_arm"] == n_arm
        assert r["baseline_ppm"] == (1_000_000 * c0) // n0
        assert r["required_n_per_arm"] == req_ceil
        assert r["detectable"] == int(n_arm >= req)
        if prev_req is not None:
            assert r["required_n_per_arm"] <= prev_req
        prev_req = r["required_n_per_arm"]


def test_isotonic_calibration_pav_replay(spark):
    """The max-min fitted rates equal a classic sequential PAV pooling
    replay (exact Fractions), are monotone non-decreasing in bin, and
    preserve the weighted total (sum n_b * fitted_b == sum pos)."""
    from fractions import Fraction

    rows = sorted(
        REG["eval_isotonic_calibration"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["bin"],
    )
    assert rows, "no occupied bins"
    # sequential PAV: pools of (pos, n); merge while violating
    pools: list[list[int]] = []
    for r in rows:
        pools.append([r["pos"], r["n"]])
        while len(pools) > 1 and Fraction(pools[-2][0], pools[-2][1]) >= Fraction(
            pools[-1][0], pools[-1][1]
        ):
            p2 = pools.pop()
            pools[-1][0] += p2[0]
            pools[-1][1] += p2[1]
    # expand pooled rates back over bins (pool width recovered by
    # walking each pool's accumulated n)
    fitted = []
    pool_iter = iter(pools)
    cur = next(pool_iter)
    used = 0
    for r in rows:
        if used == cur[1]:
            cur = next(pool_iter)
            used = 0
        fitted.append(Fraction(cur[0], cur[1]))
        used += r["n"]
    prev = None
    total = 0
    for r, f in zip(rows, fitted):
        got = Fraction(r["fitted_num"], r["fitted_den"])
        assert got == f, (r["bin"], got, f)
        assert r["fitted_ppm"] == (1_000_000 * r["fitted_num"]) // r["fitted_den"]
        if prev is not None:
            assert got >= prev, "isotonic fit must be non-decreasing"
        prev = got
        total += r["n"] * got
    assert total == sum(r["pos"] for r in rows)


def test_max_drawdown_recount(spark):
    """Cumulative EXCESS curve (n-scaled, mean-free), running peak,
    drawdowns and the series max recounted in pandas over the month
    axis — and the drawdown must be NONZERO somewhere (r8 ADVICE: the
    raw cumulative-revenue form was monotone, so the peak/trough logic
    was never exercised)."""
    rows = sorted(
        REG["orders_max_drawdown"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["month"],
    )
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    o["mo"] = pd.to_datetime(o.o_orderdate).dt.to_period("M")
    cents = (o.o_totalprice.round(2) * 100).round().astype("int64")
    y = cents.groupby(o.mo).sum().sort_index()
    n = int(len(y))
    tot = int(y.sum())
    excess = y.astype(object) * n - tot  # exact python ints, no overflow
    cum = excess.cumsum()
    peak = cum.cummax()
    dd = peak - cum
    assert [r["month"] for r in rows] == [str(p) for p in y.index]
    # the excess curve must actually decline somewhere: below-mean
    # months exist in any non-constant series
    assert int(dd.max()) > 0, "drawdown degenerate again — series monotone?"
    for i, r in enumerate(rows):
        assert r["revenue_cents"] == int(y.iloc[i])
        assert r["cum_excess_scaled"] == int(cum.iloc[i])
        assert r["peak_excess_scaled"] == int(peak.iloc[i])
        assert r["drawdown_scaled"] == int(dd.iloc[i]) >= 0
        assert r["drawdown_ppm"] == (1_000_000 * int(dd.iloc[i])) // (n * tot)
        assert r["max_drawdown_scaled"] == int(dd.max())


def test_mann_whitney_recount(spark):
    """Doubled midrank sums, U statistics and the tie-corrected
    variance replayed with scipy-free exact Fractions; U0 + U1 must
    equal n1*n2 and the significance flag must match the exact
    z^2-vs-3.8415 comparison."""
    from fractions import Fraction

    rows = {r["arm"]: r for r in REG["sample_mann_whitney_u"].fn(spark, SF_ORACLE).collect()}
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    # mirror the engine's lattice: half-even per event, sum per user
    cents = (ev.value * 100).round().astype("int64")  # numpy rounds half-even
    metric = cents.groupby(ev.user_id).sum()
    arm = pd.Series(metric.index % 2, index=metric.index)
    ranks2 = {}
    sorted_vals = metric.sort_values()
    # doubled midranks by tie group
    import collections

    counts = collections.Counter(metric)
    before = 0
    r2_of = {}
    for v in sorted(counts):
        c = counts[v]
        r2_of[v] = 2 * before + c + 1
        before += c
    for a in (0, 1):
        vals = metric[arm == a]
        ranks2[a] = sum(r2_of[v] for v in vals)
        assert rows[a]["n_users"] == len(vals)
        assert rows[a]["rank_sum_x2"] == ranks2[a]
    n1 = rows[0]["n_users"]
    n2 = rows[1]["n_users"]
    u1_x2 = ranks2[0] - n1 * (n1 + 1)
    assert rows[0]["u_x2"] == u1_x2
    assert rows[1]["u_x2"] == 2 * n1 * n2 - u1_x2
    n = n1 + n2
    t = sum(c**3 - c for c in counts.values())
    v = Fraction(n1 * n2 * ((n + 1) * n * (n - 1) - t), 12 * n * (n - 1))
    assert Fraction(int(rows[0]["var_num"]), int(rows[0]["var_den"])) == v
    d2 = Fraction(u1_x2 - n1 * n2)
    z2 = d2 * d2 / (4 * v)
    assert rows[0]["significant"] == int(z2 >= Fraction(38415, 10000))


def test_ks_two_sample_recount(spark):
    """KS gap replayed exactly in python ints over the per-user metric
    ECDFs; the significance flag matches the squared comparison (and
    scipy's D when scipy is importable)."""
    rows = REG["sample_ks_two_sample"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    cents = (ev.value * 100).round().astype("int64")
    metric = cents.groupby(ev.user_id).sum()
    arm = metric.index % 2
    m0 = sorted(metric[arm == 0])
    m1 = sorted(metric[arm == 1])
    n1, n2 = len(m0), len(m1)
    assert (r["n1"], r["n2"]) == (n1, n2)
    values = sorted(set(m0) | set(m1))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(m0, v) * n2 - bisect.bisect_right(m1, v) * n1)
        for v in values
    )
    assert r["d_gap_num"] == d_num
    assert r["d_gap_den"] == n1 * n2
    assert r["d_ppm"] == (1_000_000 * d_num) // (n1 * n2)
    from snackfs_spark.operators.sampling import KS_C2_DEN, KS_C2_NUM

    assert r["significant"] == int(
        d_num * d_num * KS_C2_DEN >= KS_C2_NUM * n1 * n2 * (n1 + n2)
    )


def test_ks_two_sample_scipy_crosscheck(spark):
    """Library cross-check of the KS D statistic. Split out of the
    exact-rational recount (which always runs) so the optional
    dependency SKIPS VISIBLY under `pytest -rs` instead of silently
    returning mid-test (r8 VERDICT #4); test_optional_deps.py pins the
    skip reason."""
    import importlib.util

    if importlib.util.find_spec("scipy") is None:
        pytest.skip(
            "scipy not installed in this env — exact-rational recount "
            "still validates the KS test (test_ks_two_sample_recount)"
        )
    from scipy.stats import ks_2samp

    rows = REG["sample_ks_two_sample"].fn(spark, SF_ORACLE).collect()
    r = rows[0]
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    cents = (ev.value * 100).round().astype("int64")
    metric = cents.groupby(ev.user_id).sum()
    arm = metric.index % 2
    m0 = sorted(metric[arm == 0])
    m1 = sorted(metric[arm == 1])
    d = ks_2samp(m0, m1).statistic
    assert abs(d - r["d_gap_num"] / (r["n1"] * r["n2"])) < 1e-12
