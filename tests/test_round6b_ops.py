"""Behavior tests for the round-6 continuation operators, beyond the
oracle hash checks: Benford constant/conservation identities, Zipf
octave partition algebra, and the DiD cell/estimate identities."""

from __future__ import annotations

import pandas as pd

from snackfs_spark.operators.relational import BENFORD_EXPECTED_PPM
from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE

REG = load_all()


def test_benford_constants_and_conservation(spark):
    """Expected ppm constants are a probability distribution (sum exactly
    1e6); per-digit counts recount the orders scan; tv equals the half
    L1 of the reported rows."""
    assert sum(BENFORD_EXPECTED_PPM.values()) == 1_000_000
    rows = REG["orders_benford_audit"].fn(spark, SF_ORACLE).collect()
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    digits = (
        orders.loc[orders.o_totalprice > 0, "o_totalprice"]
        .apply(lambda v: int(str(int(v))[0]))
        .value_counts()
    )
    assert {r["digit"]: r["n"] for r in rows} == digits.to_dict()
    tv = sum(r["dev_ppm"] for r in rows) // 2
    assert all(r["tv_ppm"] == tv for r in rows)
    assert all(r["exp_ppm"] == BENFORD_EXPECTED_PPM[r["digit"]] for r in rows)


def test_zipf_octaves_partition_algebra(spark):
    """Octaves partition the vocab: n_types <= 2^octave (octave k holds
    ranks [2^k, 2^(k+1))), token mass sums to the corpus token count,
    and max_freq is non-increasing with octave."""
    rows = sorted(
        REG["text_zipf_octaves"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["octave"],
    )
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    words = docs.text.str.split(" ").explode()
    words = words[words != ""]
    total_tokens = len(words)
    vocab = words.nunique()
    assert sum(r["tokens"] for r in rows) == total_tokens
    assert sum(r["n_types"] for r in rows) == vocab
    for r in rows:
        assert r["rank_lo"] == 2 ** r["octave"]
        assert 1 <= r["n_types"] <= 2 ** r["octave"]
    freqs = [r["max_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # top octave holds exactly the single rank-1 word at the corpus max
    assert rows[0]["n_types"] == 1
    assert rows[0]["max_freq"] == words.value_counts().iloc[0]


def test_diff_in_diff_cell_identities(spark):
    """Four ITT cells conserve the click volume and the user universe;
    the rational estimate recomputes from the cells; treatment is the
    strict above-mean pre-purchase rule."""
    rows = REG["events_diff_in_diff"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 4
    cells = {(r["treated"], r["period"]): r for r in rows}
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    t_us = ev.ts.astype("int64") // 1000  # nanos file -> micros
    cut = t_us.min() + (t_us.max() - t_us.min()) // 2
    ev = ev.assign(period=(t_us >= cut).map({True: "post", False: "pre"}))
    n_all = ev.user_id.nunique()
    pre_purch = (
        ev[(ev.event_type == "purchase") & (ev.period == "pre")]
        .groupby("user_id")
        .size()
    )
    total_pre = int(pre_purch.sum())
    treated = {
        u for u in ev.user_id.unique() if int(pre_purch.get(u, 0)) * n_all > total_pre
    }
    nT, nC = len(treated), n_all - len(treated)
    assert cells[(1, "pre")]["n_users"] == nT and cells[(0, "pre")]["n_users"] == nC
    clicks = ev[ev.event_type == "click"]
    assert sum(r["n_clicks"] for r in rows) == len(clicks)
    num = (
        cells[(1, "post")]["n_clicks"] - cells[(1, "pre")]["n_clicks"]
    ) * nC - (cells[(0, "post")]["n_clicks"] - cells[(0, "pre")]["n_clicks"]) * nT
    r0 = rows[0]
    assert r0["did_num"] == num and r0["did_den"] == nT * nC
    assert r0["did_estimate"] == num / (nT * nC)


def test_quality_perceptron_learns_and_replays(spark):
    """The trainer must (a) match a sequential numpy replay of the exact
    integer algebra round for round, and (b) end strictly below the
    majority-class error baseline (it LEARNS the gate, not the prior)."""
    import numpy as np

    from snackfs_spark.operators.textstats import (
        PERC_CENTER,
        PERC_QSCALE,
        PERC_ROUNDS,
    )

    rows = sorted(
        REG["text_quality_perceptron"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["round"],
    )
    assert len(rows) == PERC_ROUNDS + 1
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    n = docs.n_chars.values.astype(np.int64)
    tok = docs.text.str.split(" ").apply(len).values.astype(np.int64)
    y = np.where((n >= 100) & (n <= 500) & (tok >= 20), 1, -1)
    X = np.stack(
        [
            np.full_like(n, 100),
            (n - PERC_CENTER) ** 2 // PERC_QSCALE,
            tok,
        ],
        axis=1,
    )
    w = np.zeros(3, dtype=np.int64)
    for r in range(1, PERC_ROUNDS + 1):
        m = y * (X @ w) <= 0
        row = rows[r - 1]
        assert row["n_errors"] == int(m.sum())
        g = (y[m, None] * X[m]).sum(axis=0)
        w = w + np.floor_divide(g, r)  # floor division == pmod form
        assert [row["w0"], row["w1"], row["w2"]] == w.tolist()
    final_errors = int((y * (X @ w) <= 0).sum())
    assert rows[-1]["n_errors"] == final_errors
    majority_baseline = min(int((y == 1).sum()), int((y == -1).sum()))
    assert final_errors < majority_baseline


def test_random_projection_replay_and_recall(spark):
    """The sign matrix is the md5-parity constant; projected values
    replay in numpy (same left-fold order); recall fields are
    self-consistent and the projected index beats random chance."""
    import numpy as np

    from snackfs_spark.operators.similarity import RP_SIGNS, TOP_K

    rows = REG["emb_random_projection"].fn(spark, SF_ORACLE).collect()
    assert all(len(r) == 6 for r in rows)
    byq = {}
    for r in rows:
        byq.setdefault(r["query_id"], []).append(r)
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    n_corpus = len(emb) - 1
    S = np.array(RP_SIGNS, dtype=np.float64)
    assert S.shape == (16, 64) and set(np.unique(S)) == {-1.0, 1.0}
    V = np.stack(emb.embedding.values).astype(np.float64)
    Z = V @ S.T
    ids = emb.vec_id.values
    for q, qrows in byq.items():
        assert len(qrows) == TOP_K
        hits = sum(r["in_exact_topk"] for r in qrows)
        assert all(r["recall_permille"] == 100 * hits for r in qrows)
        # replay the projected top-k ordering for this query
        zi = Z[ids == q][0]
        cos = (Z @ zi) / (
            np.sqrt((Z * Z).sum(axis=1)) * np.sqrt((zi * zi).sum())
        )
        order = sorted(
            [(c, v) for c, v in zip(cos, ids) if v != q],
            key=lambda t: (-t[0], t[1]),
        )[:TOP_K]
        assert [v for _, v in order] == [
            r["vec_id"] for r in sorted(qrows, key=lambda r: r["proj_rank"])
        ]
    # mean recall must beat 5x the random-10-of-corpus baseline
    mean_recall = sum(
        qrows[0]["recall_permille"] for qrows in byq.values()
    ) / len(byq)
    random_baseline = 1000 * TOP_K / n_corpus
    assert mean_recall >= 5 * random_baseline
