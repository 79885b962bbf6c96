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
    t_us = ev.ts.astype("datetime64[us]").astype("int64")  # exact micros
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


def test_conformal_coverage_and_k(spark):
    """The (n+1)-corrected k is exact, the threshold is the k-th
    smallest calibration score (pandas recount), and measured coverage
    is near-or-above 1 - alpha for the loosest level."""
    import hashlib
    import math

    rows = {
        r["alpha_ppm"]: r
        for r in REG["eval_conformal_threshold"].fn(spark, SF_ORACLE).collect()
    }
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    stops = {"the", "a", "and", "with", "of", "in"}
    score = docs.text.apply(
        lambda t: 1000 * sum(w in stops for w in t.split(" ")) // len(t.split(" "))
    )
    half = docs.doc_id.apply(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 2
    )
    calib = sorted(score[half == 0])
    ev = score[half == 1]
    for alpha, r in rows.items():
        n = len(calib)
        k = math.ceil((n + 1) * (1_000_000 - alpha) / 1_000_000)
        assert r["n_calib"] == n and r["k"] == k
        if k <= n:
            assert r["threshold_score"] == calib[k - 1]
        cov = int((ev <= r["threshold_score"]).sum())
        assert r["n_covered"] == cov
        assert r["coverage_ppm"] == 1_000_000 * cov // len(ev)
    # loosest level (10%): coverage should sit at or above 1-alpha
    assert rows[100000]["coverage_ppm"] >= 850000


def test_bootstrap_ci_brackets_point_and_replays(spark):
    """Replicate weights replay from the md5 CDF inversion; the CI
    brackets the point estimate; replicate masses stay near n."""
    import hashlib

    from snackfs_spark.operators.textstats import BOOT_B, BOOT_CDF_PPM

    rows = sorted(
        REG["eval_bootstrap_ci"].fn(spark, SF_ORACLE).collect(), key=lambda r: r["b"]
    )
    assert len(rows) == BOOT_B
    r0 = rows[0]
    assert r0["ci_lo_x1000"] <= r0["point_x1000"] <= r0["ci_hi_x1000"]
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    stops = {"the", "a", "and", "with", "of", "in"}
    score = docs.text.apply(
        lambda t: 1000 * sum(w in stops for w in t.split(" ")) // len(t.split(" "))
    ).values
    ids = docs.doc_id.values
    n = len(ids)
    for b in (0, 7, BOOT_B - 1):
        w = []
        for d in ids:
            u = int(hashlib.md5(f"{d}-{b}".encode()).hexdigest()[:15], 16) % 1000000
            w.append(next((k for k, p in enumerate(BOOT_CDF_PPM) if u < p), len(BOOT_CDF_PPM)))
        sum_w = sum(w)
        ws = sum(wi * si for wi, si in zip(w, score))
        row = rows[b]
        assert row["sum_w"] == sum_w and row["score_wsum"] == ws
        assert row["mean_x1000"] == 1000 * ws // sum_w
        # Poisson(1) mass concentrates near n
        assert abs(sum_w - n) < n // 2


def test_pareto_abc_equals_global_sort(spark):
    """The banded two-phase classification equals the plain global-sort
    ABC recount in pandas, and class revenue shares are Pareto-ordered."""
    rows = {r["abc_class"]: r for r in REG["orders_pareto_abc"].fn(spark, SF_ORACLE).collect()}
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    cents = (
        orders.assign(c=(orders.o_totalprice.apply(lambda v: round(v, 2)) * 100).round().astype("int64"))
        .groupby("o_custkey").c.sum()
    )
    df = cents.sort_values(ascending=False).reset_index()
    df = df.sort_values(["c", "o_custkey"], ascending=[False, True])
    total = int(df.c.sum())
    cum = df.c.cumsum()
    cls = cum.apply(
        lambda c: "A" if 5 * c <= 4 * total else ("B" if 20 * c <= 19 * total else "C")
    )
    expect = df.assign(cls=cls).groupby("cls").agg(n=("c", "size"), rev=("c", "sum"))
    for c in expect.index:
        assert rows[c]["n_customers"] == int(expect.loc[c, "n"])
        assert rows[c]["revenue_cents"] == int(expect.loc[c, "rev"])
    # share ordering holds by construction (80/15/5 cut); the CUSTOMER
    # count ordering does not on uniform synthetic revenue (A takes most
    # customers when no head exists) — that absence is the diagnostic.
    assert rows["A"]["revenue_share_ppm"] > rows["B"]["revenue_share_ppm"]
    assert rows["B"]["revenue_share_ppm"] > rows["C"]["revenue_share_ppm"]


def test_kcore_fixpoint_and_monotone(spark):
    """Peeling is monotone (alive never grows), the last round certifies
    the fixpoint, and survivors each keep >= K candidate partners."""
    from snackfs_spark.operators.graph import KCORE_K

    rows = sorted(
        REG["graph_kcore_decomposition"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["round"],
    )
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_before"] == prev["n_alive"]
        assert cur["n_alive"] <= prev["n_alive"]
    last = rows[-1]
    assert last["n_removed"] == 0, "did not reach the fixpoint in KCORE_ROUNDS"
    # the surviving core supports min degree K: edges/2 >= alive*K/2
    assert 2 * last["n_core_edges"] >= KCORE_K * last["n_alive"]


def test_ring_scaling_minimal_disruption(spark):
    """Only the donor host loses load, the new node gains exactly the
    moved volume, total load is conserved, and the donor's loss equals
    the new node's gain (the consistent-hashing minimal-move claim)."""
    rows = REG["fs_ring_scaling_plan"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 26
    new = [r for r in rows if r["is_new"] == 1]
    assert len(new) == 1 and new[0]["load_after"] == new[0]["n_blocks_moved"]
    changed = [r for r in rows if r["is_new"] == 0 and r["load_before"] != r["load_after"]]
    assert len(changed) == 1
    assert changed[0]["load_before"] - changed[0]["load_after"] == new[0]["load_after"]
    assert sum(r["load_before"] for r in rows) == sum(r["load_after"] for r in rows)
    # the donor was the heaviest host
    assert changed[0]["load_before"] == max(r["load_before"] for r in rows)


def test_generalization_ladder_monotone_and_chosen(spark):
    """Coarsening can only help: min_k non-decreasing, n_classes
    non-increasing, rows-at-risk non-increasing up the ladder; the
    chosen level is the first achieved rung."""
    rows = sorted(
        REG["privacy_generalization_ladder"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["level"],
    )
    assert [r["level"] for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b["min_k"] >= a["min_k"]
        assert b["n_classes"] <= a["n_classes"]
        assert b["n_rows_at_risk"] <= a["n_rows_at_risk"]
    chosen = rows[0]["chosen_level"]
    achieved = [r["level"] for r in rows if r["achieved"] == 1]
    assert chosen == (min(achieved) if achieved else -1)
    for r in rows:
        assert (r["min_k"] >= 5) == (r["achieved"] == 1)


def test_srm_check_null_case_and_algebra(spark):
    """On the clean md5 split the SRM flag must NOT fire (the split is
    fair by construction); the chi-square recomputes from the counts."""
    rows = {r["split"]: r for r in REG["sample_srm_check"].fn(spark, SF_ORACLE).collect()}
    assert set(rows) == {"train", "val", "test"}
    n = sum(r["n_obs"] for r in rows.values())
    exp = {"train": 80, "val": 10, "test": 10}
    num = sum(
        (100 * rows[s]["n_obs"] - n * p) ** 2 * (400 // p) for s, p in exp.items()
    )
    den = 40000 * n
    r0 = rows["train"]
    assert r0["chi2"] == num / den
    assert r0["srm_flag"] == (1 if 100 * num > 599 * den else 0)
    assert r0["srm_flag"] == 0  # the hash split is fair
    assert all(r["exp_permille"] == exp[s] * 10 for s, r in rows.items())


def test_harmonic_centrality_python_replay(spark):
    """h12 replays from a pure-python BFS over the same vocab-restricted
    edge set (distances capped at 4); zeros only for unreachable nodes."""
    rows = {r["token"]: r for r in REG["graph_harmonic_centrality"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    from collections import Counter, deque

    words = docs.text.str.split(" ")
    cnt = Counter(w for ws in words for w in ws if w != "")
    vocab = set(
        w for w, _ in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:150]
    )
    edges = {}
    for ws in words:
        for a, b in zip(ws, ws[1:]):
            if a != b and a in vocab and b in vocab:
                edges.setdefault(a, set()).add(b)
    for v in rows:
        assert v in vocab
    # BFS from every source, accumulate onto destinations
    counts = {v: [0, 0, 0, 0] for v in vocab}
    for src in vocab:
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            if dist[u] >= 4:
                continue
            for nb in edges.get(u, ()):
                if nb not in dist:
                    dist[nb] = dist[u] + 1
                    dq.append(nb)
        for v, d in dist.items():
            if v != src and 1 <= d <= 4:
                counts[v][d - 1] += 1
    for v, r in rows.items():
        c = counts[v]
        assert [r["c1"], r["c2"], r["c3"], r["c4"]] == c
        assert r["h12"] == 12 * c[0] + 6 * c[1] + 4 * c[2] + 3 * c[3]


def test_audio_resample_numpy_replay(spark):
    """Per-asset resample stats replay from a direct numpy 3:2 lattice
    on the text bytes; output length is the exact 2/3 lattice count."""
    import numpy as np

    rows = {r["asset_id"]: r for r in REG["multimodal_audio_resample"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    checked = 0
    for _, doc in docs.head(20).iterrows():
        buf = doc.text.encode()
        usable = len(buf) - (len(buf) % 2)
        s = np.frombuffer(buf[:usable], dtype="<i2").astype(np.int64)
        if len(s) < 2:
            assert doc.doc_id not in rows
            continue
        n = len(s)
        m = (2 * (n - 1)) // 3 + 1
        j = np.arange(m)
        p2 = 3 * j
        idx = p2 // 2
        hi = np.minimum(idx + 1, n - 1)
        out2 = np.where(p2 % 2 == 0, 2 * s[idx], s[idx] + s[hi])
        r = rows[doc.doc_id]
        assert r["n_in"] == n and r["n_out"] == m
        assert r["energy_in"] == int((s * s).sum())
        assert r["energy_out_x4"] == int((out2 * out2).sum())
        assert r["peak_out_x2"] == int(np.abs(out2).max())
        checked += 1
    assert checked >= 15


def test_rake_scores_recount(spark):
    """Top phrases replay from a pure-python RAKE with the same integer
    milli word scores; top-K ordering and occurrence counts match."""
    from collections import Counter

    from snackfs_spark.operators.textstats import RAKE_STOPS, RAKE_TOPK

    rows = REG["text_rake_keywords"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == RAKE_TOPK
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    stops = set(RAKE_STOPS) | {""}
    phrases = []
    for t in docs.text:
        cur = []
        for w in t.split(" "):
            if w in stops:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    ws = {w: 1000 * deg[w] // freq[w] for w in freq}
    agg = {}
    for p in phrases:
        key = " ".join(p)
        sc = sum(ws[w] for w in p)
        n, _, _ = agg.get(key, (0, len(p), sc))
        agg[key] = (n + 1, len(p), sc)
    top = sorted(agg.items(), key=lambda kv: (-kv[1][2], kv[0]))[:RAKE_TOPK]
    got = [(r["phrase"], r["n_occurrences"], r["n_words"], r["score_x1000"]) for r in rows]
    want = [(k, v[0], v[1], v[2]) for k, v in top]
    assert sorted(got) == sorted(want)


def test_duplicate_payments_recount(spark):
    """Every reported group recounts in pandas on exact cents; no
    singleton groups leak through."""
    rows = REG["orders_duplicate_payments"].fn(spark, SF_ORACLE).collect()
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    cents = (orders.o_totalprice.apply(lambda v: round(v, 2)) * 100).round().astype("int64")
    g = orders.assign(c=cents).groupby(["o_custkey", "c"])
    expect = {
        k: (len(v), v.o_orderkey.min(), v.o_orderkey.max())
        for k, v in g if len(v) >= 2
    }
    got = {
        (r["o_custkey"], r["amount_cents"]): (
            r["n_orders"], r["first_orderkey"], r["last_orderkey"]
        )
        for r in rows
    }
    assert got == expect
    assert all(r["n_orders"] >= 2 for r in rows)


def test_stop_list_contains_glue_not_topical(spark):
    """The induced list must include high-df uniform words and the flag
    must equal the two-rule conjunction recomputed from the row."""
    rows = REG["text_stop_list_induction"].fn(spark, SF_ORACLE).collect()
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    n_docs = len(docs)
    flagged = 0
    for r in rows:
        rule = (
            1000 * r["n_docs_present"] // n_docs >= 500
            and r["var_num"] <= 2 * r["var_den"]
        )
        assert r["is_stopword"] == (1 if rule else 0)
        flagged += r["is_stopword"]
    assert flagged >= 1  # the corpus has everywhere-uniform glue


def test_conversion_lag_bisect_replay(spark):
    """Quantile bins replay from a pandas recount of first-signup ->
    first-purchase lags; funnel totals conserve."""
    import math

    rows = {r["q"]: r for r in REG["events_conversion_lag"].fn(spark, SF_ORACLE).collect()}
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    t_us = ev.ts.astype("datetime64[us]").astype("int64")  # exact micros
    ev = ev.assign(t_us=t_us)
    su = ev[ev.event_type == "signup"].groupby("user_id").t_us.min()
    lags = []
    pur = ev[ev.event_type == "purchase"]
    for u, s in su.items():
        after = pur[(pur.user_id == u) & (pur.t_us >= s)]
        if len(after):
            lags.append(int((after.t_us.min() - s) // 1_000_000))
    lags.sort()
    bins = sorted(l // 3600 for l in lags)
    for q, r in rows.items():
        k = (q * len(lags) + 99) // 100
        assert r["k"] == k and r["n_converted"] == len(lags)
        assert r["lag_bin"] == bins[k - 1]
        assert r["n_signup"] == len(su)
        assert r["conversion_permille"] == 1000 * len(lags) // len(su)


def test_t_closeness_identities(spark):
    """EMD is zero iff the class CDF equals the corpus CDF scaled; all
    EMDs sit in [0, 1]; flags recompute from the rational."""
    rows = REG["privacy_t_closeness"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["emd_num"] <= r["emd_den"]
        assert r["emd"] == r["emd_num"] / r["emd_den"]
        assert r["t_flag"] == (1 if 4 * r["emd_num"] > r["emd_den"] else 0)
    # class sizes conserve the customer count
    cust = pd.read_parquet(f"{SF_ORACLE}/customer.parquet")
    assert sum(r["k"] for r in rows) == len(cust)


def test_kmeans_elbow_monotone_inertia(spark):
    """More clusters can only lower the Lloyd's objective on this
    deterministic seeding: inertia non-increasing in k, all clusters
    used, ratio column consistent."""
    rows = sorted(REG["emb_kmeans_elbow"].fn(spark, SF_ORACLE).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [2, 4, 8, 16]
    for r in rows:
        assert r["n_clusters_used"] == r["k"]
        assert r["inertia"] == r["inertia_q9"] / 1e9
    for a, b in zip(rows, rows[1:]):
        assert b["inertia_q9"] <= a["inertia_q9"]
        assert b["ratio_prev_permille"] == 1000 * b["inertia_q9"] // a["inertia_q9"]


def test_pvm_waterfall_identity(spark):
    """Per brand, volume + price/mix effects must sum EXACTLY to the
    revenue delta (the waterfall identity on the shared denominator);
    totals recount in pandas."""
    rows = REG["lineitem_pvm_decomposition"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # vol_num/den + price_num/den == delta  (exact rational identity;
        # numerators arrive as exact digit strings — int64-unsafe at scale)
        vol, price = int(r["vol_num"]), int(r["price_num"])
        assert vol + price == r["delta_cents"] * r["den"]
        assert r["volume_effect"] == vol / r["den"]
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_ORACLE}/part.parquet")
    j = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    j = j.assign(y=j.l_shipdate.dt.year)
    j = j[j.y.isin([1996, 1997])]
    cents = (j.l_extendedprice.apply(lambda v: round(v, 2)) * 100).round().astype("int64")
    j = j.assign(cents=cents, q=j.l_quantity.astype("int64"))
    for r in rows[:5]:
        b = j[j.p_brand == r["p_brand"]]
        assert r["q1"] == int(b[b.y == 1996].q.sum())
        assert r["r2_cents"] == int(b[b.y == 1997].cents.sum())


def test_gini_matches_direct_formula(spark):
    """The banded-rank Gini equals the direct sorted-formula recount in
    pandas and sits in [0, 1)."""
    row = REG["orders_revenue_gini"].fn(spark, SF_ORACLE).collect()[0]
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    cents = (orders.o_totalprice.apply(lambda v: round(v, 2)) * 100).round().astype("int64")
    rev = orders.assign(c=cents).groupby("o_custkey").c.sum().reset_index()
    rev = rev.sort_values(["c", "o_custkey"]).reset_index(drop=True)
    n = len(rev)
    total = int(rev.c.sum())
    rank_wsum = int(((rev.index + 1) * rev.c).sum())
    num = 2 * rank_wsum - (n + 1) * total
    assert row["n"] == n and row["total_cents"] == total
    assert row["gini"] == num / (n * total)
    assert row["gini_permille"] == 1000 * num // (n * total)
    assert 0 <= row["gini"] < 1


def test_mcnemar_cells_recount(spark):
    """Discordant cells and the statistic recount in pandas; the flag
    matches the cross-multiplied critical compare."""
    row = REG["eval_mcnemar_paired"].fn(spark, SF_ORACLE).collect()[0]
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    stops = {"the", "a", "and", "with", "of", "in"}
    toks = docs.text.str.split(" ")
    y = ((docs.n_chars.between(100, 500)) & (toks.apply(len) >= 20)).astype(int)
    a = (
        toks.apply(lambda ws: 1000 * sum(w in stops for w in ws) // len(ws)) >= 300
    ).astype(int)
    b = (toks.apply(len) >= 25).astype(int)
    b_cell = int(((a == y) & (b != y)).sum())
    c_cell = int(((b == y) & (a != y)).sum())
    assert row["b_cell"] == b_cell and row["c_cell"] == c_cell
    den = max(b_cell + c_cell, 1)
    assert row["mcnemar"] == (b_cell - c_cell) ** 2 / den
    assert row["significant"] == (1 if 100 * (b_cell - c_cell) ** 2 > 384 * den else 0)


def test_assortativity_bounds_and_moments(spark):
    """The moment sums recount from a python edge construction; r sits
    in [-1, 1]."""
    row = REG["graph_degree_assortativity"].fn(spark, SF_ORACLE).collect()[0]
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    from collections import Counter

    words = docs.text.str.split(" ")
    cnt = Counter(w for ws in words for w in ws if w != "")
    vocab = set(w for w, _ in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:150])
    edges = set()
    for ws in words:
        for x, z in zip(ws, ws[1:]):
            if x != z and x in vocab and z in vocab:
                edges.add((x, z))
    od, idg = Counter(), Counter()
    for x, z in edges:
        od[x] += 1
        idg[z] += 1
    xs = [(od[x], idg[z]) for x, z in edges]
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    assert row["n_edges"] == n and row["sum_x"] == sx and row["sum_y"] == sy
    assert row["cov_num"] == n * sxy - sx * sy
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    assert row["var_x"] == n * sxx - sx * sx
    assert row["var_y"] == n * syy - sy * sy
    assert -1.0 <= row["assortativity"] <= 1.0
    if row["var_x"] == 0 or row["var_y"] == 0:
        assert row["assortativity"] == 0.0  # regular graph: defined fallback


def test_scene_cuts_pandas_replay(spark):
    """Cut flags and shot structure replay from a pandas pass over the
    tile sums; shots always number cuts + 1."""
    rows = {r["asset_id"]: r for r in REG["multimodal_scene_cuts"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    checked = 0
    for _, doc in docs.head(15).iterrows():
        buf = doc.text.encode()
        n_frames = len(buf) // 256
        if n_frames == 0:
            assert doc.doc_id not in rows
            continue
        sums = [sum(buf[i * 256 : (i + 1) * 256]) for i in range(n_frames)]
        cuts = [
            1 if i > 0 and abs(sums[i] - sums[i - 1]) > 8 * 256 else 0
            for i in range(n_frames)
        ]
        r = rows[doc.doc_id]
        assert r["n_frames"] == n_frames and r["n_cuts"] == sum(cuts)
        assert r["n_shots"] == sum(cuts) + 1
        # longest shot from the islands
        longest, cur = 0, 0
        for c in cuts:
            cur = cur + 1 if c == 0 else 1
            longest = max(longest, cur)
        assert r["longest_shot"] == longest
        first = next((i for i, c in enumerate(cuts) if c), -1)
        assert r["first_cut_idx"] == first
        checked += 1
    assert checked >= 8


def test_lang_confusion_margins_and_shares(spark):
    """Cells conserve the corpus; row/column shares recompute from the
    margins; diagonal shares are the per-class recall."""
    rows = REG["eval_lang_confusion"].fn(spark, SF_ORACLE).collect()
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    assert sum(r["n"] for r in rows) == len(docs)
    by_label = {}
    for r in rows:
        by_label.setdefault(r["lang"], 0)
        by_label[r["lang"]] += r["n"]
        assert r["recall_share_ppm"] == 1_000_000 * r["n"] // r["label_total"]
        assert r["precision_share_ppm"] == 1_000_000 * r["n"] // r["pred_total"]
    for r in rows:
        assert by_label[r["lang"]] == r["label_total"]


def test_neyman_allocation_exact_budget_and_isqrt(spark):
    """The allocation sums to the budget exactly; weights are the exact
    integer square roots of the radicands; pandas recount."""
    import math

    rows = REG["sample_neyman_allocation"].fn(spark, SF_ORACLE).collect()
    assert sum(r["n_alloc"] for r in rows) == 1000
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    for r in rows:
        g = docs[docs.lang == r["lang"]].n_chars.astype("int64")
        rad = len(g) * int((g * g).sum()) - int(g.sum()) ** 2
        assert r["radicand"] == rad
        assert r["w"] == math.isqrt(rad)
        assert r["w"] * r["w"] <= rad < (r["w"] + 1) ** 2
        assert r["n_alloc"] in (r["alloc_floor"], r["alloc_floor"] + 1)


def test_cohort_ltv_triangle_identities(spark):
    """Cohort sizes conserve customers, revenue conserves the order
    total, cumulatives are per-cohort monotone, and age-0 cells exist
    for every cohort (the first order itself)."""
    rows = REG["orders_cohort_ltv"].fn(spark, SF_ORACLE).collect()
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    cents = (orders.o_totalprice.apply(lambda v: round(v, 2)) * 100).round().astype("int64")
    assert sum(r["revenue_cents"] for r in rows) == int(cents.sum())
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_year"], []).append(r)
    sizes = {c: rs[0]["cohort_size"] for c, rs in by_cohort.items()}
    assert sum(sizes.values()) == orders.o_custkey.nunique()
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age"])
        assert rs[0]["age"] == 0
        cum = 0
        for r in rs:
            cum += r["revenue_cents"]
            assert r["cum_revenue_cents"] == cum
            assert r["cum_ltv_cents_per_customer"] == cum // r["cohort_size"]


def test_pca_power_iteration_numpy_replay(spark):
    """The integer loading vector replays from a numpy implementation of
    the exact lattice algebra (quantize, two passes, digit-string
    rescale, sign-trunc divide), and is a genuine dominant direction:
    its Rayleigh quotient beats a fixed reference direction's."""
    import numpy as np

    rows = sorted(
        REG["emb_pca_power_iteration"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["pos"],
    )
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype(np.float64)
    # numpy replay with python ints (decimal(38,0) semantics)
    Q = [[int(v) for v in np.vectorize(lambda x: int(np.round(x * 1000)))(row)] for row in X]
    # bround is HALF_EVEN: numpy.round matches banker's rounding
    v = [1] * 64
    for _ in range(3):
        m = [0] * 64
        for q in Q:
            s = sum(a * b for a, b in zip(q, v))
            for j in range(64):
                m[j] += q[j] * s
        mx = max(abs(x) for x in m)
        sh = 10 ** max(len(str(mx)) - 6, 0)
        v = [(-((-x) // sh) if x < 0 else x // sh) for x in m]
    assert [r["loading"] for r in rows] == v
    # dominant-direction sanity: Rayleigh quotient of v beats e_1's
    vv = np.array(v, dtype=np.float64)
    vv = vv / np.linalg.norm(vv)
    e1 = np.zeros(64)
    e1[0] = 1.0
    G = X.T @ X
    assert vv @ G @ vv > e1 @ G @ e1


def test_readability_rational_identity(spark):
    """fre doubles equal their rationals; components recount in pandas
    with the 25-word fallback segmentation."""
    import re

    rows = {r["doc_id"]: r for r in REG["text_readability"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    for _, doc in docs.head(25).iterrows():
        w = max(sum(1 for t in doc.text.split(" ") if t != ""), 1)
        s = max(len(re.findall(r"[.!?]", doc.text)), (w + 24) // 25)
        sy = len(re.findall(r"[aeiou]+", doc.text))
        r = rows[doc.doc_id]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, sy)
        num = 206835 * s * w - 1015 * w * w - 84600 * sy * s
        assert r["fre_num"] == num and r["fre_den"] == 1000 * s * w
        assert r["fre"] == num / (1000 * s * w)


def test_rfm_migration_matrix_conserves_customers(spark):
    """Matrix cells conserve the customer universe (each customer in
    exactly one cell); no (absent, absent) cell exists; shares
    recompute."""
    rows = REG["orders_rfm_migration"].fn(spark, SF_ORACLE).collect()
    orders = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    n_total = sum(r["n_customers"] for r in rows)
    assert n_total == orders.o_custkey.nunique()
    assert not any(r["seg_from"] == "absent" and r["seg_to"] == "absent" for r in rows)
    for r in rows:
        assert r["share_ppm"] == 1_000_000 * r["n_customers"] // n_total
        assert r["stable"] == (1 if r["seg_from"] == r["seg_to"] else 0)


def test_anisotropy_consistent_with_pca(spark):
    """The score recomputes from the PCA loading vector and the
    quantized corpus; it sits in (1/64 - eps, 1]."""
    import numpy as np

    row = REG["emb_anisotropy_score"].fn(spark, SF_ORACLE).collect()[0]
    loadings = sorted(
        REG["emb_pca_power_iteration"].fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["pos"],
    )
    v = [r["loading"] for r in loadings]
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype(np.float64)
    Q = np.round(X * 1000).astype(object)  # python ints via object math
    s = (Q * np.array(v, dtype=object)).sum(axis=1)
    vgv = int(sum(int(x) * int(x) for x in s))
    trace = int(sum(int(e) * int(e) for row_ in Q for e in row_))
    vv = sum(x * x for x in v)
    assert int(row["vgv"]) == vgv
    assert row["trace_g"] == trace and row["vv"] == vv
    assert row["anisotropy_ppm"] == 1_000_000 * vgv // (vv * trace)
    assert row["anisotropy"] > 1 / 128  # far above degenerate-zero


def test_balanced_classes_exact_quota(spark):
    """Every language keeps exactly the minority count, the kept set is
    the md5-bucket-major prefix, and ranks are 1..m per class."""
    rows = REG["sample_balanced_classes"].fn(spark, SF_ORACLE).collect()
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    m = int(docs.lang.value_counts().min())
    by_lang = {}
    for r in rows:
        assert r["class_quota"] == m
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    assert set(docs.lang.unique()) == set(by_lang)
    import hashlib

    for lang, rks in by_lang.items():
        assert sorted(rks) == list(range(1, m + 1))
        g = docs[docs.lang == lang]
        fps = {
            d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
            for d in g.doc_id
        }
        order = sorted(g.doc_id, key=lambda d: (fps[d] % 1024, fps[d], d))
        kept = {r["doc_id"] for r in rows if r["lang"] == lang}
        assert kept == set(order[:m])


def test_clustering_coefficient_bounds_and_recount(spark):
    """cc in [0, 1]; per-node triangles/degrees recount in python over
    the same vocab-restricted undirected edges."""
    from collections import Counter
    from itertools import combinations

    rows = {r["token"]: r for r in REG["graph_clustering_coefficient"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    words = docs.text.str.split(" ")
    cnt = Counter(w for ws in words for w in ws if w != "")
    vocab = set(w for w, _ in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:150])
    und = set()
    for ws in words:
        for a, b in zip(ws, ws[1:]):
            if a != b and a in vocab and b in vocab:
                und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for tok, r in rows.items():
        nb = adj.get(tok, set())
        assert r["degree"] == len(nb)
        tri = sum(
            1 for x, y in combinations(sorted(nb), 2) if (min(x, y), max(x, y)) in und
        )
        assert r["n_triangles"] == tri
        if r["degree"] >= 2:
            assert r["cc_ppm"] == 1_000_000 * 2 * tri // (len(nb) * (len(nb) - 1))
            assert 0 <= r["cc_ppm"] <= 1_000_000
        else:
            assert r["cc_ppm"] == 0


def test_split_distribution_check_near_zero_tv(spark):
    """The hash split is composition-fair: every split's TV from the
    corpus language distribution stays small; the rational recomputes
    in pandas."""
    import hashlib

    rows = {r["split"]: r for r in REG["split_distribution_check"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    bucket = docs.doc_id.apply(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 100
    )
    split = bucket.apply(lambda b: "train" if b < 80 else ("val" if b < 90 else "test"))
    N = len(docs)
    corp = docs.lang.value_counts()
    for sname, r in rows.items():
        g = docs[split == sname]
        sn = len(g)
        tv_num = sum(
            abs(int((g.lang == l).sum()) * N - int(corp[l]) * sn) for l in corp.index
        )
        assert r["n_split"] == sn and r["tv_num"] == tv_num
        assert r["tv"] == tv_num / (2 * sn * N)
        assert r["tv"] < 0.2  # fair split: far from a composition skew


def test_image_simpson_numpy_replay(spark):
    """Per-asset histogram Simpson replays from numpy over the text
    bytes (full tiles only); index sits in [0, 1)."""
    import numpy as np

    rows = {r["asset_id"]: r for r in REG["multimodal_image_simpson"].fn(spark, SF_ORACLE).collect()}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    checked = 0
    for _, doc in docs.head(15).iterrows():
        buf = np.frombuffer(doc.text.encode(), dtype=np.uint8)
        usable = (len(buf) // 256) * 256
        if not usable:
            assert doc.doc_id not in rows
            continue
        counts = np.bincount(buf[:usable] >> 4, minlength=16)
        n = int(counts.sum())
        ssq = int((counts.astype(np.int64) ** 2).sum())
        r = rows[doc.doc_id]
        assert r["n_px"] == n
        assert r["n_bins_used"] == int((counts > 0).sum())
        assert r["simpson_num"] == n * n - ssq and r["simpson_den"] == n * n
        assert 0 <= r["simpson"] < 1
        checked += 1
    assert checked >= 8
