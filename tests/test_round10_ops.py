"""Round-10 pins: the chi2 single-presence-pass plan + overflow ladder
(r9 VERDICT #5) and the de-skewed preference-pair ranking (r9 VERDICT
#4 — plan pin lives in test_plans.py, value replay in test_round9_ops).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snackfs_spark.plans import formatted_plan
from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE


def test_chi2_single_presence_pass(spark):
    """The (doc, token) DISTINCT presence relation feeds THREE
    consumers (df_all, cell, contingency); unchckpointed, the plan
    re-derived the tokenize+distinct subtree three times. The lazy
    checkpoint makes all three read ONE ExistingRDD: the final plan
    must contain NO Generate (explode) chain at all — the tokenize
    cost is paid once, at checkpoint materialization."""
    df = load_all()["text_chi2_keywords"].fn(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "Generate" not in plan, plan
    # the three ExistingRDD scans must all point at the SAME
    # checkpointed MapPartitionsRDD (the Arguments detail lines)
    rdd_lines = [
        l for l in plan.splitlines()
        if "MapPartitionsRDD[" in l and "localCheckpoint" in l
    ]
    assert len(rdd_lines) == 3, f"expected 3 checkpoint consumers: {rdd_lines}"
    rdd_ids = {l.split("MapPartitionsRDD[")[1].split("]")[0] for l in rdd_lines}
    assert len(rdd_ids) == 1, f"presence checkpoint not shared: {rdd_lines}"


def test_chi2_overflow_raises_loudly():
    """The documented ladder (CHI2_MICRO_EXPR): the O(N^5) numerator
    exceeds decimal(38,0) past ~2.5M docs, and ANSI mode must RAISE —
    never silently null — on the exact production expression. The
    synthetic contingency is a perfectly-separating token over a
    5M-doc corpus: numerator = 1e6 * 5e6 * (2.5e6 * 2.5e6)^2 ~ 2e38."""
    from snackfs_spark.operators.textstats import CHI2_MICRO_EXPR
    from snackfs_spark.session import get_spark

    spark = get_spark("test_round10_ops")
    m = 2_500_000
    df = spark.createDataFrame(
        [(m, 0, 0, m, m, 2 * m, m)],
        "n11 long, n10 long, n01 long, n00 long, n_c long, n_docs long, df_all long",
    )
    with pytest.raises(Exception) as exc:
        df.select(F.expr(CHI2_MICRO_EXPR).alias("chi2_micro")).collect()
    assert "NUMERIC_VALUE_OUT_OF_RANGE" in str(exc.value), exc.value


def test_chi2_expr_exact_below_threshold():
    """Just below the ladder: a 2M-doc synthetic contingency stays on
    the lattice and matches the python-int recount bit-for-bit."""
    from snackfs_spark.operators.textstats import CHI2_MICRO_EXPR
    from snackfs_spark.session import get_spark

    spark = get_spark("test_round10_ops")
    cases = [
        # (n11, n10, n01, n00) with n_c = n11+n10, df_all = n11+n01
        (900_000, 100_000, 200_000, 800_000),
        (1, 999_999, 999_999, 1),
        (500_000, 500_000, 500_000, 500_000),  # zero association
    ]
    rows = []
    for n11, n10, n01, n00 in cases:
        n_docs = n11 + n10 + n01 + n00
        rows.append((n11, n10, n01, n00, n11 + n10, n_docs, n11 + n01))
    df = spark.createDataFrame(
        rows,
        "n11 long, n10 long, n01 long, n00 long, n_c long, n_docs long, df_all long",
    )
    got = [
        r["chi2_micro"]
        for r in df.select(F.expr(CHI2_MICRO_EXPR).alias("chi2_micro")).collect()
    ]
    want = []
    for n11, n10, n01, n00, n_c, n_docs, df_all in rows:
        num = 1_000_000 * n_docs * (n11 * n00 - n10 * n01) ** 2
        den = n_c * (n_docs - n_c) * df_all * (n_docs - df_all)
        want.append(num // den)
    assert got == want


def test_doremi_reweight_python_replay(spark):
    """Replay the DOREMI_ROUNDS multiplicative-weight rounds in python
    bigints from the raw parquet: every per-source loss, final ppm
    weight and char allocation must match bit-for-bit — and the final
    mixture must (weakly) upweight the max-loss source vs uniform."""
    import pandas as pd

    from snackfs_spark.functions import STOPWORDS
    from snackfs_spark.operators.sampling import DOREMI_BUDGET, DOREMI_ROUNDS
    from snackfs_spark.registry import load_all

    rows = load_all()["mixture_doremi_reweight"].fn(spark, SF_ORACLE).collect()
    d = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    stop = set(STOPWORDS)

    def q(text: str) -> int:
        toks = text.split(" ")
        return (1000 * sum(t in stop for t in toks)) // len(toks)

    d["q"] = d.text.map(q)
    g = d.groupby("source")["q"].agg(["sum", "count"])
    loss = {s: 1000 - int(r["sum"]) // int(r["count"]) for s, r in g.iterrows()}
    n_docs = {s: int(r["count"]) for s, r in g.iterrows()}
    srcs = sorted(loss)
    u = 1_000_000 // len(srcs)
    w = {s: u for s in srcs}
    for _ in range(DOREMI_ROUNDS):
        wm = sum(w[s] * loss[s] for s in srcs) // sum(w.values())
        raw = {s: w[s] * (1000 + max(0, loss[s] - wm)) for s in srcs}
        tot = sum(raw.values())
        w = {s: (9 * ((1_000_000 * raw[s]) // tot) + u) // 10 for s in srcs}
    wsum = sum(w.values())
    want = {
        s: (n_docs[s], loss[s], w[s], DOREMI_BUDGET * w[s] // wsum) for s in srcs
    }
    got = {
        r["source"]: (
            r["n_docs"], r["loss_permille"], r["w_ppm"], r["alloc_chars"],
        )
        for r in rows
    }
    assert got == want
    # directional sanity: the highest-loss source gained vs uniform
    worst = max(srcs, key=lambda s: (loss[s], s))
    assert w[worst] >= u


def test_doremi_single_corpus_scan(spark):
    """The unrolled rounds must re-read the checkpointed |sources|-row
    relation, never the corpus: exactly ONE distinct checkpoint RDD and
    ZERO parquet scans in the final plan."""
    df = load_all()["mixture_doremi_reweight"].fn(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "Scan parquet" not in plan, plan
    rdd_ids = {
        l.split("MapPartitionsRDD[")[1].split("]")[0]
        for l in plan.splitlines()
        if "MapPartitionsRDD[" in l and "localCheckpoint" in l
    }
    assert len(rdd_ids) == 1, plan


def test_epoch_schedule_python_replay(spark):
    """Replay the dyadic-decay closed form in python bigints: for every
    source, F = min(target div avail, cap), rem = target mod avail (0 in
    the capped branch), eff = (avail*(2^(F+1)-2) + rem) / 2^F — and the
    closed form must equal the naive per-epoch sum it claims to be."""
    import pandas as pd

    from snackfs_spark.operators.sampling import EPOCH_CAP, EPOCH_TARGET_MULT
    from snackfs_spark.registry import load_all

    rows = load_all()["corpus_epoch_schedule"].fn(spark, SF_ORACLE).collect()
    d = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    g = d.groupby("source")["n_chars"].sum()
    total, c = int(g.sum()), len(g)
    target = EPOCH_TARGET_MULT * total // c
    want = {}
    for src, avail in g.items():
        avail = int(avail)
        f = min(target // avail, EPOCH_CAP)
        rem = 0 if target // avail > EPOCH_CAP else target % avail
        num = avail * (2 ** (f + 1) - 2) + rem
        den = 2**f
        # the closed form IS the per-epoch sum, scaled by 2^F
        # epoch k contributes avail/2^(k-1); scaled by 2^F that is
        # avail * 2^(F-k+1)
        naive = sum(avail * 2 ** (f - k + 1) for k in range(1, f + 1)) + rem
        assert num == naive, (src, num, naive)
        want[src] = (avail, target, f, rem, num, den, num // den,
                     1_000_000 * (num // den) // target)
    got = {
        r["source"]: (
            r["avail_chars"], r["target_chars"], r["full_epochs"],
            r["remainder_chars"], r["eff_num"], r["eff_den"],
            r["effective_chars"], r["value_retained_ppm"],
        )
        for r in rows
    }
    assert got == want
    # the fixture must exercise the REAL branch: epochs >= 1 with
    # nonzero remainders somewhere (not the cap, not zero-epoch)
    fs = [v[2] for v in want.values()]
    assert min(fs) >= 1 and max(fs) < 40
    assert any(v[3] > 0 for v in want.values())


def test_pair_overlap_python_replay(spark):
    """Replay the pair-overlap audit in python sets: for every mined
    pair, distinct-unigram intersection/union sizes and the permille
    Jaccard + low_signal flag must match exactly — and the fixture must
    exercise BOTH flag branches."""
    import pandas as pd

    from snackfs_spark.operators.sampling import PAIR_OVERLAP_FLAG_PERMILLE
    from snackfs_spark.registry import load_all

    reg = load_all()
    pairs = {
        (r["chosen_doc_id"], r["rejected_doc_id"])
        for r in reg["train_preference_pairs"].fn(spark, SF_ORACLE).collect()
    }
    rows = reg["train_pair_overlap"].fn(spark, SF_ORACLE).collect()
    assert {(r["chosen_doc_id"], r["rejected_doc_id"]) for r in rows} == pairs
    d = pd.read_parquet(f"{SF_ORACLE}/documents.parquet").set_index("doc_id")
    flags = set()
    for r in rows:
        a = {t for t in d.loc[r["chosen_doc_id"], "text"].split(" ") if t}
        b = {t for t in d.loc[r["rejected_doc_id"], "text"].split(" ") if t}
        ov, un = len(a & b), len(a | b)
        jac = 1000 * ov // un
        assert (r["overlap_tokens"], r["union_tokens"], r["jaccard_permille"]) == (
            ov, un, jac,
        )
        want_flag = 1 if jac >= PAIR_OVERLAP_FLAG_PERMILLE else 0
        assert r["low_signal"] == want_flag
        flags.add(want_flag)
    assert flags == {0, 1}, "fixture must exercise both flag branches"
