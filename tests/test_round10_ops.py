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


def _chi2_frame(spark, cases):
    """(n11, n10, n01, n00) quadruples -> contingency frame with the
    derived margins, ready for with_chi2_micro."""
    rows = [
        (n11, n10, n01, n00, n11 + n10, n11 + n10 + n01 + n00, n11 + n01)
        for n11, n10, n01, n00 in cases
    ]
    return rows, spark.createDataFrame(
        rows,
        "n11 long, n10 long, n01 long, n00 long, n_c long, n_docs long, df_all long",
    )


def _chi2_python(rows):
    want = []
    for n11, n10, n01, n00, n_c, n_docs, df_all in rows:
        num = 1_000_000 * n_docs * (n11 * n00 - n10 * n01) ** 2
        den = n_c * (n_docs - n_c) * df_all * (n_docs - df_all)
        want.append(num // den)
    return want


def test_chi2_staged_divmod_holds_past_old_ceiling():
    """r10 VERDICT #2 (the ladder rung, delivered): the synthetic
    contingency whose NAIVE numerator is >38 digits — a perfectly-
    separating token over a 5M-doc corpus, 1e6*5e6*(2.5e6*2.5e6)^2
    ~ 2e38, which used to pin an ANSI RAISE — must now COMPUTE on the
    staged-divmod lattice and match the python-bigint recount
    bit-for-bit. Plus messier shapes with nonzero remainders at every
    stage, up to corpus sizes ~1000x the old ceiling."""
    from snackfs_spark.operators.textstats import with_chi2_micro
    from snackfs_spark.session import get_spark

    spark = get_spark("test_round10_ops")
    m = 2_500_000
    cases = [
        (m, 0, 0, m),  # the old raise fixture: naive numerator ~2e38
        (m, 3, 1, m),  # same scale, nonzero remainders in every stage
        (123_456_789, 11_111, 222_222, 987_654_321),  # ~1.1e9 docs
        (900_000, 100_000, 200_000, 800_000),
        (1, 999_999, 999_999, 1),
    ]
    rows, df = _chi2_frame(spark, cases)
    want = _chi2_python(rows)
    assert any(
        1_000_000 * r[5] * (r[0] * r[3] - r[1] * r[2]) ** 2 >= 10**38
        for r in rows
    ), "fixture must cover the old overflow zone"
    got = [r["chi2_micro"] for r in with_chi2_micro(df).collect()]
    assert got == want
    # chi2 <= N sanity on the exact lattice
    for val, r in zip(got, rows):
        assert 0 <= val <= 1_000_000 * r[5]


def test_chi2_zero_association_is_zero():
    from snackfs_spark.operators.textstats import with_chi2_micro
    from snackfs_spark.session import get_spark

    spark = get_spark("test_round10_ops")
    rows, df = _chi2_frame(spark, [(500_000, 500_000, 500_000, 500_000)])
    assert [r["chi2_micro"] for r in with_chi2_micro(df).collect()] == [0]


def test_chi2_overflow_raises_loudly_at_new_ceiling():
    """The ladder still ends somewhere: past N ~ 5e9 docs at the
    adversarial worst case (both margins N/2, messy remainders), an
    intermediate leaves decimal(38,0) and ANSI must RAISE — never a
    silent null. (The next rung, per the constant block: per-class
    count sharding or base-2^62 long division.)"""
    from snackfs_spark.operators.textstats import with_chi2_micro
    from snackfs_spark.session import get_spark

    spark = get_spark("test_round10_ops")
    m = 4_000_000_000  # N = 8e9: A*B ~ (1.6e19)^2 ~ 2.6e38 > 1e38 - 1
    rows, df = _chi2_frame(spark, [(m, 3, 1, m)])
    with pytest.raises(Exception) as exc:
        with_chi2_micro(df).collect()
    assert "NUMERIC_VALUE_OUT_OF_RANGE" in str(exc.value), exc.value


def test_chi2_oracle_staged_divmod_matches_python():
    """The DuckDB oracle's staged HUGEINT form must agree with the
    python-bigint recount on the same old-overflow-zone contingencies
    (engine parity for the fixture that used to raise)."""
    import duckdb

    m = 2_500_000
    cases = [(m, 0, 0, m), (m, 3, 1, m), (123_456_789, 11_111, 222_222, 987_654_321)]
    rows = [
        (n11, n10, n01, n00, n11 + n10, n11 + n10 + n01 + n00, n11 + n01)
        for n11, n10, n01, n00 in cases
    ]
    want = _chi2_python(rows)
    con = duckdb.connect()
    got = []
    for n11, n10, n01, n00, n_c, n_docs, df_all in rows:
        (val,) = con.execute(
            f"""
            WITH base AS (
              SELECT CAST({n11} AS HUGEINT) * {n00}
                       - CAST({n10} AS HUGEINT) * {n01} AS d,
                     CAST({n_c} AS HUGEINT) * ({n_docs} - {n_c}) AS a,
                     CAST({df_all} AS HUGEINT) * ({n_docs} - {df_all}) AS b,
                     CAST(1000000 AS HUGEINT) * {n_docs}
                       * (CAST({n11} AS HUGEINT) * {n00}
                          - CAST({n10} AS HUGEINT) * {n01}) AS u1
            ),
            stage1 AS (
              SELECT a, b, a * b AS qq,
                     (u1 // a) * d AS t1, (u1 % a) * d AS t2
              FROM base
            )
            SELECT CAST((t1 // b) + (t2 // qq)
                        + (CASE WHEN (t1 % b) * a + (t2 % qq) >= qq
                                THEN 1 ELSE 0 END) AS BIGINT)
            FROM stage1
            """
        ).fetchone()
        got.append(val)
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
        # eff_num is exported as a STRING: the wide numerator lives in
        # DECIMAL(38,0)/HUGEINT and pandas would coerce it to float64
        want[src] = (avail, target, f, rem, str(num), den, num // den,
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


def test_epoch_schedule_capped_branch_wide_lattice(spark, tmp_path):
    """r10 ADVICE (medium): in the capped branch, any source with
    avail > ~4.19M chars made the old BIGINT numerator overflow
    (avail * (2^41 - 2) > 2^63 - 1) — a realistic corpus shape (one
    10 MB source among much larger ones) that the sf fixtures never
    reach. The numerator now lives in DECIMAL(38,0)/HUGEINT, so a
    synthetic corpus pinned in that exact zone must COMPUTE, with
    engine == oracle == python-bigint replay — not raise, not wrap."""
    import duckdb
    import pandas as pd

    from snackfs_spark.operators.sampling import EPOCH_CAP, EPOCH_TARGET_MULT
    from tests.oracle_harness import compare

    # "deep" lands in the capped branch with avail = 1e7 > 4.19e6 (the
    # old overflow zone: 1e7 * (2^41 - 2) ~ 2.2e19 > bigint max);
    # "big" dominates the mean so deep's target/avail ratio >> cap;
    # "mid" exercises a large-F uncapped branch with a remainder.
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["deep", "big", "mid", "mid"],
            "n_chars": [10_000_000, 10**13, 5 * 10**11, 5 * 10**11],
        }
    )
    fixture = tmp_path / "corpus"
    fixture.mkdir()
    docs.to_parquet(fixture / "documents.parquet")

    q = load_all()["corpus_epoch_schedule"]
    sdf = q.fn(spark, str(fixture)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fixture}/documents.parquet')"
    )
    odf = con.execute(q.oracle).fetchdf()
    assert compare(sdf, odf) == []

    # python-bigint ground truth, and pins that the fixture really
    # exercises the capped branch PAST the old bigint ceiling
    g = docs.groupby("source")["n_chars"].sum()
    target = EPOCH_TARGET_MULT * int(g.sum()) // len(g)
    got = {r["source"]: r for _, r in sdf.iterrows()}
    deep_num = 10_000_000 * (2 ** (EPOCH_CAP + 1) - 2)
    assert deep_num > 2**63 - 1  # the zone the old lattice could not hold
    assert int(got["deep"]["full_epochs"]) == EPOCH_CAP
    assert got["deep"]["eff_num"] == str(deep_num)
    assert int(got["deep"]["effective_chars"]) == deep_num // 2**EPOCH_CAP
    for src, avail in g.items():
        avail = int(avail)
        f = min(target // avail, EPOCH_CAP)
        rem = 0 if target // avail > EPOCH_CAP else target % avail
        num = avail * (2 ** (f + 1) - 2) + rem
        assert got[src]["eff_num"] == str(num), src
        assert int(got[src]["effective_chars"]) == num // 2**f, src
        assert (
            int(got[src]["value_retained_ppm"])
            == 1_000_000 * (num // 2**f) // target
        ), src


def test_epoch_schedule_degenerate_source_raises(spark, tmp_path):
    """r10 ADVICE: DuckDB's bare `//` returns NULL on divide-by-zero
    while Spark ANSI raises — the oracle now carries an explicit
    error() guard so BOTH engines fail loudly on an avail=0 source."""
    import duckdb
    import pandas as pd

    from tests.oracle_harness import compare  # noqa: F401

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "source": ["empty", "real"],
            "n_chars": [0, 1000],
        }
    )
    fixture = tmp_path / "corpus0"
    fixture.mkdir()
    docs.to_parquet(fixture / "documents.parquet")

    q = load_all()["corpus_epoch_schedule"]
    with pytest.raises(Exception, match="(?i)divide|division|by zero"):
        q.fn(spark, str(fixture)).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fixture}/documents.parquet')"
    )
    with pytest.raises(Exception, match="degenerate source"):
        con.execute(q.oracle).fetchall()


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
