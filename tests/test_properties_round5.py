"""Property-based checks (hypothesis) for the round-5-continuation
algorithms whose edge cases live in gap/boundary structure rather than
in any fixture: the islands+prefix-sum sliding distinct (the review
caught a dropped-day bug exactly here) and the bloom prune's
no-false-negative guarantee."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st


def test_sliding_distinct_property(spark):
    """For ARBITRARY (user, day) event sets, the islands+prefix-sum
    counts equal the brute-force trailing-window recount on every
    observed day."""
    from snackfs_spark.operators.windows import sliding_distinct_counts

    base = datetime.date(2024, 1, 1)

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 20)),  # (user, day offset)
            min_size=1,
            max_size=40,
        ),
        st.integers(2, 9),  # window length
    )
    def check(pairs, w):
        rows = sorted(
            {("e", base + datetime.timedelta(days=d), u) for u, d in pairs}
        )
        df = spark.createDataFrame(
            rows, "event_type string, day date, user_id bigint"
        )
        got = {
            r["day"]: r["n_users"]
            for r in sliding_distinct_counts(df, w).collect()
        }
        days = sorted({d for _, d, _ in rows})
        want = {}
        for e in days:
            lo = e - datetime.timedelta(days=w - 1)
            want[e.isoformat()] = len({u for _, d, u in rows if lo <= d <= e})
        assert got == want, (rows, w, got, want)

    check()


def test_bloom_never_drops_a_member_property(spark):
    """For ARBITRARY key sets, every inserted key passes the bloom
    probe (false negatives would corrupt the exact join result)."""
    from snackfs_spark.operators.runtime_filter import (
        bloom_bitmap,
        bloom_filter_candidates,
    )

    @settings(max_examples=8, deadline=None)
    @given(st.sets(st.integers(-(2**62), 2**62), min_size=1, max_size=60))
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k bigint")
        bloom = bloom_bitmap(df, "k")
        kept = {r["k"] for r in bloom_filter_candidates(df, "k", bloom).collect()}
        assert kept == keys

    check()
