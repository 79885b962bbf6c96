"""Graph operators (operators/graph.py): PageRank and triangle count
over the vocab-bounded token bigram graph.

The registered 3-round PageRank and the triangle count are already
oracle-checked by test_correctness.py; here we pin (a) the generated
oracle at a DEEPER iteration count than the registered query (the
unroll generator and the Spark loop must agree at any depth, same
pattern as kmeans), and (b) structural invariants that catch semantic
drift an oracle rewrite could hide.
"""

from __future__ import annotations

import pytest

from snackfs_spark.operators.graph import (
    _pagerank_oracle,
    _token_graph,
    pagerank_tokens,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_deeper_iterations_match_generated_oracle(spark, duck, iters):
    sp = pagerank_tokens(spark, SF_ORACLE, iters=iters).toPandas()
    orc = duck.execute(_pagerank_oracle(iters)).df()
    assert compare(sp, orc) == []


def test_pagerank_mass_conserved(spark):
    """With dangling redistribution the rank vector stays a probability
    distribution: total mass = 1 up to lattice rounding (the output is
    top-50 but the fixture vocabulary is smaller, so the rows ARE the
    whole vector)."""
    rows = pagerank_tokens(spark, SF_ORACLE, iters=3).collect()
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    assert all(r["pagerank"] > 0 for r in rows)


def test_triangle_counts_match_bruteforce(spark):
    """Per-node triangle counts equal an independent driver-side brute
    force over the (tiny) undirected edge set."""
    from itertools import combinations

    from snackfs_spark.registry import load_all

    _, edges, _ = _token_graph(spark, SF_ORACLE)
    und = {
        tuple(sorted((r["w1"], r["w2"]))) for r in edges.collect()
    }
    nodes = sorted({t for e in und for t in e})
    counts: dict[str, int] = {}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in und and (y, z) in und and (x, z) in und:
            for t in (x, y, z):
                counts[t] = counts.get(t, 0) + 1
    got = {
        (r["token"], r["n_triangles"])
        for r in load_all()["graph_triangle_count"].fn(spark, SF_ORACLE).collect()
    }
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == set(top)
    assert got, "fixture graph produced no triangles"


def test_ewma_matches_sequential_recurrence(spark):
    """The join-based fixed-point EWMA must equal the textbook
    sequential form sum_{k<=K-1} x_{t-k} / 2^(k+1), computed
    driver-side from the same hourly series."""
    from snackfs_spark.operators.windows import EWMA_K
    from snackfs_spark.registry import load_all

    got = (
        load_all()["events_ewma_hourly"].fn(spark, SF_ORACLE).toPandas()
    )
    one = got[got.event_type == sorted(got.event_type.unique())[0]].sort_values(
        "hour_start"
    )
    xs = list(one.hourly_cents)
    for t, row in enumerate(one.itertuples()):
        want = sum(
            xs[t - k] / (1 << (k + 1)) for k in range(min(t + 1, EWMA_K))
        ) / 100
        assert abs(row.ewma - want) < 1e-9, (t, row.ewma, want)
        assert row.n_terms == min(t + 1, EWMA_K)
