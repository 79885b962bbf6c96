"""Similarity search over the embeddings table (SURVEY.md §2.C):
brute-force cosine top-k as the correctness baseline, and a sign-bit LSH
bucketed variant as the scale path (candidates from colliding buckets
only). Patterns per the distributed top-k / LSH-join papers in PAPERS.md.

Dot products are left-fold double arithmetic (see operators/dedup.py) so
the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snackfs_spark.functions import md5_fp
from snackfs_spark.operators.dedup import DOT_SPARK, _DOT_SQL_DUCK, _NORM_SQL_DUCK
from snackfs_spark.registry import register
from snackfs_spark.sources.tables import load_table

N_QUERIES = 5   # vec_id < 5 are the query vectors
TOP_K = 10
# Sign bits of these dimensions form the LSH bucket key (1-based dims).
LSH_DIMS = (1, 9, 17, 25, 33, 41, 49, 57)

_COSINE_DUCK = (
    f"{_DOT_SQL_DUCK} / ({_NORM_SQL_DUCK.format(v='a')} * {_NORM_SQL_DUCK.format(v='b')})"
)


def _with_norm(df):
    """Precompute each vector's norm once — the corpus-side norm is a
    per-row scan computation, not a per-pair one. The cosine then costs
    one fold per pair instead of three; the value is bit-identical
    (same left-fold double sqrt, same division order)."""
    return df.withColumn(
        "nrm",
        F.sqrt(F.expr(DOT_SPARK.format(a="embedding", b="embedding"))),
    )


def _cosine_spark() -> F.Column:
    dot = F.expr(DOT_SPARK.format(a="a.embedding", b="b.embedding"))
    return dot / (F.col("a.nrm") * F.col("b.nrm"))


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    SELECT query_id, vec_id, cosine FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             {_COSINE_DUCK} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_COSINE_DUCK} DESC, b.vec_id) AS rn
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline. The tiny query set
    broadcasts against the full corpus scan, then per-query top-k via a
    ranking window — one corpus pass regardless of k. At 100 TB the same
    plan holds: broadcast queries, scan corpus once, partial top-k per
    partition (WindowGroupLimit) before the final merge."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    queries = F.broadcast(emb.filter(F.col("vec_id") < N_QUERIES).alias("a"))
    corpus = emb.alias("b")
    scored = (
        queries.join(corpus, F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            _cosine_spark().alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "cosine")
    )


_BUCKET_DUCK = " || ".join(
    f"(CASE WHEN {{v}}.embedding[{d}] >= 0 THEN '1' ELSE '0' END)" for d in LSH_DIMS
)


def _bucket_spark(col: str) -> F.Column:
    return F.concat(
        *[
            F.when(F.element_at(F.col(col), d) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for d in LSH_DIMS
        ]
    )


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    SELECT query_id, vec_id, cosine FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             {_COSINE_DUCK} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_COSINE_DUCK} DESC, b.vec_id) AS rn
      FROM embeddings a JOIN embeddings b
        ON b.vec_id <> a.vec_id
       AND {_BUCKET_DUCK.format(v='a')} = {_BUCKET_DUCK.format(v='b')}
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: sign-bit random-hyperplane buckets (8 bits →
    256 buckets); candidates come from an equi-join on the bucket key, so
    the scored set is ~1/256 of the corpus per query. This is the scale
    path — the bucket key is a shuffle-friendly equi-join key, and recall
    trades off against bits/probes, not correctness of the plumbing."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    with_bucket = emb.withColumn("bucket", _bucket_spark("embedding"))
    queries = F.broadcast(with_bucket.filter(F.col("vec_id") < N_QUERIES).alias("a"))
    corpus = with_bucket.alias("b")
    scored = (
        queries.join(
            corpus,
            (F.col("b.vec_id") != F.col("a.vec_id"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            _cosine_spark().alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "cosine")
    )


@register(
    "embedding_label_centroids",
    oracle="""
    SELECT label, n_vectors, dim, centroid_component FROM (
      SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label
    ) JOIN (
      SELECT label AS l2, i AS dim,
             CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,8))) AS DOUBLE)
               AS centroid_component
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
      GROUP BY label, i
    ) ON label = l2 AND dim <= 4
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: per-label component sums (the centroid
    numerator) for the first 4 dims. Posexplode + groupBy — the same
    shape computes full centroids for an IVF coarse quantizer at scale.
    Decimal accumulation keeps the component sums deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    comps = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .filter(F.col("pos") < 4)
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        # float → double first: Spark's float→decimal cast rounds via the
        # float's 7-digit string repr, DuckDB via the exact binary value;
        # the double hop makes both engines round identically.
        .agg(
            F.sum(F.col("x").cast("double").cast("decimal(20,8)"))
            .cast("double")
            .alias("centroid_component")
        )
    )
    return comps.join(F.broadcast(counts), "label").select(
        "label", "n_vectors", "dim", "centroid_component"
    )


_IVF_CENT_DUCK = """cent AS (
      SELECT label, i AS pos,
             CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12)))
                  AS DOUBLE) / COUNT(*) AS c
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
      GROUP BY label, i
    ),
    cents AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY label
    )"""

_DOT64 = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)


@register(
    "ann_ivf_probe",
    oracle=f"""
    WITH {_IVF_CENT_DUCK},
    q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    assign AS (
      SELECT query_id, qv, label, c_cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c_cos DESC, label) AS rn
      FROM (
        SELECT q.query_id, q.qv, c.label,
               {_DOT64.format(a='q.qv', b='c.centroid')}
                 / (sqrt({_DOT64.format(a='q.qv', b='q.qv')})
                    * sqrt({_DOT64.format(a='c.centroid', b='c.centroid')})) AS c_cos
        FROM q, cents c
      )
    ),
    probe AS (SELECT query_id, qv, label AS probe_label FROM assign WHERE rn = 1)
    SELECT query_id, vec_id, probe_label, cosine FROM (
      SELECT p.query_id, e.vec_id, p.probe_label,
             {_DOT64.format(a='p.qv', b='ev')}
               / (sqrt({_DOT64.format(a='p.qv', b='p.qv')})
                  * sqrt({_DOT64.format(a='ev', b='ev')})) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
                                ORDER BY {_DOT64.format(a='p.qv', b='ev')}
                                  / (sqrt({_DOT64.format(a='p.qv', b='p.qv')})
                                     * sqrt({_DOT64.format(a='ev', b='ev')})) DESC,
                                e.vec_id) AS rn
      FROM probe p
      JOIN (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
            FROM embeddings) e
        ON e.label = p.probe_label
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label mean vectors (the
    centroids embedding_label_centroids builds components of); each query
    probes ONLY its nearest centroid's partition, then exact cosine top-k
    within it. At 100 TB: centroids broadcast, corpus pre-partitioned by
    list id — the probe is a partition-pruned scan, not a full pass.
    Centroid means use decimal accumulation (order-independent), so the
    whole probe chain is deterministic and hash-checked by the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # centroids: elementwise mean per label via posexplode + re-assemble;
    # decimal sum → double ÷ count matches the oracle bit-for-bit at any
    # partitioning (double summation order would not).
    cents = (
        emb.select("label", F.posexplode(dbl).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)))
            .alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), dbl.alias("qv")
    )
    dot_qc = "aggregate(zip_with(qv, centroid, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    nq = "sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    nc = "sqrt(aggregate(zip_with(centroid, centroid, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    assign_w = Window.partitionBy("query_id").orderBy(
        F.desc("c_cos"), F.col("label")
    )
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", F.expr(f"{dot_qc} / ({nq} * {nc})"))
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("query_id", "qv", F.col("label").alias("probe_label"))
    )
    corpus = emb.select("vec_id", "label", dbl.alias("cv"))
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    ncv = "sqrt(aggregate(zip_with(cv, cv, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    scored = (
        F.broadcast(assigned)
        .join(corpus, assigned["probe_label"] == corpus["label"])
        .withColumn("cosine", F.expr(f"{dot} / ({nq} * {ncv})"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "probe_label", "cosine")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             greatest(list_reduce(list_transform(range(1, 65),
                        i -> abs(CAST(embedding[i] AS DOUBLE))),
                        (a, b) -> greatest(a, b)), 1e-30) / 127 AS scale
      FROM embeddings
    )
    SELECT e.vec_id,
           q.scale,
           CAST(list_reduce(list_transform(range(1, 65),
                  i -> floor(CAST(e.embedding[i] AS DOUBLE) / q.scale + 0.5)),
                  (a, b) -> a + b) AS BIGINT) AS sum_q,
           CAST(list_reduce(list_transform(range(1, 65),
                  i -> floor(CAST(e.embedding[i] AS DOUBLE) / q.scale + 0.5)),
                  (a, b) -> greatest(a, b)) AS BIGINT) AS max_q
    FROM embeddings e JOIN q ON q.vec_id = e.vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding quantization plumbing (the 4x storage shrink every
    embedding column gets before 100 TB): per-vector max-abs scale,
    elements mapped to [-127, 127] by round-half-up. Pure per-row
    higher-order-function projection — no shuffle, JVM-side; the oracle
    checks the checksum and max of the quantized codes (array outputs
    don't hash portably). floor(x/scale + 0.5) is used instead of
    round() because the engines' round() tie-breaking differs."""
    emb = load_table(spark, sf_dir, "embeddings")
    e64 = "CAST(embedding AS ARRAY<DOUBLE>)"
    scale = F.expr(
        f"greatest(aggregate(transform({e64}, x -> abs(x)), 0D, "
        "(a, x) -> greatest(a, x)), 1e-30D) / 127"
    )
    out = emb.withColumn("scale", scale)
    q = f"transform({e64}, x -> floor(x / scale + 0.5D))"
    return out.select(
        "vec_id",
        "scale",
        F.expr(f"CAST(aggregate({q}, 0D, (a, x) -> a + x) AS BIGINT)").alias("sum_q"),
        F.expr(
            f"CAST(aggregate({q}, -1000D, (a, x) -> greatest(a, x)) AS BIGINT)"
        ).alias("max_q"),
    )


N_PROBE = 2  # lists probed per query in the multi-probe IVF variant


@register(
    "ann_ivf_multiprobe",
    oracle=f"""
    WITH {_IVF_CENT_DUCK},
    q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    assign AS (
      SELECT query_id, qv, label,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c_cos DESC, label) AS rn
      FROM (
        SELECT q.query_id, q.qv, c.label,
               {_DOT64.format(a='q.qv', b='c.centroid')}
                 / (sqrt({_DOT64.format(a='q.qv', b='q.qv')})
                    * sqrt({_DOT64.format(a='c.centroid', b='c.centroid')})) AS c_cos
        FROM q, cents c
      )
    ),
    probe AS (SELECT query_id, qv, label AS probe_label
              FROM assign WHERE rn <= {N_PROBE})
    SELECT query_id, vec_id, probe_label, cosine FROM (
      SELECT p.query_id, e.vec_id, p.probe_label,
             {_DOT64.format(a='p.qv', b='ev')}
               / (sqrt({_DOT64.format(a='p.qv', b='p.qv')})
                  * sqrt({_DOT64.format(a='ev', b='ev')})) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
                                ORDER BY {_DOT64.format(a='p.qv', b='ev')}
                                  / (sqrt({_DOT64.format(a='p.qv', b='p.qv')})
                                     * sqrt({_DOT64.format(a='ev', b='ev')})) DESC,
                                e.vec_id) AS rn
      FROM probe p
      JOIN (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
            FROM embeddings) e
        ON e.label = p.probe_label
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF: each query scans its N_PROBE nearest centroid
    lists instead of one — the standard recall knob (a query near a list
    boundary misses true neighbors under single-probe; probing the
    runner-up list recovers most of them at 2x the scanned fraction,
    still a partition-pruned scan, never a full pass). Corpus lists are
    disjoint (a vector lives in exactly one list), so the probed union
    has no duplicates and top-k runs once across it. Same deterministic
    decimal-mean centroid chain as ann_ivf_probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cents = (
        emb.select("label", F.posexplode(dbl).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)))
            .alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), dbl.alias("qv")
    )
    dot_qc = "aggregate(zip_with(qv, centroid, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    nq = "sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    nc = "sqrt(aggregate(zip_with(centroid, centroid, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    assign_w = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.col("label"))
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", F.expr(f"{dot_qc} / ({nq} * {nc})"))
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "qv", F.col("label").alias("probe_label"))
    )
    corpus = emb.select("vec_id", "label", dbl.alias("cv"))
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    ncv = "sqrt(aggregate(zip_with(cv, cv, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    scored = (
        F.broadcast(assigned)
        .join(corpus, assigned["probe_label"] == corpus["label"])
        .withColumn("cosine", F.expr(f"{dot} / ({nq} * {ncv})"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "probe_label", "cosine")
    )


def _recall_oracle() -> str:
    bf = f"""
      SELECT query_id, vec_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COSINE_DUCK} DESC, b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    """
    lsh = f"""
      SELECT query_id, vec_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COSINE_DUCK} DESC, b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b
          ON b.vec_id <> a.vec_id
         AND {_BUCKET_DUCK.format(v='a')} = {_BUCKET_DUCK.format(v='b')}
        WHERE a.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    """
    return f"""
    WITH bf AS ({bf}), lsh AS ({lsh})
    SELECT bf.query_id,
           CAST(COUNT(*) AS BIGINT) AS true_k,
           CAST(COUNT(lsh.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(lsh.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_k
    FROM bf LEFT JOIN lsh
      ON lsh.query_id = bf.query_id AND lsh.vec_id = bf.vec_id
    GROUP BY bf.query_id ORDER BY bf.query_id
    """


@register("ann_lsh_recall", oracle=_recall_oracle())
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact brute-force
    baseline — the evaluation loop every approximate index needs before
    its bits/probes knobs are trusted at scale. Composes the two
    existing pipelines and left-joins exact results to approximate ones;
    at 100 TB the baseline runs on a sampled query set (here the query
    set is already small) while the index side stays the production
    plan, so the measurement never costs an all-pairs pass."""
    bf = ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("bf_vec")
    )
    ap = ann_lsh_bucketed(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("lsh_vec"), F.lit(1).alias("hit")
    )
    return (
        bf.join(
            ap,
            (bf["query_id"] == ap["query_id"]) & (bf["bf_vec"] == ap["lsh_vec"]),
            "left",
        )
        .drop(ap["query_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("true_k"),
            F.count("hit").alias("hits"),
            (F.count("hit").cast("double") / F.count(F.lit(1))).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


NEG_K = 4                  # negatives drawn per anchor


@register(
    "emb_negative_sampling",
    # draw = md5 of "vec_id#j", first 15 hex digits (60 bits, exact in
    # int64 — no product to overflow at ANY corpus size), mod n: the
    # same cross-engine hash contract as the split bucketing.
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
    draws AS (
      SELECT e.vec_id, e.label, j,
             ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || '#'
                                 || CAST(j AS VARCHAR)), 1, 15))::BIGINT
               % n.n AS neg_id
      FROM embeddings e
      CROSS JOIN n
      CROSS JOIN (SELECT unnest(range(0, {NEG_K})) AS j)
    )
    SELECT d.vec_id,
           CAST(d.j AS BIGINT) AS draw,
           d.neg_id,
           c.label AS neg_label,
           CASE WHEN c.label <> d.label THEN 1 ELSE 0 END AS is_valid
    FROM draws d
    JOIN embeddings c ON c.vec_id = d.neg_id
    """,
)
def emb_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor draws NEG_K pseudo-random candidate ids — md5("vec_id#j")
    truncated to 60 bits mod corpus size, the engine's standard
    cross-engine hash (exact in int64 at ANY id range; a multiplicative
    ring like vec_id*2654435761 would silently wrap past ~3.5e9 ids) —
    resolved by an EQUI-JOIN back to the embeddings table (never a
    random shuffle: the draw is a pure function of (vec_id, j,
    corpus_size), so it is reproducible run-to-run and recomputable
    per-anchor — the same properties the hash-mod split guarantees).
    Same-label collisions are FLAGGED, not
    silently re-drawn (re-draw loops are nondeterministic under
    retries; training pipelines drop flagged rows). One tiny count
    parameterizes the plan; the join shuffles on neg_id — at 100 TB
    this is one hash join of two id-keyed relations, the minimal
    possible plan for any negative-pairing strategy."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.agg(F.count(F.lit(1)).alias("n"))
    draws = (
        emb.select("vec_id", "label")
        .crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            "label",
            F.explode(F.array(*[F.lit(j) for j in range(NEG_K)])).alias("j"),
            "n",
        )
        .withColumn(
            "neg_id",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("vec_id").cast("string"),
                                F.lit("#"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n"),
            ),
        )
    )
    cand = emb.select(
        F.col("vec_id").alias("c_id"), F.col("label").alias("neg_label")
    )
    return draws.join(cand, draws["neg_id"] == cand["c_id"]).select(
        "vec_id",
        F.col("j").cast("long").alias("draw"),
        "neg_id",
        "neg_label",
        F.when(F.col("neg_label") != F.col("label"), 1).otherwise(0).alias("is_valid"),
    )


# ---- Product quantization (PQ) + asymmetric distance (ADC) ----------
#
# The memory-scale path for ANN at 100 TB: vectors compress 64 floats
# (256 B) -> 8 codes (8 B) against a 16-centroid codebook per 8-dim
# subspace; queries score candidates via a 128-entry lookup table
# instead of touching raw vectors (Jegou et al., "Product Quantization
# for Nearest Neighbor Search", PAPERS.md). Codebook here is
# hash-chosen (the 16 corpus vectors with smallest md5 fingerprint) so
# BOTH engines derive the identical codebook declaratively — a k-means
# refinement would reuse emb_kmeans_assign's broadcast-rounds pattern
# without changing any plan shape below.
PQ_SUB = 8          # subspaces
PQ_SUBDIM = 8       # dims per subspace (PQ_SUB * PQ_SUBDIM = 64)
PQ_K = 16           # centroids per subspace
PQ_QUERIES = 5      # vec_id < 5 are the query vectors (as ann_*)

# Squared-L2 of every (subspace s, centroid c) pair, j = s*16+c flat:
# left-fold double arithmetic in index order, bit-identical twins.
_PQ_DISTS_SPARK = (
    "transform(sequence(0, 127), j -> aggregate("
    "zip_with("
    "slice(CAST(embedding AS ARRAY<DOUBLE>), CAST((j div 16) * 8 + 1 AS INT), 8), "
    "element_at(cb, j + 1), "
    "(x, y) -> (x - y) * (x - y)), "
    "0D, (acc, v) -> acc + v))"
)
_PQ_DISTS_DUCK = (
    "list_transform(range(0, 128), j -> list_reduce("
    "list_transform(range(1, 9), i -> "
    "(CAST(embedding[(j // 16) * 8 + i] AS DOUBLE) - cb[j + 1][i])"
    " * (CAST(embedding[(j // 16) * 8 + i] AS DOUBLE) - cb[j + 1][i])), "
    "(x, y) -> x + y))"
)
# Per-subspace argmin over the 16-slice of dists (ties -> smallest c).
_PQ_CODES_SPARK = (
    "transform(sequence(0, 7), s -> array_position("
    "slice(dists, s * 16 + 1, 16), array_min(slice(dists, s * 16 + 1, 16))) - 1)"
)
_PQ_CODES_DUCK = (
    "list_transform(range(0, 8), s -> list_position("
    "list_slice(dists, s * 16 + 1, s * 16 + 16), "
    "list_min(list_slice(dists, s * 16 + 1, s * 16 + 16))) - 1)"
)
# ADC estimate: sum the query's LUT entry for each stored code, s-order.
_PQ_ADC_SPARK = (
    "aggregate(zip_with(sequence(0, 7), codes, "
    "(s, c) -> element_at(lut, CAST(s * 16 + c + 1 AS INT))), "
    "0D, (acc, v) -> acc + v)"
)
_PQ_ADC_DUCK = (
    "list_reduce(list_transform(range(0, 8), "
    "s -> lut[s * 16 + codes[s + 1] + 1]), (x, y) -> x + y)"
)


@register(
    "ann_pq_adc",
    oracle=f"""
    WITH h AS (
      SELECT vec_id, embedding,
             ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS hh
      FROM embeddings
    ),
    seeds AS (
      SELECT embedding,
             ROW_NUMBER() OVER (ORDER BY hh, vec_id) - 1 AS cidx
      FROM h ORDER BY hh, vec_id LIMIT {PQ_K}
    ),
    subs AS (
      SELECT sd.cidx, g.sp,
             list_transform(range(g.sp * 8 + 1, g.sp * 8 + 9),
                            i -> CAST(sd.embedding[i] AS DOUBLE)) AS cvec
      FROM seeds sd CROSS JOIN (SELECT unnest(range(0, 8)) AS sp) g
    ),
    cbrow AS (SELECT list(cvec ORDER BY sp * 16 + cidx) AS cb FROM subs),
    cdist AS (
      SELECT e.vec_id, {_PQ_DISTS_DUCK} AS dists FROM embeddings e, cbrow
    ),
    codes AS (SELECT vec_id, {_PQ_CODES_DUCK} AS codes FROM cdist),
    qlut AS (
      SELECT e.vec_id AS query_id, {_PQ_DISTS_DUCK} AS lut
      FROM embeddings e, cbrow WHERE e.vec_id < {PQ_QUERIES}
    ),
    cand AS (
      SELECT q.query_id, c.vec_id, {_PQ_ADC_DUCK} AS adc
      FROM codes c, qlut q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, adc, rank FROM (
      SELECT query_id, vec_id, adc,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc, vec_id) AS BIGINT) AS rank
      FROM cand
    ) WHERE rank <= {TOP_K}
    """,
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-k: encode the corpus to 8 subspace codes
    against a hash-derived codebook, then answer each query from its
    128-entry ADC lookup table — the classic memory-bound ANN layout
    (8 B/vector resident instead of 256 B).

    Scale: the codebook is a 16-row TakeOrdered + a 128-row broadcast;
    ENCODING is one corpus scan with zero shuffle (single-row bitmap
    crossJoin, all argmins inside codegen HOFs); SCORING is one pass
    over the 8-byte codes with the 5-query LUT broadcast, then per-query
    top-k via WindowGroupLimit. No corpus-sized shuffle anywhere — at
    100 TB the codes relation is the only thing rescanned per query
    batch, 32x smaller than the raw vectors. The oracle recomputes the
    whole pipeline declaratively in DuckDB — codebook choice, encoding
    argmins, LUT, ADC sums are bit-identical left-fold doubles."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.select(
            "vec_id",
            "embedding",
            md5_fp(F.col("vec_id").cast("string")).alias("hh"),
        )
        .orderBy("hh", "vec_id")
        .limit(PQ_K)
    )
    wseed = Window.orderBy("hh", "vec_id")
    seeds = seeds.withColumn("cidx", F.row_number().over(wseed) - 1)
    subs = seeds.crossJoin(
        spark.range(PQ_SUB).select(F.col("id").cast("int").alias("sp"))
    ).select(
        "cidx",
        "sp",
        F.expr(
            "slice(CAST(embedding AS ARRAY<DOUBLE>), CAST(sp * 8 + 1 AS INT), 8)"
        ).alias("cvec"),
    )
    cbrow = (
        subs.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (F.col("sp") * 16 + F.col("cidx")).alias("j"),
                        F.col("cvec").alias("v"),
                    )
                )
            ).alias("arr")
        )
        .select(F.expr("transform(arr, e -> e.v)").alias("cb"))
        # 1 row; feeds the encode pass AND the query LUT — without the
        # checkpoint each consumer re-ran the seed TakeOrdered scan +
        # window (r11 opt: embeddings scans 4 -> 3, the third is the
        # pushdown-pruned 5-query read)
        .localCheckpoint(eager=False)
    )
    codes = (
        emb.crossJoin(F.broadcast(cbrow))
        .withColumn("dists", F.expr(_PQ_DISTS_SPARK))
        .select("vec_id", F.expr(_PQ_CODES_SPARK).alias("codes"))
    )
    qlut = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .crossJoin(F.broadcast(cbrow))
        .select(
            F.col("vec_id").alias("query_id"),
            F.expr(_PQ_DISTS_SPARK).alias("lut"),
        )
    )
    cand = (
        codes.crossJoin(F.broadcast(qlut))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.expr(_PQ_ADC_SPARK).alias("adc"))
    )
    wq = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "adc", "rank")
    )


# ------------------------------------- Johnson-Lindenstrauss projection ----
#
# Random-projection dimensionality reduction (Achlioptas 2003 sign
# matrix): R^64 -> R^16 via z_j = sum_d s[j][d] * v[d] with s in
# {+1,-1} derived ONCE from md5("rp-j-d") parity at module load — a
# compile-time constant matrix embedded identically in the Spark plan
# and the oracle SQL (the BENFORD-constants pattern), so the per-row
# cost is 16 fused multiply-add folds in codegen, zero hashing.
# The operator scores the projection the way a pipeline decides whether
# the 4x-compressed index is usable: projected-space top-k vs the exact
# brute-force top-k, per-query overlap — the JL lemma made measurable.
# Dot products are the engine-portable left folds of operators/dedup.py.
RP_OUT_DIMS = 16
RP_IN_DIMS = 64


def _rp_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"rp-{j}-{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for d in range(1, RP_IN_DIMS + 1)
        ]
        for j in range(RP_OUT_DIMS)
    ]


RP_SIGNS = _rp_signs()

# z_j as a left fold in element order — bit-identical across engines.
_RP_Z_SPARK = ", ".join(
    "aggregate(zip_with(CAST({v} AS ARRAY<DOUBLE>), "
    f"array({', '.join(f'{s}D' for s in row)}), "
    "(x, y) -> x * y), 0D, (acc, e) -> acc + e)"
    for row in RP_SIGNS
)
_RP_Z_DUCK = ", ".join(
    "list_reduce(list_transform(range(1, 65), i -> "
    f"CAST({{v}}.embedding[i] AS DOUBLE) * ([{', '.join(str(s) for s in row)}])[i]), "
    "(x, y) -> x + y)"
    for row in RP_SIGNS
)
_PDOT_DUCK = (
    f"list_reduce(list_transform(range(1, {RP_OUT_DIMS + 1}), i -> "
    "a.z[i] * b.z[i]), (x, y) -> x + y)"
)
_PNORM_DUCK = (
    f"sqrt(list_reduce(list_transform(range(1, {RP_OUT_DIMS + 1}), i -> "
    "{v}.z[i] * {v}.z[i]), (x, y) -> x + y))"
)
_PDOT_SPARK = (
    "aggregate(zip_with(a.z, b.z, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"
)
_PNORM_SPARK = (
    "sqrt(aggregate(zip_with({v}.z, {v}.z, (x, y) -> x * y), 0D, (acc, e) -> acc + e))"
)


@register(
    "emb_random_projection",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, [{_RP_Z_DUCK.format(v='embeddings')}] AS z
      FROM embeddings
    ),
    pk AS (
      SELECT query_id, vec_id, proj_cosine, rn AS proj_rank FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               {_PDOT_DUCK} / ({_PNORM_DUCK.format(v='a')} * {_PNORM_DUCK.format(v='b')})
                 AS proj_cosine,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_PDOT_DUCK} / ({_PNORM_DUCK.format(v='a')} * {_PNORM_DUCK.format(v='b')}) DESC,
                                           b.vec_id) AS rn
        FROM proj a JOIN proj b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    ),
    ek AS (
      SELECT query_id, vec_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COSINE_DUCK} DESC, b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    ),
    hits AS (
      SELECT pk.query_id, pk.proj_rank, pk.vec_id, pk.proj_cosine,
             CASE WHEN ek.vec_id IS NULL THEN 0 ELSE 1 END AS in_exact_topk
      FROM pk LEFT JOIN ek
        ON ek.query_id = pk.query_id AND ek.vec_id = pk.vec_id
    )
    SELECT query_id, proj_rank, vec_id, proj_cosine,
           CAST(in_exact_topk AS BIGINT) AS in_exact_topk,
           CAST((1000 * SUM(in_exact_topk) OVER (PARTITION BY query_id))
                // {TOP_K} AS BIGINT)
             AS recall_permille
    FROM hits
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign-projection (64 -> 16 dims) with its acceptance metric:
    per query, the projected-space cosine top-k, each neighbor flagged
    against the exact top-k, and recall@10 as permille — the report
    that decides whether the 4x-compressed representation can serve the
    ANN index.

    Scale: projection is ONE zero-shuffle codegen pass (16 constant-
    sign folds per row — the constants live in the plan, no per-row
    hashing); both top-k passes broadcast the tiny query set against a
    single corpus scan with per-partition WindowGroupLimit pruning, the
    same posture as ann_bruteforce_topk; the hit join runs on 50 rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id",
        F.expr(f"array({_RP_Z_SPARK.format(v='embedding')})").alias("z"),
    )
    qp = F.broadcast(proj.filter(F.col("vec_id") < N_QUERIES).alias("a"))
    pcos = F.expr(_PDOT_SPARK) / (
        F.expr(_PNORM_SPARK.format(v="a")) * F.expr(_PNORM_SPARK.format(v="b"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("proj_cosine").desc(), F.col("vec_id")
    )
    pk = (
        qp.join(proj.alias("b"), F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            pcos.alias("proj_cosine"),
        )
        .withColumn("proj_rank", F.row_number().over(wp))
        .filter(F.col("proj_rank") <= TOP_K)
    )
    embn = _with_norm(emb)
    qe = F.broadcast(embn.filter(F.col("vec_id") < N_QUERIES).alias("a"))
    we = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    ek = (
        qe.join(embn.alias("b"), F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            _cosine_spark().alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("evec_id"), F.lit(1).alias("hit"))
    )
    hits = pk.join(
        F.broadcast(ek),
        (pk.query_id == ek.query_id) & (pk.vec_id == ek.evec_id),
        "left",
    ).select(
        pk.query_id,
        "proj_rank",
        pk.vec_id,
        "proj_cosine",
        F.coalesce("hit", F.lit(0)).cast("long").alias("in_exact_topk"),
    )
    wq = Window.partitionBy("query_id")
    return hits.select(
        "query_id",
        "proj_rank",
        "vec_id",
        "proj_cosine",
        "in_exact_topk",
        (F.lit(1000) * F.sum("in_exact_topk").over(wq))
        .cast("long")
        .alias("_hits_x1000"),
    ).select(
        "query_id",
        "proj_rank",
        "vec_id",
        "proj_cosine",
        "in_exact_topk",
        # permille derived from TOP_K, not a hardcoded 100x — true
        # integer division (`div`), matching DuckDB's `//` at any
        # magnitude, not double-divide-then-truncate (r7 ADVICE)
        F.expr(f"_hits_x1000 div {TOP_K}").cast("long").alias("recall_permille"),
    )


# ------------------------------------------- MMR diversity re-rank ----
#
# Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
# diversity-aware re-ranking a RAG stack runs on its dense-retrieval
# pool: iteratively pick argmax of
#   MMR(d) = LAMBDA * cos(q, d) - (1 - LAMBDA) * max_{s in S} cos(d, s)
# with the max-over-empty-S convention 0 for the first pick. LAMBDA is
# the dyadic 1/2 so both scores are exact halvings of left-fold double
# cosines; ties break to the smallest vec_id. Query = vector 0; pool =
# its MMR_POOL nearest neighbors (TakeOrderedAndProject — per-partition
# heaps, no global sort); MMR_K rounds of bounded-relation argmax.
MMR_POOL = 30
MMR_K = 8
MMR_LAMBDA = "0.5"


def _mmr_oracle() -> str:
    cos_qb = f"{_DOT_SQL_DUCK} / ({_NORM_SQL_DUCK.format(v='a')} * {_NORM_SQL_DUCK.format(v='b')})"
    lam = MMR_LAMBDA
    parts = [
        f"""WITH pool AS MATERIALIZED (
      SELECT vec_id, embedding, rel FROM (
        SELECT b.vec_id, b.embedding, {cos_qb} AS rel,
               ROW_NUMBER() OVER (ORDER BY {cos_qb} DESC, b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id = 0
      ) WHERE rn <= {MMR_POOL}
    ),"""
    ]
    cos_ds = (
        "list_reduce(list_transform(range(1, 65), i -> "
        "CAST(d.embedding[i] AS DOUBLE) * CAST(s.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y) / "
        "(sqrt(list_reduce(list_transform(range(1, 65), i -> "
        "CAST(d.embedding[i] AS DOUBLE) * CAST(d.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y)) * "
        "sqrt(list_reduce(list_transform(range(1, 65), i -> "
        "CAST(s.embedding[i] AS DOUBLE) * CAST(s.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y)))"
    )
    parts.append(
        f"""r1 AS MATERIALIZED (
      SELECT 1 AS rank, vec_id, embedding, rel,
             CAST(0.0 AS DOUBLE) AS max_sim_selected,
             {lam} * rel AS mmr_score
      FROM pool
      QUALIFY ROW_NUMBER() OVER (ORDER BY {lam} * rel DESC, vec_id) = 1
    ),"""
    )
    for k in range(2, MMR_K + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT vec_id, embedding FROM r{i}" for i in range(1, k)
        )
        prev_ids = " UNION ALL ".join(
            f"SELECT vec_id FROM r{i}" for i in range(1, k)
        )
        parts.append(
            f"""m{k} AS MATERIALIZED (
      SELECT d.vec_id, d.embedding, d.rel,
             MAX({cos_ds}) AS max_sim_selected
      FROM pool d CROSS JOIN ({prev_union}) s
      WHERE d.vec_id NOT IN (SELECT vec_id FROM ({prev_ids}))
      GROUP BY d.vec_id, d.embedding, d.rel
    ),"""
        )
        parts.append(
            f"""r{k} AS MATERIALIZED (
      SELECT {k} AS rank, vec_id, embedding, rel, max_sim_selected,
             {lam} * rel - (1 - {lam}) * max_sim_selected AS mmr_score
      FROM m{k}
      QUALIFY ROW_NUMBER() OVER (
        ORDER BY {lam} * rel - (1 - {lam}) * max_sim_selected DESC,
                 vec_id) = 1
    ),"""
        )
    union = " UNION ALL ".join(
        f"SELECT rank, vec_id, rel, max_sim_selected, mmr_score FROM r{i}"
        for i in range(1, MMR_K + 1)
    )
    return (
        "\n    ".join(parts)
        + f"""
    sel AS ({union})
    SELECT CAST(rank AS BIGINT) AS rank, vec_id,
           rel AS relevance, max_sim_selected, mmr_score
    FROM sel
    """
    )


@register("retrieval_mmr_topk", oracle=_mmr_oracle())
def retrieval_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking: from query vector 0's MMR_POOL nearest
    neighbors, the MMR_K picks in selection order with relevance,
    similarity to the already-selected set, and the MMR score.

    Scale: the corpus pays ONE brute-force pass (broadcast 1-row query,
    TakeOrderedAndProject pool cut — per-partition heaps); the pool then
    folds to a SINGLE array row and the whole greedy selection runs as
    one higher-order-function expression (aggregate over the round
    sequence) — bounded algebra on <= MMR_POOL structs, ONE job instead
    of MMR_K checkpointed rounds. Each pick is array_min over structs
    whose leading field is -score: the exact min(struct(-score, vec_id))
    tie rule of the per-round form, and every float op (left-fold dot,
    dot/(na*nb), lam*rel - (1-lam)*max_sim) keeps its order, so the
    output is bit-identical to the round-form plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    embn = _with_norm(emb)
    q = F.broadcast(embn.filter(F.col("vec_id") == 0).alias("a"))
    pool = (
        q.join(embn.alias("b"), F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.embedding").alias("embedding"),
            F.col("b.nrm").alias("nrm"),
            _cosine_spark().alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(MMR_POOL)
    )
    lam, one_m_lam = float(MMR_LAMBDA), 1.0 - float(MMR_LAMBDA)
    dot = DOT_SPARK.format(a="c.embedding", b="s.embedding")
    # candidate scoring against a selected array `{sel}`: max_sim once
    # (inner transform), then ns/mmr from it — same ops, same order as
    # the per-round max() aggregate + projection.
    scored = (
        "transform("
        "  transform({rem}, c -> named_struct("
        "    'vec_id', c.vec_id, 'embedding', c.embedding, 'nrm', c.nrm,"
        "    'rel', c.rel,"
        f"    'max_sim_selected', array_max(transform({{sel}}, s -> {dot}"
        "       / (c.nrm * s.nrm)))))"
        "  , c -> named_struct("
        f"    'ns', -({lam}D * c.rel - {one_m_lam}D * c.max_sim_selected),"
        "    'vec_id', c.vec_id, 'embedding', c.embedding, 'nrm', c.nrm,"
        "    'rel', c.rel, 'max_sim_selected', c.max_sim_selected,"
        f"    'mmr_score', {lam}D * c.rel"
        f"                 - {one_m_lam}D * c.max_sim_selected))"
    )
    pick = f"array_min({scored})"
    first_pick = (
        "array_min(transform(ps, p -> named_struct("
        f"  'ns', -({lam}D * p.rel), 'vec_id', p.vec_id,"
        "  'embedding', p.embedding, 'nrm', p.nrm, 'rel', p.rel,"
        "  'max_sim_selected', CAST(0.0 AS DOUBLE),"
        f"  'mmr_score', {lam}D * p.rel)))"
    )
    loop = (
        f"aggregate(sequence(2, {MMR_K}),"
        " named_struct('sel', array(p1),"
        "              'rem', filter(ps, p -> p.vec_id != p1.vec_id)),"
        " (st, k) -> named_struct("
        f"   'sel', array_append(st.sel, {pick.format(sel='st.sel', rem='st.rem')}),"
        f"   'rem', filter(st.rem, c -> c.vec_id != {pick.format(sel='st.sel', rem='st.rem')}.vec_id)),"
        " st -> st.sel)"
    )
    return (
        pool.agg(
            F.array_sort(
                F.collect_list(F.struct("vec_id", "embedding", "nrm", "rel"))
            ).alias("ps")
        )
        .select("ps", F.expr(first_pick).alias("p1"))
        .select(F.posexplode(F.expr(loop)).alias("pos", "m"))
        .select(
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.col("m.vec_id").alias("vec_id"),
            F.col("m.rel").alias("relevance"),
            F.col("m.max_sim_selected").alias("max_sim_selected"),
            F.col("m.mmr_score").alias("mmr_score"),
        )
    )


# ------------------------------------------------- triplet mining ----
#
# Hard-triplet mining for contrastive embedding training (FaceNet,
# Schroff et al. 2015): per anchor, the HARDEST POSITIVE (same-label
# vector with the LOWEST cosine — the pair the model most confuses
# apart) and the HARDEST NEGATIVE (different-label vector with the
# HIGHEST cosine — the impostor), plus the margin-violation flag
# cos_neg + margin > cos_pos that selects the triplets worth training
# on. Margin is dyadic (1/8) and cosines are the shared left-fold
# doubles, so the flag compares bit-identical values in both engines.
TRIPLET_ANCHORS = 20
TRIPLET_MARGIN = "0.125"  # dyadic: exact in both engines


@register(
    "emb_triplet_mining",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS anchor_id, a.label AS label,
             b.vec_id AS cand_id,
             CASE WHEN b.label = a.label THEN 1 ELSE 0 END AS same,
             {_COSINE_DUCK} AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {TRIPLET_ANCHORS}
    ),
    pos AS (
      SELECT anchor_id, label, cand_id AS pos_id, cosine AS pos_cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY cosine, cand_id) AS rn
        FROM scored WHERE same = 1
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT anchor_id, cand_id AS neg_id, cosine AS neg_cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY cosine DESC, cand_id) AS rn
        FROM scored WHERE same = 0
      ) WHERE rn = 1
    )
    SELECT p.anchor_id, p.label, p.pos_id, p.pos_cosine,
           n.neg_id, n.neg_cosine,
           CAST(CASE WHEN n.neg_cosine + {TRIPLET_MARGIN} > p.pos_cosine
                THEN 1 ELSE 0 END AS BIGINT) AS violates_margin
    FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
    """,
)
def emb_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-triplet mining over the labeled embeddings: per anchor the
    hardest positive (lowest same-label cosine), the hardest negative
    (highest other-label cosine), and the margin-violation flag that
    admits the triplet into a contrastive training batch — the data
    side of metric-learning fine-tunes.

    Scale: the ann_bruteforce posture — the bounded anchor set
    broadcasts against ONE corpus scan; hardest-pos/neg are per-anchor
    ranking windows (WindowGroupLimit partials, never a global sort).
    At 100 TB the corpus side swaps in the IVF/LSH candidate relation
    (ann_ivf_multiprobe / ann_lsh_bucketed) so each anchor scores
    candidates, not the corpus — the mining algebra is unchanged."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    anchors = F.broadcast(
        emb.filter(F.col("vec_id") < TRIPLET_ANCHORS).alias("a")
    )
    corpus = emb.alias("b")
    scored = anchors.join(
        corpus, F.col("b.vec_id") != F.col("a.vec_id")
    ).select(
        F.col("a.vec_id").alias("anchor_id"),
        F.col("a.label").alias("label"),
        F.col("b.vec_id").alias("cand_id"),
        (F.col("b.label") == F.col("a.label")).alias("same"),
        _cosine_spark().alias("cosine"),
    )
    wp = Window.partitionBy("anchor_id").orderBy("cosine", "cand_id")
    wn = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), "cand_id"
    )
    pos = (
        scored.filter(F.col("same"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "label",
            F.col("cand_id").alias("pos_id"),
            F.col("cosine").alias("pos_cosine"),
        )
    )
    neg = (
        scored.filter(~F.col("same"))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("cosine").alias("neg_cosine"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "label",
        "pos_id",
        "pos_cosine",
        "neg_id",
        "neg_cosine",
        (F.col("neg_cosine") + F.lit(float(TRIPLET_MARGIN)) > F.col("pos_cosine"))
        .cast("long")
        .alias("violates_margin"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation eval (Kusupati et al. 2022, arXiv:2205.13147):
# how much retrieval quality survives when embeddings are truncated to
# a dim prefix — THE sizing readout for tiered retrieval (cheap
# prefix-dim first pass, full-dim rerank). For each prefix length P,
# rank the corpus per query by prefix-cosine and report recall@k
# against the full-dim top-k. Both rankings use the deterministic
# (cosine DESC, vec_id) total order and the engines' bit-identical
# left-fold double dot products, so the recall counts are exact
# integers; recall at P = full dim is 1000 permille by construction
# (pinned in tests).
MATRYOSHKA_DIMS = (8, 16, 32, 64)  # 64 = the fixture's full width


def _prefix_dot_duck(a: str, b: str, p: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {p + 1}), i -> "
        f"CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y)"
    )


def _matryoshka_oracle() -> str:
    full = MATRYOSHKA_DIMS[-1]
    cos_cols = ", ".join(
        f"({_prefix_dot_duck('a', 'b', p)}) / "
        f"(sqrt({_prefix_dot_duck('a', 'a', p)}) * "
        f"sqrt({_prefix_dot_duck('b', 'b', p)})) AS cos_{p}"
        for p in MATRYOSHKA_DIMS
    )
    rn_cols = ", ".join(
        f"ROW_NUMBER() OVER (PARTITION BY query_id"
        f" ORDER BY cos_{p} DESC, vec_id) AS rn_{p}"
        for p in MATRYOSHKA_DIMS
    )
    hit_cols = ", ".join(
        f"CAST(SUM(CASE WHEN rn_{p} <= {TOP_K} AND rn_{full} <= {TOP_K}"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS hits_{p}"
        for p in MATRYOSHKA_DIMS
    )
    arms = "\n      UNION ALL ".join(
        f"SELECT query_id, CAST({p} AS BIGINT) AS prefix_dims,"
        f" hits_{p} AS hits_at_k,"
        f" CAST((1000 * hits_{p}) // {TOP_K} AS BIGINT) AS recall_permille"
        f" FROM h"
        for p in MATRYOSHKA_DIMS
    )
    return f"""
    WITH pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id, {cos_cols}
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    ranked AS (SELECT query_id, vec_id, {rn_cols} FROM pairs),
    h AS (SELECT query_id, {hit_cols} FROM ranked GROUP BY query_id)
    {arms}
    """


@register("emb_matryoshka_recall", oracle=_matryoshka_oracle())
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOP_K} of prefix-dim cosine rankings vs the full-dim
    ranking, per query and prefix length (see the constant block).

    Scale shape: the ann_bruteforce_topk posture — the tiny query set
    broadcasts against ONE corpus scan; all prefix cosines are computed
    in that single pass (per-row JVM array folds), the per-(query,
    prefix) rankings share one query-keyed partitioning (top-k via
    ranking windows, WindowGroupLimit-eligible), and the readout
    aggregate collapses to |queries| x |prefixes| rows."""
    full = MATRYOSHKA_DIMS[-1]
    emb = load_table(spark, sf_dir, "embeddings")
    # Per-side prep computed ONCE PER ROW, not once per pair (r11 opt):
    # the double-cast embedding and every prefix norm from one shared
    # self-product array. The old shape evaluated all three prefix
    # folds (a·b, a·a, b·b) inside the PAIR projection, so each corpus
    # row re-paid its own norm folds for every query (and each query
    # per corpus row). slice∘zip_with == zip_with∘slice element-for-
    # element and the fold order is unchanged, so every cosine is
    # bit-identical to the previous expression.
    norm_of = (
        lambda p: f"sqrt(aggregate(slice(sq, 1, {p}), 0D, (acc, v) -> acc + v))"
    )
    prep = (
        emb.select("vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("e"))
        .withColumn("sq", F.expr("zip_with(e, e, (x, y) -> x * y)"))
        .select(
            "vec_id",
            "e",
            *[F.expr(norm_of(p)).alias(f"nrm_{p}") for p in MATRYOSHKA_DIMS],
        )
    )
    q = prep.filter(F.col("vec_id") < N_QUERIES).alias("a")
    c = prep.alias("b")
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.expr("a.vec_id <> b.vec_id"))
        .withColumn("prod", F.expr("zip_with(a.e, b.e, (x, y) -> x * y)"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            *[
                (
                    F.expr(
                        f"aggregate(slice(prod, 1, {p}), 0D, (acc, v) -> acc + v)"
                    )
                    / (F.col(f"a.nrm_{p}") * F.col(f"b.nrm_{p}"))
                ).alias(f"cos_{p}")
                for p in MATRYOSHKA_DIMS
            ],
        )
    )
    ranked = pairs.select(
        "query_id",
        "vec_id",
        *[
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col(f"cos_{p}").desc(), F.col("vec_id")
                )
            )
            .alias(f"rn_{p}")
            for p in MATRYOSHKA_DIMS
        ],
    )
    h = ranked.groupBy("query_id").agg(
        *[
            F.sum(
                F.when(
                    (F.col(f"rn_{p}") <= TOP_K) & (F.col(f"rn_{full}") <= TOP_K), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"hits_{p}")
            for p in MATRYOSHKA_DIMS
        ]
    )
    stack = ", ".join(
        f"CAST({p} AS BIGINT), hits_{p}" for p in MATRYOSHKA_DIMS
    )
    return h.select(
        "query_id",
        F.expr(
            f"stack({len(MATRYOSHKA_DIMS)}, {stack}) AS (prefix_dims, hits_at_k)"
        ),
    ).select(
        "query_id",
        "prefix_dims",
        "hits_at_k",
        F.expr(f"CAST((1000 * hits_at_k) div {TOP_K} AS BIGINT)").alias(
            "recall_permille"
        ),
    )
