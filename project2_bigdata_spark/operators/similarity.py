"""Similarity search over the embeddings table (array<float>, 64-dim).

Two paths:
- brute-force cosine top-k: exact baseline. The dot product is a
  row-local sequential fold (zip_with + aggregate) in doubles — fully
  deterministic, and with broadcast queries the scan is one pass, no
  shuffle. Cost O(N_queries × N) — the correct baseline at any scale
  where N_queries is small.
- hyperplane-LSH ANN: 8 seeded random hyperplanes → 8-bit bucket;
  candidates share the query's bucket, top-k within. Sub-linear
  candidate sets; the bucket join is an equi-join, so it scales as a
  hash join at 100 TB. (An IVF variant would k-means the corpus; LSH
  avoids the training pass.)

Similarities are rounded to 6 dp *before* ranking on both engines so the
row_number tie-break (rounded_sim desc, vec_id) is engine-independent.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table, table_parallel

N_PLANES = 8
_RNG = np.random.RandomState(42)
#: Deterministic hyperplanes, shared verbatim with the DuckDB oracle.
PLANES: list[list[float]] = [
    [round(float(v), 6) for v in _RNG.uniform(-1.0, 1.0, 64)]
    for _ in range(N_PLANES)
]

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def brute_force_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first n_queries
    vec_ids. Queries are broadcast; corpus is scanned once."""
    e = table_parallel(spark, sf_dir, "embeddings")
    nrm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    queries = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"),
        nrm.alias("qn"),
    )
    cand = e.select("vec_id", "label", F.col("embedding").alias("ce"),
                    nrm.alias("cn"))
    # norms precomputed per vector: each (query, vector) pair costs one
    # 64-dim fold, not three; sqrt of the same double is the same
    # double, so dot/(qn*cn) is bit-identical to the oracle's
    # dot/(sqrt(qq)*sqrt(cc))
    sim = F.round(
        F.expr(_DOT.format(a="qe", b="ce")) / (F.col("qn") * F.col("cn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        cand.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def _plane_array_sql(plane: list[float]) -> str:
    return "array(" + ", ".join(f"cast({v}d as double)" for v in plane) + ")"


def _bucket_expr() -> F.Column:
    """8-bit sign bucket of the embedding against the fixed planes."""
    bits = []
    for p, plane in enumerate(PLANES):
        dot = F.expr(_DOT.format(a="embedding", b=_plane_array_sql(plane)))
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_ann_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10,
    multiprobe: bool = False,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's hyperplane bucket.

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's (flip each of the N_PLANES sign bits) —
    the standard multi-probe LSH recall upgrade (Lv et al., VLDB'07):
    a near neighbor that lands just across ONE hyperplane is recovered
    without adding plane banks. Candidate volume grows ×(N_PLANES+1)
    per query but stays an equi-join on bucket — same scale shape, and
    queries are broadcast so the corpus is still scanned once. The
    registered ``ann_lsh_topk`` query keeps the single-bucket default
    (oracle unchanged); the recall delta is quantified in
    tests/test_ann_recall.py.
    """
    e = table_parallel(spark, sf_dir, "embeddings").withColumn("bucket", _bucket_expr())
    nrm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    probe = (
        F.explode(F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
              for p in range(N_PLANES)],
        ))
        if multiprobe else F.col("bucket")
    )
    queries = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        nrm.alias("qn"),
        probe.alias("qbucket"),
    )
    cand = e.select("vec_id", "label", F.col("embedding").alias("ce"),
                    nrm.alias("cn"), "bucket")
    # per-vector norms: one fold per candidate pair (see brute_force_topk)
    sim = F.round(
        F.expr(_DOT.format(a="qe", b="ce")) / (F.col("qn") * F.col("cn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        cand.join(F.broadcast(queries), cand.bucket == queries.qbucket)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


# ---- DuckDB oracle builders (same constants, same rounding) -----------

def oracle_brute_force_topk(n_queries: int = 5, k: int = 10) -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < {n_queries}
    ), c AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings
    ), sims AS (
      SELECT query_id, vec_id, label,
             round(list_dot_product(qe, ce) /
                   (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
                   6) AS cos_sim
      FROM c, q WHERE vec_id <> query_id
    )
    SELECT * FROM (
      SELECT query_id, vec_id, label, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM sims
    ) WHERE rnk <= {k}
    """


def _duck_plane(plane: list[float]) -> str:
    return "[" + ", ".join(str(v) for v in plane) + "]::DOUBLE[]"


def oracle_lsh_ann_topk(
    n_queries: int = 5, k: int = 10, multiprobe: bool = False
) -> str:
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_duck_plane(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(PLANES)
    )
    if multiprobe:
        # own bucket + every Hamming-1 neighbor, mirroring the Spark
        # explode: xor masks {0, 1, 2, 4, ..., 2^(N_PLANES-1)}
        masks = ", ".join(str(v) for v in [0] + [1 << p for p in range(N_PLANES)])
        q_cte = f"""
      SELECT vec_id AS query_id, emb AS qe, xor(bucket, pv.v) AS qbucket
      FROM e, (SELECT unnest([{masks}]) AS v) pv WHERE vec_id < {n_queries}"""
    else:
        q_cte = f"""
      SELECT vec_id AS query_id, emb AS qe, bucket AS qbucket
      FROM e WHERE vec_id < {n_queries}"""
    return f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             CAST({bucket} AS INT) AS bucket
      FROM embeddings
    ), q AS ({q_cte}
    ), sims AS (
      SELECT query_id, vec_id, label,
             round(list_dot_product(qe, emb) /
                   (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(emb, emb))),
                   6) AS cos_sim
      FROM e JOIN q ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
    )
    SELECT * FROM (
      SELECT query_id, vec_id, label, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM sims
    ) WHERE rnk <= {k}
    """


N_CENTROIDS = 8
N_PROBE = 2

#: rounded cosine between the row's embedding and a centroid struct `c`
#: (all-double math, 6dp rounding shared with the oracle). Norms are
#: PRECOMPUTED — `rn` once per row, `c.cnrm` once per centroid — so the
#: 8-centroid ranking costs 8 folds per row instead of 24; sqrt of the
#: same double is the same double, so the quotient is bit-identical to
#: the oracle's dot/(sqrt(aa)*sqrt(cc)).
_CENT_SIM = (
    "round("
    "aggregate(zip_with(embedding, c.cemb, (x, y) -> cast(x as double) * y), "
    "cast(0.0 as double), (acc, v) -> acc + v) / (rn * c.cnrm), 6)"
)

#: per-row array of (sim, cid) vs every centroid, best-first (sim desc,
#: cid asc tie-break via explicit comparator — no negation tricks, so
#: -0.0/0.0 can't diverge between engines)
_CENT_RANKING = (
    f"array_sort(transform(cents, c -> struct({_CENT_SIM} as s, c.cid as cid)), "
    "(l, r) -> CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1 "
    "WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1 ELSE 0 END)"
)


def _kmeans_centroids_row(
    spark: SparkSession, sf_dir: str, n_iter: int = 2
) -> DataFrame:
    """Lloyd-refined centroid row for the IVF pre-pass: N_CENTROIDS
    seeds (vec_id < N_CENTROIDS) refined by ``n_iter`` spherical k-means
    iterations (the same assign/update operators the oracle-checked
    ``kmeans_lloyd_2iter`` query runs, at K=N_CENTROIDS), emitted in the
    {cents: array<struct<cid, cemb, cnrm>>} shape the cell-assignment
    expression consumes. Per iteration: broadcast row-local assignment +
    a (K×dims)-cell aggregation — nothing here grows beyond O(N·K·dim).
    """
    from ..session import truncate_lineage
    from .kmeans import _assign, _update, _vectors

    vecs = _vectors(spark, sf_dir)
    cents = truncate_lineage(
        vecs.filter(F.col("vec_id") < N_CENTROIDS)
        .select(F.struct(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("ed").alias("cemb"),
        ).alias("c"))
        .agg(F.sort_array(F.collect_list("c")).alias("cents"))
    )
    for _ in range(n_iter):
        cents = truncate_lineage(_update(_assign(vecs, cents)))
    # decorate with the per-centroid norm the ranking expression expects
    return cents.select(F.expr(
        "transform(cents, c -> struct(c.cid as cid, c.cemb as cemb, "
        "sqrt(aggregate(zip_with(c.cemb, c.cemb, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v)) as cnrm))"
    ).alias("cents"))


def ivf_ann_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10,
    centroids: str = "seed",
) -> DataFrame:
    """IVF-style ANN top-k: coarse quantize the corpus into N_CENTROIDS
    cells (nearest centroid by rounded cosine), probe the query's
    N_PROBE nearest cells, exact-rerank within.

    ``centroids`` selects the coarse quantizer:

    - ``"seed"`` (default, the registered/oracle-checked query): the
      deterministic seed set (vec_id < N_CENTROIDS), which the DuckDB
      oracle reproduces exactly.
    - ``"kmeans"`` (the production upgrade, VERDICT r5 item 4): the same
      seeds refined by two Lloyd iterations via the oracle-checked
      k-means operators — balanced cells ⇒ better recall at the same
      nprobe, quantified in tests/test_ann_recall.py. Downstream plan is
      UNCHANGED: only the broadcast centroid row differs.

    Scale shape: centroid assignment is ROW-LOCAL (the centroid list
    rides in via a broadcast single-row cross join — no collect, no
    shuffle); candidates come from an equi-join on cell id, reading
    ~N_PROBE/N_CENTROIDS of the corpus per query. Real deployments raise
    N_CENTROIDS to ~sqrt(N) and keep nprobe small.
    """
    e = table_parallel(spark, sf_dir, "embeddings")
    if centroids == "kmeans":
        cents_row = _kmeans_centroids_row(spark, sf_dir)
    else:
        cents_row = (
            e.filter(F.col("vec_id") < N_CENTROIDS)
            .select(
                F.struct(
                    F.col("vec_id").cast("int").alias("cid"),
                    F.expr("transform(embedding, x -> cast(x as double))").alias("cemb"),
                    F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
                    .alias("cnrm"),
                ).alias("c")
            )
            # sort key is cid (first struct field, distinct) — the
            # trailing cnrm field cannot reorder
            .agg(F.sort_array(F.collect_list("c")).alias("cents"))
        )
    # The centroid ranking feeds both the cell assignment (all vectors)
    # and the probe list (query vectors). As plain lineage each branch
    # re-embedded the scan + broadcast + O(N × N_CENTROIDS × dim)
    # ranking (4 embedding scans observed) — keep only the top-1 cell
    # and the N_PROBE probe cells, and materialize that narrow frame
    # once (session.truncate_lineage) so the ranking runs exactly once.
    from ..session import truncate_lineage

    base = truncate_lineage(
        e.withColumn(
            "rn", F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
        )
        .crossJoin(F.broadcast(cents_row))
        .withColumn("cent_rank", F.expr(_CENT_RANKING))
        .select(
            "vec_id", "label", F.col("embedding").alias("ce"), "rn",
            F.expr("element_at(cent_rank, 1).cid").alias("cell"),
            F.expr(f"transform(slice(cent_rank, 1, {N_PROBE}), p -> p.cid)")
            .alias("pcells"),
        )
    )
    cand = base.select("vec_id", "label", "ce", F.col("rn").alias("cn"), "cell")
    probes = (
        base.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("ce").alias("qe"),
            F.col("rn").alias("qn"),
            F.explode("pcells").alias("probe_cell"),
        )
    )
    # rerank reuses the materialized per-vector norms: one fold per
    # candidate pair (see brute_force_topk)
    sim = F.round(
        F.expr(_DOT.format(a="qe", b="ce")) / (F.col("qn") * F.col("cn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        cand.join(F.broadcast(probes), cand.cell == probes.probe_cell)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def oracle_ivf_ann_topk(n_queries: int = 5, k: int = 10) -> str:
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ), cents AS (
      SELECT CAST(vec_id AS INT) AS cid, emb AS cemb
      FROM e WHERE vec_id < {N_CENTROIDS}
    ), assign AS (
      SELECT e.vec_id, e.label, e.emb, c.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               {cos.format(a='e.emb', b='c.cemb')} DESC, c.cid) AS rn
      FROM e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, label, emb, cid AS cell FROM assign WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, emb AS qe, cid AS probe_cell
      FROM assign WHERE vec_id < {n_queries} AND rn <= {N_PROBE}
    ), sims AS (
      SELECT p.query_id, c.vec_id, c.label,
             {cos.format(a='p.qe', b='c.emb')} AS cos_sim
      FROM cells c JOIN probes p
        ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
    )
    SELECT * FROM (
      SELECT query_id, vec_id, label, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM sims
    ) WHERE rnk <= {k}
    """


def oracle_ivf_ann_kmeans_topk(n_queries: int = 5, k: int = 10) -> str:
    """Oracle for the kmeans-centroid IVF (VERDICT r6 item 5): the
    2-iteration Lloyd refinement is unrolled in SQL by the SAME CTE
    builders the oracle-checked ``kmeans_lloyd_2iter`` uses (at
    K=N_CENTROIDS instead of 4), then the IVF assignment / probe /
    rerank runs against the refined centroids exactly as
    :func:`oracle_ivf_ann_topk` does against the seeds. Refinement
    assigns on 6dp-rounded vectors (``ed``, matching ``_vectors``);
    the final cell assignment and rerank use the RAW double embeddings
    (matching ``ivf_ann_topk``'s ``_CENT_SIM``/rerank expressions)."""
    from .kmeans import _o_assign, _o_update

    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS ed
      FROM embeddings
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS cid, ed AS cemb
      FROM e WHERE vec_id < {N_CENTROIDS}
    ), {_o_assign('e', 'c0', 'ka1')}, {_o_update('ka1', 'kc1')},
       {_o_assign('e', 'kc1', 'ka2')}, {_o_update('ka2', 'kc2')},
    assign AS (
      SELECT e.vec_id, e.label, e.emb, c.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               {cos.format(a='e.emb', b='c.cemb')} DESC, c.cid) AS rn
      FROM e CROSS JOIN kc2 c
    ), cells AS (
      SELECT vec_id, label, emb, cid AS cell FROM assign WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, emb AS qe, cid AS probe_cell
      FROM assign WHERE vec_id < {n_queries} AND rn <= {N_PROBE}
    ), sims AS (
      SELECT p.query_id, c.vec_id, c.label,
             {cos.format(a='p.qe', b='c.emb')} AS cos_sim
      FROM cells c JOIN probes p
        ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
    )
    SELECT * FROM (
      SELECT query_id, vec_id, label, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM sims
    ) WHERE rnk <= {k}
    """


#: Buckets bigger than this are excluded from the pairwise stages
#: (embedding_near_dup, knn_join_topk) — same discipline as
#: dedup.MAX_BUCKET / analytics.MAX_FUZZY_BLOCK. A FIXED plane count
#: means a fixed bucket count, so Σ bucket² grows as corpus²/2^planes:
#: the 100x scale-stress run measured both pair stages at ~300x wall
#: for 100x data. Real deployments size N_PLANES with the corpus
#: (target bucket ≈ constant: planes ≈ log2(N / target)); the cap
#: enforces that target against skew and against an under-sized
#: signature. Measured occupancy on the driver's data: max bucket 8 at
#: sf0.01, 23 at sf0.1 — the cap changes nothing at checked scales.
MAX_EMB_BUCKET = 500


def _capped_buckets(e: DataFrame) -> DataFrame:
    """Drop vectors whose bucket exceeds MAX_EMB_BUCKET (hot buckets
    need a finer signature, not a bigger join).

    A COUNT window over bucket looks wasteful (a corpus shuffle to
    learn 256 counts) but is measurably the right shape: the shuffle
    does double duty. Its HashPartitioning(bucket) is exactly what the
    downstream pair equi-join needs, so BOTH join sides — identical
    subtrees, deduped by ReuseExchange — consume the one exchange with
    no further shuffle, and the 8-plane signature computes once. The
    alternatives (groupBy+broadcast counts, with or without a
    materialization) each re-shuffled both join sides on bucket anyway
    and measured ~3× slower at 100× data (123 s vs 42 s)."""
    n = F.count("*").over(Window.partitionBy("bucket"))
    return (
        e.withColumn("__bn", n)
        .filter(F.col("__bn") <= MAX_EMB_BUCKET)
        .drop("__bn")
    )


def _oracle_capped_e(bucket_sql: str, cols: str) -> str:
    """Oracle mirror of _capped_buckets: the bucketed+capped relation."""
    return f"""
      SELECT * FROM (
        SELECT {cols},
               COUNT(*) OVER (PARTITION BY bucket) AS __bn
        FROM (SELECT *, CAST({bucket_sql} AS INT) AS bucket FROM embeddings)
      ) WHERE __bn <= {MAX_EMB_BUCKET}
    """


def embedding_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4,
    multiprobe: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-by-embedding
    strategy): candidates = vectors sharing an LSH bucket, verified by
    rounded cosine ≥ threshold.

    Same scale shape as MinHash dedup: the bucket equi-join replaces the
    all-pairs product, work grows with Σ bucket², and buckets over
    MAX_EMB_BUCKET are excluded (mirrored in the oracle) so the sum is
    bounded under skew and corpus growth. Recall is the standard LSH
    trade-off — ``multiprobe=True`` additionally pairs vectors whose
    buckets differ in exactly ONE sign bit (flip-1 probing on the right
    side of the join), recovering near-dups split by a single
    hyperplane at ×(N_PLANES+1) candidate volume — still an equi-join,
    same cap discipline; the recall gain is quantified in
    tests/test_ann_recall.py. The registered ``dedup_embedding_cosine``
    query keeps the single-bucket default (oracle unchanged).

    Default threshold is 0.4 because the synthetic embeddings contain no
    true near-duplicates (max pairwise cosine ≈ 0.51): the default
    exercises the full candidate→verify path on this data; production
    near-dup dedup uses 0.9+.
    """
    e = _capped_buckets(
        table_parallel(spark, sf_dir, "embeddings")
        .withColumn("bucket", _bucket_expr())
        .select("vec_id", "label", F.col("embedding").alias("emb"), "bucket")
    ).withColumn("nrm", F.sqrt(F.expr(_DOT.format(a="emb", b="emb"))))
    # norm precomputed per VECTOR (O(N) folds), so each PAIR costs one
    # dot-product fold instead of three; sqrt of the same double is the
    # same double, so dot/(na*nb) is bit-identical to the oracle's
    # dot/(sqrt(aa)*sqrt(bb))
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"),
        F.col("emb").alias("ea"), F.col("nrm").alias("na"), "bucket",
    )
    # flip-1 probing: for a fixed (id_a < id_b) pair at Hamming distance
    # ≤ 1, exactly ONE probe value equals a's bucket, so no pair
    # duplicates and no DISTINCT pass is needed
    probe_b = (
        F.explode(F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
              for p in range(N_PLANES)],
        ))
        if multiprobe else F.col("bucket")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"),
        F.col("emb").alias("eb"), F.col("nrm").alias("nb"),
        probe_b.alias("bucket_b"),
    )
    sim = F.round(
        F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        a.join(b, (a.bucket == b.bucket_b) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", "label_a", "label_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def oracle_embedding_near_dup(threshold: float = 0.4) -> str:
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_duck_plane(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(PLANES)
    )
    return f"""
    WITH e AS (
      {_oracle_capped_e(bucket, "vec_id, label, embedding::DOUBLE[] AS emb, bucket")}
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           a.label AS label_a, b.label AS label_b,
           round(list_dot_product(a.emb, b.emb) /
                 (sqrt(list_dot_product(a.emb, a.emb)) *
                  sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) /
                (sqrt(list_dot_product(a.emb, a.emb)) *
                 sqrt(list_dot_product(b.emb, b.emb))), 6) >= {threshold}
    """


def knn_join_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """KNN self-join: every vector's top-k neighbors among its LSH-bucket
    candidates (both directions of each candidate pair, ranked by rounded
    cosine with vec_id tie-break).

    The all-pairs product never materializes: candidates share an 8-bit
    bucket (equi-join, Σ bucket² work) with buckets over MAX_EMB_BUCKET
    excluded (mirrored in the oracle — see the cap's rationale above),
    and the per-vector top-k is one window over the candidate set. At
    higher recall targets, union multiple plane banks (multi-probe)
    before the window — same shape.
    """
    e = _capped_buckets(
        table_parallel(spark, sf_dir, "embeddings")
        .withColumn("bucket", _bucket_expr())
        .select("vec_id", F.col("embedding").alias("emb"), "bucket")
    ).withColumn("nrm", F.sqrt(F.expr(_DOT.format(a="emb", b="emb"))))
    # per-vector norms: one fold per pair instead of three (see
    # embedding_near_dup)
    a = e.select(F.col("vec_id").alias("src"), F.col("emb").alias("ea"),
                 F.col("nrm").alias("na"), "bucket")
    b = e.select(F.col("vec_id").alias("dst"), F.col("emb").alias("eb"),
                 F.col("nrm").alias("nb"), F.col("bucket").alias("bucket_b"))
    sim = F.round(
        F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), 6
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    return (
        a.join(b, (a.bucket == b.bucket_b) & (F.col("src") != F.col("dst")))
        .select("src", "dst", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def oracle_knn_join_topk(k: int = 3) -> str:
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_duck_plane(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(PLANES)
    )
    return f"""
    WITH e AS (
      {_oracle_capped_e(bucket, "vec_id, embedding::DOUBLE[] AS emb, bucket")}
    ), sims AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_dot_product(a.emb, b.emb) /
                   (sqrt(list_dot_product(a.emb, a.emb)) *
                    sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT * FROM (
      SELECT src, dst, cos_sim,
             CAST(row_number() OVER (PARTITION BY src
                  ORDER BY cos_sim DESC, dst) AS INT) AS rnk
      FROM sims
    ) WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# MMR — maximal marginal relevance diversified retrieval


#: MMR trade-off: score = MMR_LAMBDA·rel − (1−λ)·max-sim-to-selected.
#: Both constants appear as explicit literals on BOTH engines (never
#: computed as 1−λ: the doubles parse(0.7) and 1−parse(0.3) differ by
#: 1 ULP, which would break bit-parity of the scores).
MMR_LAMBDA = 0.7
MMR_MU = 0.3


def mmr_diverse_topk(
    spark: SparkSession, sf_dir: str, n_cand: int = 20, k: int = 5
) -> DataFrame:
    """MMR-diversified top-k retrieval (Carbonell & Goldstein, SIGIR'98):
    the standard RAG/context-selection step after ANN — pure relevance
    top-k returns near-duplicates of each other; MMR greedily picks the
    next result maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-selected.

    Scale shape: the only corpus-sized stage is candidate generation
    (one scan + TakeOrdered top-``n_cand`` — the same shape as
    ``brute_force_topk``; swap in the LSH/IVF candidate path at 100 TB).
    The greedy loop then operates on the BOUNDED candidate set: each of
    the ``k`` steps is an anti-join against ≤k selected ids plus a
    row-local ``array_max(transform(...))`` penalty against a broadcast
    ≤k-row selected list. Nothing downstream of the scan grows with the
    corpus, and there is no driver-side collect — the k steps compose
    one lazy plan. The candidate relation is persisted: every step (and
    the final union) reuses it, so the corpus scan runs once, not k
    times.

    Determinism: relevance and each pairwise penalty are rounded to 6dp
    before any ranking or max (same on the DuckDB oracle), ties break
    on vec_id, and the combined score is rounded again — so the greedy
    argmax sequence is engine-independent.
    """
    e = table_parallel(spark, sf_dir, "embeddings")
    nrm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qe"), nrm.alias("qn"))
    )
    rel = F.round(
        F.expr(_DOT.format(a="ce", b="qe")) / (F.col("cn") * F.col("qn")), 6
    )
    # truncate_lineage, not a bare persist(): every greedy step (and the
    # final union) reuses the candidate relation, and the checkpoint's
    # lifecycle is owned by Spark's reference tracker — a raw persist
    # here leaked one cached relation per invocation for the session
    # lifetime (r8 self-review item 7)
    from ..session import truncate_lineage

    cand = truncate_lineage(
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.col("embedding").alias("ce"),
                nrm.alias("cn"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", "ce", "cn", rel.alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(n_cand)
    )

    selected = (
        cand.orderBy(F.desc("rel"), "vec_id").limit(1)
        .select(F.lit(1).cast("int").alias("step"),
                "vec_id", "label", "ce", "cn", "rel",
                F.col("rel").alias("mmr_score"))
    )
    pen = F.round(
        F.expr(
            "array_max(transform(sel, s -> "
            + _DOT.format(a="ce", b="s.se")
            + " / (cn * s.sn)))"
        ),
        6,
    )
    for step in range(2, k + 1):
        sel_row = selected.agg(
            F.collect_list(
                F.struct(F.col("ce").alias("se"), F.col("cn").alias("sn"))
            ).alias("sel")
        )
        pick = (
            cand.join(selected.select("vec_id"), "vec_id", "left_anti")
            .crossJoin(F.broadcast(sel_row))
            .select(
                "vec_id", "label", "ce", "cn", "rel",
                F.round(
                    F.lit(MMR_LAMBDA) * F.col("rel")
                    - F.lit(MMR_MU) * pen, 6
                ).alias("mmr_score"),
            )
            .orderBy(F.desc("mmr_score"), "vec_id")
            .limit(1)
            .select(F.lit(step).cast("int").alias("step"),
                    "vec_id", "label", "ce", "cn", "rel", "mmr_score")
        )
        selected = selected.unionByName(pick)
    return selected.select("step", "vec_id", "label", "rel", "mmr_score")


def oracle_mmr_diverse_topk(n_cand: int = 20, k: int = 5) -> str:
    """DuckDB twin of :func:`mmr_diverse_topk`: the greedy loop unrolls
    into k chained CTEs (s1..sk), each an ORDER BY ... LIMIT 1 argmax
    over the candidates not yet selected, with the same 6dp round-before-
    rank discipline at every comparison point."""
    sim = ("round(list_dot_product(c.emb, s.emb) / (c.nrm * s.nrm), 6)")
    ctes = [
        f"""e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), q AS (
      SELECT emb AS qe, nrm AS qn FROM e WHERE vec_id = 0
    ), cand AS (
      SELECT vec_id, label, emb, nrm,
             round(list_dot_product(emb, qe) / (nrm * qn), 6) AS rel
      FROM e, q WHERE vec_id <> 0
      ORDER BY rel DESC, vec_id LIMIT {n_cand}
    ), s1 AS (
      SELECT vec_id, label, emb, nrm, rel, rel AS mmr_score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    ]
    for t in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id, emb, nrm FROM s{i}" for i in range(1, t)
        )
        ctes.append(f"""s{t} AS (
      SELECT c.vec_id, c.label, c.emb, c.nrm, c.rel,
             round(CAST({MMR_LAMBDA} AS DOUBLE) * c.rel
                   - CAST({MMR_MU} AS DOUBLE) *
                     (SELECT max({sim}) FROM ({prev}) s), 6) AS mmr_score
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM ({prev}) p)
      ORDER BY mmr_score DESC, c.vec_id LIMIT 1
    )""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({t} AS INT) AS step, vec_id, label, rel, mmr_score FROM s{t}"
        for t in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: recall@k + NDCG@k of the ANN path


def ann_recall_ndcg(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Evaluate every ANN method against brute-force ground truth, per
    (method, query): recall@k (overlap fraction) and NDCG@k with graded
    relevance = the true cosine similarity. This is the eval harness a
    production ANN index ships with — it quantifies the recall each
    approximation trades for its candidate-set reduction (single-bucket
    LSH < multiprobe LSH < 2-probe IVF, by construction), as a
    first-class query instead of living only in tests.

    Scale shape: all inputs are per-query top-k relations (bounded
    k·n_queries rows); everything downstream of the corpus scans is
    constant-size. DCG terms are rounded to 6dp (absorbing libm ln()
    ULP differences across engines) then summed as exact DECIMAL(28,10)
    so per-query sums are order-insensitive under any partitioning.
    """
    from ..functions.money import dsum10
    from ..session import truncate_lineage

    # the ground-truth relation feeds FOUR consumers (idcg + one join
    # per method) — materialize it once (k·n_queries rows) instead of
    # re-running the corpus-scan ranking per consumer (r8 self-review
    # item 6; the q_tpch_q2 `eligible` lesson)
    brute = truncate_lineage(brute_force_topk(spark, sf_dir, n_queries, k))
    idcg = brute.groupBy("query_id").agg(
        dsum10("round(cos_sim / ln(cast(rnk + 1 as double)), 6)", "idcg")
    )
    methods = [
        ("lsh", lsh_ann_topk(spark, sf_dir, n_queries, k)),
        ("lsh_multiprobe",
         lsh_ann_topk(spark, sf_dir, n_queries, k, multiprobe=True)),
        ("ivf", ivf_ann_topk(spark, sf_dir, n_queries, k)),
    ]
    out = None
    for name, ann in methods:
        j = (
            ann.alias("a")
            .join(
                brute.alias("b"),
                (F.col("a.query_id") == F.col("b.query_id"))
                & (F.col("a.vec_id") == F.col("b.vec_id")),
                "left",
            )
            .select(
                F.col("a.query_id").alias("query_id"),
                F.col("a.rnk").alias("rnk_ann"),
                F.col("b.cos_sim").alias("gain_sim"),
            )
        )
        dcg = j.groupBy("query_id").agg(
            F.count("gain_sim").cast("int").alias("n_hits"),
            dsum10(
                "round(coalesce(gain_sim, cast(0 as double)) / "
                "ln(cast(rnk_ann + 1 as double)), 6)",
                "dcg",
            ),
        )
        scored = (
            dcg.join(idcg, "query_id")
            .select(
                F.lit(name).alias("method"),
                "query_id",
                "n_hits",
                F.round(F.col("n_hits").cast("double") / k, 6).alias(
                    f"recall_at_{k}"
                ),
                F.round(F.col("dcg") / F.col("idcg"), 6).alias(
                    f"ndcg_at_{k}"
                ),
            )
        )
        out = scored if out is None else out.unionByName(scored)
    return out


def oracle_ann_recall_ndcg(n_queries: int = 5, k: int = 10) -> str:
    brute = oracle_brute_force_topk(n_queries, k)
    blocks = []
    for name, ann in [
        ("lsh", oracle_lsh_ann_topk(n_queries, k)),
        ("lsh_multiprobe",
         oracle_lsh_ann_topk(n_queries, k, multiprobe=True)),
        ("ivf", oracle_ivf_ann_topk(n_queries, k)),
    ]:
        blocks.append(f"""
    SELECT '{name}' AS method, d.query_id, d.n_hits,
           round(CAST(d.n_hits AS DOUBLE) / {k}, 6) AS recall_at_{k},
           round(d.dcg / i.idcg, 6) AS ndcg_at_{k}
    FROM (
      SELECT j.query_id,
             CAST(count(j.gain_sim) AS INT) AS n_hits,
             CAST(CAST(SUM(CAST(round(coalesce(j.gain_sim, CAST(0 AS DOUBLE))
                  / ln(CAST(j.rnk_ann + 1 AS DOUBLE)), 6)
                  AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS dcg
      FROM (
        SELECT a.query_id, a.rnk AS rnk_ann, b.cos_sim AS gain_sim
        FROM ({ann}) a LEFT JOIN brute b
          ON a.query_id = b.query_id AND a.vec_id = b.vec_id
      ) j GROUP BY 1
    ) d JOIN idcg i USING (query_id)""")
        # noqa: the per-method ANN relation inlines as a subquery — CTE
        # names stay unique without cross-method coordination
    union = "\n    UNION ALL\n".join(blocks)
    return f"""
    WITH brute AS ({brute}),
    idcg AS (
      SELECT query_id,
             CAST(CAST(SUM(CAST(round(cos_sim
                  / ln(CAST(rnk + 1 AS DOUBLE)), 6)
                  AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS idcg
      FROM brute GROUP BY 1
    )
    {union}
    """


def ann_mrr(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Mean reciprocal rank — the third metric of the retrieval-eval
    trio (recall@k and NDCG@k live in :func:`ann_recall_ndcg`): per
    method, the mean over queries of 1/rank-of-first-relevant-result
    (relevant = member of the brute-force top-k; a query with no hit
    contributes 0). Same bounded eval shape; per-query reciprocals
    round to 6dp then sum as exact DECIMAL(28,10), so the mean is
    order-insensitive."""
    from ..functions.money import dsum10
    from ..session import truncate_lineage

    brute = truncate_lineage(brute_force_topk(spark, sf_dir, n_queries, k))
    nq = brute.select("query_id").distinct().count()
    methods = [
        ("lsh", lsh_ann_topk(spark, sf_dir, n_queries, k)),
        ("lsh_multiprobe",
         lsh_ann_topk(spark, sf_dir, n_queries, k, multiprobe=True)),
        ("ivf", ivf_ann_topk(spark, sf_dir, n_queries, k)),
    ]
    out = None
    for name, ann in methods:
        per_q = (
            ann.alias("a")
            .join(
                brute.alias("b"),
                (F.col("a.query_id") == F.col("b.query_id"))
                & (F.col("a.vec_id") == F.col("b.vec_id")),
                "inner",
            )
            .groupBy(F.col("a.query_id").alias("query_id"))
            .agg(F.min("a.rnk").alias("first_hit"))
            .select(F.round(F.lit(1.0) / F.col("first_hit"), 6).alias("rr"))
        )
        scored = per_q.agg(
            dsum10("rr", "rr_sum")
        ).select(
            F.lit(name).alias("method"),
            F.lit(nq).cast("bigint").alias("n_queries"),
            F.round(F.coalesce(F.col("rr_sum"), F.lit(0.0))
                    / nq, 6).alias(f"mrr_at_{k}"),
        )
        out = scored if out is None else out.unionByName(scored)
    return out


def oracle_ann_mrr(n_queries: int = 5, k: int = 10) -> str:
    brute = oracle_brute_force_topk(n_queries, k)
    blocks = []
    for name, ann in [
        ("lsh", oracle_lsh_ann_topk(n_queries, k)),
        ("lsh_multiprobe",
         oracle_lsh_ann_topk(n_queries, k, multiprobe=True)),
        ("ivf", oracle_ivf_ann_topk(n_queries, k)),
    ]:
        blocks.append(f"""
    SELECT '{name}' AS method,
           (SELECT count(DISTINCT query_id) FROM brute) AS n_queries,
           round(coalesce((
             SELECT CAST(CAST(SUM(CAST(round(CAST(1.0 AS DOUBLE) / first_hit, 6)
                    AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
             FROM (
               SELECT a.query_id, min(a.rnk) AS first_hit
               FROM ({ann}) a JOIN brute b
                 ON a.query_id = b.query_id AND a.vec_id = b.vec_id
               GROUP BY 1
             )
           ), CAST(0 AS DOUBLE))
           / (SELECT count(DISTINCT query_id) FROM brute), 6)
             AS mrr_at_{k}""")
    union = "\n    UNION ALL\n".join(blocks)
    return f"WITH brute AS ({brute})\n    {union}"
