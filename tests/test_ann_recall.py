"""ANN recall vs the exact brute-force baseline, at two corpus sizes
(VERDICT r5 items 4+5): 500 vectors (sf0.001) and 2000 (sf0.1).

Everything here is deterministic (seeded hyperplanes, deterministic
k-means seeds, 6dp-rounded similarities), so the floors are tight pins
of measured values, not hopeful bounds. Measured at round 6:

====================  ========  =======
recall@10 (5 queries)  sf0.001   sf0.1
====================  ========  =======
lsh single-bucket         0.00     0.02
lsh multiprobe (flip-1)   0.02     0.14
ivf seed centroids        0.90     0.98
ivf k-means centroids     0.88     0.98
====================  ========  =======

near-dup pairs found (single → multiprobe, vs brute-force truth):
sf0.001 thr=0.30: 22 → 104 of 920; sf0.1 thr=0.35: 94 → 547 of 4137.

The single-bucket LSH numbers are the honest story of an 8-bit
signature on near-isotropic synthetic vectors (bucket-collision
probability ≈ (2/3)^8 for ~60° neighbors): multi-probe is the cheap
×5-7 recall lever, IVF+rerank is the high-recall path, and production
corpora with real near-duplicate structure sit far above all of these.
"""

from __future__ import annotations

import pytest

from project2_bigdata_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup,
    ivf_ann_topk,
    lsh_ann_topk,
)

SF_SMALL = "/root/testdata/sf0.001"   # 500 vectors
SF_LARGE = "/root/testdata/sf0.1"     # 2000 vectors

N_QUERIES, K = 5, 10


def _result_pairs(df) -> set[tuple[int, int]]:
    return set(map(tuple, df.select("query_id", "vec_id").collect()))


def _recall(ann: set, exact: set) -> float:
    return len(ann & exact) / len(exact)


@pytest.fixture(scope="module", params=[SF_SMALL, SF_LARGE],
                ids=["500vec", "2000vec"])
def corpus(request, spark):
    sf = request.param
    exact = _result_pairs(brute_force_topk(spark, sf, N_QUERIES, K))
    assert len(exact) == N_QUERIES * K
    return sf, exact


def test_ivf_recall_both_centroid_modes(spark, corpus):
    """IVF (nprobe=2 of 8 cells) + exact rerank: ≥0.85 recall@10 at both
    corpus sizes, in BOTH centroid modes — the k-means pre-pass slots in
    behind the same signature without degrading the seed-mode recall the
    registered oracle query pins (measured: seed 0.90/0.98, kmeans
    0.88/0.98)."""
    sf, exact = corpus
    for mode in ("seed", "kmeans"):
        got = _result_pairs(ivf_ann_topk(spark, sf, N_QUERIES, K,
                                         centroids=mode))
        assert _recall(got, exact) >= 0.85, (mode, sf)
        # top-k contract: k rows per query
        per_q = {}
        for q, _v in got:
            per_q[q] = per_q.get(q, 0) + 1
        assert all(n == K for n in per_q.values()), (mode, per_q)


def test_ivf_kmeans_close_to_seed(spark, corpus):
    """On this near-isotropic synthetic corpus the Lloyd refinement
    cannot beat the seed quantizer by much — the test pins that it also
    does not LOSE more than one result in ten (the upgrade is free to
    enable, which is the claim SCALE.md makes for real corpora)."""
    sf, exact = corpus
    seed = _recall(_result_pairs(ivf_ann_topk(spark, sf, N_QUERIES, K)), exact)
    km = _recall(_result_pairs(
        ivf_ann_topk(spark, sf, N_QUERIES, K, centroids="kmeans")), exact)
    assert km >= seed - 0.1, (km, seed)


def test_lsh_multiprobe_recall_gain(spark, corpus):
    """Flip-1-bit multi-probe must never lose recall (its candidate set
    is a strict superset per query) and must GAIN it at the larger
    corpus (measured 0.02 → 0.14 at 2000 vectors)."""
    sf, exact = corpus
    single = _recall(_result_pairs(
        lsh_ann_topk(spark, sf, N_QUERIES, K)), exact)
    multi = _recall(_result_pairs(
        lsh_ann_topk(spark, sf, N_QUERIES, K, multiprobe=True)), exact)
    assert multi >= single
    if sf == SF_LARGE:
        assert multi >= 0.10 and multi >= 4 * single, (single, multi)


@pytest.mark.parametrize("sf,thr,min_gain", [
    (SF_SMALL, 0.30, 3.0),
    (SF_LARGE, 0.35, 3.0),
], ids=["500vec", "2000vec"])
def test_near_dup_multiprobe_superset_and_gain(spark, sf, thr, min_gain):
    """Near-dup pair mining with flip-1 probing: the multiprobe pair set
    is a strict superset of the single-bucket set (Hamming ≤ 1 ⊇
    Hamming = 0) with ≥3× the pairs on this corpus (measured 22 → 104
    and 94 → 547), and no pair is emitted twice (exactly one probe
    value matches per pair)."""
    def pair_set(multiprobe):
        rows = (embedding_near_dup(spark, sf, threshold=thr,
                                   multiprobe=multiprobe)
                .select("id_a", "id_b").collect())
        pairs = list(map(tuple, rows))
        assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
        return set(pairs)

    single, multi = pair_set(False), pair_set(True)
    assert single <= multi
    assert len(multi) >= min_gain * len(single), (len(single), len(multi))
