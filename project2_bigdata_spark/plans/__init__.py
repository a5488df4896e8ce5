"""Named query registry — the source of truth for ``__spark_entry__``.

Importing this package registers every query module. ``REGISTRY`` maps
name → Query(fn, oracle) and drives queries()/oracle_sql().
"""

from .registry import REGISTRY, Query, register  # noqa: F401

# Import order = SURVEY.md §7 phase order; each module self-registers.
from . import relational    # noqa: E402,F401  Phase 0/1: scans, filters, aggs, joins, sorts
from . import nested        # noqa: E402,F401  Phase 2: array ops, pair mining
from . import windowed      # noqa: E402,F401  Phase 2: lag stack, top-k, argmax
from . import pipelines     # noqa: E402,F401  Phase 3: EP1/EP2/EP3 dashboard composites
from . import temporal      # noqa: E402,F401  Phase 3½: as-of / range join, sessionization
from . import joins         # noqa: E402,F401  join/set-op/grouping-set completeness
from . import functions_surface  # noqa: E402,F401  string/percentile/math scalar surface
from . import datapipe      # noqa: E402,F401  Phase 6: dedup / similarity / text analysis
from . import curation      # noqa: E402,F401  round 2: PII / span dedup / sampling / quantize / CDC
from . import ops           # noqa: E402,F401  round 2: dq gates / anomalies / incremental rollups
from . import analytics     # noqa: E402,F401  round 2: gap-fill / rolling median / pareto / RFM / fuzzy / BM25
from . import classics      # noqa: E402,F401  round 5: TPC-H shapes, skyline, Benford, Welch, weighted median
from . import partsupp      # noqa: E402,F401  round 8: TPC-H Q2/Q11/Q16/Q20 via derived partsupp, Q12 via derived shipmode
from . import calibration   # noqa: E402,F401  round 5: isotonic (PAVA) fit, quantile normalization
from ..operators import kmeans as _op_kmeans  # noqa: E402,F401  round 2: Lloyd k-means with unrolled oracle
from ..streaming import windows as _streaming_windows  # noqa: E402,F401  Phase 5
from ..streaming import stateful as _streaming_stateful  # noqa: E402,F401  Phase 5
from ..streaming import transform_state as _streaming_transform_state  # noqa: E402,F401  Phase 5 (Spark 4 typed state)
from ..streaming import upsert as _streaming_upsert  # noqa: E402,F401  round 8: CDC → SCD1 MERGE sink from the stream
from ..ml import forecast as _ml_forecast  # noqa: E402,F401  Phase 4
from ..sources import ingest as _sources_ingest  # noqa: E402,F401  S1/S4 sources & sinks


# Driver-facing iteration order. The driver verifies the first 50
# entries of queries() per round; driver_order() below derives the
# order from the CORRECTNESS_r*.json files the driver leaves behind, so
# each round's results re-prioritize the next round automatically.

# Standing priority hint for never-checked queries: the LLM-data-
# pipeline core fronts ahead of late analytics extras (VERDICT r2
# item 1) — names already checked are skipped automatically.
_LLM_CORE_PRIORITY = [
    "dedup_clusters", "dedup_keep_best", "knn_join_topk", "ivf_ann_topk",
    "corpus_pipeline_e2e", "pii_redact", "decontaminate",
    "decontaminate_ngram", "gopher_quality_flags", "bpe_pair_stats",
    "bpe_train_merges", "bpe_encode", "bpe_tokenize_docs", "mixture_plan",
    "stream_interval_join", "chunk_documents", "sequence_packing",
    "winnowing_fingerprints", "span_dedup_crossdoc", "lang_id_ngram",
    "stratified_sample", "temperature_sample", "weighted_sample_aes",
    "hash_split_assign", "embedding_quantize", "dedup_embedding_clusters",
]

def _correctness_rows() -> dict[str, tuple[dict, int]]:
    """Union of every driver CORRECTNESS_r*.json row (later rounds win),
    each tagged with the ROUND it was last checked in.

    Read at call time so the ordering self-adjusts each round without a
    code change: a new CORRECTNESS file moves its green rows to the tail
    and keeps erred rows in front.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rows: dict[str, tuple[dict, int]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name, row in data.items():
                if isinstance(row, dict):
                    rows[name] = (row, rnd)
    return rows


def driver_order(rows: dict[str, tuple[dict, int]] | None = None) -> list[str]:
    """Registry names in the order the driver should check them.

    Derived from the CORRECTNESS_r*.json files on disk, so each round's
    driver run re-prioritizes the next one automatically:

    1. re-check rows — a real error, a hash mismatch, or a ``no_oracle``
       verdict for a query that NOW has an oracle in the registry (the
       driver result would upgrade);
    2. never-checked queries — LLM-pipeline core first, then
       oracle-bearing, then rows-only;
    3. the already-checked tail (green and by-design rows-only) ordered
       LEAST-RECENTLY-CHECKED FIRST (r10, VERDICT r9 item 8): with a
       50-query window over 300+ names, a registration-ordered tail
       would re-check the same 50 forever and late additions would
       never re-enter; staleness order guarantees every query re-enters
       a window at least once every ceil(N/50) rounds (pinned by
       ``test_driver_order_rotates_every_query``). Ties (same round)
       keep registration order.

    Every registered name appears exactly once. ``rows`` is injectable
    for the rotation test; None reads the driver's files from disk.
    """
    if rows is None:
        rows = _correctness_rows()

    def needs_recheck(name: str) -> bool:
        tagged = rows.get(name)
        if tagged is None:
            return False
        row = tagged[0]
        if row.get("hash_match") is False:
            return True  # wrong answer on record — always re-enter
        err = row.get("err")
        if err is None:
            return False
        if err == "no_oracle":
            # rows-only by design stays in the tail; a query that since
            # GAINED an oracle re-enters to upgrade its row
            return REGISTRY[name].oracle is not None
        return True  # driver-level error (canonicalizer, OOM, ...)

    order: list[str] = []
    placed: set[str] = set()

    def take(names) -> None:
        for n in names:
            if n in REGISTRY and n not in placed:
                order.append(n)
                placed.add(n)

    take([n for n in REGISTRY if needs_recheck(n)])
    never = [n for n in REGISTRY if n not in placed and n not in rows]
    take([n for n in _LLM_CORE_PRIORITY if n in never])
    take([n for n in never if REGISTRY[n].oracle is not None])
    take(never)  # rows-only remainder
    # already-checked tail: least-recently-checked first, so the
    # 50-query window rotates through the whole registry
    reg_idx = {n: i for i, n in enumerate(REGISTRY)}
    take(sorted((n for n in REGISTRY if n not in placed),
                key=lambda n: (rows[n][1], reg_idx[n])))
    return order
