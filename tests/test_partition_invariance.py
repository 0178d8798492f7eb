"""Partition-count invariance: results must not depend on the cluster
layout.

At 100 TB the same query runs with thousands of shuffle partitions, AQE
coalescing, and retry-induced recomputation; every determinism claim in
the repo (salted-hash sampling — no ``rand()``, integer/decimal
aggregation — no float-order drift, struct-MIN argmax — no window-sort
ties) reduces to one observable: the SAME rows come back when the
shuffle partitioning changes.  A round-6 full-registry probe found zero
divergent keys at 32 vs 7 shuffle partitions; this test pins the
families whose 100 TB story depends on it (sampling/splitting, float
aggregation, approximate sketches, greedy keeps, iterative label
propagation) so a future edit that sneaks in ``rand()``, a
``monotonically_increasing_id`` tie-break, or an order-sensitive float
fold fails here instead of at a retry on a real cluster.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

PINNED_KEYS = [
    # salted-hash sampling & splitting — the retry-determinism family
    "split_train_eval",
    "sample_stratified",
    "sample_importance_weighted",
    "pipeline_mix_rebalance",
    "corpus_curation_funnel",
    # float/decimal aggregation — order-independence of the money math
    "agg_groupby_sum",
    "agg_moments",
    "agg_percentile",
    # partial-merge sketches — merge-order independence
    "agg_hll_partial_merge",
    "profile_countmin_topk",
    # greedy keeps / argmax — tie-break determinism
    "dedup_canonical_keep",
    "agg_mode",
    # distributed exact ranking — offsets must not depend on the
    # physical partition layout (operators/ranking.py)
    "events_rfm_segmentation",
    # iterative — label propagation converges to the same fixpoint
    "dedup_clusters",
    # round-7 integer-deterministic families: PQ argmin/ADC ranking,
    # checkpointed k-core peeling, grid-quantile thresholds, Gram
    # power iteration, largest-remainder apportionment
    "sim_search_pq",
    "graph_kcore",
    "agg_quantile_partial_merge",
    "embedding_power_iteration",
    "corpus_token_budget_plan",
    # semantic dedup — assignment + cap sub-split stability
    "dedup_semantic",
    # streaming replay — session shuffle-partition setting must not
    # leak into batch composition, watermark progression, or metrics
    # (the runner pins its own state partitions internally)
    "stream_watermark_late",
    "stream_watermark_drop_report",
    # round-8 families: bottom-k-by-hash sampling (TakeOrdered merge
    # order must not matter), privacy class audits (distinct-count
    # expand + banding), the IVF-PQ composite and its persisted-index
    # probe (coarse argmax + integer ADC ranking end-to-end), gram df
    # accounting (hash-keyed double aggregate), and the stream-static
    # join (per-batch broadcast enrichment).
    "sample_reservoir",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "sim_search_ivf_pq",
    "sim_search_ivf_pq_persisted",
    "text_ngram_novelty",
    "stream_static_enrich",
    # round-9 families: decimal-exact sufficient statistics (Pearson),
    # min-label fixpoint over the persisted adjacency, probe-only ADC
    # ranking from the per-SF index cache, timer-driven session
    # emission on the replay path, and the Q17 decorrelated aggregate
    # join (decimal sum / exact-int avg).
    "profile_correlation_matrix",
    "graph_components_persisted",
    "sim_search_pq_probe",
    "stream_session_timers",
    "sql_q17_shape",
]


def _null_safe(rows):
    # None sorts before everything, per column, so NULL group keys
    # (grouping sets, rollups) compare deterministically.
    return sorted(
        tuple((v is not None, v) for v in r) for r in (tuple(r) for r in rows)
    )


@pytest.mark.parametrize("key", PINNED_KEYS)
def test_result_is_invariant_to_shuffle_partition_count(spark, key):
    from mapreduce_framework_spark.registry import get_query

    fn = get_query(key).fn
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = _null_safe(fn(spark, SF_DIR).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = _null_safe(fn(spark, SF_DIR).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert base == alt, f"{key}: result depends on shuffle partition count"
    assert base, f"{key}: empty result makes the invariance check vacuous"
