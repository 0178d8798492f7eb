"""Invariants of the sessionization / funnel / PageRank / histogram /
contamination queries that the oracle hash can't see: the hash proves
cross-engine agreement, these prove the semantics are the intended ones.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from tests.conftest import SF_DIR


def _q(spark, name):
    from mapreduce_framework_spark.registry import get_query

    return get_query(name).fn(spark, SF_DIR)


def test_sessionize_gap_semantics(spark):
    """Within a session all consecutive gaps are ≤ 30 min; consecutive
    sessions of the same user are separated by > 30 min; event counts
    conserve."""
    from mapreduce_framework_spark.io import table

    sessions = _q(spark, "window_sessionize").collect()
    events = (
        table(spark, SF_DIR, "events")
        .select("user_id", F.col("ts").cast("long").alias("sec"), "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append((r.sec, r.event_id))
    # Recompute sessions in pure Python and compare aggregate shape.
    expected_counts = defaultdict(int)
    for uid, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for sec, _ in evs:
            if prev is None or sec - prev > 1800:
                sid += 1
            expected_counts[(uid, sid)] += 1
            prev = sec
    got_counts = {(r.user_id, r.session_no): r.n_events for r in sessions}
    assert got_counts == dict(expected_counts)
    assert sum(r.n_events for r in sessions) == len(events)
    for r in sessions:
        assert r.duration_s >= 0


def test_funnel_stage_ordering(spark):
    """Funnel timestamps are strictly increasing along reached stages,
    and stage counts are monotonically non-increasing."""
    rows = _q(spark, "events_funnel").collect()
    n = [0, 0, 0]
    for r in rows:
        assert r.stage == 1 + (r.t_click is not None) + (r.t_purchase is not None)
        if r.t_click is not None:
            assert r.t_click > r.t_view
            n[1] += 1
        if r.t_purchase is not None:
            assert r.t_click is not None, "stage skipped"
            assert r.t_purchase > r.t_click
            n[2] += 1
        n[0] += 1
    assert n[0] >= n[1] >= n[2]
    assert n[0] > 0


def test_pagerank_bounds_and_determinism(spark):
    """Every rank ≥ the damping floor; total rank is bounded by the
    initial mass (floor() only discards); re-running is bit-identical."""
    rows = _q(spark, "graph_pagerank").collect()
    assert rows, "empty graph"
    total_initial = len(rows) * 1_000_000
    total = sum(r["rank"] for r in rows)
    for r in rows:
        assert r["rank"] >= 150_000
    assert total <= total_initial
    # Mass shouldn't collapse either: floor() loses < 1 unit per edge
    # per round; 15% redistribution base keeps sums in the same decade.
    assert total >= total_initial * 0.5
    again = _q(spark, "graph_pagerank").collect()
    assert sorted((r["node"], r["rank"]) for r in rows) == sorted(
        (r["node"], r["rank"]) for r in again
    )


def test_histogram_partitions_orders(spark):
    """Buckets tile the value range: counts sum to the table count,
    bucket bounds nest inside [bucket*w, (bucket+1)*w), and the CDF is
    strictly increasing with the last value equal to the total."""
    from mapreduce_framework_spark.io import table

    rows = sorted(_q(spark, "agg_histogram").collect(), key=lambda r: r.bucket)
    n_orders = table(spark, SF_DIR, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    w = 20000
    cum = 0
    for r in rows:
        assert r.bucket * w <= r.lo <= r.hi < (r.bucket + 1) * w
        cum += r.n
        assert r.cum_n == cum
    assert rows[-1].cum_n == n_orders


def test_contamination_ratio_bounds(spark):
    """Ratios live in [0,1]; a doc's contaminated grams never exceed its
    gram count; only eval-split docs appear."""
    rows = _q(spark, "contamination_ngram").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_grams
        assert abs(r.contamination_ratio - r.n_contaminated / r.n_grams) < 1e-12
    # Split membership: every doc_id hashes to the eval bucket.
    import hashlib

    for r in rows:
        assert hashlib.md5(str(r.doc_id).encode()).hexdigest()[0] >= "c"


def test_stratified_sample_rates(spark):
    """Per-stratum sampled fraction tracks the declared 4/16 vs 12/16
    rates (loose bounds at small SF), and sampling is a pure function
    of doc_id (identical on re-run)."""
    rows = _q(spark, "sample_stratified").collect()
    for r in rows:
        frac = r.n_sampled / r.n_total
        head = int(r.source[3:]) < 10
        if head:
            assert frac <= 0.6
        else:
            assert frac >= 0.4
    again = _q(spark, "sample_stratified").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_profile_table_internal_consistency(spark):
    """Every profiled column reports the same row count; nulls and
    distincts are bounded by it; min_repr <= max_repr under the
    column's native order (spot-checked numerically for the key)."""
    rows = _q(spark, "profile_table").collect()
    assert len(rows) == 5
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 0 < r.n_distinct <= r.n_rows - r.n_nulls
    custkey = next(r for r in rows if r.column_name == "o_custkey")
    assert int(custkey.min_repr) <= int(custkey.max_repr)


def test_sink_compaction_lossless_and_counts(spark):
    """Compaction must preserve every row and actually change the file
    layout 64 -> 4."""
    row = _q(spark, "sink_compaction").collect()[0]
    assert row.n_rows_before == row.n_rows_after
    assert row.n_files_before == 64
    assert row.n_files_after == 4


def test_kmeans_partition_and_inertia_monotone(spark):
    """The assignment is a partition of all vectors, each representative
    belongs to its own cluster, and one more Lloyd round never increases
    total inertia (the textbook descent property — it must survive the
    integer quantization for the declared rounds)."""
    from mapreduce_framework_spark.io import table
    from mapreduce_framework_spark.operators.kmeans import (
        assign,
        kmeans_rounds,
        quantize,
    )

    final = _q(spark, "embedding_kmeans").collect()
    n_vectors = table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in final) == n_vectors
    assert all(r.n_members > 0 for r in final)

    vectors = table(spark, SF_DIR, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("v")
    )
    seeds = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("v").alias("c")
    )
    inertia_1 = assign(vectors, seeds).agg(F.sum("dist")).collect()[0][0]
    inertia_2 = kmeans_rounds(vectors, seeds, rounds=2).agg(F.sum("dist")).collect()[0][0]
    assert inertia_2 <= inertia_1
    assert sum(r.total_dist for r in final) == inertia_2


def test_contamination_exact_bounds(spark):
    """Contaminated counts are bounded by eval doc counts per source,
    and the per-source eval totals agree with the split query."""
    rows = _q(spark, "contamination_exact").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_eval_docs


def test_heavy_hitters_ordered_and_consistent(spark):
    """Exactly 10 hitters, non-increasing counts with deterministic
    key tie-break, and ppm share consistent with the table total."""
    rows = _q(spark, "profile_heavy_hitters").collect()
    assert len(rows) == 10
    total = table(spark, SF_DIR, "orders").count()
    for a, b in zip(rows, rows[1:]):
        assert (a.n_rows, -a.key) >= (b.n_rows, -b.key)
    for r in rows:
        assert r.share_ppm == r.n_rows * 1_000_000 // total


def test_dedup_incremental_conservation(spark):
    """Every new doc is accounted for exactly once:
    n_new = corpus-dups + within-batch-dups + kept, per source."""
    rows = _q(spark, "dedup_incremental").collect()
    assert rows
    for r in rows:
        assert r.n_new == r.n_dup_corpus + r.n_kept + r.n_dup_within
        assert r.n_kept > 0


def test_interval_overlap_equals_naive_theta_join(spark):
    """The bucketized range join must return exactly what the naive
    (nested-loop) theta join returns."""
    ev = table(spark, SF_DIR, "events")
    w = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("hi"),
    )
    p = ev.where(F.col("event_type") == "click").select(
        "ts", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    naive = (
        p.join(w, (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"), F.sum("cents").alias("click_cents"))
    )
    got = sorted(map(tuple, _q(spark, "join_interval_overlap").collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_hll_merge_equals_direct_and_bounds_error(spark):
    """Sketch-union of daily partials must equal the single direct
    sketch over all events (associative merge), estimates must sit
    within HLL lgK=12 error of exact distincts, and the whole thing
    must be partitioning-invariant."""
    rows = {
        r.grain: (r.exact_users, r.within_tol)
        for r in _q(spark, "agg_hll_partial_merge").collect()
    }
    assert all(ok for _, ok in rows.values()), "estimate outside error bound"
    ev = table(spark, SF_DIR, "events")
    merged = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0][0]
    )
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e"))
        .collect()[0][0]
    )
    assert merged == direct  # associative merge
    exact_all = ev.select("user_id").distinct().count()
    assert rows["ALL"][0] == exact_all
    exact_daily = {
        str(r.day): r.n
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {g: n for g, (n, _) in rows.items() if g != "ALL"} == exact_daily
    repart = (
        ev.repartition(13, "user_id")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0][0]
    )
    assert repart == merged  # partitioning-invariant


def test_gopher_rules_match_python_recompute(spark):
    """Rule counters must equal an independent per-document Python
    recompute of the same thresholds (the SQL and the Spark plan could
    agree on the *wrong* semantics; this pins the intended one)."""
    got = {r.source: r for r in _q(spark, "quality_gopher_rules").collect()}
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # docs, f_len, f_wl, f_stop, f_ttr, pass
    for row in table(spark, SF_DIR, "documents").select("source", "text").collect():
        t = row.text.split(" ")
        n_tok, chars = len(t), sum(len(w) for w in t)
        stop = sum(1 for w in t if w in ("the", "a", "data", "value"))
        ndis = len(set(t))
        ok = (
            25 <= n_tok <= 100,
            3 * n_tok <= chars <= 8 * n_tok,
            stop >= 2,
            2 * ndis >= n_tok,
        )
        a = agg[row.source]
        a[0] += 1
        for i, o in enumerate(ok):
            a[1 + i] += 0 if o else 1
        a[5] += 1 if all(ok) else 0
    assert set(got) == set(agg)
    for src, a in agg.items():
        r = got[src]
        assert (
            [r.n_docs, r.n_fail_len, r.n_fail_wordlen, r.n_fail_stop, r.n_fail_ttr, r.n_pass]
            == a
        ), src


def test_anomaly_flags_match_float_zscore(spark):
    """The integer-exact flag must agree with the plain float z-score
    formulation everywhere (the data sits away from the |z|=1.5
    boundary, so both formulations decide identically), and some but
    not all days must be flagged."""
    rows = _q(spark, "events_anomaly_exact").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    n_flagged = 0
    for rs in by_type.values():
        xs = [r.n_events for r in rs]
        n, mean = len(xs), sum(xs) / len(xs)
        var = sum((x - mean) ** 2 for x in xs) / n
        for r in rs:
            z2 = (r.n_events - mean) ** 2 / var if var else 0.0
            assert r.is_anomaly == (z2 > 2.25), (r.event_type, r.day)
            n_flagged += r.is_anomaly
    assert 0 < n_flagged < len(rows)


def test_mix_report_ppm_floor_and_totals(spark):
    """Integer-floor ppm shares must sum to within n_groups of exactly
    1e6 (floor loses < 1 ppm per cell) and doc counts must conserve."""
    rows = _q(spark, "doc_mix_report").collect()
    total_ppm = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) < total_ppm <= 1_000_000
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    tok = table(spark, SF_DIR, "documents").select(
        F.size(F.split("text", " ")).alias("n")
    )
    assert sum(r.n_tokens for r in rows) == tok.agg(F.sum("n")).collect()[0][0]


def test_prefix_clusters_share_prefix_and_cover_all_dups(spark):
    """Every reported cluster's members share the identical 2-token
    prefix; every prefix shared by >1 document is reported."""
    got = {r.prefix_hash: r for r in _q(spark, "dedup_doc_prefix").collect()}
    groups = defaultdict(list)
    for row in table(spark, SF_DIR, "documents").select("doc_id", "text").collect():
        groups[" ".join(row.text.split(" ")[:2])].append(row.doc_id)
    dup_groups = {k: sorted(v) for k, v in groups.items() if len(v) > 1}
    assert len(got) == len(dup_groups)
    sizes = sorted(r.n_docs for r in got.values())
    assert sizes == sorted(len(v) for v in dup_groups.values())
    keeps = sorted(r.keep_doc for r in got.values())
    assert keeps == sorted(v[0] for v in dup_groups.values())


def test_curation_funnel_is_monotone(spark):
    """Each curation stage can only shrink the surviving set, per
    source; and quality split accounting must balance exactly."""
    rows = _q(spark, "corpus_curation_funnel").collect()
    assert rows
    for r in rows:
        assert (
            r.n_raw
            >= r.n_quality
            >= r.n_train_pool
            >= r.n_post_exact
            >= r.n_post_prefix
            >= r.n_clean
            >= 0
        ), r
        assert r.n_quality == r.n_train_pool + r.n_eval_heldout, r


def test_canonical_keep_is_total_idempotent_mapping(spark):
    """dedup_canonical_keep invariants beyond the oracle: the map is
    TOTAL (every document appears exactly once), canonicals are FIXED
    POINTS (every canonical_id maps to itself / is_kept), and applying
    the map twice changes nothing (canonical(canonical(x)) ==
    canonical(x)) — the property a curation pipeline relies on when it
    filters to is_kept."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.registry import get_query
    from tests.conftest import SF_DIR

    df = get_query("dedup_canonical_keep").fn(spark, SF_DIR).cache()
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id").count()
    )
    assert df.count() == n_docs
    assert df.select("doc_id").distinct().count() == n_docs
    # canonicals are fixed points
    canon = df.select(F.col("canonical_id").alias("doc_id")).distinct()
    fixed = df.join(canon, "doc_id").where(
        (F.col("doc_id") != F.col("canonical_id")) | (~F.col("is_kept"))
    )
    assert fixed.count() == 0
    # idempotence: canonical of canonical is itself
    twice = (
        df.select("doc_id", "canonical_id")
        .join(
            df.select(
                F.col("doc_id").alias("canonical_id"),
                F.col("canonical_id").alias("canonical2"),
            ),
            "canonical_id",
        )
        .where(F.col("canonical_id") != F.col("canonical2"))
    )
    assert twice.count() == 0
    df.unpersist()


def test_quantile_partial_merge_bounds_and_totals(spark):
    """Every month's histogram estimates must land within one bin of the
    exact rank value (err in [1, W]) — the provable grid-sketch bound —
    and `total` must equal the month's true row count."""
    rows = _q(spark, "agg_quantile_partial_merge").collect()
    assert rows, "no months"
    W = 100_000
    for r in rows:
        assert r.bound_ok, f"bound violated: {r}"
        for q in ("50", "90", "99"):
            err = r[f"p{q}_err_cents"]
            assert 1 <= err <= W, f"p{q} err {err} outside (0, {W}]: {r}"
            assert r[f"p{q}_est_cents"] % W == 0, "estimate not a bin edge"
    li = table(spark, SF_DIR, "lineitem")
    truth = {
        row.month: row.n
        for row in li.groupBy(
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.month: r.total for r in rows} == truth


def test_zorder_pruning_lossless_and_bounded(spark):
    """The z-order metrics row must show (a) real pruning — scanned
    buckets a strict subset of all buckets, scanned rows ≥ matched rows
    — and (b) losslessness: n_matched/revenue equal the same box query
    computed directly on the raw table with the same integer bounds."""
    r = _q(spark, "sink_zorder").collect()
    assert len(r) == 1
    m = r[0]
    assert 0 < m.buckets_scanned < m.buckets_total
    assert m.n_matched <= m.rows_scanned
    o = (
        table(spark, SF_DIR, "orders")
        .select(
            F.col("o_custkey").alias("x"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("y"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    b = o.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    ).collect()[0]
    xspan, yspan = b.xmax - b.xmin + 1, b.ymax - b.ymin + 1
    x_lo, x_hi = b.xmin + xspan * 1 // 8, b.xmin + xspan * 3 // 8
    y_lo, y_hi = b.ymin + yspan * 2 // 8, b.ymin + yspan * 5 // 8
    direct = o.where(
        (F.col("x") >= x_lo) & (F.col("x") < x_hi)
        & (F.col("y") >= y_lo) & (F.col("y") < y_hi)
    ).agg(F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("cents"), F.lit(0)).alias("s")).collect()[0]
    assert (m.n_matched, m.revenue_cents) == (direct.n, direct.s), (
        "pruned scan lost or duplicated rows"
    )


def test_power_iteration_matches_float_recompute(spark):
    """The integer power-iteration loadings must be near-parallel to a
    float recompute of the SAME two rounds (G²·1 direction, numpy) from
    the same quantized lattice — quantization/truncation error only —
    and the Rayleigh quotient can exceed neither numpy's top eigenvalue
    nor the trace."""
    import numpy as np

    rows = _q(spark, "embedding_power_iteration").collect()
    assert len(rows) == 64
    lam = rows[0].rayleigh_lambda
    v_int = np.array(
        [r.loading for r in sorted(rows, key=lambda r: r.dim)], dtype=float
    )
    emb = np.array(
        [
            r.e
            for r in table(spark, SF_DIR, "embeddings")
            .select(F.col("embedding").cast("array<double>").alias("e"))
            .collect()
        ]
    )
    X = np.round(emb * 100)
    G = X.T @ X
    v_float = G @ (G @ np.ones(64))
    cos = v_int @ v_float / (np.linalg.norm(v_int) * np.linalg.norm(v_float))
    assert cos > 0.999, f"integer loadings diverged from float recompute: {cos}"
    top = float(np.linalg.eigvalsh(G)[-1])
    assert 0 <= lam <= top + 1, f"Rayleigh {lam} outside [0, lambda_max={top}]"
    assert lam <= np.trace(G)


def test_token_budget_plan_sums_exactly_and_is_proportional(spark):
    """Largest-remainder guarantees: allocations sum to the budget
    EXACTLY, every allocation is within 1 of the exact proportional
    share, and the number of remainder upgrades equals the leftover."""
    rows = _q(spark, "corpus_token_budget_plan").collect()
    B = 100_000
    assert sum(r.alloc_tokens for r in rows) == B
    T = sum(r.tokens for r in rows)
    for r in rows:
        exact = B * r.tokens / T
        assert abs(r.alloc_tokens - exact) < 1, (r.source, r.alloc_tokens, exact)
    upgrades = sum(1 for r in rows if r.got_remainder)
    assert upgrades == B - sum(B * r.tokens // T for r in rows)
