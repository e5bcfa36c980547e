"""Physical-plan assertions (the 100 TB discipline): filters and projections
reach the parquet scan, small dimensions broadcast, global top-k avoids a
full sort, scalar kernels stay inside whole-stage codegen, and the batch
window is explicitly single-partition (documented constraint). If a
refactor regresses a plan shape, these fail before any benchmark does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.registry import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join-star-revenue")
    # the region filter must appear as a pushed parquet filter, not a
    # post-scan Filter only
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "score-page")
    # score-page needs only doc_id + text; n_chars/lang/source must not be read
    read_schemas = [
        seg.split(">")[0] for seg in plan.split("ReadSchema: struct<")[1:]
    ]
    assert read_schemas, "no parquet scan found"
    for rs in read_schemas:
        assert "n_chars" not in rs and "lang" not in rs


def test_dimensions_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join-star-revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk-pages-report")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_scalar_kernels_codegen(spark, sf_dir):
    # relevance scoring is pure column arithmetic — one codegen stage, no
    # BatchEvalPython anywhere
    plan = _plan(spark, sf_dir, "score-link")
    assert "*(" in plan  # '*(n)' prefix marks whole-stage-codegen stages
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_no_python_in_relational_suite(spark, sf_dir):
    for name in (
        "agg-pricing-summary",
        "window-running-total",
        "dedup-minhash",
        "similarity-topk",
        "udtf-chunk-rag",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_anti_join_stays_broadcast_at_fixture_scale(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join-frontier-visited")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# Every physical-plan smell we accept, with its justification. Anything NOT
# listed here failing the audit means a refactor regressed a plan shape.
PLAN_ALLOWLIST = {
    # BPE merge rounds: each round's chosen pair is a 1-row broadcast
    # (argmax of the pair counts) cross-joined onto the vocabulary-sized
    # symbol table — the scalar-total pattern; the symbol table itself is
    # |vocab| rows regardless of corpus size
    "agg-bpe-merges": {"BroadcastNestedLoopJoin"},
    "udf-bpe-tokenize": {"BroadcastNestedLoopJoin"},
    # unigram-logprob stage inside the composed WARC pipeline: the corpus
    # token total is a 1-row scalar agg (SinglePartition inherent)
    # broadcast back onto the token stream (1-row BNLJ) — same shape as
    # udf-unigram-logprob's own allowlisted plan. (The DSIR stage's old
    # BNLJ went away in round 6 — its totals are now a window over the
    # bucket frame — but the LM stage's 1-row BNLJ remains inherent.)
    "pipeline-warc-corpus": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # CCNet bucketing: corpus token total is a 1-row scalar agg broadcast
    # back onto the token stream — same shape as udf-unigram-logprob
    "sample-perplexity-buckets": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # scalar (no-group) aggregates: partial agg per partition, then a
    # single-row final combine — inherent to a global total, and cheap
    "agg-batch-rollup": {"SinglePartition"},
    "agg-distinct-urls": {"SinglePartition"},
    "agg-approx-distinct": {"SinglePartition"},
    "agg-index-stats": {"SinglePartition"},
    "agg-ir-stats": {"SinglePartition"},
    "agg-queue-stats": {"SinglePartition"},
    "agg-visited-count": {"SinglePartition"},
    "join-small-qty-revenue": {"SinglePartition"},
    "filter-disjunctive-pushdown": {"SinglePartition"},
    # Q15's scalar subquery: max over the per-supplier revenue view is a
    # single-row final combine, then rejoined as a 1-row broadcast
    "topk-supplier-revenue": {"SinglePartition"},
    # Q6 is a single scalar sum (partial agg per partition, 1-row combine)
    "agg-forecast-revenue": {"SinglePartition"},
    # Welch t reduces the corpus to six integer moments: partial agg per
    # partition, single-row final combine — inherent to a global stat
    "agg-welch-ttest": {"SinglePartition"},
    # the duplicate/invalid rejection COUNTERS are global scalar aggs
    # over the per-image codec-result frame (bounded by the probe
    # population; at corpus scale still a partial-agg-per-partition +
    # 1-row combine over already-reduced rows) — same class as the
    # sibling pipeline-image-curate's counters below
    "pipeline-image-curate-real": {"SinglePartition"},
    # the min-class threshold attaches via a window over the
    # PRE-AGGREGATED class-count frame — O(|classes|) rows, never the
    # corpus
    "sample-balanced-classes": {"SinglePartition"},
    # rolling calendar window over the DAILY rollup: input is O(days)
    # rows (30 at sf0.1, ~36k at a century of data) — bounded by the
    # calendar, not the event volume, so the ordered window is safe
    "window-rolling-range-frame": {"SinglePartition"},
    # brute-force ANN is definitionally queries × corpus; the query side is
    # broadcast (5 rows). The scale path is similarity-lsh-bucketed.
    "similarity-topk": {"BroadcastNestedLoopJoin"},
    # IVF coarse quantization is definitionally corpus × centroids (16
    # broadcast rows); the per-query search itself is an equi-join on cell id
    "similarity-ivf": {"BroadcastNestedLoopJoin"},
    # similarity-ivf-pq's SinglePartition is excused CONDITIONALLY via
    # PLAN_WITNESS_ALLOWLIST below (r11 ADVICE #3): after the r11
    # quantize-once checkpoint, Catalyst injects a RUNTIME BLOOM FILTER
    # (SPARK-32268) over the query row's sub-space ids into the
    # distance-table join; bloom_filter_agg's 1-row combine is the
    # SinglePartition — a bounded scalar-agg shape and a guide-§3.2 win.
    # A blanket entry here would also excuse a future genuine
    # single-partition sort/agg regression in that plan.
    # k-means assignment is definitionally corpus × k centroids (k=8
    # broadcast rows, twice — one per Lloyd iteration)
    "similarity-kmeans-ann": {"BroadcastNestedLoopJoin"},
    # SemDeDup coarse quantization: corpus × 8 broadcast centroids (same
    # shape as the k-means assignment); the pairwise stage is an equi-join
    # on the cluster id
    "dedup-semantic": {"BroadcastNestedLoopJoin"},
    # global window confined to session-capped planner state (≤4 crawl
    # waves by construction) — see registry/streaming.py
    "stream-visited-state": {"SinglePartition"},
    # calendar-spine construction: global min/max of o_orderdate is a 1-row
    # scalar agg (SinglePartition inherent), cross-joined to the 5-row
    # region dim (1-row BNLJ) — data-independent, tiny, never grows with SF
    "agg-timeseries-gapfill": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # corpus-total/source-count scalar agg (1-row combine) cross-joined to
    # the per-source count dim — the mixture target is definitionally a
    # global ratio; the corpus itself only sees a narrow filter
    "sample-domain-reweight": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # corpus-token-total scalar (1-row combine) cross-joined back as a
    # 1-row broadcast — the unigram LM is definitionally normalized by the
    # global token count; the token stream itself sees only equi-joins
    "udf-unigram-logprob": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # BM25's corpus constants (N, avgdl) are global scalars (1-row combine
    # + 1-row broadcast); df/tf sides are hash-agg equi-joins
    "text-bm25-rank": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # merged-sketch estimate vs exact distinct: two global scalar aggs
    # (1-row combines) joined as a 1-row broadcast — inherent to a
    # whole-table accuracy check
    "agg-hll-sketch-merge": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # end-to-end curation pipeline inherits DSIR's scalar token totals —
    # since round 6 a SinglePartition window over the <=4096-row bucket
    # frame (one corpus pass), no longer a 1-row BNLJ broadcast
    "pipeline-curate-corpus": {"SinglePartition"},
    # temperature mixture: corpus total and weight-sum are global scalars
    # (1-row combines + 1-row broadcasts onto the 5-row lang dim); the
    # corpus itself sees only the threshold broadcast join
    "sample-temperature-mixture": {
        "SinglePartition",
        "BroadcastNestedLoopJoin",
    },
    # DSIR weight table: corpus/target token totals attach via a
    # SinglePartition window over the <=4096-row bucket frame (round 6 —
    # one corpus tokenization; previously a second full pass + 1-row
    # BNLJ); the token stream itself only sees the broadcast equi-join
    "sample-importance-reweight": {"SinglePartition"},
    # partsupp synthesis (TPC-H wave 6) modulos supplier keys by the
    # supplier COUNT: a 1-row scalar agg broadcast-crossed into the part
    # scan — data-independent and tiny. Q11 additionally carries its
    # definitional global-fraction threshold (another 1-row scalar).
    "join-min-cost-supplier": {"SinglePartition", "BroadcastNestedLoopJoin"},
    "agg-important-stock": {"SinglePartition", "BroadcastNestedLoopJoin"},
    "join-excess-stock-supplier": {
        "SinglePartition",
        "BroadcastNestedLoopJoin",
    },
    # final census row: n_triangles x n_wedges are each 1-row scalar aggs
    # (SinglePartition inherent) combined by a 1-row x 1-row cross join
    "join-triangle-count": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # n_users is a 1-row scalar agg broadcast onto the types^2-row pair
    # frame (1-row BNLJ) — both bounded by type cardinality, not events
    "agg-cooccurrence-lift": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # recency anchor date: 1-row scalar max broadcast onto the per-customer
    # rollup (1-row BNLJ) — data-independent size
    "agg-rfm-segments": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # warm-up-trim bounds: 1-row scalar min/max broadcast onto the
    # per-day frame (1-row BNLJ)
    "agg-dau-wau-stickiness": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # decay anchor day: 1-row scalar max broadcast onto the O(types x days)
    # daily rollup (1-row BNLJ) — the shared anchor is definitionally global
    "agg-decayed-popularity": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # the expectations gate is a corpus-wide scalar agg by definition
    # (partial combine per partition, 1-row final, O(rules) output)
    "filter-expectations-gate": {"SinglePartition"},
    # table profiling is likewise a whole-table wide aggregate: partial
    # per-partition stats, 1-row combine, O(columns) long-form output
    "agg-profile-columns": {"SinglePartition"},
    # ratio-to-report: the global-total window runs over the 25-row
    # nation rollup — bounded by dim cardinality, never event volume
    "window-share-of-total": {"SinglePartition"},
    # KMV set-op pairs: a types x types cross of the 5-row per-set count
    # aggregate (bounded by set cardinality, never events); every
    # event-sized stage upstream is equi-joined/hash-aggregated
    "agg-kmv-distinct-setops": {"BroadcastNestedLoopJoin"},
    # PMI normalizer: total-bigram count is a 1-row scalar agg (partial
    # combine per partition) broadcast-crossed onto the >=min-support
    # pair table — the DSIR weight-table shape
    "text-collocations-pmi": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # brute-force MIPS is definitionally all-pairs (broadcast query set,
    # like similarity-topk); the max-norm scalar is a 1-row agg broadcast
    "similarity-mips": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # vocabulary-size scalar (1-row agg) broadcast-crossed onto the token
    # stream — the DSIR weight-table shape
    "text-bigram-perplexity": {"SinglePartition", "BroadcastNestedLoopJoin"},
    # confusion matrix is a corpus-wide scalar agg by definition (partial
    # combine per partition, 1-row output)
    "agg-eval-metrics": {"SinglePartition"},
    # the two 16-row centroid broadcasts (corpus assignment + the
    # pre-filtered query assignment) are bounded by n_centroids, never
    # corpus size
    "pipeline-rag-index": {"BroadcastNestedLoopJoin"},
    # deliberate API-coverage entry: the NATIVE Python UDTF surface is
    # row-at-a-time by definition (like the two pandas_udf entries in
    # training.py); the hot-path chunkers stay Arrow/mapInPandas
    "udtf-lateral-chunks": {"BatchEvalPython"},
    # the two rejection counters are corpus-wide scalar aggregates
    # (1-row outputs unioned onto the bounded category rollup)
    "pipeline-image-curate": {"SinglePartition"},
    # each version snapshot reduces to a single stats row by definition
    # (count/sum/fingerprint of the whole snapshot)
    "scan-time-travel": {"SinglePartition"},
}
_SMELLS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SinglePartition",
    "BatchEvalPython",
)

# Conditional allowlist (r11 ADVICE #3): smell → witness token. The smell
# is excused only while the witness that justifies it is still in the
# plan — for similarity-ivf-pq, the SinglePartition exchange belongs to
# the optimizer-injected bloom_filter_agg's 1-row combine (SPARK-32268);
# if the bloom filter stops firing but a SinglePartition remains, that is
# a genuine regression and must flag.
PLAN_WITNESS_ALLOWLIST: dict[str, dict[str, str]] = {
    "similarity-ivf-pq": {"SinglePartition": "bloom_filter_agg"},
}


def test_plan_audit_no_new_smells(spark, sf_dir):
    from ai_knowledge_etl_spark.registry import REGISTRY

    bad = {}
    for name in sorted(REGISTRY):
        plan = _plan(spark, sf_dir, name)
        hits = {s for s in _SMELLS if s in plan}
        witnessed = {
            smell
            for smell, witness in PLAN_WITNESS_ALLOWLIST.get(name, {}).items()
            if witness in plan
        }
        unexpected = hits - PLAN_ALLOWLIST.get(name, set()) - witnessed
        if unexpected:
            bad[name] = unexpected
    assert not bad, f"plan regressions: {bad}"


def test_sequential_ids_have_no_global_window(spark, sf_dir):
    """window-page-id must use the two-pass partition-offset scheme
    (operators/ids.py): a window PARTITIONED by pid, never a
    single-reducer global row_number()."""
    plan = _plan(spark, sf_dir, "window-page-id")
    assert "SinglePartition" not in plan
    assert "Window" in plan  # partition-local row_number survives
    assert "BroadcastExchange" in plan  # offsets arrive broadcast


def test_batch_packing_window_is_partitioned(spark, sf_dir):
    """The packing window must carry PARTITION BY (session key), not a
    global ORDER BY — one reducer per session, not one reducer total."""
    for name in ("window-batch-assign", "plan-batches", "agg-batch-rollup"):
        plan = _plan(spark, sf_dir, name)
        assert "SinglePartition" not in plan, name
        assert "hashpartitioning(o_custkey" in plan, name


def test_batch_packing_global_fallback_is_never_called_in_source(spark):
    """VERDICT r4 #4: operators/batching.assign_batches documents a
    global-window fallback (no partition_cols) that is acceptable ONLY for
    the reference's <=100-task planner state. Pin the docstring promise:
    no production call site may omit partition_cols — otherwise the
    single-reducer branch silently becomes the default on real data. The
    physical-plan test above proves the registry queries take the
    partitioned branch; this one proves no OTHER caller exists."""
    import ast
    import os

    import ai_knowledge_etl_spark as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            if fn == "batching.py":
                continue  # the definition itself
            tree = ast.parse(open(path).read())
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "assign_batches"
                ):
                    kw = {k.arg for k in node.keywords}
                    # positional arity: partition_cols is the 5th arg
                    if "partition_cols" not in kw and len(node.args) < 5:
                        offenders.append(f"{path}:{node.lineno}")
    assert not offenders, (
        "assign_batches called without partition_cols (global single-"
        f"reducer window) at: {offenders}"
    )


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """union-and-LOCF as-of join: exactly one hash-partitioning exchange
    on the join key (the window), never a range-join explosion."""
    plan = _plan(spark, sf_dir, "join-asof-last-purchase")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    n_hash_exchanges = len(
        re.findall(r"Exchange hashpartitioning", plan)
    )
    assert n_hash_exchanges == 1, f"expected 1 shuffle, saw {n_hash_exchanges}"


def test_sql_surface_broadcasts_dims(spark, sf_dir):
    """spark.sql over temp views must plan like the DataFrame twin:
    dimension joins broadcast, fact-fact join shuffles."""
    plan = _plan(spark, sf_dir, "sql-revenue-by-region")
    assert plan.count("BroadcastHashJoin") >= 3


def test_runtime_bloom_filter_semi_join_reduction(spark, sf_dir):
    """Runtime filtering (the 100 TB semi-join reduction): with a
    selective dimension filter and broadcast disabled, the optimizer
    must inject a bloom filter built from the dim side and probe it on
    the fact side BEFORE the shuffle — and results must equal the
    unfiltered plan's."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.sources.catalog import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        got = {(r["o_orderpriority"], r["n"]) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "no bloom filter was injected"
        assert "BloomFilterMightContain" in plan or "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # same answer without the runtime filter
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        "o_orderpriority = '1-URGENT'"
    )
    want = {
        (r["o_orderpriority"], r["n"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_join_hints_control_physical_strategy(spark, sf_dir):
    """Join-strategy hints are honored: the default plan broadcasts the
    small dim, `merge` forces sort-merge, `shuffle_hash` forces a
    shuffled hash join — the three strategies a 100 TB tuning pass
    chooses between."""
    from ai_knowledge_etl_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    default = plan_of(o.join(c, o["o_custkey"] == c["c_custkey"]))
    assert "BroadcastHashJoin" in default

    merged = plan_of(o.join(c.hint("merge"), o["o_custkey"] == c["c_custkey"]))
    assert "SortMergeJoin" in merged and "BroadcastHashJoin" not in merged

    hashed = plan_of(
        o.join(c.hint("shuffle_hash"), o["o_custkey"] == c["c_custkey"])
    )
    assert "ShuffledHashJoin" in hashed and "BroadcastHashJoin" not in hashed


def test_dynamic_partition_pruning_reaches_partitioned_scan(
    spark, sf_dir, tmp_path
):
    """Catalyst's dynamic partition pruning: a partitioned fact joined with
    a filtered dim must plan a runtime `dynamicpruning` subquery on the
    fact scan — at 100 TB this is the difference between scanning one
    partition directory and scanning the table. The corpus analog is
    partition-by-crawl-band (SURVEY §4 'partition pruning analog')."""
    from ai_knowledge_etl_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_priority")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .where(F.col("o_orderpriority").startswith("1"))
    )
    joined = fact.join(dim, "o_orderpriority")
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan
    # and the pruning actually restricts rows at runtime
    want = orders.where(F.col("o_orderpriority").startswith("1")).count()
    assert joined.count() == want


def test_paragraph_dedup_keep_first_is_aggregate_not_window(spark, sf_dir):
    """The keep-first must plan as a hash aggregate (partial combine
    crushes hot boilerplate fingerprints map-side) + equi join — never a
    ranking window, whose hot-fingerprint partition is unsplittable."""
    plan = _plan(spark, sf_dir, "dedup-paragraph")
    assert "WindowExec" not in plan and "RunningWindowFunction" not in plan
    assert "HashAggregate" in plan


def test_mad_outliers_windows_run_over_histograms(spark, sf_dir):
    """agg-mad-outliers (VERDICT r2 #3): the exact grouped median must be
    computed from a value histogram, so every Window node's input chain
    reaches a HashAggregate BEFORE any table scan — a window sorting raw
    corpus rows partitioned by the 3-value return flag puts ~1/3 of the
    corpus in one unsplittable task sort (AQE cannot split window-sort
    stragglers)."""
    df = REGISTRY["agg-mad-outliers"].spark(spark, sf_dir)
    root = df._jdf.queryExecution().executedPlan()

    def kids(n):
        if "AdaptiveSparkPlan" in n.nodeName():
            return [n.initialPlan()]
        s = n.children()
        return [s.apply(i) for i in range(s.length())]

    def agg_before_scan(n) -> bool:
        name = n.nodeName()
        if "Aggregate" in name:
            return True
        if "Scan" in name or "Relation" in name:
            return False
        ch = kids(n)
        return all(agg_before_scan(c) for c in ch) if ch else True

    windows = []

    def collect(n):
        if "Window" in n.nodeName():
            windows.append(n)
        for c in kids(n):
            collect(c)

    collect(root)
    assert windows, "histogram cumulative windows should exist"
    for w in windows:
        for c in kids(w):
            assert agg_before_scan(c), (
                f"Window over raw rows: {w.nodeName()} reaches a scan "
                "without an intervening aggregate"
            )


def test_aqe_skew_join_split_fires_on_unsalted_hot_key(spark, sf_dir):
    """The complement of join-salted-hot-key (round-3 verdict #7): when the
    hot key is NOT salted, AQE's OptimizeSkewedJoin must split the skewed
    shuffle partition at runtime. Thresholds are lowered in proportion to
    fixture size (prod defaults 256MB/5x median -> here KB-scale) — the
    trigger path is byte-size-based and identical at 100 TB; what this
    pins is that our join stays in a shape AQE CAN rescue (sort-merge,
    no pre-aggregation hiding the skew) and that the session's AQE confs
    actually enable the rescue."""
    from ai_knowledge_etl_spark.sources.catalog import load_table

    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        # repartition first: AQE splits a skewed REDUCE partition into
        # ranges of MAP outputs, so a single-mapper input (one tiny
        # parquet file) has nothing to split — at 100 TB the scan always
        # has thousands of mappers; 8 here emulates that.
        ev = load_table(spark, sf_dir, "events").repartition(8, "event_id")
        fact = ev.select(
            F.when(F.col("event_id") % 10 < 9, F.lit(0).cast("long"))
            .otherwise((F.col("event_id") % 97).cast("long"))
            .alias("k"),
            F.col("value"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 3 + 1).cast("long").alias("w"),
        )
        joined = fact.hint("merge").join(dim.hint("merge"), "k")
        # materialize THIS frame (not a derived count) — AQE rewrites the
        # plan at runtime, so the skew marker only appears on the executed
        # plan of the collected DataFrame
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the hot-key partition:\n" + plan[:2000]
        )
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injected_on_selective_shuffle_join(
    spark, sf_dir
):
    """Catalyst's runtime bloom-filter injection (the engine-level twin of
    operators/sketches.bloom_candidates): a selective dim filtered AFTER
    the fact scan can't prune via partitions or static predicates, so the
    optimizer plants bloom_filter_agg over the dim's join keys and wraps
    the fact side in might_contain — probe rows that can't match die
    BEFORE the shuffle. The application-side threshold is lowered to
    fixture scale (prod default 10 GB — the trigger is byte-size-based,
    identical at 100 TB); what this pins is that our equi-join shapes
    stay eligible (no expression wrapping the join key that would hide it
    from the rule) and the session leaves the rule enabled."""
    from ai_knowledge_etl_spark.sources.catalog import load_table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o = (
            load_table(spark, sf_dir, "orders")
            .where("o_orderpriority = '1-URGENT'")
            .select("o_orderkey")
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, (
            "runtime bloom filter not planted:\n" + plan[:2000]
        )
        assert "might_contain" in plan
        # and the filtered join is still the exact join
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        want = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        assert j.count() == want
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_interval_overlap_join_is_hash_not_nested_loop(spark, sf_dir):
    """The banded rewrite must make the general interval join an EQUI hash
    join (on user+bucket); a naive inequality-only condition degrades to
    BroadcastNestedLoopJoin, which is quadratic per user at scale."""
    plan = _plan(spark, sf_dir, "join-interval-overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the overlap predicates survive as join residuals, not a post-join
    # filter over an exploded cross product
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_rag_index_candidate_join_is_equi_on_cell(spark, sf_dir):
    """IVF routing must join candidates to queries equi-keyed on cent_id;
    only the 16-centroid assignment may be a (broadcast) cross join."""
    plan = _plan(spark, sf_dir, "pipeline-rag-index")
    assert "CartesianProduct" not in plan
    # only the two 16-row centroid broadcasts (corpus assignment + the
    # pre-filtered query assignment) may be nested-loop stages
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan


def test_bigram_perplexity_no_python_and_lm_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text-bigram-perplexity")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # bigram counts + context marginals come back as broadcasts, so the
    # token stream is never shuffled on the join key
    assert plan.count("BroadcastHashJoin") >= 2


def test_unigram_lm_table_is_bounded(spark, sf_dir):
    """VERDICT r4 #1: the unigram-LM table broadcast back onto the token
    stream must be a BOUNDED artifact (top-K + OOV bucket), never the full
    raw vocabulary — by Heaps' law a 100 TB corpus has billions of
    distinct raw tokens and an unbounded broadcast OOMs the driver. Three
    assertions: (a) the physical plan selects the top-K via sort+limit
    (TakeOrderedAndProject — distributed top-K, no global vocab sort),
    (b) the LM table joins back as a broadcast, (c) at runtime the table
    has <= K+0 rows even though the corpus vocab exceeds K."""
    from ai_knowledge_etl_spark import config
    from ai_knowledge_etl_spark.operators import lm

    plan = _plan(spark, sf_dir, "udf-unigram-logprob")
    assert "TakeOrderedAndProject" in plan, "top-K cap not in the plan"
    assert "BroadcastHashJoin" in plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    n_types = toks.select("w").distinct().count()
    assert n_types > config.UNIGRAM_VOCAB_TOPK, (
        "fixture vocab no longer exceeds the cap — the OOV path would go "
        "untested; lower UNIGRAM_VOCAB_TOPK or enrich the corpus"
    )
    assert lm.capped_lm_table(toks).count() == config.UNIGRAM_VOCAB_TOPK

    # The composed 100 TB entry pipeline must use the same bounded form.
    wplan = _plan(spark, sf_dir, "pipeline-warc-corpus")
    assert "TakeOrderedAndProject" in wplan


def _zipf_crawl_corpus(spark, n_links: int):
    """Crawl-links corpus with the pathological domain tail docs/SCALE.md
    names: ONE domain holds ~30% of all pages, the rest spread over ~997
    Zipf-ish domains. Shaped like the frontier/visited tables of the
    crawl suite (link url + domain key joining a per-domain dim)."""
    links = spark.range(n_links).select(
        F.col("id").alias("link_id"),
        F.when(F.col("id") % 10 < 3, F.lit("hot.example.com"))
        .otherwise(
            F.concat(
                F.lit("d"),
                F.pmod(F.hash(F.col("id")), F.lit(997)).cast("string"),
                F.lit(".example.com"),
            )
        )
        .alias("domain"),
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias(
            "url"
        ),
    )
    # Independent per-domain dim (crawl policy): built from its own range,
    # NOT derived from the links frame — deriving it re-plans the links
    # scan under the dim and AQE then declines to split the skewed
    # partition (measured); an independent dim is also what a real
    # crawl-policy table is.
    dim = spark.range(0, 998).select(
        F.when(F.col("id") == 997, F.lit("hot.example.com"))
        .otherwise(
            F.concat(F.lit("d"), F.col("id").cast("string"),
                     F.lit(".example.com"))
        )
        .alias("domain"),
        (F.col("id") % 7).cast("long").alias("crawl_delay"),
    )
    return links, dim


def test_zipf_domain_skew_aqe_split_fires_on_crawl_join(spark, sf_dir):
    """VERDICT r4 #8(a): on a crawl corpus where one domain holds ~30% of
    pages, the UNSALTED domain-keyed join (the frontier-visited /
    links-per-domain-policy shape) must be rescued by AQE's skew split at
    runtime — proving the join shape stays sort-merge-splittable and the
    session confs enable the rescue. Thresholds lowered to fixture bytes;
    the trigger is byte-based and identical at 100 TB."""
    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        links, dim = _zipf_crawl_corpus(spark, 20_000)
        # multi-mapper input: AQE splits a skewed reduce partition into
        # ranges of MAP outputs, so single-mapper input has nothing to split
        links = links.repartition(8, "link_id")
        joined = links.hint("merge").join(dim.hint("merge"), "domain")
        # materialize THIS frame (not a derived count) — AQE rewrites the
        # plan at runtime, so the skew marker only appears on the executed
        # plan of the collected DataFrame
        assert len(joined.collect()) == 20_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the 30%-domain partition:\n" + plan[:2000]
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zipf_domain_salted_join_matches_plain_at_100x(spark, sf_dir):
    """VERDICT r4 #8(b): operators/partitioning.salted_join must return
    EXACTLY the plain join's rows on the Zipf crawl corpus at 100x the
    crawl fixture's link count (500 -> 50k) — the explicit remedy
    docs/SCALE.md promises for the one-domain-with-10^7-pages tail is
    only a remedy if it is result-identical."""
    from ai_knowledge_etl_spark.operators.partitioning import salted_join

    links, dim = _zipf_crawl_corpus(spark, 50_000)
    cols = ["link_id", "domain", "url", "crawl_delay"]
    plain = links.join(dim, "domain").select(*cols)
    salted = salted_join(links, dim, "domain", n_salts=8).select(*cols)
    assert salted.count() == plain.count() == 50_000
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()
