"""The user-facing extract pipeline — the engine's equivalent of the
reference's `/knowledge-etl:extract <source> [--with-depth=N] [--topic=RE]
[--max-pages=N] [--pipe=FORMAT]` entry point (reference:
commands/extract.md:14-42, README.md:71-83).

One call composes the whole engine as a lazy DataFrame graph:

    result = extract(spark, urls_df, topic="(spark|join)",
                     fetcher=my_fetcher, with_depth=2, pipe="rag")

    result.pages      # scored, obstacle-classified page docs
    result.index      # INDEX stats + per-source lines
    result.report     # top-k report rows
    result.output     # the --pipe formatted records (rag/json/docs/...)

Lifecycle (SURVEY §3.1/§3.2): route → frontier loop (when with_depth>0) →
politeness-paced fetch → boilerplate strip → obstacle classify → score →
dedup → chunk → summarize → INDEX/REPORT → pipe transform. Everything stays
a DataFrame until the caller sinks it.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.functions import scoring, text as TX, urls as U
from ai_knowledge_etl_spark.operators import chunking, dedup, lm, sinks, topk
from ai_knowledge_etl_spark.session import eager_cut, track_persist
from ai_knowledge_etl_spark.sources import web


# Stage-clock hook for barrier-cut probes (tools/bench_warc_cut.py):
# when a probe sets this to a list, curate_warc_corpus appends
# (stage, wall_time) after each eager checkpoint materializes, so the
# composed wall can be attributed to measured stage work without
# duplicating the pipeline in the probe (the drift risk the mad-cut
# probe accepted). None (the default) is zero-cost.
_STAGE_CLOCK: list[tuple[str, float]] | None = None


def _mark(stage: str) -> None:
    if _STAGE_CLOCK is not None:
        import time

        _STAGE_CLOCK.append((stage, time.time()))


@dataclass
class ExtractResult:
    pages: DataFrame  # url, text, error, obstacle, relevance, stars, doc
    index: DataFrame  # per-source INDEX lines
    report: DataFrame  # top-k pages
    chunks: DataFrame  # RAG chunks (doc ref + chunk_idx + chunk)
    output: DataFrame | None  # --pipe formatted records
    ir_stats: "Observation | None" = None  # filled after any pages action


def extract(
    spark: SparkSession,
    urls: DataFrame,
    topic: str,
    fetcher: Callable[[str], str],
    max_pages: int = config.MAX_PAGES_DEFAULT,
    pipe: str | None = None,
    interval_s: float = config.REQUEST_INTERVAL_SECONDS,
    top_k: int = 10,
) -> ExtractResult:
    """Single-wave extract over a frontier of URLs (`urls` has a `url`
    column). For crawling, feed each wave's discovered links back through
    `streaming.frontier` and call this per wave — the loop composes from
    the same pieces (see tests/test_pipeline.py)."""
    capped = topk.top_k(urls.select("url"), max_pages, F.asc("url"))

    fetched = web.fetch_pipeline(capped, fetcher, interval_s=interval_s)

    scored = fetched.withColumn(
        "relevance",
        scoring.score_page(
            TX.title_of(F.coalesce(F.col("text"), F.lit("")), 60),
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 200),
            F.coalesce(F.col("text"), F.lit("")),
            topic,
        ),
    ).withColumn("stars", scoring.stars("relevance"))

    # dedup: at-most-once per content fingerprint (crawler-queue.sh:36-41)
    deduped = (
        scored.withColumn(
            "fp", dedup.fingerprint(F.coalesce(F.col("text"), F.col("url")))
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy(F.asc("url"))
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )

    # IR run stats observed for free on the pages pass (reference:
    # DESIGN.md:1092-1099 — totalChars / filesProcessed / errors). An
    # Observation rides the existing scan: zero extra jobs, metrics appear
    # after the first action on `pages` via result.ir_stats.get.
    from pyspark.sql import Observation

    ir_obs = Observation("ir_stats")
    pages = deduped.observe(
        ir_obs,
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
            "total_chars"
        ),
    )

    # local paths have no domain — group them under 'local' so the INDEX
    # line is readable for directory/glob CLI sources
    src_col = F.when(U.domain("url") == "", F.lit("local")).otherwise(
        U.domain("url")
    )
    index = (
        pages.groupBy(src_col.alias("source"))
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("chars"),
            F.sum(F.when(F.col("relevance") >= 8, 1).otherwise(0)).alias(
                "high_pages"
            ),
        )
        .select(
            "source",
            F.concat(
                F.lit("- ["), F.col("source"),
                F.lit("] pages="), F.col("pages").cast("string"),
                F.lit(" chars="), F.col("chars").cast("string"),
                F.lit(" high="), F.col("high_pages").cast("string"),
            ).alias("line"),
        )
    )

    report = topk.top_k(
        pages.select("url", "relevance", "stars"),
        top_k,
        F.desc("relevance"),
        F.asc("url"),
    )

    chunks = chunking.rag_chunks_smart(
        pages.where(F.col("text").isNotNull()).select(
            F.col("url").alias("doc_ref"), "text"
        ),
        "doc_ref",
        "text",
    )

    output: DataFrame | None = None
    if pipe == "rag":
        output = chunks.select(
            F.concat_ws("_", "doc_ref", F.col("chunk_idx").cast("string")).alias(
                "id"
            ),
            F.col("chunk").alias("content"),
            F.concat(
                F.lit('{"source":"'), F.col("doc_ref"),
                F.lit('","section":'), F.col("chunk_idx").cast("string"),
                F.lit("}"),
            ).alias("metadata"),
        )
    elif pipe == "json":
        output = pages.select(
            F.concat(
                F.lit('{"url":"'), F.col("url"),
                F.lit('","relevance":'), F.col("relevance").cast("string"),
                F.lit(',"obstacle":"'), F.col("obstacle"), F.lit('"}'),
            ).alias("record")
        )
    elif pipe == "docs":
        output = sinks.pipe_docs(index, "INDEX")
    elif pipe == "skill":
        # SKILL.md-shaped doc per source (registry twin: sink-pipe-skill,
        # reference: output-transformer.md:140-370)
        nl = F.lit("\n")
        output = (
            pages.groupBy(src_col.alias("source"))
            .agg(
                F.concat(
                    F.lit("---"), nl,
                    F.lit("name: knowledge-"), F.col("source"), nl,
                    F.lit("description: extracted corpus from "),
                    F.col("source"),
                    F.lit(" ("), F.count("*").cast("string"),
                    F.lit(" pages)"), nl,
                    F.lit("---"), nl,
                    F.lit("# knowledge-"), F.col("source"),
                ).alias("skill_doc")
            )
        )
    elif pipe == "plugin":
        # manifest JSON per source (registry twin: sink-pipe-plugin)
        output = (
            pages.groupBy(src_col.alias("source"))
            .agg(
                F.concat(
                    F.lit('{"name":"knowledge-'), F.col("source"),
                    F.lit('","pages":'), F.count("*").cast("string"),
                    F.lit(',"chars":'),
                    F.sum(
                        F.length(F.coalesce(F.col("text"), F.lit("")))
                    ).cast("string"),
                    F.lit("}"),
                ).alias("manifest")
            )
        )
    elif pipe == "prompt":
        # per-page prompt rendering (registry twin: sink-pipe-prompt)
        nl = F.lit("\n")
        output = pages.where(F.col("text").isNotNull()).select(
            "url",
            F.concat(
                F.lit("You are given document "), F.col("url"),
                F.lit(" from "), src_col, F.lit("."), nl,
                F.substring("text", 1, 200), nl,
                F.lit("Summarize the key points."),
            ).alias("prompt"),
        )
    elif pipe is not None:
        raise ValueError(f"unknown pipe format {pipe!r}")

    return ExtractResult(
        pages=pages,
        index=index,
        report=report,
        chunks=chunks,
        output=output,
        ir_stats=ir_obs,
    )


def prepare_training_set(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_chars: int = 80,
    jaccard_threshold: float = 0.6,
    context_budget: int = 512,
    use_hashed_shingles: bool = True,
) -> DataFrame:
    """User-facing training-data pipeline over an extracted corpus — the
    downstream half the reference leaves to its consumers, as ONE lazy
    DataFrame graph:

      quarantine → PII redaction → transitive near-dup clustering
      (exact-first: fingerprint groups collapse to a representative
      before any shingling; df-capped Jaccard edges between
      representatives + exact star edges → connected components; keep
      cluster canonicals only) → deterministic train/val/test split
      → concat-and-chunk context-window packing

    Returns one row per SURVIVING document with `split`, `first_window`/
    `last_window`/`n_windows` (per split-stream packing), and the
    redacted text. Every stage is the registry-tested operator; this
    function is just the composition.

    `use_hashed_shingles` (default) collapses shingles to xxhash64 int64
    keys — the production shuffle-width optimization; the registered
    differential twin passes False to stay on the md5-string path the
    oracle can replay (a hash collision would break exact parity).
    """
    from ai_knowledge_etl_spark.operators import (
        clustering,
        packing,
        sampling,
    )

    # 1. quarantine: drop rows that would poison downstream stages
    clean = docs.where(
        F.col(text_col).isNotNull() & (F.length(text_col) >= min_chars)
    )
    # 2. redact PII before anything persists derived text
    clean = clean.withColumn(text_col, TX.redact_pii(text_col))
    # `clean` feeds THREE subplans (the fingerprint pass, the shingle
    # stage via the reps semi-join, and the final keep/split/pack chain)
    # — lazily each one replays the corpus scan + the 3-regex redaction
    # chain. persist(), not localCheckpoint(): the CC stage's eager edge
    # checkpoint already acts as the construction barrier, and an extra
    # eager materialization of the text-heavy frame measured WORSE at
    # sf0.1 (A/B r12: eager-chkpt min 5.83 s vs current 3.56 s in the
    # same window) while the lazy persist wins (interleaved min-of-6:
    # 6.78 -> 5.23 s min, 7.83 -> 6.18 s med, rows identical; tracked so
    # batch drivers release it at pass boundaries).
    clean = track_persist(clean)

    # 3. transitive near-dup clustering. Exact-first sequencing (the
    # round-3 100x sweep lesson): byte-identical copies would put their
    # whole group on every shingle key — at or under the df cap that
    # fans the blocked self-join out to |group|^2 — so the Jaccard stage
    # sees ONE representative per exact-fingerprint group and the exact
    # star edges carry the rest; clusters are identical by closure.
    fps = clean.select(id_col, dedup.fingerprint(text_col).alias("fp"))
    wfp = Window.partitionBy("fp")
    exact_e = (
        fps.withColumn("a", F.min(id_col).over(wfp))
        .where(F.col("a") != F.col(id_col))
        .select("a", F.col(id_col).alias("b"))
    )
    reps = fps.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    sh = dedup.shingles(
        clean.join(reps, id_col, "left_semi"),
        id_col,
        text_col,
        n=3,
        keep=(group_col,),
    )
    sh = dedup.cap_shingle_df(
        sh, id_col, config.DEDUP_SHINGLE_MAX_DF, group_col
    )
    if use_hashed_shingles:
        sh = dedup.hash_shingles(sh, group_col=group_col)
    jac = dedup.jaccard_pairs(
        sh,
        id_col,
        group_col,
        threshold=jaccard_threshold,
    ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    clusters = clustering.canonical_clusters(exact_e.unionByName(jac))
    drop = clusters.where(~F.col("is_canonical")).select(
        F.col("doc_id").alias(id_col)
    )
    kept = clean.join(drop, id_col, "left_anti")

    # 4. deterministic split, stable under appends/reruns
    split = sampling.train_val_test(kept, id_col)

    # 5. pack each (split, group) stream into context windows. The stream
    # key deliberately includes the group column: packing per split alone
    # would put ~1/3 of the corpus into ONE unsplittable window sort (the
    # agg-mad-outliers lesson — window partitions on a 3-value key don't
    # scale), while (split, source) streams stay narrow and independent —
    # each is a training shard.
    with_tok = split.withColumn(
        "n_tok", F.size(F.split(text_col, " ")).cast("long")
    ).withColumn(
        "stream", F.concat_ws("/", "split", group_col)
    )
    packed = packing.concat_chunk_pack(
        with_tok,
        order_col=id_col,
        tok_col="n_tok",
        budget=context_budget,
        partition_col="stream",
    )
    return packed.drop("stream")


def curate_corpus(
    pdocs: DataFrame,
    lang_lookup: DataFrame,
    target_pred: str = "lang = 'en'",
    min_norm_chars: int = 80,
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "ptext",
) -> DataFrame:
    """Corpus-curation pipeline as ONE lazy DataFrame graph — the standard
    pretraining-data recipe assembled from this engine's oracled operators:

      paragraph dedup (strip cross-document boilerplate)
      → normalization (lowercase / punct-strip / whitespace-collapse)
      → length gate on the normalized text
      → DSIR importance scoring vs the target slice
      → deterministic top-N selection

    `pdocs` carries (id, text); `lang_lookup` carries (id, lang) for the
    target predicate. Returns (id, n_kept, n_toks, score_millinats), the
    top_n highest-importance surviving docs. Registered with a fully
    composed DuckDB oracle as `pipeline-curate-corpus`.

    Scale: every stage is the already-audited operator — fingerprint-keyed
    dedup window, codegen'd normalizer, one tokenize pass with a 4096-row
    broadcast weight dim, TakeOrderedAndProject for the final cut.
    """
    from ai_knowledge_etl_spark.operators import curation as CU

    deduped = CU.paragraph_dedup(pdocs, id_col, text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text_kept")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    normalized = deduped.select(
        id_col, "n_kept", norm.alias("norm")
    ).where(F.length("norm") >= min_norm_chars)
    # The warc-pipeline checkpoint discipline applies here too: `flagged`
    # feeds DSIR's two tokenize passes plus the final projection join,
    # and each replay re-runs paragraph dedup (the fingerprint window
    # chain — the pipeline's dominant stage) from the source. One
    # dedup-output-sized cut replaces three replays (round-8 A/B at
    # sf0.1: 1.53 → 0.95 s warm).
    flagged = eager_cut(
        normalized.join(lang_lookup, id_col)
        .withColumn("is_target", F.expr(target_pred))
    )
    scored = CU.importance_scores(
        flagged.select(id_col, "n_kept", "is_target", "norm"),
        "is_target",
        id_col=id_col,
        text_col="norm",
    )
    out = scored.join(
        flagged.select(id_col, "n_kept"), id_col
    ).select(id_col, "n_kept", "n_toks", "score_millinats")
    return topk.top_k(
        out, top_n, F.desc("score_millinats"), F.asc(id_col)
    )


def curate_warc_corpus(
    warc_files: DataFrame,
    uri_lookup: DataFrame,
    target_pred: str = "lang = 'en'",
    lp_min: float = -3.1,
    min_norm_chars: int = 40,
    top_n: int = 100,
) -> DataFrame:
    """The Common-Crawl entry pipeline END-TO-END as one lazy plan — the
    first thing a training-data user runs against 100 TB of WARC:

      scan-warc (full-text records, resync past corruption)
      → Gopher repetition gates (dup-3-gram fraction + top-word occupancy)
      → unigram-logprob quality gate (corpus-self-trained LM score)
      → corpus-wide paragraph dedup (strip exact boilerplate)
      → MinHash-LSH near-dup removal (df-capped shingles, 8 sigs,
        4 bands of 2; the LOWEST doc id of each candidate pair survives)
      → DSIR importance scoring vs the target slice → deterministic top-N

    `warc_files` carries (file_id, content binary); `uri_lookup` maps
    uri → (doc_id, lang, source). Returns (doc_id, n_kept, n_toks,
    avg_logprob, score_millinats): the top_n highest-importance
    survivors. Registered with a fully composed DuckDB oracle as
    `pipeline-warc-corpus`.

    Scale: the WARC parse is Arrow-batched mapInPandas (1 file → N
    records); every gate is a hash-agg or broadcast join; paragraph
    dedup is the min-struct aggregate; the pair stage is banded LSH
    (never all-pairs) with the hot-shingle df cap; the DSIR weight table
    is a 4096-row broadcast. Token splits use the raw ' ' delimiter
    throughout (newline-glued tokens are deterministic and mirrored in
    the oracle)."""
    from ai_knowledge_etl_spark import config as cfg
    from ai_knowledge_etl_spark.operators import curation as CU
    from ai_knowledge_etl_spark.sources import warc

    # Cut here: `parsed` feeds its downstream consumers (the gated LM
    # token stream and the quality join), and without a cut each one
    # re-runs the Python WARC byte parse — the pipeline's most expensive
    # per-byte stage at 100 TB. The Gopher gate metrics ride INSIDE this
    # checkpoint (round-5 verdict #4): both are pure per-row array
    # expressions over ONE tokenization (operators/curation.
    # gopher_metrics — the top-word count is the max equal-run in the
    # sorted words array), evaluated exactly once per record at
    # materialization and stored as four ints. The old shape paid a
    # token explode, a (doc, word) hash agg, a per-doc re-agg, and two
    # joins back — four extra full-corpus shuffle stages; computing the
    # fold outside the cut would instead replay it in every consumer's
    # lineage (measured: +1.5 s at sf0.1).
    _mark("start")
    parsed = eager_cut(
        CU.gopher_metrics(
            warc.scan_warc_text(warc_files)
            .join(uri_lookup, "uri")
            .withColumn("ws", F.split("text", " "))
        )
        .drop("ws")  # the array would bloat the checkpoint; split is cheap
    )
    _mark("parsed")

    # Gopher repetition gates (registry twin: filter-repetition-gopher):
    # a plain WHERE over the materialized metric ints — no joins.
    gated = parsed.where(
        (1.0 - F.col("d3").cast("double") / F.col("t3")
         <= cfg.GOPHER_DUP3_MAX)
        & (F.col("mx").cast("double") / F.col("n_tokens")
           <= cfg.GOPHER_TOPWORD_MAX)
    ).drop("t3", "d3", "n_tokens", "mx")

    # unigram-logprob gate, self-trained on the gate survivors under the
    # CAPPED vocabulary (operators/lm): the broadcast LM table is top-K
    # tokens + one OOV residual bucket — <= K+1 rows at any corpus size,
    # never the full raw vocab (which is billions of types at 100 TB).
    toks = gated.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    lp = (
        lm.avg_logprob(toks)
        .select("doc_id", "avg_logprob")
        .where(F.col("avg_logprob") >= lp_min)
    )
    # Persisted: `qual` feeds three consumers (paragraph dedup, the
    # shingle stage's source join — via an 8-way banded self-join — and
    # the final flag join); without the persist every band join re-runs
    # the WARC parse + both quality gates (the jaccard_pairs persist
    # rationale, measured: the composed plan goes from minutes-hung to
    # seconds with these three cuts).
    qual = eager_cut(gated.join(lp, "doc_id"))
    _mark("qual")

    # corpus-wide paragraph dedup on the quality survivors. The per-doc
    # constants (source for shingle blocking; lang/avg_logprob for the
    # DSIR flag stage) ride the dedup's keep channel instead of joining
    # back by doc id afterwards: at 100 TB those two join-backs are
    # corpus-wide sort-merges (qual is not broadcastable at scale),
    # where the keeps only widen the paragraph explode by ~30 bytes/row
    # (r9; the winners aggregate's fp-keyed shuffle is unaffected —
    # paragraph_dedup projects the keeps off that side).
    dd = eager_cut(CU.paragraph_dedup(
        qual.select(
            "doc_id",
            F.col("text").alias("ptext"),
            "source",
            "lang",
            "avg_logprob",
        ),
        keep=("source", "lang", "avg_logprob"),
    ))
    _mark("dd")

    # MinHash-LSH near-dup removal over the deduped text. The shingle
    # stream is persisted (the jaccard_pairs discipline): the df-cap's
    # hot-key aggregate and the capped stream feeding the signature
    # aggregate would otherwise each replay the per-row shingle fold —
    # the LSH stage's dominant compute — from the dd checkpoint.
    sh = dedup.shingles(
        dd,
        "doc_id",
        "text_kept",
        n=3,
        keep=("source",),
    )
    shc = dedup.cap_shingle_df(
        sh, "doc_id", cfg.DEDUP_SHINGLE_MAX_DF, "source"
    )
    # One fused aggregate takes shingles → banded signatures → the single
    # (band, bv) bucket join (dedup.minhash_lsh_candidates); the long-form
    # signature checkpoint this replaced bought nothing — the banded frame
    # is persisted inside and is the only consumer of the shingle chain.
    _mark("sigs")
    cands = dedup.minhash_lsh_candidates(
        shc, "doc_id", k=8, rows_per_band=2, distinct=False
    )
    # no pair-level or doc_b-level distinct: the anti-join consumes the
    # duplicate-set membership, which repeated (doc_a, doc_b) rows do not
    # change — two dedup shuffles skipped (round-8 warc-cut trim)
    dupes = cands.select(F.col("doc_b").alias("doc_id"))
    kept = dd.join(dupes, "doc_id", "left_anti")

    # DSIR importance scoring vs the target slice, then deterministic top-N
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text_kept")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    normalized = kept.select(
        "doc_id", "n_kept", "lang", "avg_logprob", norm.alias("norm")
    ).where(F.length("norm") >= min_norm_chars)
    # persisted: the DSIR stage tokenizes `flagged` three times (target
    # and corpus distributions + the scoring join) and the final project
    # joins it again — without the cut each pass re-runs the LSH anti-join
    # and everything above it (measured 94 s → seconds at sf0.001).
    # lang/avg_logprob arrive on the dedup keep channel — no qual join.
    flagged = eager_cut(
        normalized.withColumn("is_target", F.expr(target_pred))
    )
    _mark("flagged")
    scored = CU.importance_scores(
        flagged.select("doc_id", "is_target", "norm"),
        "is_target",
        text_col="norm",
    )
    out = scored.join(
        flagged.select("doc_id", "n_kept", "avg_logprob"), "doc_id"
    ).select("doc_id", "n_kept", "n_toks", "avg_logprob", "score_millinats")
    return topk.top_k(
        out, top_n, F.desc("score_millinats"), F.asc("doc_id")
    )


def crawl(
    spark: SparkSession,
    seeds: DataFrame,
    fetcher: Callable[[str], str],
    topic_re: str,
    max_depth: int = 2,
) -> DataFrame:
    """Multi-wave BFS crawl — the reference's flagship stateful loop
    (commands/extract.md:761-831) through the REAL single-page pipeline:
    each wave fetches the frontier via `web.fetch_pipeline` (security
    route → politeness → retry → strip → obstacle), extracts markdown
    links from the fetched text, scores them (`scoring.score_link`),
    keeps score ≥ SKIP_THRESHOLD, anti-joins the visited set, and
    enqueues the survivors as the next wave. Returns (url, depth) for
    every discovered page at its first-discovery (= minimum) depth.

    State discipline: the visited set is localCheckpoint'ed per wave —
    lineage stays O(1) deep across iterations (the clustering-loop rule),
    and each wave's fetch is a fresh bounded job — and wave N-1's
    checkpointed RDD is RELEASED once wave N's checkpoint exists (also
    the clustering-loop rule: localCheckpoint pins its blocks until GC,
    so a long crawl would otherwise hold every superseded visited table
    in storage — the 50-wave longevity test in tests/test_scale_slice.py
    pins both the flat wave-time slope and the O(1) pinned-RDD count).
    At scale the frontier is naturally partitioned by domain inside
    fetch_pipeline; the anti-join is the only cross-wave shuffle.
    """
    from ai_knowledge_etl_spark.operators.clustering import (
        _checkpointed_rdd_id,
        _release_rdds,
    )
    from ai_knowledge_etl_spark.sources import synthetic as syn

    frontier = seeds.select("url").distinct().withColumn("depth", F.lit(0))
    visited = frontier.localCheckpoint(eager=True)
    pat = F.lit(syn.MD_LINK_RE)
    for depth in range(1, max_depth + 1):
        to_fetch = visited.where(F.col("depth") == depth - 1).select("url")
        fetched = web.fetch_pipeline(
            to_fetch, fetcher, interval_s=0.0, n_domain_partitions=8
        )
        links = (
            fetched.where(F.col("text").isNotNull())
            .select(
                F.explode(
                    F.arrays_zip(
                        F.regexp_extract_all("text", pat, 1).alias("anchor"),
                        F.regexp_extract_all("text", pat, 2).alias("link"),
                    )
                ).alias("z")
            )
            .select(
                F.col("z.anchor").alias("anchor"), F.col("z.link").alias("url")
            )
        )
        scored = links.withColumn(
            "score",
            scoring.score_link(F.col("url"), F.col("anchor"), F.lit(""), topic_re),
        )
        cand = (
            scored.where(F.col("score") >= config.SKIP_THRESHOLD)
            .select("url")
            .distinct()
        )
        new = cand.join(visited.select("url"), "url", "left_anti").withColumn(
            "depth", F.lit(depth)
        )
        prev_id = _checkpointed_rdd_id(visited)
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        # the new checkpoint fully contains the old one — release wave
        # N-1's pinned blocks or max_depth superseded visited tables
        # accumulate in executor storage over a long crawl
        _release_rdds(spark.sparkContext, {prev_id})
        _mark(f"wave{depth}")  # probe hook: per-wave wall for slope tests
    return visited
