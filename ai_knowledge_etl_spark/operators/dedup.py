"""Deduplication operators (north-star: BASELINE.json l.6).

Four tiers, all built from Catalyst primitives so every one is
oracle-checkable and shuffle-planned by AQE:

  - exact:      md5 over normalized text → groupBy fingerprint
  - n-gram Jaccard: word-3-gram shingles → distinct-explode → self-join on
                (source, shingle) → |∩| / (|A|+|B|-|∩|)
  - MinHash-LSH: k seeded min-md5 signatures → banded bucket join →
                candidate pairs (classic shingle→minhash→band→bucket-join)
  - SimHash:    per-bit ±1 vote over shingle md5 nibbles → 16-bit signature

Scale notes (100 TB): the shingle explode multiplies rows ~60×, but shuffles
only on (source, shingle) / (band, band_val) — bounded-width keys with good
distribution. The self-join never goes all-pairs: candidates are co-bucketed
first (the whole point of LSH). md5 is used instead of murmur `hash()`
because its output is engine-portable (the differential oracle must compute
identical signatures); swap in xxhash64 for raw speed when oracle parity
isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.session import track_persist


def normalize_text(text: Column | str) -> Column:
    """Whitespace-collapsed, lowercased, trimmed — the canonical dedup form."""
    t = F.col(text) if isinstance(text, str) else text
    return F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))


def fingerprint(text: Column | str) -> Column:
    return F.md5(normalize_text(text))


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: groups sharing a fingerprint, with the
    sorted member list and the kept representative (min id)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.concat_ws(
                ",", F.transform(F.sort_array(F.collect_list(id_col)), lambda x: x.cast("string"))
            ).alias("member_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct word n-gram shingles per doc (1 row → ~|words| rows).
    `keep` carries blocking columns (e.g. source) through the explode.

    The split is hoisted to a projected column FIRST: referencing
    `split(text)` inside the transform lambda would re-split the whole text
    once per shingle — O(|words|²) per document.

    Distinctness is PER-ROW (`array_distinct` before the explode), not a
    DataFrame `.distinct()`: the id is part of the key either way, so the
    result is identical, but the per-row form needs no shuffle — the old
    shape hash-exchanged the entire corpus-sized shingle stream just to
    dedup within documents (round-6 fusion of the warc-corpus carry)."""
    words = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.split(F.col(text_col), " ").alias("__words"),
    )
    # per-position try_element_at instead of slice(): the slice form
    # allocates an n-element array per window; direct element access is
    # ~30% faster on the corpus fold (round-8 A/B, identical rows —
    # try_element_at past the end is null and concat_ws skips nulls,
    # exactly slice's short-tail behavior)
    cells = ", ".join(
        f"try_element_at(__words, i + {j})" for j in range(n)
    )
    sh = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(__words) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', {cells})))"
    )
    return words.select(
        F.col(id_col), *[F.col(c) for c in keep], F.explode(sh).alias("shingle")
    )


def cap_shingle_df(
    sh: DataFrame,
    id_col: str,
    max_df: int,
    group_col: str | None = None,
) -> DataFrame:
    """Hot-shingle hygiene (VERDICT r1 #6): drop shingles whose document
    frequency exceeds `max_df` before any pairwise stage. A shingle shared
    by d documents fans a blocked equi-join out to ~d² candidate rows — a
    boilerplate phrase shared by millions of docs would dominate the whole
    shuffle. Capping df bounds the worst single-key fanout at max_df² while
    keeping discriminative shingles (df is computed per block when
    `group_col` is given, matching the blocked join's key).

    Dropping near-ubiquitous shingles is also the right SIGNAL call: a
    shingle in >max_df docs separates nothing. The heavy-hitter set is
    broadcast for the anti-join — at most |instances|/max_df distinct
    shingles can exceed the cap, and real boilerplate is a handful."""
    keys = ["shingle"] + ([group_col] if group_col else [])
    hot = (
        sh.groupBy(*keys)
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") > max_df)
        .select(*keys)
    )
    return sh.join(F.broadcast(hot), keys, "left_anti")


def jaccard_pairs(
    sh: DataFrame, id_col: str, group_col: str | None, threshold: float
) -> DataFrame:
    """Pairwise n-gram Jaccard over a shingle table; `group_col` bounds the
    candidate space (same-source blocking) so the join never goes all-pairs.

    The shingle table feeds three subplans (both join sides + the size
    counts); Spark does not reuse the exchange across a self-join's sides,
    so persist it rather than exploding the corpus three times.
    (tracked: session.release_persisted() drops it at batch boundaries —
    per-call persists otherwise accumulate until ContextCleaner GC,
    r8 ADVICE)."""
    sh = track_persist(sh)
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    on = [F.col(f"a.shingle") == F.col(f"b.shingle")]
    if group_col:
        on.append(F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
    on.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = (
        a.join(b, on)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
                4,
            ),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def containment_pairs(
    sh: DataFrame,
    id_col: str,
    group_col: str | None,
    threshold_ppm: int = 800000,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment = |A∩B| / min(|A|,|B|) over the
    shingle table — catches a document CONTAINED in a longer one (quotes,
    excerpts, page-plus-boilerplate), which symmetric Jaccard misses
    because the union is dominated by the longer side. Same blocked
    equi-join + df-cap bounds as jaccard_pairs; the score is exact
    integer division in ppm (no float comparison in the gate)."""
    sh = track_persist(sh)
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    on = [F.col("a.shingle") == F.col("b.shingle")]
    if group_col:
        on.append(F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
    on.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = (
        a.join(b, on)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("inter"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "cont_ppm",
            F.expr("(1000000 * inter) div least(n_a, n_b)").cast("long"),
        )
    )
    return out.where(F.col("cont_ppm") >= threshold_ppm).select(
        "doc_a",
        "doc_b",
        "inter",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "cont_ppm",
    )


def minhash_signatures(
    sh: DataFrame, id_col: str, k: int = 8
) -> DataFrame:
    """k seeded MinHash signatures per doc: sig_j = min(md5(j || ':' || shingle)).
    Lexicographic min over md5 hex is engine-portable and uniform enough for
    banding.

    Computed as ONE wide aggregate (k min columns over the shingle stream,
    map-side partial combine) then unpivoted to the (id, seed, sig) long
    form — identical values to the old seed-explode shape, but the
    corpus-sized shingle stream is never inflated k× into materialized
    rows, and the only shuffle carries one k-column row per doc."""
    mins = [
        F.min(
            F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))
        ).alias(f"__s{j}")
        for j in range(k)
    ]
    wide = sh.groupBy(id_col).agg(*mins)
    stack = "stack(%d, %s) AS (seed, sig)" % (
        k,
        ", ".join(f"{j}, __s{j}" for j in range(k)),
    )
    return wide.select(F.col(id_col), F.expr(stack))


def minhash_candidates(
    sigs: DataFrame, id_col: str, k: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Band the k signatures (rows_per_band each) and bucket-join: docs
    sharing any full band become candidate near-duplicate pairs.

    Long-form (id, seed, sig) entry point, kept for composability with a
    stored signature table; when the caller holds the shingle stream,
    minhash_lsh_candidates fuses the signature aggregate and the banding
    into one pass and is the faster path."""
    n_bands = k // rows_per_band
    band_cols = []
    for band in range(n_bands):
        parts = [
            F.max(
                F.when(F.col("seed") == band * rows_per_band + j, F.col("sig"))
            )
            for j in range(rows_per_band)
        ]
        band_cols.append(F.concat(*parts).alias(f"band{band}"))
    banded = sigs.groupBy(id_col).agg(*band_cols)
    return _band_pairs(banded, id_col, n_bands)


def _band_pairs(
    banded: DataFrame, id_col: str, n_bands: int, distinct: bool = True
) -> DataFrame:
    """(doc_a, doc_b) candidates from a wide banded frame (one row per
    doc, band0..band{n-1} columns).

    ONE self-join on the composite (band, bv) key instead of one join
    per band: the old per-band loop ran n_bands separate joins + a
    union + the distinct — 3·n_bands stages where the band-tagged long
    form pays one explode (n_bands× a doc-count-sized frame, trivial)
    and a single equi-join whose key space is the union of all bands'
    buckets. Same pairs by construction (the band id rides in the key,
    so cross-band collisions can't pair). At 100 TB: one shuffle of
    n_bands·|docs| constant-width rows replaces n_bands shuffles of
    |docs| rows — same volume, a quarter of the stage/barrier count."""
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), F.col(f"band{b}").alias("bv")
            )
            for b in range(n_bands)
        ]
    )
    long = banded.select(
        F.col(id_col), F.explode(entries).alias("e")
    ).select(F.col(id_col), F.col("e.band").alias("band"), F.col("e.bv").alias("bv"))
    # scanned by both join sides — persist the doc-count-sized frame
    # instead of recomputing the whole shingle→md5→min pipeline twice
    # (tracked: released at batch boundaries, r8 ADVICE)
    long = track_persist(long)
    a = long.select(F.col(id_col).alias("doc_a"), "band", "bv")
    b = long.select(F.col(id_col).alias("doc_b"), "band", "bv")
    pairs = (
        a.join(b, ["band", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    # distinct=False skips the pair dedup shuffle for consumers that
    # only SET-consume the pairs (e.g. an anti-join on doc_b, where a
    # doc paired in two bands drops the same rows either way).
    return pairs.distinct() if distinct else pairs


def minhash_lsh_candidates(
    sh: DataFrame,
    id_col: str,
    k: int = 8,
    rows_per_band: int = 2,
    distinct: bool = True,
) -> DataFrame:
    """Shingles → candidate pairs in ONE aggregate pass: the k min-md5
    signatures AND the band concatenations are computed in a single
    groupBy over the shingle stream, skipping minhash_signatures' long
    (id, seed, sig) unpivot and minhash_candidates' re-widening groupBy —
    two doc-keyed shuffles and a corpus-stream round trip that existed
    only because of the API seam (round-7 verdict #1, the warc-corpus
    barrier cuts indicted the signature stage). Identical pairs to the
    two-step form: same seeds, same mins, same banding."""
    n_bands = k // rows_per_band
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(
            f"__s{j}"
        )
        for j in range(k)
    ]
    wide = sh.groupBy(id_col).agg(*mins)
    banded = wide.select(
        F.col(id_col),
        *[
            F.concat(
                *[
                    F.col(f"__s{band * rows_per_band + j}")
                    for j in range(rows_per_band)
                ]
            ).alias(f"band{band}")
            for band in range(n_bands)
        ],
    )
    return _band_pairs(banded, id_col, n_bands, distinct=distinct)


def simhash16(sh: DataFrame, id_col: str) -> DataFrame:
    """16-bit SimHash: bit i = sign of Σ_shingles (top bit of md5 nibble i
    ? +1 : -1). Returned as a 16-char '0'/'1' string (engine-portable —
    no 64-bit integer bit ops needed)."""
    hashed = sh.select(F.col(id_col), F.md5("shingle").alias("h"))
    # "top bit of nibble i set" == hex digit in 8..f == char >= '8'
    # (md5 emits lowercase hex, so the only chars are 0-9a-f and the
    # single binary comparison is exactly the old 8-way isin — measured
    # 1.31 -> 0.78 s at sf0.1: the isin compiled to 8 string compares
    # per bit x 16 bits = 128 per shingle; this is 16)
    votes = [
        F.sum(
            F.when(F.substring("h", i + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(16)]
    )
    return agg.select(F.col(id_col), bits.alias("simhash"))


def hash_shingles(sh: DataFrame, group_col: str | None = None) -> DataFrame:
    """Production-scale variant: collapse the shingle string (plus the
    blocking column, when given) to one xxhash64 int64. Halves-or-better
    the self-join shuffle width (8-byte key vs arbitrary-length text;
    measured 2.7s -> 1.2s for the sf0.1 intersect join). Collision odds
    at n shingles are ~n²/2⁶⁵ (≈1e-8 at 10⁶) — fine for production
    dedup, NOT used on the oracle-diffed path where any collision would
    break exact parity."""
    cols = ["shingle"] + ([group_col] if group_col else [])
    out = sh.withColumn("shingle", F.xxhash64(*cols))
    return out
