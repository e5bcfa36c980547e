"""Mergeable frequency / cardinality / membership sketches as DataFrame ops.

The three classic streaming sketches a 100 TB pipeline leans on, each built
from plain hash aggregates so Catalyst keeps them whole-stage-codegen'd and
every one MERGEABLE (per-partition / per-day sketch tables combine by a
further hash aggregate — no raw-data rescan):

- Count-min (Cormode & Muthukrishnan 2005): depth x width counter grid;
  point estimate = min over rows. Frequency estimates NEVER undercount.
- KMV / bottom-k (Bar-Yossef et al. 2002; the theta-sketch core): keep the
  k smallest hash values per set; (k-1)/kth_min estimates distinct count,
  and two sketches union/intersect WITHOUT touching raw data again.
- Bloom filter (Bloom 1970): j bit positions per key over an m-bit space;
  all-bits-present gates an expensive exact check down to candidates.

All hashing is the dialect-common md5-hex-slice idiom
(operators/curation.hashed_unigram_buckets): Spark computes
conv(substring(md5(x), a, n), 16, 10), DuckDB replays the identical value
with per-digit strpos arithmetic — so every estimate is exactly
reproducible cross-engine and the registry twins get full-value parity
(no bound-check weakening needed).

Reference analog: the reference keeps only an exact visited set
(scripts/crawler-queue.sh:36-41); these are the sub-linear-state versions
of the same membership/frequency questions at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MD5_DIGITS = "0123456789abcdef"


def md5_slice(col: Column, start: int, n_digits: int) -> Column:
    """Integer value of md5 hex digits [start, start+n_digits) — 1-based
    start, n_digits <= 15 so the value fits a BIGINT (60 bits)."""
    return F.conv(F.substring(F.md5(col), start, n_digits), 16, 10).cast(
        "long"
    )


def duck_md5_slice(expr: str, start: int, n_digits: int) -> str:
    """DuckDB replay of md5_slice: per-digit strpos arithmetic (the
    _BUCKET_SQL convention — DuckDB has no base-16 string conv)."""
    terms = [
        f"(strpos('{MD5_DIGITS}', substring(md5({expr}), {start + i}, 1)) - 1)"
        + (f" * {16 ** (n_digits - 1 - i)}" if i < n_digits - 1 else "")
        for i in range(n_digits)
    ]
    return "(" + " + ".join(terms) + ")"


# --- count-min ------------------------------------------------------------------


def cms_table(
    keyed_counts: DataFrame,
    key_col: str = "key",
    count_col: str = "cnt",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min counter grid (d, bucket, total) from per-key exact counts.

    Input is the (key, count) table — i.e. the normal word-count shuffle has
    already happened — so the grid build is one more hash aggregate over
    depth x distinct-keys rows down to depth x width. The grid is MERGEABLE:
    per-partition / per-day grids sum cell-wise (groupBy(d, bucket) again).
    Row-d hash = md5('d:' || key) sliced to 5 hex digits, mod width."""
    rows = keyed_counts.select(
        F.col(key_col).alias("key"),
        F.col(count_col).alias("cnt"),
        F.explode(
            F.array(*[F.lit(d) for d in range(depth)])
        ).alias("d"),
    ).select(
        "d",
        (
            md5_slice(
                F.concat(F.col("d").cast("string"), F.lit(":"), F.col("key")),
                1,
                5,
            )
            % width
        ).alias("bucket"),
        "cnt",
    )
    return rows.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("total")
    )


def cms_estimate(
    keys: DataFrame,
    grid: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key against the grid: min over the depth rows.
    The grid is depth x width rows — broadcast it; the probe side never
    shuffles."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).select(
        "key",
        "d",
        (
            md5_slice(
                F.concat(F.col("d").cast("string"), F.lit(":"), F.col("key")),
                1,
                5,
            )
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(grid), ["d", "bucket"])
        .groupBy("key")
        .agg(F.min("total").cast("long").alias("est"))
    )


def duck_cms_bucket(expr: str, d: int, width: int) -> str:
    """DuckDB replay of one CMS row-hash bucket for a string expression."""
    salted = "'" + str(d) + ":' || " + expr
    return f"({duck_md5_slice(salted, 1, 5)} % {width})"


# --- KMV / bottom-k -------------------------------------------------------------

KMV_MAX = 16 ** 12  # hash domain: first 12 hex digits of md5


def kmv_hashes(
    df: DataFrame, set_col: str, key_col: str
) -> DataFrame:
    """(set_id, h) distinct hash table — the input to every KMV stage.
    One hash aggregate; h is uniform on [0, KMV_MAX)."""
    return df.select(
        F.col(set_col).alias("set_id"),
        md5_slice(F.col(key_col).cast("string"), 1, 12).alias("h"),
    ).distinct()


def kmv_sketch(hashes: DataFrame, k: int = 64) -> DataFrame:
    """Bottom-k sketch per set: the k smallest hashes, ranked.

    Scale path: a per-set count (hash agg) derives a cutoff that keeps the
    ~5k smallest hashes — any hash below the cutoff is smaller than every
    hash above it, so WHEN >= k survive, the k smallest survivors ARE the k
    smallest overall — and only that sliver reaches the per-set ranking
    window (the agg-mad-outliers lesson: never window a full group).
    Sets with fewer than 5k distinct hashes keep everything (the sketch
    isn't full; estimates degrade to exact)."""
    counts = hashes.groupBy("set_id").agg(F.count("*").alias("n_h"))
    # integer cutoff: ceil(KMV_MAX * 5k / n). 16^12 * 5k overflows at
    # k=64 only past n ~ 2^63/2^48 — fine, but keep the multiply in
    # python-long space via lit arithmetic on DOUBLE then cast.
    # floor() explicitly: Spark's double->long cast truncates while
    # DuckDB's CAST rounds half-even — floor is the dialect-common form
    cutoff = F.least(
        F.lit(KMV_MAX),
        F.floor(F.lit(float(KMV_MAX)) * F.lit(5.0 * k) / F.col("n_h"))
        .cast("long") + 1,
    )
    surv = (
        hashes.join(F.broadcast(counts), "set_id")
        .where(F.col("h") < cutoff)
        .select("set_id", "h")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("set_id").orderBy(F.asc("h"))
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("set_id", "h", "rn")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate per set: (k-1) * MAX / kth_min when the
    sketch is full, else the sketch size (exact — everything was kept)."""
    agg = sketch.groupBy("set_id").agg(
        F.count("*").alias("n_in"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    return agg.select(
        "set_id",
        F.when(
            F.col("n_in") < k, F.col("n_in").cast("long")
        )
        .otherwise(
            F.floor(
                F.lit(float(k - 1)) * F.lit(float(KMV_MAX)) / F.col("kth")
            ).cast("long")
        )
        .alias("est_distinct"),
        "n_in",
    )


# --- bloom ----------------------------------------------------------------------


def bloom_positions(col: Column, m: int = 32768, j: int = 3) -> Column:
    """Array of j bit positions over an m-bit space for a key column:
    j disjoint 5-hex-digit slices of one md5 (j <= 6)."""
    return F.array(
        *[md5_slice(col, 1 + 5 * i, 5) % m for i in range(j)]
    )


def bloom_bits(
    keys: DataFrame, key_col: str, m: int = 32768, j: int = 3
) -> DataFrame:
    """The set-bit table (<= m rows) for a key set — the broadcastable,
    mergeable (plain DISTINCT union) bloom bitmap."""
    return (
        keys.select(
            F.explode(bloom_positions(F.col(key_col), m, j)).alias("bit")
        )
        .distinct()
    )


def bloom_candidates(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    id_col: str,
    m: int = 32768,
    j: int = 3,
) -> DataFrame:
    """Per probe row: bloom_hit = all j bits present (broadcast join against
    the bit table; never a shuffle of the probe side). No false negatives by
    construction; false positives are the price of the m-bit state bound."""
    pos = probes.select(
        id_col,
        F.posexplode(bloom_positions(F.col(key_col), m, j)).alias(
            "i", "bit"
        ),
    )
    hits = (
        pos.join(F.broadcast(bits), "bit")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        probes.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            (F.coalesce(F.col("n_hit"), F.lit(0)) == j).alias("bloom_hit"),
        )
    )


def duck_bloom_positions(expr: str, m: int = 32768, j: int = 3) -> str:
    """DuckDB array literal replaying bloom_positions for a string expr."""
    slices = ", ".join(
        f"{duck_md5_slice(expr, 1 + 5 * i, 5)} % {m}" for i in range(j)
    )
    return f"[{slices}]"


# --- bottom-k uniform row sample ------------------------------------------------


def bottomk_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    keep: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """Per-group uniform row sample of size <= k, MERGEABLE and
    deterministic: rank rows by md5(id) — a fixed random permutation
    independent of any value column — and keep the k smallest ranks.

    Mergeability is the point: the bottom-k of a union is the bottom-k
    of the concatenated bottom-k's (re-ranked), so per-shard / per-day
    samples combine into an exact bottom-k sample of the whole without
    rescanning rows — the sample twin of the KMV sketch, usable for
    quantiles, previews, and sanity checks over any date range.

    Scale path is kmv_sketch's: an exact per-group count derives a hash
    cutoff keeping ~5k rows, so the ranking window never sees the full
    group. Groups smaller than k keep every row (estimates degrade to
    exact)."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col).alias("grp"),
        *[F.col(c) for c in keep],
        md5_slice(F.col(id_col).cast("string"), 1, 12).alias("h"),
    )
    counts = hashed.groupBy("grp").agg(F.count("*").alias("n_rows"))
    cutoff = F.least(
        F.lit(KMV_MAX),
        F.floor(F.lit(float(KMV_MAX)) * F.lit(5.0 * k) / F.col("n_rows"))
        .cast("long") + 1,
    )
    surv = (
        hashed.join(F.broadcast(counts), "grp")
        .where(F.col("h") < cutoff)
        .select("grp", *keep, "h")
    )
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("grp", *keep, "h", "rn")
    )
