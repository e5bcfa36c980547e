"""Byte-pair-encoding tokenizer training, generalized to N merge rounds
(Sennrich et al. 2016, public; SURVEY §2.I training-data extension).

The production-BPE shape: count words FIRST, then run every merge round on
the VOCABULARY-sized (word, freq) table — corpus size never enters the
loop. Each round:

  1. count adjacent symbol pairs weighted by word frequency (hash
     aggregate over an exploded pair stream, map-side partial combine),
  2. pick the argmax pair (count desc, pair asc tiebreak) — a 1-row,
     bounded driver collect (the connected-components discipline:
     driver-side loop control, executor-side data),
  3. apply the merge as a literal leftmost-non-overlapping replace —
     a pure column expression, no join at all once the pair is known.

The symbol frame is localCheckpoint-ed every few rounds so the lazy plan
cannot grow a tail of N chained projections (the eager-cut lesson:
persist() does NOT truncate the plan tree). At 100 TB the checkpointed
frame is still |vocab| rows — tiny.

The first 3 rounds of this loop are differentially proven against a
chained-CTE DuckDB replay by `agg-bpe-merges`; the N-round form backs
`pipeline-tokenize-pack` (train → tokenize → pack, one composed oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.session import eager_cut

WORD_RE = "[^a-z]+"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → vocabulary-sized (w, wc) table, eagerly checkpointed (every
    merge round and the tokenize join reuse it; without the cut each lazy
    consumer would re-run the corpus explode)."""
    return eager_cut(
        docs.select(
            F.explode(F.split(F.lower(text_col), WORD_RE)).alias("w")
        )
        .where(F.length("w") > 1)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wc"))
    )


def to_symbols(words: DataFrame) -> DataFrame:
    """(w, wc) → (w, s, wc) where s is the space-separated character-symbol
    string with sentinel spaces at both ends."""
    return words.select(
        "w",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr(
                    "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                ),
                " ",
            ),
            F.lit(" "),
        ).alias("s"),
        "wc",
    )


def pair_counts(sym_df: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency."""
    # The single-symbol guard matters: Spark's sequence(1, 0) is the
    # DESCENDING [1, 0] (not empty), so a fully-merged word would index
    # past its 1-element array. DuckDB's generate_series(1, 0) is empty —
    # the CASE makes both engines emit zero pairs for such words.
    #
    # Split ONCE into a named array column: the previous form inlined
    # `split(trim(s), ' ')` at every element_at inside the transform
    # lambda, and Catalyst does not hoist the common subexpression out of
    # a higher-order function — each word paid O(len) re-splits of an
    # O(len) string per pair. Same values (one split of the same string);
    # measured on a 100k-word synthetic vocab: 0.44 -> 0.32 s per round
    # (min-of-5), and the cut compounds once per merge round.
    return (
        sym_df.select(F.split(F.trim("s"), " ").alias("a"), "wc")
        .select(
            F.expr(
                "CASE WHEN size(a) < 2 THEN array()"
                " ELSE transform(sequence(1, size(a) - 1),"
                " i -> element_at(a, i) || ':' ||"
                " element_at(a, i + 1)) END"
            ).alias("ps"),
            "wc",
        )
        .select(F.explode("ps").alias("p"), "wc")
        .groupBy("p")
        .agg(F.sum("wc").cast("long").alias("cnt"))
    )


def train_merges(
    syms: DataFrame, n_rounds: int, checkpoint_every: int = 4
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Driver-loop BPE training: N rounds of count → argmax-collect →
    literal replace. Returns ([(round, pair, cnt)], final symbol frame).

    The per-round collect is ONE row (the argmax pair) — bounded by
    construction, the loop-control exception to the no-driver-collect
    rule (same as the CC iteration's convergence check)."""
    merges: list[tuple[int, str, int]] = []
    cur = syms
    for rnd in range(1, n_rounds + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:  # degenerate vocabulary: every word is one symbol
            break
        p, cnt = top[0]["p"], int(top[0]["cnt"])
        merges.append((rnd, p, cnt))
        # expand-replace-collapse: double every delimiter first, so two
        # ADJACENT occurrences of the pair (which share one space in the
        # plain encoding — 'a b a b') each get their own boundary and both
        # merge in ONE pass. This is the classic run-merge semantics of
        # Sennrich BPE; a plain single-space replace needs a round per
        # repeat. replace() scans leftmost-non-overlapping identically in
        # Spark and DuckDB, so the oracle replays the same triple.
        pat = " " + p.replace(":", "  ") + " "
        rep = " " + p.replace(":", "") + " "
        cur = cur.select(
            "w",
            F.replace(
                F.replace(
                    F.replace(F.col("s"), F.lit(" "), F.lit("  ")),
                    F.lit(pat),
                    F.lit(rep),
                ),
                F.lit("  "),
                F.lit(" "),
            ).alias("s"),
            "wc",
        )
        if rnd % checkpoint_every == 0 and rnd < n_rounds:
            cur = cur.localCheckpoint()
    return merges, cur


def vocab_symbol_counts(final_syms: DataFrame) -> DataFrame:
    """(w, s, wc) → (w, n_sym): the learned tokenizer as a lookup table."""
    return final_syms.select(
        "w", F.size(F.split(F.trim("s"), " ")).cast("long").alias("n_sym")
    )


def tokenize_counts(
    docs: DataFrame, vocab: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", keep: tuple[str, ...] = (),
) -> DataFrame:
    """Apply a learned vocab: per doc, total BPE token count + word count.
    Corpus-sized work is one explode + one broadcast join of the
    vocabulary table."""
    stream = docs.select(
        id_col,
        *keep,
        F.explode(F.split(F.lower(text_col), WORD_RE)).alias("w"),
    ).where(F.length("w") > 1)
    return (
        stream.join(F.broadcast(vocab), "w")
        .groupBy(id_col, *keep)
        .agg(
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.count("*").cast("long").alias("n_words"),
        )
    )
