"""BPE tokenizer training + token counting, Spark-first.

A training-data pipeline needs token counts under the tokenizer the
model will actually use, not whitespace counts. Real BPE trainers
(Sennrich '16; the standard Hugging Face pipeline) do NOT scan the
corpus per merge — they reduce the corpus to a word-type frequency
table once, then train merges over the (small) type table. That maps
exactly onto Spark:

1. ONE distributed pass: explode whitespace words → hash-aggregate
   frequencies (map-side combinable). The result is bounded by
   vocabulary size, not corpus size.
2. Driver-side merge training over word TYPES, weighted by frequency —
   pure deterministic Python with incremental pair-count maintenance
   (only words containing the merged pair are touched per iteration).
3. Counting: segment each of the top-V word types ONCE on the driver,
   broadcast the (word → n_tokens) table, and count documents with an
   explode + broadcast join + sum — per-word-TYPE work, never
   per-token, and all corpus-sized movement stays JVM-side.

At 100 TB the web-text type table has a heavy noise tail (URLs, hex,
typos), so exact counts cover the top ``max_vocab`` types by frequency
and every rarer/unseen type falls back to its character count — the
byte-level-BPE worst case, deterministic and documented in the result.

Everything is deterministic: ties in pair frequency break
lexicographically; no RNG, no wall clock.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hiispider_spark.operators.dedup import tokens_col

DEFAULT_MERGES = 200
DEFAULT_MIN_FREQ = 2
DEFAULT_MAX_VOCAB = 50_000


def train_bpe_merges(
    word_freqs: dict[str, int],
    n_merges: int = DEFAULT_MERGES,
    min_freq: int = DEFAULT_MIN_FREQ,
) -> list[tuple[str, str]]:
    """Classic BPE over a word-type frequency table (driver-side).

    Incremental: a merge only touches words containing the merged pair
    (pair→word index), so cost per iteration is proportional to the
    affected types, not the vocabulary. Ties break lexicographically —
    fully deterministic for any dict iteration order.
    """
    seqs: dict[str, list[str]] = {w: list(w) for w in word_freqs if len(w) > 1}
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[str]] = defaultdict(set)

    def add_word(w: str, sign: int) -> None:
        f = word_freqs[w] * sign
        syms = seqs[w]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            if sign > 0:
                pair_words[(a, b)].add(w)

    for w in seqs:
        add_word(w, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[str, str] | None = None
        best_n = min_freq - 1
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(pair_words.pop(best, ())):
            add_word(w, -1)  # retract old pair counts for this word
            syms = seqs[w]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
            add_word(w, +1)
        pair_counts = +pair_counts  # drop zero/negative entries
    return merges


def segment_count(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under trained merges: apply
    the lowest-rank mergeable pair until none applies (standard greedy
    BPE inference)."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_r = -1, len(ranks)
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p, len(ranks))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = DEFAULT_MERGES,
    min_freq: int = DEFAULT_MIN_FREQ,
    max_vocab: int = DEFAULT_MAX_VOCAB,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Corpus → (merges, word→freq of the top-``max_vocab`` types).

    The only distributed work is the word-frequency aggregation (one
    corpus pass, map-side combined); the collect is bounded by
    ``max_vocab`` via a frequency top-k with lexicographic tie-break.
    """
    wf = (
        docs.select(
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(max_vocab)
        .collect()
    )
    word_freqs = {r["w"]: int(r["count"]) for r in wf}
    return train_bpe_merges(word_freqs, n_merges, min_freq), word_freqs


def bpe_token_count(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    known_words: list[str],
) -> DataFrame:
    """(doc_id, n_bpe_tokens): exact BPE counts for known word types,
    character-count fallback (byte-level worst case) for the tail.

    The (word → count) table is per-TYPE, segmented once on the driver
    and broadcast; documents only explode + join + sum — no Python in
    the corpus-sized path.
    """
    spark = docs.sparkSession
    ranks = {p: i for i, p in enumerate(merges)}
    wc = spark.createDataFrame(
        [(w, segment_count(w, ranks)) for w in known_words],
        "w string, n_tok int",
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("w"),
    )
    return (
        exploded.join(F.broadcast(wc), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.coalesce(F.col("n_tok"), F.length("w")).cast("long")
            ).alias("n_bpe_tokens")
        )
    )
