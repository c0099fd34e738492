"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

Training data that contains benchmark text inflates eval scores; the
standard defense (GPT-3 appendix C / PaLM / Llama style) flags any
training document sharing a long n-gram (typically 8-13 tokens) with
any eval document. This is the corpus-side complement of dedup.py:
instead of corpus×corpus similarity, it is corpus×(small eval set)
membership — a fundamentally cheaper asymmetric join.

Scale shape (100 TB corpus, ~10^4-10^5 eval docs):
- Eval-side distinct shingles number |eval| × ~tokens-per-doc — a few
  ×10^7 keys at worst; hashed to 8-byte longs (``key_col=xxhash64``)
  that's hundreds of MB — broadcastable, so the corpus side streams
  map-side with NO shuffle of corpus shingles (``broadcast_eval=True``,
  the default). Past broadcast range, flip it off: Catalyst falls back
  to a shuffled hash join keyed on 8-byte hashes.
- Per-doc aggregation is map-side combinable (groupBy counts).
- Zero Python anywhere: tokenize/shingle are the same Column
  expressions as quality.py's span dedup (one shared tokenizer across
  the pipeline — a doc flagged there and here agrees on token
  boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hiispider_spark.operators.dedup import tokens_col
from hiispider_spark.operators.quality import shingles_col


def _distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, key_col
) -> DataFrame:
    sh = df.select(
        F.col(id_col),
        F.explode(shingles_col(tokens_col(F.col(text_col)), n)).alias("_s"),
    ).select(
        id_col, (key_col(F.col("_s")) if key_col else F.col("_s")).alias("k")
    )
    return sh.distinct()


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    n: int = 8,
    key_col=None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, eval_id, n_shared, eval_ngrams, shared_frac) for every
    (training doc, eval doc) pair sharing ≥1 distinct n-token shingle.

    ``shared_frac`` is relative to the EVAL doc's distinct shingles —
    1.0 means the training doc contains the entire eval doc (modulo
    ordering). ``key_col`` maps shingle strings to the join key;
    default identity (oracle-twinnable), production ``F.xxhash64``.
    """
    tr = _distinct_shingles(docs, id_col, text_col, n, key_col)
    ev = _distinct_shingles(eval_docs, eval_id_col, eval_text_col, n, key_col)
    ev_tot = ev.groupBy(eval_id_col).agg(F.count("*").alias("eval_ngrams"))
    ev_side = F.broadcast(ev) if broadcast_eval else ev
    tot_side = F.broadcast(ev_tot) if broadcast_eval else ev_tot
    hits = (
        tr.join(ev_side, "k")
        .groupBy(id_col, eval_id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return hits.join(tot_side, eval_id_col).select(
        id_col,
        eval_id_col,
        "n_shared",
        "eval_ngrams",
        F.round(F.col("n_shared") / F.col("eval_ngrams"), 6).alias(
            "shared_frac"
        ),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    key_col=None,
) -> DataFrame:
    """``docs`` plus a ``contaminated`` flag: true when any eval doc
    shares ≥ ``min_shared`` distinct n-gram shingles. Keep-side filter
    is ``filter(~contaminated)`` — left to the caller so audits can see
    what was dropped and why."""
    flagged = (
        ngram_contamination(
            docs,
            eval_docs,
            id_col,
            text_col,
            eval_id_col,
            eval_text_col,
            n,
            key_col,
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(F.broadcast(flagged), id_col, "left").withColumn(
        "contaminated", F.coalesce("contaminated", F.lit(False))
    )
