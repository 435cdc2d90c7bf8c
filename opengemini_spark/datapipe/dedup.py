"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are shuffle-conscious DataFrame compositions:

- exact:   one hash-aggregate (map-side partial combine, no row movement
           beyond the md5-key shuffle).
- minhash: one explode → one aggregate (16 mins in a single pass) → band
           self-join on (band, key) — the join only touches docs that share
           an LSH bucket, never the n² pair space.
- simhash: one explode → 32 conditional sums in one aggregate → byte-band
           join (pigeonhole: hamming ≤ 3 on 4 bands ⇒ ≥ 1 equal band).
- ngram:   intersection join on rare k-word shingles (sparse by
           construction for k ≥ 4).

At 100 TB the explode/aggregate stages are embarrassingly parallel; the
only shuffles are keyed by shingle-hash / LSH-bucket, which are
high-cardinality and therefore skew-free. Candidate verification joins are
proportional to the number of colliding pairs, not documents².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from opengemini_spark.catalog import parallelize_scan
from opengemini_spark.datapipe.hashing import (
    h60,
    shingles_expr,
    tokens_expr,
)

# MinHash configuration — shared with the oracle SQL in suite_datapipe.py.
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

# Carter-Wegman hash family: h_i(x) = (A_i·(h60(x) mod P) + B_i) mod P.
# One md5 per shingle feeds all NUM_HASHES functions (16× less hashing than
# seeded-md5 per function — this stage dominated the dedup benchmark).
# P = 2^31 − 1 keeps products < 2^62 (int64-safe in Spark AND DuckDB).
MINHASH_P = 2_147_483_647


def _lcg(seed: int):
    while True:
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield seed


def _gen_ab(n: int) -> list[tuple[int, int]]:
    g = _lcg(42)
    return [(next(g) % (MINHASH_P - 1) + 1, next(g) % MINHASH_P) for _ in range(n)]


MINHASH_AB = _gen_ab(NUM_HASHES)
SHINGLE_K = 2          # word bigrams for minhash
NGRAM_K = 4            # rarer 4-word shingles for the direct-join variant
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct content hash.

    Returns ``(doc_id, n_copies)``.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


def doc_shingles_raw(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hashed k-word shingles per document WITH duplicates: ``(doc_id, sh)``.

    Shingles are reduced to their 60-bit hash map-side — downstream
    exchanges and joins move (long, long) rows instead of ~50-byte strings.
    Set semantics over the hashes equal set semantics over the shingles up
    to 2⁻⁶⁰ collisions (and the oracle hashes identically, so even a
    collision matches). No shuffle happens here.
    """
    return (
        # keyed by id: the signature groupBy(id) / per-doc distinct that
        # every consumer runs next is satisfied by HashPartitioning(id),
        # so the explode→hash→aggregate chain pipelines with no further
        # exchange (local-split guard only — no-op at production scale)
        parallelize_scan(df.select(F.col(id_col), F.col(text_col)), by=id_col)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
        .select(id_col, F.explode(F.expr(shingles_expr("__toks", k))).alias("__s"))
        .select(id_col, h60(F.col("__s")).alias("sh"))
    )


def doc_shingles(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct hashed k-word shingles per document: ``(doc_id, sh)``."""
    return doc_shingles_raw(df, k, text_col, id_col).distinct()


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature: NUM_HASHES columns ``mh0..mhN`` per doc.

    The Carter-Wegman affine family over the already-hashed shingles —
    a single aggregate pass computes all NUM_HASHES minima, no md5 here.
    """
    based = shingles.withColumn("__base", F.col("sh") % MINHASH_P)
    aggs = [
        F.min((F.lit(a) * F.col("__base") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return based.groupBy(id_col).agg(*aggs)




def lsh_band_keys(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode a signature into ``(doc_id, band, key)`` LSH bucket rows."""
    stack_args = []
    for b in range(NUM_BANDS):
        cols = [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        stack_args.append(f"{b}, concat_ws('-', {', '.join(cols)})")
    expr = f"stack({NUM_BANDS}, {', '.join(stack_args)}) as (band, key)"
    return sig.select(id_col, F.expr(expr))


def candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct id pairs that collide in ≥ 1 LSH band: ``(id_a, id_b)``.

    Buckets form with ONE groupBy exchange on (band, key); pairs come from
    a double explode of each bucket's id list. The band self-join this
    replaces moved the (band, key, id) rows twice — and when the planner
    broadcast one leg, the whole scan→tokenize→shingle→signature chain
    EXECUTED twice, because a BroadcastExchange cannot reuse the other
    leg's shuffle stage (the r9 minhash plan shows exactly that). The
    bucket form computes the signature pipeline once and shuffles each
    band row once at any scale. Pair set is identical: every unordered
    (a, b) within a bucket with a < b, distinct across buckets. A
    degenerate hot bucket concentrates its id list in one aggregation
    task — the same task the self-join's hot key would land on — and the
    double explode STREAMS the m² pairs, so task memory is O(bucket),
    not O(bucket²).
    """
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.collect_list(F.col(id_col)).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    return (
        buckets.select(F.explode("__ids").alias("id_a"), "__ids")
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only.

    Returns ``(id_a, id_b, jaccard)`` with jaccard ≥ threshold, rounded 4dp.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sb = shingles.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline.

    Returns verified near-dup pairs ``(id_a, id_b, jaccard ≥ threshold)``.
    """
    # signature from the raw (non-distinct) explode: min() is duplicate-
    # insensitive, so the groupBy partial-aggregates map-side and the only
    # shuffle is 1 row/doc × 16 columns — the full shingle set never moves.
    # (An all-JVM-lambda variant — per-doc shingle-hash arrays folded with
    # aggregate()/transform() — was tried and is ~5× SLOWER: higher-order
    # functions evaluate interpreted, while explode + hash-agg min is
    # whole-stage-codegen'd end to end.)
    raw = doc_shingles_raw(df, SHINGLE_K, text_col, id_col)
    # candidate_pairs buckets on (band, key) with one groupBy, so the
    # scan→tokenize→md5→agg chain executes exactly once — no persist
    # needed on the corpus-sized side
    sig = minhash_signatures(raw, id_col)
    # persist: the candidate set feeds BOTH the verify join and the
    # candidate-doc semi-join below. Size is candidates-proportional
    # (tiny at any corpus scale).
    cand = candidate_pairs(lsh_band_keys(sig, id_col), id_col).persist()
    # exact verification only touches candidate docs: the left-semi join
    # dedups its probe side itself, so the (id_a ∪ id_b) union needs no
    # distinct; at any scale the verify work is proportional to
    # candidates, not the corpus.
    cand_docs = cand.select(F.col("id_a").alias(id_col)).union(
        cand.select(F.col("id_b").alias(id_col))
    )
    # re-shingle just the candidate documents (tiny), collect each doc's
    # distinct shingle set into ONE array row, and verify pairs with
    # array_intersect — two broadcast-able joins and a single exchange
    # (the collect_set agg) instead of the exploded 3-way join + groupBy
    # + two size joins (6 exchanges; the r3 profile's long tail was this
    # stage chain's scheduling overhead)
    arrays = (
        doc_shingles_raw(
            df.join(F.broadcast(cand_docs), id_col, "left_semi"),
            SHINGLE_K, text_col, id_col,
        )
        .groupBy(id_col)
        .agg(F.collect_set("sh").alias("__shs"))
        # both verify legs (a and b below) broadcast this frame, and two
        # BroadcastExchange builds cannot share a shuffle stage — without
        # a barrier the candidate re-shingle executed TWICE (r10
        # executed-plan audit). localCheckpoint beats persist here (1.43
        # vs 1.69 s median; the two broadcast builds race the lazy cache
        # and both compute). Candidates-proportional, so tiny at any
        # scale; within-run only — recomputed from parquet per call.
        .localCheckpoint(eager=True)
    )
    a = arrays.select(
        F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa"),
        F.size("__shs").alias("__na"),
    )
    b = arrays.select(
        F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb"),
        F.size("__shs").alias("__nb"),
    )
    c = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard", F.round(c / (F.col("__na") + F.col("__nb") - c), 4)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """n-gram Jaccard dedup via direct shingle-intersection join.

    Uses NGRAM_K-word shingles — long shingles are rare, so the
    intersection join on the shingle key stays sparse (no LSH needed).
    """
    shingles = doc_shingles(df, NGRAM_K, text_col, id_col).persist()
    sa = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sb = shingles.select(F.col(id_col).alias("id_b"), "sh")
    pairs = (
        sa.join(sb, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_verify(pairs, shingles, threshold, id_col)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash fingerprint (SIMHASH_BITS bits) per document.

    Bit i is set iff the token-frequency-weighted ±1 vote of hash-bit i is
    ≥ 0. One explode + one aggregate with 32 conditional sums.
    """
    toks = parallelize_scan(
        df.select(F.col(id_col), F.col(text_col)), by=id_col
    ).select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    ).withColumn("h", h60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash) ≤ max_hamming.

    Candidate generation by the pigeonhole principle: with 4 byte-bands,
    any pair within hamming 3 must agree on ≥ 1 whole band, so the join is
    on (band, byte) buckets, never all pairs.
    """
    sim = simhash(df, text_col, id_col)
    band_rows = []
    for b in range(SIMHASH_BANDS):
        band_rows.append(
            f"{b}, (simhash >> {b * 8}) & 255"
        )
    bands = sim.select(
        F.col(id_col),
        F.col("simhash"),
        F.expr(f"stack({SIMHASH_BANDS}, {', '.join(band_rows)}) as (band, byte)"),
    )
    # bucket the band collision with ONE groupBy exchange — the self-join
    # this replaces moved the band rows twice (or re-executed the whole
    # simhash chain under a broadcast leg); same r10 rewrite as
    # candidate_pairs. Each id appears once per (band, byte), so the
    # double explode emits exactly the join's pair set.
    buckets = (
        bands.groupBy("band", "byte")
        .agg(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"), F.col("simhash").alias("s")
                )
            ).alias("__xs")
        )
        .filter(F.size("__xs") >= 2)
    )
    return (
        buckets.select(F.explode("__xs").alias("a"), "__xs")
        .select("a", F.explode("__xs").alias("b"))
        .filter(F.col("a.i") < F.col("b.i"))
        .select(
            F.col("a.i").alias("id_a"), F.col("b.i").alias("id_b"),
            F.col("a.s").alias("sim_a"), F.col("b.s").alias("sim_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.expr("bit_count(sim_a ^ sim_b)").cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def span_dedup(
    df: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level exact deduplication: remove every repeated k-token
    span from the corpus except its first occurrence.

    The operator from "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2022, arXiv:2107.06499 — public paper):
    doc-level dedup misses boilerplate and quotations that repeat
    INSIDE otherwise-unique documents, so the dedup unit is the
    repeated token span itself. Lee et al. find ≥50-token exact
    substrings with a suffix array; the distributed re-expression is
    shingle-granularity — every k-token window that occurs more than
    once (across docs or within one) is removed at all but its first
    occurrence, where "first" = smallest (doc_id, position).
    Overlapping repeated spans union their covered token ranges, so a
    long repeated passage disappears wholesale (its windows chain).

    Returns one row per input document:
    ``(id_col, clean_text string, n_removed bigint)`` — ``clean_text``
    is the surviving tokens re-joined in order (token-normalized space,
    like the reference pipelines dedup in tokenizer space).

    Scale shape: the span census is one groupBy on the 60-bit shingle
    hash (~n_tokens rows of (long, long) — same shuffle family as the
    contamination check); covered-position explode is k× the duplicate
    occurrences only; the rebuild shuffles each token once on doc_id.
    All JVM expressions, no UDF. Hash keys are uniform, so no skew
    salting is needed; at 100 TB the census shuffle dominates and
    partitions by hash evenly.
    """
    # keyed by id (r9): the covered-position distinct on (id, pos), the
    # anti-join on (id, pos), the rebuild groupBy(id) and the final size
    # join are ALL satisfied by HashPartitioning(id), so only the span
    # census pays its own (unavoidable, uniform) sh-keyed shuffle
    toks = (
        parallelize_scan(df.select(F.col(id_col), F.col(text_col)), by=id_col)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    )
    occ = toks.select(
        id_col,
        F.posexplode(F.expr(shingles_expr("__toks", k))).alias("j", "__s"),
    ).select(id_col, "j", h60(F.col("__s")).alias("sh"))

    firsts = (
        occ.groupBy("sh")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("j"))).alias("__first"),
            F.count(F.lit(1)).alias("__cnt"),
        )
        .filter(F.col("__cnt") >= 2)
    )
    dup_occ = occ.join(firsts, "sh").filter(
        ~(
            (F.col(id_col) == F.col(f"__first.{id_col}"))
            & (F.col("j") == F.col("__first.j"))
        )
    )
    covered = (
        dup_occ.select(
            id_col,
            F.explode(F.sequence(F.col("j"), F.col("j") + (k - 1))).alias(
                "pos"
            ),
        )
        .distinct()
    )
    tokpos = toks.select(
        id_col, F.posexplode("__toks").alias("pos", "tok")
    )
    kept = tokpos.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.expr(
                "transform(sort_array(collect_list(struct(pos, tok))),"
                " s -> s.tok)"
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        toks.select(id_col, F.size("__toks").alias("__n_tok"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("__n_tok") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


PARA_SEP = "\n\n"


def paragraph_dedup(
    df: DataFrame,
    max_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-level boilerplate removal: drop every paragraph that
    occurs in more than ``max_docs`` distinct documents, from ALL of
    them.

    The RefinedWeb / CCNet line-dedup rule (Penedo et al. 2023,
    arXiv:2306.01116; Wenzek et al. 2020, arXiv:1911.00359 — public
    papers): repeated paragraphs across a crawl are navigation chrome,
    cookie banners and share buttons, not content, so unlike span-level
    dedup (first occurrence kept, see :func:`span_dedup`) the repeated
    unit is removed everywhere. The structural unit is the
    ``\\n\\n``-separated paragraph.

    Returns one row per input document:
    ``(id_col, clean_text, n_paras, n_removed)`` — surviving paragraphs
    re-joined in document order.

    Scale shape: the census is ONE groupBy on the 60-bit paragraph hash
    with a distinct-doc count; the rebuild shuffles each paragraph once
    on doc_id. All JVM expressions, no UDF; only ``text`` + id are
    scanned. Skew-safe by plan construction (verified via
    executedPlan): Catalyst rewrites countDistinct as a two-phase
    distinct expansion — the first exchange partitions on
    ``(ph, doc_id)``, so a boilerplate paragraph shared by millions of
    docs never concentrates on one reducer; the per-hash count then
    aggregates partial counts only, and the tiny census broadcasts back
    to the paragraph frame (100×: 5.3× wall, SCALE100_r08).
    """
    # keyed by id (r9): the census broadcasts back (tiny), so with
    # HashPartitioning(id) on the paragraph frame the final groupBy(id)
    # rebuild needs no exchange of its own
    paras = (
        parallelize_scan(df.select(F.col(id_col), F.col(text_col)), by=id_col)
        .select(
            id_col,
            F.posexplode(F.split(F.col(text_col), PARA_SEP)).alias(
                "pos", "para"
            ),
        )
        .withColumn("ph", h60(F.col("para")))
    )
    census = paras.groupBy("ph").agg(
        F.countDistinct(id_col).alias("__ndocs")
    )
    flagged = paras.join(census, "ph").select(
        id_col,
        "pos",
        "para",
        (F.col("__ndocs") <= max_docs).alias("keep"),
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.expr(
                "transform(filter(sort_array(collect_list("
                "struct(pos, keep, para))), s -> s.keep), s -> s.para)"
            ),
            PARA_SEP,
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1))
        .cast("long")
        .alias("n_removed"),
    )
