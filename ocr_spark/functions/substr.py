"""Exact-substring duplicate-span detection (the Lee-et-al-2021
"Deduplicating Training Data Makes Language Models Better" family),
re-expressed Spark-first as a rolling char-k-gram inverted index — no
suffix array, no single-machine state.

Pipeline (all linear in corpus size, two shuffles, zero doc–doc pairs):

1. positions: one row per (doc, offset) k-gram;
2. sampling (``sample_mod`` > 1): keep a gram iff
   ``int(md5(gram)[:8], 16) % sample_mod == 0`` — CONTENT-keyed
   (winnowing/mod-sampling style), which is the part that matters: a
   positional stride would sample different grams in two copies of the
   same run whenever the copies start at different offsets (phase
   misalignment) and silently miss cross-document duplicates, while a
   content key samples every occurrence of a gram identically, so any
   duplicated run with at least one sampled gram is detected in ALL its
   copies. Expected index shrink = sample_mod×; a duplicated run of
   length L contains L-k+1 grams, each sampled with probability
   1/sample_mod by content, so misses decay like
   (1-1/sample_mod)^(L-k+1);
3. duplicated grams: a count window over the gram partition keeps the
   positions whose gram occurs >= min_freq times — ONE shuffle of the
   position rows and one scan (measured at sf0.1: 3.74s vs 7.91s for
   groupBy + join-back even with single-pass gram generation, because the
   join formulation recomputes the gram lineage for both branches).
   SKEW NOTE: the window co-locates every occurrence of a gram in one
   partition, so the per-task bound is the corpus max gram frequency —
   a boilerplate stop-gram shared by d docs costs one task sorting d
   rows, and AQE cannot split a window partition (it can split a skewed
   join probe). At web scale run with ``sample_mod`` (shrinks every
   gram's row count by the sampling rate uniformly — content-keyed, so
   the mega-gram's partition shrinks mod-fold) and budget the stop-gram
   tail; the hot-gram case is pinned timing-free in
   tests/test_corpusml.py. When ``max_df`` is set, count <= max_df: the
   stop-gram cap that drops boilerplate shared by ~every page from the
   span output, the standard web-scale hygiene knob;
4. islands: nearby duplicated offsets grouped with a lag + running-sum
   window per doc — ONE Exchange keyed by doc id. At sample_mod == 1
   "nearby" means gap == 1 (exact maximal runs); under sampling the
   sampled offsets of one run sit at geometric gaps (mean sample_mod),
   so islands merge offsets with gap <= ``max_gap``
   (default 2*k + sample_mod) and the reported edges can undershoot the
   true run by up to the edge sampling gaps — the documented trade.

The registry query `dedup_substr_spans` calls this with the frozen oracle
parameters (k=16, no sampling, min_freq=2, no cap); the knobs are covered
by tests/test_corpusml.py against an independent reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(docs: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    """(_id, p, g): one row per k-gram position, p 1-based, g = md5 hex.
    The hash array is built per doc BEFORE the explode (one transform over
    sequence), so the exploded rows carry (id, pos, 32-char hash) — never a
    replicated copy of the document text."""
    return (
        docs.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {k} + 1),"
                    f" i -> md5(substring({text_col}, i, {k})))"
                )
            ).alias("p0", "g"),
        )
        .select("_id", (F.col("p0") + 1).alias("p"), "g")
    )


def substr_dup_spans(
    docs: DataFrame,
    k: int = 16,
    sample_mod: int = 1,
    min_freq: int = 2,
    max_df: int | None = None,
    max_gap: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, span_start, span_len, n_grams) for every duplicated run found.
    ``span_start`` is 1-based; ``span_len = last_offset - first_offset + k``
    over the run's detected (sampled) grams. Exact maximal runs at
    sample_mod=1; see the module docstring for the sampled-mode contract."""
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    gap = (
        max_gap
        if max_gap is not None
        else (1 if sample_mod == 1 else 2 * k + sample_mod)
    )
    grams = _grams(docs, k, id_col, text_col)
    if sample_mod > 1:
        grams = grams.filter(
            F.expr(
                f"pmod(CAST(conv(substring(g, 1, 8), 16, 10) AS BIGINT),"
                f" {sample_mod}) = 0"
            )
        )
    # dup test via a count window over the gram partition: ONE shuffle of
    # the position rows and ONE scan — strictly fewer passes than the
    # groupBy + join-back formulation at any scale
    counted = grams.select(
        "_id", "p", F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n")
    )
    cond = F.col("n") >= min_freq
    if max_df is not None:
        cond = cond & (F.col("n") <= max_df)
    hits = counted.filter(cond).select("_id", "p")
    w = Window.partitionBy("_id").orderBy("p")
    brk = hits.withColumn(
        "b",
        F.when(
            F.col("p") - F.lag("p").over(w) <= gap, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    isl = brk.withColumn(
        "island",
        F.sum("b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy("_id", "island")
        .agg(
            F.min("p").cast("bigint").alias("span_start"),
            (F.max("p") - F.min("p") + k).cast("bigint").alias("span_len"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col("_id").alias(id_col), "span_start", "span_len", "n_grams"
        )
    )


def substr_removable_intervals(
    docs: DataFrame,
    k: int = 16,
    min_freq: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, del_start, del_end): disjoint char intervals (1-based,
    end-exclusive) covering every duplicated k-gram occurrence EXCEPT the
    corpus-first one (lexicographic (doc_id, position)) — the Lee-et-al
    keep-one-copy rule. The winner is a row_number window over the gram
    partition (NOT a packed doc_id*BASE+p scalar: production ids are full
    64-bit hashes — xxhash64(url, ts) in corpus_job — and the
    multiplication overflows under ANSI mode); the per-gram window rides
    the same single shuffle the count needs, so the shape stays
    substr_dup_spans' two linear shuffles."""
    grams = _grams(docs, k, id_col, text_col)
    gw = Window.partitionBy("g")
    grn = Window.partitionBy("g").orderBy("_id", "p")
    counted = grams.select(
        "_id", "p",
        F.count(F.lit(1)).over(gw).alias("n"),
        F.row_number().over(grn).alias("rn"),
    )
    cond = (F.col("n") >= min_freq) & (F.col("rn") > 1)
    if max_df is not None:
        cond = cond & (F.col("n") <= max_df)
    removable = counted.filter(cond).select("_id", "p")
    # merge the [p, p+k) intervals: gap <= k overlaps or abuts
    w = Window.partitionBy("_id").orderBy("p")
    brk = removable.withColumn(
        "b",
        F.when(F.col("p") - F.lag("p").over(w) <= k, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    isl = brk.withColumn(
        "island",
        F.sum("b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy("_id", "island")
        .agg(
            F.min("p").cast("bigint").alias("del_start"),
            (F.max("p") + k).cast("bigint").alias("del_end"),
        )
        .select(F.col("_id").alias(id_col), "del_start", "del_end")
    )


def substr_dedup_clean(
    docs: DataFrame,
    k: int = 16,
    min_freq: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clean_text, removed_chars): the corpus with every duplicated
    k-gram run deleted except its corpus-first occurrence. Reassembly is a
    per-doc fold over the SORTED interval array (a JVM HOF — deterministic
    regardless of partitioning, unlike a bare collect_list concat); docs
    with nothing to remove pass through untouched."""
    iv = substr_removable_intervals(
        docs, k, min_freq, max_df, id_col, text_col
    )
    agg = iv.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("del_start", "del_end"))
        ).alias("_iv")
    )
    joined = docs.join(agg, id_col, "left")
    rebuild = F.expr(
        f"""aggregate(
  _iv,
  named_struct('cur', CAST(1 AS BIGINT), 'acc', CAST('' AS STRING)),
  (st, x) -> named_struct(
    'cur', x.del_end,
    'acc', concat(st.acc, substring({text_col}, CAST(st.cur AS INT),
                                    CAST(x.del_start - st.cur AS INT)))),
  st -> concat(st.acc, substring({text_col}, CAST(st.cur AS INT),
                                 length({text_col}))))"""
    )
    clean = F.when(F.col("_iv").isNull(), F.col(text_col)).otherwise(rebuild)
    return joined.select(
        id_col,
        clean.alias("clean_text"),
        (F.length(text_col) - F.length(clean)).cast("bigint")
        .alias("removed_chars"),
    )
