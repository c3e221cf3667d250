"""CCNet-style paragraph-level dedup (round 4 late): remove every repeated
paragraph from the corpus EXCEPT its first occurrence, then reassemble
documents (and optionally drop documents that lost too much).

This is the other half of the segment-granularity story next to
``dedup_lines_boiler`` (queries_webgraph): boiler removes segments that are
FREQUENT within a source (cookie banners, nav); keep-first removes every
LATER copy of any segment corpus-wide — the CCNet dedup that cuts ~70% of
raw Common Crawl. Both share the fixed word-window segmentation so the two
passes compose.

Scale shape (100 TB): the natural formulation is a row_number() window
partitioned by the paragraph hash — but a viral paragraph ("click to
accept cookies…") makes one window partition with 10^9 rows. Instead the
first instance is computed as a plain ``groupBy(h).agg(min(instance_key))``
— partial aggregation absorbs the hot key map-side (each task emits ONE row
per distinct h), and the join back is a same-key equi-join that reuses the
hash partitioning. instance_key packs (doc_id, pos) into one BIGINT
(doc_id * 1_000_000 + pos) so "first" is the frozen document order both
engines compare identically; pos < 1e6 is guaranteed by MAX-length docs at
W=20 words per segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t

PARA_W = 20  # words per paragraph window (same granularity as boiler)
_IK = 1_000_000  # instance key stride: ik = doc_id * _IK + pos

_WORDS_SPARK = "filter(split(text, ' '), x -> x != '')"
_WORDS_SQL = "list_filter(string_split(text, ' '), x -> x != '')"


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_segs, pos, seg, h, ik) — one row per word-window segment."""
    d = t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.expr(_WORDS_SPARK).alias("ws")).filter(
        F.size("ws") > 0
    )
    segd = w.select(
        "doc_id",
        F.expr(
            f"CAST(ceil(size(ws) / {PARA_W}.0) AS INT)"
        ).alias("n_segs"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(ws) / {PARA_W}.0)"
                f" AS INT) - 1),"
                f" p -> array_join(slice(ws, p * {PARA_W} + 1, {PARA_W}),"
                f" ' '))"
            )
        ).alias("pos", "seg"),
    )
    return segd.select(
        "doc_id",
        "n_segs",
        "pos",
        "seg",
        F.md5(F.lower("seg")).alias("h"),
        (F.col("doc_id") * F.lit(_IK) + F.col("pos")).alias("ik"),
    )


_SEGS_SQL = f"""
w AS (
  SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
  WHERE len({_WORDS_SQL}) > 0
),
segp AS (
  SELECT doc_id, CAST(ceil(len(ws) / {PARA_W}.0) AS INT) AS n_segs,
    unnest(range(0, CAST(ceil(len(ws) / {PARA_W}.0) AS INT))) AS pos, ws
  FROM w
),
k AS (
  SELECT doc_id, n_segs, CAST(pos AS INT) AS pos,
    array_to_string(
      list_slice(ws, pos * {PARA_W} + 1, pos * {PARA_W} + {PARA_W}),
      ' ') AS seg
  FROM segp
),
keyed AS (
  SELECT doc_id, n_segs, pos, seg, md5(lower(seg)) AS h,
    doc_id * {_IK} + pos AS ik
  FROM k
),
f AS (SELECT h, min(ik) AS fik FROM keyed GROUP BY h),
kept AS (
  SELECT keyed.* FROM keyed JOIN f ON keyed.h = f.h AND keyed.ik = f.fik
)
"""


@register(
    "dedup_para_keepfirst",
    f"""
WITH {_SEGS_SQL}
SELECT doc_id,
  array_to_string(list(seg ORDER BY pos), ' ') AS kept_text,
  CAST(count(*) AS INT) AS n_kept,
  CAST(min(n_segs) AS INT) AS n_segs
FROM kept GROUP BY doc_id
""",
)
def q_dedup_para_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup, reassembled per document.
    Docs whose every segment is a later copy disappear (no empty rows)."""
    segs = _segments(spark, sf_dir)
    first = segs.groupBy("h").agg(F.min("ik").alias("fik"))
    kept = segs.join(first, "h").filter(F.col("ik") == F.col("fik"))
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("kept_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.min("n_segs").cast("int").alias("n_segs"),
    )


@register(
    "dedup_para_survivors",
    f"""
WITH {_SEGS_SQL},
agg AS (
  SELECT doc_id, count(*) AS n_kept, min(n_segs) AS n_segs
  FROM kept GROUP BY doc_id
)
SELECT doc_id FROM agg WHERE n_kept * 10 >= n_segs * 3
ORDER BY doc_id
""",
)
def q_dedup_para_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's document gate after paragraph dedup: keep a document iff it
    retained >= 30% of its segments (integer cross-multiplication — no
    float ratio under the value hash). One extra partial-agg shuffle over
    the kept rows; the text column is never carried."""
    segs = _segments(spark, sf_dir)
    first = segs.groupBy("h").agg(F.min("ik").alias("fik"))
    kept = segs.join(first, "h").filter(F.col("ik") == F.col("fik"))
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("n_segs").alias("n_segs"),
    )
    return (
        agg.filter(F.col("n_kept") * 10 >= F.col("n_segs") * 3)
        .select("doc_id")
        .orderBy("doc_id")
    )
