"""Probabilistic sketches, integer-exact across engines (SURVEY §2 scale
block): Bloom filter membership, count-min frequency, HyperLogLog
cardinality — the three structures a 100 TB pipeline reaches for when the
exact table (the crawl seen-set, the token frequency map, the distinct-URL
count) no longer fits anywhere.

Design rule, same as MinHash/PageRank/k-means before it: every bit of
sketch state is BIGINT arithmetic on md5-derived integers, so a DuckDB
oracle replays the construction bit-for-bit and the driver's value-hash
gate covers the sketch CONTENTS, not just a summary. No floats anywhere —
even the HLL estimate is a single integer division of frozen-constant
numerators.

Hashing: md5 hex is identical in Spark and DuckDB; 32 hex chars yield four
independent 28-bit integers (offsets 1/8/15/22, 7 hex digits each — the
established _SHASH idiom from queries_textml). 28 bits is plenty of space
over any m/w used here and stays far from BIGINT sign trouble.

Scale story per sketch (each is why the structure exists at all):

* Bloom: the built filter is ``m/32`` words — KILOBYTES for billions of
  keys. At cluster scale you build it with one map-side-combining
  ``bit_or`` shuffle bounded by m (not by rows), then ship it as a
  broadcast to prune a big join's probe side before the shuffle (Spark's
  own AQE runtime filtering plays the same trick with its internal
  BloomFilterAggregate; ours is the cross-engine-deterministic spelling).
  No false negatives, ever — the FP rate is the tunable cost.
* Count-min: the counter matrix is ``d×w`` cells regardless of input
  size; partial aggregation caps every task's shuffle output at d·w
  rows. Estimates only ever OVER-count (min over d independent rows).
* HLL: m registers, merged with elementwise MAX — the merge is an
  aggregation, so per-partition sketches combine without re-reading
  data (the property tests pin this). The raw-HLL estimate here is the
  deterministic integer spelling; production accuracy corrections
  (bias tables, linear counting) belong to Spark's built-in
  approx_count_distinct, already in the registry — this module's value
  is the exact, mergeable, oracle-replayable register state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# four independent 28-bit hashes out of one md5; offset in {1, 8, 15, 22}
_HASH_OFFSETS = (1, 8, 15, 22)


def mdhash_spark(expr: str, slot: int) -> str:
    """28-bit non-negative BIGINT hash of a string expression (Spark SQL)."""
    off = _HASH_OFFSETS[slot]
    return f"CAST(conv(substring(md5({expr}), {off}, 7), 16, 10) AS BIGINT)"


def mdhash_duck(expr: str, slot: int) -> str:
    """The same 28-bit hash in DuckDB SQL (no conv() there — fold the hex
    digits with the strpos table, the queries_textml._SHASH_SQL idiom)."""
    off = _HASH_OFFSETS[slot]
    return (
        "list_aggregate(list_transform(generate_series(0, 6),"
        f" k -> CAST(strpos('0123456789abcdef',"
        f" substr(md5({expr}), {off} + k, 1)) - 1 AS BIGINT)"
        " * (1::BIGINT << (4 * (6 - k)))), 'sum')"
    )


# --- Bloom filter ---------------------------------------------------------------------

BLOOM_M_BITS = 4096  # driver-entry width; production sizes m from n & FP target
BLOOM_K = 3  # hash functions (k <= 4: one md5 yields four slots)
_WORD_BITS = 32  # 32-bit words inside BIGINTs: bit_or never touches the sign


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS,
                k: int = BLOOM_K) -> DataFrame:
    """(word: BIGINT, bits: BIGINT) — the filter as a table of m/32 words.

    One explode (k rows per key, map-only) and ONE map-side-combining
    bit_or shuffle whose width is bounded by m/32 rows — input size never
    appears in the shuffle. The result is broadcast-sized by construction.
    """
    pos = [
        f"{mdhash_spark(key_col, i)} % {m_bits}" for i in range(k)
    ]
    return (
        keys.selectExpr(f"explode(array({', '.join(pos)})) AS _pos")
        .selectExpr(
            f"_pos div {_WORD_BITS} AS word",
            f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_WORD_BITS} AS INT))"
            " AS _mask",
        )
        .groupBy("word")
        .agg(F.expr("bit_or(_mask)").alias("bits"))
    )


def bloom_probe(probes: DataFrame, bloom: DataFrame, id_col: str,
                key_col: str, m_bits: int = BLOOM_M_BITS,
                k: int = BLOOM_K) -> DataFrame:
    """(id_col, bloom_hit) — hit iff ALL k probe bits are set.

    The filter side rides a broadcast hash join (plan-pinned); the probe
    side pays one explode and one groupBy(id) whose combine is the
    bool_and — linear, no filter-sized state on the probe side. A miss on
    an absent WORD row is a clean miss (left join → null bits → bit unset).
    """
    pos = [f"{mdhash_spark(key_col, i)} % {m_bits}" for i in range(k)]
    probed = probes.selectExpr(
        id_col, f"explode(array({', '.join(pos)})) AS _pos"
    ).selectExpr(
        id_col,
        f"_pos div {_WORD_BITS} AS word",
        f"CAST(_pos % {_WORD_BITS} AS INT) AS _bit",
    )
    return (
        probed.join(F.broadcast(bloom), "word", "left")
        .selectExpr(
            id_col,
            "coalesce((shiftright(bits, _bit) % 2) = 1, false) AS _set",
        )
        .groupBy(id_col)
        .agg(F.expr("bool_and(_set)").alias("bloom_hit"))
    )


def bloom_sql_cte(keys_sql: str, probes_sql: str, id_col: str,
                  key_col: str, m_bits: int = BLOOM_M_BITS,
                  k: int = BLOOM_K) -> str:
    """DuckDB CTE chain mirroring bloom_build + bloom_probe exactly.

    ``keys_sql`` / ``probes_sql`` are subqueries exposing ``key_col`` (and
    ``id_col`` on the probe side). Returns SQL selecting (id, bloom_hit).
    """
    kpos = ", ".join(
        f"{mdhash_duck(key_col, i)} % {m_bits}" for i in range(k)
    )
    ppos = ", ".join(
        f"{mdhash_duck(key_col, i)} % {m_bits}" for i in range(k)
    )
    return f"""
WITH _bk AS ({keys_sql}),
_bpos AS (
  SELECT unnest([{kpos}]) AS _pos FROM _bk
),
_bloom AS (
  SELECT _pos // {_WORD_BITS} AS word,
         bit_or(1::BIGINT << CAST(_pos % {_WORD_BITS} AS INT)) AS bits
  FROM _bpos GROUP BY 1
),
_pr AS ({probes_sql}),
_ppos AS (
  SELECT {id_col}, unnest([{ppos}]) AS _pos FROM _pr
),
_probed AS (
  SELECT p.{id_col},
         coalesce((b.bits >> CAST(p._pos % {_WORD_BITS} AS INT)) % 2 = 1,
                  false) AS _set
  FROM (SELECT {id_col}, _pos // {_WORD_BITS} AS word, _pos
        FROM _ppos) p
  LEFT JOIN _bloom b USING (word)
)
SELECT {id_col}, bool_and(_set) AS bloom_hit FROM _probed GROUP BY 1
"""


# --- count-min sketch -----------------------------------------------------------------

CMS_D = 3  # depth (rows); one md5 covers up to 4
CMS_W = 64  # width (columns per row)


def cms_build(tokens: DataFrame, token_col: str, d: int = CMS_D,
              w: int = CMS_W) -> DataFrame:
    """(row, col, cnt) — the d×w counter matrix.

    One explode (d cells per occurrence) + ONE count shuffle whose
    map-side combine caps any task's output at d·w rows: the matrix is
    constant-size however large the token stream."""
    cells = ", ".join(
        f"struct(CAST({i} AS BIGINT) AS row,"
        f" {mdhash_spark(token_col, i)} % {w} AS col)"
        for i in range(d)
    )
    return (
        tokens.selectExpr(f"explode(array({cells})) AS _c")
        .selectExpr("_c.row AS row", "_c.col AS col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(distinct_tokens: DataFrame, cms: DataFrame,
                 token_col: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(token_col, est) — min over the d cells a token maps to.

    The matrix side is broadcast (d·w rows); each token probes its d
    cells via d broadcast lookups folded into one explode + min."""
    cells = ", ".join(
        f"struct(CAST({i} AS BIGINT) AS row,"
        f" {mdhash_spark(token_col, i)} % {w} AS col)"
        for i in range(d)
    )
    probed = distinct_tokens.selectExpr(
        token_col, f"explode(array({cells})) AS _c"
    ).selectExpr(token_col, "_c.row AS row", "_c.col AS col")
    return (
        probed.join(F.broadcast(cms), ["row", "col"])
        .groupBy(token_col)
        .agg(F.min("cnt").alias("est"))
    )


# --- HyperLogLog ----------------------------------------------------------------------

HLL_B = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_B
# rank lives in the 22 bits above the bucket (28-bit hash, 6-bit bucket);
# rank = leading zeros of that field + 1, so rank ∈ [1, 23]
_HLL_REST_BITS = 28 - HLL_B
HLL_RANK_MAX = _HLL_REST_BITS + 1
# alpha_64 = 0.7213 / (1 + 1.079/64) = 0.709340…, frozen at e6 so the
# estimate is one integer division in BOTH engines
HLL_ALPHA_E6 = 709340


def hll_registers(keys: DataFrame, key_col: str,
                  group_cols: list[str] | None = None) -> DataFrame:
    """(bucket, reg) — max rank per bucket, only non-empty buckets emitted.

    ONE max shuffle, map-side-combined to ≤ m rows per task. Registers
    merge across any partitioning/union by elementwise MAX — the property
    that makes HLL a distributed sketch (pinned in tests).

    ``group_cols`` keys the sketch: one independent register table per
    group (≤ m rows each), e.g. per-source or per-day sketches that later
    MAX-merge to the corpus sketch without re-reading data."""
    h = mdhash_spark(key_col, 0)
    gcols = list(group_cols or [])
    return (
        keys.selectExpr(*gcols, f"{h} AS _h")
        .selectExpr(
            *gcols,
            f"_h % {HLL_M} AS bucket",
            f"_h div {HLL_M} AS _rest",
        )
        .selectExpr(
            *gcols,
            "bucket",
            # length(bin(x)) = floor(log2 x)+1 for x>0; bin(0)='0' needs
            # the explicit all-zeros arm
            f"CASE WHEN _rest = 0 THEN CAST({HLL_RANK_MAX} AS BIGINT)"
            f" ELSE CAST({HLL_RANK_MAX} - length(bin(_rest)) AS BIGINT)"
            " END AS _rank",
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("_rank").alias("reg"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One row (est: BIGINT) — the raw-HLL estimator as pure integers.

    S = Σ_buckets 2^(rank_max − reg)  (empty buckets contribute 2^rank_max),
    est = α_e6 · m² · 2^rank_max  div  (S · 10^6).
    Numerator ≈ 2.4e16 — safely inside BIGINT."""
    scale = 1 << HLL_RANK_MAX
    num = HLL_ALPHA_E6 * HLL_M * HLL_M * scale
    return registers.agg(
        F.expr(
            f"sum(shiftleft(CAST(1 AS BIGINT),"
            f" CAST({HLL_RANK_MAX} - reg AS INT)))"
            f" + (CAST({HLL_M} AS BIGINT) - count(*))"
            f" * CAST({scale} AS BIGINT)"
        ).alias("_s")
    ).selectExpr(f"CAST({num} AS BIGINT) div (_s * 1000000) AS est")


def hll_sql_registers(keys_sql: str, key_col: str) -> str:
    """DuckDB CTE mirroring hll_registers (SELECT bucket, reg)."""
    h = mdhash_duck(key_col, 0)
    return f"""
SELECT _h % {HLL_M} AS bucket,
       max(CASE WHEN _h // {HLL_M} = 0 THEN {HLL_RANK_MAX}::BIGINT
                ELSE {HLL_RANK_MAX}::BIGINT
                     - length(bin(_h // {HLL_M})) END) AS reg
FROM (SELECT CAST({h} AS BIGINT) AS _h FROM ({keys_sql})) GROUP BY 1
"""
# ^ the CAST matters: DuckDB's list_aggregate('sum') yields HUGEINT, which
# pandas renders as float64 — the driver's schema compare would flag it


# --- equi-width histogram quantile sketch ----------------------------------------------

HIST_B = 64  # buckets
HIST_DOMAIN = 1024  # frozen value domain [0, 1024); outside clamps to edges


def hist_build(df: DataFrame, col: str, b: int = HIST_B,
               domain: int = HIST_DOMAIN,
               group_cols: list[str] | None = None) -> DataFrame:
    """(bucket, cnt) — equi-width histogram over the frozen domain.

    The fourth sketch monoid: counts merge by SUM (hostlinks' fold), so
    per-partition/per-day histograms combine without re-reading data —
    the property tests pin it. ONE count shuffle, map-side-combined to
    ≤ b rows per task. Values outside the domain clamp to the edge
    buckets (the sketch stays total).

    ``group_cols`` keys the sketch (one ≤ b-row histogram per group),
    mirroring hll_registers' keyed form."""
    gcols = list(group_cols or [])
    return (
        df.selectExpr(
            *gcols,
            f"greatest(0, least({b - 1},"
            f" CAST({col} AS BIGINT) * {b} div {domain})) AS bucket",
        )
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(hist: DataFrame, qs: tuple[int, ...],
                   b: int = HIST_B, domain: int = HIST_DOMAIN) -> DataFrame:
    """(q, est_hi) — for each integer percentile q, the UPPER EDGE of the
    first bucket whose cumulative count reaches ceil(q·N/100). Pure
    integers: the estimate is a bucket boundary, never an interpolation
    (floats would break the cross-engine contract); its error bound is
    the bucket width domain/b."""
    from pyspark.sql import Window

    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    n = hist.agg(F.sum("cnt").alias("n"))
    qlit = ", ".join(str(q) for q in qs)
    probes = n.selectExpr(
        f"explode(array({qlit})) AS q", "n"
    ).selectExpr("q", "CAST(-(-q * n div 100) AS BIGINT) AS thr")
    # -(-x div y) is ceil for positive ints in BOTH engines' truncating/
    # flooring div (x, y > 0)
    return (
        probes.join(F.broadcast(cum), F.col("cum") >= F.col("thr"))
        .groupBy("q")
        .agg(F.min("bucket").alias("_bk"))
        .selectExpr(
            "CAST(q AS BIGINT) AS q",
            f"CAST((_bk + 1) * {domain} div {b} AS BIGINT) AS est_hi",
        )
    )
