"""ANN index building blocks: parameterized hyperplane LSH (plane count,
multiple tables, Hamming-1 multi-probe) and IVF with TRAINED centroids
(seeded init + one Lloyd iteration, computed in Spark), plus the recall@k
harness that grades every index setting against the brute-force oracle.

These generalize the fixed 8-plane/first-K-centroid skeletons that back the
registry queries in ocr_spark.queries_textml (those stay pinned to their
DuckDB oracles); this module is the MATURITY path: the knobs a production
deployment turns at 10^12 vectors, with recall measured rather than
asserted. scripts/ann_recall.py reports recall@10 + candidate-set cost for
each setting; tests/test_ann.py pins the orderings that must hold
(multi-probe > single-probe, 2 tables > 1, trained IVF >= seeded IVF).

Scale shape of every search here: candidate generation is an equi-join on
a bucket/list key (broadcast while the probe side is small, shuffle on the
key at scale), scoring touches candidates only, ranking is a per-probe
window top-k keyed by probe_id. Nothing is ever all-pairs; the only
all-pairs plan in the repo is brute_force_topk, which exists to BE the
recall oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.queries_fns import _DOT_SPARK, _NORM_SPARK

DIM = 64  # embeddings table dimension (all SFs)

_COS_EXPR = (
    f"CAST(round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
    f" * {_NORM_SPARK.format(col='probe')}), 6) AS DOUBLE)"
)


# --- hyperplane LSH, parameterized -------------------------------------------

def _sign(tag: str, j: int, d: int) -> float:
    """Deterministic ±1 for plane j, dim d of table `tag` — md5-derived
    constants, so the whole sign matrix is precomputable and embedded as
    literals (never per-row hashing). tag "p" reproduces the registry
    queries' 8-plane table bit-for-bit."""
    h = hashlib.md5(f"{tag}{j}_{d}".encode()).hexdigest()[0]
    return 1.0 if h in "89abcdef" else -1.0


def table_tag(i: int) -> str:
    """Plane-family tag for LSH table i; table 0 is the registry family."""
    return "p" if i == 0 else f"p{i}t"


def bucket_expr(
    n_planes: int, dim: int = DIM, tag: str = "p", col: str = "embedding"
) -> str:
    """Spark SQL expr: the n_planes-bit bucket of `col` under table `tag`.

    One explicit term per plane, each with its own literal sign array
    consumed directly by zip_with — a literal passed as a function argument
    is materialized once, unlike element_at(literal, j) inside a lambda
    (the measured re-materialization trap)."""
    terms = []
    for j in range(1, n_planes + 1):
        plane = ", ".join(f"{_sign(tag, j, d)}D" for d in range(1, dim + 1))
        terms.append(
            f"IF(aggregate(zip_with({col}, array({plane}),"
            " (x, p) -> CAST(x AS DOUBLE) * p), CAST(0.0 AS DOUBLE),"
            f" (s, v) -> s + v) > 0D, {1 << (j - 1)}, 0)"
        )
    return "CAST(" + " + ".join(terms) + " AS INT)"


def multiprobe_expr(n_planes: int, bucket_col: str = "bucket") -> str:
    """Spark SQL expr: array of the probe's own bucket plus its n_planes
    Hamming-distance-1 neighbors (one plane flipped each)."""
    return (
        f"transform(sequence(0, {n_planes}), j -> IF(j = 0, {bucket_col},"
        f" CAST({bucket_col} ^ shiftleft(1, j - 1) AS INT)))"
    )


def lsh_candidates(
    e: DataFrame,
    probes: DataFrame,
    n_planes: int = 8,
    n_tables: int = 1,
    multiprobe: bool = False,
) -> DataFrame:
    """Distinct (probe_id, vec_id) candidate pairs under the given index
    setting: per table, an equi-join of candidate buckets against probe
    buckets (optionally expanded to Hamming-1 neighbors); tables unioned
    then deduped. Each table's join is bucket-keyed — broadcast here,
    shuffle-on-bucket at scale — never all-pairs."""
    parts = []
    for i in range(n_tables):
        be = bucket_expr(n_planes, tag=table_tag(i))
        cand = e.select("vec_id", F.expr(be).alias("bucket"))
        # bucket computed BEFORE the multiprobe explode: substituting the
        # whole bucket expr into the transform lambda would re-materialize
        # its literal plane arrays per element (the measured trap)
        p = probes.select(
            "probe_id",
            F.expr(be.replace("embedding", "probe")).alias("bucket"),
        )
        if multiprobe:
            p = p.select(
                "probe_id",
                F.explode(F.expr(multiprobe_expr(n_planes))).alias("bucket"),
            )
        parts.append(
            cand.join(F.broadcast(p), "bucket").select("probe_id", "vec_id")
        )
    out = parts[0]
    for more in parts[1:]:
        out = out.unionByName(more)
    return out.where(F.col("vec_id") != F.col("probe_id")).distinct()


def score_topk(
    e: DataFrame, probes: DataFrame, candidates: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine over the candidate pairs, per-probe top-k.
    (probe_id, vec_id, cosine) — ranking shuffle keyed by probe_id."""
    scored = (
        candidates.join(e.select("vec_id", "embedding"), "vec_id")
        .join(
            F.broadcast(probes.select("probe_id", "probe")), "probe_id"
        )
        .select("probe_id", "vec_id", F.expr(_COS_EXPR).alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def lsh_topk(
    e: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 1,
    multiprobe: bool = False,
) -> DataFrame:
    return score_topk(
        e, probes, lsh_candidates(e, probes, n_planes, n_tables, multiprobe), k
    )


def brute_force_topk(e: DataFrame, probes: DataFrame, k: int = 10) -> DataFrame:
    """The ground truth: exact cosine against EVERY vector (probes
    broadcast), per-probe top-k. All-pairs on purpose — it is the oracle
    the approximate settings are graded against, run at bench scale only."""
    scored = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(probes.select("probe_id", "probe")))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", F.expr(_COS_EXPR).alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# --- IVF with trained centroids ----------------------------------------------

_L2 = (
    "aggregate(zip_with({v}, {c}, (x, y) ->"
    " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
    " CAST(0.0 AS DOUBLE), (s, z) -> s + z)"
)


def _argmin_key(k: int) -> str:
    """Quantized scalar argmin key — round(L2 * 1e6) * k + cent_id — the
    same device the registry IVF skeleton uses: both engines pick the same
    list (quantized distance, cent_id tie-break) with a plain min(), and
    ``key % k`` recovers the cent_id. Mirrors exactly into DuckDB, which
    struct-keyed min_by does not (round-4 change; prior struct(_l2,
    cent_id) semantics differ only when two raw L2s quantize equal)."""
    return f"CAST(round(_l2 * 1000000, 0) AS BIGINT) * {k} + cent_id"


def ivf_seed_centroids(e: DataFrame, k: int = 8) -> DataFrame:
    """The untrained baseline: the first k vectors as centroids
    (cent_id, cvec) — what the registry sim_ann_ivf skeleton uses."""
    return e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cvec"),
    )


def ivf_train_centroids(
    e: DataFrame, k: int = 8, sample_mod: int = 5
) -> DataFrame:
    """Seeded-init + ONE Lloyd iteration, all in Spark: assign a
    deterministic sample (vec_id % sample_mod == 0 — at 10^12 vectors this
    is the standard train-on-a-sample move; training never scans the full
    table) to its nearest seed centroid, then per-list per-dim mean.

    Plan shape: seeds broadcast into a per-row argmin (min_by over the
    k-way crossJoin), then ONE shuffle keyed by (list_id, dim) for the
    means and a (list_id) regroup to re-assemble the arrays — both keyed
    by tiny-cardinality keys (k and k*dim groups). A seed that attracts no
    sample keeps its own vector (left-join fallback) so k never shrinks."""
    seeds = ivf_seed_centroids(e, k)
    sample = e.where(F.col("vec_id") % sample_mod == 0)
    assigned = (
        sample.crossJoin(F.broadcast(seeds))
        .withColumn(
            "_l2", F.expr(_L2.format(v="embedding", c="cvec"))
        )
        .groupBy("vec_id")
        .agg(
            (F.min(F.expr(_argmin_key(k))) % k).alias("list_id"),
            F.first("embedding").alias("embedding"),
        )
    )
    trained = (
        assigned.select(
            "list_id", F.posexplode("embedding").alias("d", "v")
        )
        .groupBy("list_id", "d")
        .agg(F.avg("v").alias("m"))
        .groupBy("list_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, m))),"
                " s -> CAST(s.m AS FLOAT))"
            ).alias("tvec")
        )
    )
    return (
        seeds.join(
            trained, seeds.cent_id == trained.list_id, "left"
        )
        .select(
            "cent_id",
            F.coalesce(F.col("tvec"), F.col("cvec")).alias("cvec"),
        )
    )


def ivf_candidates(
    e: DataFrame,
    cent: DataFrame,
    probes: DataFrame,
    nprobe: int = 2,
    n_lists: int | None = None,
) -> DataFrame:
    """(probe_id, vec_id) candidates under IVF: broadcast-argmin assignment
    of every vector to its list (one per-row map), per-probe nprobe nearest
    lists, candidates = members of those lists (~nprobe/k of the data per
    probe). ``n_lists`` (the centroid count, needed by the quantized argmin
    key) avoids an eager count when the caller already knows it."""
    k = n_lists if n_lists is not None else cent.count()  # tiny table
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("_l2", F.expr(_L2.format(v="embedding", c="cvec")))
        .groupBy("vec_id")
        .agg((F.min(F.expr(_argmin_key(k))) % k).alias("list_id"))
    )
    # rank by the same quantized key as the assignment (not raw _l2):
    # both engines agree on the probe's nprobe lists even when two
    # centroid distances quantize equal
    pw = Window.partitionBy("probe_id").orderBy("_key")
    probe_lists = (
        probes.crossJoin(F.broadcast(cent))
        .withColumn("_l2", F.expr(_L2.format(v="probe", c="cvec")))
        .withColumn("_key", F.expr(_argmin_key(k)))
        .withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") <= nprobe)
        .select("probe_id", F.col("cent_id").alias("list_id"))
    )
    return (
        assign.join(F.broadcast(probe_lists), "list_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
    )


def ivf_topk(
    e: DataFrame,
    cent: DataFrame,
    probes: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    n_lists: int | None = None,
) -> DataFrame:
    """IVF search over an arbitrary centroid table: candidate lists then
    exact cosine top-k inside them."""
    return score_topk(
        e, probes, ivf_candidates(e, cent, probes, nprobe, n_lists), k
    )


# --- clustered synthetic corpus ----------------------------------------------

def clustered_embeddings(
    spark,
    n: int = 2000,
    k_clusters: int = 16,
    dim: int = DIM,
    noise: float = 0.15,
) -> DataFrame:
    """Deterministic embeddings WITH cluster structure: k md5-derived
    centers (literal matrix), vector i = center[i % k] + xxhash64-derived
    per-(i,dim) noise. Same schema as the testdata embeddings table.

    Purpose: the driver's embeddings table is near-isotropic — the worst
    case for hyperplane LSH — so BENCH/ANN.md's absolute recall numbers
    there say little about real corpora, which cluster. This corpus is the
    realistic-geometry counterpart: same harness, same settings, recall
    measured on data where locality exists to be found. Seed-free and
    partitioning-independent by construction (every value is a pure
    function of (vec_id, dim))."""
    centers = [
        [
            int(hashlib.md5(f"cc{c}_{d}".encode()).hexdigest()[:8], 16)
            / float(0x80000000)
            - 1.0
            for d in range(dim)
        ]
        for c in range(k_clusters)
    ]
    lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{v:.9f}D" for v in row) + ")"
            for row in centers
        )
        + ")"
    )
    vec = (
        f"transform(sequence(1, {dim}), d -> CAST("
        f" element_at(element_at({lit},"
        f"  CAST(pmod(id, {k_clusters}) AS INT) + 1), d)"
        f" + {noise}D * (CAST(xxhash64(concat(CAST(id AS STRING), '_',"
        " CAST(d AS STRING))) AS DOUBLE) / 9.223372036854776E18)"
        " AS FLOAT))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(vec).alias("embedding"),
        F.expr(f"CAST(pmod(id, {k_clusters}) AS STRING)").alias("label"),
    )


# --- recall harness ----------------------------------------------------------

def default_probes(e: DataFrame, mod: int = 20) -> DataFrame:
    """Deterministic probe table: every mod-th vector (probe_id, probe)."""
    return e.where(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe"),
    )


def recall_at_k(approx: DataFrame, truth: DataFrame, k: int = 10) -> float:
    """Mean over probes of |approx top-k ∩ true top-k| / k."""
    n_probes = truth.select("probe_id").distinct().count()
    hits = approx.join(truth, ["probe_id", "vec_id"], "leftsemi").count()
    return round(hits / (n_probes * k), 4) if n_probes else 0.0


# --- product quantization ------------------------------------------------

def _pq_argmin_key(ks: int) -> str:
    """Quantized scalar argmin key over codewords — same device as
    _argmin_key but modulo the per-subspace codebook size."""
    return f"CAST(round(_l2 * 1000000, 0) AS BIGINT) * {ks} + code_id"


def pq_seed_codebooks(
    e: DataFrame, m: int = 8, ks: int = 4, dim: int = DIM
) -> DataFrame:
    """The untrained skeleton codebooks the registry sim_ann_pq query
    pins: (m, code_id, cvec) = subvectors of the first ks vectors."""
    ds = dim // m
    return (
        e.where(F.col("vec_id") < ks)
        .select(
            F.col("vec_id").alias("code_id"),
            F.explode(F.expr(f"sequence(0, {m - 1})")).alias("m"),
            "embedding",
        )
        .select(
            "m", "code_id",
            F.expr(f"slice(embedding, m * {ds} + 1, {ds})").alias("cvec"),
        )
    )


def pq_train_codebooks(
    e: DataFrame,
    m: int = 8,
    ks: int = 4,
    dim: int = DIM,
    sample_mod: int = 5,
) -> DataFrame:
    """Seeded init + ONE Lloyd iteration per subspace, trained in Spark on
    the deterministic vec_id % sample_mod sample (the same
    train-on-a-sample shape as ivf_train_centroids — at 10^12 vectors
    training never scans the full table). Per-(m, code, dim) means are one
    shuffle over m*ks*ds tiny groups; empty codewords keep their seed."""
    ds = dim // m
    seeds = pq_seed_codebooks(e, m, ks, dim)
    sample_sub = (
        e.where(F.col("vec_id") % sample_mod == 0)
        .select(
            "vec_id",
            F.explode(F.expr(f"sequence(0, {m - 1})")).alias("m"),
            "embedding",
        )
        .select(
            "vec_id", "m",
            F.expr(f"slice(embedding, m * {ds} + 1, {ds})").alias("sv"),
        )
    )
    assigned = (
        sample_sub.join(F.broadcast(seeds), "m")
        .withColumn("_l2", F.expr(_L2.format(v="sv", c="cvec")))
        .groupBy("vec_id", "m")
        .agg(
            (F.min(F.expr(_pq_argmin_key(ks))) % ks).alias("code"),
            F.first("sv").alias("sv"),
        )
    )
    trained = (
        assigned.select("m", "code", F.posexplode("sv").alias("d", "v"))
        .groupBy("m", "code", "d")
        .agg(F.avg("v").alias("mu"))
        .groupBy("m", "code")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, mu))),"
                " s -> CAST(s.mu AS FLOAT))"
            ).alias("tvec")
        )
    )
    return (
        seeds.join(
            trained,
            (seeds.m == trained.m) & (seeds.code_id == trained.code),
            "left",
        )
        .select(
            seeds.m, seeds.code_id,
            F.coalesce(trained.tvec, seeds.cvec).alias("cvec"),
        )
    )


def pq_codes(
    e: DataFrame, cb: DataFrame, m: int = 8, ks: int = 4, dim: int = DIM
) -> DataFrame:
    """(vec_id, m, code): every vector encoded against the codebooks —
    m bytes per vector at ks <= 256 (the 100 TB story: a D=64 float32
    corpus compresses 32x; the scoring pass never touches floats again)."""
    ds = dim // m
    sub = e.select(
        "vec_id",
        F.explode(F.expr(f"sequence(0, {m - 1})")).alias("m"),
        "embedding",
    ).select(
        "vec_id", "m",
        F.expr(f"slice(embedding, m * {ds} + 1, {ds})").alias("sv"),
    )
    return (
        sub.join(F.broadcast(cb), "m")
        .withColumn("_l2", F.expr(_L2.format(v="sv", c="cvec")))
        .groupBy("vec_id", "m")
        .agg((F.min(F.expr(_pq_argmin_key(ks))) % ks).alias("code"))
    )


def pq_adc_topk(
    e: DataFrame,
    cb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 4,
    dim: int = DIM,
) -> DataFrame:
    """(probe_id, vec_id, adc_e6) per-probe top-k by asymmetric distance:
    probe-to-codeword distances form a broadcast (probe, m, code) lookup
    table of integers (e6-quantized), a vector's approx distance is the
    integer sum of its m code entries. Ranking is a per-probe window."""
    ds = dim // m
    psub = probes.select(
        "probe_id",
        F.explode(F.expr(f"sequence(0, {m - 1})")).alias("m"),
        "probe",
    ).select(
        "probe_id", "m",
        F.expr(f"slice(probe, m * {ds} + 1, {ds})").alias("psv"),
    )
    lut = (
        cb.join(F.broadcast(psub), "m")
        .select(
            "probe_id", "m", F.col("code_id").alias("code"),
            F.round(
                F.expr(_L2.format(v="psv", c="cvec")) * 1000000, 0
            ).cast("bigint").alias("pd_e6"),
        )
    )
    codes = pq_codes(e, cb, m, ks, dim)
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .where(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("pd_e6").alias("adc_e6"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_e6").asc(), "vec_id"
    )
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def pq_rerank_topk(
    e: DataFrame,
    cb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    m: int = 8,
    ks: int = 4,
    dim: int = DIM,
) -> DataFrame:
    """The production PQ pattern: ADC shortlist (cheap, codes-only) then
    EXACT cosine re-rank of the shortlist — candidate fraction
    shortlist/(n-1) with brute-force-quality scores inside it."""
    cand = pq_adc_topk(e, cb, probes, shortlist, m, ks, dim).select(
        "probe_id", "vec_id"
    )
    return score_topk(e, probes, cand, k)
