"""Sketch block gates (functions/sketch.py, queries_sketch.py): each
structure is checked against an independent pure-Python reference built
from hashlib — the same md5 bit math, none of the Spark/SQL code — plus
the invariants that make each sketch trustworthy at scale:

* Bloom: exact word-table equality, NO false negative ever, probe plan
  keeps the filter on the broadcast side.
* Count-min: exact matrix equality, one-sided error (est ≥ true for
  EVERY token, not just the graded top-20).
* HLL: exact register equality, the MERGE law (registers of a union =
  elementwise max of the parts' registers — what makes it distributable),
  estimate within the raw-HLL error envelope on the synth corpus, and
  partition invariance.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions import sketch as sk
from tests.conftest import SF_SMALL

_OFFS = (0, 7, 14, 21)  # 0-based equivalents of the module's 1/8/15/22


def _h(s: str, slot: int) -> int:
    hx = hashlib.md5(s.encode()).hexdigest()
    return int(hx[_OFFS[slot]:_OFFS[slot] + 7], 16)


def _urls(n=300):
    return [f"https://h{i % 24}.test/p/{i}" for i in range(n)]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(_urls())], "doc_id bigint, url string"
    )


# --- Bloom ------------------------------------------------------------------


def _ref_bloom(keys, m=sk.BLOOM_M_BITS, k=sk.BLOOM_K):
    words: dict[int, int] = {}
    for s in keys:
        for i in range(k):
            pos = _h(s, i) % m
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    return words


def test_bloom_words_equal_reference(spark, url_df):
    keys = url_df.where(F.col("doc_id") % 2 == 0)
    got = {
        r.word: r.bits for r in sk.bloom_build(keys, "url").collect()
    }
    want = _ref_bloom([u for i, u in enumerate(_urls()) if i % 2 == 0])
    assert got == want


def test_bloom_no_false_negatives_and_probe_matches_reference(
    spark, url_df
):
    keys = url_df.where(F.col("doc_id") % 2 == 0)
    bloom = sk.bloom_build(keys, "url")
    hits = {
        r.doc_id: r.bloom_hit
        for r in sk.bloom_probe(url_df, bloom, "doc_id", "url").collect()
    }
    words = _ref_bloom([u for i, u in enumerate(_urls()) if i % 2 == 0])

    def ref_hit(s):
        for i in range(sk.BLOOM_K):
            pos = _h(s, i) % sk.BLOOM_M_BITS
            if not (words.get(pos // 32, 0) >> (pos % 32)) & 1:
                return False
        return True

    for i, u in enumerate(_urls()):
        assert hits[i] == ref_hit(u)
        if i % 2 == 0:
            assert hits[i], f"false negative for member {u}"


def test_bloom_partition_invariance(spark, url_df):
    keys = url_df.where(F.col("doc_id") % 2 == 0)
    a = sorted(
        map(tuple, sk.bloom_build(keys.repartition(1), "url").collect())
    )
    b = sorted(
        map(tuple, sk.bloom_build(keys.repartition(13), "url").collect())
    )
    assert a == b


# --- count-min ---------------------------------------------------------------


def _tokens():
    # skewed stream: token t_i appears i+1 times
    out = []
    for i in range(40):
        out += [f"tok{i}"] * (i + 1)
    return out


@pytest.fixture(scope="module")
def tok_df(spark):
    return spark.createDataFrame(
        [(t,) for t in _tokens()], "tok string"
    )


def test_cms_matrix_equals_reference(spark, tok_df):
    ref: dict[tuple[int, int], int] = {}
    for t in _tokens():
        for i in range(sk.CMS_D):
            c = (i, _h(t, i) % sk.CMS_W)
            ref[c] = ref.get(c, 0) + 1
    got = {
        (r.row, r.col): r.cnt
        for r in sk.cms_build(tok_df, "tok").collect()
    }
    assert got == ref


def test_cms_never_underestimates(spark, tok_df):
    cms = sk.cms_build(tok_df, "tok")
    est = {
        r.tok: r.est
        for r in sk.cms_estimate(
            tok_df.distinct(), cms, "tok"
        ).collect()
    }
    true = {}
    for t in _tokens():
        true[t] = true.get(t, 0) + 1
    assert set(est) == set(true)
    for t, n in true.items():
        assert est[t] >= n, f"CMS under-counted {t}: {est[t]} < {n}"


# --- HLL ---------------------------------------------------------------------


def _ref_registers(keys):
    regs: dict[int, int] = {}
    for s in keys:
        h = _h(s, 0)
        b, rest = h % sk.HLL_M, h // sk.HLL_M
        rank = (
            sk.HLL_RANK_MAX
            if rest == 0
            else sk.HLL_RANK_MAX - rest.bit_length()
        )
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def test_hll_registers_equal_reference(spark, url_df):
    got = {
        r.bucket: r.reg
        for r in sk.hll_registers(url_df, "url").collect()
    }
    assert got == _ref_registers(_urls())


def test_hll_merge_law(spark, url_df):
    """registers(A ∪ B) == elementwise max(registers(A), registers(B)) —
    the property that lets per-partition/per-day sketches fold without
    touching raw data again."""
    a = url_df.where(F.col("doc_id") < 150)
    b = url_df.where(F.col("doc_id") >= 150)
    ra = {r.bucket: r.reg for r in sk.hll_registers(a, "url").collect()}
    rb = {r.bucket: r.reg for r in sk.hll_registers(b, "url").collect()}
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    whole = {
        r.bucket: r.reg
        for r in sk.hll_registers(url_df, "url").collect()
    }
    assert whole == merged


def test_hll_estimate_in_raw_envelope(spark, url_df):
    regs = sk.hll_registers(url_df, "url")
    est = sk.hll_estimate(regs).collect()[0].est
    # raw HLL with m=64: σ ≈ 1.04/√64 = 13%; allow 3σ on one corpus
    assert abs(est - 300) <= 0.39 * 300, est


def test_hll_partition_invariance(spark, url_df):
    regs1 = sorted(
        map(
            tuple,
            sk.hll_registers(url_df.repartition(1), "url").collect(),
        )
    )
    regs17 = sorted(
        map(
            tuple,
            sk.hll_registers(url_df.repartition(17), "url").collect(),
        )
    )
    assert regs1 == regs17


# --- plan pins ---------------------------------------------------------------


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bloom_probe_is_broadcast_no_python(spark):
    from ocr_spark.queries_sketch import q_sketch_bloom_seen

    plan = _plan(q_sketch_bloom_seen(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_cms_and_hll_stay_jvm_side(spark):
    from ocr_spark.queries_sketch import (
        q_sketch_cms_heavy,
        q_sketch_hll_distinct,
    )

    for q in (q_sketch_cms_heavy, q_sketch_hll_distinct):
        plan = _plan(q(spark, SF_SMALL))
        assert "Python" not in plan
    # the heavy-hitter top-20 must be a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in _plan(
        q_sketch_cms_heavy(spark, SF_SMALL)
    )


# --- streaming HLL maintenance ------------------------------------------------


def test_stream_hll_two_waves_fold_to_batch_registers(spark, tmp_path):
    """Wave 1 (2 files) then wave 2 (1 more file) through the exactly-once
    committer: after each wave the MAX-folded totals equal the batch
    registers of everything ingested so far (the merge law, live); an
    idle re-run commits nothing new."""
    from ocr_spark.streaming.incremental import hll_totals, incremental_hll

    urls = _urls()
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    df.where(F.col("doc_id") < 200).repartition(2).write.parquet(src)

    def run():
        writer, committer = incremental_hll(
            spark, src, df.schema, out, ckpt, key_expr="url"
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return committer

    c1 = run()
    got1 = {r.bucket: r.reg for r in hll_totals(spark, out).collect()}
    assert got1 == _ref_registers(urls[:200])
    n_wave1 = len(c1.committed())
    assert n_wave1 == 2  # maxFilesPerTrigger=1 over 2 files

    df.where(F.col("doc_id") >= 200).repartition(1).write.mode(
        "append"
    ).parquet(src)
    c2 = run()
    got2 = {r.bucket: r.reg for r in hll_totals(spark, out).collect()}
    assert got2 == _ref_registers(urls)
    n_wave2 = len(c2.committed())
    assert n_wave2 == 3  # exactly one more micro-batch

    c3 = run()  # idle: no new files -> no new commits
    assert len(c3.committed()) == n_wave2
    got3 = {r.bucket: r.reg for r in hll_totals(spark, out).collect()}
    assert got3 == got2


# --- histogram quantile sketch -------------------------------------------------


def test_hist_merge_by_sum_and_quantiles_match_reference(spark):
    import math

    vals = [((i * 37) % 800) for i in range(500)]  # includes > domain/.. spread
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    hist = {r.bucket: r.cnt for r in sk.hist_build(df, "x").collect()}
    ref = {}
    for v in vals:
        bk = max(0, min(sk.HIST_B - 1, v * sk.HIST_B // sk.HIST_DOMAIN))
        ref[bk] = ref.get(bk, 0) + 1
    assert hist == ref
    # merge law: histograms of halves SUM to the whole
    ha = {
        r.bucket: r.cnt
        for r in sk.hist_build(
            spark.createDataFrame([(v,) for v in vals[:250]], "x bigint"),
            "x",
        ).collect()
    }
    hb = {
        r.bucket: r.cnt
        for r in sk.hist_build(
            spark.createDataFrame([(v,) for v in vals[250:]], "x bigint"),
            "x",
        ).collect()
    }
    merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    assert merged == ref
    # quantile estimates: upper bucket edge at the ceil-rank threshold,
    # within one bucket width of the exact rank statistic
    got = {
        r.q: r.est_hi
        for r in sk.hist_quantiles(
            sk.hist_build(df, "x"), (25, 50, 75, 99)
        ).collect()
    }
    sv = sorted(vals)
    width = sk.HIST_DOMAIN // sk.HIST_B
    for q in (25, 50, 75, 99):
        exact = sv[math.ceil(q * len(sv) / 100) - 1]
        assert exact < got[q] <= exact + width + (
            width - 1 - (exact % width)
        ), (q, got[q], exact)


def test_hist_clamps_out_of_domain(spark):
    df = spark.createDataFrame(
        [(-5,), (0,), (sk.HIST_DOMAIN - 1,), (sk.HIST_DOMAIN + 999,)],
        "x bigint",
    )
    hist = {r.bucket: r.cnt for r in sk.hist_build(df, "x").collect()}
    assert hist == {0: 2, sk.HIST_B - 1: 2}


# --- KMV bottom-k sketch -------------------------------------------------------


def test_kmv_reference_merge_law_and_error_bound(spark):
    """sketch_kmv_jaccard: all 10 measures equal a pure-Python hashlib
    replay; the merge law holds (union-from-sketches kth == direct
    kth); the KMV distinct estimate lands within 3 standard errors
    (~1/sqrt(k-2)) of the exact distinct for both sources."""
    import hashlib

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_sketch  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        r["measure"]: r["value"]
        for r in QUERIES["sketch_kmv_jaccard"](spark, sf).collect()
    }

    vocab = {"src1": set(), "src2": set()}
    for r in t(spark, sf, "documents").select("source", "text").collect():
        if r["source"] in vocab:
            for w in r["text"].lower().split(" "):
                if w:
                    vocab[r["source"]].add(w)

    def hv(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:13], 16)

    k = 16

    def est(sk_vals, n_exact):
        if len(sk_vals) < k:
            return len(sk_vals)
        return (k - 1) * (1 << 52) // sk_vals[-1]

    sk = {s: sorted(hv(w) for w in ws)[:k] for s, ws in vocab.items()}
    uk = sorted(set(sk["src1"]) | set(sk["src2"]))[:k]
    ud = sorted({hv(w) for ws in vocab.values() for w in ws})[:k]
    inter = sum(
        1 for h in uk if h in set(sk["src1"]) and h in set(sk["src2"])
    )
    ni = len(vocab["src1"] & vocab["src2"])
    nu = len(vocab["src1"] | vocab["src2"])
    want = {
        "kth_src1": sk["src1"][-1],
        "kth_src2": sk["src2"][-1],
        "est_src1": est(sk["src1"], len(vocab["src1"])),
        "est_src2": est(sk["src2"], len(vocab["src2"])),
        "kth_union_from_sketches": uk[-1],
        "kth_union_direct": ud[-1],
        "jaccard_e6_est": inter * 1_000_000 // len(uk),
        "jaccard_e6_true": ni * 1_000_000 // nu,
        "exact_distinct_src1": len(vocab["src1"]),
        "exact_distinct_src2": len(vocab["src2"]),
    }
    assert got == want
    assert got["kth_union_from_sketches"] == got["kth_union_direct"]
    for s in ("src1", "src2"):
        exact = got[f"exact_distinct_{s}"]
        assert exact > k  # the estimator arm (not the exact arm) fires
        err = 3 * exact / (k - 2) ** 0.5
        assert abs(got[f"est_{s}"] - exact) <= err, (s, got[f"est_{s}"], exact)
