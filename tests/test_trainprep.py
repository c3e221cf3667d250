"""Semantic tests for queries_trainprep: each query runs through its REAL
graded path (a crafted ``documents.parquet`` in a tmp sf_dir) and is
compared against an independent pure-Python reference — not the DuckDB
oracle (tests/test_oracle.py already replicates the driver gate at sf0.01).

Plan pins: chunking and split assignment are map-only (zero Exchange —
at 100 TB they run at scan parallelism); the leakage guard never plans a
single-partition Exchange.
"""

from __future__ import annotations

import hashlib
import random
import re

from ocr_spark.queries import QUERIES
import ocr_spark.queries_trainprep as tp  # registers; constants
from tests.test_corpusml import _write_documents
from tests.test_plans import _plan


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- pure-Python references ---------------------------------------------------------


def _ref_chunks(text: str, w: int, s: int):
    """(chunk_id, n_tok, chunk_md5) per window — independent formulation:
    walk the stride positions directly instead of computing a count."""
    words = [x for x in text.split(" ") if x != ""]
    out = []
    pos = 0
    while True:
        chunk = words[pos : pos + w]
        out.append((len(out), len(chunk), _md5(" ".join(chunk))))
        if pos + w >= len(words):
            break
        pos += s
    return out


def _ref_split(source: str) -> str:
    h = _md5(tp.SPLIT_SEED + source)[:2]
    if h < tp._T_TRAIN:
        return "train"
    if h < tp._T_VAL:
        return "val"
    return "test"


# --- context-window chunking --------------------------------------------------------


def test_chunk_windows_matches_reference(spark, tmp_path):
    rng = random.Random(7)
    w, s = tp.CHUNK_W, tp.CHUNK_S
    rows = [
        (0, "", "en", "s0"),                           # empty doc
        (1, "one", "en", "s0"),                        # single token
        (2, " ".join(f"t{i}" for i in range(w)), "en", "s0"),      # == W
        (3, " ".join(f"t{i}" for i in range(w + 1)), "en", "s0"),  # W + 1
        (4, " ".join(f"t{i}" for i in range(w + s)), "en", "s0"),  # exact stride
        (5, "a  b   c", "en", "s0"),                   # runs of spaces
    ] + [
        (10 + i, " ".join(f"w{rng.randrange(50)}"
                          for _ in range(rng.randrange(1, 400))), "en", "s1")
        for i in range(20)
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        (r.doc_id, r.chunk_id): (r.n_tok, r.chunk_md5)
        for r in QUERIES["pipe_chunk_windows"](spark, sf).collect()
    }
    want = {
        (doc_id, cid): (n_tok, h)
        for doc_id, text, _, _ in rows
        for cid, n_tok, h in _ref_chunks(text, w, s)
    }
    assert got == want


def test_chunk_windows_cover_every_token(spark, tmp_path):
    """No token is dropped: the windows' [pos, pos+n_tok) ranges cover
    [0, n) for every doc (stride < width guarantees overlap, the tail
    window is clamped, never skipped)."""
    w, s = tp.CHUNK_W, tp.CHUNK_S
    assert s < w
    rows = [(i, " ".join(f"t{j}" for j in range(i)), "en", "s") for i in
            [0, 1, w - 1, w, w + 1, w + s - 1, w + s, w + s + 1, 7 * s + w, 400]]
    sf = _write_documents(tmp_path, rows)
    by_doc: dict[int, list] = {}
    for r in QUERIES["pipe_chunk_windows"](spark, sf).collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tok))
    for doc_id, text, _, _ in rows:
        n = len([x for x in text.split(" ") if x])
        chunks = sorted(by_doc[doc_id])
        covered = 0  # windows start at chunk_id * S and are contiguous
        for cid, n_tok in chunks:
            start = cid * s
            assert start <= covered  # no gap
            covered = max(covered, start + n_tok)
        assert covered == n


# --- group-keyed holdout split ------------------------------------------------------


def test_split_holdout_matches_reference_and_is_group_pure(spark, tmp_path):
    rows = [(i, f"doc {i} text", "en", f"site{i % 97}") for i in range(500)]
    sf = _write_documents(tmp_path, rows)
    got = QUERIES["pipe_split_holdout"](spark, sf).collect()
    assert len(got) == 500
    per_group: dict[str, set] = {}
    for r in got:
        assert r.split == _ref_split(r.source)
        per_group.setdefault(r.source, set()).add(r.split)
    # group-purity: every group lands in exactly one split
    assert all(len(v) == 1 for v in per_group.values())
    # with 97 groups all three splits should be populated and train-heavy
    splits = {g: next(iter(v)) for g, v in per_group.items()}
    counts = {s: list(splits.values()).count(s) for s in
              ("train", "val", "test")}
    assert counts["train"] > counts["val"] + counts["test"]
    assert counts["val"] >= 1 and counts["test"] >= 1


def test_split_stable_under_corpus_growth(spark, tmp_path):
    """Adding documents never moves an existing group's split (assignment
    is a pure function of the group key — corpus-size independent)."""
    small = [(i, f"a {i}", "en", f"g{i}") for i in range(50)]
    (tmp_path / "small").mkdir()
    (tmp_path / "big").mkdir()
    sf1 = _write_documents(tmp_path / "small", small)
    big = small + [(1000 + i, f"b {i}", "en", f"h{i}") for i in range(200)]
    sf2 = _write_documents(tmp_path / "big", big)
    a = {r.source: r.split
         for r in QUERIES["pipe_split_holdout"](spark, sf1).collect()}
    b = {r.source: r.split
         for r in QUERIES["pipe_split_holdout"](spark, sf2).collect()}
    assert all(b[g] == s for g, s in a.items())


# --- cross-split leakage guard ------------------------------------------------------


def test_split_leakage_flags_cross_split_duplicates(spark, tmp_path):
    """Exact duplicates collide in every MinHash band, so a duplicate pair
    whose sources hash to different splits MUST surface with is_leak=1,
    and a within-split duplicate pair with is_leak=0. Distinct filler docs
    must not pair at all."""
    # find sources hashing to distinct splits
    by_split: dict[str, str] = {}
    i = 0
    while len(by_split) < 3:
        g = f"site{i}"
        by_split.setdefault(_ref_split(g), g)
        i += 1
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, dup, "en", by_split["train"]),
        (2, dup, "en", by_split["test"]),   # cross-split leak
        (3, dup, "en", by_split["train"]),  # within-split dup
        (10, "completely unrelated alpha beta gamma delta words", "en",
         by_split["train"]),
        (11, "different filler content with nothing shared here at all",
         "en", by_split["val"]),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {(r.doc_a, r.doc_b): (r.split_a, r.split_b, r.is_leak)
           for r in QUERIES["pipe_split_leakage"](spark, sf).collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)] == ("train", "test", 1)
    assert got[(1, 3)] == ("train", "train", 0)
    assert got[(2, 3)] == ("test", "train", 1)


# --- plan pins ----------------------------------------------------------------------


def test_chunk_and_split_plans_are_map_only(spark):
    sf = "/root/testdata/sf0.001"
    for name in ("pipe_chunk_windows", "pipe_split_holdout"):
        plan = _plan(QUERIES[name](spark, sf))
        assert "Exchange" not in plan, name
        assert "Python" not in plan, name  # pure JVM column expressions


def test_leakage_plan_no_single_partition(spark):
    plan = _plan(QUERIES["pipe_split_leakage"](spark, "/root/testdata/sf0.001"))
    assert "Exchange SinglePartition" not in plan
    assert "Python" not in plan
    # the split lookups join on doc ids; the band self-join reuses one
    # signature exchange (ReuseExchange pinned for the pairs plan in
    # test_plans) — just require the plan stays a hash-join shape
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_triplets_reference_and_yield_law(spark):
    """pipe_triplets: negatives equal a pure-Python replay of the
    md5-slot draw + cross-source filter; every anchor keeps <= 3 slots;
    every kept negative is cross-source; positives are the same-source
    successor (NULL only for each source's max doc_id)."""
    import hashlib
    from collections import defaultdict

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_trainprep  # noqa: F401

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["pipe_triplets"](spark, sf).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in t(spark, sf, "documents").select("doc_id", "source").collect()
    }
    mx = max(docs)

    want = set()
    for a, src in docs.items():
        for s in (1, 2, 3):
            p = int(hashlib.md5(f"{a}#{s}".encode()).hexdigest()[:13], 16) % (
                mx + 1
            )
            if p in docs and docs[p] != src:
                want.add((a, s, p))
    assert {(r["anchor_id"], r["slot"], r["neg_id"]) for r in rows} == want

    per_anchor = defaultdict(int)
    by_source = defaultdict(list)
    for d, src in docs.items():
        by_source[src].append(d)
    succ = {}
    for src, ids in by_source.items():
        ids.sort()
        for i, d in enumerate(ids):
            succ[d] = ids[i + 1] if i + 1 < len(ids) else None
    for r in rows:
        per_anchor[r["anchor_id"]] += 1
        assert r["neg_source"] != r["anchor_source"]
        assert r["pos_id"] == succ[r["anchor_id"]], r["anchor_id"]
    assert max(per_anchor.values()) <= 3


def test_span_corruption_roundtrip_and_reference(spark):
    """pipe_span_corruption: substituting each sentinel in input_text by
    its target span reproduces the original word sequence EXACTLY for
    every doc (the denoising round-trip invariant), and a pure-Python
    builder reproduces both texts."""
    import hashlib
    import re

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_trainprep  # noqa: F401

    sf = "/root/testdata/sf0.01"
    rows = {
        r["doc_id"]: r
        for r in QUERIES["pipe_span_corruption"](spark, sf).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in t(spark, sf, "documents").select("doc_id", "text").collect()
    }
    for did, text in texts.items():
        words = [w for w in text.split(" ") if w]
        if not words:
            assert did not in rows
            continue
        r = rows[did]
        assert r["n_words"] == len(words)

        # parse target into sentinel -> span words
        tgt = r["target_text"].split(" ") if r["target_text"] else []
        spans, cur = {}, None
        for tok in tgt:
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                cur = m.group(1)
                spans[cur] = []
            else:
                spans[cur].append(tok)
        # round-trip: expand input sentinels
        out = []
        for tok in r["input_text"].split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                out.extend(spans[m.group(1)])
            else:
                out.append(tok)
        assert out == words, did
        assert all(len(s) == 3 for s in spans.values())

        # python reference of the deterministic mask positions
        inp_ref, tgt_ref = [], []
        for k in range(0, (len(words) + 19) // 20):
            ww = words[k * 20 : k * 20 + 20]
            if len(ww) >= 3:
                h = int(
                    hashlib.md5(f"sc#{did}#{k}".encode()).hexdigest()[:13],
                    16,
                )
                o = h % (len(ww) - 2)
                inp_ref += ww[:o] + [f"<extra_id_{k}>"] + ww[o + 3 :]
                tgt_ref += [f"<extra_id_{k}>"] + ww[o : o + 3]
            else:
                inp_ref += ww
        assert r["input_text"] == " ".join(inp_ref), did
        assert r["target_text"] == " ".join(tgt_ref), did
