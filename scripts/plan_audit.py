"""Dump audited physical plans to PLANS.md (SURVEY.md §4 evidence).

The properties narrated here are enforced as regression tests in
tests/test_plans.py; this file is the human-readable audit trail.

Usage: ``python scripts/plan_audit.py``
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def tree_of(df, max_lines: int | None = None) -> str:
    """Just the plan tree (the part before the per-node details).

    ``max_lines`` truncates plans whose printout embeds cached lineage
    (InMemoryRelation prints its full child plan — an eagerly-materialized
    iterative result would otherwise dump every round's subtree)."""
    full = plan_of(df)
    tree = full.split("\n\n(1)")[0].rstrip()
    if max_lines is not None:
        lines = tree.splitlines()
        if len(lines) > max_lines:
            tree = "\n".join(lines[:max_lines]) + (
                f"\n... ({len(lines) - max_lines} cached-lineage lines"
                " truncated: InMemoryRelation prints the full child plan)"
            )
    return tree


def main() -> None:
    import __spark_entry__ as em
    from ocr_spark.gen import fixture_pages_df
    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          app_name="plan-audit")
    q = em.queries()
    sf = "/root/testdata/sf0.001"
    fixtures = fixture_pages_df(spark)

    import tempfile

    pages_pq = tempfile.mkdtemp(prefix="plan-audit-") + "/pages"
    fixtures.write.parquet(pages_pq)

    sections = []

    sections.append((
        "Flagship extraction (fused, production path)",
        "No `Exchange` anywhere: part_id derivation, the single `MapInArrow` "
        "parse hop, and the classify/smooth/assemble array expressions are "
        "all narrow — throughput scales with input splits, which is what the "
        "N→4N executor measurements in BENCH/BASELINE.md reflect. "
        "Exactly one JVM→Python boundary; everything downstream is JVM-side "
        "Project nodes.",
        tree_of(extract_pages(fixtures)),
    ))

    df = (
        spark.read.parquet(pages_pq)
        .filter(F.col("lang") == "en")
        .select("url", "lang")
    )
    full = plan_of(df)
    scan_detail = next(
        (p for p in full.split("\n\n") if "PushedFilters" in p), full
    )
    sections.append((
        "Predicate + projection pushdown",
        "`lang = 'en'` reaches the parquet scan as a pushed filter and the "
        "ReadSchema is pruned to exactly the selected columns — at 100 TB "
        "the scan materializes two columns of the matching row groups, "
        "nothing else.",
        tree_of(df) + "\n\n" + scan_detail,
    ))

    ex_scan = extract_pages(spark.read.parquet(pages_pq))
    full = plan_of(ex_scan)
    scan_detail = next(
        (p for p in full.split("\n\n") if "ReadSchema" in p), ""
    )
    sections.append((
        "Extraction over a parquet pages table",
        "Column pruning drops the crawl-provided `text` column from the "
        "scan (the pipeline never uses it): ReadSchema is "
        "url/warc_ts/html/lang only.",
        scan_detail,
    ))

    sections.append((
        "join_broadcast (op 19)",
        "`part` is broadcast: BroadcastHashJoin, the lineitem side is never "
        "shuffled.",
        tree_of(q["join_broadcast"](spark, sf)),
    ))

    sections.append((
        "join_shuffle (op 20)",
        "orders ⋈ lineitem on the order key: shuffle join chosen by "
        "Catalyst/AQE (both sides large).",
        tree_of(q["join_shuffle"](spark, sf)),
    ))

    sections.append((
        "agg_basic (op 27)",
        "HashAggregate appears twice around the exchange: map-side partial "
        "aggregation, then final — the shuffle carries pre-aggregated "
        "per-group state, not raw rows.",
        tree_of(q["agg_basic"](spark, sf)),
    ))

    sections.append((
        "sim_ann_search (LSH-bucketed ANN)",
        "The probe TABLE is broadcast; candidate filtering happens where "
        "the embeddings already live, and the only shuffle is the "
        "probe_id-keyed window top-k — never a global sort.",
        tree_of(q["sim_ann_search"](spark, sf)),
    ))

    sections.append((
        "join_range_bucket (pure non-equi interval join, decomposed)",
        "No NestedLoop node: the time-bucket key turns the pure range join "
        "into a shuffled equi-join with a residual filter — 2x duplication "
        "of the filtered probe side instead of |A|x|B| comparisons.",
        tree_of(q["join_range_bucket"](spark, sf)),
    ))

    sections.append((
        "dedup_minhash_pairs (LSH band self-join, 16 perms / 4 bands)",
        "The self-join shuffles on the (band index, band key) pair — a hash "
        "join over band buckets, never an all-pairs comparison; docs without "
        "shingles are filtered out before banding so the near-empty-page "
        "population cannot form a mega-bucket.",
        tree_of(q["dedup_minhash_pairs"](spark, sf)),
    ))

    sections.append((
        "sim_ann_multiprobe (probe-table batch ANN, Hamming-1 multi-probe)",
        "Each probe is exploded into its bucket plus the 8 one-plane-flip "
        "neighbor buckets (Generate on the SMALL side, before the "
        "broadcast); candidates still meet the join as a bucket equi-join, "
        "each candidate matching a probe at most once. Per-probe ranking "
        "shuffles on probe_id only (window top-k); the embedding table is "
        "never exchanged for the join itself.",
        tree_of(q["sim_ann_multiprobe"](spark, sf)),
    ))

    sections.append((
        "dedup_jaccard (MinHash-band candidates, exact verify)",
        "The LSH-candidates -> exact-verify pipeline: candidate pairs come "
        "from the same banded self-join as dedup_minhash_pairs (bucketed, "
        "never all-pairs), then two hash joins on doc_id fetch the word "
        "sets and score exact Jaccard — only candidate rows are ever "
        "scored.",
        tree_of(q["dedup_jaccard"](spark, sf)),
    ))

    from ocr_spark.queries_textml import (
        minhash_band_keys,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    b = minhash_band_keys(minhash_signatures(docs))
    labels0 = (
        b.select("doc_id").distinct().withColumn("rep", F.col("doc_id"))
    )
    bmin = (
        b.join(labels0, "doc_id")
        .groupBy("bi", "band")
        .agg(F.min("rep").alias("_bmin"))
    )
    one_round = (
        b.join(bmin, ["bi", "band"])
        .groupBy("doc_id")
        .agg(F.min("_bmin").alias("rep"))
    )
    sections.append((
        "dedup_cc — one label-propagation round (functions/graph.py)",
        "Connected components to a fixpoint without ever materializing "
        "doc–doc pair edges: each round is two hash joins + two "
        "aggregations keyed by the bucket and the doc id — every exchange "
        "carries tables linear in |membership| = docs × bands, so a "
        "1M-copy duplicate cluster costs 1M rows per round, not 5·10^11 "
        "pair rows. Rounds repeat until the labels stop changing "
        "(bucket-hop diameter, 1–3 for real dup clusters), with the labels "
        "frame persisted and the convergence count doubling as the "
        "materialization action.",
        tree_of(one_round),
    ))

    from ocr_spark.tables import read_bucketed, write_bucketed

    bt_dir = pathlib.Path(tempfile.mkdtemp(prefix="plan-audit-bt-"))
    docs_n = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_bucketed(
        docs_n, "pa_docs", str(bt_dir / "d"), ("doc_id",), 8,
        sort_cols=("doc_id",),
    )
    write_bucketed(
        docs_n.select("doc_id", F.col("n_chars").alias("feat")),
        "pa_feats", str(bt_dir / "f"), ("doc_id",), 8, sort_cols=("doc_id",),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    bt_join = read_bucketed(spark, "pa_docs").join(
        read_bucketed(spark, "pa_feats"), "doc_id"
    )
    sections.append((
        "Bucketed co-located join (tables.write_bucketed)",
        "Both tables were written with bucketBy(8, doc_id), so each scan "
        "already satisfies the join's partitioning: SortMergeJoin with "
        "ZERO Exchange (broadcast disabled here to force the fact–fact "
        "shape — at 100 TB neither side of such a join fits a broadcast). "
        "The shuffle is paid once at write time; every subsequent "
        "same-key join is scan-local. The per-bucket Sort under the SMJ "
        "remains — Spark ignores bucket sortBy metadata by default "
        "(spark.sql.legacy.bucketedTableScanOutputOrdering) — and is "
        "linear local work on a 1/N slice, not a shuffle. Regression "
        "test: tests/test_tables.py.",
        tree_of(bt_join),
    ))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS pa_docs")
    spark.sql("DROP TABLE IF EXISTS pa_feats")

    from ocr_spark.operators.runner import stage_input

    staged_dir = pathlib.Path(tempfile.mkdtemp(prefix="plan-audit-staged-"))
    staged = stage_input(spark, spark.read.parquet(pages_pq), staged_dir, 8)
    batch_read = staged.where(F.col("part_id").isin([0, 1]))
    full = plan_of(batch_read)
    scan_detail = next(
        (p for p in full.split("\n\n") if "PartitionFilters" in p), full
    )
    sections.append((
        "Batch runner: staged input, per-batch partition pruning",
        "After the one-pass staging write, part_id is a physical partition "
        "column: the per-batch filter appears as PartitionFilters on the "
        "scan (directory pruning), so a multi-batch run reads the raw input "
        "exactly once — tests/test_runner_scan.py proves it by deleting the "
        "raw input after the first batch.",
        scan_detail,
    ))

    sections.append((
        "pipe_pack_hashed (round 4 — token packing on the hashed shard key)",
        "ONE Exchange total, keyed on the derived `pack_shard = "
        "pmod(hash(id), P)`: scan → project (shard + token count, pure JVM) "
        "→ Exchange → Sort → running-sum Window → aggregates. Parallelism "
        "is `num_shards` regardless of any data column's cardinality; no "
        "SinglePartition window anywhere (pinned in tests/test_plans.py). "
        "At 100 TB the single shuffle moves (id, shard, n_tokens) — three "
        "columns, not the text.",
        tree_of(q["pipe_pack_hashed"](spark, sf)),
    ))

    sections.append((
        "sim_ann_ivf_trained (round 4 — trained-centroid IVF)",
        "Every pass over the big embeddings table joins against a BROADCAST "
        "side: training assignment against the 8 seed centroids, final "
        "assignment against the trained table, scoring against the probe "
        "row. The only SortMergeJoin is seeds⟕trained-means — an 8-row × "
        "≤8-row join. Shuffles are confined to tiny-key aggregations "
        "((list_id, dim) means and the per-vec argmin regroup); nothing "
        "shuffles the embeddings by a data-dependent key.",
        tree_of(q["sim_ann_ivf_trained"](spark, sf)),
    ))

    sections.append((
        "dedup_substr_spans (round 4 — exact-substring duplicate spans)",
        "Lee-et-al substring dedup as a rolling k-gram inverted index: "
        "EXACTLY two shuffles, one scan, never a doc–doc pair. Gram hashes "
        "are built per doc as ONE array transform before the posexplode "
        "(the text is never replicated across position rows); the dup test "
        "is `count(*) OVER (PARTITION BY g)` — replacing the groupBy + "
        "join-back formulation measured 15.0s → 4.1s at sf0.1 (the join "
        "recomputes the gram lineage for both branches). Skew note: the "
        "window co-locates a gram's occurrences, so the per-task bound is "
        "the corpus max gram frequency — run with the content-keyed "
        "sample_mod at web scale; the hot-gram case is pinned timing-free "
        "in tests/test_corpusml.py.",
        tree_of(q["dedup_substr_spans"](spark, sf)),
    ))

    sections.append((
        "dedup_substr_clean (round 4 — the substring-dedup removal path)",
        "substr_dup_spans' two shuffles plus: the corpus-first-occurrence "
        "winner (`row_number() OVER (PARTITION BY g ORDER BY doc_id, p)` — "
        "rides the SAME gram Exchange as the count window; never a packed "
        "doc_id*BASE+p scalar, which overflows on production 64-bit hash "
        "ids — the corpus_job e2e test caught exactly that), a per-doc "
        "interval collect, and ONE join back to documents for the segment "
        "rebuild (broadcast at test scale; statistics pick a doc_id hash "
        "join when the interval side outgrows it). The rebuild is a JVM "
        "`aggregate` fold over the sorted interval array — per-row, no "
        "extra shuffle, partitioning-invariant (pinned in "
        "tests/test_corpusml.py).",
        tree_of(q["dedup_substr_clean"](spark, sf)),
    ))

    sections.append((
        "sim_ann_pq (round 4 — product-quantization ANN)",
        "All THREE joins are broadcast (codebook KS·M rows, probe LUT KS·M "
        "rows); the final top-10 is TakeOrderedAndProject — no global "
        "sort. The two Exchanges are the per-(vec, subspace) argmin "
        "regroup and the per-vec integer ADC sum. At scale the codes "
        "table is M bytes/vector (32× compression at D=64 float32): the "
        "scoring pass reads codes + a broadcast integer LUT, touching no "
        "float vectors at all.",
        tree_of(q["sim_ann_pq"](spark, sf)),
    ))

    from ocr_spark.operators.extract import extract_outlinks
    from ocr_spark.queries_webgraph import _link_pages

    sections.append((
        "extract_outlinks (round 4 — SPEC §5 outlink product)",
        "Same flagship shape as extraction: zero `Exchange`, exactly one "
        "`MapInArrow` hop, then a JVM-side `Generate` (posexplode) — the "
        "WAT-style link product is embarrassingly parallel and its "
        "throughput scales with input splits exactly like extracted text.",
        tree_of(extract_outlinks(_link_pages(spark, sf))),
    ))

    from ocr_spark.operators.extract import extract_metadata
    from ocr_spark.queries_webgraph import _meta_pages

    sections.append((
        "extract_metadata (round 4 — SPEC §6 page metadata)",
        "The WAT-record head fields (title / description / canonical / "
        "og:title) ride the SAME single MapInArrow parse: zero `Exchange`, "
        "one JVM projection off the meta struct. In the production runner "
        "the parsed relation is persisted per batch and feeds the text, "
        "link AND metadata sinks — requesting metadata never re-runs the "
        "Python parse (proved by the lineage input counts in "
        "tests/test_resume.py).",
        tree_of(extract_metadata(_meta_pages(spark, sf))),
    ))

    sections.append((
        "graph_hostlinks (round 4 — host-level link graph)",
        "The host attribution (absolute/protocol-relative/relative href "
        "resolution) is pure JVM regex projection on top of the narrow "
        "outlink plan; the ONLY Exchange is the partial+final count "
        "aggregation on (src_host, dst_host). Nothing quadratic; the edge "
        "aggregate is linear in extracted links.",
        tree_of(q["graph_hostlinks"](spark, sf)),
    ))

    sections.append((
        "graph_pagerank (round 4 — iterative, eager rounds)",
        "Iterative algorithms follow the functions/graph.py contract: each "
        "round is materialized (persist + count) and the previous round's "
        "cache dropped, so recompute depth stays 1 — a fully-lazy 5-round "
        "plan measured 64 redundant parquet scans. The cached edge relation "
        "is pre-hash-partitioned on src (and the node list on node), so a "
        "round's joins reuse the cached distribution; per round the only "
        "shuffle is the contribution aggregation. The plan below is the "
        "RETURNED final round: a projection over the in-memory relation.",
        tree_of(q["graph_pagerank"](spark, sf), max_lines=12),
    ))

    sections.append((
        "pipe_dsir (round 4 — importance weights)",
        "The hashed-unigram model (256 rows) is computed once (persisted) "
        "and BROADCAST back for scoring, so the corpus is scanned exactly "
        "twice (count pass, score pass) and the scoring side never "
        "shuffles except the per-doc weight sum — the DSIR shape that "
        "holds at 100 TB.",
        tree_of(q["pipe_dsir"](spark, sf)),
    ))

    sections.append((
        "quality_lr_score (round 4 — trained LR quality filter)",
        "Training runs inside the plan builder with eager rounds (see "
        "graph_pagerank note): the feature relation is cached once, each "
        "GD step joins it against a BROADCAST 64-row weight table and "
        "aggregates gradients (two linear shuffles per step), and each "
        "step's weights are materialized so steps never re-execute "
        "predecessors. Scoring below is one broadcast join + one per-doc "
        "aggregation over the cached features.",
        tree_of(q["quality_lr_score"](spark, sf), max_lines=16),
    ))

    sections.append((
        "dedup_lines_boiler (round 4 — CCNet line dedup)",
        "Three Exchanges, all linear: the (source, segment) frequency "
        "aggregation, the join back of frequencies to segments (same key — "
        "the Exchange is reused), and the per-doc reassembly groupBy. "
        "Cluster sizes never materialize as pairs; a segment shared by a "
        "million docs costs one frequency tag per occurrence.",
        tree_of(q["dedup_lines_boiler"](spark, sf)),
    ))

    from ocr_spark.sources import warc as warc_src

    warc_blobs = warc_src.blobs_by_shard(
        spark.read.parquet(pages_pq).select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("warc_date"),
            "html",
        ),
        num_files=4,
    )
    sections.append((
        "WARC ingest (round 4 — sources/warc record splitter)",
        "The read path (binaryFile scan → parse_warc) is ONE narrow "
        "MapInArrow hop before any Exchange: whole archive files are the "
        "unit of parallelism, so ingest throughput scales with the file "
        "listing, shuffle-free. The Exchange visible below belongs to the "
        "test-harness WRITE side (groupBy-shard record concat used to "
        "synthesize an archive in-plan) — real crawls arrive as files and "
        "never pay it.",
        tree_of(
            warc_src.parse_warc(warc_blobs.select(F.col("blob").alias("content")))
        ),
    ))

    sections.append((
        "web_cdx (round 4 — capture index)",
        "Map-side expressions (SURT string ops, md5, octet_length of the "
        "framed record bytes) + exactly one window partitioned by the shard "
        "file for the offset prefix-sum: the index costs one pass over the "
        "archive layout at any scale, and the per-file partition count "
        "equals the archive's own parallelism.",
        tree_of(q["web_cdx"](spark, sf)),
    ))

    sections.append((
        "pipe_robots_filter (round 4 — RFC 9309 scoping)",
        "The rules dim joins BROADCAST on host (a crawl's robots set is "
        "thousands of rows); the longest-prefix/allow-wins decision is one "
        "window over the matched candidates — the empty-prefix allow row "
        "folds the no-match default into the same window, so there is no "
        "second anti-join pass.",
        tree_of(q["pipe_robots_filter"](spark, sf)),
    ))

    sections.append((
        "web_frontier (round 4 — the composed crawl loop)",
        "diff-derived live frontier → robots scoping → politeness cycles "
        "as ONE plan: the rules dim joins BROADCAST, the verdict window "
        "partitions by url (key cardinality = frontier size, skew-free), "
        "and the cycle window partitions by host AFTER denied urls drop — "
        "so denied urls never consume fetch slots and the politeness cap "
        "bounds hot hosts by construction.",
        tree_of(q["web_frontier"](spark, sf)),
    ))

    sections.append((
        "web_url_canon (round 4 — URL canonicalization)",
        "The full frozen canonicalization (case-fold, default-port drop, "
        "unreserved percent-decode, dot-segment stack, tracking-param "
        "strip, query sort) is pure JVM column HOFs: ZERO Exchange, zero "
        "Python — scan → explode (noise harness) → one projection. "
        "Folding URL spellings is therefore free to apply before any "
        "by-url shuffle; web_url_dedup_canon below pays exactly the ONE "
        "aggregation Exchange the by-url dedup pays regardless.",
        tree_of(q["web_url_canon"](spark, sf)),
    ))

    sections.append((
        "web_sitemap_parse (round 4 — sitemap ingestion)",
        "from_xml is JVM-side (built-in XML expression, no UDF): the parse "
        "+ posexplode are map-side over however many sitemap documents "
        "arrive. The single Exchange below is the per-host groupBy that "
        "SYNTHESIZES the XML in-plan — a test-harness cost; real sitemaps "
        "arrive as fetched documents and the read path never pays it.",
        tree_of(q["web_sitemap_parse"](spark, sf)),
    ))

    sections.append((
        "pipe_chunk_windows / pipe_split_holdout (round 4 — training prep)",
        "Both are map-only: ZERO Exchange, zero Python. Chunking is "
        "words → integer chunk count → sequence-posexplode → slice, so "
        "the chunk table is produced at scan parallelism and the only "
        "cost is the inherent ~n/S output amplification; the holdout "
        "split is a pure function of md5(seed || group), so assignment "
        "is identical on every engine, retry, and cluster size, and "
        "adding documents never moves an existing group.",
        tree_of(q["pipe_chunk_windows"](spark, sf)),
    ))

    sections.append((
        "search_bm25_topk (round 4 — retrieval block)",
        "The postings build is the one explode + one shuffle; query terms "
        "and the 1-row corpus stats reach the postings via "
        "BroadcastExchange (the corpus-sized stream never reshuffles for "
        "them), scoring aggregates only the matched postings, and the "
        "top-k plans as TakeOrderedAndProject — per-partition heads + a "
        "k-row driver merge, never a global Sort+Exchange.",
        tree_of(q["search_bm25_topk"](spark, sf)),
    ))

    sections.append((
        "mm_resize_bmp (round 4 — real media decode)",
        "The heaviest media entry: synth -> REAL BMP decode -> "
        "nearest-neighbor resample -> re-encode -> decode again, all as "
        "Arrow-batched mapInPandas hops at scan parallelism — ZERO "
        "Exchange end-to-end, payloads never leave the executor.",
        tree_of(q["mm_resize_bmp"](spark, sf)),
    ))

    sections.append((
        "pipe_split_leakage (round 4 — cross-split near-dup guard)",
        "The candidate pairs come from the linear MinHash band self-join "
        "(ReuseExchange computes the signature pipeline once); the split "
        "column is a map-side expression joined back by doc id. No "
        "single-partition Exchange; at 100 TB the split annotation rides "
        "the dedup pass the pipeline already runs.",
        tree_of(q["pipe_split_leakage"](spark, sf)),
    ))

    sections.append((
        "cluster_kmeans (round 4 — integer-exact distributed k-means)",
        "One Lloyd round = a BroadcastNestedLoopJoin of the k-row "
        "centroid frame (argmin collapsed by a partial-aggregating "
        "groupBy(id): the shuffle carries ONE row per vector, not k) "
        "plus a posexplode'd groupBy(cid, dim) whose map-side combine "
        "caps every task's shuffle output at k*dim rows. Rounds are "
        "eagerly materialized (k-row persist+count, graph.pagerank "
        "contract) so plan depth stays 1; the returned assignment is "
        "localCheckpoint'd, which is why the audited tree below is the "
        "checkpoint-free construction (checkpoint=False).",
        tree_of(
            __import__(
                "ocr_spark.functions.cluster", fromlist=["kmeans_assign"]
            ).kmeans_assign(
                spark.read.parquet(f"{sf}/embeddings.parquet"),
                k=8, rounds=2, checkpoint=False,
            )
        ),
    ))

    sections.append((
        "dedup_semantic (round 4 — SemDeDup within k-means clusters)",
        "The pair space is an equi-join on the CLUSTER id (never "
        "corpus-quadratic; the skew bound is the largest cluster and the "
        "production knob is k). The cosine test is pure BIGINT HOF "
        "arithmetic on e3-quantized vectors — no Python, no float in "
        "the decision. Dropped ids distinct + left join back for the "
        "per-vector flag.",
        tree_of(q["dedup_semantic"](spark, sf)),
    ))

    sections.append((
        "profile_table (round 4 — one-pass column profiling)",
        "Every metric (nulls, exact distincts, min/max, lengths) is an "
        "aggregate of ONE parquet scan: Expand implements the "
        "multi-distinct over the same pass, the global agg is "
        "partial/final, and the long-form reshape is a map-only "
        "Generate(stack). At 100 TB the knob is swapping exact distincts "
        "for approx_count_distinct in the same frame.",
        tree_of(q["profile_table"](spark, sf)),
    ))

    sections.append((
        "sketch_bloom_seen (round 4 — Bloom seen-set, integer-exact)",
        "The filter build is an explode + ONE bit_or shuffle bounded by "
        "m/32 rows (input size never appears in the shuffle); the probe "
        "joins the <=128-word filter BROADCAST and folds the k bits with "
        "a partial-aggregating bool_and. No Python anywhere; the md5 bit "
        "math is replayed exactly by the DuckDB oracle.",
        tree_of(q["sketch_bloom_seen"](spark, sf)),
    ))

    sections.append((
        "sketch_cms_heavy (round 4 — count-min heavy hitters)",
        "The token stream feeds one count shuffle whose map-side combine "
        "caps task output at d*w = 192 rows; estimation joins the matrix "
        "broadcast; the final top-20 is TakeOrderedAndProject (no global "
        "sort). The exact-count branch exists only to put the one-sided "
        "error under the driver hash.",
        tree_of(q["sketch_cms_heavy"](spark, sf)),
    ))

    sections.append((
        "sketch_hll_distinct (round 4 — HyperLogLog registers + integer "
        "estimate)",
        "One max shuffle, map-side-combined to <=64 rows per task, then "
        "a tiny agg for the integer raw-HLL estimate. Registers merge by "
        "elementwise MAX (test-pinned) — per-partition/per-day sketches "
        "fold without re-reading data.",
        tree_of(q["sketch_hll_distinct"](spark, sf)),
    ))

    sections.append((
        "table_zorder_key (round 4 — Morton layout key)",
        "The z-value is an UNROLLED sum of shift/mask terms over "
        "min/max-scaled columns — whole-stage-codegen'd map-only work on "
        "top of the scan (the one tiny agg is the min/max ranges). "
        "compact(zorder_by=...) sorts one rewrite by this key so "
        "read_where prunes files on EVERY listed column "
        "(tests/test_zorder.py pins both-column skipping vs the "
        "single-column cluster_by contrast).",
        tree_of(q["table_zorder_key"](spark, sf)),
    ))

    sections.append((
        "events_sessionize (round 4 — gap sessionization)",
        "ONE user_id Exchange serves the lag window, the cumulative-sum "
        "window and the session aggregation (same partition key "
        "throughout, sort reused) — no self-join, no Python. Batch "
        "sibling of stream_session.",
        tree_of(q["events_sessionize"](spark, sf)),
    ))

    sections.append((
        "events_funnel (round 4 — ordered 3-step funnel)",
        "Each step is a conditional aggregation joined back on the SAME "
        "user_id key — never a timestamp-range self-join (the naive "
        "formulation is event-by-event quadratic). No CartesianProduct, "
        "no BroadcastNestedLoopJoin (test-pinned).",
        tree_of(q["events_funnel"](spark, sf)),
    ))

    sections.append((
        "dedup_editdist_pairs (round 4 — deletion-neighborhood fuzzy join)",
        "SymSpell-style blocking: the deletion-1 variant explode is "
        "map-side (<= 25 rows/doc, bounded by the fixed key cap), the "
        "self-join shuffles on the variant string and both sides are the "
        "same subplan — at non-broadcast scale ReuseExchange computes the "
        "explode once (pinned executed-plan in test_editdist); at this sf "
        "AQE broadcasts the small side instead, shown below — "
        "levenshtein verifies only DISTINCT candidates. Short keys (the "
        "web-scale mega-bucket: empty/template pages) are excluded before "
        "the explode. Never doc x doc — no CartesianProduct, no "
        "BroadcastNestedLoopJoin (test-pinned).",
        tree_of(q["dedup_editdist_pairs"](spark, sf)),
    ))

    sections.append((
        "extract_tables_wrapped (round 4 — SPEC §7 table-cell product)",
        "The structured-data face of the crawl: the SAME single "
        "mapInArrow hop as the flagship also yields §7 cell fragments, "
        "then a JVM-side explode — zero Exchange, ingest-shaped (pinned "
        "in test_webtables). The §7.6 per-document cap (500 fragments) "
        "bounds any one page's contribution, so a scraped-grid page "
        "cannot skew the downstream (url, table_id) aggregations.",
        tree_of(q["extract_tables_wrapped"](spark, sf)),
    ))

    sections.append((
        "web_table_records (round 4 — headered table -> records)",
        "Window (col_idx = rank of cell_id within the row) + self-join "
        "on (url, table_id, col_idx): the header side is filtered to one "
        "row per table column BEFORE the join, so the build side is tiny "
        "and the join never sees body x body. No CartesianProduct / "
        "BroadcastNestedLoopJoin (test-pinned).",
        tree_of(q["web_table_records"](spark, sf)),
    ))

    sections.append((
        "dedup_para_keepfirst (round 4 — CCNet keep-first paragraph dedup)",
        "Skew shape: a viral paragraph would put 10^9 rows in one "
        "row_number window partition, so first-instance selection is a "
        "groupBy(h).min(instance_key) instead — partial aggregation "
        "absorbs the hot key map-side (one row per distinct hash per "
        "task), and the join back reuses the hash partitioning. No "
        "Window node anywhere (test-pinned); reassembly is one "
        "doc_id-keyed aggregate over the kept rows.",
        tree_of(q["dedup_para_keepfirst"](spark, sf)),
    ))

    sections.append((
        "search_keywords_tfidf (round 4 — per-doc tf-idf top-5)",
        "Postings (one explode + one shuffle) join the vocab-sized df "
        "table on term — an honest same-key shuffle join, NOT a "
        "broadcast (df is corpus-vocabulary-sized at 100 TB) — then ONE "
        "window keyed by doc_id. The window partition is bounded by a "
        "document's distinct-term count, so a viral TERM cannot skew it; "
        "idf is e4-quantized per posting BEFORE the window, making the "
        "ranking pure integer comparison.",
        tree_of(q["search_keywords_tfidf"](spark, sf)),
    ))

    sections.append((
        "mm_phash_dedup (round 4 — aHash image dedup, real decode)",
        "Synth and decode+hash are each one Arrow-batched mapInPandas at "
        "scan parallelism; grouping is groupBy(phash).min(doc_id) + a "
        "same-key join back — the paradedup skew shape: a viral image "
        "(one hash, 10^8 copies) is absorbed by partial aggregation, "
        "never a window partition.",
        tree_of(q["mm_phash_dedup"](spark, sf)),
    ))

    sections.append((
        "extract_langid_wrapped (round 4 — language-recovering extraction)",
        "Untagged-crawl extraction: ONE mapInArrow parse, then langid "
        "(stopword-hit argmax over the full block text) and the per-block "
        "density re-score against the recovered list are pure JVM column "
        "exprs over the parsed frame — zero Exchange end-to-end, no "
        "second Python crossing (pinned in test_pipeline_job). Tagged "
        "rows bypass recovery bit-identically.",
        tree_of(q["extract_langid_wrapped"](spark, sf)),
    ))

    sections.append((
        "graph_triangles (round 4 — degree-oriented triangle count)",
        "Edges oriented from the (degree, id)-smaller endpoint bound the "
        "wedge join by the O(sqrt m) oriented out-degree — the "
        "distributed formulation; the naive 3-cycle join explodes "
        "quadratically in hub degree. Two equi-joins + one count agg, "
        "all JVM-side.",
        tree_of(q["graph_triangles"](spark, sf)),
    ))

    sections.append((
        "search_snippets (round 4 — explode-free first-occurrence windows)",
        "The snippet pass never explodes: the data-derived query term is "
        "a 1-row broadcast, then first-occurrence position is ONE "
        "array_position per document and the +/-2-word window is ONE "
        "slice — the whole match+extract is map-side. At 100 TB only the "
        "(rare) matching result rows move; the non-matching corpus is "
        "filtered before any shuffle.",
        tree_of(q["search_snippets"](spark, sf)),
    ))

    sections.append((
        "graph_host_components (round 4 — site families over the parsed "
        "host graph)",
        "Site families = connected components over REAL parsed outlink "
        "hosts: every edge becomes a 2-member bucket into the same "
        "min-label propagation used by dedup_cc — two linear shuffles "
        "per round, edge pairs never materialized beyond the bipartite "
        "membership frame. The printed plan embeds the converged "
        "InMemoryRelation (truncated): iterative results are cached for "
        "fixpoint detection, not recomputed per action.",
        tree_of(q["graph_host_components"](spark, sf), max_lines=14),
    ))

    sections.append((
        "extract_outline (round 4 — h1..h6 document-structure product)",
        "The outline is a JVM filter over the SAME single-hop parse "
        "(blocks already carry their context tag): one MapInArrow, then "
        "filter/explode/substring projections — zero Exchange, identical "
        "narrow shape to the flagship. A decoy heading inside <svg> is "
        "suppressed by the skip rules, pinned under the oracle hash.",
        tree_of(q["extract_outline"](spark, sf)),
    ))

    sections.append((
        "text_ppl_kn (round 4 late — interpolated Kneser-Ney bigram LM)",
        "The full KenLM-style smoothing math trained + scored with exactly "
        "TWO corpus passes: one explode builds the PERSISTED Zipf-bounded "
        "bigram-type table (without the persist Catalyst column-pruned "
        "each model branch differently and re-exploded the corpus 4x — "
        "caught in this audit), one explode streams bigrams into the "
        "scoring join. All three model tables (left counts, continuation "
        "counts, type total) aggregate the InMemoryRelation, never the "
        "corpus. Per-doc bigram arrays are JVM HOFs — no Python anywhere. "
        "Nothing quadratic, no per-doc state.",
        tree_of(q["text_ppl_kn"](spark, sf), max_lines=24),
    ))

    sections.append((
        "dedup_containment (round 4 late — Broder containment / quote "
        "detection)",
        "Candidates come from equi-joins on the shingle key of a df-capped "
        "inverted index — no cartesian, no BNLJ; quadratic work is bounded "
        "per posting list by MAX_DF, the same documented bound as every "
        "LSH bucket join. The shingle explode recomputes per consumer "
        "deliberately: re-running a linear map beats persisting a "
        "corpus-sized inverted index (contrast text_ppl_kn, whose REUSED "
        "table is vocab-sized and therefore persisted). Verify joins move "
        "only candidate pairs plus their two shingle arrays.",
        tree_of(q["dedup_containment"](spark, sf), max_lines=20),
    ))

    sections.append((
        "tpch_q18 (round 4 late — SQL entry point, HAVING subquery)",
        "The warehouse-user surface: identical SQL text runs on both "
        "engines. The IN (... GROUP BY ... HAVING ...) subquery plans as "
        "an aggregate feeding a SEMI join on orderkey — never a "
        "materialized IN-list or BNLJ; the outer 3-table join then "
        "aggregates per order. Revenue math is integer cents before any "
        "SUM, so aggregation order can never move a hashed value.",
        tree_of(q["tpch_q18"](spark, sf), max_lines=22),
    ))

    sections.append((
        "pipe_sample_reservoir (round 4 close — A-ES weighted reservoir)",
        "Priorities are map-side column math (max of w md5 draws, all "
        "BIGINT); ORDER BY + LIMIT K plans as TakeOrderedAndProject — "
        "each task keeps a K-bounded reservoir and the driver merges "
        "K·P rows. The corpus itself is never shuffled: this IS the "
        "distributed-reservoir merge law as a plan shape.",
        tree_of(q["pipe_sample_reservoir"](spark, sf)),
    ))

    sections.append((
        "dedup_sorted_neighborhood (round 4 close — SN blocking)",
        "Both passes (forward + reversed key) ride ONE window Exchange "
        "keyed by (pass, 4-char block prefix); each row emits at most "
        "w-1 lag candidates, verified map-side by levenshtein; the only "
        "other Exchange is the final distinct. No variant fan-out, no "
        "self-join — the window-over-sort-order alternative to "
        "dedup_editdist_pairs, recall-heuristic by documented design.",
        tree_of(q["dedup_sorted_neighborhood"](spark, sf)),
    ))

    sections.append((
        "graph_label_prop (round 4 close — LPA communities)",
        "Per round: one shuffle joining labels onto the both-directions "
        "edge list, one partial-aggregated (node, label) count, one "
        "node-keyed argmax window; rounds are localCheckpoint'd so the "
        "printed plan stays O(1) deep (the pagerank discipline). The "
        "graded output below shows only the final round's three "
        "exchanges over the checkpointed predecessor.",
        tree_of(q["graph_label_prop"](spark, sf), max_lines=20),
    ))

    sections.append((
        "events_ab_test (round 4 close — experiment readout)",
        "The event corpus shuffles ONCE (user-keyed rollup with map-side "
        "partial aggregation); the 4-way metric stack and the final "
        "metric aggregation run over the 1-row-per-user relation, and "
        "the z-test verdict is a scalar projection. At 10^12 events the "
        "only data-sized exchange is the per-user rollup.",
        tree_of(q["events_ab_test"](spark, sf)),
    ))

    sections.append((
        "pipe_triplets (round 4 close — contrastive triplets)",
        "Positives: one source-keyed window Exchange. Negatives: "
        "map-side md5 draws fanned ×3, resolved by ONE id equi-join "
        "(shuffle bounded by 3·|corpus|); the max-id normalizer is a "
        "1-row broadcast (BroadcastNestedLoopJoin over a single row, "
        "i.e. a scalar attach, not a data cross join). Never a corpus "
        "cross join, never a rejection loop.",
        tree_of(q["pipe_triplets"](spark, sf), max_lines=24),
    ))

    sections.append((
        "sketch_kmv_jaccard (round 4 close — bottom-k sketch)",
        "Both global bottom-k computations (union-from-sketches and "
        "direct) are orderBy+limit = TakeOrderedAndProject — "
        "per-partition bottom-k + driver merge, never a single-partition "
        "global window; the per-source sketches are bounded windows over "
        "source partitions. The merge law is graded as literal kth-value "
        "equality in the output rows.",
        tree_of(q["sketch_kmv_jaccard"](spark, sf), max_lines=26),
    ))

    sections.append((
        "web_redirects (round 4 close — pointer doubling)",
        "Redirect chains resolve in 3 self-joins of the (node, cur) "
        "relation — 2^3 hops in log steps (the span_offsets trick), so "
        "an 8-hop chain costs 3 shuffles instead of 8 and cycle members "
        "are flagged instead of iterated forever.",
        tree_of(q["web_redirects"](spark, sf), max_lines=24),
    ))

    sections.append((
        "events_attribution (round 4 close — touch windows)",
        "Purchases join touches USER-equi-keyed with the 24h window as a "
        "join residual (the join_range discipline — a pure time-window "
        "join would plan BNLJ); one purchase-keyed window then serves "
        "both attribution models.",
        tree_of(q["events_attribution"](spark, sf), max_lines=22),
    ))

    out = ["""# PLANS — audited physical plans (SURVEY.md §4)

Generated by `python scripts/plan_audit.py` on local[8]; the claims below are
enforced as regression tests in `tests/test_plans.py`, so they cannot rot
silently. Notation: `(n)` are plan nodes, `*` marks whole-stage codegen.
"""]
    for title, commentary, plan in sections:
        out.append(f"## {title}\n\n{commentary}\n\n```\n{plan}\n```\n")
    (REPO / "PLANS.md").write_text("\n".join(out))
    print("wrote", REPO / "PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
