"""Corpus-preparation operator tests (split / chunk / tfidf)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark.operators import corpus
from z316_sales_data_pipeline_spark.sources.tables import load_table


def test_dataset_split_deterministic_and_exhaustive(spark, sf_dir):
    """Split assignment is a pure function of the id (stable under
    repartitioning) and every row lands in exactly one split with
    roughly the requested proportions."""
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in corpus.dataset_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in corpus.dataset_split(docs.repartition(13), "doc_id").collect()
    }
    assert a == b
    c = Counter(a.values())
    n = len(a)
    assert c["train"] + c["val"] + c["test"] == n
    assert 0.7 * n <= c["train"] <= 0.9 * n


def test_chunk_documents_overlapping_windows(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        corpus.chunk_documents(df, "text", "doc_id", chunk_tokens=64, stride=48).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # 100 tokens, window 64, stride 48 -> chunks at 0 and 48
    assert len(rows) == 2
    assert rows[0]["chunk_text"].split(" ")[0] == "t0" and rows[0]["n_tokens"] == 64
    assert rows[1]["chunk_text"].split(" ")[0] == "t48" and rows[1]["n_tokens"] == 52
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(100)}  # every token in >=1 chunk


@pytest.mark.parametrize("n", [1, 2, 31, 32, 33, 55, 56, 57, 80, 81, 100])
def test_chunk_count_boundaries(spark, n):
    """Chunk count matches 1 + ceil(max(n - chunk, 0) / stride) at every
    stride boundary, the windows tile with the right overlap, and the
    final chunk reaches the last token."""
    chunk, stride = 32, 24
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        corpus.chunk_documents(df, "text", "doc_id", chunk, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    expected = 1 + max(0, math.ceil((n - chunk) / stride))
    assert len(rows) == expected, (n, len(rows))
    for c, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert toks[0] == f"t{c * stride}"
        assert r["n_tokens"] == min(chunk, n - c * stride)
    assert rows[-1]["chunk_text"].split(" ")[-1] == f"t{n - 1}"


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = corpus.chunk_documents(df, "text", "doc_id", chunk_tokens=64, stride=48).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_idx"] == 0 and rows[0]["n_tokens"] == 3


def test_run_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """curation → near-dup collapse → split → chunk → shard write.
    Stage counts are monotone, the shard table partitions by split,
    and re-running the pair finder on the survivors yields ZERO pairs
    (two similar survivors would have shared a cluster)."""
    from z316_sales_data_pipeline_spark.operators import dedup
    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    out = str(tmp_path / "shards")
    counts = corpus_pipeline.run_corpus_pipeline(spark, sf_dir, out, chunk_tokens=32, stride=24)
    assert counts["docs"] >= counts["kept"] >= counts["survivors"] > 0
    assert counts["chunks"] >= counts["survivors"]

    # governance sidecars: packs cover every chunk token exactly once,
    # the mixture plan covers every surviving source, the tokenizer
    # table has the requested merge count
    packs = spark.read.parquet(out + "_packs")
    assert packs.agg(F.sum("pack_tokens")).collect()[0][0] == (
        spark.read.parquet(out).agg(F.sum("n_tokens")).collect()[0][0]
    )
    survivors_src = (
        corpus_pipeline.collapse_near_dups(corpus_pipeline.curated_documents(spark, sf_dir))
        .select("source")
        .distinct()
        .count()
    )
    assert counts["mixture_sources"] == survivors_src
    assert counts["bpe_merges"] == 3
    # stats manifest: one row per physical shard file, rows accounted
    manifest = spark.read.parquet(out + "_manifest")
    assert counts["manifest_files"] == manifest.count() > 0
    assert manifest.agg(F.sum("n_rows")).collect()[0][0] == counts["chunks"]

    shards = spark.read.parquet(out)
    assert set(r["split"] for r in shards.select("split").distinct().collect()) <= {
        "train",
        "val",
        "test",
    }
    assert shards.count() == counts["chunks"]

    survivors = corpus_pipeline.collapse_near_dups(
        corpus_pipeline.curated_documents(spark, sf_dir)
    )
    re_pairs = dedup.ngram_jaccard_pairs(
        survivors, "text", "doc_id", "source", threshold=0.5, shingle_k=1
    )
    assert re_pairs.count() == 0


def test_weighted_sample_deterministic_and_weight_biased(spark, sf_dir):
    """The A-ES sample is a pure function of the ids (stable under
    repartitioning), has TakeOrderedAndProject in its plan (no global
    sort), and over-represents heavy documents: the sampled mean
    n_chars exceeds the corpus mean."""
    docs = load_table(spark, sf_dir, "documents")
    s1 = corpus.weighted_sample(docs, "doc_id", "n_chars", k=20)
    s2 = corpus.weighted_sample(docs.repartition(13), "doc_id", "n_chars", k=20)
    rows1 = {r["doc_id"] for r in s1.collect()}
    rows2 = {r["doc_id"] for r in s2.collect()}
    assert rows1 == rows2 and len(rows1) == 20
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    sample_mean = s1.agg(F.avg("n_chars")).collect()[0][0]
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_sequence_pack_partitions_every_chunk_once(spark, sf_dir):
    """Packing is a partition of the chunk set: chunk counts add up,
    packs overflow by at most one chunk past the budget, and pack ids
    are contiguous from 0 within every (split, shard)."""
    docs = load_table(spark, sf_dir, "documents")
    split_docs = corpus.dataset_split(docs, "doc_id")
    chunks = corpus.chunk_documents(
        split_docs, "text", "doc_id", chunk_tokens=32, stride=24, carry_cols=("split",)
    )
    packs = corpus.sequence_pack(
        chunks, "split", "doc_id", "chunk_idx", "n_tokens", budget=256, n_shards=4
    ).collect()
    assert sum(r["n_chunks"] for r in packs) == chunks.count()
    assert all(r["pack_tokens"] < 256 + 32 for r in packs)  # ≤ budget + one chunk
    by_part: dict[tuple, list[int]] = {}
    for r in packs:
        by_part.setdefault((r["split"], r["shard"]), []).append(r["pack_id"])
    for ids in by_part.values():
        assert sorted(ids) == list(range(len(ids)))


def test_tfidf_surfaces_distinctive_terms(spark):
    rows = [
        (1, "alpha alpha alpha shared", "g1"),
        (2, "alpha shared shared", "g1"),
        (3, "beta beta shared", "g2"),
        (4, "beta shared", "g2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    top = {r["source"]: r["term"] for r in corpus.tfidf_top_terms(df, "text", "source", k=1).collect()}
    assert top == {"g1": "alpha", "g2": "beta"}
    # a term present in every group carries zero discriminative weight
    all_rows = corpus.tfidf_top_terms(df, "text", "source", k=10).collect()
    shared = [r for r in all_rows if r["term"] == "shared"]
    assert shared and all(r["score"] == 0.0 for r in shared)


def test_tfidf_null_text_group_counts_in_idf(spark):
    """A group whose only text is NULL still counts toward the IDF
    denominator (ADVICE r3): NULL coalesces to '' before tokenizing, so
    n_groups derived from tf matches count_distinct over the source."""
    rows = [
        (1, "alpha shared", "g1"),
        (2, "beta shared", "g2"),
        (3, None, "g3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = corpus.tfidf_top_terms(df, "text", "source", k=5).collect()
    # g3 present in the output (its '' token) → 3 groups in the IDF;
    # 'alpha' appears in 1 of 3 groups: score = 1 * ln(3/1)
    import math

    assert {r["source"] for r in out} == {"g1", "g2", "g3"}
    alpha = [r for r in out if r["term"] == "alpha"][0]
    assert alpha["score"] == round(math.log(3.0), 6)


def test_pair_graph_materializes_once_and_matches_direct(spark, sf_dir):
    """The shared at-rest pair graph — since r5 an append-segment
    table (v=1 corpus×corpus pairs, v=2 pairs touching the arriving
    batch via the incremental probe) — equals a direct
    ngram_jaccard_pairs run over everything, and the second call is a
    pure parquet read of the SAME segments (no rebuild)."""
    import glob
    import os

    from z316_sales_data_pipeline_spark.operators import dedup
    from z316_sales_data_pipeline_spark.plans import pair_graph

    g1 = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    cache_dirs = glob.glob(str(pair_graph._CACHE_ROOT / "pairs_*"))
    assert cache_dirs, "pair graph was not materialized"

    def seg_mtimes():
        return {
            p: os.path.getmtime(p)
            for d in cache_dirs
            for p in glob.glob(os.path.join(d, "v=*", "_SUCCESS"))
        }

    mtimes_before = seg_mtimes()
    assert mtimes_before, "no segment dirs under the pair-graph table"
    g2 = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    assert seg_mtimes() == mtimes_before, "second call rebuilt the segments"

    docs = load_table(spark, sf_dir, "documents")
    direct = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", "source", threshold=0.5, shingle_k=1
    )
    got = {tuple(r) for r in g1.collect()} | {tuple(r) for r in g2.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want and got


def test_source_mixture_plan_invariants(spark, sf_dir):
    """Both share columns sum to 1, α=0.5 compresses the spread
    (small sources upsampled, big ones downsampled), and epochs are
    consistent with the two shares."""
    docs = load_table(spark, sf_dir, "documents")
    rows = corpus.source_mixture(docs, "text", "source", alpha=0.5).collect()
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["target_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # epochs = target_share / raw_share (ratio of the two shares)
        assert r["sample_epochs"] == pytest.approx(r["target_share"] / r["raw_share"], rel=1e-3)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    if smallest["n_tokens"] < largest["n_tokens"]:
        assert smallest["sample_epochs"] > largest["sample_epochs"]
        assert smallest["target_share"] >= smallest["raw_share"]
        assert largest["target_share"] <= largest["raw_share"]


def test_vocab_coverage_curve(spark, sf_dir):
    """Ranks are contiguous from 1, counts non-increasing, cumulative
    coverage strictly increasing and ≤ 1."""
    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        corpus.vocab_coverage(docs, "text", top_n=16).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    covs = [r["cum_coverage"] for r in rows]
    assert all(b > a for a, b in zip(covs, covs[1:]))
    assert covs[-1] <= 1.0


def test_bpe_merges_classic_example(spark):
    """banana×2 + band×1: merge schedule and compression trajectory
    computed by hand — includes a tie at step 3 ((ban,an) vs (an,a),
    both 2) resolved lexicographically, and the greedy left-to-right
    apply (banana = b·an·an·a after two merges, not b·an·a·n·a)."""
    df = spark.createDataFrame([("banana band banana",)], "text string")
    rows = sorted(corpus.bpe_merges(df, "text", n_merges=3).collect(), key=lambda r: r["step"])
    got = [(r["step"], r["lhs"], r["rhs"], r["pair_count"], r["symbols_after"]) for r in rows]
    assert got == [
        (1, "a", "n", 5, 11),   # banana -> b an an a ; band -> b an d
        (2, "b", "an", 3, 8),   # banana -> ban an a  ; band -> ban d
        (3, "an", "a", 2, 6),   # banana -> ban ana   ; band unchanged
    ]


def test_bpe_token_count_prices_merges(spark):
    """banana band: after 3 merges banana = [ban, ana] (2 tokens) and
    band = [ban, d] (2); counts follow; n_bpe_tokens <= chars and
    >= n_words always."""
    df = spark.createDataFrame([(1, "banana band banana"), (2, "band")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus.bpe_token_count(df, "text", "doc_id", n_merges=3).collect()}
    assert (out[1]["n_words"], out[1]["n_bpe_tokens"]) == (3, 6)  # 2+2+2
    assert (out[2]["n_words"], out[2]["n_bpe_tokens"]) == (1, 2)  # ban d


def test_distribution_drift_laws(spark):
    """TV distance is 0 for identical distributions, 1 for disjoint
    ones (all mass in different buckets), symmetric in the snapshots,
    and NULL when a group has only one snapshot."""
    rows = [
        ("same", "old", "x x y"),
        ("same", "new", "x x y"),
        ("disjoint", "old", "aaa aaa"),
        ("disjoint", "new", "bbb bbb"),
        ("lonely", "old", "zzz"),
    ]
    df = spark.createDataFrame(rows, "source string, snap string, text string")
    out = {
        r["source"]: r
        for r in corpus.distribution_drift(df, "text", "source", "snap", "old", "new").collect()
    }
    assert out["same"]["tv_distance"] == 0.0
    assert out["disjoint"]["tv_distance"] == 1.0
    assert out["lonely"]["tv_distance"] is None
    flipped = {
        r["source"]: r["tv_distance"]
        for r in corpus.distribution_drift(df, "text", "source", "snap", "new", "old").collect()
    }
    assert flipped["disjoint"] == 1.0 and flipped["same"] == 0.0


def test_contrastive_triples_deterministic_and_valid(spark, sf_dir):
    """Each triple's negative differs from both pair members; the draw
    is a pure function of the ids (stable under repartitioning); every
    pair gets exactly one triple."""
    from z316_sales_data_pipeline_spark.operators import dedup
    from z316_sales_data_pipeline_spark.sources.tables import load_table as lt

    docs = lt(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", "source", 0.5, shingle_k=1)
    t1 = {tuple(r) for r in corpus.contrastive_triples(docs, pairs, "doc_id").collect()}
    t2 = {
        tuple(r)
        for r in corpus.contrastive_triples(docs.repartition(13), pairs, "doc_id").collect()
    }
    assert t1 == t2 and len(t1) == pairs.count() > 0
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    for a, b, neg in t1:
        assert neg != a and neg != b and neg in ids


def test_leakage_safe_split_no_cross_split_pairs(spark, sf_dir):
    """The anti-leakage invariant itself: every near-dup pair lands in
    ONE split (cluster members share splits), and every doc is
    assigned exactly once."""
    import __spark_entry__ as m
    from z316_sales_data_pipeline_spark.operators import dedup
    from z316_sales_data_pipeline_spark.sources.tables import load_table as lt

    out = m.queries()["leakage_safe_split"](spark, sf_dir)
    rows = out.collect()
    docs = lt(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", "source", 0.5, shingle_k=1)
    for r in pairs.collect():
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r["id_a"], r["id_b"])


def test_pack_assignments_aggregate_to_sequence_pack(spark, sf_dir):
    """The chunk-grain manifest aggregates exactly to sequence_pack's
    pack grain, and offsets are consistent: within a (split, shard,
    pack) the chunk offsets are strictly increasing starting below the
    first chunk's length."""
    docs = load_table(spark, sf_dir, "documents")
    split_docs = corpus.dataset_split(docs, "doc_id")
    chunks = corpus.chunk_documents(
        split_docs, "text", "doc_id", chunk_tokens=32, stride=24, carry_cols=("split",)
    )
    manifest = corpus.pack_assignments(
        chunks, "split", "doc_id", "chunk_idx", "n_tokens", budget=256, n_shards=4
    )
    agg = {
        (r["split"], r["shard"], r["pack_id"]): (r["n_chunks"], r["pack_tokens"])
        for r in manifest.groupBy("split", "shard", "pack_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tokens").alias("pack_tokens"))
        .collect()
    }
    want = {
        (r["split"], r["shard"], r["pack_id"]): (r["n_chunks"], r["pack_tokens"])
        for r in corpus.sequence_pack(
            chunks, "split", "doc_id", "chunk_idx", "n_tokens", budget=256, n_shards=4
        ).collect()
    }
    assert agg == want and want
    for r in manifest.collect():
        assert 0 <= r["offset_in_pack"] < 256


def test_bm25_rank_matches_hand_computation(spark):
    """BM25 on a 3-doc corpus against a hand-computed score: the doc
    that contains the query term more often but is longer scores per
    the k1/b length normalization, not raw tf."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "spark spark fast"),          # tf=2, dl=3
            (2, "spark slow slow slow slow"),  # tf=1, dl=5
            (3, "other words only here"),      # tf=0, dl=4
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["bm25"], r["n_terms"])
        for r in corpus.bm25_rank(docs, "text", "doc_id", ["spark"], k=10).collect()
    }
    assert set(got) == {1, 2}  # doc 3 matches no term -> absent
    n_docs, avgdl, df_, k1, b = 3, 4.0, 2, 1.2, 0.75
    idf = math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))

    def score(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got[1] == (score(2, 3), 1)
    assert got[2] == (score(1, 5), 1)
    assert got[1][0] > got[2][0]


def test_dsir_weights_prefers_target_like_docs(spark):
    """DSIR importance weighting: a raw doc sharing its bigrams with
    the target distribution must outweigh one whose bigrams only ever
    appear outside the target; weights are integer micro-units (no
    float accumulation in the comparison)."""
    rows = [
        # target docs establish p_target over 'a b'/'b c' bigrams
        (1, "a b c a b c", True),
        (2, "a b c a b", True),
        # raw-only docs: 3 mimics the target, 4 is disjoint
        (3, "a b c a b c", False),
        (4, "x y z x y z", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    got = {
        r["doc_id"]: r["weight_micro"]
        for r in corpus.dsir_weights(
            docs, "text", "doc_id", F.col("is_tgt"), n_buckets=16, k=10
        ).collect()
    }
    assert got[3] > got[4], "target-like doc must outweigh disjoint doc"
    assert all(isinstance(v, int) for v in got.values())


def test_span_scrub_removes_shared_span_keeps_unique(spark):
    """Tokens covered by a cross-doc 8-token window are dropped from
    BOTH docs; unique text survives; short docs pass through intact."""
    from z316_sales_data_pipeline_spark.operators import dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"unique one two {shared} tail1"),
            (2, f"{shared} other words here"),
            (3, "totally original content nothing shared at all ok"),
            (4, "short doc"),  # < 8 tokens, no windows
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dedup.span_scrub(docs, "text", "doc_id", k=8).collect()}
    assert out[1]["scrubbed_text"] == "unique one two tail1"
    assert out[2]["scrubbed_text"] == "other words here"
    assert out[3]["scrubbed_text"] == "totally original content nothing shared at all ok"
    assert out[4]["scrubbed_text"] == "short doc"
    assert out[1]["n_tokens"] == 12 and out[1]["n_kept"] == 4
    assert out[4]["n_tokens"] == 2 and out[4]["n_kept"] == 2


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """The funnel is a monotone subset cascade: per-stage doc counts,
    token mass and both id checksums are non-increasing (checksums are
    sums of non-negative per-doc terms over shrinking sets), stage 0
    equals the raw table, and the stage rows aggregate the levels
    relation exactly (level >= k membership)."""
    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    docs = load_table(spark, sf_dir, "documents")
    rows = {
        r["stage"]: r
        for r in corpus_pipeline.curation_funnel(
            docs, "text", "doc_id", "lang", "source"
        ).collect()
    }
    assert list(rows) == list(corpus_pipeline.CURATION_STAGES)
    ordered = [rows[s] for s in corpus_pipeline.CURATION_STAGES]
    for a, b in zip(ordered, ordered[1:]):
        for col in ("n_docs", "n_tokens", "id_check1", "id_check2"):
            assert a[col] >= b[col], (a["stage"], b["stage"], col)
    raw = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("doc_id") % 262139)).alias("k1"),
    ).collect()[0]
    assert ordered[0]["n_docs"] == raw["n"]
    assert ordered[0]["id_check1"] == raw["k1"]

    lab = corpus_pipeline.curation_levels(docs, "text", "doc_id", "lang", "source")
    per = {
        r["level"]: (r["c"], r["t"])
        for r in lab.groupBy("level")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    for k, stage in enumerate(corpus_pipeline.CURATION_STAGES):
        n = sum(c for lvl, (c, _) in per.items() if lvl >= k)
        t = sum(t for lvl, (_, t) in per.items() if lvl >= k)
        assert rows[stage]["n_docs"] == n, stage
        assert rows[stage]["n_tokens"] == t, stage


def test_curation_levels_stage_semantics(spark, sf_dir):
    """Stage predicates hold on the labeled relation: every stage-3
    survivor owns a unique fingerprint AND is the min-id holder of it
    within the stage-2 set; stage-5 membership equals
    token_budget_select_scored over the stage-4 set (pinning the
    delegation refactor); no eval-source doc survives past stage 3."""
    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    docs = load_table(spark, sf_dir, "documents")
    lab = corpus_pipeline.curation_levels(
        docs, "text", "doc_id", "lang", "source"
    ).cache()
    try:
        s3 = lab.filter(F.col("level") >= 3)
        dup_fp = s3.groupBy("fp").count().filter(F.col("count") > 1).count()
        assert dup_fp == 0
        # min-id winner: no stage-2 member with the same fp and a lower id
        s2 = lab.filter(F.col("level") >= 2).select("fp", F.col("doc_id").alias("other_id"))
        usurped = (
            s3.join(s2, "fp")
            .filter(F.col("other_id") < F.col("doc_id"))
            .count()
        )
        assert usurped == 0
        assert lab.filter((F.col("level") >= 4) & (F.col("source") == "src0")).count() == 0

        s4 = lab.filter(F.col("level") >= 4)
        sel = corpus.token_budget_select_scored(
            s4.select("source", "doc_id", "quality_x3", "n_tokens"), "doc_id", 200
        )
        got = {r["doc_id"] for r in lab.filter(F.col("level") >= 5).select("doc_id").collect()}
        want = {r["doc_id"] for r in sel.select("doc_id").collect()}
        assert got == want
    finally:
        lab.unpersist()


def test_token_budget_select_delegates_to_scored(spark, sf_dir):
    """token_budget_select == token_budget_select_scored over its own
    scored relation (the r14 decomposition cannot drift)."""
    docs = load_table(spark, sf_dir, "documents")
    a = corpus.token_budget_select(docs, "text", "doc_id", "source", 3000)
    b = corpus.token_budget_select_scored(
        corpus._token_budget_scored(docs, "text", "doc_id", "source"), "doc_id", 3000
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _cf_doc(doc_id, text, lang="en", source="srcA"):
    return (doc_id, text, lang, source)


def _cf_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def _cf_words(n, stem="tok"):
    return " ".join(f"{stem}{i % 50}x" for i in range(n))


def test_curation_funnel_incremental_equals_full_recompute(spark):
    """Crafted corpus exercising EVERY fold path the synthetic tables
    cannot (they hold zero cross-split exact dups): cross-split exact
    dup (batch loser), within-batch dup, eval contamination of a batch
    doc, a low-quality and a wrong-lang batch doc, and a batch arrival
    whose rank EVICTS an at-rest selected doc from the budget stage
    (stage 5 is not append-only). The fold must equal the full
    batch-path funnel on the union, row for row."""
    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    eval_text = _cf_words(40, "evla")
    dup_text = _cf_words(60, "dupx")
    # q3 = 2: mean word length > 12 chars (len/punct still fine)
    q2_text = " ".join("wordpartsverylong" + str(i) for i in range(12))
    prior = _cf_df(
        spark,
        [
            _cf_doc(1, _cf_words(100, "pone")),          # selected (q3=3, 100 tok)
            _cf_doc(2, q2_text, source="srcA"),           # q3=2, selected at rest
            _cf_doc(3, dup_text),                         # dedup winner at rest
            _cf_doc(7, eval_text, source="src0"),         # frozen eval set
            _cf_doc(8, _cf_words(30, "pbee"), source="srcB"),
        ],
    )
    batch = _cf_df(
        spark,
        [
            _cf_doc(101, dup_text),                       # cross-split dup -> loser
            _cf_doc(102, _cf_words(55, "botc")),          # clean survivor
            _cf_doc(103, _cf_words(55, "botc")),          # within-batch dup of 102
            _cf_doc(104, _cf_words(120, "bevi")),         # rank-evicts doc 2's budget room
            _cf_doc(105, _cf_words(20, "evla") + " " + eval_text),  # contaminated
            _cf_doc(106, _cf_words(55, "bfrx"), lang="fr"),         # wrong lang
            _cf_doc(107, "short!!!???;;;:::!!!???;;;"),              # low quality
        ],
    )
    kw = dict(keep_lang="en", min_quality_x3=2, eval_source="src0",
              shingle_k=8, budget_tokens=200)
    got = corpus_pipeline.curation_funnel_incremental(
        prior, batch, "text", "doc_id", "lang", "source", **kw
    ).collect()
    want = corpus_pipeline.curation_funnel(
        prior.unionByName(batch), "text", "doc_id", "lang", "source", **kw
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    rows = {r["stage"]: r for r in got}
    # the crafted paths actually fired: dedup dropped 101+103, budget
    # rejected 104 AND evicted at-rest doc 2 (so stage-5 mass shrank
    # below prior's 1+2+3 selection), contamination dropped 105
    assert rows["s3_exact_dedup"]["n_docs"] == rows["s2_lang"]["n_docs"] - 2
    assert rows["s4_decontaminated"]["n_docs"] == rows["s3_exact_dedup"]["n_docs"] - 2
    # derive the expected selection directly from the full batch-path levels
    lab = corpus_pipeline.curation_levels(
        prior.unionByName(batch), "text", "doc_id", "lang", "source", **kw
    )
    want_sel = {r["doc_id"] for r in lab.filter(F.col("level") >= 5).collect()}
    assert rows["s5_token_budget"]["n_docs"] == len(want_sel)
    assert 2 not in want_sel  # the eviction really happened


def test_curation_funnel_incremental_fail_stops(spark):
    """Contract violations refuse loudly instead of diverging: a batch
    eval-source row (frozen-eval contract) and a batch doc that would
    usurp an at-rest dedup winner (monotone-id contract) both raise."""
    from py4j.protocol import Py4JJavaError
    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    base = _cf_df(spark, [_cf_doc(10, _cf_words(60, "pone")),
                          _cf_doc(11, _cf_words(40, "evla"), source="src0")])
    bad_eval = _cf_df(spark, [_cf_doc(100, _cf_words(50, "bnew"), source="src0")])
    with pytest.raises(Exception) as ei:
        corpus_pipeline.curation_funnel_incremental(
            base, bad_eval, "text", "doc_id", "lang", "source"
        ).collect()
    assert "eval-source" in str(ei.value)

    usurper = _cf_df(spark, [_cf_doc(5, _cf_words(60, "pone"))])  # id 5 < winner 10, same fp
    with pytest.raises(Exception) as ei:
        corpus_pipeline.curation_funnel_incremental(
            base, usurper, "text", "doc_id", "lang", "source",
            min_quality_x3=2,
        ).collect()
    assert "monotone-id" in str(ei.value)


def test_curation_report_sums_to_funnel(spark, sf_dir):
    """The per-source report is the funnel at source grain: summing
    each stage column over sources reproduces the funnel's stage
    counts and token masses, the eval source selects nothing, and the
    ppm shares floor-divide exactly."""
    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    docs = load_table(spark, sf_dir, "documents")
    rep = corpus_pipeline.curation_report(
        docs, "text", "doc_id", "lang", "source"
    ).collect()
    fun = {
        r["stage"]: r
        for r in corpus_pipeline.curation_funnel(
            docs, "text", "doc_id", "lang", "source"
        ).collect()
    }
    col_for_stage = {
        "s0_raw": "n_docs",
        "s1_quality": "n_quality",
        "s2_lang": "n_lang",
        "s3_exact_dedup": "n_dedup",
        "s4_decontaminated": "n_decontaminated",
        "s5_token_budget": "n_selected",
    }
    for stage, col in col_for_stage.items():
        assert sum(r[col] for r in rep) == fun[stage]["n_docs"], stage
    assert sum(r["tok_raw"] for r in rep) == fun["s0_raw"]["n_tokens"]
    assert sum(r["tok_selected"] for r in rep) == fun["s5_token_budget"]["n_tokens"]
    ev = [r for r in rep if r["source"] == "src0"]
    assert ev and ev[0]["n_decontaminated"] == 0 and ev[0]["n_selected"] == 0
    for r in rep:
        assert r["sel_docs_ppm"] == r["n_selected"] * 1_000_000 // r["n_docs"]


@pytest.mark.parametrize("seed", [7, 19, 41])
def test_curation_funnel_incremental_randomized_equivalence(spark, seed):
    """Seeded randomized corpora (tiny vocab so exact-dup fingerprints
    collide across the split by construction, mixed langs/quality,
    random budget pressure): the fold must equal the full batch-path
    funnel on every generated corpus. Contracts hold by construction —
    batch ids all exceed prior non-eval ids and the batch carries no
    eval rows — so any divergence is a fold bug, not a contract
    violation."""
    import random

    from z316_sales_data_pipeline_spark.plans import corpus_pipeline

    rng = random.Random(seed)
    texts = [
        " ".join(rng.choice(["alpha", "bravo", "carol", "delta", "echox"])
                 for _ in range(rng.randint(12, 60)))
        for _ in range(12)
    ]  # 12 base texts -> guaranteed duplicate fingerprints among 40 docs
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                rng.choice(texts),
                rng.choice(["en", "en", "en", "fr"]),
                rng.choice(["src0", "srcA", "srcB", "srcC"]) if i < 20
                else rng.choice(["srcA", "srcB", "srcC"]),
            )
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    prior = docs.filter((F.col("doc_id") < 20) | (F.col("source") == "src0"))
    batch = docs.filter((F.col("doc_id") >= 20) & (F.col("source") != "src0"))
    kw = dict(min_quality_x3=2, shingle_k=8, budget_tokens=rng.choice([60, 150, 400]))
    got = corpus_pipeline.curation_funnel_incremental(
        prior, batch, "text", "doc_id", "lang", "source", **kw
    ).collect()
    want = corpus_pipeline.curation_funnel(
        docs, "text", "doc_id", "lang", "source", **kw
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)), seed
