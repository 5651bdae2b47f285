"""Corpus-preparation operators (north-star training-data ops).

The three steps between "curated documents" and "training shards" that
the reference's ETL never needed but a 100 TB text pipeline always
does:

- **dataset_split** — deterministic hash-mod train/val/test assignment.
  A pure function of the id (md5-hex-mod, no RNG): re-runs, late
  arrivals and other engines assign identically, so split membership
  is reproducible lineage, not state. Narrow map — no shuffle.
- **chunk_documents** — overlapping token-window chunking (the
  sequence-packing precursor). explode(sequence) over precomputed
  token arrays: one narrow Generate, no shuffle; output rows carry
  chunk grain so downstream shard writes partition on (doc, chunk).
- **tfidf_top_terms** — per-group TF-IDF keyword extraction. Two
  hash aggregates (term frequency, group document frequency) and one
  broadcastable scalar (group count); top-k via row_number window on
  the small (group, term) relation.

All column algebra — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..persistence import persist_fact, pin_fact


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Engine-portable deterministic bucket: first 8 md5 hex chars mod n.

    Same trick as the stratified sampler: stable across runs, engines
    and cluster sizes, and reproducible in ANSI SQL.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % n_buckets
    )


def dataset_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row a deterministic train/val/test split label.

    The bucket is a pure function of the id, so the split survives
    re-runs, backfills and engine changes without a seed registry —
    the property that matters when the corpus is rebuilt incrementally
    at lake scale (a doc can never migrate between splits).
    """
    bucket = hash_bucket(F.col(id_col))
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def _norm_tokens(text_col: str) -> Column:
    """Whitespace tokens of the lowercased, space-normalized text (the
    engine's shared tokenization, same as SimHash/Jaccard)."""
    return _norm_tokens_of(F.col(text_col))


def _norm_tokens_of(text: Column) -> Column:
    """Column-expression variant of :func:`_norm_tokens` for callers
    that need to pre-transform the text (e.g. NULL coalescing)."""
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document into overlapping token windows.

    Chunk c covers tokens [c*stride, c*stride + chunk_tokens); the last
    chunk is the first one whose window reaches the end of the doc, so
    every token lands in ≥1 chunk and short docs yield exactly one.
    Narrow Generate (explode) — chunking shuffles nothing; at lake
    scale the chunk rows stream straight into the shard writer.
    ``carry_cols`` ride along to the chunk grain (e.g. the split label)
    so downstream writes need no join back to doc grain.
    """
    toks = _norm_tokens(text_col)
    n = F.size("__toks")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    return (
        df.select(F.col(id_col), *[F.col(c) for c in carry_cols], toks.alias("__toks"))
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            id_col,
            *carry_cols,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
            ).alias("n_tokens"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (∝ weight).

    Efraimidis–Spirbas A-ES with the engine's seedless uniform: u =
    (md5-bucket + 1) / 2³² ∈ (0, 1] is a pure function of the id, and
    the k rows with the largest u^(1/w) are the sample. No RNG, no
    seed coordination — re-runs, late arrivals and other engines draw
    the SAME sample, which is what makes a 100 TB sampled corpus
    reproducible lineage. Top-k compiles to TakeOrderedAndProject
    (per-partition heap + driver merge, no global sort).
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**32))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.withColumn("__key", F.round(key, 9))
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, weight_col, "__key")
    )


def sequence_pack(
    chunks: DataFrame,
    split_col: str,
    id_col: str,
    idx_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Assign chunks to fixed-token-budget training packs.

    Streaming first-fit by deterministic order: within each
    (split, shard), chunks are laid out end-to-end ordered by
    (id, chunk_idx) and a chunk belongs to pack floor(start_offset /
    budget) — a pack may overflow by at most one chunk (the standard
    streaming-packing trade; the trainer truncates or pads).

    The shard key (hash-mod of the doc id) is what makes the window
    scale: packing is (split, shard)-local, so at 100 TB the running
    sum runs on n_shards × n_splits independent partitions instead of
    one reducer per split. Deterministic order + deterministic shard =
    the same pack assignment on every engine and every re-run.

    Returns pack grain: (split, shard, pack_id, n_chunks, pack_tokens).
    """
    shard = hash_bucket(F.col(id_col), n_shards)
    w = (
        Window.partitionBy(split_col, "shard")
        .orderBy(F.col(id_col).asc(), F.col(idx_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return (
        chunks.withColumn("shard", shard)
        .withColumn("pack_id", F.floor((cum - F.col(tokens_col)) / F.lit(budget)))
        .groupBy(split_col, "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(tokens_col).alias("pack_tokens"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    group_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per group by TF-IDF.

    tf(group, term) = total occurrences in the group; df(term) = number
    of distinct groups containing the term; score = tf · ln(n_groups /
    df). Two codegen hash aggregates over the exploded token relation
    (map-side partial agg both times), a broadcast 1-row group count,
    and a window over the small (group, term) relation. Deterministic
    tie-break (score desc, term asc) keeps the result engine-portable.
    """
    # coalesce NULL text to '' BEFORE tokenizing: split(NULL) is NULL and
    # explode would silently drop the group from the IDF denominator,
    # whereas '' still yields one '' token row (ADVICE r3) — so n_groups
    # derived from tf below counts every input group
    tokens = df.select(
        F.col(group_col),
        F.explode(_norm_tokens_of(F.coalesce(F.col(text_col), F.lit("")))).alias("term"),
    )
    # the reduced (group, term) relation is materialized once — it
    # feeds dfreq, the group count AND the scored join; without the
    # checkpoint each consumer re-inlines the explode+aggregate, i.e.
    # three full corpus scans for one query
    tf = pin_fact(
        tokens.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )  # group-x-term grain (fact when group=doc): lazy pin, keep lineage
    # df(term) aggregated from the reduced tf relation (one row per
    # (group, term)) — a hash agg over the small relation. (A window
    # count over partition-by-term was measured 5× SLOWER: WindowExec
    # sorts the whole relation by term, vs two codegen hash aggs.)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # every group reaches tf (even empty text yields one '' token), so
    # the group count derives from the reduced relation, not the corpus
    n_groups = tf.select(F.count_distinct(group_col).alias("__ng"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_groups))
        .withColumn("score", F.round(F.col("tf") * F.log(F.col("__ng") / F.col("df")), 6))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", "term", "tf", "df", "score")
    )


def source_mixture(
    df: DataFrame,
    text_col: str,
    source_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based dataset mixture plan (the multilingual-LM
    sampling rule of Conneau & Lample 2019 / the domain-weighting step
    of every corpus build): target share of source i ∝ tokens_i^alpha.

    alpha = 1 reproduces natural proportions; alpha -> 0 approaches
    uniform — the knob that keeps a 100 TB web crawl from drowning the
    small high-quality sources. ``sample_epochs`` is the number of
    passes over the source needed to hit its target share at constant
    total token budget (> 1 means upsampling).

    Plan: one codegen hash aggregate to source grain (map-side partial
    agg — the full corpus collapses to |sources| rows before any
    shuffle), then a broadcast one-row total. Output is O(|sources|)
    regardless of corpus size. The source-grain relation is
    materialized eagerly: both the totals and the final projection
    derive from it, and without the checkpoint Catalyst re-inlines the
    aggregate per consumer — a SECOND full corpus scan at lake scale
    (caught by the plan-guard test: zero FileScans in the final plan).
    """
    from ..functions.text import whitespace_token_count

    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(whitespace_token_count(text_col)).alias("n_tokens"),
    ).localCheckpoint(eager=True)  # source-grain reduction; eager — the
    # zero-FileScan plan invariant (test_plan_properties) pins the
    # corpus-scanned-once mechanism at the plan level
    tot = per.agg(
        F.sum("n_tokens").alias("__tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("__tot_w"),
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    return per.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__tot"), 6).alias("raw_share"),
        F.round(w / F.col("__tot_w"), 6).alias("target_share"),
        F.round(w / F.col("__tot_w") * F.col("__tot") / F.col("n_tokens"), 6).alias(
            "sample_epochs"
        ),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    top_n: int = 16,
) -> DataFrame:
    """Tokenizer-vocabulary coverage curve: the ``top_n`` most frequent
    tokens with each prefix's cumulative share of all corpus tokens —
    the measurement behind "how big must the vocab be to cover X% of
    the stream" when inducing a tokenizer.

    Plan: explode -> one codegen hash aggregate to token grain (the
    corpus collapses to |vocab| rows), a broadcast one-row total, and
    TakeOrderedAndProject for the top-n (per-partition heap, no global
    sort of the vocab). The running-sum window then runs over ONLY the
    top_n surviving rows — never over the full vocabulary.
    Deterministic tie-break (count desc, token asc) keeps the curve
    engine-portable. The vocab-grain count relation is materialized
    eagerly — the total and the top-n both derive from it, and without
    the checkpoint each consumer re-inlines the aggregate, i.e. a
    second full corpus scan at lake scale.
    """
    tokens = df.select(F.explode(_norm_tokens(text_col)).alias("token"))
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(
        eager=True
    )  # vocab-grain reduction; eager — the zero-FileScan plan
    # invariant (test_plan_properties) pins the scanned-once mechanism
    tot = counts.agg(F.sum("cnt").alias("__tot"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_coverage",
            F.round(
                F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                / F.col("__tot"),
                6,
            ),
        )
        .select("rank", "token", "cnt", "cum_coverage")
    )


def _merge_pair_fold(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (lhs,
    rhs) symbols — the BPE apply step as a single JVM-side fold
    (F.aggregate with a (out, pend) struct accumulator). "aaa" under
    (a,a) becomes [aa, a], exactly the classic BPE scan; the DuckDB
    oracle replays the identical fold with list_reduce."""
    merged = lhs + rhs
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(None).cast("string").alias("pend")
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(acc["pend"].isNull(), F.struct(acc["out"].alias("out"), s.alias("pend")))
            .when(
                (acc["pend"] == F.lit(lhs)) & (s == F.lit(rhs)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(F.concat(acc["out"], F.array(acc["pend"])).alias("out"), s.alias("pend"))
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, init, step, finish)


def bpe_merges(df: DataFrame, text_col: str, n_merges: int = 3) -> DataFrame:
    """Byte-pair-encoding vocabulary induction: the first ``n_merges``
    merge rules learned from the corpus (Sennrich et al. 2016) — the
    tokenizer-training step of an LLM data pipeline, run as fixed
    distributed iterations like the engine's PageRank/k-means.

    Per step: (1) adjacent symbol pairs of every word, weighted by
    word count, collapse in ONE codegen hash aggregate (the corpus was
    already reduced to vocabulary grain — at 100 TB the word-count
    relation, not the corpus, is what iterates); (2) the argmax pair
    (count desc, then lexicographic — deterministic) is collected as an
    O(1) model parameter, exactly like IVF centroids; (3) the merge is
    applied with a greedy left-to-right fold and the relation is
    re-checkpointed so plan depth stays constant across steps.

    Returns one row per merge: (step, lhs, rhs, pair_count,
    symbols_after) where symbols_after is the total corpus symbol
    count after applying the rule — the compression trajectory. The
    oracle replays the identical schedule as an unrolled CTE chain.
    """
    rows, _ = _bpe_train(df, text_col, n_merges)
    return df.sparkSession.createDataFrame(
        rows, "step int, lhs string, rhs string, pair_count long, symbols_after long"
    )


def _bpe_train(df: DataFrame, text_col: str, n_merges: int):
    """Shared BPE training loop: returns (merge rows, the final
    word→symbols vocabulary relation) so ``bpe_merges`` reports the
    schedule and ``bpe_token_count`` applies it without re-learning."""
    words = (
        df.select(F.explode(_norm_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", F.split(F.col("word"), "").alias("syms"))
        .persist()  # vocab-grain; materialized by the first step's collect
    )
    empty_pairs = F.array().cast("array<struct<lhs:string,rhs:string>>")
    rows = []
    # One driver round-trip per step (r5 VERDICT item 7): the SAME
    # action returns the argmax pair AND the current total symbol
    # count, which IS the previous step's symbols_after — so each
    # step's symbols_after is flushed by the NEXT step's job, and only
    # the final step pays a dedicated tail job. BPE's merge order is
    # inherently sequential and the state is vocabulary-grain (tiny),
    # so the driver loop itself is sound; the honest cost —
    # n_merges + 1 collects + n_merges eager checkpoints — is recorded
    # in docs/PERF.md.
    pending: tuple | None = None  # (step, lhs, rhs, pair_count) awaiting symbols_after
    prev_words: DataFrame | None = None  # superseded step state, released
    # once the NEXT step's collect has materialized its successor
    for step_no in range(1, n_merges + 1):
        pair_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("lhs"),
                    F.element_at(F.col("syms"), i + 1).alias("rhs"),
                ),
            ),
        ).otherwise(empty_pairs)
        pairs = (
            words.select("cnt", F.explode(pair_arr).alias("pr"))
            .groupBy(F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        # struct-MIN argmax (the LPA/pq_encode swap, applied here): the
        # negated count ranks highest-count first, then the (lhs, rhs)
        # lexicographic tie-break — a hash aggregate, no global sort.
        stat = (
            pairs.agg(
                F.min(
                    F.struct(
                        (-F.col("pair_count")).alias("neg_cnt"),
                        F.col("lhs").alias("lhs"),
                        F.col("rhs").alias("rhs"),
                    )
                ).alias("best")
            )
            .crossJoin(  # one-row x one-row: broadcast, not a data join
                words.agg(F.sum(F.size("syms") * F.col("cnt")).alias("total_syms"))
            )
            .collect()[0]
        )
        # the collect above materialized the CURRENT words frame, so
        # the previous step's cache entry is now dead weight — release
        # it (ADVICE r14: without this each merge step leaks a cache
        # entry for the session's lifetime)
        if prev_words is not None:
            prev_words.unpersist()
            prev_words = None
        if pending is not None:
            rows.append((*pending, stat["total_syms"]))
            pending = None
        if stat["best"] is None:
            break
        lhs, rhs = stat["best"]["lhs"], stat["best"]["rhs"]
        pair_count = -stat["best"]["neg_cnt"]
        prev_words = words
        words = words.select(
            "word", "cnt", _merge_pair_fold(F.col("syms"), lhs, rhs).alias("syms")
        ).persist()  # per-step state; the step's own collect materializes it
        pending = (step_no, lhs, rhs, pair_count)
    if pending is not None:  # the last step's symbols_after: one tail job
        total = words.agg(F.sum(F.size("syms") * F.col("cnt"))).collect()[0][0]
        rows.append((*pending, total))
    if prev_words is not None:  # the tail collect materialized the
        # final words frame; its predecessor is now releasable
        prev_words.unpersist()
    return rows, words


def bpe_token_count(
    df: DataFrame, text_col: str, id_col: str, n_merges: int = 3
) -> DataFrame:
    """Apply the induced tokenizer: per document, the token count under
    the first ``n_merges`` learned BPE rules — the train+APPLY pair to
    ``bpe_merges``, and the number that actually prices a document in
    a token-budgeted corpus (whitespace counts overestimate once the
    tokenizer learns the corpus's frequent fusions).

    The apply side is a broadcast join from the document token stream
    to the word→symbol-count vocabulary relation that training already
    produced — documents are never re-folded; at lake scale the vocab
    relation is the tiny model table you persist beside the merge
    rules. Output: (id, n_words, n_bpe_tokens).
    """
    _, vocab = _bpe_train(df, text_col, n_merges)
    word_len = vocab.select("word", F.size("syms").alias("__nsym"))
    toks = df.select(F.col(id_col), F.explode(_norm_tokens(text_col)).alias("word"))
    return (
        toks.join(F.broadcast(word_len), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nsym").alias("n_bpe_tokens"),
        )
    )


def distribution_drift(
    df: DataFrame,
    text_col: str,
    group_col: str,
    snap_col: str,
    old_val: str,
    new_val: str,
    top_n: int = 16,
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots, per
    group (source/domain): total-variation distance over a FIXED
    comparison vocabulary — the governance metric for "did the new
    crawl shift under me" before retraining on it.

    The comparison space is the global top-``top_n`` tokens over both
    snapshots plus one OOV bucket; TV = ½·Σ|p_old − p_new| over those
    buckets. TV instead of KL/JS on purpose: it is bounded, symmetric,
    defined when a bucket is empty on one side, and needs no
    logarithms — pure rational arithmetic that round-6 makes
    engine-portable.

    Plan: ONE corpus scan into the (group, snapshot, token) count
    relation (eager checkpoint — vocabulary, bucket counts and totals
    all derive from it); everything downstream is vocab-grain. Output:
    one row per group.
    """
    toks = df.select(
        F.col(group_col), F.col(snap_col), F.explode(_norm_tokens(text_col)).alias("token")
    )
    base = (
        toks.groupBy(group_col, snap_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()  # (group, snap, token) grain; two consumers (lazy pin)
    )
    vocab = (
        base.groupBy("token")
        .agg(F.sum("cnt").alias("__tot"))
        .orderBy(F.col("__tot").desc(), F.col("token").asc())
        .limit(top_n)
        .select("token")
        .withColumn("__in_vocab", F.lit(1))
    )
    bucketed = (
        base.join(F.broadcast(vocab), "token", "left")
        .withColumn("bucket", F.when(F.col("__in_vocab") == 1, F.col("token")).otherwise(F.lit("<OOV>")))
        .groupBy(group_col, "bucket")
        .agg(
            F.sum(F.when(F.col(snap_col) == old_val, F.col("cnt")).otherwise(F.lit(0))).alias("c_old"),
            F.sum(F.when(F.col(snap_col) == new_val, F.col("cnt")).otherwise(F.lit(0))).alias("c_new"),
        )
        .persist()  # (group, bucket) grain; two consumers (lazy pin)
    )
    tots = bucketed.groupBy(group_col).agg(
        F.sum("c_old").alias("t_old"), F.sum("c_new").alias("t_new")
    )
    return (
        bucketed.join(tots, group_col)
        .groupBy(group_col)
        .agg(
            F.max("t_old").alias("n_tokens_old"),
            F.max("t_new").alias("n_tokens_new"),
            # try_divide: a group present in only ONE snapshot has no
            # comparable distribution — its distance is NULL, not an
            # ANSI division error (both engines null-propagate the sum)
            F.round(
                F.lit(0.5)
                * F.sum(
                    F.abs(
                        F.try_divide(F.col("c_old"), F.col("t_old"))
                        - F.try_divide(F.col("c_new"), F.col("t_new"))
                    )
                ),
                6,
            ).alias("tv_distance"),
        )
    )


def _md5_long(c: Column) -> Column:
    """First 8 md5 hex chars as a long — the engine's seedless uniform
    (same idiom as hash_bucket / weighted_sample), full range."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def contrastive_triples(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic (anchor, positive, negative) triples for
    contrastive training: positives are the at-rest near-dup pairs;
    each pair's negative is drawn from a seedless hash ring over the
    corpus ids — a pure function of (id_a, id_b), so re-runs, late
    batches and other engines emit identical triples (reproducible
    training data, no seed registry).

    Probing three consecutive ring slots guarantees a negative
    distinct from BOTH pair members (3 candidates, ≤2 forbidden).
    A drawn negative may still be an undetected near-dup of the anchor
    — the standard in-batch-negatives compromise; the exactness
    guarantee is only vs the pair members.

    Scale shape: the ring is a global index over doc IDS ONLY
    (payloads never enter the sort), built with the TWO-PHASE
    zipWithIndex shape (windows.two_phase_row_number: range-partition
    on the hash, partition-local row_number, broadcast per-partition
    offsets) so no task ever sorts the whole id universe — the r4
    verdict's unpartitioned-WindowExec fix — and materialized once;
    the three candidate lookups are equi-joins on the ring position.
    """
    from . import windows as _windows

    ids = docs.select(F.col(id_col).alias("__rid")).withColumn(
        "__h", _md5_long(F.col("__rid"))
    )
    indexed, n_total = _windows.two_phase_row_number(
        ids, [F.col("__h").asc(), F.col("__rid").asc()], "__pos"
    )
    ring = pin_fact(indexed.select("__rid", "__pos"))  # doc-grain: lazy pin, keep lineage
    n_df = docs.sparkSession.range(1).select(F.lit(n_total).cast("long").alias("__n"))
    t0 = _md5_long(F.concat(F.col("id_a").cast("string"), F.lit("#"), F.col("id_b").cast("string")))
    base = (
        pairs.select("id_a", "id_b")
        .crossJoin(F.broadcast(n_df))
        .withColumn("__t", t0)
        .withColumn("__p1", F.pmod(F.col("__t"), F.col("__n")) + 1)
        .withColumn("__p2", F.pmod(F.col("__t") + 1, F.col("__n")) + 1)
        .withColumn("__p3", F.pmod(F.col("__t") + 2, F.col("__n")) + 1)
    )
    r = lambda i: ring.select(F.col("__rid").alias(f"__r{i}"), F.col("__pos").alias(f"__q{i}"))  # noqa: E731
    joined = (
        base.join(r(1), F.col("__p1") == F.col("__q1"))
        .join(r(2), F.col("__p2") == F.col("__q2"))
        .join(r(3), F.col("__p3") == F.col("__q3"))
    )
    ok = lambda c: (F.col(c) != F.col("id_a")) & (F.col(c) != F.col("id_b"))  # noqa: E731
    return joined.select(
        "id_a",
        "id_b",
        F.when(ok("__r1"), F.col("__r1"))
        .when(ok("__r2"), F.col("__r2"))
        .otherwise(F.col("__r3"))
        .alias("neg_id"),
    )


def pack_assignments(
    chunks: DataFrame,
    split_col: str,
    id_col: str,
    idx_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Chunk-grain pack MANIFEST: (split, shard, doc, chunk, pack_id,
    offset_in_pack) — the detail relation a dataloader reads to
    materialize packs without re-deriving the layout. Exactly the same
    deterministic (split, shard)-local running-sum window as
    :func:`sequence_pack`; aggregating this relation to pack grain
    reproduces sequence_pack's output (asserted in tests), so the two
    can never drift.
    """
    shard = hash_bucket(F.col(id_col), n_shards)
    w = (
        Window.partitionBy(split_col, "shard")
        .orderBy(F.col(id_col).asc(), F.col(idx_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        chunks.withColumn("shard", shard)
        .withColumn("__start", start)
        .select(
            split_col,
            "shard",
            id_col,
            idx_col,
            tokens_col,
            F.floor(F.col("__start") / F.lit(budget)).alias("pack_id"),
            (F.col("__start") - F.floor(F.col("__start") / F.lit(budget)) * F.lit(budget)).alias(
                "offset_in_pack"
            ),
        )
    )


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 (the Lucene ``idf = ln(1 + (N - df +
    0.5) / (df + 0.5))`` variant) against a fixed query-term set — the
    retrieval scorer a curation pipeline uses to mine topic-relevant
    documents out of a crawl (beyond the reference, which stops at
    TF-IDF-class statistics; query surface parity: SURVEY §2 corpus
    family).

    Shape at scale: the query vocabulary is tiny and FIXED, so tf is
    pivoted into per-term columns inside the SAME hash aggregate that
    computes doc length — the corpus token explode (the dominant cost
    at lake scale) is paid exactly ONCE, one corpus-grain shuffle.
    df-per-term and the corpus stats then reduce to a single row off
    that doc-grain relation and broadcast back (a 1-row
    BroadcastNestedLoopJoin, not a cartesian), and the score is pure
    column algebra. Deterministic (score desc, id asc) top-k compiles
    to TakeOrderedAndProject — no global sort. (A first draft
    aggregated dl and tf in separate branches; the plan showed the
    explode twice — this form halves the corpus scans.)
    """
    terms = list(query_terms)
    tokens = df.select(
        F.col(id_col),
        F.explode(_norm_tokens_of(F.coalesce(F.col(text_col), F.lit("")))).alias("term"),
    )
    # the reduced doc-grain relation feeds BOTH the stats row and the
    # scoring scan — without the checkpoint each consumer re-inlines
    # the corpus explode (verified in the first plan capture: two
    # Scan parquet + Generate branches), i.e. two corpus scans for
    # one query (same lesson as tfidf_top_terms)
    per_doc = (
        tokens.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    # EAGER pin (r15, VERDICT r14 item 1): the 1-row stats aggregate
    # (broadcast build) and the scoring scan are independent consumers
    # — a lazy pin races and each side re-runs the corpus explode
    # (driver r14: rrf_fusion, which runs two such rankers in one
    # action, 1.02 → 2.03 s at local[32]).
    per_doc = persist_fact(per_doc)
    return _bm25_score(per_doc, id_col, len(terms), k1, b, k)


def _bm25_score(per_doc: DataFrame, id_col: str, n_terms: int, k1: float, b: float, k: int) -> DataFrame:
    """Scoring tail shared by bm25_rank and bm25_rank_incremental:
    corpus stats reduce from the doc-grain (dl, tf_i) relation and
    broadcast back; score is pure column algebra; deterministic top-k
    via TakeOrderedAndProject."""
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(n_terms)
        ],
    )
    norm = F.col("dl") / F.col("avgdl")
    contribs = []
    for i in range(n_terms):
        tf, dfreq = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - dfreq + 0.5) / (dfreq + 0.5))
        contribs.append(
            F.when(
                tf > 0,
                idf
                * (tf * F.lit(k1 + 1.0))
                / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * norm)),
            ).otherwise(F.lit(0.0))
        )
    matched = sum((F.col(f"tf_{i}") > 0).cast("long") for i in range(n_terms))
    scored = (
        per_doc.crossJoin(F.broadcast(stats))  # 1-row stats: broadcast, not cartesian
        .withColumn("bm25", F.round(sum(contribs, F.lit(0.0)), 6))
        .withColumn("n_terms", matched)
        .filter(F.col("n_terms") > 0)
    )
    return (
        scored.select(id_col, "bm25", "n_terms")
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_per_doc(df: DataFrame, text_col: str, id_col: str, query_terms: list[str]) -> DataFrame:
    """The doc-grain BM25 partial (dl + pivoted query-term tf) — the
    relation an index maintains at rest: mergeable by plain UNION
    (doc-grain rows are disjoint across batches), so absorbing a new
    document batch never re-tokenizes the base corpus."""
    terms = list(query_terms)
    tokens = df.select(
        F.col(id_col),
        F.explode(_norm_tokens_of(F.coalesce(F.col(text_col), F.lit("")))).alias("term"),
    )
    return tokens.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )


def bm25_rank_incremental(
    base_per_doc: DataFrame,
    delta_df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Incremental BM25: absorb a new document batch into an at-rest
    doc-grain partial (``bm25_per_doc`` of the base corpus) WITHOUT
    re-tokenizing the base — tokenization (the dominant lake-scale
    cost) is paid only on the delta; the global stats (n_docs, avgdl,
    df) re-reduce from the merged doc-grain partials, O(docs) not
    O(tokens). Exact: scores equal the full-corpus recompute (the
    oracle states exactly that) because BM25's corpus statistics are
    plain sums over disjoint doc-grain rows.
    """
    delta = bm25_per_doc(delta_df, text_col, id_col, list(query_terms))
    merged = base_per_doc.unionByName(delta)
    return _bm25_score(merged, id_col, len(list(query_terms)), k1, b, k)


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    n_buckets: int = 128,
    k: int = 20,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-n-gram profile is —
    ``w(doc) = Σ_f ln(p_target(f) / p_raw(f))`` over the doc's hashed
    word-bigram features (with multiplicity), Laplace-smoothed. The
    deterministic top-k by weight stands in for the paper's Gumbel
    resampling (seedless engine: same selection on every run/engine).

    Shape at scale: the exploded feature relation is built ONCE and
    reduced immediately to bucket grain — the two "models" are
    ``n_buckets``-row aggregates (a broadcast), and the per-doc score
    is one hash agg over (doc, bucket) counts joined to that
    broadcast. Nothing quadratic, one corpus-grain shuffle. Weights
    are floor-scaled to integer micro-units BEFORE the per-doc sum so
    cross-engine float accumulation order cannot flip a rounded
    digit (the pareto_abc lesson).
    """
    toks = df.select(
        F.col(id_col),
        target.alias("__target"),
        _norm_tokens_of(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
    feats = toks.select(
        F.col(id_col),
        "__target",
        F.explode(
            F.expr(
                "transform(slice(__t, 1, size(__t) - 1),"
                " (x, i) -> concat(x, ' ', element_at(__t, i + 2)))"
            )
        ).alias("__bg"),
    ).withColumn("bucket", F.pmod(_md5_long(F.col("__bg")), F.lit(n_buckets)))
    # (doc, bucket) counts: the only corpus-grain aggregate; feeds the
    # bucket models AND the final score join
    doc_feats = persist_fact(
        feats.groupBy(id_col, "__target", "bucket").agg(F.count(F.lit(1)).alias("n"))
    )  # doc-x-bucket grain (fact): eager — the bucket models and the
    # score join are independent stages that would race a lazy pin
    # n_buckets rows; checkpointed because BOTH totals and bucket_lr
    # consume it — without this each consumer re-aggregates the full
    # doc-grain relation (seen as a second ExistingRDD scan + hash agg
    # in the plan capture)
    models = (
        doc_feats.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__target"), F.col("n")).otherwise(F.lit(0))).alias("ct"),
            F.sum("n").alias("cr"),
        )
        .persist()  # bucket-grain; two consumers (lazy pin)
    )
    totals = models.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    # one ln per bucket on one exact rational (products stay < 2^53):
    # fewer libm calls -> less 1-ulp boundary surface than ln(a)-ln(b)
    lr_micro = F.floor(
        F.log(
            ((F.col("ct") + 1) * (F.col("tr") + F.lit(n_buckets)))
            / ((F.col("cr") + 1) * (F.col("tt") + F.lit(n_buckets)))
        )
        * F.lit(1000000.0)
    ).cast("long")
    bucket_lr = models.crossJoin(F.broadcast(totals)).select(
        "bucket", lr_micro.alias("lr_micro")
    )
    return (
        doc_feats.join(F.broadcast(bucket_lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n") * F.col("lr_micro")).alias("weight_micro"),
            F.sum("n").alias("n_feats"),
        )
        .orderBy(F.col("weight_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )


def char_entropy_by_group(
    docs: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Character-distribution Shannon entropy per group — the
    compression-ratio proxy in the quality-signal family (gibberish
    and boilerplate sit at the entropy extremes; natural prose
    clusters mid-range per language).

    The character grain is generated portably as (position explode ×
    substring) — the same idiom as the rolling-fingerprint oracle —
    then reduced IMMEDIATELY to the (group, char) count grain, so the
    only wide relation is per-document-length rows flowing into a
    partial-aggregated shuffle of at most |groups| × |alphabet| rows.
    Entropy folds ≤ alphabet-size float terms per group; the sum is
    rounded at the audit grain (term order is the only
    nondeterminism, bounded at 1e-15).

    Empty documents are filtered BEFORE the position generate:
    ``sequence(1, 0)`` DESCENDS, so an unguarded explode would emit
    two phantom ''-character rows per empty doc and inflate
    ``n_chars`` (the same sequence trap ngram_novelty guards). A group
    whose every document is empty has no character distribution and is
    absent from the output (stated grain).
    """
    chars = docs.filter(F.length(F.col(text_col)) > 0).select(
        F.col(group_col),
        F.explode(F.sequence(F.lit(1), F.length(F.col(text_col)))).alias("i"),
        F.col(text_col).alias("__t"),
    ).select(group_col, F.expr("substr(__t, i, 1)").alias("ch"))
    counts = chars.groupBy(group_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    total = F.sum("c").over(Window.partitionBy(group_col))
    p = F.col("c") / total
    term = -(p * F.log2(p))
    return (
        counts.select(F.col(group_col), term.alias("term"), F.col("c"))
        .groupBy(group_col)
        .agg(
            F.sum("c").alias("n_chars"),
            F.round(F.sum("term"), 6).alias("entropy_bits"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty in corpus (id) order: the fraction
    of a document's DISTINCT word n-grams whose first occurrence in
    the corpus is this document. Boilerplate-heavy or templated
    documents score low; genuinely new text scores high — the
    time-ordered complement of span_dedup's symmetric "shared with any
    other doc" measure, and the screen a curation pipeline uses to
    cap how much recycled text enters a training mix.

    Scale shape: grams are hashed to the seedless md5-long family
    in the same stage that generates them, so only (doc_id,
    gram_hash) longs ever shuffle — never gram text. Two hash
    aggregates (distinct per doc; min(doc_id) per gram) and one hash
    join on the gram hash: O(total tokens), the same class as
    shingling. Standard fingerprint caveat: a 2^-32 collision
    undercounts novelty by one gram.

    Documents with fewer than ``n`` tokens have no grams and are
    absent from the output (stated grain).
    """
    toks = _norm_tokens(text_col)
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .select(
            "doc_id",
            # sequence(1, stop) DESCENDS when stop < 1, so short docs
            # must short-circuit to an empty gram list explicitly.
            F.explode(
                F.when(
                    F.size("__toks") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
                        lambda i: _md5_long(
                            F.array_join(F.slice(F.col("__toks"), i, n), " ")
                        ),
                    ),
                ).otherwise(F.expr("array()").cast("array<bigint>"))
            ).alias("__g"),
        )
        .distinct()
    )
    # (doc, gram-hash)-grain, consumed by the first-occurrence
    # aggregate AND the join probe — independent stages: eager pin so
    # the explode + distinct run once (keep-lineage disk pin)
    grams = persist_fact(grams)
    first_seen = grams.groupBy("__g").agg(F.min("doc_id").alias("__first"))
    return (
        grams.join(first_seen, "__g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("__first") == F.col("doc_id"), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("novelty"),
        )
    )


def tfidf_query_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k documents by plain TF-IDF (tf · ln(N/df)) against a fixed
    query-term set — the second retrieval voice for rank fusion
    (:func:`~.similarity.rrf_fuse`): same single-corpus-scan shape as
    :func:`bm25_rank` (tf pivoted into the doc-length aggregate, 1-row
    stats broadcast back, TakeOrderedAndProject top-k), different
    scoring family, so the two rankers disagree exactly where fusion
    earns its keep (BM25's length normalization vs raw tf)."""
    terms = list(query_terms)
    tokens = df.select(
        F.col(id_col),
        F.explode(_norm_tokens_of(F.coalesce(F.col(text_col), F.lit("")))).alias("term"),
    )
    per_doc = (
        tokens.groupBy(id_col)
        .agg(
            *[
                F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ]
        )
    )
    # EAGER pin (r15, VERDICT r14 item 1): stats broadcast build +
    # scoring scan are independent consumers — see bm25_rank.
    per_doc = persist_fact(per_doc)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    contribs = []
    for i in range(len(terms)):
        tf, dfreq = F.col(f"tf_{i}"), F.col(f"df_{i}")
        contribs.append(
            F.when(tf > 0, tf * F.log(F.col("n_docs") / dfreq)).otherwise(F.lit(0.0))
        )
    matched = sum((F.col(f"tf_{i}") > 0).cast("long") for i in range(len(terms)))
    return (
        per_doc.crossJoin(F.broadcast(stats))  # 1-row stats
        .withColumn("tfidf", F.round(sum(contribs, F.lit(0.0)), 6))
        .withColumn("n_terms", matched)
        .filter(F.col("n_terms") > 0)
        .select(id_col, "tfidf", "n_terms")
        .orderBy(F.col("tfidf").desc(), F.col(id_col).asc())
        .limit(k)
    )


def collocation_pmi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k word collocations by document-level PMI: for unordered
    token pairs co-occurring in ≥ ``min_docs`` documents, pmi =
    ln(n_ab·N / (n_a·n_b)) — the classic collocation extractor
    (phrases worth treating as single vocabulary units before BPE).

    DOC-LOCAL pair generation: the self-join keys on the doc id, so
    the quadratic term is Σ|doc-distinct-tokens|² — bounded by
    document length, never vocabulary² or corpus² (the basket_pairs
    class). Counts are exact integers; the single ln() per surviving
    pair is the only float. Deterministic top-k (pmi round-6 desc,
    token_a, token_b) compiles to TakeOrderedAndProject.
    """
    toks = (
        df.filter(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("__id"), F.explode(_norm_tokens(text_col)).alias("t"))
        .distinct()
    )
    n_docs = df.filter(F.length(F.col(text_col)) > 0).agg(
        F.count(F.lit(1)).alias("__n")
    )
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a = toks.select("__id", F.col("t").alias("token_a"))
    b = toks.select("__id", F.col("t").alias("token_b"))
    pairs = (
        a.join(b, "__id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_docs)
    )
    na = uni.select(F.col("t").alias("token_a"), F.col("n_t").alias("n_a"))
    nb = uni.select(F.col("t").alias("token_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "token_a")
        .join(F.broadcast(nb), "token_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a", "token_b", "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * F.col("__n")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("token_a").asc(), F.col("token_b").asc())
        .limit(k)
    )


def behavior_entropy(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    min_n: int = 10,
) -> DataFrame:
    """Per-key Shannon entropy (bits) over a categorical column's
    distribution — behavioral-diversity profiling (a user who only
    ever views scores 0; one spread over all event types scores
    log2(|types|)). Same two-hash-aggregate shape as
    :func:`char_entropy_by_group` at a different grain: the only wide
    relation reduces immediately to (key, category) counts; entropy
    folds ≤ |categories| float terms per key, rounded at the audit
    grain."""
    counts = df.groupBy(key_col, cat_col).agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c").over(Window.partitionBy(key_col))
    p = F.col("c") / total
    return (
        counts.select(F.col(key_col), (-(p * F.log2(p))).alias("__term"), F.col("c"))
        .groupBy(key_col)
        .agg(
            F.sum("c").alias("n_events"),
            F.round(F.sum("__term"), 6).alias("entropy_bits"),
        )
        .filter(F.col("n_events") >= min_n)
    )


def phrase_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase search over a positional inverted index: number of
    OVERLAPPING occurrences of the n-token phrase per document (docs
    with >= 1 match).

    The index is the (doc, term, pos) posting relation — the shape a
    search system stores at rest, partitioned by term so a phrase
    query touches only its own terms' posting lists (partition
    pruning, never a corpus scan). The phrase becomes n-1 equi-joins
    on (doc, pos+i): each join input is one term's posting list,
    already tiny after the term filter; Spark broadcasts the smaller
    lists under AQE. Positions from ONE posexplode of the normalized
    token array (same normalization as every corpus operator, so the
    index is shared).
    """
    terms = phrase.split()
    if not terms:
        raise ValueError("empty phrase")
    index = df.select(
        F.col(id_col),
        F.posexplode(_norm_tokens(text_col)).alias("__pos", "__term"),
    )
    matched = index.filter(F.col("__term") == terms[0]).select(
        F.col(id_col), F.col("__pos").alias("__start")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = index.filter(F.col("__term") == t).select(
            F.col(id_col), (F.col("__pos") - i).alias("__start")
        )
        matched = matched.join(nxt, [id_col, "__start"])
    return matched.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )


def lm_trigram_backoff(
    df: DataFrame,
    text_col: str,
    id_col: str,
    holdout_mod: int = 10,
) -> DataFrame:
    """Stupid-backoff trigram coverage audit for held-out documents:
    the corpus splits deterministically (doc_id % holdout_mod == 0 is
    the target split, the rest is the reference LM), every target
    trigram is classified by the deepest reference n-gram that covers
    it — trigram hit (l3), bigram-backoff hit on (w2,w3) (l2),
    unigram-backoff hit on w3 (l1), or OOV — and each target doc
    reports its counts plus the trigram hit rate. The novelty /
    contamination-adjacent signal an LM data pipeline uses to price a
    new document against the training corpus, kept engine-exact by
    emitting COUNTS (the one float is a single division).

    Plan: trigram/bigram/unigram reference SETS reduce once each
    (vocab-grain, far below corpus grain) and join the target's
    trigram relation as int64 fingerprints — three hash joins, no
    strings on the wire, no corpus-grain shuffle beyond the target's
    own trigram explode.
    """
    from ..functions.text import fingerprint64

    toks = _norm_tokens(text_col)
    # sequence(1, 0) would DESCEND ([1, 0]) for docs under 3 tokens and
    # emit phantom out-of-range trigrams — guard like functions.text.shingles
    tri = F.expr(
        "transform("
        "  CASE WHEN size(__toks) >= 3 THEN sequence(1, size(__toks) - 2) "
        "       ELSE CAST(array() AS array<int>) END, "
        "i -> struct(concat_ws(' ', __toks[i-1], __toks[i], __toks[i+1]) AS t3, "
        "concat_ws(' ', __toks[i], __toks[i+1]) AS t2, __toks[i+1] AS t1))"
    )
    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        F.col(id_col), F.explode(tri).alias("__g")
    ).select(
        F.col(id_col),
        fingerprint64(F.col("__g.t3")).alias("__h3"),
        fingerprint64(F.col("__g.t2")).alias("__h2"),
        fingerprint64(F.col("__g.t1")).alias("__h1"),
    )
    # deliberately NOT pinned (r14 opt round): the 4-consumer
    # re-tokenize costs less at sf0.1 than materializing the relation
    # (0.80 -> 1.11 s with an eager pin, paired A/B) — the lighter
    # 3-hash row makes this the assoc_rules trade, unlike
    # trigram_doc_logprob's 5-hash, 7-consumer base, which pins.
    is_target = F.col(id_col) % holdout_mod == 0
    target = base.filter(is_target)
    ref = base.filter(~is_target)
    r3 = ref.select(F.col("__h3").alias("__r3")).distinct()
    r2 = ref.select(F.col("__h2").alias("__r2")).distinct()
    r1 = ref.select(F.col("__h1").alias("__r1")).distinct()
    lv = (
        target.join(r3, target["__h3"] == r3["__r3"], "left")
        .join(r2, target["__h2"] == r2["__r2"], "left")
        .join(r1, target["__h1"] == r1["__r1"], "left")
        .select(
            F.col(id_col),
            F.when(F.col("__r3").isNotNull(), F.lit(3))
            .when(F.col("__r2").isNotNull(), F.lit(2))
            .when(F.col("__r1").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("__lv"),
        )
    )
    cnt = lambda v: F.sum(F.when(F.col("__lv") == v, 1).otherwise(0)).cast("long")  # noqa: E731
    return lv.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tri"),
        cnt(3).alias("n_l3"),
        cnt(2).alias("n_l2"),
        cnt(1).alias("n_l1"),
        cnt(0).alias("n_oov"),
    ).withColumn(
        "hit3_rate",
        F.round(F.col("n_l3").cast("double") / F.col("n_tri"), 6),
    )


def doc_ngram_repetition(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Within-document n-gram repetition profile — the Gopher-family
    repetition filter (Rae et al. 2021 §A1.1) adapted to token
    n-grams: documents whose text is dominated by a few repeated
    phrases (SEO spam, templated boilerplate, generation loops) are
    poison for LM training and this is the standard screen. Per doc:

      n_tokens        exact whitespace-token count
      n_bigrams       bigram positions (n_tokens − 1, 0 if < 2)
      top_bigram_n    occurrences of the MOST frequent bigram
      rep2_micro      floor(1e6 · 2·top_bigram_n / n_tokens) — the
                      token-mass share of the top bigram, micro-units
      n_ngrams        n-gram positions (window n)
      dup_ngram_n     positions whose n-gram occurs ≥ 2× in the doc
      repn_micro      floor(1e6 · dup_ngram_n / n_ngrams)

    Every output is an INTEGER (counts, or floor-scaled micro-ratios
    of exact counts — one IEEE division each, both engines identical);
    thresholding is the caller's policy (Gopher drops top-2-gram mass
    > 0.20 and dup-5-gram coverage in the same spirit). Sibling of
    the ``repetition_ratio`` entry (top-bigram fraction only): the
    dup-n-gram POSITION share is the signal that catches a document
    looping several different phrases, which no single top gram sees.
    rep2_micro can exceed 1e6 when top-bigram occurrences overlap
    (token mass 2·c vs n: "a a a" counts the middle token twice).

    Plan: one explode to (doc, gram) grain, one hash aggregate to
    (doc, gram) counts, one to doc grain — the repetition statistics
    need no cross-doc state at all, so the whole audit is
    map-side-combinable and embarrassingly parallel at 100 TB.
    """
    toks = _norm_tokens(text_col)
    grams = lambda k: F.expr(  # noqa: E731
        "transform("
        f"  CASE WHEN size(__toks) >= {k} THEN sequence(1, size(__toks) - {k - 1}) "
        "       ELSE CAST(array() AS array<int>) END, "
        f"i -> concat_ws(' ', slice(__toks, i, {k})))"
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).cast("long").alias("__nt")
    )

    def gram_stats(k: int, top: bool) -> DataFrame:
        cnt = (
            base.select(F.col(id_col), F.explode(grams(k)).alias("__g"))
            .groupBy(id_col, "__g")
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        )
        if top:
            return cnt.groupBy(id_col).agg(F.max("__c").alias(f"top_{k}gram_n"))
        return cnt.groupBy(id_col).agg(
            F.sum(F.when(F.col("__c") >= 2, F.col("__c")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"dup_{k}gram_n")
        )

    top2 = gram_stats(2, top=True)
    dupn = gram_stats(n, top=False)
    micro = lambda num, den: F.when(  # noqa: E731
        den > 0,
        F.floor(F.lit(1000000.0) * num.cast("double") / den.cast("double")).cast("long"),
    ).otherwise(F.lit(0))
    n_bi = F.greatest(F.col("__nt") - 1, F.lit(0))
    n_ng = F.greatest(F.col("__nt") - (n - 1), F.lit(0))
    return (
        base.select(F.col(id_col), "__nt")
        .join(top2, id_col, "left")
        .join(dupn, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__nt").alias("n_tokens"),
            n_bi.cast("long").alias("n_bigrams"),
            F.coalesce("top_2gram_n", F.lit(0)).cast("long").alias("top_bigram_n"),
            micro(F.lit(2) * F.coalesce("top_2gram_n", F.lit(0)), F.col("__nt")).alias(
                "rep2_micro"
            ),
            n_ng.cast("long").alias("n_ngrams"),
            F.coalesce(f"dup_{n}gram_n", F.lit(0)).cast("long").alias("dup_ngram_n"),
            micro(F.coalesce(f"dup_{n}gram_n", F.lit(0)), n_ng).alias("repn_micro"),
        )
    )


def trigram_doc_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    holdout_mod: int = 10,
) -> DataFrame:
    """Per-document stupid-backoff trigram LOG-SCORE for held-out
    documents — the perplexity-proxy quality filter of an LM data
    pipeline (score a candidate document under a reference corpus LM;
    rank or threshold to drop gibberish / off-distribution text). The
    count-based companion of :func:`lm_trigram_backoff`, which only
    classifies coverage levels; this one prices them:

        S(w3 | w1 w2) = c3/c2p          if the trigram is in the ref
                        0.4·c2/c1p      elif the (w2,w3) bigram is
                        0.16·c1/N       elif the unigram w3 is
                        0.16/(N+1)      else (OOV floor)

    (Brants et al. 2007 "Large language models in machine
    translation" — stupid backoff with the canonical 0.4 factor;
    scores are not normalized probabilities, which is exactly why the
    backoff needs no discounting pass and stays two-join-deep at lake
    scale.)

    Engine-exactness (the dsir_weights pattern): every score is ONE
    `ln` call on ONE exact rational of int64 counts (0.4 = 2/5 and
    0.16 = 4/25 fold INTO the rational: ln(2·c2/(5·c1p)) — fewer libm
    calls, less 1-ulp boundary surface), floor-scaled to integer
    MICRO-units per trigram; the per-doc reduction sums int64, so
    float accumulation order cannot flip a digit. The per-trigram
    average is ALSO integral — floor(Σmicro / n) in micro-nats —
    because a round-6 float average lands EXACTLY on .5 at the sixth
    digit whenever Σmicro is odd over n=2 (the pareto_abc lesson:
    Spark HALF_UP vs DuckDB half-even would flip the last digit).

    Plan: the trigram relation is built once; the five reference
    count models reduce to n-gram grain (far below corpus grain) and
    join the target's trigrams as int64 fingerprints — hash joins on
    longs, no strings on the wire. 64-bit fingerprint collisions
    merge counts (same accepted contract as every fingerprint64
    consumer); N = total reference trigram positions.
    """
    from ..functions.text import fingerprint64

    toks = _norm_tokens(text_col)
    tri = F.expr(
        "transform("
        "  CASE WHEN size(__toks) >= 3 THEN sequence(1, size(__toks) - 2) "
        "       ELSE CAST(array() AS array<int>) END, "
        "i -> struct(concat_ws(' ', __toks[i-1], __toks[i], __toks[i+1]) AS t3, "
        "concat_ws(' ', __toks[i-1], __toks[i]) AS t2p, "
        "concat_ws(' ', __toks[i], __toks[i+1]) AS t2, "
        "__toks[i] AS t1p, __toks[i+1] AS t1))"
    )
    base = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.explode(tri).alias("__g"))
        .select(
            F.col(id_col),
            fingerprint64(F.col("__g.t3")).alias("__h3"),
            fingerprint64(F.col("__g.t2p")).alias("__h2p"),
            fingerprint64(F.col("__g.t2")).alias("__h2"),
            fingerprint64(F.col("__g.t1p")).alias("__h1p"),
            fingerprint64(F.col("__g.t1")).alias("__h1"),
        )
    )
    # trigram-grain, consumed by SEVEN independent arms (five count
    # models + N over ref, plus the target probe): without the eager
    # pin every arm re-tokenizes and re-explodes the corpus (measured
    # 14 scans in plans/r14/trigram_doc_logprob_before.txt)
    base = persist_fact(base)
    is_target = F.col(id_col) % holdout_mod == 0
    target = base.filter(is_target)
    ref = base.filter(~is_target)

    def model(col: str, out: str) -> DataFrame:
        return ref.groupBy(F.col(col).alias(f"__k_{out}")).agg(
            F.count(F.lit(1)).cast("long").alias(out)
        )

    c3 = model("__h3", "c3")
    c2p = model("__h2p", "c2p")
    c2 = model("__h2", "c2")
    c1p = model("__h1p", "c1p")
    c1 = model("__h1", "c1")
    n_row = ref.agg(F.count(F.lit(1)).cast("long").alias("__N"))

    d = lambda c: F.col(c).cast("double")  # noqa: E731
    micro = lambda expr: F.floor(F.log(expr) * F.lit(1000000.0)).cast("long")  # noqa: E731
    score = (
        F.when(F.col("c3").isNotNull(), micro(d("c3") / d("c2p")))
        .when(
            F.col("c2").isNotNull(),
            micro((F.lit(2.0) * d("c2")) / (F.lit(5.0) * d("c1p"))),
        )
        .when(
            F.col("c1").isNotNull(),
            micro((F.lit(4.0) * d("c1")) / (F.lit(25.0) * d("__N"))),
        )
        .otherwise(micro(F.lit(4.0) / (F.lit(25.0) * (d("__N") + F.lit(1.0)))))
    )
    scored = (
        target.join(c3, target["__h3"] == c3["__k_c3"], "left")
        .join(c2p, target["__h2p"] == c2p["__k_c2p"], "left")
        .join(c2, target["__h2"] == c2["__k_c2"], "left")
        .join(c1p, target["__h1p"] == c1p["__k_c1p"], "left")
        .join(c1, target["__h1"] == c1["__k_c1"], "left")
        .crossJoin(F.broadcast(n_row))
        .select(F.col(id_col), score.alias("__s"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tri"),
        F.sum("__s").cast("long").alias("logprob_micro"),
    ).withColumn(
        "avg_logprob_micro",
        F.floor(
            F.col("logprob_micro").cast("double") / F.col("n_tri").cast("double")
        ).cast("long"),
    )


def token_run_lengths(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Degenerate-repetition audit: per document, the longest run of
    consecutive IDENTICAL tokens (and which token it is) plus the run
    count — the screen that catches looped generation / boilerplate
    stutter ("very very very …") that n-gram ratios dilute away.

    One doc-partitioned window pass over the posexploded token
    relation (change flags + run-id cumsum share the exchange), one
    (doc, run) aggregate, one doc rollup. The argmax run is the max
    (run_len, token) struct — deterministic under ties (lexicographic
    larger token wins).
    """
    tokens = df.select(
        F.col(id_col), F.posexplode(_norm_tokens(text_col)).alias("pos", "term")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = tokens.withColumn(
        "__new",
        F.when(F.lag("term").over(w).eqNullSafe(F.col("term")), F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("__run", F.sum("__new").over(w))
    runs = flagged.groupBy(id_col, "__run").agg(
        F.count(F.lit(1)).alias("__len"), F.max("term").alias("__term")
    )
    return runs.groupBy(id_col).agg(
        F.sum("__len").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max(F.struct(F.col("__len"), F.col("__term"))).alias("__best"),
    ).select(
        id_col,
        "n_tokens",
        "n_runs",
        F.col("__best.__len").cast("long").alias("max_run"),
        F.col("__best.__term").alias("run_token"),
    )


def deterministic_shuffle(docs: DataFrame, id_col: str, n_shards: int = 8) -> DataFrame:
    """Seedless reproducible training order: every document gets a
    (shard, position) that is a pure function of its id — the property
    a pretraining run needs so a rebuilt corpus reproduces the same
    batch sequence with no seed registry (the dataset_split argument,
    applied to ORDER). Shard = the portable md5 bucket; position =
    rank within the shard ordered by the full md5 hex (uniform,
    engine-portable) with the id as tiebreaker.

    The per-shard rank uses
    :func:`~.windows.partitioned_row_number_two_phase` — at lake scale
    one shard is tens of GB, and a per-key WindowExec would route all
    of it through a single task; the two-phase global rank + per-shard
    min-rank join keeps every stage partitioned.
    """
    from .windows import partitioned_row_number_two_phase

    base = docs.select(
        F.col(id_col),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
        hash_bucket(F.col(id_col), n_shards).cast("int").alias("shard"),
    )
    out = partitioned_row_number_two_phase(
        base, ["shard"], [F.col("__h"), F.col(id_col)], "pos"
    )
    return out.select(F.col(id_col), "shard", F.col("pos").cast("long").alias("pos"))


def token_budget_select(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Per-source quality-ranked greedy selection under a token budget
    — the curation step that turns "mix 30% of source A" into an
    actual document list: within each source, take documents in
    descending quality order until the cumulative token count would
    exceed the budget (prefix rule: the cumulative sum is monotone, so
    the kept set is exactly the rows with cum ≤ budget).

    Quality is the repo's 3-signal heuristic scaled to an exact
    integer (score·3 ∈ {0..3}); ordering is total via the id
    tiebreaker, so the selection is deterministic and engine-portable.
    The per-source cumulative sum uses
    :func:`~.windows.partitioned_running_sum_two_phase` — a source is
    the classic giant-key case where a per-key WindowExec would
    single-task terabytes.
    """
    return token_budget_select_scored(
        _token_budget_scored(docs, text_col, id_col, source_col), id_col, budget_tokens
    )


def token_budget_select_scored(
    scored: DataFrame, id_col: str, budget_tokens: int
) -> DataFrame:
    """:func:`token_budget_select`'s budget stage decoupled from text
    scoring: takes the already-scored relation (source, id,
    quality_x3, n_tokens) so composed pipelines (the curation funnel
    in ``plans.corpus_pipeline``) can reuse ONE text scan across
    stages instead of re-tokenizing per consumer. ``token_budget_select``
    delegates here, so the two can never drift."""
    cum = _token_budget_cum(scored, id_col)
    return cum.filter(F.col("cum_tokens") <= budget_tokens).select(
        "source", F.col(id_col), "quality_x3", "n_tokens", "cum_tokens"
    )


def _token_budget_scored(
    docs: DataFrame, text_col: str, id_col: str, source_col: str
) -> DataFrame:
    """Shared scoring projection for the token-budget family:
    (source, id, quality_x3, n_tokens)."""
    from ..functions.text import quality_score, whitespace_token_count

    return docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.round(quality_score(text_col) * 3).cast("int").alias("quality_x3"),
        whitespace_token_count(text_col).cast("long").alias("n_tokens"),
    )


def _token_budget_cum(scored: DataFrame, id_col: str) -> DataFrame:
    """Per-source greedy-prefix cumulative sum in the family's total
    order (quality desc, id asc) — two-phase, no per-key WindowExec."""
    from .windows import partitioned_running_sum_two_phase

    return partitioned_running_sum_two_phase(
        scored,
        ["source"],
        [F.col("quality_x3").desc(), F.col(id_col).asc()],
        "n_tokens",
        "cum_tokens",
    )


def _first_rejected_cutoff(cum: DataFrame, id_col: str, budget_tokens: int) -> DataFrame:
    """Per-source sort key of the FIRST over-budget row — the greedy
    boundary. Because cum_tokens is monotone within a source, every
    row at-or-below this key is rejected, so the key is the complete
    rejection state a later incremental fold needs. Sources that never
    overflowed are absent. The rank-min over rejected rows is one
    struct-min (struct comparison is lexicographic; quality is negated
    so 'higher quality first' becomes 'smaller struct')."""
    return (
        cum.filter(F.col("cum_tokens") > budget_tokens)
        .groupBy("source")
        .agg(
            F.min(
                F.struct(
                    (-F.col("quality_x3")).alias("nq"), F.col(id_col).alias("cid")
                )
            ).alias("__c")
        )
        .select(
            "source",
            (-F.col("__c.nq")).cast("int").alias("cut_quality_x3"),
            F.col("__c.cid").alias("cut_id"),
        )
    )


def token_budget_cutoff(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Per-source greedy-cutoff state of a full :func:`token_budget_select`
    run — (source, cut_quality_x3, cut_id), the sort key of the first
    row whose cumulative tokens overflowed the budget. This tiny
    (≤ #sources rows) relation is the SECOND half of the at-rest state
    an exact incremental fold requires: the selected rows say what is
    in, the cutoff says where 'out' begins. Persist it next to the
    selection (the token_budget_sink does)."""
    return token_budget_cutoff_scored(
        _token_budget_scored(docs, text_col, id_col, source_col), id_col, budget_tokens
    )


def token_budget_cutoff_scored(
    scored: DataFrame, id_col: str, budget_tokens: int
) -> DataFrame:
    """:func:`token_budget_cutoff` over an already-scored relation
    (source, id, quality_x3, n_tokens) — the scored-grain twin of
    :func:`token_budget_select_scored`, for composed pipelines that
    already paid the text scan. ``token_budget_cutoff`` delegates
    here."""
    cum = _token_budget_cum(scored, id_col)
    return _first_rejected_cutoff(cum, id_col, budget_tokens)


def code_switch_audit(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Code-switching screen: documents whose SECOND-strongest
    language signal is at least half the strongest are flagged as
    mixed-language — the curation case single-label language ID
    (:func:`~..functions.text.language_id`) silently mislabels, and
    the standard reason a "French" document poisons an English-only
    filter pass. Per doc: the argmax language (same tie-break as
    lang_id), the top and runner-up stopword hit counts, and the
    0/1 flag ``2·second >= top`` (exact integers, no ratio float).

    One pass of column algebra over the same stopword-hit columns the
    language-ID expression uses — no UDF, no shuffle, no joins; the
    runner-up comes from one array_sort over the fixed 6-language
    hit vector.
    """
    from ..functions.text import STOPWORDS, stopword_hit_count

    langs = list(STOPWORDS)
    n = len(langs)
    base = docs.select(
        F.col(id_col),
        *[
            stopword_hit_count(text_col, lang).cast("long").alias(f"__h_{lang}")
            for lang in langs
        ],
    )
    arr = F.array_sort(F.array(*[F.col(f"__h_{lang}") for lang in langs]))
    top = F.element_at(arr, n)
    second = F.element_at(arr, n - 1)
    lang_expr = F.lit("und")
    for lang in reversed(langs):
        lang_expr = F.when(
            (F.col(f"__h_{lang}") == top) & (top > 0), F.lit(lang)
        ).otherwise(lang_expr)
    return base.select(
        F.col(id_col),
        lang_expr.alias("lang_top"),
        top.cast("long").alias("hits_top"),
        second.cast("long").alias("hits_second"),
        F.when((top > 0) & (F.lit(2) * second >= top), 1).otherwise(0).cast("int").alias(
            "is_code_switched"
        ),
    )


def filter_overlap_matrix(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Pairwise overlap of the corpus curation filters: for every
    unordered pair of drop-rules (too-short, low-quality,
    unknown-language, phrase-repetition), how many documents BOTH
    would remove — the ablation audit a filter-stack design reads
    before ordering the cascade (a rule whose kills are a subset of
    an earlier rule's adds nothing but risk; `curation_filter` logs
    only the FIRST failing rule, so overlap is invisible there).
    Diagonal rows are per-rule totals.

    Every predicate is exact-integer (the repetition rule is
    ``5·top_bigram > n_bigrams``, i.e. the Gopher 0.2 mass threshold
    cleared of float division); one doc-grain flag projection, one
    1-row aggregate of the 10 pair sums, exploded to long format —
    the only corpus-grain work is the one scan + bigram reduce.
    """
    from ..functions.text import language_id, quality_score_int3

    toks = _norm_tokens(text_col)
    bi = F.expr(
        "transform("
        "  CASE WHEN size(__toks) >= 2 THEN sequence(1, size(__toks) - 1) "
        "       ELSE CAST(array() AS array<int>) END, "
        "i -> concat_ws(' ', __toks[i-1], __toks[i]))"
    )
    rep = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.size("__toks").alias("__nt"), F.explode_outer(bi).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.max("__nt").alias("__nt"), F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.max("__nt").alias("__nt"),
            F.max(F.when(F.col("__g").isNotNull(), F.col("__c")).otherwise(0)).alias("__top"),
        )
        .select(
            F.col(id_col),
            (
                (F.lit(5) * F.col("__top") > F.greatest(F.col("__nt") - 1, F.lit(0)))
                & (F.col("__nt") >= 2)
            ).alias("f_repeat"),
        )
    )
    flags = (
        docs.select(
            F.col(id_col),
            (F.length(text_col) < 50).alias("f_short"),
            (quality_score_int3(text_col) < 2).alias("f_quality"),
            (language_id(text_col) == "und").alias("f_lang"),
        )
        .join(rep, id_col, "left")
        .na.fill({"f_repeat": False})
    )
    names = ["short", "quality", "lang", "repeat"]
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i:]]
    agg_row = flags.agg(
        *[
            F.sum(
                (F.col(f"f_{a}") & F.col(f"f_{b}")).cast("long")
            ).alias(f"{a}__{b}")
            for a, b in pairs
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("rule_a"),
                F.lit(b).alias("rule_b"),
                F.col(f"{a}__{b}").cast("long").alias("n_both"),
            )
            for a, b in pairs
        ]
    )
    return agg_row.select(F.explode(structs).alias("x")).select("x.*")


def curriculum_phases(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_phases: int = 3,
) -> DataFrame:
    """Curriculum assignment (Bengio et al. 2009 applied to corpus
    order): every document gets a PHASE (1 = easiest) by exact ntile
    over the difficulty ordering — high quality first, short first,
    id tiebreak — and a deterministic within-phase position (the
    :func:`deterministic_shuffle` md5 order), so a curriculum
    schedule is a pure function of the corpus: rebuilds reproduce the
    same phase boundaries and the same batch sequence with no seed.

    Both ranks are two-phase (global ntile via
    :func:`~.windows.two_phase_row_number` +
    :func:`~.windows.ntile_from_rank`; per-phase position via
    :func:`~.windows.partitioned_row_number_two_phase`) — a phase is
    a third of the corpus, the definitional giant key that must never
    route through one WindowExec task.
    """
    from ..functions.text import quality_score_int3, whitespace_token_count
    from .windows import (
        ntile_from_rank,
        partitioned_row_number_two_phase,
        two_phase_row_number,
    )

    base = docs.select(
        F.col(id_col),
        quality_score_int3(text_col).cast("int").alias("quality_x3"),
        whitespace_token_count(text_col).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    ranked, total = two_phase_row_number(
        base,
        [F.col("quality_x3").desc(), F.col("n_tokens").asc(), F.col(id_col).asc()],
        "__r",
    )
    staged = ranked.withColumn(
        "phase", ntile_from_rank(F.col("__r"), n_phases, total)
    ).drop("__r")
    out = partitioned_row_number_two_phase(
        staged, ["phase"], [F.col("__h"), F.col(id_col)], "pos"
    )
    return out.select(
        F.col(id_col), "quality_x3", "n_tokens", "phase", F.col("pos").cast("long").alias("pos")
    )


def mix_epoch_plan(
    df: DataFrame,
    text_col: str,
    group_col: str,
    total_tokens: int,
    alpha: float = 0.3,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Mixture EPOCH plan: turn temperature-scaled sampling weights
    (:func:`temperature_mix_weights`) and a total token budget into
    the passes-over-each-source table — epochs = min(w·T / tokens_s,
    max_epochs), with the tokens the cap forfeits reported as
    ``shortfall_tokens``. This is the repetition-risk readout of a mix
    design: up-weighting a small source past ~4 passes degrades models
    (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    Models"), so the planner CAPS it and makes the shortfall explicit
    for the designer to reallocate, instead of silently over-epoching.

    Same exactness shape as temperature_mix_weights: exact int64 token
    sums, order-free quantized normalizer, then epochs/shortfall as
    shared-verbatim float expressions over the ~|sources| relation.
    """
    from ..functions.text import whitespace_token_count

    srcs = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(whitespace_token_count(text_col).cast("long"))
            .cast("long")
            .alias("n_tokens"),
        )
        .localCheckpoint(eager=True)  # source-grain reduction; eager —
        # the zero-FileScan plan invariant (test_plan_properties) pins
        # the corpus-scanned-once mechanism at the plan level
    )
    tot = srcs.agg(F.sum("n_tokens").cast("long").alias("__t"))
    p = F.col("n_tokens").cast("double") / F.col("__t").cast("double")
    staged = srcs.crossJoin(F.broadcast(tot)).withColumn(
        "__paq",
        F.floor(F.pow(p, F.lit(alpha)) * F.lit(1.0e15)).cast("decimal(38,0)"),
    )
    denom = staged.agg(F.sum("__paq").alias("__d"))
    wt = F.col("__paq").cast("double") / F.col("__d").cast("double")
    alloc = wt * F.lit(float(total_tokens))
    ratio = alloc / F.col("n_tokens").cast("double")
    return (
        staged.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(wt, 6).alias("sample_weight"),
            F.floor(alloc).cast("long").alias("target_tokens"),
            F.round(F.least(ratio, F.lit(float(max_epochs))), 6).alias("epochs"),
            F.when(
                ratio > F.lit(float(max_epochs)),
                F.floor(
                    alloc - F.lit(float(max_epochs)) * F.col("n_tokens").cast("double")
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("shortfall_tokens"),
        )
    )


def _token_budget_fold_cum(
    prior_selected: DataFrame,
    prior_cutoff: DataFrame,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
) -> DataFrame:
    """The incremental fold's ranked relation: score ONLY the batch,
    drop batch docs ranked at-or-below the prior per-source cutoff
    (in the full-union greedy they sit below a row that already
    overflowed — cum is monotone, so they are rejected without being
    ranked), union with the at-rest SELECTED rows, re-apply the
    two-phase cumulative sum. Both public fold outputs (the new
    selection and the new cutoff) derive from this one relation."""
    scored_new = _token_budget_scored(new_docs, text_col, id_col, source_col)
    cut = prior_cutoff.select(
        "source",
        F.col("cut_quality_x3").cast("int"),
        F.col("cut_id"),
    )
    survives = (
        F.col("cut_quality_x3").isNull()
        | (F.col("quality_x3") > F.col("cut_quality_x3"))
        | (
            (F.col("quality_x3") == F.col("cut_quality_x3"))
            & (F.col(id_col) < F.col("cut_id"))
        )
    )
    gated = (
        scored_new.join(F.broadcast(cut), "source", "left")
        .filter(survives)
        .drop("cut_quality_x3", "cut_id")
    )
    prior = prior_selected.select(
        "source", F.col(id_col), F.col("quality_x3").cast("int"), F.col("n_tokens").cast("long")
    )
    return _token_budget_cum(prior.unionByName(gated), id_col)


def token_budget_select_incremental(
    prior_selected: DataFrame,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    budget_tokens: int,
    prior_cutoff: DataFrame,
) -> DataFrame:
    """Fold a NEW document batch into an existing token-budget
    selection WITHOUT re-ranking the at-rest corpus — the
    continuous-ingestion twin of :func:`token_budget_select` (the
    minhash_near_dup_incremental pattern applied to curation).

    ``prior_selected`` is the at-rest output of a previous
    :func:`token_budget_select` run (read back from parquet:
    (source, id, quality_x3, n_tokens) — cum_tokens is recomputed);
    ``prior_cutoff`` is the matching :func:`token_budget_cutoff`
    state (source, cut_quality_x3, cut_id). Only the new batch is
    scored here; the at-rest corpus is touched through its (tiny)
    SELECTED rows and per-source cutoff keys only — never re-read.

    EXACTNESS (the cutoff-carrying prefix rule): within a source the
    cumulative sum is monotone, so in the full-union greedy every doc
    ranked at-or-below the first over-budget doc is rejected. The fold
    therefore (a) rejects batch docs ranked at-or-below the prior
    cutoff outright, and (b) re-ranks (prior_selected ∪ surviving
    batch); above the cutoff the union's cumulative sum equals the
    fold's, because rejected at-rest docs contribute no mass there.
    Selected-rows-only folding WITHOUT the cutoff is NOT exact — a
    batch doc ranked below a previously-rejected doc would be admitted
    because the rejected doc's tokens are missing from the fold's
    cumulative sum (the r12 advice counterexample: corpus d1=90tok
    selected, d2=20tok rejected at budget 100, batch b=5tok below d2 —
    the cutoff-free fold selects {d1, b}, the full recompute {d1}).
    The registry oracle runs the full-union greedy SQL against this
    incremental plan, making the exactness a per-round differential
    check; :func:`token_budget_cutoff_incremental` maintains the
    cutoff across epochs so the streaming sink never drifts.

    Scale: the fold ranks |selected| + |batch| rows (budget-bounded +
    batch-bounded — independent of corpus size); the cutoff join is a
    broadcast of ≤ #sources rows; the per-source cumulative sum stays
    on the two-phase shape since a single source can still be a giant
    key within the fold.
    """
    cum = _token_budget_fold_cum(
        prior_selected, prior_cutoff, new_docs, text_col, id_col, source_col
    )
    return cum.filter(F.col("cum_tokens") <= budget_tokens).select(
        "source", F.col(id_col), "quality_x3", "n_tokens", "cum_tokens"
    )


def token_budget_cutoff_incremental(
    prior_selected: DataFrame,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    budget_tokens: int,
    prior_cutoff: DataFrame,
) -> DataFrame:
    """The cutoff state AFTER folding ``new_docs`` — the rank-min (in
    (quality desc, id asc) order) of the prior cutoff and the fold's
    own first over-budget row per source. Inductively exact: union
    rejections are (old rejections, all at-or-below the old cutoff) ∪
    (batch docs gated out, also at-or-below it) ∪ (fold rejections,
    at-or-below the fold's first overflow), and the earliest of those
    keys is the union run's first overflow. Persist this next to the
    new selection; the pair is the complete at-rest state for the next
    epoch (the token_budget_sink does exactly that)."""
    cum = _token_budget_fold_cum(
        prior_selected, prior_cutoff, new_docs, text_col, id_col, source_col
    )
    fold_cut = _first_rejected_cutoff(cum, id_col, budget_tokens)
    return _cutoff_rank_min(prior_cutoff, fold_cut)


def _cutoff_rank_min(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-source earlier-in-rank of two cutoff relations — min of
    struct(-quality, id), the same lexicographic trick as
    :func:`_first_rejected_cutoff`."""
    both = a.select(
        "source", F.col("cut_quality_x3").cast("int"), F.col("cut_id")
    ).unionByName(
        b.select("source", F.col("cut_quality_x3").cast("int"), F.col("cut_id"))
    )
    return (
        both.groupBy("source")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cut_quality_x3")).alias("nq"),
                    F.col("cut_id").alias("cid"),
                )
            ).alias("__c")
        )
        .select(
            "source",
            (-F.col("__c.nq")).cast("int").alias("cut_quality_x3"),
            F.col("__c.cid").alias("cut_id"),
        )
    )


def source_data_card(docs: DataFrame, text_col: str, source_col: str) -> DataFrame:
    """Per-source dataset card — the one-row-per-source documentation
    a corpus release ships (datasheets-for-datasets distilled to the
    measurable fields): document and token counts, mean document
    length, the share of documents at the top quality score, and the
    share below the minimum-length floor.

    One hash aggregate to source grain; counts are exact integers
    (quality at the exact ·3 integer scale) and each ratio is a single
    shared float division — the experiment-family discipline. At
    100 TB this is one map-side-combined pass ending in ~dozens of
    rows.
    """
    from ..functions.text import quality_score_int3, whitespace_token_count

    n = F.count(F.lit(1))
    toks = F.sum(whitespace_token_count(text_col).cast("long"))
    q3 = F.sum(
        F.when(quality_score_int3(text_col) == 3, 1).otherwise(0)
    ).cast("long")
    short = F.sum(F.when(F.length(text_col) < 50, 1).otherwise(0)).cast("long")
    return (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            n.alias("n_docs"),
            toks.alias("total_tokens"),
            q3.alias("n_top_quality"),
            short.alias("n_short"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
                "avg_doc_tokens"
            ),
            (F.col("n_top_quality").cast("double") / F.col("n_docs").cast("double")).alias(
                "top_quality_share"
            ),
            (F.col("n_short").cast("double") / F.col("n_docs").cast("double")).alias(
                "short_share"
            ),
        )
    )


def quantile_match_normalize(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    out_col: str = "normalized",
) -> DataFrame:
    """Quantile matching: map each group's value distribution onto the
    POOLED distribution — the cross-source score calibrator (a quality
    score of 0.8 from a lenient source and 0.8 from a strict one mean
    different things; after matching, equal quantile rank means equal
    value). Each row's ``out_col`` is the pooled order statistic at
    the row's within-group quantile position.

    Positions are EXACT integer arithmetic, never interpolated floats:
    a row at within-group rank r of n_g maps to pooled rank
    ``1 + ((r-1)(N-1)) div (n_g-1)`` (floor division; a singleton
    group maps to the pooled median ``1 + (N-1) div 2``), so both
    engines pick the identical order statistic — no HALF_UP/half-even
    divergence, no interpolation.

    Scale shape: within-group ranks via
    ``partitioned_row_number_two_phase`` (a 100 TB corpus has FEW
    sources — per-key windows would route one source's shard through
    one task); pooled ranks via the global two-phase rank; the order-
    statistic lookup is an equi-join on the pooled rank. Guard:
    (r-1)(N-1) must fit int64 — refuse past ~3e9 rows with decimal
    advice rather than overflow silently.
    """
    from .windows import partitioned_row_number_two_phase, two_phase_row_number

    v = F.col(value_col)
    # complete-case: a NULL value would sort NULLS FIRST on Spark but
    # NULLS LAST in an ANSI oracle's ascending window — drop rather
    # than rank it (the mann_whitney rule)
    df = df.filter(v.isNotNull())
    order = [v.asc(), F.col(id_col).asc()]
    pooled, total = two_phase_row_number(
        df.select(F.col(id_col), v.alias("__v")),
        [F.col("__v").asc(), F.col(id_col).asc()],
        "__g",
    )
    if total > 3_000_000_000:
        raise ValueError(
            "quantile_match_normalize: (r-1)*(N-1) would overflow int64 "
            f"at N={total}; integer-upgrade the position product to "
            "decimal(38,0) before running at this scale"
        )
    ranked = partitioned_row_number_two_phase(df, [group_col], order, "__r")
    sizes = ranked.groupBy(group_col).agg(F.count(F.lit(1)).alias("__ng"))
    k = F.when(
        F.col("__ng") > 1,
        F.lit(1)
        + F.expr(f"((__r - 1) * ({total} - 1)) div (__ng - 1)"),
    ).otherwise(F.lit(1) + F.lit((total - 1) // 2))
    positioned = ranked.join(F.broadcast(sizes), group_col).withColumn("__k", k)
    lookup = pooled.select(F.col("__g").alias("__k"), F.col("__v").alias(out_col))
    return positioned.join(lookup, "__k").drop("__k", "__r", "__ng")


def domain_cap_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
) -> DataFrame:
    """Per-domain cap sampling: keep at most ``cap`` rows per
    ``group_col``, chosen by a DETERMINISTIC hash order (md5-hex of
    the id — no RNG, no seed coordination; re-runs, late arrivals and
    the SQL oracle keep the identical subset). The classic corpus-
    curation guard against one domain flooding the mixture.

    Within-group ranks via ``partitioned_row_number_two_phase`` — a
    web crawl's biggest domain is exactly the giant key a per-key
    window would serialize through one task. Rows keep their columns;
    ``kept_rank`` (1..cap) records the selection order for audits.
    """
    from .windows import partitioned_row_number_two_phase

    h = hash_bucket(F.col(id_col), 1_000_000_007)
    with_h = df.withColumn("__h", h)
    ranked = partitioned_row_number_two_phase(
        with_h, [group_col], [F.col("__h").asc(), F.col(id_col).asc()], "kept_rank"
    )
    return ranked.filter(F.col("kept_rank") <= cap).drop("__h")


def heaps_law_curve(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: scanning documents in
    ``id_col`` order, the cumulative token count and cumulative
    DISTINCT-type count after each document — the measurement behind
    "how fast does the vocabulary still grow", i.e. how much novelty
    is left in a corpus (flat curve = the crawl is exhausted).

    The running distinct needs no stateful scan: a type's first
    occurrence is ``min(doc)`` per token (one hash aggregate), so
    cumulative vocabulary = running sum of first-occurrence counts —
    both cumulative sums exact int64 over the DOC-grain relation via
    the two-phase primitive (doc grain is NOT calendar-bounded; at
    100 TB it is billions of rows, so no single-task window — and the
    curve should be bucketed to e.g. per-million-docs grain upstream
    when the full resolution isn't wanted).
    """
    from .windows import two_phase_running_sums

    # token-grain (fact), consumed by BOTH aggregates (per-doc counts
    # and first-occurrence types) — independent stages, so the pin is
    # eager (one tokenize pass instead of two); persist_fact, not
    # localCheckpoint (grain rule: fact-grain keeps lineage)
    toks = persist_fact(
        df.select(
            F.col(id_col).alias("__doc"), F.explode(_norm_tokens(text_col)).alias("token")
        )
    )
    per_doc = toks.groupBy("__doc").agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    first = toks.groupBy("token").agg(F.min("__doc").alias("__doc"))
    new_types = first.groupBy("__doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_new_types")
    )
    base = (
        df.select(F.col(id_col).alias("__doc"))
        .join(per_doc, "__doc", "left")
        .join(new_types, "__doc", "left")
        .select(
            "__doc",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_new_types", F.lit(0)).cast("long").alias("n_new_types"),
        )
    )
    order = [F.col("__doc").asc()]
    # ONE two-phase pass for both cumulative sums (same total order):
    # halves the range shuffle + pin + offsets collect + broadcast
    cum, _ = two_phase_running_sums(
        base, order, {"cum_tokens": F.col("n_tokens"), "cum_types": F.col("n_new_types")}
    )
    return cum.select(
        F.col("__doc").alias(id_col), "n_tokens", "n_new_types", "cum_tokens", "cum_types"
    )


def temperature_mix_weights(
    df: DataFrame, text_col: str, group_col: str, alpha: float = 0.3
) -> DataFrame:
    """Temperature-scaled source sampling weights: w_s ∝ p_s^alpha
    with p_s = source's token share — the standard up-weighting of
    low-resource sources when mixing a training corpus (alpha = 1
    reproduces natural proportions; alpha -> 0 approaches uniform).

    One size-linear aggregate to SOURCE grain (exact integer token
    counts); p and p^alpha are shared-verbatim float expressions over
    the ~|sources| relation at the char_entropy round-6 precedent. The
    NORMALIZER is order-free: p^alpha is quantized to integer
    1e-15-units (the dsir_weights floor-scale pattern) and summed as
    decimal(38,0), so the denominator — a float sum would be
    partition/accumulation-order dependent — is an exact integer in
    both engines. Output per source: docs, tokens, natural share,
    sampling weight, boost = weight/share.
    """
    from ..functions.text import whitespace_token_count

    srcs = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(whitespace_token_count(text_col).cast("long"))
            .cast("long")
            .alias("n_tokens"),
        )
        .localCheckpoint(eager=True)  # source-grain reduction; eager —
        # the zero-FileScan plan invariant (test_plan_properties) pins
        # the corpus-scanned-once mechanism at the plan level
    )
    tot = srcs.agg(F.sum("n_tokens").cast("long").alias("__t"))
    p = F.col("n_tokens").cast("double") / F.col("__t").cast("double")
    staged = srcs.crossJoin(F.broadcast(tot)).withColumn(
        "__paq",
        F.floor(F.pow(p, F.lit(alpha)) * F.lit(1.0e15)).cast("decimal(38,0)"),
    )
    denom = staged.agg(F.sum("__paq").alias("__d"))
    w = F.col("__paq").cast("double") / F.col("__d").cast("double")
    return (
        staged.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(p, 6).alias("natural_share"),
            F.round(w, 6).alias("sample_weight"),
            F.when(p > 0, F.round(w / p, 6)).alias("boost"),
        )
    )
