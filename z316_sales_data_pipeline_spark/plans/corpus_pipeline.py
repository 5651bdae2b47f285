"""End-to-end training-corpus build (north-star composition).

documents → curation cascade (keep) → near-dup collapse (connected
components over the blocked Jaccard pair graph, longest-doc survivor)
→ deterministic train/val/test split → overlapping token-window
chunking → shard write partitioned by split.

Each stage is an individually oracle-checked operator (curation_filter,
ngram_jaccard, dup_clusters / cluster_representative, dataset_split,
doc_chunks in ``__spark_entry__``); this plan pins their COMPOSITION —
the thing a user of the engine actually runs to turn a raw document
lake into training shards.

Scale shape: one scan of documents feeds the curation predicates
(codegen, no shuffle); the only heavy exchanges are the blocked
pair self-join and the label-propagation joins, both key-only; split
and chunking are narrow maps, so the shard write streams at scan
speed partitioned by the (low-cardinality) split column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import sinks
from ..functions import text
from ..operators import corpus, dedup
from ..persistence import persist_fact
from ..sources.tables import load_table


def curated_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-branch of the curation cascade (same predicates as the
    oracle-checked ``curation_filter`` query)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        (F.length("text") >= 50)
        & (text.quality_score("text") >= 0.5)
        & (text.language_id("text") != "und")
    )


def collapse_near_dups(
    kept: DataFrame, threshold: float = 0.5, shingle_k: int = 1
) -> DataFrame:
    """Keep one survivor per near-dup cluster (longest doc, id ties).

    Same pair graph + keep-rule as the ``cluster_representative``
    query; returns full doc rows for the survivors.
    """
    pairs = dedup.ngram_jaccard_pairs(
        kept, "text", "doc_id", "source", threshold=threshold, shingle_k=shingle_k
    )
    cc = dedup.connected_components(kept.select("doc_id"), pairs, id_col="doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        cc.join(kept, "doc_id")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "cluster_id")
    )


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    chunk_tokens: int = 64,
    stride: int = 48,
    pack_budget: int = 2048,
) -> dict[str, int]:
    """Full corpus build; returns stage counts for observability.

    The shard table is partitioned by split (train/val/test) so a
    trainer reads its split with pure partition pruning; chunk rows
    are sorted within partitions by (doc_id, chunk_idx) for row-group
    locality of a document's windows.

    Alongside the shards, the build emits the governance sidecars a
    training run consumes with the data — each an individually
    oracle-checked operator, pinned here in composition:

    - ``{out}_packs``   — token-budget sequence packs over the chunks
      (``corpus.sequence_pack``), the dataloader's unit of work;
    - ``{out}_mixture`` — temperature mixture plan over the SURVIVOR
      corpus (``corpus.source_mixture``) — sampling weights must be
      computed on what remains after curation/dedup, not the raw lake;
    - ``{out}_bpe``     — the BPE merge table induced from the
      survivor corpus (``corpus.bpe_merges``), i.e. the tokenizer is
      trained on exactly the text the model will see;
    - ``{out}_manifest`` — per-file stats manifest over the shard
      table (``sinks.stats_manifest``): row counts + (doc_id,
      chunk_idx) min/max per physical file, the planner-facing
      metadata a lakehouse log would carry.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = curated_documents(spark, sf_dir)
    # corpus-grain (fact) frame consumed 4x below: persist_fact, not
    # localCheckpoint — lineage must survive executor loss (grain rule
    # in persistence.py).
    survivors = persist_fact(collapse_near_dups(kept))
    split_docs = corpus.dataset_split(survivors, "doc_id")
    chunks = corpus.chunk_documents(
        split_docs, "text", "doc_id", chunk_tokens, stride, carry_cols=("split",)
    )
    sinks.write_partitioned(
        chunks, out_dir, "split", cluster_cols=["doc_id", "chunk_idx"], mode="overwrite"
    )
    written = spark.read.parquet(out_dir)
    packs = corpus.sequence_pack(
        written, "split", "doc_id", "chunk_idx", "n_tokens", budget=pack_budget
    )
    packs.write.mode("overwrite").parquet(f"{out_dir}_packs")
    mixture = corpus.source_mixture(survivors, "text", "source")
    mixture.write.mode("overwrite").parquet(f"{out_dir}_mixture")
    merges = corpus.bpe_merges(survivors, "text", n_merges=3)
    merges.write.mode("overwrite").parquet(f"{out_dir}_bpe")
    manifest = sinks.stats_manifest(spark, out_dir, ["doc_id", "chunk_idx"])
    manifest.write.mode("overwrite").parquet(f"{out_dir}_manifest")
    return {
        "docs": docs.count(),
        "kept": kept.count(),
        "survivors": survivors.count(),
        "chunks": written.count(),
        "packs": spark.read.parquet(f"{out_dir}_packs").count(),
        "mixture_sources": spark.read.parquet(f"{out_dir}_mixture").count(),
        "bpe_merges": spark.read.parquet(f"{out_dir}_bpe").count(),
        "manifest_files": spark.read.parquet(f"{out_dir}_manifest").count(),
    }
