"""At-rest near-dup pair graph, materialized once and shared.

Three curation queries — dup_clusters, cluster_representative and
doc_pagerank — consume the SAME exact-Jaccard pair relation over the
documents table. Recomputing it per query triples the dominant cost
(the ~|block|² exact set-intersections). At lake scale the pair graph
is a table you materialize once per corpus snapshot next to the
shingle table / MinHash index (operators/dedup.py) and every consumer
reads it back; this module makes that real for the local harness: the
first caller builds and writes parquet keyed by (source file identity,
parameters), later callers do a pure parquet scan.

The cache key includes the documents file's mtime/size, so a new
corpus snapshot (or regenerated testdata) invalidates automatically —
the same contract as a lakehouse table pointing at a corpus version.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup
from ..sources.tables import load_table

# repo_root/spark-warehouse/_pair_graph — anchored to the package, not
# the cwd, so driver/bench/pytest all hit the same cache.
_CACHE_ROOT = Path(__file__).resolve().parents[2] / "spark-warehouse" / "_pair_graph"


def jaccard_pair_graph(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    shingle_k: int = 1,
) -> DataFrame:
    """The (id_a, id_b, jaccard) word-Jaccard pair relation over
    ``documents``, source-blocked, read from the at-rest materialization
    (built on first use per corpus snapshot + parameters)."""
    src = os.path.join(os.path.realpath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        sig = f"{src}|{st.st_mtime_ns}|{st.st_size}|{threshold}|{shingle_k}|v1"
        digest = hashlib.md5(sig.encode()).hexdigest()[:16]
        out = str(_CACHE_ROOT / f"pairs_{digest}")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            _build(spark, sf_dir, threshold, shingle_k).write.mode("overwrite").parquet(out)
        return spark.read.parquet(out)
    except OSError:
        # unwritable warehouse / exotic sf_dir: fall back to in-memory
        return _build(spark, sf_dir, threshold, shingle_k)


def _build(spark: SparkSession, sf_dir: str, threshold: float, shingle_k: int) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", "source", threshold=threshold, shingle_k=shingle_k
    )
