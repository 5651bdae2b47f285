"""Deduplication operators (north-star training-data ops).

Four families, all shuffle-disciplined for the 100 TB target:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle on
  a 64-bit key, payload never moves (keep-rule via min_by).
- **MinHash + LSH**: shingle → n minhashes → b bands; candidate pairs
  only within equal band buckets (the classic Broder scheme), verified
  with exact shingle Jaccard. Self-join is bucket-local, so the
  quadratic blowup is bounded by bucket size, not corpus size.
- **SimHash**: per-token 64-bit hashes → bit-majority signature;
  near-dups share the signature (or a band of it).
- **n-gram Jaccard**: exact verified similarity on candidate pairs.
- **embedding cosine**: near-dup by cosine ≥ τ on candidate pairs.

Everything below is column algebra (higher-order array functions +
xxhash64) — no Python UDFs, so the hot path stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint64, shingles
from ..functions.vector import cosine


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative of each exact (normalized) text.

    groupBy(md5-like fingerprint) + min_by: single shuffle on the
    fingerprint; deterministic keep-rule (min id) like the reference's
    W2 dedup keep-rule.
    """
    return (
        df.withColumn("__fp", fingerprint64(text_col))
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__fp")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _minhash_sig_expr(shingle_col: str, n_hashes: int) -> Column:
    """Signature as ONE nested higher-order expression.

    ``transform(sequence(...))`` makes codegen emit a loop over a tiny
    body; materializing n_hashes separate array_min(transform(...))
    columns instead makes whole-stage codegen compile n copies of the
    hash kernel (~16 s of janino time for n=32 — measured).
    Family: h_i(s) = xxhash64(s, i) (the index is hashed with the
    shingle, giving independent-enough permutations).
    NOTE: lambda args in SQL transform are positional — (element) only;
    a two-arg lambda would bind the array index, silently changing the
    family.
    """
    return F.expr(
        f"transform(sequence(0, {n_hashes - 1}), "
        f"i -> array_min(transform({shingle_col}, s -> xxhash64(s, i))))"
    )


def minhash_signature(df: DataFrame, text_col: str, n_hashes: int = 32, shingle_k: int = 3) -> DataFrame:
    """Add ``minhash`` (array of n 64-bit mins over seeded xxhash64).

    One narrow map stage — n_hashes array traversals per row, zero
    shuffle.
    """
    return df.withColumn("__sh", shingles(text_col, shingle_k)).withColumn(
        "minhash", _minhash_sig_expr("__sh", n_hashes)
    ).drop("__sh")


def lsh_bands(df: DataFrame, n_bands: int = 8, rows_per_band: int = 4) -> DataFrame:
    """Explode the minhash signature into (band_id, band_hash) rows.

    Docs sharing any band bucket are candidate pairs. Output has
    n_bands rows per doc — the only row amplification in the pipeline.
    One compact loop expression (band hash = xxhash64 over the band's
    signature slice) so codegen stays small; callers should persist the
    signature column first or the whole minhash expression gets inlined
    n_bands × rows_per_band times.
    """
    band_expr = F.expr(
        f"explode(transform(sequence(0, {n_bands - 1}), "
        f"b -> struct(b AS band_id, "
        f"xxhash64(slice(minhash, b * {rows_per_band} + 1, {rows_per_band})) AS band_hash)))"
    )
    return df.withColumn("band", band_expr).select(
        "*", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    ).drop("band")


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.try_divide(inter.cast("double"), union.cast("double"))


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH, verified with exact Jaccard.

    Plan shape: map (signatures) → explode (bands) → shuffle on
    (band_id, band_hash) → bucket-local self-join → exact verify →
    distinct pairs. At 100 TB the shuffle key cardinality is ~n_docs ×
    n_bands; hot buckets (boilerplate dups) are bounded by AQE skew
    splitting.
    """
    rows_per_band = n_hashes // n_bands
    # Persist the signature frame: it is read by band generation AND the
    # final exact-verify rejoin, and the cache barrier stops Catalyst
    # from inlining the minhash expression into every band slice. At
    # lake scale this is the signature table you'd materialize at rest.
    # repartition: a single small parquet file arrives as ONE input
    # split, which would serialize the whole signature computation on a
    # single core; at lake scale the source is already many splits and
    # this is a no-op-sized shuffle of (id, text).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(n_parts)
        .select(F.col(id_col), shingles(text_col, shingle_k).alias("__sh"))
        .filter(F.size("__sh") > 0)
        .withColumn("minhash", _minhash_sig_expr("__sh", n_hashes))
        .persist()
    )
    # Band rows carry KEYS ONLY through the self-join shuffle; the heavy
    # shingle arrays rejoin only for the (small) candidate-pair set.
    banded = lsh_bands(base, n_bands, rows_per_band).select(id_col, "band_id", "band_hash").persist()
    left = banded.select("band_id", "band_hash", F.col(id_col).alias("id_a"))
    right = banded.select("band_id", "band_hash", F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, group_col: str, threshold: float = 0.0, shingle_k: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs within a blocking group.

    Blocking on ``group_col`` keeps the self-join linear in group size —
    the SQL-oracle-friendly exact counterpart of the LSH path.
    """
    base = df.select(F.col(group_col), F.col(id_col), shingles(text_col, shingle_k).alias("__sh"))
    a = base.select(F.col(group_col), F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    b = base.select(F.col(group_col), F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    return (
        a.join(b, group_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(group_col, "id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(c: Column | str, n_bits: int = 16) -> Column:
    """SimHash signature (bit-majority of per-token hashes).

    n_bits column expressions over one token-hash array; no shuffle.
    """
    col = F.col(c) if isinstance(c, str) else c
    tokens = F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    n = F.size(tokens)
    acc = F.lit(0).cast("long")
    for b in range(n_bits):
        mask = F.lit(1 << b).cast("long")
        ones = F.size(F.filter(hashes, lambda h, m=mask: h.bitwiseAND(m) != 0))
        acc = acc + F.when(ones * 2 > n, mask).otherwise(F.lit(0).cast("long"))
    return acc


def simhash_dup_groups(df: DataFrame, text_col: str, id_col: str, n_bits: int = 16) -> DataFrame:
    """Groups of documents sharing a SimHash signature (near-dup sets)."""
    return (
        df.withColumn("simhash", simhash(text_col, n_bits))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------
def embedding_near_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float, block_col: str | None = None
) -> DataFrame:
    """Pairs with cosine ≥ τ; optional blocking column bounds the join.

    Without blocking this is the O(n²) exact baseline (fine for dim
    tables / small corpora); with ``block_col`` (e.g. an LSH bucket or
    label) the self-join shuffles on the block key — the scale path.
    """
    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    base = df.select(*cols)
    on = [block_col] if block_col else []
    a = base.select(*( [F.col(block_col)] if block_col else [] ), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = base.select(*( [F.col(block_col)] if block_col else [] ), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = a.join(b, on) if on else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select(*(on), "id_a", "id_b", "cos")
    )
