"""Deduplication operators for LLM training-data pipelines (north-star
surface, BASELINE.json): exact, MinHash+LSH near-dup, SimHash, n-gram
Jaccard. All pure DataFrame compositions — shuffles only on
hash-distributed keys, no UDFs, no driver-side loops.

Portability: hash functions are sha256-prefix integers
(functions.text.portable_hash) so every stage — minhash signatures,
band buckets, candidate pairs, verified Jaccard — is reproducible in
DuckDB for the correctness oracle. At 100 TB you'd swap the sha-based
hash for xxhash64 (same topology, one line) — the plan shape is the
scale-relevant part:

    docs → explode shingles → distinct         (1 shuffle on doc)
         → minhash signature per doc           (1 hash-agg)
         → explode bands → bucket join         (1 shuffle on band key,
                                                skew-safe: band keys are
                                                hashes → uniform)
         → candidate pairs (distinct)          (dimension-sized)
         → verify true Jaccard via shingle join (broadcast candidates)

The expensive all-pairs O(n²) never materialises; only same-bucket
pairs are verified — the standard MinHash/LSH contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from football_lakehouse_spark.functions.text import portable_hash, ws_tokens

N_MINHASH = 6  # 3 bands × 2 rows
N_BANDS = 3
ROWS_PER_BAND = 2


def shingles(text: F.Column, n: int = 3) -> F.Column:
    """Word n-gram shingles as an array column (empty when < n tokens).

    NOTE: when applied directly to a text expression, Catalyst inlines
    the tokenisation into every lambda element (O(tokens²) splitting).
    Prefer :func:`shingles_from_tokens` over a materialised token
    column on hot paths."""
    return shingles_from_tokens(ws_tokens(text), n)


def shingles_from_tokens(toks: F.Column, n: int = 3) -> F.Column:
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc, shingle) pairs — the dedup working set. The token
    array is materialised as a column FIRST so the split runs once per
    row, not once per shingle position."""
    # corpus files are large relative to row count → a doc table often
    # arrives in very few input splits; the explode+hash stages are CPU
    # bound, so spread docs across the executors first (cheap: doc rows,
    # not shingle rows, cross the wire)
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        id_col, ws_tokens(F.col(text_col)).alias("toks")
    )
    return (
        toks.select(id_col, F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"))
        .distinct()
    )


def minhash_signatures(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """K minhash values per doc in ONE aggregation pass and ONE sha256
    per shingle row: the 64-hex-char digest is sliced into K independent
    8-hex (32-bit) hash values — 6× cheaper than seeded re-hashing, same
    LSH statistics, still DuckDB-reproducible."""
    sha = F.sha2(F.col("shingle"), 256)
    aggs = [
        F.min(
            F.conv(F.substring(sha, 8 * k + 1, 8), 16, 10).cast("bigint")
        ).alias(f"mh{k}")
        for k in range(N_MINHASH)
    ]
    return pairs.groupBy(id_col).agg(*aggs)


def band_buckets(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, band_id, band_key) rows via a single explode — a unionByName
    of per-band projections would recompute the signature aggregation
    once per band. Band keys are hashes → uniform, the bucket join can't
    skew."""
    entries = []
    for b in range(N_BANDS):
        cols = [F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        key = F.sha2(F.concat_ws("_", F.lit(str(b)), *[c.cast("string") for c in cols]), 256)
        entries.append(
            F.struct(F.lit(b).alias("band_id"), F.substring(key, 1, 16).alias("band_key"))
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("band")
    ).select(id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_key").alias("band_key"))


def candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Docs sharing any band bucket, as ordered distinct pairs."""
    a = buckets.select(
        F.col("band_id"), F.col("band_key"), F.col(id_col).alias("doc_a")
    )
    b = buckets.select(
        F.col("band_id"), F.col("band_key"), F.col(id_col).alias("doc_b")
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def verified_jaccard(
    cands: DataFrame, pairs: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only. Candidates
    are dimension-sized post-LSH → broadcast both semi-join filters."""
    sizes = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    sa = pairs.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = pairs.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        sa.join(F.broadcast(cands), "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = (
        common.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .withColumn(
            "jaccard",
            F.floor(
                F.col("n_common")
                * 10000
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("double")
            / 10000,
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


def minhash_lsh_neardups(
    docs: DataFrame, threshold: float = 0.5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → band → bucket join →
    exact-verify. Returns (doc_a, doc_b, n_common, jaccard).

    The distinct (doc, shingle) set feeds four downstream consumers
    (signatures, both verify sides, sizes); without persistence Spark
    recomputes the explode+distinct+hash lineage per consumer — at
    corpus scale that's 4 extra full scans. MEMORY_AND_DISK matches the
    checkpoint a production pipeline would put here."""
    from pyspark import StorageLevel

    pairs = doc_shingles(docs, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(pairs, id_col)
    # candidates are broadcast twice downstream (pair filter + both size
    # joins) — persist so each broadcast reads the cached handful of rows
    # instead of re-running the signature+bucket stages
    cands = candidate_pairs(band_buckets(sigs, id_col), id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return verified_jaccard(cands, pairs, threshold, id_col)


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash per document: per-token portable hash, signed bit
    votes, sign → bit. One explode + one aggregation."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        id_col, F.explode(ws_tokens(F.col(text_col))).alias("token")
    )
    h = portable_hash(F.col("token"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    voted = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return voted.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def exact_dedup(docs: DataFrame, on: F.Column, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on a canonical content hash: keep the lowest id per
    hash group (deterministic keep-first)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(on, 256)).orderBy(F.col(id_col).asc())
    return docs.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
