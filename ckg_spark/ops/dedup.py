"""Deduplication operators for web-scale training-data pipelines.

Five strategies, cheapest first. All are expressed so the expensive pairwise
work only ever happens *inside a blocking bucket*, never all-pairs:

- exact:        hash-groupBy on content (or bag-of-words) — one shuffle;
- minhash-LSH:  shingle -> minhash signature (narrow map) -> band buckets
                (one shuffle) -> verified pairs;
- simhash:      64-bit weighted fingerprint; near-dups = small hamming
                distance, blocked on 4x16-bit chunks (pigeonhole: distance
                <=3 guarantees one identical chunk);
- n-gram jaccard: exact verification predicate used by the LSH path;
- embedding:    cosine near-dup over vectors (delegates to simsearch).

The reference's only dedup is in-memory ``set()`` accumulation per parser
(/root/reference src/graphdb_builder/databases/parsers/stringParser.py:54-58,
builder_utils.py:123-138 writes ``pd.DataFrame(list(set(...)))``); these
operators are its distributed generalization for corpora that do not fit
any single machine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..canon.lsh import _splitmix64, _token_hashes, lsh_candidate_pairs, minhash_signatures


# -- exact ---------------------------------------------------------------
def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical content: (content_hash, n_docs, keeper_id).
    keeper = min id (deterministic). One hash-aggregate shuffle; the hash is
    computed JVM-side so no text ever reaches Python."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def bag_of_words_dup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-insensitive exact dedup: hash of the sorted token multiset.
    Catches token-shuffled boilerplate that byte-hashing misses."""
    toks = F.array_sort(F.split(F.lower(F.col(text_col)), r"\s+"))
    return (
        docs.select(F.col(id_col), F.md5(F.array_join(toks, " ")).alias("bow_hash"))
        .groupBy("bow_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


# -- shingles + minhash ---------------------------------------------------
def word_shingles(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingles array<string>) — word n-grams, JVM-side via transform
    over a token-index sequence (no Python)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle_at = lambda i: F.array_join(F.slice(toks, i + 1, n), " ")  # noqa: E731
    return docs.select(
        F.col(id_col).cast("string").alias("key"),
        F.array_distinct(F.transform(idx, shingle_at)).alias("shingles"),
    )


def minhash_dup_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs verified by exact shingle Jaccard:
    (key_a, key_b, jaccard). Shuffles: band bucket join + the verify join."""
    # materialize shingles + signatures before the self-joins: each join
    # branch would otherwise recompute the shingling/UDF stages
    sh = word_shingles(docs, id_col, text_col, shingle_n).localCheckpoint()
    sigs = minhash_signatures(sh, "key", "shingles", num_hashes=num_hashes).localCheckpoint()
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=num_hashes // bands)
    return verify_jaccard(cands, sh, jaccard_threshold)


def verify_jaccard(pairs: DataFrame, keyed_sets: DataFrame, threshold: float) -> DataFrame:
    """pairs(key_a, key_b) x keyed_sets(key, shingles) -> exact Jaccard,
    JVM-side via array_intersect/array_union on the candidate pairs only."""
    a = keyed_sets.select(F.col("key").alias("key_a"), F.col("shingles").alias("sh_a"))
    b = keyed_sets.select(F.col("key").alias("key_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "key_a")
        .join(b, "key_b")
        .select(
            "key_a",
            "key_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for externally supplied candidate pairs."""
    sh = word_shingles(docs, id_col, text_col, n)
    return verify_jaccard(candidate_pairs, sh, threshold)


# -- simhash --------------------------------------------------------------
_SIMHASH_SCHEMA = StructType(
    [StructField("key", StringType(), False), StructField("simhash", LongType(), False)]
)


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over word tokens (numpy-vectorized mapInPandas).
    Near-identical documents differ in a handful of bits."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            keys, sigs = [], []
            for key, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).lower().split()
                if not toks:
                    keys.append(str(key))
                    sigs.append(0)
                    continue
                th = _token_hashes(toks)  # (n,)
                bits = ((th[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
                acc = (2 * bits - 1).sum(axis=0)  # +1/-1 votes per bit
                sig = np.uint64(0)
                for b in np.nonzero(acc > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(b)
                keys.append(str(key))
                sigs.append(int(np.int64(sig)))
            yield pd.DataFrame({"key": keys, "simhash": sigs})

    return docs.select(F.col(id_col).cast("string").alias(id_col), text_col).mapInPandas(
        compute, _SIMHASH_SCHEMA
    )


def simhash_dup_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocking: split the 64-bit signature into 4 chunks of 16 bits; any pair
    within distance 3 shares at least one identical chunk (pigeonhole), so
    a bucket-join on (chunk_idx, chunk_value) finds all of them with one
    shuffle — never an all-pairs comparison.
    """
    sigs = simhash_signatures(docs, id_col, text_col).localCheckpoint()
    chunks = sigs.select(
        "key",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("key_a", "key_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
