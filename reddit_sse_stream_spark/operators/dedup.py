"""Deduplication operators for the documents table — the training-data
pipeline surface the reference lacks entirely (SURVEY.md §2.8 north-star).

All variants are pure DataFrame compositions (no Python row loops):

- exact:       hash-groupBy on a content digest. One shuffle on the digest;
               at 100 TB the digest groupBy is the minimal-width shuffle
               (16-byte key + id) instead of shuffling full documents.
- minhash-LSH: shingle -> 64 minhash values -> band into buckets ->
               self-join on (band, bucket signature) -> candidate pairs ->
               exact Jaccard verify. The band join is an equi-join on a
               synthetic key, so Catalyst shuffles only (band_key, doc_id,
               signature) — never the text — and AQE handles bucket skew.
- simhash:     64-bit simhash from token hashes, grouped on the full code
               (near-dup variant would band the code into 4x16-bit chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Minhash permutation family h_i(x) = (a_i*x + b_i) mod P with P = 2^31-1
# (Mersenne prime). Keeping a, b, x < 2^31 bounds a*x + b < 2^62 — no int64
# overflow inside the JVM expression.
_MERSENNE_P = (1 << 31) - 1


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Duplicate groups by exact text digest: digest, surviving (min) doc_id,
    and duplicate count. Only the 16-byte md5 + doc_id cross the shuffle."""
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Survivor rows only (keep lowest doc_id per digest) — the actual
    'dedup this corpus' operator. Window beats self-join: one shuffle."""
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _shingles(text_col, k: int = 5):
    """Word k-shingles as a deduped array (JVM-side: split + transform)."""
    words = F.split(F.lower(text_col), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, k: int = 5) -> DataFrame:
    """(doc_id, sig array<bigint>) — 64 minhashes over word 5-shingles.

    Shingle hashing uses xxhash64 (JVM built-in); the permutation family is
    (a*x + b) mod p applied with ``transform``+``array_min`` — all codegen,
    no UDF, no shuffle (embarrassingly parallel per row).
    """
    # Deterministic coefficient family (fixed seed analog: i-indexed LCG),
    # all values in [1, P).
    coeffs = [
        ((2 * i + 1) * 0x9E3779B9 % _MERSENNE_P or 1, (i * i + i + 1) % _MERSENNE_P)
        for i in range(num_hashes)
    ]
    hashed = docs.select(
        "doc_id",
        F.transform(
            _shingles(F.col("text"), k), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))
        ).alias("sh"),
    )
    def _perm(a: int, b: int):
        # factory (not default-arg lambda): pyspark's higher-order-function
        # wrapper inspects lambda arity and rejects extra default params
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)

    sig = F.array(
        *[F.array_min(F.transform(F.col("sh"), _perm(a, b))) for (a, b) in coeffs]
    )
    return hashed.select("doc_id", sig.alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame, num_hashes: int = 64, bands: int = 16, k: int = 5
) -> DataFrame:
    """Candidate near-dup pairs via banding: equal band-slice -> candidate.

    Returns (doc_a, doc_b, n_bands_matched). The self-join key is
    (band_idx, band_sig-hash): a plain equi-join Catalyst executes as a
    shuffled hash join on a narrow synthetic key — the scalable LSH shape.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, k)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band)),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame, k: int = 5) -> DataFrame:
    """Exact Jaccard verify over candidate pairs (the cheap second stage:
    only candidate ids join back to shingle sets)."""
    sh = docs.select("doc_id", _shingles(F.col("text"), k).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        candidates.join(a, candidates.doc_a == F.col("a.doc_id"))
        .join(b, candidates.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash BIGINT): sign-aggregated token-hash fingerprint.

    Pure array algebra: token -> xxhash64 -> per-bit +/-1 vote -> sign vector
    -> packed integer. Stays in codegen; no UDF.
    """
    tokens = F.split(F.lower(F.col("text")), r"\s+")
    th = docs.select("doc_id", F.transform(tokens, lambda t: F.xxhash64(t)).alias("th"))
    # vote(b) = sum over tokens of (bit b set ? +1 : -1); shift amounts must
    # be literal ints for shiftright, so unroll the (fixed) bit loop.
    def _voter(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    packed = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(F.col("th"), F.lit(0).cast("long"), _voter(b))
        packed = packed.bitwiseOR(
            F.when(vote > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return th.select("doc_id", packed.alias("simhash"))
