"""Semantic (embedding-cosine) near-dup detector.

No reference analog (the reference only knows byte-level equivalence,
/root/reference/src/comparator.cpp:45-91); an LLM training-data pipeline
additionally dedups PARAPHRASES — conversations whose text differs but
whose embeddings are nearly parallel. Round-2 shipped the standalone ANN
kernels (functions/similarity.py); this module wires embedding similarity
into the pipeline as a first-class detector, same shape as the others:

1. bucketing: random-hyperplane LSH over the embedding column
   (similarity.hyperplane_signatures — vectorized numpy over Arrow
   batches; n_tables independent sign-bit bucket ids per vector). For
   vectors at angle theta, P(one table collides) = (1 - theta/pi)^n_planes;
   n_tables is the recall lever: P(candidate) = 1-(1-p)^n_tables.
2. candidates: within-bucket self-join under the shared salted hot-bucket
   policy (buckets.py) — a boilerplate embedding (e.g. the zero-ish vector
   a default encoder emits for empty text) lands in ONE bucket per table,
   so hot buckets are salted into bounded sub-buckets and surfaced, never
   dropped; the n_tables tables cut a hot population orthogonally (table
   index is baked into the bucket key, which the salt hash includes) so
   connected components recovers hot clusters.
3. verify: exact cosine >= threshold via the vectorized Arrow kernel
   (similarity.pairwise_cosine — batched einsum, no per-row Python; the
   SQL zip_with/aggregate form is interpreted per element and measured
   ~50x slower on this hot path at bench x48 scale).

At 100 TB the bucket table is (id, bucket) rows — 16 bytes each through
one exchange per table; embeddings are joined back exactly once for the
verify, never carried through the candidate shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import hyperplane_signatures, pairwise_cosine
from .buckets import hot_buckets, salted_self_pairs


def _buckets(
    embeddings: DataFrame,
    n_planes: int,
    n_tables: int,
    dim: int,
    seed: int,
    id_col: str = "conv_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(conv_id, bucket) — one row per (vector, table).

    NULL-embedding rows are dropped here (documented external-encoder
    contract: no vector, no semantic detection for that conversation —
    the other detectors still see it); zero vectors bucket
    deterministically and are then excluded by the cosine verify (0/0
    similarity is NULL, never >= threshold). A declared-vs-actual dim
    mismatch raises from the bucketing kernel with a clear message."""
    return hyperplane_signatures(
        embeddings.where(F.col(vec_col).isNotNull()),
        n_planes=n_planes,
        dim=dim,
        seed=seed,
        n_tables=n_tables,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col(id_col).alias("conv_id"), "bucket")


def semantic_candidates(
    embeddings: DataFrame,
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
    max_bucket: int = 2000,
    seed: int = 42,
    id_col: str = "conv_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(conv_a, conv_b) candidate pairs sharing an LSH bucket in any table."""
    return salted_self_pairs(
        _buckets(embeddings, n_planes, n_tables, dim, seed, id_col, vec_col),
        key_cols=["bucket"],
        id_col="conv_id",
        max_bucket=max_bucket,
    )


def semantic_hot_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
    max_bucket: int = 2000,
    seed: int = 42,
    id_col: str = "conv_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quarantine surface: over-cap (bucket, bucket_n) rows."""
    return hot_buckets(
        _buckets(embeddings, n_planes, n_tables, dim, seed, id_col, vec_col),
        ["bucket"],
        max_bucket,
    )


def verify_cosine_pairs(
    embeddings: DataFrame,
    candidates: DataFrame,
    threshold: float,
    round_digits: int = 4,
    id_col: str = "conv_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(conv_a, conv_b, cos) with exact cosine >= threshold.

    The exact cosine runs in a vectorized Arrow/pandas-UDF einsum kernel
    (similarity.pairwise_cosine) — batched numpy over Arrow columns, not
    per-row Python and not the interpreted SQL HOF path. cos is rounded
    (like cosine_topk) so values are stable across engines and
    float-summation orders. Embeddings join back by id — the candidate
    join itself never shuffles vector payloads.
    """
    # SHUFFLE_HASH on the embedding sides (guide §3.1, deliberate join
    # strategy): without the hint the planner falls back to sort-merge
    # once the embedding table outgrows the broadcast envelope, SORTING
    # the candidate rows WITH their vector payloads attached — measured
    # 19.0 s vs 3.3 s for the identical verify at 1.89M candidates
    # (x48). The embedding side is the build side: fixed-width rows,
    # bounded per partition; no sort ever touches the payload.
    a = embeddings.select(
        F.col(id_col).alias("conv_a"), F.col(vec_col).alias("va")
    ).hint("shuffle_hash")
    b = embeddings.select(
        F.col(id_col).alias("conv_b"), F.col(vec_col).alias("vb")
    ).hint("shuffle_hash")
    joined = candidates.select("conv_a", "conv_b").join(a, "conv_a").join(b, "conv_b")
    # vectorized Arrow kernel (similarity.pairwise_cosine): the SQL
    # aggregate/zip_with form is interpreted per element and measured
    # ~50x slower on this, the detector's hot path. Zero vectors yield
    # NULL cosine (never >= threshold), as with try_divide.
    cos = F.round(pairwise_cosine(F.col("va"), F.col("vb")), round_digits)
    return (
        joined.withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("conv_a", "conv_b", "cos")
    )


def semantic_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
    max_bucket: int = 2000,
    seed: int = 42,
    id_col: str = "conv_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end: hyperplane LSH buckets -> salted candidates -> exact
    cosine verify. Precision 1.0 by construction (exact verify); recall
    is the LSH candidate recall — tune n_tables up / n_planes down for
    tighter guarantees (each table is one extra O(N) bucketing pass)."""
    cands = semantic_candidates(
        embeddings, n_planes, n_tables, dim, max_bucket, seed, id_col, vec_col
    )
    return verify_cosine_pairs(
        embeddings, cands, threshold, id_col=id_col, vec_col=vec_col
    )
