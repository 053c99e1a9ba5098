"""Deterministic text embeddings via the hashing trick (feature-hashing
vectorizer, Weinberger et al. 2009) — the zero-dependency embedder that
lets the semantic detector run when no learned encoder output is
available.

Each token hash contributes +-1 (sign bit from the hash) to dimension
`hash % dim`; the vector is L2-normalized. Cosine between two such
vectors is an unbiased estimate of the (tf-weighted) token-multiset
cosine, so near-duplicate texts land near cos 1.0 and unrelated texts
near 0 — exactly the signal the hyperplane-LSH semantic detector needs.
Not a paraphrase model: texts must SHARE TOKENS to be close (swap in a
learned encoder's vectors for true semantic paraphrase dedup; the
detector is agnostic to where the embedding column comes from).

Plan shape: token hashing is JVM-side xxhash64 inside transform()
lambdas (narrow, shuffle-free — same as the simhash path); the
scatter-add into dim buckets is one vectorized Arrow kernel over the
flattened hash arrays (np.add.at on a (batch x dim) matrix). No per-row
Python, no shuffle beyond the conv_texts aggregation the caller already
has.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def feature_hash_embeddings(conv_texts: DataFrame, dim: int = 64) -> DataFrame:
    """(conv_id, embedding array<double>): L2-normalized signed
    feature-hash vector over the conversation's token multiset.

    conv_texts: (conv_id, texts array<string>) from
    canonicalize.conversation_texts. An empty-STRING turn still
    tokenizes to one '' token (consistent with the shingle/simhash
    tokenization), so every conversation with >= 1 turn gets a unit
    vector; the zero vector only arises for zero-turn groups, where the
    verify's 0-norm division yields NULL and the threshold drops it.
    """
    hashed = conv_texts.select(
        "conv_id",
        F.flatten(
            F.transform(
                "texts",
                lambda t: F.transform(
                    F.split(F.coalesce(t, F.lit("")), " "),
                    lambda tok: F.xxhash64(tok),
                ),
            )
        ).alias("hs"),
    )

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def embed(hs: pd.Series) -> pd.Series:
        n = len(hs)
        lens = np.fromiter((len(x) for x in hs), dtype=np.int64, count=n)
        out = np.zeros((n, dim), dtype=np.float64)
        nonzero = np.nonzero(lens > 0)[0]
        if len(nonzero):
            flat = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in hs]
            ).astype(np.uint64)
            row = np.repeat(np.arange(n), lens)
            col = (flat % np.uint64(dim)).astype(np.int64)
            # one hash bit (above the bucket bits) supplies the sign
            sign = np.where(
                (flat >> np.uint64(32)) & np.uint64(1), 1.0, -1.0
            )
            np.add.at(out, (row, col), sign)
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            np.divide(out, norms, out=out, where=norms > 0)
        return pd.Series([r.tolist() for r in out])

    return hashed.select("conv_id", embed(F.col("hs")).alias("embedding"))
