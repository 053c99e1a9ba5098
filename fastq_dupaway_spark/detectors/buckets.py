"""Hot-bucket policy shared by the candidate generators.

Every near-dup detector blocks records into buckets (LSH band keys, simhash
band values, Hamming chunk keys, containment prefix blocks) and self-joins
within the bucket. A bucket of size B emits O(B^2) candidate pairs, so one
boilerplate-heavy key at 10^12-turn scale would explode the join. Round 1
silently DROPPED oversized buckets — a recall hole on exactly the skewed
data the north rule names. The policy here instead:

1. buckets <= max_bucket join normally (salt 0);
2. larger buckets are SALTED into ceil(B / max_bucket) sub-buckets of
   ~max_bucket rows via pmod(xxhash64(id, key...), S) — pair generation
   becomes O(B * max_bucket), linear in B, and skew disappears (every
   sub-bucket is bounded). Nothing is dropped.
3. `hot_buckets` surfaces the over-cap keys + sizes as a small DataFrame —
   the pipeline writes it to the checkpoint store as a quarantine table and
   the manifest carries the counts (reference --verbose counter analog,
   /root/reference/src/hash_dup_remover.hpp:342-346).

Recall semantics (exact, stated — not hand-waved): PAIR recall within a hot
bucket is limited to same-salt pairs (~1/S of the bucket's pairs per band).
CLUSTER recall survives because the salt hash includes the band key, so
each band cuts the same hot population DIFFERENTLY; the union of >= 2
orthogonal cuts connects the whole population and connected components
re-merges it. Detectors with a single blocking family at a given key
(containment) document the residual. Buckets are never silently lost:
`hot_buckets` reports every one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    max_bucket: int,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Add a `salt` column: 0 for rows in buckets of <= max_bucket rows,
    else pmod(xxhash64(id, keys...), ceil(bucket_n / max_bucket)).

    Bucket sizes come from a map-side-combined groupBy reduced to the
    over-cap keys and BROADCAST back — heavy hitters are few by
    definition, so the dim is small, and this avoids the full sort a
    window(count over partitionBy) would impose on the entire band table.
    Without `hot`, `df` is scanned twice (sizes + salt join): callers
    pass a cached band table. Pass `hot` (as salted_self_pairs does, via
    materialize_and_size) to reuse a precomputed — ideally driver-local —
    hot_buckets() frame and skip the sizing scan entirely.

    Self-joins must add `salt` to the equi-join key. Including the key
    columns in the salt hash makes different bands cut a hot population
    along different boundaries (see module docstring).
    """
    if hot is None:
        hot = hot_buckets(df, key_cols, max_bucket)
    dim = hot.select(
        *key_cols,
        F.ceil(F.col("bucket_n") / max_bucket).cast("int").alias("n_salts"),
    )
    return (
        df.join(F.broadcast(dim), key_cols, "left")
        .withColumn(
            "salt",
            F.when(F.col("n_salts").isNull(), F.lit(0))
            .otherwise(
                F.pmod(
                    F.xxhash64(F.col(id_col), *key_cols), F.col("n_salts")
                )
            )
            .cast("int"),
        )
        .drop("n_salts")
    )


def materialize_and_size(
    df: DataFrame, key_cols: list[str], max_bucket: int
) -> tuple[DataFrame, DataFrame]:
    """persist(df) + the hot-bucket sizing aggregation, fused into ONE
    Spark job: the first action on a persisted DataFrame populates the
    cache as a side effect of scanning, so running the sizing groupBy as
    that first action materializes the band table AND returns the
    over-cap keys in a single pass. The collected rows are rebuilt as a
    driver-local relation, so the downstream broadcast of the salt dim is
    a driver-side copy — no second scan, no extra job barrier. (Round-4
    shape was localCheckpoint job -> sizing/broadcast-build job -> join:
    three serial barriers per detector row; this is the 'fuse the hot-dim
    sizing into the checkpoint action' cut, STATUS r5 known-limit #2.)

    Driver-size envelope: the collect carries ONE row per over-cap key —
    heavy hitters, few by definition (each accounts for > max_bucket
    corpus rows, so there can be at most |rows|/max_bucket of them), and
    exactly the rows the broadcast exchange would have shipped through
    the driver anyway. persist() (MEMORY_AND_DISK) also keeps lineage,
    unlike localCheckpoint — on a real cluster an executor loss
    recomputes the band partition instead of failing the job.

    Returns (persisted df, local hot frame (key_cols..., bucket_n))."""
    df = df.persist()
    plan = hot_buckets(df, key_cols, max_bucket)
    hot = df.sparkSession.createDataFrame(plan.collect(), plan.schema)
    return df, hot


def salted_self_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    max_bucket: int,
    carry_cols: list[str] | None = None,
    materialize: bool = True,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Within-bucket self-join -> (conv_a, conv_b [, carry_a.., carry_b..])
    with conv_a < conv_b, under the salted hot-bucket policy.

    materialize (default): the band table is persisted and sized in ONE
    fused job (materialize_and_size) — the size aggregation and both join
    sides would otherwise recompute the (often expensive: signatures)
    upstream plan; measured ~2x on the simhash/minhash paths. Rows are
    fixed-width ids + hashes, so the cache is small relative to the
    corpus, and MEMORY_AND_DISK spills under pressure. Pass False to keep
    the composition fully lazy (e.g. when the input is already a
    checkpointed stage table).

    hot: optional precomputed hot_buckets() frame (ideally driver-local)
    for callers that already persisted + sized `df` themselves — e.g. the
    incremental path, which reuses ONE sized delta band table for both
    this self-join and the corpus cross-join. Ignored when materialize
    is True (the fused job computes its own)."""
    if materialize:
        df, hot = materialize_and_size(df, key_cols, max_bucket)
    salted = with_salt(df, key_cols, id_col, max_bucket, hot=hot)
    a, b = salted.alias("a"), salted.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    cond.append(F.col("a.salt") == F.col("b.salt"))
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    cols = [
        F.col(f"a.{id_col}").alias("conv_a"),
        F.col(f"b.{id_col}").alias("conv_b"),
    ]
    for c in carry_cols or []:
        cols.append(F.col(f"a.{c}").alias(f"{c}_a"))
        cols.append(F.col(f"b.{c}").alias(f"{c}_b"))
    return a.join(b, on=cond).select(*cols).distinct()


def salted_cross_pairs(
    df: DataFrame,
    probes: DataFrame,
    key_cols: list[str],
    id_col: str,
    max_bucket: int,
    probe_id_col: str | None = None,
    materialize: bool = True,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Bucket join of a big blocked table (`df`) against a probe table on
    key_cols -> (conv_a, conv_b) with conv_a < conv_b, under the salted
    hot-bucket policy. The incremental-dedup primitive: `df` is the
    (corpus-sized) band table, `probes` the (delta-sized) one.

    Salting is one-sided: the BIG side is cut into bounded sub-buckets
    and each probe row is replicated across its bucket's salts (probes
    carry only ids + keys — the containment needle-pushdown pattern,
    containment._probes_for). Unlike the self-join case, cross recall
    inside a hot bucket is therefore exactly 1.0 per band: every probe
    visits every salt, no pair is deferred to a different band's cut.
    Pair volume per hot key is O(B_big * B_probe) regardless of salting —
    salting bounds the per-task working set, and `hot_buckets` on the
    probe side is the caller's quarantine surface for probe-side heavy
    hitters (a delta batch is bounded by construction).

    broadcast_probes (default): explicit broadcast hint on the replicated
    probe side — a delta band table is |delta| x n_bands fixed-width rows
    (+ hot-salt replication), fine to ~10^7-conversation delta batches;
    beyond that, False routes through a co-partitioned SHUFFLE_HASH join
    that builds the hash table from the probe side (same fallback
    rationale as containment._needle_key_semi_join)."""
    if materialize:
        df, hot = materialize_and_size(df, key_cols, max_bucket)
    else:
        hot = hot_buckets(df, key_cols, max_bucket)
    salted = with_salt(df, key_cols, id_col, max_bucket, hot=hot)
    dim = hot.select(
        *key_cols,
        F.ceil(F.col("bucket_n") / max_bucket).cast("int").alias("n_salts"),
    )
    pid = probe_id_col or id_col
    replicated = (
        probes.join(F.broadcast(dim), key_cols, "left")
        .select(
            F.col(pid).alias("__probe_id"),
            *key_cols,
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("n_salts"), F.lit(1)) - 1
                )
            ).alias("salt"),
        )
    )
    a = salted.alias("a")
    b = (
        F.broadcast(replicated) if broadcast_probes
        else replicated.hint("shuffle_hash")
    ).alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    cond.append(F.col("a.salt") == F.col("b.salt"))
    cond.append(F.col(f"a.{id_col}") != F.col("b.__probe_id"))
    return (
        a.join(b, on=cond)
        .select(
            F.least(F.col(f"a.{id_col}"), F.col("b.__probe_id")).alias("conv_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col("b.__probe_id")).alias("conv_b"),
        )
        .distinct()
    )


def hot_buckets(
    df: DataFrame, key_cols: list[str], max_bucket: int
) -> DataFrame:
    """(key_cols..., bucket_n) for every over-cap bucket — the quarantine
    surface. groupBy (map-side combine), not a window: stats-only pass."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .where(F.col("bucket_n") > max_bucket)
    )
