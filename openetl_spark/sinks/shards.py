"""Training-shard writer: lay a curated corpus out as the
directory-partitioned, size-bounded, deterministically-ordered parquet
shards a training data-loader consumes.

The reference's file sink writes one undifferentiated result set
(`/root/reference/src/index.ts:491-524` batches rows at the transport
level only); a 100 TB training corpus instead needs:

* directory partitioning on the mix keys (``lang=…/source=…``) so a
  loader — or a later Spark job — prunes to the slice it trains on;
* bounded shard size (``maxRecordsPerFile``) so shards stream into
  fixed-size loader workers regardless of upstream partition skew;
* deterministic within-shard order (``sortWithinPartitions``) so a
  (seeded) reshuffle at read time is reproducible.

One hash shuffle on the partition keys, then parallel writes — the
write itself never funnels through fewer tasks than the cluster has.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("lang",),
    order_by: Sequence[str] = ("doc_id",),
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as partitioned, size-bounded, ordered shards.

    The pre-write ``repartition(partition_by)`` co-locates each output
    directory's rows in one task set, so a directory's shards are
    written by one task chain instead of every task appending a sliver
    to every directory (tasks × directories small-file explosion)."""
    out = (
        df.repartition(*[df[c] for c in partition_by])
        .sortWithinPartitions(*order_by)
        .write.format(format)
        .mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    out.partitionBy(*partition_by).save(path)
