"""SparkSession factory with scale-oriented defaults.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same
config block is what we would ship to a 1000-executor cluster minus
the master/memory lines: AQE on (runtime shuffle coalescing + skew-join
splitting), UTC session timezone (oracle comparability), Arrow for any
Pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these two are cluster-sizing decisions; locally we match core
# count so tiny SF data isn't over-parallelized.
_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "openetl_spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or return the active) SparkSession with engine defaults.

    Every config here is cluster-safe: AQE re-plans shuffle partition
    counts at runtime so the static ``spark.sql.shuffle.partitions``
    is only an upper hint; skew-join splitting handles hot keys in
    large joins without manual salting in the common case.
    """
    # Make this package importable on executor Python workers regardless
    # of the caller's cwd (workers resolve by-reference pickles through
    # their own sys.path, which is built from PYTHONPATH at JVM launch).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if pkg_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        # local mode: shuffle partitions = core count (the 200 default
        # over-parallelizes small data). On a cluster this knob is left
        # to spark-submit/site config — pinning it to the LOCAL cpu
        # count would cap reduce parallelism (AQE only coalesces DOWN
        # from spark.sql.shuffle.partitions, never up).
        builder = (
            builder.master(f"local[{_LOCAL_CPUS}]")
            .config("spark.sql.shuffle.partitions", _LOCAL_CPUS)
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
