"""SparkSession factory.

Generalizes the reference's two session builders
(`src/spark/jobs/spark_stream_processor.py:28-59`,
`src/spark/jobs/spark_batch_processor.py:16-39`) with the hard-coded
credentials removed and the scale-hostile settings fixed:

- the reference pins ``spark.sql.shuffle.partitions`` to 2
  (`spark_stream_processor.py:39,43`); we size it to the available
  cores and let AQE coalesce at runtime,
- AQE (+ skew-join handling) is on, so the 100 TB plan re-partitions
  itself from runtime statistics instead of hand-tuned constants,
- session timezone is pinned to UTC so event-time windows and date
  truncation are reproducible across hosts,
- Arrow transfer is on for the (rare, clearly-marked) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS, else host CPUs."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


#: Conf applied to every engine session. Everything here is also safe to
#: `spark.conf.set` on a live session except the static entries, which
#: are silently ignored at runtime.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # the driver's events.parquet stores TIMESTAMP(NANOS); Spark only
    # reads it as a long with this flag (converted losslessly by
    # functions.cleaning.event_time_from_nanos)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # tz-naive parquet timestamps (pandas/pyarrow default, and the
    # driver's current events.parquet `ts`) would otherwise surface as
    # TIMESTAMP_NTZ, which `withWatermark`/`unix_micros` reject; with
    # the session pinned to UTC, reading them as plain TIMESTAMP is the
    # value-identical interpretation
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # streaming: carried over from the reference's graceful-shutdown conf
    # (`spark_stream_processor.py:35`)
    "spark.streaming.stopGracefullyOnShutdown": "true",
}


def s3a_conf_from_env(env: dict[str, str] | None = None) -> dict[str, str]:
    """Optional object-store profile: the reference wires MinIO via S3A
    with hard-coded credentials (`spark_stream_processor.py:46-53`);
    here the same settings come from the environment and are returned
    as ``spark.hadoop.*`` conf so they apply at builder time (no live
    endpoint needed, nothing set unless configured).

    Env vars: ``SPARK_GRAFT_S3_ENDPOINT`` (required for the profile to
    activate), ``SPARK_GRAFT_S3_ACCESS_KEY`` / ``SPARK_GRAFT_S3_SECRET_KEY``
    (optional — omit to use the default provider chain, e.g. instance
    roles), ``SPARK_GRAFT_S3_SSL`` (default ``false`` — MinIO-style
    endpoints), ``SPARK_GRAFT_S3_PATH_STYLE`` (default ``true``).
    Returns ``{}`` when no endpoint is configured, so callers can
    always merge it.
    """
    e = os.environ if env is None else env
    endpoint = e.get("SPARK_GRAFT_S3_ENDPOINT")
    if not endpoint:
        return {}
    conf = {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.path.style.access": e.get(
            "SPARK_GRAFT_S3_PATH_STYLE", "true"
        ),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": e.get(
            "SPARK_GRAFT_S3_SSL", "false"
        ),
    }
    access, secret = e.get("SPARK_GRAFT_S3_ACCESS_KEY"), e.get(
        "SPARK_GRAFT_S3_SECRET_KEY"
    )
    if access and secret:
        conf.update(
            {
                "spark.hadoop.fs.s3a.access.key": access,
                "spark.hadoop.fs.s3a.secret.key": secret,
                "spark.hadoop.fs.s3a.aws.credentials.provider": (
                    "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
                ),
            }
        )
    return conf


def get_spark(
    app_name: str = "rtsmdp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    for k, v in s3a_conf_from_env().items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_min_parallelism(df, target: int | None = None):
    """Round-robin repartition a DataFrame up to the cluster's default
    parallelism — only if it is currently under-partitioned.

    Small single-file inputs otherwise pin CPU-heavy per-row operators
    (MinHash, SimHash) to one task. At scale this is a no-op: a 100 TB
    scan already has far more partitions than cores, so no shuffle is
    added where it would actually hurt.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine conf to an externally-created
    session (e.g. the correctness driver's). Timezone matters most:
    window starts and date truncation must be UTC to match the oracle.
    """
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # only static conf is allowed to fail silently; anything
            # runtime-modifiable must actually land
            if spark.conf.isModifiable(k):
                raise
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise RuntimeError(
            f"spark.sql.session.timeZone={tz!r}: engine queries require UTC "
            "for oracle-reproducible windows and date truncation"
        )
    return spark
