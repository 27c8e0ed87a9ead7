"""SparkSession construction tuned for this engine.

Local-mode defaults match the sandbox (local[$SPARK_GRAFT_CPUS]); on a
real cluster the same builder options apply, with
spark.sql.shuffle.partitions sized to ~2-3x total cores and AQE left on
to coalesce and to split skewed partitions at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "timeperiods-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE is enabled for runtime partition coalescing and skew-join
    splitting — the latter is the first line of defense against skewed
    (source, bin) keys in the range join (see SURVEY.md §4.3); explicit
    salting (functions.grid.salted_repartition) is the second.
    """
    # Pandas-UDF closures reference this package by module name; Python
    # worker processes unpickle them and need the package importable.
    # Local mode: workers inherit the driver env, so exporting
    # PYTHONPATH before the JVM starts suffices. Cluster mode: ship the
    # package with spark-submit --py-files (see jobs/run_tiers.py).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    extra_conf = dict(extra_conf or {})
    # Allocation-heavy operators (explode(sequence(...)) in the rollup
    # and bin-join paths) churn short-lived arrays; measured locally,
    # ParallelGC with a large young gen cuts their steady-state wall
    # clock ~2.5x vs default G1. Executor JVMs on a real cluster take
    # the same flags via spark.executor.extraJavaOptions.
    extra_conf.setdefault(
        "spark.driver.extraJavaOptions", "-XX:+UseParallelGC"
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
