"""SparkSession factory with scale-oriented defaults.

The reference (BigdataProjectCode.py:26) builds a bare
``SparkSession.builder.master("local[*]")``.  We instead turn on the
features that matter on a real cluster: AQE (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for any pandas exchange, and sane
shuffle-partition defaults.  On a 1000-executor cluster the same builder is
used without ``master`` and with shuffle partitions sized to ~2-3x total
cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app: str = "bigdataanalytics_textsummarization_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` controls local parallelism only; on a cluster the master is
    taken from the environment (spark-submit) and this arg is ignored.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    # Python workers resolve imports from PYTHONPATH, not the driver's
    # sys.path — make sure this package's root is visible to them even when
    # the driver is launched from another directory.  (On a real cluster
    # the equivalent is shipping the package via --py-files / a wheel.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # production posture per Spark docs: coalesce to the advisory size
        # rather than preserving defaultParallelism — small shuffles collapse
        # to few tasks, large ones are untouched
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"),
        )
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
