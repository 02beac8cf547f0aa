"""SparkSession factory (SURVEY §7 M0).

Replaces the reference's import-time side effects (etl_connector.py:23-50:
client/session construction at module import) with an explicit factory.

Configs are chosen for determinism (UTC timestamps so results hash-match a
DuckDB oracle) and for scale (AQE for runtime re-planning / skew joins,
shuffle partitions sized to cores locally — on a real cluster this would be
set to ~2-3x total executor cores or left to AQE coalescing).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_SHIPPED_SESSIONS: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark's Python workers.

    Worker processes do NOT inherit the driver script's sys.path, so any
    pickled closure that references package modules (mapInPandas / UDF
    stages) would fail with ModuleNotFoundError when the driver runs from a
    different cwd. Shipping a zip via addPyFile fixes local and cluster
    mode alike — the standard 'ship your package to executors' pattern.
    Idempotent per session.
    """
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)


def get_spark(
    app_name: str = "custom_python_etl_data_connector_keerthana2k4_tech_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a cluster, ``master`` comes from spark-submit; locally defaults to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if master is None:
        master = f"local[{cpus}]"
    builder = builder.master(master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
