"""SparkSession factory.

Tuned for the harness (single-JVM local[N]) but with settings that are
the right defaults on a real multi-executor cluster too: AQE for
runtime re-planning/skew handling, Arrow for any pandas exchange, UTC
session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-UDF closures reference module-level symbols, which
    cloudpickle serializes BY REFERENCE — workers must import the
    package. When the driver imports us from an arbitrary cwd (the
    harness does), the repo dir is not on the workers' PYTHONPATH, so
    ship the package as a zip via addPyFile (idempotent per session).
    """
    jsc = spark.sparkContext
    if getattr(jsc, "_bbdc_pkg_shipped", False):
        return
    staging = tempfile.mkdtemp(prefix="bbdc_pkg_")
    zip_base = os.path.join(staging, "bbdc20_submission_spark_pkg")
    archive = shutil.make_archive(
        zip_base, "zip", root_dir=os.path.dirname(_PKG_DIR),
        base_dir=os.path.basename(_PKG_DIR),
    )
    jsc.addPyFile(archive)
    jsc._bbdc_pkg_shipped = True


def get_spark(app_name: str = "bbdc20_submission_spark") -> SparkSession:
    """Create (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    Shuffle partitions follow the core count — at cluster scale you'd
    size this to ~2-3x total executor cores, and AQE coalesces the
    excess at runtime either way.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash join when its size checks
        # pass (guide-recommended baseline; sort-merge remains the
        # fallback). A/B'd on the full 50-query bench in r13 —
        # see OPTIMIZATION_r13.md; env knob so either side of the A/B
        # is reproducible. Tradeoff (advice r13): SHJ's build side
        # cannot spill the hash map, so a badly under-estimated build
        # side can OOM an executor where SMJ would have streamed —
        # Spark's canBuildLocalHashMap size check is the guard; set
        # SPARK_GRAFT_PREFER_SMJ=true to restore sort-merge wholesale.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # legacy events.ts layout (TIMESTAMP NANOS) reads as long;
        # harmless for the µs layouts — set here so sessions we own
        # never mutate it mid-flight (load_table still self-defends
        # on harness-owned sessions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # sources/pysource.py implements pushFilters (Python Data
        # Source filter pushdown, Spark 4.1) — off by default upstream
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # local mode: every "executor" thread shares this one JVM heap,
        # so size it for 32-way parallel shuffle/agg working sets (8g
        # showed GCLocker thrash on the 16x scale probes)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
