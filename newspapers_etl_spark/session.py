"""SparkSession factory.

Defaults are sized for the local[32] test harness but every setting is the
one you'd also want on a 1000-executor cluster reading 100 TB:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  strategy switch) — replaces hand-tuned shuffle partition counts at scale.
- Shuffle partitions ~= cores locally; on a real cluster AQE coalesces from
  a deliberately-high initial number, so we set the initial high and let
  AQE shrink.
- UTC session timezone: parquet timestamps compare cleanly against the
  DuckDB oracle and avoid DST-dependent results.
- Arrow enabled: every Pandas-UDF / toPandas boundary is vectorized.

The reference engine is single-threaded (reference
src/01-scrape-images.py:502-515 iterates rows in a Python for loop); the
Spark rebuild's unit of parallelism is the partition, so nothing here
mirrors the reference's pacing constants.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Managed-table warehouse (bucketed tables etc.): a throwaway dir by
# default so local runs never litter the repo; clusters override.
_WAREHOUSE = os.environ.get("SPARK_GRAFT_WAREHOUSE") or tempfile.mkdtemp(
    prefix="spark_warehouse_"
)


def get_spark(
    app_name: str = "newspapers_etl_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` controls local-mode parallelism and the shuffle-partition
    floor; on a cluster, pass ``master`` via extra_conf/spark-submit and
    these settings still apply.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", _WAREHOUSE)
        # Python Data Source API: let custom connectors receive filters
        # (sources/archive_source.py folds date predicates into the scan).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # SESSION-WIDE: TIMESTAMP(NANOS) parquet columns (events.ts) read
        # as raw longs instead of erroring; catalog.load_table converts
        # to µs timestamps explicitly.  Declared here, at session build,
        # so the effect is visible and deliberate — a per-read set/restore
        # is unsafe because Spark consults the conf again at scan
        # EXECUTION, after a lazy reader would have restored it.  Any
        # OTHER nanos column a caller reads comes back as a long (never
        # silently wrong — the type changes), and must convert like
        # load_table does.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4 wraps EVERY DataFrame/Column API call in a
        # call-site capture (errors/utils._with_origin): a conf.get py4j
        # round-trip + a Python stack walk + a JVM thread-local set per
        # call, ~1.5-4 ms each — measured 0.6 s of pure driver overhead
        # on one maintenance roundtrip (~400 captures).  The capture
        # only enriches error messages with user line numbers; the
        # engine's own error surfacing never relied on it.  Off at any
        # scale — this is driver-side overhead, not a local[32] quirk.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # FileOutputCommitter v2: task outputs move to the destination
        # at task commit instead of a serial rename pass in job commit —
        # the standard large-job committer choice (guide §9 era
        # defaults), measured ~10% off every small parquet publish here
        # and a much bigger win when a 100 TB write commits thousands of
        # files.  Our index publishes stay atomic regardless: visibility
        # is gated on the generation-pointer flip, not on _SUCCESS.
        # CONTRACT for the v2 trade-off (ADVICE r16): with v2, a mid-job
        # crash can leave PARTIAL task outputs in an overwrite
        # destination whose old content the overwrite already cleared —
        # so every overwrite destination in this engine must be either
        # pointer-gated (readers resolve through _CURRENT, never the
        # torn dir) or a scratch/staging path healed by wholesale retry
        # (underscore-staged batch roots, scratch_index_dir trees,
        # merge dest roots wiped by their caller).  A new write path
        # that lets readers list an overwrite destination directly must
        # not rely on its emptiness/partial state to mean anything.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
