"""Streaming CDC -> SCD2 upsert: ``foreachBatch`` + generation swap.

The missing piece between the batch SCD2 merge (operators/scd.py) and
the streaming surface: change events arrive as a STREAM, and each
micro-batch must upsert into the dimension history with exactly-once
effect.  ``MERGE INTO`` needs Delta/Iceberg; on plain parquet the same
semantics compose from ``foreachBatch`` applying the batch
``scd2_merge`` function against a GENERATION directory:

  - every micro-batch reads the current generation, merges, and writes
    a complete NEW generation directory;
  - the current-generation pointer advances only after the write
    completes, so a failed/retried epoch re-merges against the same
    parent generation — and because ``scd2_merge`` treats
    attribute-identical re-delivery as a no-op, the retry converges to
    the same history (exactly-once EFFECT under at-least-once
    delivery, the St4 discipline applied to a dimension table);
  - the same key re-delivered in a LATER micro-batch is equally a
    no-op, so the converged history is independent of how the CDC rows
    were split into micro-batches — which is exactly what the batch
    oracle checks.

Scale: each merge costs one equi-join of the current snapshot against
the micro-batch (cost independent of history depth — see
operators/scd.py); the full-generation rewrite is the plain-parquet
price, and the docstring'd production upgrade is a table format whose
MERGE writes only changed files (Delta/Iceberg) with the SAME plan
shape.  The pointer swap mirrors ``sinks/verified.py``'s
generation-pointer compaction.

Reference lineage: the reference re-runs its day loop over a month and
relies on per-file existence checks for idempotent catch-up
(src/01-scrape-images.py:462-465, .github/workflows/main.yml:61-96);
this operator is that discipline with versioned history retained.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.scd import (
    _BASE_TS,
    _UPD_TS,
    SCD2_MERGE_ORACLE,
    scd2_init,
    scd2_merge,
)
from newspapers_etl_spark.registry import query


def current_generation(root: Path) -> int:
    """The newest COMMITTED generation: the highest ``gen=N`` directory
    holding a ``_SUCCESS`` marker.  This is the crash-recovery pointer —
    a write that died mid-flight leaves a directory without the marker,
    which readers and the next merge simply skip (and the retried epoch
    clobbers via overwrite).  On an object store this scan becomes the
    single small manifest object the docstring above describes."""
    gens = [
        int(p.name.split("=", 1)[1])
        for p in root.glob("gen=*")
        if (p / "_SUCCESS").exists()
    ]
    if not gens:
        raise FileNotFoundError(f"no committed generation under {root}")
    return max(gens)


def stream_scd2_upsert(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
    update_files: int = 4,
    root: Path | None = None,
    fail_after_batches: int | None = None,
) -> tuple[DataFrame, int]:
    """Run the churn CDC batch THROUGH THE STREAMING ENGINE as
    ``update_files`` parquet files consumed ``max_files_per_trigger``
    at a time, each micro-batch foreachBatch-merged into the SCD2
    generation store.  Returns (final history, number of micro-batches
    executed this call) — the count lets tests assert the multi-batch
    path actually ran rather than one degenerate mega-batch.

    Pass the same ``root`` across calls to RESUME after a failure: the
    seed history, update files, and stream checkpoint persist under it,
    the generation pointer is recovered from ``_SUCCESS`` markers (not
    driver memory), and the engine re-delivers the uncommitted epoch —
    whose merge is a no-op for already-applied keys, so a crash between
    the generation commit and the checkpoint commit cannot duplicate
    versions.  ``fail_after_batches`` injects a crash after N committed
    merges (test hook for exactly that recovery path)."""
    owns_root = root is None
    if root is None:
        root = Path(tempfile.mkdtemp(prefix="scd_stream_"))
    gen_dir = lambda n: str(root / f"gen={n}")  # noqa: E731

    # Both bootstrap writes are guarded by their _SUCCESS markers, not
    # bare directory existence, and re-written with overwrite: a crash
    # MID-SEED leaves a marker-less partial, and an .exists() guard
    # would then skip re-seeding forever while current_generation()
    # (which requires the marker) fails every subsequent merge.
    if not (root / "gen=0" / "_SUCCESS").exists():
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_mktsegment"
        )
        hist0 = scd2_init(cust, F.lit(_BASE_TS).cast("timestamp"))
        hist0.write.mode("overwrite").parquet(gen_dir(0))

    # CDC source: one row PER QUALIFYING ORDER (not per customer), so the
    # same key is re-delivered both within and across micro-batches —
    # the convergence claim is only interesting if redelivery happens.
    updates_dir = str(root / "updates")
    if not (root / "updates" / "_SUCCESS").exists():
        (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select(
                F.col("o_custkey").alias("c_custkey"),
                F.lit("CHURNED").alias("c_mktsegment"),
                F.lit(_UPD_TS).cast("timestamp").alias("ts"),
            )
            .repartition(update_files)
            .write.mode("overwrite").parquet(updates_dir)
        )

    state = {"batches": 0}

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if fail_after_batches is not None and state["batches"] >= fail_after_batches:
            raise RuntimeError("injected crash before generation commit")
        sess = batch_df.sparkSession
        cur = current_generation(root)
        hist = sess.read.parquet(gen_dir(cur))
        merged = scd2_merge(
            hist, batch_df, key="c_custkey", track_cols=["c_mktsegment"]
        )
        # overwrite clobbers a marker-less partial left by a crashed
        # attempt at this same generation number
        merged.write.mode("overwrite").parquet(gen_dir(cur + 1))
        state["batches"] += 1

    ckpt = str(root / "_checkpoint")
    stream = (
        spark.readStream.schema(spark.read.parquet(updates_dir).schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(updates_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(gen_dir(current_generation(root)))
    if owns_root:
        # A throwaway root would otherwise leak N+1 full history copies
        # per invocation (bench retries, lint, correctness runs all call
        # this).  Detach the result from the files (localCheckpoint
        # materializes the ~3k-row history into Spark-managed blocks),
        # then delete the root.  A caller-supplied root is the caller's
        # to keep — that is the crash-recovery resume path.
        import shutil

        final = final.localCheckpoint()
        shutil.rmtree(root, ignore_errors=True)
    return final, state["batches"]


@query("stscd", oracle=SCD2_MERGE_ORACLE)
def stream_scd2_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-engine SCD2 upsert, hash-checked against the BATCH
    merge oracle: however the CDC rows were micro-batched, the converged
    history must equal the single-batch answer.  Two micro-batches here
    (cross-batch redelivery still happens — fixture custkeys repeat
    across files); the 4-batch path runs in tests/test_streaming.py.
    Validity bounds are formatted strings for the same Arrow-sentinel
    reason as ``scd2_merge`` (operators/scd.py)."""
    hist, _ = stream_scd2_upsert(spark, sf_dir, update_files=2)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )
