"""Verified-sink round trip (SURVEY.md §2.1 S4-S5): partitioned write →
read-back → per-partition count+digest audit passes, and the audit
actually catches corruption."""

from __future__ import annotations

from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.sinks.verified import (
    partition_manifest,
    verify_partitioned_write,
    write_partitioned,
)


def test_write_verify_roundtrip(spark, sf_dir, tmp_path):
    target = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "documents")
    write_partitioned(src, target, ["lang", "source"])
    audit = verify_partitioned_write(spark, src, target, ["lang", "source"], "text")
    assert audit.count() == 0, f"audit flagged: {audit.collect()[:3]}"
    # partition layout is real Hive-style: lang=../source=.. directories
    got = spark.read.parquet(target)
    assert got.count() == src.count()
    assert set(got.columns) == set(src.columns)


def test_audit_catches_missing_and_corrupt_rows(spark, sf_dir, tmp_path):
    target = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "documents")
    # Deliver a damaged copy: drop some rows of one partition, corrupt
    # the text of another — both must be flagged, by count and by digest
    # respectively.
    damaged = src.filter(
        ~((F.col("lang") == "en") & (F.col("doc_id") % 7 == 0))
    ).withColumn(
        "text",
        F.when(F.col("lang") == "de", F.concat(F.col("text"), F.lit(" X")))
        .otherwise(F.col("text")),
    )
    write_partitioned(damaged, target, ["lang", "source"])
    audit = verify_partitioned_write(spark, src, target, ["lang", "source"], "text")
    flagged = audit.collect()
    assert flagged, "audit missed the damage"
    langs = {r.lang for r in flagged}
    assert "en" in langs and "de" in langs
    for r in flagged:
        if r.lang == "de":  # corrupt: same count, different digest
            assert r.n_expected == r.n_actual
            assert r.expected_digest != r.actual_digest


def test_sorted_write_layout_and_schema_evolution(spark, sf_dir, tmp_path):
    """sortWithinPartitions write layout round-trips losslessly, and a
    later write with an added column reads back under mergeSchema with
    nulls for the old files — schema evolution without rewriting
    history."""
    target = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "documents")
    write_partitioned(src, target, ["lang"], sort_cols=["source", "doc_id"])
    assert spark.read.parquet(target).count() == src.count()

    evolved = src.limit(10).withColumn("ocr_confidence", F.lit(0.9))
    write_partitioned(evolved, target, ["lang"], mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(target)
    assert "ocr_confidence" in merged.columns
    assert merged.count() == src.count() + 10
    assert merged.filter(F.col("ocr_confidence").isNull()).count() == src.count()


def _files_per_lang(p):
    import os

    out = {}
    for d in os.listdir(p):
        if d.startswith("lang="):
            out[d] = len(
                [f for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet")]
            )
    return out


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    from newspapers_etl_spark.sinks.verified import (
        compact_partitions,
        current_data_path,
        read_current,
    )

    target = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "documents")
    # simulate micro-batch accretion: 5 appends → ≥5 files per partition
    for i in range(5):
        write_partitioned(
            src.filter(F.col("doc_id") % 5 == i), target, ["lang"], mode="append"
        )
    before = sorted(map(tuple, read_current(spark, target).collect()))

    assert all(n >= 5 for n in _files_per_lang(current_data_path(target)).values())
    compact_partitions(spark, target, ["lang"], files_per_partition=1)
    assert all(n <= 1 for n in _files_per_lang(current_data_path(target)).values())
    after = sorted(map(tuple, read_current(spark, target).collect()))
    assert after == before
    # second compaction bumps the generation and still round-trips
    compact_partitions(spark, target, ["lang"], files_per_partition=2)
    assert sorted(map(tuple, read_current(spark, target).collect())) == before


def test_compaction_swap_is_atomic_for_readers(spark, sf_dir, tmp_path):
    """Readers resolving through the generation pointer see either the
    old generation or the new one at every instant — never an absent
    path.  Verified by (a) interposing on the pointer publish to read
    mid-swap, and (b) keep_old_generation leaving a pre-swap reader's
    resolved path intact after the swap."""
    import os
    from unittest import mock

    from newspapers_etl_spark.sinks.verified import (
        compact_partitions,
        current_data_path,
        read_current,
    )

    target = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "documents").limit(50)
    for i in range(2):
        write_partitioned(
            src.filter(F.col("doc_id") % 2 == i), target, ["lang"], mode="append"
        )
    expected = sorted(map(tuple, read_current(spark, target).collect()))

    observed = []  # (phase, rows) snapshots taken around the publish
    real_replace = os.replace

    def spying_replace(a, b):
        if not str(b).endswith("_CURRENT"):  # unrelated os.replace traffic
            return real_replace(a, b)
        # Immediately BEFORE the pointer lands: a reader must still see
        # the complete old generation.
        observed.append(sorted(map(tuple, read_current(spark, target).collect())))
        real_replace(a, b)
        # Immediately AFTER: the new generation, also complete.
        observed.append(sorted(map(tuple, read_current(spark, target).collect())))

    with mock.patch("os.replace", side_effect=spying_replace):
        compact_partitions(
            spark, target, ["lang"], files_per_partition=1, keep_old_generation=True
        )
    assert observed == [expected, expected]

    # keep_old_generation: a reader that resolved before the swap keeps a
    # valid path (the retention grace period readers rely on).
    old_resolved = target  # legacy root layout was the pre-swap generation
    assert sorted(map(tuple, spark.read.parquet(old_resolved).collect())) == expected
    # and the live pointer now names generation 1
    assert current_data_path(target).endswith("_gen-00000001")


def test_manifest_digest_is_order_insensitive(spark, sf_dir):
    src = load_table(spark, sf_dir, "documents")
    m1 = partition_manifest(src, ["lang"], "text")
    m2 = partition_manifest(
        src.orderBy(F.desc("doc_id")).repartition(7), ["lang"], "text"
    )
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_publish_carries_forward_foreign_pointer_meta(spark, sf_dir, tmp_path):
    """A publish that does not name a meta key must carry the key
    forward (ADVICE r9 #4): a generic compaction over the BM25 stats
    root would otherwise drop the applied_batches ledger, making every
    applied batch's postings invisible to readers and re-appendable.
    Naming the key in ``meta`` still overwrites it deliberately."""
    from newspapers_etl_spark.sinks.verified import (
        allocate_generation,
        compact_partitions,
        current_pointer,
        publish_generation,
    )

    target = str(tmp_path / "stats")
    src = load_table(spark, sf_dir, "documents").limit(20)
    write_partitioned(src, target, ["lang"])

    gen, name = allocate_generation(target)
    spark.read.parquet(target).write.parquet(f"{target}/{name}")
    publish_generation(target, gen, name, meta={"applied_batches": ["a"]})
    assert current_pointer(target)["applied_batches"] == ["a"]

    # A meta-less maintenance publish (compaction) preserves the ledger.
    compact_partitions(spark, target, ["lang"])
    ptr = current_pointer(target)
    assert ptr["applied_batches"] == ["a"]
    assert ptr["generation"] == gen + 1

    # Naming the key overwrites it deliberately.
    gen2, name2 = allocate_generation(target)
    spark.read.parquet(f"{target}/{ptr['dir']}").write.parquet(
        f"{target}/{name2}"
    )
    publish_generation(target, gen2, name2, meta={"applied_batches": ["a", "b"]})
    assert current_pointer(target)["applied_batches"] == ["a", "b"]


def test_append_default_batch_id_fingerprints_content(spark, sf_dir, tmp_path):
    """ADVICE r9 #2: the default batch id folds a content fingerprint
    (row count + max doc_id), so regenerated content at a RE-USED path
    appends instead of being silently swallowed by the applied-batch
    ledger, while a true retry of identical content still dedupes."""
    from newspapers_etl_spark.catalog import table_path
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer, read_current

    docs = load_table(spark, sf_dir, "documents")
    cut = docs.count() // 2
    base, reused = str(tmp_path / "h1"), str(tmp_path / "h2")
    docs.filter(F.col("doc_id") < cut).write.parquet(table_path(base, "documents"))
    docs.filter((F.col("doc_id") >= cut) & (F.col("doc_id") < cut + 5)).write.parquet(
        table_path(reused, "documents")
    )

    idx = str(tmp_path / "idx")
    write_bm25_postings(spark, base, idx)
    append_bm25_postings(spark, reused, idx)
    n_after_first = read_current(spark, f"{idx}/stats").collect()[0]["n"]

    # True retry of identical content at the same path: no-op.
    append_bm25_postings(spark, reused, idx)
    assert read_current(spark, f"{idx}/stats").collect()[0]["n"] == n_after_first
    assert len(current_pointer(f"{idx}/stats")["applied_batches"]) == 1

    # Regenerate DIFFERENT content at the same path: new fingerprint,
    # appended rather than swallowed.
    import shutil

    shutil.rmtree(reused)
    docs.filter((F.col("doc_id") >= cut + 5) & (F.col("doc_id") < cut + 12)).write.parquet(
        table_path(reused, "documents")
    )
    append_bm25_postings(spark, reused, idx)
    assert read_current(spark, f"{idx}/stats").collect()[0]["n"] == n_after_first + 7
    assert len(current_pointer(f"{idx}/stats")["applied_batches"]) == 2


def test_pointer_io_refuses_remote_schemes():
    """Generation-pointer I/O is plain-file I/O, so remote URIs must
    fail LOUDLY (ADVICE r8 #4) — never write a file: pointer next to an
    object-store table."""
    import pytest

    from newspapers_etl_spark.sinks.verified import local_fs_path

    assert local_fs_path("/tmp/t") == "/tmp/t"
    assert local_fs_path("file:/tmp/t") == "/tmp/t"
    for uri in ("s3a://bucket/table", "hdfs://nn/table", "gs://b/t"):
        with pytest.raises(NotImplementedError):
            local_fs_path(uri)
