"""Empirical scale-curve for the index-lifecycle cost claims
(VERDICT r14 next-round #6): SCALING.md asserts mutations are O(batch),
policy monitors are O(stats), reads are O(live corpus) and
build/rebuild/compact are the only O(corpus) ops — prove it with data
by timing each lifecycle STEP (not the registered roundtrips, whose
fixture batches scale WITH the corpus) while the corpus scales and the
mutation batch stays FIXED.

Corpus scaling: the sf0.1 fixture tables replicated ×factor with
disjoint id offsets into a scratch dir (measurement harness only —
registered queries and tests read only the driver-generated fixtures).
The mutation batch is the SAME few-hundred-row relation at every
scale, so a flat append/delete/upsert/policy curve IS the O(batch)
claim and a ~linear build/rebuild/compact curve is the expected
O(corpus) cost.

Usage:
    python tools/scale_curve.py            # factors 1,10,100 over sf0.1
    SPARK_GRAFT_SCALE_FACTORS=1,10 python tools/scale_curve.py

Prints one JSON line per (op, factor): {"op": ..., "factor": N,
"rows": corpus_rows, "sec": t}.  Summarize with tools/scale_report.py
or paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [
    int(f)
    for f in os.environ.get("SPARK_GRAFT_SCALE_FACTORS", "1,10,100").split(",")
]
OFFSET = 100_000_000  # disjoint id ranges per replica and for fresh batches


def _scaled(spark, table: str, key: str, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SRC_SF}/{table}.parquet")
    parts = [base]
    for i in range(1, factor):
        parts.append(
            base.filter(F.col(key).isNotNull()).withColumn(
                key, F.col(key) + F.lit(i * OFFSET)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    from pyspark.sql import functions as F

    from newspapers_etl_spark.operators.index_pit import read_ivf_codes_at
    from newspapers_etl_spark.operators.index_upsert import upsert_ivf_index
    from newspapers_etl_spark.operators.ivf_maintenance import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_codes,
        delete_from_ivf_index,
        fit_models,
        read_ivf_codes,
        rebuild_ivf_index,
    )
    from newspapers_etl_spark.operators.bm25_policy import bm25_policy_chain
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        compact_bm25_postings,
        delete_bm25_docs,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.session import get_spark

    spark = get_spark("newspapers_etl_spark_scale_curve")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    emit = lambda op, factor, rows, sec: print(
        json.dumps(
            {"op": op, "factor": factor, "rows": rows, "sec": sec}
        ),
        flush=True,
    )

    # The FIXED mutation batches: a few hundred rows from the unscaled
    # fixture, ids moved to a range disjoint from every replica.
    e0 = spark.read.parquet(f"{SRC_SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    fixed_add = (
        e0.filter("vec_id % 8 = 3 AND vec_id IS NOT NULL")
        .withColumn("vec_id", F.col("vec_id") + F.lit(50 * OFFSET))
        .persist()
    )
    fixed_add.count()
    d0 = spark.read.parquet(f"{SRC_SF}/documents.parquet").select(
        "doc_id", "text"
    )
    fixed_docs = (
        d0.filter("doc_id % 8 = 3 AND doc_id IS NOT NULL")
        .withColumn("doc_id", F.col("doc_id") + F.lit(50 * OFFSET))
        .persist()
    )
    fixed_docs.count()

    for factor in FACTORS:
        e = _scaled(spark, "embeddings", "vec_id", factor).persist()
        n_rows = e.count()
        d = _scaled(spark, "documents", "doc_id", factor).persist()
        d.count()
        # The delete/upsert batches address ORIGINAL ids (members of
        # every scale's corpus) and stay the same size at every scale.
        del_e = e0.filter(
            "vec_id % 10 = 1 AND vec_id % 4 < 3 AND vec_id IS NOT NULL"
        )
        del_d = d0.filter(
            "doc_id % 10 = 1 AND doc_id IS NOT NULL"
        )

        root = os.path.join(
            tempfile.gettempdir(), f"scale-curve-{factor}"
        )
        shutil.rmtree(root, ignore_errors=True)
        ivf, bm = f"{root}/ivf", f"{root}/bm"

        models = fit_models(e.filter("vec_id % 8 = 0"))
        emit(
            "ivf_build", factor, n_rows,
            _t(lambda: build_ivf_index(spark, e, ivf, models=models)),
        )
        emit(
            "ivf_append_fixed", factor, n_rows,
            _t(lambda: append_ivf_index(spark, fixed_add, ivf, batch_id="sa")),
        )
        emit(
            "ivf_delete_fixed", factor, n_rows,
            _t(lambda: delete_from_ivf_index(spark, del_e, ivf, batch_id="sd")),
        )
        emit(
            "ivf_upsert_fixed", factor, n_rows,
            _t(
                lambda: upsert_ivf_index(
                    spark,
                    fixed_add,
                    fixed_add.withColumn(
                        "embedding",
                        F.transform("embedding", lambda x: x * F.lit(0.5)),
                    ),
                    ivf,
                    batch_id="su",
                )
            ),
        )
        emit(
            "ivf_pit_read", factor, n_rows,
            _t(lambda: read_ivf_codes_at(spark, ivf, "sd").count()),
        )
        emit(
            "ivf_live_read", factor, n_rows,
            _t(lambda: read_ivf_codes(spark, ivf).count()),
        )
        emit(
            "ivf_compact", factor, n_rows,
            _t(lambda: compact_ivf_codes(spark, ivf)),
        )
        emit(
            "ivf_rebuild", factor, n_rows,
            _t(lambda: rebuild_ivf_index(spark, e, ivf)),
        )
        # Shard-parallel build + merge (operators/index_merge.py): the
        # two shard builds are the already-measured O(corpus) cost
        # split in half (and embarrassingly parallel on a cluster);
        # what the curve pins is the MERGE step — expected to grow
        # O(index rows) like compaction (it rewrites the codes union)
        # and to stay well under a build at every scale (no model fit,
        # no encode, no corpus-text scan).
        from newspapers_etl_spark.operators.index_merge import (
            merge_bm25_indexes,
            merge_ivf_indexes,
        )

        ia, ib, im = f"{root}/ivf-a", f"{root}/ivf-b", f"{root}/ivf-m"
        build_ivf_index(spark, e.filter("vec_id % 2 = 0"), ia, models=models)
        build_ivf_index(spark, e.filter("vec_id % 2 = 1"), ib, models=models)
        emit(
            "ivf_merge", factor, n_rows,
            _t(lambda: merge_ivf_indexes(spark, [ia, ib], im)),
        )

        emit(
            "bm25_build", factor, n_rows,
            _t(lambda: write_bm25_postings(spark, None, bm, docs=d)),
        )
        ba, bb, bmm = f"{root}/bm-a", f"{root}/bm-b", f"{root}/bm-m"
        write_bm25_postings(
            spark, None, ba, docs=d.filter("doc_id % 2 = 0")
        )
        write_bm25_postings(
            spark, None, bb, docs=d.filter("doc_id % 2 = 1")
        )
        emit(
            "bm25_merge", factor, n_rows,
            _t(lambda: merge_bm25_indexes(spark, [ba, bb], bmm)),
        )
        emit(
            "bm25_append_fixed", factor, n_rows,
            _t(
                lambda: append_bm25_postings(
                    spark, None, bm, batch_id="sa", docs=fixed_docs
                )
            ),
        )
        emit(
            "bm25_delete_fixed", factor, n_rows,
            _t(lambda: delete_bm25_docs(spark, del_d, bm, batch_id="sd")),
        )
        emit(
            "bm25_topk_read", factor, n_rows,
            _t(
                lambda: retrieval_bm25_topk_from_postings(spark, bm).count()
            ),
        )
        emit(
            "bm25_policy_monitor", factor, n_rows,
            # The steady-state stage: frag metric from stats + bounded
            # tombstone counts (the alert fires on this fixture, so the
            # gated dead-scan runs too — still bounded by the posting
            # relation, not the corpus text).
            _t(lambda: bm25_policy_chain(spark, bm).collect()),
        )
        emit(
            "bm25_compact", factor, n_rows,
            _t(lambda: compact_bm25_postings(spark, bm)),
        )

        e.unpersist()
        d.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
