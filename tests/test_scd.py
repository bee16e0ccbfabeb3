"""SCD2 merge invariants: version chains close and open correctly,
re-delivery is a no-op, point-in-time queries see the right version."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from newspapers_etl_spark.operators.scd import scd2_as_of, scd2_init, scd2_merge

T0, T1, T2 = "2024-01-01", "2024-02-01", "2024-03-01"


def _hist0(spark):
    snap = spark.createDataFrame(
        [(1, "GOLD", 100.0), (2, "SILVER", 50.0), (3, "BRONZE", 10.0)],
        "custkey long, segment string, balance double",
    )
    return scd2_init(snap, F.lit(T0).cast("timestamp"))


def _updates(spark, rows):
    return spark.createDataFrame(rows, "custkey long, segment string, ts timestamp")


def test_merge_closes_and_opens_versions(spark):
    hist = _hist0(spark)
    upd = _updates(
        spark,
        [
            (1, "PLATINUM", datetime.fromisoformat(T1)),  # change
            (2, "SILVER", datetime.fromisoformat(T1)),    # identical → no-op
            (9, "NEW", datetime.fromisoformat(T1)),       # brand new key
        ],
    )
    merged = scd2_merge(hist, upd, "custkey", ["segment"])
    rows = {(r.custkey, r.segment, r.is_current): r for r in merged.collect()}

    assert merged.count() == 5  # 3 original (+1 closed variant) +1 new version +1 new key
    assert (1, "GOLD", False) in rows and (1, "PLATINUM", True) in rows
    closed = rows[(1, "GOLD", False)]
    opened = rows[(1, "PLATINUM", True)]
    assert str(closed.valid_to).startswith(T1) and str(opened.valid_from).startswith(T1)
    assert (2, "SILVER", True) in rows  # untouched
    assert (9, "NEW", True) in rows
    # exactly one current row per key
    cur = merged.filter("is_current").groupBy("custkey").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_duplicate_keys_in_batch_collapse_to_latest(spark):
    """A batch carrying several updates for the same key must merge as if
    only the latest row arrived — duplicates fanning out through the
    change-detection join would emit multiple closed and multiple open
    versions for one key."""
    hist = _hist0(spark)
    upd = _updates(
        spark,
        [
            (1, "PLATINUM", datetime.fromisoformat(T1)),
            (1, "DIAMOND", datetime.fromisoformat(T2)),  # later: must win
            (1, "PLATINUM", datetime.fromisoformat(T1)),  # exact dup row
        ],
    )
    merged = scd2_merge(hist, upd, "custkey", ["segment"])
    k1 = merged.filter("custkey = 1").collect()
    assert len(k1) == 2, f"expected one closed + one open row, got {len(k1)}"
    cur = [r for r in k1 if r.is_current]
    assert len(cur) == 1 and cur[0].segment == "DIAMOND"
    closed = [r for r in k1 if not r.is_current]
    assert len(closed) == 1 and str(closed[0].valid_to).startswith(T2)


def test_redelivery_is_noop_and_chains_extend(spark):
    hist = _hist0(spark)
    upd1 = _updates(spark, [(1, "PLATINUM", datetime.fromisoformat(T1))])
    h1 = scd2_merge(hist, upd1, "custkey", ["segment"])
    # re-deliver the same update: attribute-identical → nothing changes
    h1b = scd2_merge(h1, upd1, "custkey", ["segment"])
    assert h1b.count() == h1.count()
    # a second real change extends the chain
    upd2 = _updates(spark, [(1, "DIAMOND", datetime.fromisoformat(T2))])
    h2 = scd2_merge(h1, upd2, "custkey", ["segment"])
    versions = sorted(
        (str(r.valid_from), str(r.valid_to), r.segment)
        for r in h2.filter("custkey = 1").collect()
    )
    assert [v[2] for v in versions] == ["GOLD", "PLATINUM", "DIAMOND"]
    # point-in-time: mid-February sees PLATINUM, today sees DIAMOND
    feb = scd2_as_of(h2, F.lit("2024-02-15").cast("timestamp"))
    assert feb.filter("custkey = 1").first().segment == "PLATINUM"
    now = scd2_as_of(h2, F.lit("2024-06-01").cast("timestamp"))
    assert now.filter("custkey = 1").first().segment == "DIAMOND"


@pytest.mark.heavy
def test_five_sequential_batches_version_chains_and_pit(spark):
    """Depth test (cost-independence claim at scale needs the semantics
    to hold at depth): 5 sequential CDC batches build correct version
    chains — contiguous validity intervals, exactly one current row per
    key, and point-in-time answers correct at every probe between
    batches."""
    from datetime import datetime

    B = [f"2024-0{i}-01" for i in range(1, 7)]  # T0 + 5 batch timestamps

    hist = _hist0(spark)
    # key 1 churns every batch; key 2 on batches 2 and 4; key 3 never;
    # key 7 appears at batch 3 and churns at batch 5.
    plan = {
        1: {1: "G1", 2: "G2", 3: "G3", 4: "G4", 5: "G5"},
        2: {2: "S2", 4: "S4"},
        7: {3: "N0", 5: "N5"},
    }
    for b in range(1, 6):
        rows = [
            (k, seg, datetime.fromisoformat(B[b]))
            for k, batches in plan.items()
            for bb, seg in batches.items()
            if bb == b
        ]
        if rows:
            hist = scd2_merge(hist, _updates(spark, rows), "custkey", ["segment"])

    rows = hist.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)

    # chain lengths: 1 initial + one version per change
    assert len(by_key[1]) == 6
    assert len(by_key[2]) == 3
    assert len(by_key[3]) == 1
    assert len(by_key[7]) == 2

    for k, versions in by_key.items():
        versions.sort(key=lambda r: str(r.valid_from))
        # exactly one current, and it is the last version
        assert [r.is_current for r in versions] == [False] * (len(versions) - 1) + [True]
        # contiguous intervals: each close ts is the next open ts
        for a, b_ in zip(versions, versions[1:]):
            assert a.valid_to == b_.valid_from, (k, a, b_)
        assert str(versions[-1].valid_to).startswith("9999-12-31")

    # point-in-time sweep: mid-month probes between every pair of batches
    expect = {
        "2024-01-15": {1: "GOLD", 2: "SILVER", 3: "BRONZE"},
        "2024-02-15": {1: "G1", 2: "SILVER", 3: "BRONZE"},
        "2024-03-15": {1: "G2", 2: "S2", 3: "BRONZE"},
        "2024-04-15": {1: "G3", 2: "S2", 3: "BRONZE", 7: "N0"},
        "2024-05-15": {1: "G4", 2: "S4", 3: "BRONZE", 7: "N0"},
        "2024-06-15": {1: "G5", 2: "S4", 3: "BRONZE", 7: "N5"},
    }
    for probe, want in expect.items():
        got = {
            r.custkey: r.segment
            for r in scd2_as_of(hist, F.lit(probe).cast("timestamp")).collect()
        }
        assert got == want, f"as-of {probe}: {got} != {want}"
