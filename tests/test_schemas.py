"""Declared-schema validation: catalog.SCHEMAS must match the parquet
footers exactly (name + type, per field, in order) so the declarations
documented in catalog.py are live, not dead (ADVICE r1)."""

from __future__ import annotations

import pytest

from newspapers_etl_spark.catalog import SCHEMAS, TABLES, load_table


@pytest.mark.parametrize("name", TABLES)
def test_declared_schema_matches_parquet_footer(spark, sf_dir, name):
    actual = load_table(spark, sf_dir, name).schema
    declared = SCHEMAS[name]
    got = [(f.name, f.dataType.simpleString()) for f in actual.fields]
    want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
    assert got == want, f"{name}: parquet footer {got} != declared {want}"


def test_csv_audit_quarantines_corrupt_rows(spark, tmp_path):
    """PERMISSIVE CSV under a declared schema: malformed lines land in
    _corrupt_record with their original text, good rows parse, and the
    audit counts both — nothing is dropped silently and nothing kills
    the job."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from newspapers_etl_spark.sources.text_formats import (
        CORRUPT_COL,
        csv_parse_audit,
        read_csv_with_audit,
    )

    p = tmp_path / "dump.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,10\n"
        "2,beta,not_a_number\n"   # type violation -> corrupt
        "3,gamma,30\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.IntegerType()),
        ]
    )
    df = read_csv_with_audit(spark, str(p), schema)
    audit = csv_parse_audit(df).first()
    assert (audit["n_rows"], audit["n_parsed"], audit["n_corrupt"]) == (3, 2, 1)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and "not_a_number" in bad[0][CORRUPT_COL]
    good = {r.id: r.score for r in df.filter(F.col(CORRUPT_COL).isNull()).collect()}
    assert good == {1: 10, 3: 30}
    df.unpersist()


def test_jsonl_audit_quarantines_malformed_lines(spark, tmp_path):
    """PERMISSIVE JSONL under a declared schema: a broken line and a
    type-violating line both land in _corrupt_record; valid docs parse
    with text intact (including embedded quotes/newlines)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from newspapers_etl_spark.sources.text_formats import (
        CORRUPT_COL,
        csv_parse_audit,
        read_jsonl_with_audit,
    )

    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "line one\\nline two \\"quoted\\""}\n'
        '{"doc_id": not_json\n'
        '{"doc_id": 3, "text": "ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = read_jsonl_with_audit(spark, str(p), schema)
    audit = csv_parse_audit(df).first()
    assert (audit["n_rows"], audit["n_parsed"], audit["n_corrupt"]) == (3, 2, 1)
    good = {r.doc_id: r.text for r in df.filter(F.col(CORRUPT_COL).isNull()).collect()}
    assert good == {1: 'line one\nline two "quoted"', 3: "ok"}
    df.unpersist()


def test_orc_roundtrip_pushes_filter_to_scan(spark, sf_dir):
    """The ORC source must behave like the parquet one at scale: the
    quantity predicate reaches the ORC scan as a PushedFilter (stripe
    min/max skipping), and the read projects only the referenced
    columns — never the full 16-column fact row."""
    from newspapers_etl_spark.sources.text_formats import orc_roundtrip_pushdown

    df = orc_roundtrip_pushdown(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln for ln in plan.splitlines() if "Scan orc" in ln or "FileScan orc" in ln
    ]
    assert scan, f"no ORC scan in plan:\n{plan[:2000]}"
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0], "quantity predicate not pushed to the ORC scan"
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_partkey" not in read_schema, (
        f"unreferenced column read from ORC: {read_schema}"
    )


def test_xml_roundtrip_preserves_hostile_text(spark, tmp_path):
    """Planted worst-case document bodies — entities, quotes, newlines,
    unicode, leading/trailing whitespace — must survive the XML
    encode/decode byte-exactly (the integrity property src_xml's md5
    witness checks statistically, pinned here on adversarial rows)."""
    from pyspark.sql import functions as F

    hostile = [
        (1, 'a & b < c > d "quoted" \'apos\''),
        (2, "line one\nline two\n\ttabbed"),
        (3, "  leading and trailing spaces  "),
        (4, "unicode: åäö 中文 🙂  nbsp"),
        (5, "]]> fake cdata terminator & <tag attr=\"x\"/>"),
    ]
    df = spark.createDataFrame(hostile, "doc_id long, text string")
    out = str(tmp_path / "xml")
    df.write.format("xml").option("rowTag", "doc").save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .schema("doc_id long, text string")
        .load(out)
    )
    got = {r.doc_id: r.text for r in back.collect()}
    want = dict(hostile)
    assert got == want, {
        k: (want[k], got.get(k)) for k in want if got.get(k) != want[k]
    }
