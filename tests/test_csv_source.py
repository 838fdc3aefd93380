"""CSV entity source: explicit schemas, bounded-sample inference,
corrupt-record quarantine, watermark pruning."""

from __future__ import annotations

import os
import time

from pyspark.sql import types as T

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.sources import csv_entity

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("id,name,amount\n")
        f.writelines(line + "\n" for line in lines)


def test_corrupt_records_quarantined(spark, tmp_path):
    p = str(tmp_path / "e" / "b1.csv")
    _write(p, ['1,ok,2.5', 'not_a_number,bad,xyz', '3,"quoted,name",4.0'])
    df = csv_entity.read_entity(spark, [p], schema=SCHEMA, capture_corrupt=True)
    clean, bad = csv_entity.split_corrupt(df)
    rows = {(r.id, r.name, r.amount) for r in clean.collect()}
    assert rows == {(1, "ok", 2.5), (3, "quoted,name", 4.0)}
    quarantined = [r._corrupt_record for r in bad.collect()]
    assert quarantined == ["not_a_number,bad,xyz"]


def test_bounded_schema_inference(spark, tmp_path):
    paths = []
    for i in range(6):
        p = str(tmp_path / "e" / f"b{i}.csv")
        _write(p, [f"{i},n{i},{i}.5"])
        paths.append(p)
    schema = csv_entity.infer_entity_schema(spark, paths, sample_files=2)
    assert [f.name for f in schema.fields] == ["id", "name", "amount"]
    assert isinstance(schema["amount"].dataType, T.DoubleType)


def test_prune_files_by_watermark(tmp_path):
    d = str(tmp_path / "e")
    t0 = time.time() - 100
    for i, off in enumerate([0, 10, 20]):
        p = os.path.join(d, f"b{i}.csv")
        _write(p, ["1,a,1.0"])
        os.utime(p, (t0 + off, t0 + off))
    files = csv_entity.list_entity_files(d)
    assert len(csv_entity.prune_files(files, None)) == 3
    assert len(csv_entity.prune_files(files, t0 + 5)) == 2
    assert len(csv_entity.prune_files(files, t0 + 20)) == 0


def test_jsonl_source_reads_quarantines_and_prunes_columns(spark, tmp_path):
    """JSONL document source: explicit-schema parse, corrupt-line
    quarantine (no silent row loss), typed nested metadata with struct
    field pruning reaching the scan."""
    import json as _json

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.sources import jsonl_docs

    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "source": "crawl", "lang": "en", "text": "hello world",
         "meta": {"url": "http://a", "fetched_at": "2024-01-01", "license": "cc"}},
        {"doc_id": 2, "source": "crawl", "lang": "de", "text": "hallo welt",
         "meta": {"url": "http://b", "fetched_at": "2024-01-02", "license": "mit"}},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write('{"doc_id": 3, "source": "crawl", BROKEN\n')  # corrupt line

    df = jsonl_docs.read_jsonl(spark, str(p))
    clean, bad = jsonl_docs.split_corrupt(df)
    assert clean.count() == 2
    assert bad.count() == 1
    assert "BROKEN" in bad.first()["_corrupt_record"]
    got = {(r.doc_id, r.text, r.meta.url) for r in clean.collect()}
    assert got == {(1, "hello world", "http://a"), (2, "hallo welt", "http://b")}

    # struct-field pruning: a doc_id+text projection must not read meta
    pruned = jsonl_docs.read_jsonl(spark, str(p), capture_corrupt=False).select(
        "doc_id", "text"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "meta" not in plan

    # round-trip into the Tier-B parquet layout
    out = str(tmp_path / "documents")
    jsonl_docs.write_documents_table(clean, out, buckets=2)
    back = spark.read.parquet(out)
    assert back.count() == 2 and "meta" in back.columns
