"""Physical training-shard export: file layout, in-file order,
completeness manifest, and split partition pruning."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.export import (
    MANIFEST_NAME,
    read_split,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def test_write_training_shards_layout_order_and_manifest(spark, tmp_path):
    out = str(tmp_path / "export")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    manifest = write_training_shards(docs, out, n_shards=4)

    # every (split=*/shard_id=*) dir holds exactly ONE parquet file
    dirs = glob.glob(os.path.join(out, "split=*", "shard_id=*"))
    assert len(dirs) > 0
    for d in dirs:
        assert sum(f.endswith(".parquet") for f in os.listdir(d)) == 1

    # all rows exported exactly once, manifest counts match the footers
    n_src = docs.count()
    assert manifest["n_rows"] == n_src
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        assert json.load(fh)["n_rows"] == n_src
    back = spark.read.parquet(out)
    assert back.count() == n_src
    assert back.select("doc_id").distinct().count() == n_src

    # rows inside each file are in seeded shuffle-key order
    for d in dirs:
        [f] = [f for f in os.listdir(d) if f.endswith(".parquet")]
        keys = pq.read_table(os.path.join(d, f), columns=["shuffle_key"])
        vals = keys["shuffle_key"].to_pylist()
        assert vals == sorted(vals)

    # rerun is byte-deterministic at the assignment level
    out2 = str(tmp_path / "export2")
    write_training_shards(docs.repartition(13), out2, n_shards=4)
    a = {tuple(r) for r in spark.read.parquet(out).collect()}
    b = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_read_split_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "export")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    write_training_shards(docs, out, n_shards=2)

    val = read_split(spark, out, "val")
    plan = val._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan
    # pruned scan reads only the val rows, and they match a full-scan filter
    full = spark.read.parquet(out).collect()
    want = {r.doc_id for r in full if r.split == "val"}
    assert {r.doc_id for r in val.collect()} == want and len(want) > 0


def test_write_training_shards_jsonl_matches_parquet(spark, tmp_path):
    """The jsonl export: same split/shard layout and manifest contract
    as parquet (counts from the bounded aggregate instead of footers),
    and the data round-trips through spark.read.json losslessly on the
    id set."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    pq_out, js_out = str(tmp_path / "pq"), str(tmp_path / "js")
    m_pq = write_training_shards(docs, pq_out)
    m_js = write_training_shards(docs, js_out, fmt="jsonl")

    assert m_js["fmt"] == "jsonl" and m_pq["fmt"] == "parquet"
    assert m_js["n_rows"] == m_pq["n_rows"] == docs.count()
    # identical (split, shard) -> count layout, format-independent
    def by_dir(man):
        return {
            tuple(p for p in f["path"].split("/") if "=" in p): f["n_rows"]
            for f in man["files"]
        }
    assert by_dir(m_js) == by_dir(m_pq)

    back = spark.read.json(js_out)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    import pytest

    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "bad"), fmt="csv")
