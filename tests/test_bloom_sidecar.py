"""Bloom sidecars (r14): the bulk-probe prefilter's one correctness
obligation is NO FALSE NEGATIVES — every value built into a bloom must
test as present through the same closures — plus sane sizing,
saturation capping, versioned persistence, and the distributed
builder agreeing with a local build."""

from __future__ import annotations

import numpy as np
import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
    bloom_sidecar as B,
)


def test_no_false_negatives_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tools = B.make_bloom_tools()

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.text(min_size=0, max_size=12), max_size=60),
        st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=20),
    )
    def check(members, probes):
        m = tools["bits_for"](len(members))
        bits = tools["build"](np.array(members, dtype=object), m)
        # every member tests present — the exactness invariant
        got = tools["contains"](bits, np.array(members, dtype=object))
        assert bool(got.all()) or not members
        # absent probes MAY false-positive but never crash; a miss is
        # definitive by construction (checked via the member set)
        hits = tools["contains"](bits, np.array(probes, dtype=object))
        for p, h in zip(probes, hits):
            if p in set(members):
                assert h
    check()


def test_fpp_is_in_the_advertised_ballpark():
    tools = B.make_bloom_tools()
    members = np.array([f"m{i}" for i in range(20_000)], dtype=object)
    absent = np.array([f"x{i}" for i in range(50_000)], dtype=object)
    bits = tools["build"](members, tools["bits_for"](len(members)))
    fpp = tools["contains"](bits, absent).mean()
    assert fpp < 0.01, fpp  # target ~0.2%, assert with 5x margin


def test_sizing_floors_and_caps():
    tools = B.make_bloom_tools()
    assert tools["bits_for"](0) == 64
    assert tools["bits_for"](1) == 64
    assert tools["bits_for"](10**9) == B.MAX_BLOOM_BITS
    m = tools["bits_for"](1000)
    assert m % 64 == 0 and m >= 1000 * B.BITS_PER_VALUE


def test_sidecar_roundtrip_and_version_gate(tmp_path):
    tools = B.make_bloom_tools()
    d = str(tmp_path / "batch=x")
    import os

    os.makedirs(d)
    assert B.load_sidecar(d) is None  # legacy dir: no sidecar
    vals = np.array(["a", "b", "c"], dtype=object)
    blooms = {0: tools["build"](vals, 64), 3: tools["build"](vals, 128)}
    B.save_sidecar(d, blooms)
    back = B.load_sidecar(d)
    assert set(back) == {0, 3}
    for b in back:
        assert (back[b] == blooms[b]).all()
    # incompatible parameters refuse to load (probe falls back to the
    # exact floor instead of testing against foreign hash geometry)
    np.savez(
        os.path.join(d, B.SIDECAR_NAME),
        __version__=np.int64(B.SIDECAR_VERSION),
        __k__=np.int64(B.K_HASHES + 1),
        b0=blooms[0],
    )
    assert B.load_sidecar(d) is None


def test_distributed_builder_matches_local_build(spark, tmp_path):
    """build_dir_blooms' two-pass partial-OR fold must produce exactly
    the bits a single local build over the same values produces —
    OR-folding partials is only correct because set-bit positions
    depend on the value alone, pinned here."""
    from pyspark.sql import functions as F

    tools = B.make_bloom_tools()
    out = str(tmp_path / "d")
    df = spark.range(500).select(
        (F.col("id") % 4).cast("int").alias("b"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    df.repartition(8).write.partitionBy("b").parquet(out)
    got = B.build_dir_blooms(spark, out, "b", "v")
    assert set(got) == {0, 1, 2, 3}
    for b in got:
        vals = np.array(
            [f"v{i}" for i in range(500) if i % 4 == b], dtype=object
        )
        want = tools["build"](vals, tools["bits_for"](len(vals)))
        assert (got[b] == want).all()
