"""The r9 PPM (P6) image codec: the SECOND modality through the
multimodal decoder slots (r8 verdict #5 — WAV proved audio; this proves
the slot codec-generic), with planted byte-level ground truth.

The oracled extra ``q_multimodal_ppm_framesample`` checks the frame
TABLE (offsets/sizes through the header layout) against DuckDB; these
tests pin what SQL can't: the decoded frame BYTES and their md5s, the
header fields surfaced through the ``meta`` decoder, parser robustness
on non-canonical-but-valid header layouts (comments, multi-whitespace,
2-byte samples), and loud failure on malformed payloads.
"""

from __future__ import annotations

import hashlib

import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.multimodal import (
    make_ppm_tools,
)

TOOLS = make_ppm_tools(rows_per_frame=2)


def test_encode_decode_roundtrip_bytes_exact():
    w, h = 3, 5  # 3px rows of 9 bytes, 5 rows, 2 rows/frame -> 3 frames
    raster = bytes((i * 11) % 256 for i in range(w * h * 3))
    payload = TOOLS["encode"](raster, w, h)

    assert payload[:2] == b"P6"
    meta = TOOLS["meta"](payload, "image/x-portable-pixmap")
    assert meta == {"width": 3, "height": 5, "maxval": 255, "n_pixels": 15}

    frames = TOOLS["frames"](payload, "image/x-portable-pixmap")
    # 5 rows / 2 per frame -> 3 frames (2, 2, 1 rows); row = 9 bytes
    assert [len(f) for f in frames] == [18, 18, 9]
    # byte-exact: frames are consecutive scanline windows of the raster
    assert b"".join(frames) == raster
    # md5 ground truth per frame (what FRAME_SCHEMA's frame_md5 carries)
    assert [hashlib.md5(f).hexdigest() for f in frames] == [
        hashlib.md5(raster[o : o + 18]).hexdigest() for o in (0, 18, 36)
    ]


def test_parser_handles_real_pnm_header_grammar():
    """Comments and arbitrary whitespace between header tokens are legal
    PNM — the raster offset must come from parsing the grammar, never
    from assuming the canonical 2-line layout. Raster bytes that LOOK
    like whitespace must survive (only ONE byte is consumed after
    maxval)."""
    w, h = 2, 2
    raster = b"\n\n \t" + bytes(range(8))  # leading whitespace-valued pixels
    payload = (
        b"P6 # a comment after the magic\n"
        b"# a full-line comment\n"
        b"  2\t\t2 # trailing comment\n 255\n" + raster
    )
    assert TOOLS["meta"](payload, "image/x-portable-pixmap")["n_pixels"] == 4
    assert b"".join(TOOLS["frames"](payload, "image/x-portable-pixmap")) == raster
    assert w * h * 3 == len(raster)


def test_parser_reads_two_byte_samples_past_255():
    """maxval >= 256 means 2-byte samples: the raster size doubles and
    the scanline math must follow (a 1-byte assumption would split
    frames mid-pixel)."""
    w, h = 2, 3
    raster = bytes((i * 7) % 256 for i in range(w * h * 3 * 2))
    payload = TOOLS["encode"](raster, w, h, maxval=1023)
    meta = TOOLS["meta"](payload, "image/x-portable-pixmap")
    assert meta["maxval"] == 1023
    frames = TOOLS["frames"](payload, "image/x-portable-pixmap")
    # row = 2*3*2 = 12 bytes; 3 rows / 2 per frame -> frames of 2,1 rows
    assert [len(f) for f in frames] == [24, 12]
    assert b"".join(frames) == raster


@pytest.mark.parametrize(
    "payload, msg",
    [
        (b"P5\n2 2\n255\n" + bytes(12), "not a P6"),
        (b"P6\n2 2\n", "truncated or non-numeric"),
        (b"P6\nx 2\n255\n" + bytes(12), "truncated or non-numeric"),
        (b"P6\n# comment never ends", "truncated header comment"),
        (b"P6\n2 2\n255", "missing whitespace after maxval"),
        (b"P6\n0 2\n255\n", "degenerate dimensions"),
        (b"P6\n2 0\n255\n", "degenerate dimensions"),
        (b"P6\n2 2\n0\n" + bytes(12), "unsupported maxval"),
        (b"P6\n2 2\n99999\n" + bytes(48), "unsupported maxval"),
        (b"P6\n4 4\n255\n" + bytes(10), "raster overruns payload"),
        # digits adjacent to the magic must not be absorbed into the
        # width (PNM requires whitespace after "P6" — r10 advice fix)
        (b"P62 2\n255\n" + bytes(12), "missing whitespace after P6 magic"),
        (b"P6", "missing whitespace after P6 magic"),
    ],
)
def test_malformed_payloads_fail_loud(payload, msg):
    with pytest.raises(ValueError, match=msg):
        TOOLS["frames"](payload, "image/x-portable-pixmap")


def test_encode_validates_raster_length():
    with pytest.raises(ValueError, match="header says"):
        TOOLS["encode"](bytes(10), 2, 2)


def test_ppm_framesample_end_to_end_md5(spark):
    """The full Spark path (planted payloads -> mapInPandas decode ->
    frame rows) must carry byte-ground-truth md5s: recompute every
    kept frame's bytes in plain Python and compare hashes."""
    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.multimodal import (
        sample_frames,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.multimodal_queries import (
        PPM_RPF,
        PPM_STRIDE,
    )

    sf = "/root/testdata/sf0.001"
    tools = make_ppm_tools(rows_per_frame=PPM_RPF)
    encode, frames = tools["encode"], tools["frames"]

    doc_ids = [
        r.doc_id
        for r in load_table(spark, sf, "documents")
        .select("doc_id")
        .limit(50)
        .collect()
    ]

    def plant(d: int) -> bytes:
        w, h = 3 + d % 5, 4 + d % 7
        return encode(
            bytes((d * 31 + i * 7) % 256 for i in range(w * h * 3)), w, h
        )

    want = {}
    for d in doc_ids:
        for fid, chunk in enumerate(frames(plant(d), "image/x-portable-pixmap")):
            if fid % PPM_STRIDE == 0:
                want[(d, fid)] = hashlib.md5(chunk).hexdigest()

    def build(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                [
                    (int(d), plant(int(d)), {"mime": "image/x-portable-pixmap"})
                    for d in pdf["doc_id"]
                ],
                columns=["doc_id", "payload", "meta"],
            )

    bin_df = (
        load_table(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id").isin(doc_ids))
        .mapInPandas(build, "doc_id long, payload binary, meta struct<mime:string>")
    )
    got = {
        (r.doc_id, r.frame_id): r.frame_md5
        for r in sample_frames(
            bin_df, frame_decoder=frames, stride=PPM_STRIDE
        ).collect()
    }
    assert got == want and len(want) > 50
