"""The r8 WAV codec: a real RIFF/PCM16 parser through the multimodal
decoder slots, with planted byte-level ground truth.

The oracled extra ``q_multimodal_wav_framesample`` checks the frame
TABLE (offsets/sizes through the header layout) against DuckDB; these
tests pin what SQL can't: the decoded frame BYTES and their md5s, the
header fields surfaced through the ``extract_features`` decoder slot,
parser robustness on non-canonical-but-valid layouts (extra chunks
before ``data``), and loud failure on malformed payloads.
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.multimodal import (
    make_wav_tools,
)

TOOLS = make_wav_tools(samples_per_frame=4)


def test_encode_decode_roundtrip_bytes_exact():
    samples = [0, 1, -1, 32767, -32768, 1000, -999, 7, 8, 9]  # 10 samples
    payload = TOOLS["encode"](samples, sample_rate=8000, channels=2)

    # planted header facts
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    meta = TOOLS["meta"](payload, "audio/wav")
    assert meta == {
        "channels": 2,
        "sample_rate": 8000,
        "n_samples": 10,
        "duration_ms": 1,
    }

    frames = TOOLS["frames"](payload, "audio/wav")
    # 10 samples / 4 per frame -> 3 frames (4, 4, 2 samples)
    assert [len(f) for f in frames] == [16, 16, 8]  # block_align = 4
    # byte-exact: each sample duplicated per channel, little-endian
    expect = b"".join(struct.pack("<h", s) * 2 for s in samples)
    assert b"".join(frames) == expect
    # md5 ground truth per frame (what FRAME_SCHEMA's frame_md5 carries)
    assert [hashlib.md5(f).hexdigest() for f in frames] == [
        hashlib.md5(expect[i : i + 16]).hexdigest() for i in (0, 16, 32)
    ]


def test_parser_walks_chunk_list_not_fixed_offsets():
    """A LIST chunk between fmt and data (real-world WAVs carry INFO
    metadata there) must not break the parse — the data offset comes
    from walking chunks, never from assuming byte 44."""
    samples = [5, -5, 6]
    canonical = TOOLS["encode"](samples, 44100, 1)
    fmt_chunk = canonical[12:36]  # 'fmt ' + size + 16 bytes
    data_chunk = canonical[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(extra) + len(data_chunk))
        + b"WAVE"
        + fmt_chunk
        + extra
        + data_chunk
    )
    assert TOOLS["meta"](payload, "audio/wav")["n_samples"] == 3
    assert b"".join(TOOLS["frames"](payload, "audio/wav")) == b"".join(
        struct.pack("<h", s) for s in samples
    )


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda p: p[:8], "not a RIFF"),
        (lambda p: b"RIFX" + p[4:], "not a RIFF"),
        (lambda p: p[:30], "truncated fmt"),
        # audio_format flipped to 3 (IEEE float): unsupported
        (lambda p: p[:20] + b"\x03\x00" + p[22:], "unsupported WAV"),
        # channels=0 with matching block_align=0: must be ValueError,
        # never a ZeroDivisionError from frames()/meta()
        (
            lambda p: p[:22] + b"\x00\x00" + p[24:32] + b"\x00\x00" + p[34:],
            "degenerate fmt",
        ),
        # sample_rate=0
        (lambda p: p[:24] + b"\x00\x00\x00\x00" + p[28:], "degenerate fmt"),
        # data size says more bytes than the payload holds
        (
            lambda p: p[:40] + struct.pack("<I", 10_000) + p[44:],
            "overruns payload",
        ),
    ],
)
def test_malformed_payloads_fail_loud(mangle, msg):
    payload = TOOLS["encode"]([1, 2, 3, 4], 8000, 1)
    with pytest.raises(ValueError, match=msg):
        TOOLS["frames"](mangle(payload), "audio/wav")


def test_wav_framesample_end_to_end_md5(spark):
    """The full Spark path (planted payloads -> mapInPandas decode ->
    frame rows) must carry byte-ground-truth md5s: recompute every
    kept frame's bytes in plain Python and compare hashes."""
    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.multimodal import (
        sample_frames,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.multimodal_queries import (
        WAV_SPF,
        WAV_STRIDE,
    )

    sf = "/root/testdata/sf0.001"
    tools = make_wav_tools(samples_per_frame=WAV_SPF)
    encode, frames = tools["encode"], tools["frames"]

    doc_ids = [
        r.doc_id
        for r in load_table(spark, sf, "documents")
        .select("doc_id")
        .limit(50)
        .collect()
    ]

    def plant(d: int) -> bytes:
        return encode(
            [((d * 31 + i * 7) % 65536) - 32768 for i in range(50 + d % 40)],
            8000 + 1000 * (d % 3),
            1 + d % 2,
        )

    want = {}
    for d in doc_ids:
        for fid, chunk in enumerate(frames(plant(d), "audio/wav")):
            if fid % WAV_STRIDE == 0:
                want[(d, fid)] = hashlib.md5(chunk).hexdigest()

    def build(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                [
                    (int(d), plant(int(d)), {"mime": "audio/wav"})
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
            bin_df, frame_decoder=frames, stride=WAV_STRIDE
        ).collect()
    }
    assert got == want and len(want) > 100
