"""WAV construct/parse (operators/multimodal.py): the engine-built
headers must be readable by an INDEPENDENT decoder (CPython's stdlib
``wave``), and the fixed-offset column parser must invert make_wav."""

from __future__ import annotations

import io
import wave

from pyspark.sql import functions as F

from etlutil_spark.operators.multimodal import make_wav, wav_header_fields

CASES = [
    (16000, 1, 16, 16000),      # 1s mono 16k
    (44100, 2, 16, 441000),     # 10s stereo CD
    (22050, 1, 8, 11025),       # 0.5s 8-bit
]


def _payloads(spark):
    df = spark.createDataFrame(CASES, "sr long, ch long, bits long, ns long")
    return df.select(
        "sr", "ch", "bits", "ns",
        make_wav(F.col("sr"), F.col("ch"), F.col("bits"), F.col("ns")).alias(
            "payload"
        ),
    )


class TestWav:
    def test_stdlib_wave_reads_our_headers(self, spark):
        """The independent check: CPython's wave module (not our code)
        must agree on every parameter of every constructed payload."""
        for r in _payloads(spark).collect():
            w = wave.open(io.BytesIO(bytes(r["payload"])))
            assert w.getframerate() == r["sr"]
            assert w.getnchannels() == r["ch"]
            assert w.getsampwidth() == r["bits"] // 8
            assert w.getnframes() == r["ns"]

    def test_column_parser_inverts_constructor(self, spark):
        p = _payloads(spark)
        fields = wav_header_fields(F.col("payload"))
        back = p.select(
            "sr", "ch", "bits", "ns",
            *[c.alias(n) for n, c in fields.items()],
        )
        for r in back.collect():
            assert r["sample_rate"] == r["sr"]
            assert r["n_channels"] == r["ch"]
            assert r["bits_per_sample"] == r["bits"]
            assert r["n_samples"] == r["ns"]

    def test_non_canonical_riff_layouts_yield_nulls(self, spark):
        """ADVICE r8: a RIFF/WAVE container that is NOT the canonical
        44-byte PCM layout must NULL out (routing it to the Python
        chunk walker), never emit garbage read from shifted offsets."""
        import struct

        def riff(fmt_tag=1, fmt_size=16, list_chunk=False):
            fmt_body = struct.pack(
                "<HHIIHH", fmt_tag, 1, 16000, 32000, 2, 16
            ) + b"\x00" * (fmt_size - 16)
            body = b"fmt " + struct.pack("<I", fmt_size) + fmt_body
            if list_chunk:
                body += b"LIST" + struct.pack("<I", 4) + b"INFO"
            body += b"data" + struct.pack("<I", 32000)
            return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

        cases = [
            ("float_fmt", riff(fmt_tag=3)),          # IEEE-float, not PCM
            ("extensible", riff(fmt_size=18)),       # cbSize-bearing fmt
            ("list_chunk", riff(list_chunk=True)),   # LIST between fmt+data
        ]
        df = spark.createDataFrame(cases, "name string, payload binary")
        fields = wav_header_fields(F.col("payload"))
        for r in df.select(
            "name", *[c.alias(n) for n, c in fields.items()]
        ).collect():
            for n in ("sample_rate", "n_channels", "bits_per_sample", "n_samples"):
                assert r[n] is None, (r["name"], n, r[n])

    def test_non_wav_payload_yields_nulls(self, spark):
        from etlutil_spark.operators.multimodal import make_png

        df = spark.createDataFrame([(1,)], "id int").select(
            make_png(F.lit(32), F.lit(32)).alias("payload")
        )
        fields = wav_header_fields(F.col("payload"))
        r = df.select(*[c.alias(n) for n, c in fields.items()]).collect()[0]
        assert all(r[n] is None for n in
                   ("sample_rate", "n_channels", "bits_per_sample", "n_samples"))


class TestFlac:
    """make_flac / flac_streaminfo_fields (r9): the big-endian
    bit-packed STREAMINFO roundtrip, independently verified by raw
    Python bit arithmetic (no FLAC library exists in this container;
    the packed-field layout is re-derived from bytes, not from the
    code under test)."""

    CASES = [
        (44100, 2, 16, 441000),
        (16000, 1, 24, 2**33 + 5),   # exercises the 36-bit sample count
        (96000, 8, 32, 12345),
    ]

    def _payloads(self, spark):
        from etlutil_spark.operators.multimodal import make_flac

        df = spark.createDataFrame(
            self.CASES, "sr long, ch long, bits long, ns long"
        )
        return df.select(
            "sr", "ch", "bits", "ns",
            make_flac(
                F.col("sr"), F.col("ch"), F.col("bits"), F.col("ns")
            ).alias("payload"),
        )

    def test_parser_inverts_constructor(self, spark):
        from etlutil_spark.operators.multimodal import flac_streaminfo_fields

        f = flac_streaminfo_fields(F.col("payload"))
        for r in self._payloads(spark).select(
            "sr", "ch", "bits", "ns", *[c.alias(n) for n, c in f.items()]
        ).collect():
            assert r["sample_rate"] == r["sr"]
            assert r["n_channels"] == r["ch"]
            assert r["bits_per_sample"] == r["bits"]
            assert r["n_samples"] == r["ns"]

    def test_independent_bit_layout(self, spark):
        for r in self._payloads(spark).collect():
            b = bytes(r["payload"])
            assert b[:4] == b"fLaC"
            assert b[4] == 0x80 and b[5:8] == b"\x00\x00\x22"
            packed = int.from_bytes(b[18:26], "big")
            assert packed >> 44 == r["sr"]
            assert ((packed >> 41) & 7) + 1 == r["ch"]
            assert ((packed >> 36) & 31) + 1 == r["bits"]
            assert packed & ((1 << 36) - 1) == r["ns"]

    def test_non_flac_payloads_yield_nulls(self, spark):
        from etlutil_spark.operators.multimodal import (
            flac_streaminfo_fields,
            make_png,
        )

        df = spark.createDataFrame([(1,)], "id int").select(
            make_png(F.lit(4), F.lit(4)).alias("payload")
        )
        f = flac_streaminfo_fields(F.col("payload"))
        r = df.select(*[c.alias(n) for n, c in f.items()]).collect()[0]
        assert all(v is None for v in r.asDict().values())

    def test_non_streaminfo_first_block_yields_nulls(self, spark):
        """A fLaC container whose first block is PADDING (type 1) or a
        wrong-length STREAMINFO must NULL out, not parse garbage."""
        from etlutil_spark.operators.multimodal import flac_streaminfo_fields

        padding_first = b"fLaC" + bytes([0x81]) + b"\x00\x00\x22" + b"\x00" * 34
        short_info = b"fLaC" + bytes([0x80]) + b"\x00\x00\x10" + b"\x00" * 16
        df = spark.createDataFrame(
            [("padding", padding_first), ("short", short_info)],
            "name string, payload binary",
        )
        f = flac_streaminfo_fields(F.col("payload"))
        for r in df.select(
            "name", *[c.alias(n) for n, c in f.items()]
        ).collect():
            for n in ("sample_rate", "n_channels", "bits_per_sample", "n_samples"):
                assert r[n] is None, (r["name"], n)
