"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus a typed metadata struct
(the lakehouse-standard layout). The Spark-side plumbing — schemas,
partition-friendly metadata extraction, Arrow-batched UDF signatures via
``mapInPandas`` — is real and tested; the actual codec work is STUBBED
(``decode_stub=True`` produces deterministic fake features;
``decode_stub=False`` raises NotImplementedError) because no media
libraries exist in this container. Swapping the stub for PIL/librosa/ffmpeg
changes only the inner function, not the Spark plan.

Design notes for 100 TB:
  - metadata (mime/size/hash) is computed with built-in expressions, so
    filtering "jpeg under 5 MB" never deserializes a single byte in Python;
  - the Pandas UDF stage is the ONLY Python hop, batched by Arrow;
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
    for fat blobs;
  - feature extraction emits fixed-size arrays -> downstream is the vector
    pipeline (similarity.py) unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, mime string, n_bytes bigint, sha256 string"
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = (
    "media_id bigint, mime string, n_bytes bigint, "
    f"features array<double>, decoder string"
)


def wrap_binary(
    df: DataFrame, id_col: str, payload_col: str, *, mime: str = "application/octet-stream"
) -> DataFrame:
    """Normalize any binary column into the canonical media layout.

    Metadata derives from built-ins (octet_length/sha2) — JVM-side, no UDF."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(payload_col).cast("binary")).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha256"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Per-mime size/count stats — metadata only, never touches payloads."""
    return df.groupBy("mime").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# Header-level image metadata — REAL, codec-free. Container formats carry
# their dimensions in the first bytes; parsing them needs no decoder, and
# it is what a lakehouse ingest actually does before deciding what to
# decode. Two tiers:
#   - PNG fixed-offset fields as pure column expressions (JVM, codegen,
#     DuckDB-oracle-able);
#   - a multi-format pure-Python parser (PNG/GIF/BMP + JPEG marker scan)
#     behind Arrow mapInPandas for formats whose headers need scanning.
# ---------------------------------------------------------------------------

PNG_SIG_HEX = "89504E470D0A1A0A"

_HEADER_SCHEMA = "media_id bigint, format string, width int, height int"


def _u16be_hex(col: "F.Column") -> "F.Column":
    # pmod guards the u16 range: lpad TRUNCATES a longer hex string
    # (keeping the high digits), which would silently corrupt the
    # header for out-of-range dims instead of wrapping predictably
    return F.lpad(F.hex(F.pmod(col.cast("bigint"), F.lit(65536))), 4, "0")


def _u32be_hex(col: "F.Column") -> "F.Column":
    return F.lpad(F.hex(col.cast("bigint")), 8, "0")


def _u16le_hex(col: "F.Column") -> "F.Column":
    h = _u16be_hex(col)
    return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))


def _u32le_hex(col: "F.Column") -> "F.Column":
    h = _u32be_hex(col)
    return F.concat(
        F.substring(h, 7, 2),
        F.substring(h, 5, 2),
        F.substring(h, 3, 2),
        F.substring(h, 1, 2),
    )


def make_png(width, height) -> "F.Column":
    """Minimal valid PNG prefix (signature + IHDR) with the given dims —
    pure expressions; used to build test/demo payloads engine-side."""
    return F.unhex(
        F.concat(
            F.lit(PNG_SIG_HEX + "0000000D49484452"),
            _u32be_hex(width),
            _u32be_hex(height),
            F.lit("0806000000"),
        )
    )


def make_gif(width, height) -> "F.Column":
    """GIF89a header. Dims wrap modulo 65536 (the format's u16 limit)."""
    return F.unhex(
        F.concat(
            F.lit("474946383961"),  # 'GIF89a'
            _u16le_hex(width),
            _u16le_hex(height),
            F.lit("F70000"),
        )
    )


def make_bmp(width, height) -> "F.Column":
    return F.unhex(
        F.concat(
            F.lit("424D" + "00" * 12 + "28000000"),  # 'BM', 18-byte preamble
            _u32le_hex(width),
            _u32le_hex(height),
            F.lit("0100180000000000"),
        )
    )


def make_jpeg(width, height) -> "F.Column":
    """FFD8 + APP0(JFIF) + SOF0 carrying the dims — exercises the marker
    scan (the SOF0 is NOT at a fixed offset in real files; the parser must
    walk segments)."""
    return F.unhex(
        F.concat(
            # APP0/JFIF: len 16 = len(2) + 'JFIF\\0'(5) + version(2)
            # + units(1) + density(4) + thumbnail(2)
            F.lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101"
                  + "00" + "0001" + "0001" + "0000"),
            F.lit("FFC0" + "0011" + "08"),
            _u16be_hex(height),
            _u16be_hex(width),
            F.lit("03012200021101031101"),
        )
    )


def png_dimensions(payload_col) -> tuple["F.Column", "F.Column"]:
    """(width, height) from a PNG payload's fixed-offset IHDR fields —
    pure column expressions (substring + hex + conv), NULL for non-PNG.
    The zero-Python fast path for the dominant format: at 100 TB, mime
    routing sends PNGs here and only scanning formats to the Python
    parser."""
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    is_png = F.hex(F.substring(c, 1, 8)) == PNG_SIG_HEX
    width = F.when(
        is_png, F.conv(F.hex(F.substring(c, 17, 4)), 16, 10).cast("int")
    )
    height = F.when(
        is_png, F.conv(F.hex(F.substring(c, 21, 4)), 16, 10).cast("int")
    )
    return width, height


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def parse_header_bytes(b: bytes | None) -> tuple[str, int | None, int | None]:
    """REAL container-header parser (no codec libraries): PNG/GIF/BMP at
    fixed offsets, JPEG via the marker walk (APPn/COM segments are
    skipped by their declared lengths until a start-of-frame marker
    carries the dimensions). Unknown/truncated payloads degrade to
    ('unknown', None, None) — never an exception, a corrupt blob must
    not kill the batch."""
    if not b:
        return ("unknown", None, None)
    if len(b) >= 24 and b[:8] == bytes.fromhex(PNG_SIG_HEX):
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if len(b) >= 26 and b[:2] == b"BM":
        return (
            "bmp",
            abs(int.from_bytes(b[18:22], "little", signed=True)),
            # height may be negative (top-down rows)
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:
                # legal fill byte: any number of 0xFF may pad before a
                # marker — skip one and re-read (treating the pad as a
                # marker would misread the next two bytes as a segment
                # length and derail the walk)
                i += 1
                continue
            if marker in _JPEG_SOF_MARKERS:
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                break
            i += 2 + seg_len
        return ("jpeg", None, None)
    return ("unknown", None, None)


def parse_media_headers(df: DataFrame) -> DataFrame:
    """Arrow-batched header parse over media payloads: (media_id, format,
    width, height). This is NOT a stub — the parser reads real container
    headers; it simply never decodes pixel data, so it needs no codec
    and touches only the first bytes of each blob."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            parsed = [parse_header_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [p[0] for p in parsed],
                    "width": pd.array(
                        [p[1] for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] for p in parsed], dtype="Int32"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema=_HEADER_SCHEMA
    )


def _stub_features(payload: bytes | None) -> list[float]:
    """Deterministic fake embedding: byte histogram folded to FEATURE_DIM."""
    buckets = [0] * FEATURE_DIM
    if payload:
        for i, b in enumerate(payload[:4096]):
            buckets[b % FEATURE_DIM] += 1
        total = sum(buckets) or 1
        return [round(c / total, 6) for c in buckets]
    return [0.0] * FEATURE_DIM


def extract_features(
    df: DataFrame, *, decode_stub: bool = True, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    decoder runs per-row inside the batch. With ``decode_stub=False`` this
    raises NotImplementedError where a real codec (PIL/librosa/decord)
    would decode — the Spark plumbing around it is production-shaped."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if decode_stub:
                    feats.append(_stub_features(payload))
                else:
                    raise NotImplementedError(
                        "real media decoding requires codec libraries "
                        "(PIL/librosa/ffmpeg) not present in this environment"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                    "decoder": "stub" if decode_stub else "real",
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing demo: emit (media_id, frame_idx, offset)
    rows for evenly spaced offsets — pure expressions (posexplode over a
    sequence), mirroring how video frame-sample fan-out is planned without
    decoding anything."""
    n_frames = F.least(
        F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return df.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).cast("bigint").alias("byte_offset"),
    )


_RESIZE_SCHEMA = (
    "media_id bigint, payload binary, mime string, n_bytes bigint, "
    "width int, height int, decoder string"
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    *,
    decode_stub: bool = True,
) -> DataFrame:
    """Arrow-batched media resize: binary in -> binary out with new
    dimension metadata. The production shape for image normalization ahead
    of feature extraction — payloads stay in the Arrow stream end to end,
    never widening into Python objects row-by-row.

    ``decode_stub=True`` produces a deterministic fake: the payload is
    hashed-and-tiled to ``3 * width * height`` bytes (a plausible RGB
    buffer size), so downstream size/metadata logic is fully testable;
    ``decode_stub=False`` raises NotImplementedError where PIL/ffmpeg
    would decode-resize-encode. Swapping the stub changes only the inner
    function — schema, batching, and plan are identical."""
    if width <= 0 or height <= 0:
        raise ValueError(f"width/height must be positive, got {width}x{height}")
    if not decode_stub:
        # fail fast on the driver — not per-row inside an executor closure
        # after a job has already launched
        raise NotImplementedError(
            "real media resizing requires codec libraries (PIL/ffmpeg) "
            "not present in this environment"
        )
    target = 3 * width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        def fake_resize(payload: bytes | None) -> bytes:
            seed = hashlib.sha256(payload or b"").digest()
            reps = target // len(seed) + 1
            return (seed * reps)[:target]

        for pdf in batches:
            out = [fake_resize(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    # the payload is a hashed stub buffer, not a re-encoded
                    # image — advertising the input mime would be lying to
                    # downstream consumers
                    "mime": "application/x-stub",
                    "n_bytes": [len(p) for p in out],
                    "width": width,
                    "height": height,
                    "decoder": "stub",
                }
            )

    return df.mapInPandas(run, schema=_RESIZE_SCHEMA)


def make_wav(sample_rate, n_channels, bits, n_samples) -> "F.Column":
    """Canonical 44-byte RIFF/WAVE PCM header with the given audio
    parameters — pure expressions, the audio sibling of make_png. The
    data body is omitted (header-only blob): every consumer here is a
    decode-free metadata pass, exactly like the image constructors.
    Validated against CPython's stdlib ``wave`` reader in
    tests/test_multimodal_audio.py."""
    sr = sample_rate if isinstance(sample_rate, F.Column) else F.lit(sample_rate)
    ch = n_channels if isinstance(n_channels, F.Column) else F.lit(n_channels)
    bt = bits if isinstance(bits, F.Column) else F.lit(bits)
    ns = n_samples if isinstance(n_samples, F.Column) else F.lit(n_samples)
    block_align = ch * bt / F.lit(8)
    data_size = (ns * ch * bt / F.lit(8)).cast("bigint")
    return F.unhex(
        F.concat(
            F.lit("52494646"),                      # 'RIFF'
            _u32le_hex(data_size + F.lit(36)),      # chunk size
            F.lit("57415645" + "666D7420"),         # 'WAVE' 'fmt '
            F.lit("10000000" + "0100"),             # fmt len 16, PCM
            _u16le_hex(ch),
            _u32le_hex(sr),
            _u32le_hex((sr * ch * bt / F.lit(8)).cast("bigint")),  # byte rate
            _u16le_hex(block_align.cast("bigint")),
            _u16le_hex(bt),
            F.lit("64617461"),                      # 'data'
            _u32le_hex(data_size),
        )
    )


def _u16le_parse(payload: "F.Column", pos: int) -> "F.Column":
    h = F.hex(F.substring(payload, pos, 2))
    return F.conv(
        F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), 16, 10
    ).cast("bigint")


def _u32le_parse(payload: "F.Column", pos: int) -> "F.Column":
    h = F.hex(F.substring(payload, pos, 4))
    return F.conv(
        F.concat(
            F.substring(h, 7, 2),
            F.substring(h, 5, 2),
            F.substring(h, 3, 2),
            F.substring(h, 1, 2),
        ),
        16,
        10,
    ).cast("bigint")


def wav_header_fields(payload: "F.Column") -> dict[str, "F.Column"]:
    """Parse a CANONICAL 44-byte PCM WAV header with pure column
    expressions (fixed offsets, zero Python): sample_rate, n_channels,
    bits_per_sample, n_samples — NULL for non-RIFF/WAVE payloads.

    Honest constraint: canonical layout only (fmt directly after RIFF,
    data directly after fmt — what make_wav and the vast majority of
    PCM encoders emit). Containers that interleave LIST/INFO chunks
    need a chunk WALK, which is not a fixed-offset expression — that is
    parse_media_headers' Arrow marker-walk pattern, applied to RIFF
    instead of JPEG. At 100 TB the fixed-offset path is the fast lane
    (whole-stage codegen over the first 44 bytes); route the rare
    chunked files to the Python walker by the NULL output here.

    The gate checks the FULL canonical contract, not just the RIFF/WAVE
    magic: fmt chunk size 16 + PCM format tag (a float/extensible fmt
    has a different size/tag) and the 'data' marker at byte 37 (a
    LIST/INFO chunk between fmt and data shifts every later offset).
    Either deviation NULLs all four fields instead of emitting garbage
    read from the wrong offsets."""
    is_wav = (
        (F.hex(F.substring(payload, 1, 4)) == "52494646")
        & (F.hex(F.substring(payload, 9, 8)) == "57415645666D7420")
        # fmt chunk length 16 (u32le) + audio format tag 1 = PCM (u16le)
        & (F.hex(F.substring(payload, 17, 6)) == "100000000100")
        # 'data' chunk id directly after the 16-byte fmt body
        & (F.hex(F.substring(payload, 37, 4)) == "64617461")
    )
    ch = _u16le_parse(payload, 23)
    sr = _u32le_parse(payload, 25)
    bits = _u16le_parse(payload, 35)
    data_size = _u32le_parse(payload, 41)
    n_samples = (data_size * F.lit(8) / (ch * bits)).cast("bigint")
    null = F.lit(None).cast("bigint")
    return {
        "sample_rate": F.when(is_wav, sr).otherwise(null),
        "n_channels": F.when(is_wav, ch).otherwise(null),
        "bits_per_sample": F.when(is_wav, bits).otherwise(null),
        "n_samples": F.when(is_wav, n_samples).otherwise(null),
    }


def make_flac(sample_rate, n_channels, bits, n_samples) -> "F.Column":
    """Canonical 42-byte FLAC header (4-byte 'fLaC' magic + the
    mandatory last-flagged STREAMINFO metadata block) — pure
    expressions, the big-endian bit-packed sibling of make_wav.
    Blocksize is pinned at 4096/4096, frame sizes and the audio md5
    left zero (unknown), which is exactly what a metadata-only writer
    emits. The data body is omitted (header-only blob); consumers here
    are decode-free metadata passes.

    STREAMINFO packs sample_rate(20b) | channels-1(3b) | bits-1(5b) |
    total_samples(36b) across bytes 19-26; the constructor splits that
    64-bit field into two 32-bit big-endian words so no expression ever
    exceeds bigint range."""
    sr = sample_rate if isinstance(sample_rate, F.Column) else F.lit(sample_rate)
    ch = n_channels if isinstance(n_channels, F.Column) else F.lit(n_channels)
    bt = bits if isinstance(bits, F.Column) else F.lit(bits)
    ns = n_samples if isinstance(n_samples, F.Column) else F.lit(n_samples)
    w1 = (
        sr.cast("bigint") * F.lit(4096)
        + (ch.cast("bigint") - 1) * F.lit(512)
        + (bt.cast("bigint") - 1) * F.lit(16)
        + F.floor(ns.cast("bigint") / F.lit(4294967296)).cast("bigint")
    )
    w2 = ns.cast("bigint") % F.lit(4294967296)

    def be32(col):
        return F.lpad(F.hex(col), 8, "0")

    return F.unhex(
        F.concat(
            F.lit("664C6143"),        # 'fLaC'
            F.lit("80"),              # last metadata block, type 0
            F.lit("000022"),          # STREAMINFO length 34
            F.lit("1000" + "1000"),   # min/max blocksize 4096
            F.lit("000000" * 2),      # min/max framesize unknown
            be32(w1),
            be32(w2),
            F.lit("00" * 16),         # audio md5 unknown
        )
    )


def flac_streaminfo_fields(payload: "F.Column") -> dict[str, "F.Column"]:
    """Parse a FLAC header whose FIRST metadata block is STREAMINFO with
    pure column expressions: sample_rate, n_channels, bits_per_sample,
    n_samples — NULL for anything else (wrong magic, a reordered or
    non-34-byte first block), routing such files to a Python chunk
    walker exactly like wav_header_fields' contract.

    FLAC is big-endian, so extraction is hex -> conv -> shift/mask
    (no byte swizzling): bytes 19-22 hold sample_rate(20b),
    channels-1(3b), bits-1(5b) and the top 4 bits of the 36-bit sample
    count; bytes 23-26 hold the count's low 32 bits. All shifts are on
    <= 32-bit values — far inside bigint."""
    is_flac = (
        (F.hex(F.substring(payload, 1, 4)) == "664C6143")
        # first block must be STREAMINFO (type 0; 0x80 = last-flag set)
        & (
            F.conv(F.hex(F.substring(payload, 5, 1)), 16, 10)
            .cast("bigint")
            .bitwiseAND(F.lit(127))
            == 0
        )
        & (F.hex(F.substring(payload, 6, 3)) == "000022")
    )
    w1 = F.conv(F.hex(F.substring(payload, 19, 4)), 16, 10).cast("bigint")
    w2 = F.conv(F.hex(F.substring(payload, 23, 4)), 16, 10).cast("bigint")
    sr = F.shiftright(w1, 12)
    ch = F.shiftright(w1, 9).bitwiseAND(F.lit(7)) + F.lit(1)
    bits = F.shiftright(w1, 4).bitwiseAND(F.lit(31)) + F.lit(1)
    ns = w1.bitwiseAND(F.lit(15)) * F.lit(4294967296) + w2
    null = F.lit(None).cast("bigint")
    return {
        "sample_rate": F.when(is_flac, sr).otherwise(null),
        "n_channels": F.when(is_flac, ch).otherwise(null),
        "bits_per_sample": F.when(is_flac, bits).otherwise(null),
        "n_samples": F.when(is_flac, ns).otherwise(null),
    }
