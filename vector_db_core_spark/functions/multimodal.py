"""Multimodal column plumbing: opaque binary payloads + typed metadata.

[EXT] north-star surface. The design treats image/audio/video as
``BinaryType`` columns living beside typed metadata and embeddings in
ordinary tables (see ``multimodal_doc_embedding_join`` in
operators/llm.py); decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the ONE place this engine uses Python in a data
path, because media codecs don't exist as Catalyst expressions.

Decoder capability ladder (``decode_image``):
  1. pillow, if importable (not shipped in this container) — any format;
  2. the built-in pure-python decoder — netpbm P5/P6, uncompressed
     24/32-bit BI_RGB BMP, and non-interlaced 8-bit PNG (gray / RGB /
     with-alpha, all five scanline filters, stdlib ``zlib`` inflate) —
     real pixel decodes with no dependencies;
  3. anything else raises ``UnsupportedMediaError`` (a declared,
     documented condition — see the class docstring), and feature
     pipelines that must stay total use ``stub_features`` instead.
Malformed payloads (truncated rasters, corrupt headers, bad zlib
streams) also surface as ``UnsupportedMediaError`` — never a raw
ValueError/IndexError — so ``features_or_stub`` is genuinely total
over arbitrary byte corpora.
Everything around the decoder (schema handling, Arrow batch iteration,
partition-preserving execution) is format-agnostic; swapping in a
richer decoder is a one-argument change.

Scale notes: ``mapInPandas`` streams Arrow batches executor-side — no
collect, no shuffle; partitioning and column pruning of the input
plan are preserved. Keep payload columns OUT of shuffle keys and
project them away before any join that doesn't need the bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: canonical schema for a media table: payload + typed metadata.
MEDIA_SCHEMA = (
    "media_id BIGINT, media_type STRING, payload BINARY, "
    "width INT, height INT, duration_ms BIGINT"
)

FEATURES_COL = "features"
FEATURE_DIM = 8


class UnsupportedMediaError(NotImplementedError):
    """Raised when no available decoder understands a payload.

    DECLARED unsupported surface: compressed formats (JPEG/PNG/WebP,
    audio, video containers) require a codec library; when none is
    importable the engine refuses loudly rather than fake a decode.
    Pipelines that must stay total over mixed corpora should use
    ``stub_features`` (deterministic byte featurizer) or pass their
    own decoder to ``extract_features(..., decoder=...)``.
    """


def _pil_image_module():
    """Capability check: pillow if importable, else None."""
    try:  # pragma: no cover - not installed in this container
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_netpbm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-python netpbm decode: P5 (gray) / P6 (RGB), 8-bit.

    Returns (width, height, n_channels, raster bytes).
    """
    # header: magic, whitespace/comment-separated width height maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then the raster
    w, h, maxval = fields
    if maxval != 255:
        raise UnsupportedMediaError(f"netpbm maxval {maxval} != 255 unsupported")
    ch = 3 if payload[:2] == b"P6" else 1
    raster = payload[pos : pos + w * h * ch]
    if len(raster) != w * h * ch:
        raise UnsupportedMediaError("truncated netpbm raster")
    return w, h, ch, raster


def _decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-python BMP decode: uncompressed (BI_RGB) 24/32-bit.

    Returns (width, height, 3, raster bytes) — raster is row-major
    top-to-bottom RGB (BMP stores bottom-up BGR; both are flipped).
    """
    import struct  # noqa: PLC0415

    if len(payload) < 54:
        raise UnsupportedMediaError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(
            f"BMP variant unsupported (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24/32-bit BI_RGB"
        )
    h, bottom_up = abs(h_raw), h_raw > 0
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3  # rows pad to 4-byte boundaries
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = (h - 1 - row) if bottom_up else row
        base = data_off + src_row * stride
        for col in range(w):
            b, g, r = payload[base + col * nbytes : base + col * nbytes + 3]
            dst = (row * w + col) * 3
            out[dst : dst + 3] = (r, g, b)
    return w, h, 3, bytes(out)


#: PNG 8-byte signature (public spec, RFC 2083 §3.1).
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(
    raw: bytes, w: int, h: int, bpp: int
) -> bytearray:  # bpp = bytes per pixel
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/Paeth).

    ``raw`` is the inflated IDAT stream: ``h`` scanlines, each a filter
    byte followed by ``w * bpp`` filtered bytes.
    """
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise UnsupportedMediaError("truncated PNG pixel stream")
    out = bytearray(h * stride)
    for row in range(h):
        ftype = raw[row * (stride + 1)]
        line = raw[row * (stride + 1) + 1 : (row + 1) * (stride + 1)]
        o = row * stride
        p = o - stride  # previous (above) scanline start, valid when row > 0
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[p + i] if row > 0 else 0
                out[o + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[p + i] if row > 0 else 0
                out[o + i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[p + i] if row > 0 else 0
                c = out[p + i - bpp] if (row > 0 and i >= bpp) else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + i] = (line[i] + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"PNG filter type {ftype} invalid")
    return out


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-python PNG decode: non-interlaced 8-bit gray (type 0),
    RGB (2), gray+alpha (4), RGBA (6); alpha channels are dropped.

    stdlib ``zlib`` inflates the concatenated IDAT chunks; the five
    scanline filters are reversed in ``_png_unfilter``. Returns
    (width, height, channels, raster) with channels in {1, 3}.
    """
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if payload[:8] != _PNG_SIG:
        raise UnsupportedMediaError("bad PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise UnsupportedMediaError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    n_in = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or n_in is None or comp != 0 or filt != 0 or interlace != 0:
        raise UnsupportedMediaError(
            f"PNG variant unsupported (depth={depth}, color={color}, "
            f"interlace={interlace}); only non-interlaced 8-bit gray/RGB(A)"
        )
    if w == 0 or h == 0:
        raise UnsupportedMediaError("PNG with zero dimension")
    raw = zlib.decompress(b"".join(idat))
    px = _png_unfilter(raw, w, h, n_in)
    if n_in in (2, 4):  # drop the alpha channel
        keep = n_in - 1
        px = bytearray(
            px[i * n_in + c] for i in range(w * h) for c in range(keep)
        )
        n_in = keep
    return w, h, n_in, bytes(px)


def decode_image(payload: bytes) -> dict:
    """Decode an image payload to pixels — real decode, no fakes.

    Returns ``{"width", "height", "channels", "pixels"}`` (pixels =
    row-major 8-bit raster bytes, RGB or gray). Uses pillow when
    importable; otherwise the built-in pure-python netpbm/BMP/PNG
    decoder. Raises :class:`UnsupportedMediaError` for formats neither
    path can handle AND for malformed payloads of a recognized format
    (a valid magic followed by garbage must not leak a raw
    ValueError/IndexError into a running job — one corrupt row in a
    100 TB corpus must not kill the pipeline).
    """
    if payload is None or len(payload) < 2:
        raise UnsupportedMediaError("empty payload")
    if _pure_decodable(payload):
        # engine-independent path FIRST: any format the pure decoder
        # recognizes decodes the same way whether or not pillow is
        # installed (pillow's convert("RGB") would promote gray
        # sources to 3 channels, making downstream bytes depend on
        # the environment).
        return _decode_pure(bytes(payload))
    pil = _pil_image_module()
    if pil is not None:  # pragma: no cover - pillow absent here
        import io  # noqa: PLC0415

        try:
            img = pil.open(io.BytesIO(bytes(payload)))
            img = img.convert("RGB")
        except Exception as exc:
            raise UnsupportedMediaError(f"pillow decode failed: {exc}") from exc
        return {
            "width": img.width,
            "height": img.height,
            "channels": 3,
            "pixels": img.tobytes(),
        }
    return _decode_pure(bytes(payload))


def _pure_decodable(payload: bytes) -> bool:
    """True when the pure-python decoder recognizes the magic bytes
    (netpbm P5/P6, BMP, PNG) — i.e. the payload decodes identically
    with or without pillow installed."""
    if payload is None or len(payload) < 2:
        return False
    head = bytes(payload[:8])
    return head[:2] in (b"P5", b"P6", b"BM") or head == _PNG_SIG


def _decode_pure(payload: bytes) -> dict:
    """Pure-python decode dispatch (no pillow): netpbm P5/P6,
    uncompressed BMP, non-interlaced 8-bit PNG. Same return contract
    and error discipline as :func:`decode_image`."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    magic = bytes(payload[:2])
    try:
        if magic in (b"P5", b"P6"):
            w, h, ch, raster = _decode_netpbm(payload)
        elif magic == b"BM":
            w, h, ch, raster = _decode_bmp(payload)
        elif bytes(payload[:8]) == _PNG_SIG:
            w, h, ch, raster = _decode_png(payload)
        else:
            raise UnsupportedMediaError(
                f"no decoder for payload with magic {magic!r}: pillow is not "
                "installed and the pure-python fallback handles netpbm P5/P6, "
                "uncompressed 24/32-bit BMP, and non-interlaced 8-bit PNG only"
            )
    except (ValueError, IndexError, struct.error, zlib.error) as exc:
        # corrupt-but-recognized payload: truncated raster, bad header
        # int, short struct, broken deflate stream — all declared
        # conditions, not crashes.
        raise UnsupportedMediaError(f"malformed {magic!r} payload: {exc}") from exc
    return {"width": w, "height": h, "channels": ch, "pixels": raster}


def image_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Pixel-space featurizer over a REAL decode: per-channel means
    (3 slots) + a luminance histogram over the remaining slots, all
    normalized to [0, 1]. Deterministic: same payload → same features
    on any worker. Raises :class:`UnsupportedMediaError` for payloads
    ``decode_image`` can't handle — compose with ``stub_features`` via
    ``features_or_stub`` when totality matters more than pixels.
    """
    img = decode_image(payload)
    w, h, ch, px = img["width"], img["height"], img["channels"], img["pixels"]
    n = w * h
    sums = [0] * 3
    hist_bins = max(1, dim - 3)
    hist = [0] * hist_bins
    for i in range(n):
        if ch == 3:
            r, g, b = px[3 * i], px[3 * i + 1], px[3 * i + 2]
        else:
            r = g = b = px[i]
        sums[0] += r
        sums[1] += g
        sums[2] += b
        lum = (r + g + b) // 3
        hist[min(lum * hist_bins // 256, hist_bins - 1)] += 1
    feats = [s / (255.0 * n) for s in sums] + [c / float(n) for c in hist]
    return feats[:dim] + [0.0] * (dim - len(feats))


def features_or_stub(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Total featurizer: real pixel features when the payload decodes,
    deterministic byte features otherwise. The right default for mixed
    corpora where a refusal per undecodable row would kill the job."""
    try:
        return image_features(payload, dim)
    except UnsupportedMediaError:
        return stub_features(payload, dim)


def stub_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic, dependency-free byte-level featurizer.

    Stands in for a real decode+embed step: per-bucket byte histograms
    normalized by length. Same bytes → same features, on any worker,
    any batch size — which is what the tests pin down.
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """Append a ``features array<double>`` column via Arrow-batched
    ``mapInPandas`` over the binary payload column.

    The decoder is a plain ``bytes -> list[float]`` callable applied
    per payload inside each Arrow batch (default: ``stub_features``).
    Output schema = input schema + features, so the operator composes
    with any upstream plan; no shuffle is introduced.
    """
    dec = decoder or (lambda b: stub_features(b, feature_dim))
    # copy the field list — StructType.add mutates in place, and
    # df.schema hands back a cached object
    out_schema = StructType(
        list(df.schema.fields) + [StructField(FEATURES_COL, ArrayType(DoubleType()))]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [dec(bytes(p) if p is not None else b"") for p in pdf[payload_col]]
            yield pdf.assign(**{FEATURES_COL: feats})

    return df.mapInPandas(run, schema=out_schema)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL raster resize: decode (``decode_image``), nearest-neighbor
    resample with the floor convention ``src = floor(dst * src_dim /
    dst_dim)`` (pure integer index math — no rounding ambiguity), and
    re-encode as binary netpbm (P5 gray / P6 RGB), which our own
    decoder round-trips. Byte-exactness scope: for every pure-python-
    decodable format (netpbm P5/P6, uncompressed BMP, non-interlaced
    8-bit PNG — everything in this repo's fixtures) ``decode_image``
    uses the pure decoder UNCONDITIONALLY, so gray stays 1-channel and
    the output bytes are identical with or without pillow installed;
    formats only pillow can read decode via ``convert("RGB")`` and are
    byte-stable per environment, not across them. Raises
    :class:`UnsupportedMediaError` for payloads ``decode_image`` can't
    handle — compose with ``stub_resize`` when totality matters more
    than pixels.
    """
    import numpy as np  # noqa: PLC0415

    if width <= 0 or height <= 0:
        raise UnsupportedMediaError(f"invalid target {width}x{height}")
    img = decode_image(payload)
    w, h, ch = img["width"], img["height"], img["channels"]
    raster = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w, ch)
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    out = raster[ys][:, xs]
    magic = b"P5" if ch == 1 else b"P6"
    header = magic + b"\n%d %d\n255\n" % (width, height)
    return header + out.tobytes()


def stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a raster resize: clamps the payload
    to ``width * height`` bytes (a real resizer decodes, resamples and
    re-encodes; this container has no codec). Same bytes + same target
    → same output on any worker."""
    if payload is None:
        return b""
    return bytes(payload[: width * height])


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every media payload to ``width x height`` via Arrow-batched
    ``mapInPandas``; the ``width``/``height`` metadata columns are
    rewritten to the target. Schema-preserving and shuffle-free —
    composes anywhere in a media pipeline. Swap a real decoder-backed
    resizer in via ``resizer=``; the default is the deterministic stub.
    """
    rz = resizer or stub_resize

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                rz(bytes(p) if p is not None else b"", width, height)
                for p in pdf[payload_col]
            ]
            if "width" in pdf.columns:
                pdf["width"] = width
            if "height" in pdf.columns:
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


#: output schema of sample_frames — one row per sampled frame.
FRAMES_SCHEMA = "media_id BIGINT, frame_idx INT, frame_payload BINARY"


def stub_frame_slices(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame extraction: splits the
    payload into ``n_frames`` contiguous byte slices (a real sampler
    would demux + decode keyframes)."""
    if payload is None or len(payload) == 0 or n_frames <= 0:
        return []
    step = max(1, len(payload) // n_frames)
    return [bytes(payload[i * step : (i + 1) * step]) for i in range(n_frames)]


def sample_frames(
    df: DataFrame,
    n_frames: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Sample ``n_frames`` frames per media row — the 1→N mapInPandas
    shape (each input row fans out to one row per frame, schema
    ``FRAMES_SCHEMA``). Fan-out happens inside the Arrow batch on the
    executor that holds the payload: bytes never move for sampling, and
    the output inherits the input partitioning (frames of one video
    stay co-located for downstream per-video ops).
    """
    smp = sampler or stub_frame_slices

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                frames = smp(bytes(p) if p is not None else b"", n_frames)
                for i, fr in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from the documents fixture,
    using the UTF-8 text bytes as the opaque payload (the container
    ships no real media); metadata columns are derived deterministically
    so tests can assert exact values."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )


def dhash_signature(payload: bytes) -> int:
    """DIFFERENCE HASH (dHash) over a REAL decode: one bit per
    horizontally adjacent luminance pair — bit((r,c)) = 1 iff
    lum(r,c) < lum(r,c+1) — packed row-major into an integer of
    (width-1)*height bits. The classic perceptual fingerprint for
    image near-dup detection: brightness/contrast shifts preserve the
    gradient SIGNS, so perceptually-identical images land within a
    few bits of each other. Deterministic: same payload → same
    signature on any worker. Raises :class:`UnsupportedMediaError`
    via ``decode_image`` for undecodable payloads."""
    img = decode_image(payload)
    w, h, ch, px = img["width"], img["height"], img["channels"], img["pixels"]

    def lum(i: int) -> int:
        if ch == 3:
            return (px[3 * i] + px[3 * i + 1] + px[3 * i + 2]) // 3
        return px[i]

    sig = 0
    idx = 0
    for r in range(h):
        for c in range(w - 1):
            i = r * w + c
            if lum(i) < lum(i + 1):
                sig |= 1 << idx
            idx += 1
    return sig


def append_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append ``width INT, height INT`` columns via Arrow-batched
    ``mapInPandas`` over the binary payload column — REAL decode
    (``decode_image``), same composition contract as ``append_dhash``
    (output schema = input schema + dims, no shuffle introduced)."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [
                decode_image(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            yield pdf.assign(
                width=[d["width"] for d in dims],
                height=[d["height"] for d in dims],
            )

    return df.mapInPandas(run, schema=out_schema)


def append_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append a ``dhash BIGINT`` column via Arrow-batched
    ``mapInPandas`` over the binary payload column — the signature
    companion of ``extract_features``, same composition contract
    (output schema = input schema + dhash, no shuffle introduced)."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField("dhash", LongType())]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            sigs = [
                dhash_signature(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            yield pdf.assign(dhash=sigs)

    return df.mapInPandas(run, schema=out_schema)
