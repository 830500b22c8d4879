"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension, BASELINE.json).

Design for 100 TB: media bytes ride in a ``binary`` column (or a
reference column pointing into object storage), metadata in a typed
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` kernels so bytes cross into Python once
per batch, never per row. Partitioning, schema, UDF signatures, and
batch shapes here are real and tested; the *codec* itself is stubbed —
image/audio libraries are not in this container — behind
``NotImplementedError`` or a clearly marked deterministic fake
(md5-seeded), so swapping in PIL/ffmpeg later only touches the innermost
function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata struct for an image column (gamma's VectorInfo carries
#: a ``source`` string per vector — `idl/fbs/doc.fbs:5-14`; this is the
#: honest structured version)
IMAGE_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _seed_from_bytes(payload: bytes) -> int:
    return int.from_bytes(hashlib.md5(payload).digest()[:8], "big")


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels seeded from the payload.
    Replace with ``PIL.Image.open(io.BytesIO(payload))`` when the codec
    library is available."""
    rng = np.random.default_rng(_seed_from_bytes(payload))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


# (the former ``real_decode`` NotImplementedError stub is gone — the
# package now ships three REAL codecs: ppm, wav, and png below; external
# libraries plug in through :func:`register_codec`)


# ---------------------------------------------------------------------------
# PPM (P6) — a REAL codec, pure numpy, no external library
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Decode binary PPM (``P6``): ASCII header ``P6 <w> <h> <maxval>``
    (whitespace-separated, ``#`` comments allowed) followed by h·w·3 raw
    RGB bytes. Returns (H, W, 3) uint8. Registered as codec ``"ppm"`` —
    the container-available real decoder exercising the registry seam
    end to end (VERDICT r2 #6)."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":  # comment: skip to end of line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    magic = token()
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (magic {magic!r})")
    width, height, maxval = int(token()), int(token()), int(token())
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval per spec
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated raster: want {n} bytes, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6)."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {px.shape}")
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        px, dtype=np.uint8
    ).tobytes()


# ---------------------------------------------------------------------------
# PNG — a third REAL codec: stdlib zlib + numpy, no external library
# (public spec: RFC 2083 / W3C PNG; VERDICT r6 #7)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG filter type 4): nearest of left/up/up-left
    to the linear estimate a + b - c, ties broken a, b, c."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering: ``raw`` is height rows of
    (1 filter-type byte + stride filtered bytes). Row recurrences
    (Sub/Average/Paeth depend on the just-reconstructed left pixel) are
    inherently sequential within a row, so this walks pixels in numpy
    column-slices of width ``bpp`` — O(width) slice ops per row, not
    O(width·bpp) scalar ops."""
    raw = raw.reshape(height, 1 + stride)
    ftypes = raw[:, 0]
    cur = raw[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(ftypes[y])
        row = cur[y]
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for x in range(bpp, stride, bpp):
                row[x : x + bpp] += row[x - bpp : x]
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            row[:bpp] += prev[:bpp] // 2
            for x in range(bpp, stride, bpp):
                row[x : x + bpp] += (
                    (
                        row[x - bpp : x].astype(np.uint16)
                        + prev[x : x + bpp].astype(np.uint16)
                    )
                    // 2
                ).astype(np.uint8)
        elif ft == 4:  # Paeth
            zero = np.zeros(bpp, dtype=np.uint8)
            row[:bpp] += _paeth(zero, prev[:bpp], zero)
            for x in range(bpp, stride, bpp):
                row[x : x + bpp] += _paeth(
                    row[x - bpp : x], prev[x : x + bpp], prev[x - bpp : x]
                )
        else:
            raise ValueError(f"unknown PNG filter type {ft} on row {y}")
        prev = row
    return cur


def decode_png(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Decode a PNG (bit depth 8, color types gray / RGB / palette /
    gray+alpha / RGBA, non-interlaced) to (H, W, 3) uint8 — the codec
    registry's contract shape (alpha is dropped, gray broadcast to
    RGB, palette indices resolved through PLTE). Stdlib ``zlib``
    inflates the IDAT stream; filtering is reversed in numpy."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IEND":
            break
        pos += 12 + size  # len + id + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (bit depth {depth}, compression {comp}, "
            f"filter method {filt}); only 8-bit method-0 supported"
        )
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    bpp = _PNG_CHANNELS[ctype]
    stride = width * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError(
            f"decompressed size {raw.size} != expected {height * (1 + stride)}"
        )
    px = _png_unfilter(raw, height, stride, bpp).reshape(height, width, bpp)
    if ctype == 0:  # grayscale
        return np.repeat(px, 3, axis=2)
    if ctype == 2:  # RGB
        return px
    if ctype == 3:  # palette
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[px[:, :, 0]]
    if ctype == 4:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA -> drop alpha


def encode_png(px: np.ndarray, filter_type: int | str = 0) -> bytes:
    """Encode (H, W, 3) uint8 as an 8-bit truecolor PNG.

    ``filter_type``: a fixed per-row filter 0-4, or ``"cycle"`` to
    rotate through all five (exercises every decoder unfilter path —
    the test oracle's roundtrip mode)."""
    import zlib

    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {px.shape}")
    h, w = px.shape[:2]
    bpp, stride = 3, w * 3
    rows = px.reshape(h, stride)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        row = rows[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif ft == 4:
            upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            enc = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"filter_type must be 0-4 or 'cycle', got {ft}")
        out.append(ft)
        out.extend(enc.tobytes())
        prev = row

    return _png_assemble(2, w, h, bytes(out))


def _png_assemble(
    ctype: int, w: int, h: int, raw: bytes, plte: np.ndarray | None = None
) -> bytes:
    """Signature + IHDR + optional PLTE + IDAT + IEND around an
    already-filtered scanline stream — the ONE copy of the chunk/CRC
    byte layout all three encoders share (RFC 2083 §3.2)."""
    import zlib

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + cid
            + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])  # depth 8, deflate, f0, no interlace
    )
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(
            b"PLTE", np.ascontiguousarray(plte, dtype=np.uint8).tobytes()
        )
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def _png_container(
    ctype: int, w: int, h: int, samples: np.ndarray, plte: np.ndarray | None = None
) -> bytes:
    """Assemble a filter-0 PNG for any supported color type:
    ``samples`` is (h, w*channels) uint8 sample bytes per scanline.
    Shared by the palette/RGBA encoders — the write-side twins of the
    color types :func:`decode_png` accepts (RFC 2083 §4.1.3)."""
    samples = np.ascontiguousarray(samples, dtype=np.uint8)
    raw = bytearray()
    for row in samples:
        raw.append(0)  # filter type 0: encoded bytes = sample bytes
        raw.extend(row.tobytes())
    return _png_assemble(ctype, w, h, bytes(raw), plte=plte)


def encode_png_indexed(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode (H, W) uint8 palette indices + (N, 3) uint8 PLTE as an
    8-bit color-type-3 PNG — the indexed-color container crawls are
    full of; :func:`decode_png` resolves it back to (H, W, 3)."""
    # validate BEFORE the uint8 cast: np.asarray(..., uint8) silently
    # wraps 256 -> 0, so a post-cast range check would pass any
    # out-of-range index that happens to wrap below len(palette) and
    # encode a wrong image instead of raising
    indices = np.asarray(indices)
    if indices.ndim != 2:
        raise ValueError(f"expected (H, W) indices, got {indices.shape}")
    if indices.size and (
        int(indices.max()) > 255 or int(indices.min()) < 0
    ):
        raise ValueError(
            f"palette indices must be uint8 (0..255), got range "
            f"[{int(indices.min())}, {int(indices.max())}]"
        )
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not len(palette):
        raise ValueError(f"palette must be (N, 3), got {palette.shape}")
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError(
            f"index {int(indices.max())} out of range for "
            f"{len(palette)}-entry palette"
        )
    indices = indices.astype(np.uint8)
    h, w = indices.shape
    return _png_container(3, w, h, indices.reshape(h, w), plte=palette)


def encode_png_rgba(px: np.ndarray) -> bytes:
    """Encode (H, W, 4) uint8 as an 8-bit color-type-6 (RGBA) PNG;
    :func:`decode_png` drops the alpha channel on read."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 4:
        raise ValueError(f"expected (H, W, 4), got {px.shape}")
    h, w = px.shape[:2]
    return _png_container(6, w, h, px.reshape(h, w * 4))


# ---------------------------------------------------------------------------
# codec registry — the injectable seam between Spark plumbing and codecs
# ---------------------------------------------------------------------------

#: name -> decoder(payload: bytes, meta: dict) -> np.ndarray (H, W, 3)
#: uint8. Registered driver-side; the chosen callable is resolved at
#: plan-build time and shipped to executors inside the mapInPandas
#: closure, so executors never consult the registry.
_CODECS: dict = {}


def register_codec(name: str, fn) -> None:
    """Plug a real decoder in (e.g. a PIL adapter:
    ``lambda payload, meta: np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))``)."""
    _CODECS[name] = fn


register_codec("ppm", decode_ppm)
register_codec("png", decode_png)


def decode_raw_rgb(payload: bytes, meta: dict) -> np.ndarray:
    """Decode headerless raw RGB bytes using the metadata struct for the
    shape — the output format of :func:`resize_images`, so resize ->
    feature-extract pipelines compose through the registry."""
    h, w = int(meta["height"]), int(meta["width"])
    n = h * w * 3
    if len(payload) != n:
        raise ValueError(f"raw-rgb payload: want {n} bytes, got {len(payload)}")
    return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)


register_codec("raw-rgb", decode_raw_rgb)


def decode_auto(payload: bytes, meta: dict) -> np.ndarray:
    """Per-row format dispatch through the metadata struct — the
    mixed-format corpus case (a crawl-scale table carries PNG and PPM
    and pre-decoded raw tiles side by side, and one mapInPandas pass
    must decode them all without per-format splits/unions). The row's
    ``meta["format"]`` resolves through the same registry, so
    user-registered codecs participate automatically."""
    fmt = (meta or {}).get("format")
    fn = _CODECS.get(fmt)
    if fn is None or fn is decode_auto:
        raise ValueError(
            f"auto codec: row format {fmt!r} not registered "
            f"(known: {sorted(n for n in _CODECS if n != 'auto')})"
        )
    return fn(payload, meta)


register_codec("auto", decode_auto)


def resolve_codec(name: str | None):
    """None -> the deterministic md5-seeded fake (container default)."""
    if name is None:
        return None
    try:
        return _CODECS[name]
    except KeyError:
        raise KeyError(
            f"codec {name!r} not registered (known: {sorted(_CODECS)})"
        ) from None


def _decode(payload: bytes, meta: dict, codec_fn) -> np.ndarray:
    if codec_fn is None:
        return _fake_decode(payload, int(meta["width"]), int(meta["height"]))
    return np.asarray(codec_fn(payload, meta), dtype=np.uint8)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "image",
    meta_col: str = "image_meta",
    dim: int = 64,
    deterministic: bool = True,
    codec: str | None = None,
) -> DataFrame:
    """binary payload -> ``feat array<float>[dim]`` embedding column.

    The Spark plumbing (Arrow batching, schema evolution, column
    passthrough) is production-shaped; the pixel decode goes through the
    codec registry (``codec=`` a :func:`register_codec` name) and falls
    back to the deterministic stub when no codec is named.
    """
    out_schema = StructType(list(df.schema.fields) + [StructField("feat", ArrayType(FloatType()))])
    codec_fn = resolve_codec(codec)
    # configuration-only check: fail fast on the DRIVER at plan build,
    # not per-row inside the executor loop (where a job must launch to
    # surface it — and an all-empty-partition job never would)
    if not deterministic and codec_fn is None:
        raise ValueError(
            "deterministic=False requires a named codec "
            "(register_codec + codec=...); built-ins: ppm, png, raw-rgb"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                px = _decode(bytes(payload), meta, codec_fn).astype(np.float64)
                # channel-mean pyramid: cheap, shape-sensitive, deterministic
                g = px.mean(axis=2)
                pools = []
                splits = max(1, int(np.sqrt(dim // 4)))
                for rs in np.array_split(g, splits, axis=0):
                    for cs in np.array_split(rs, splits, axis=1):
                        pools.append(cs.mean())
                v = np.resize(np.asarray(pools), dim)
                feats.append((v / 255.0).astype(np.float32))
            pdf = pdf.copy()
            pdf["feat"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "image",
    meta_col: str = "image_meta",
    width: int = 32,
    height: int = 32,
    codec: str | None = None,
) -> DataFrame:
    """Resize: payload -> new payload + updated metadata (nearest-
    neighbor resample over the decoded pixels, re-encoded as raw RGB
    bytes; decode goes through the codec registry)."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name not in (payload_col, meta_col)]
        + [StructField(payload_col, BinaryType()), StructField(meta_col, IMAGE_META)]
    )
    names = [f.name for f in out_schema.fields]
    codec_fn = resolve_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads, metas = [], []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                px = _decode(bytes(payload), meta, codec_fn)
                ri = (np.linspace(0, px.shape[0] - 1, height)).astype(int)
                ci = (np.linspace(0, px.shape[1] - 1, width)).astype(int)
                resized = px[ri][:, ci]
                payloads.append(resized.tobytes())
                metas.append({"width": width, "height": height, "format": "raw-rgb"})
            pdf = pdf.copy()
            pdf[payload_col] = payloads
            pdf[meta_col] = metas
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# audio: WAV (RIFF/PCM16) — a second REAL codec, pure numpy
# ---------------------------------------------------------------------------

AUDIO_META = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("format", StringType()),
    ]
)


def decode_wav(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Decode a RIFF/WAVE file with 16-bit PCM samples. Returns
    (n_samples, n_channels) int16. Pure numpy — the audio twin of the
    PPM image codec, registered as ``"wav"``: a real container-
    available decoder, not a stub."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, n_channels)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode (n_samples,) or (n_samples, n_channels) int16 as PCM16 WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_channels = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


register_codec("wav", decode_wav)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "audio",
    codec: str = "wav",
) -> DataFrame:
    """binary audio payload -> per-row scalar features (sample count,
    peak, mean absolute amplitude, zero-crossing count) over the first
    channel. Same Arrow-batched mapInPandas shape as the image kernels:
    bytes cross into Python once per batch, features are vectorized
    numpy reductions."""
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_samples", IntegerType()),
            StructField("peak", FloatType()),
            StructField("mean_abs", FloatType()),
            StructField("zero_cross", IntegerType()),
        ]
    )
    codec_fn = resolve_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ns, peak, mean_abs, zc = [], [], [], []
            for payload in pdf[payload_col]:
                s = codec_fn(bytes(payload), None)[:, 0].astype(np.float64)
                ns.append(len(s))
                peak.append(float(np.abs(s).max(initial=0.0)))
                mean_abs.append(float(np.abs(s).mean()) if len(s) else 0.0)
                zc.append(int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))))
            pdf = pdf.copy()
            pdf["n_samples"], pdf["peak"] = ns, peak
            pdf["mean_abs"], pdf["zero_cross"] = mean_abs, zc
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "video",
    n_frames_col: str = "n_frames",
    every: int = 10,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame index (the
    explode pattern a video pipeline needs); frame decode is stubbed to
    the frame index + payload hash (md5 — ANSI-portable, so the DuckDB
    oracle can reproduce the key exactly). Rows with zero or NULL
    ``n_frames`` produce no output rows (explode of an empty array)
    instead of crashing the job — ``sequence(0, -1, every)`` is an
    illegal range Spark rejects at runtime."""
    frames = F.when(
        F.col(n_frames_col) > 0,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every)),
    )  # no otherwise: NULL, which explode drops (matches any int type)
    return (
        df.withColumn("frame_idx", F.explode(frames))
        .withColumn(
            "frame_key",
            F.concat_ws(":", F.md5(F.col(payload_col)), F.col("frame_idx")),
        )
    )
