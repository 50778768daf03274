"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a `binary`
column (or a reference into object storage when > ~1 MB), metadata is a
typed struct, and every decode / feature-extract / resize / frame-sample
step is an Arrow-batched `mapInPandas` operator so payload bytes move
once per stage, in columnar batches, never row-at-a-time.

Decode backends: `fake=True` (default) produces deterministic synthetic
outputs (content-hash-seeded) with the real schema, partitioning, UDF
signature and batch shape; `fake=False` uses Pillow when importable in
the executor environment (decode, pixel features, resize) and raises
NotImplementedError with an actionable message when it is not — this
container ships no image libs, so the PIL paths are exercised only
where the optional dep exists (tests skip accordingly). Video frame
sampling decodes YUV4MPEG2 payloads with zero dependencies (pure byte
parsing), and audio metadata/features decode RIFF/WAVE PCM the same way
(_parse_wav); compressed containers need an upstream ffmpeg transcode.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pil():
    """Import-gated Pillow accessor (executor-side)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None

# typed metadata struct carried alongside every payload
META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)

IMAGE_FEATURES_SCHEMA = "doc_id long, media_type string, feat array<float>, n_bytes long"
RESIZE_SCHEMA = "doc_id long, media_type string, payload binary, width int, height int"


def with_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the typed metadata struct (parsed from a real container
    header in production; here: deterministic from content bytes)."""
    h = F.xxhash64(F.col(payload_col))
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.pmod(h, F.lit(1920)) + 32).cast("int").alias("width"),
            (F.pmod(h, F.lit(1080)) + 32).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a CNN/CLIP embedding: bytes of
    sha256(payload) cycled into [0,1) floats."""
    d = hashlib.sha256(payload).digest()
    return [d[i % len(d)] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """Decode + feature-extract operator (mapInPandas). Arrow moves the
    binary column in batches; output is id + feature vector — the
    payload is dropped exiting this stage so downstream shuffles carry
    vectors, not media bytes (the single most important property of a
    multimodal pipeline at scale)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None if fake else _pil()
        for pdf in batches:
            if fake:
                feats = [_fake_feature(bytes(p), dim) for p in pdf[payload_col]]
                mt = "image/fake"
            elif Image is None:
                raise NotImplementedError(
                    "real image decode requires Pillow in the executor env "
                    "(pip install pillow) — or run with fake=True"
                )
            else:
                feats, mt = [], "image/decoded"
                for p in pdf[payload_col]:
                    feats.append(_pil_feature(Image, bytes(p), dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": mt,
                    "feat": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def _pil_feature(Image, payload: bytes, dim: int) -> list[float]:
    """Real decode path: grayscale-resize the image to a dim-pixel strip
    and emit normalized intensities — a minimal, dependency-light
    stand-in for a CNN embedding that still reflects pixel content."""
    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return [px / 255.0 for px in img.getdata()]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Resize operator stub: production would decode→resize→re-encode
    per batch; the fake truncates/pads bytes deterministically to prove
    the binary-in/binary-out plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None if fake else _pil()
        target = width * height // 64 + 8
        for pdf in batches:
            if fake:
                payloads = [
                    (bytes(p) * (target // max(len(bytes(p)), 1) + 1))[:target]
                    for p in pdf[payload_col]
                ]
                mt = "image/fake"
            elif Image is None:
                raise NotImplementedError(
                    "real resize requires Pillow in the executor env "
                    "(pip install pillow) — or run with fake=True"
                )
            else:
                payloads, mt = [], "image/png"
                for p in pdf[payload_col]:
                    img = Image.open(io.BytesIO(bytes(p))).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": mt,
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame int, payload binary, width int, height int"

# bytes per pixel numerator/denominator for Y4M colourspace tags
_Y4M_SIZES = {"420": (3, 2), "422": (2, 1), "444": (3, 1), "mono": (1, 1)}


def _parse_y4m(b: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a YUV4MPEG2 stream — the uncompressed interchange format
    ffmpeg/mjpegtools emit (`ffmpeg -i in.mp4 out.y4m`). Plain bytes:
    'YUV4MPEG2 W<w> H<h> ...\\n' then per frame 'FRAME...\\n' + raw
    planar pixel data, so frame extraction needs no codec library.
    Returns (width, height, [frame_bytes...])."""
    nl = b.index(b"\n")
    header = b[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    num, den = _Y4M_SIZES["420"]  # C420 is the spec default
    for tok in header.split()[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            key = next((k for k in _Y4M_SIZES if tok[1:].startswith(k)), None)
            if key is None:
                raise ValueError(f"unsupported Y4M colourspace {tok!r}")
            num, den = _Y4M_SIZES[key]
    if not w or not h:
        raise ValueError("YUV4MPEG2 header missing W/H")
    fsize = w * h * num // den
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        if not b[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        if start + fsize > len(b):
            raise ValueError("truncated Y4M frame")
        frames.append(b[start : start + fsize])
        pos = start + fsize
    return w, h, frames


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (explode-shaped mapInPandas — row count grows, which is why this
    runs BEFORE feature extraction and AFTER any filtering).

    fake=False decodes real YUV4MPEG2 (.y4m) payloads — pure byte
    parsing, no codec dependency (_parse_y4m); each sampled frame exits
    as raw planar pixels with its dimensions, ready for the resize /
    feature stages. Compressed containers (mp4/webm) still need an
    ffmpeg transcode to y4m upstream and raise NotImplementedError
    here. fake=True keeps the deterministic synthetic path (width and
    height 0)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, blobs, ws, hs = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                if fake:
                    n_frames = max(len(b) // 32, 1)
                    for f_idx in range(0, n_frames, every_n):
                        ids.append(i)
                        frames.append(f_idx)
                        blobs.append(b[f_idx * 32 : (f_idx + 1) * 32])
                        ws.append(0)
                        hs.append(0)
                elif b.startswith(b"YUV4MPEG2"):
                    w, h, decoded = _parse_y4m(b)
                    for f_idx in range(0, len(decoded), every_n):
                        ids.append(i)
                        frames.append(f_idx)
                        blobs.append(decoded[f_idx])
                        ws.append(w)
                        hs.append(h)
                else:
                    raise NotImplementedError(
                        "real frame sampling reads YUV4MPEG2 payloads; "
                        "transcode compressed containers with ffmpeg "
                        "(`ffmpeg -i in.mp4 out.y4m`) upstream"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame": frames,
                    "payload": blobs,
                    "width": ws,
                    "height": hs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: WAV (RIFF/PCM) — zero-dependency byte parsing, like _parse_y4m
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = (
    "doc_id long, sample_rate int, channels int, bits int, "
    "n_samples long, duration_s double"
)
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_windows int, rms array<float>, zcr array<float>"
)


def _parse_wav(b: bytes):
    """Parse a RIFF/WAVE payload without any audio library: walk the
    chunk list for fmt (PCM int code 1 / IEEE float code 3) and data,
    return (sample_rate, channels, bits, samples ndarray [n, channels]
    as float64 in [-1, 1]). Raises ValueError on non-WAV or compressed
    codecs — those need an upstream ffmpeg transcode, same contract as
    the video path."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    code, channels, rate, _, _, bits = fmt
    if code == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif code == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif code == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif code == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(
            f"unsupported WAV codec (format={code}, bits={bits}); "
            "transcode with ffmpeg to PCM upstream"
        )
    n = len(x) // channels
    return rate, channels, bits, x[: n * channels].reshape(n, channels)


def audio_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Header-only audio probe (mapInPandas): sample rate, channels, bit
    depth, frame count, duration. Parses chunk headers, not samples —
    at scale this is the cheap pass that routes payloads to the right
    decode stage."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                rate, ch, bits, samples = _parse_wav(bytes(p))
                rows.append(
                    (i, rate, ch, bits, len(samples), len(samples) / rate)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "bits",
                    "n_samples", "duration_s",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, AUDIO_META_SCHEMA)


def audio_features(
    df: DataFrame,
    window: int = 1024,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Windowed audio features (mapInPandas, numpy-vectorized): per
    non-overlapping window of `window` mono samples, RMS energy and
    zero-crossing rate — the classic cheap VAD/quality signals. The
    payload is dropped on exit (downstream shuffles carry two small
    float arrays, not audio bytes). fake=True keeps a deterministic
    hash-derived output with the same schema for payload-free testing."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nw, rms_col, zcr_col = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                if fake:
                    d = hashlib.sha256(b).digest()
                    k = max(len(b) // (2 * window), 1)
                    rms = [d[j % len(d)] / 255.0 for j in range(k)]
                    zcr = [d[(j + 7) % len(d)] / 255.0 for j in range(k)]
                else:
                    rate, ch, bits, samples = _parse_wav(b)
                    mono = samples.mean(axis=1)
                    k = len(mono) // window
                    if k == 0:
                        ids.append(i); nw.append(0)
                        rms_col.append([]); zcr_col.append([])
                        continue
                    w = mono[: k * window].reshape(k, window)
                    rms = np.sqrt((w * w).mean(axis=1)).astype(np.float32).tolist()
                    sgn = np.signbit(w)
                    zcr = (
                        (sgn[:, 1:] != sgn[:, :-1]).mean(axis=1)
                        .astype(np.float32)
                        .tolist()
                    )
                    k = len(rms)
                ids.append(i); nw.append(k)
                rms_col.append(rms); zcr_col.append(zcr)
            yield pd.DataFrame(
                {"doc_id": ids, "n_windows": nw, "rms": rms_col, "zcr": zcr_col}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


# -- Zero-dependency image-container header parsing -------------------------

IMAGE_DIMS_SCHEMA = "doc_id long, img_format string, width int, height int"


def _parse_image_dims(b: bytes):
    """(format, width, height) from PNG / JPEG / GIF container headers,
    or (None, None, None) for anything else. Pure byte arithmetic (like
    _parse_y4m / _parse_wav): PNG stores IHDR width/height big-endian
    at bytes 16-24; GIF87a/89a stores the logical-screen size
    little-endian at bytes 6-10; JPEG is a segment walk to the first
    SOFn frame header. Header-only — truncated payloads parse as long
    as the header bytes are present, so the scan never materializes
    image bodies."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return "png", w, h
    if len(b) >= 10 and b[:4] == b"GIF8":
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return "gif", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        n = len(b)
        i = 2
        # SOF markers carry the frame size; skip every other segment by
        # its declared length. C4/C8/CC are huffman/arithmetic tables,
        # not frames. Encoders may pad with 0xFF fill bytes before a
        # marker, and TEM (0x01) / RSTn (0xD0-D7) / SOI (0xD8) are
        # standalone markers with NO length field — both must be
        # handled or the walk desynchronizes and can miss the SOF or
        # match a spurious FF+SOF pair mid-stream.
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        while i + 1 < n:
            if b[i] != 0xFF:
                break
            j = i + 1
            while j < n and b[j] == 0xFF:  # skip fill bytes
                j += 1
            if j >= n:
                break
            marker = b[j]
            if marker in sof:
                if j + 8 <= n:
                    h = int.from_bytes(b[j + 4:j + 6], "big")
                    w = int.from_bytes(b[j + 6:j + 8], "big")
                    return "jpeg", w, h
                break
            if marker == 0xD9:  # EOI: no frame header in this payload
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i = j + 1  # standalone marker: 0-byte body, no length
                continue
            if j + 3 > n:
                break
            seg_len = int.from_bytes(b[j + 1:j + 3], "big")
            if seg_len < 2:
                break
            i = j + 1 + seg_len
        return "jpeg", None, None
    return None, None, None


def image_dimensions(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real container-header image metadata without any imaging
    dependency: (id, img_format, width, height) parsed from PNG / JPEG
    / GIF header bytes. The production metadata pass for a 100 TB
    image corpus is exactly this shape — Arrow batches stream through
    mapInPandas, only header bytes are inspected, and the payload
    column never survives into the output, so downstream shuffles
    carry four scalar columns instead of media bytes. Unknown or
    corrupt containers yield NULLs (filter, don't fail)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, w, h = _parse_image_dims(bytes(payload or b""))
                rows.append((int(i), fmt, w, h))
            yield pd.DataFrame(
                rows, columns=[id_col, "img_format", "width", "height"]
            )

    return df.select(id_col, payload_col).mapInPandas(gen, IMAGE_DIMS_SCHEMA)
