"""Real media decode for the multimodal pipeline's ``decode_stub=False``
path (round 6 — closes the last "production plugs in here" marker).

Capability-gated like the Avro/Kafka connectors: if PIL is importable it
decodes images (any format it knows); otherwise a built-in pure-stdlib
decoder handles PNG (zlib inflate + filter reconstruction — the format
IS deflate plus five per-line filters, no codec library required).
Audio is WAV via the stdlib ``wave`` module + numpy. Video stays a
``NotImplementedError`` hook (no container parser in the stdlib), with
the byte-slicing frame sampler as its declared stand-in.

Everything here is per-payload pure-Python/numpy invoked INSIDE the
Arrow-batched ``mapInPandas`` operators of ``binary_ops`` — the Spark
plumbing (schema, batching, partitioning) is identical between the stub
and real paths, which tests/test_multimodal.py pins.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

FEATURE_DIM = 8

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _pil_or_none():
    try:  # capability gate: codec lib optional
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


# ---------------------------------------------------------------- PNG --
def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit gray/RGB/RGBA, filter 0, one IDAT) —
    enough to round-trip the decoder and re-emit resized payloads."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode: 8-bit depth, gray/gray+alpha/RGB/RGBA,
    non-interlaced; all five line filters reconstructed. Returns uint8
    (h, w) or (h, w, channels)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        pos += 8
        data = payload[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * channels
    raw = zlib.decompress(idat)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], np.uint8).astype(np.int32)
        pos += stride
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-progress line — scalar loop
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - channels] if x >= channels else 0
                b = prev[x]
                if f == 1:  # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif f == 3:  # Average
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    cc = prev[x - channels] if x >= channels else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)


def decode_image(payload: bytes) -> np.ndarray:
    """Image → uint8 array; PIL when importable (any format), built-in
    PNG decoder otherwise."""
    Image = _pil_or_none()
    if Image is not None:
        return np.asarray(Image.open(io.BytesIO(payload)))
    return decode_png(payload)


# ---------------------------------------------------------------- WAV --
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV → (float64 samples in [-1, 1] shaped (n, channels), rate)
    via the stdlib ``wave`` reader; 8/16/32-bit PCM."""
    with wave_open(payload) as wf:
        n, ch, width, rate = (
            wf.getnframes(),
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
        )
        frames = wf.readframes(n)
    if width == 1:  # unsigned 8-bit
        a = (np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        a = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        a = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return a.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float in [-1, 1] → 16-bit PCM WAV bytes."""
    import wave

    samples = np.atleast_2d(samples.T).T
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def wave_open(payload: bytes):
    import wave

    return wave.open(io.BytesIO(payload), "rb")


# ------------------------------------------------------------ features --
def real_features(payload: bytes, media_type: str) -> list[float]:
    """Decode → FEATURE_DIM floats in [0, 1]; the real twin of
    binary_ops._fake_features (same output width and schema, genuinely
    decoded content): image = normalized luminance histogram, audio =
    per-segment RMS."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    if media_type == "image":
        arr = decode_image(payload).astype(np.float64)
        lum = arr if arr.ndim == 2 else arr[..., : min(3, arr.shape[2])].mean(axis=2)
        hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0.0, 256.0))
        return (hist / max(lum.size, 1)).tolist()
    if media_type == "audio":
        samples, _rate = decode_wav(payload)
        mono = samples.mean(axis=1)
        pad = (-len(mono)) % FEATURE_DIM
        if pad:
            mono = np.concatenate([mono, np.zeros(pad)])
        seg = mono.reshape(FEATURE_DIM, -1)
        return np.sqrt((seg**2).mean(axis=1)).tolist()
    raise NotImplementedError(
        f"real decode for media_type={media_type!r} needs a codec library "
        "(video container parsing) — the byte-sliced frame sampler is the "
        "declared stand-in"
    )


def real_resize(payload: bytes, media_type: str, factor: int) -> bytes:
    """Decode → downsample by ``factor`` → re-encode. Image:
    nearest-neighbor stride then PNG re-encode; audio: every factor-th
    frame at rate/factor, 16-bit PCM WAV out."""
    if payload is None:
        return None
    if media_type == "image":
        arr = decode_image(payload)
        return encode_png(arr[::factor, ::factor])
    if media_type == "audio":
        samples, rate = decode_wav(payload)
        return encode_wav(samples[::factor], max(rate // factor, 1))
    raise NotImplementedError(
        f"real resize for media_type={media_type!r} needs a codec library"
    )
