"""Real media decode for the multimodal pipeline's ``decode_stub=False``
path (round 6 — closes the last "production plugs in here" marker).

Capability-gated like the Avro/Kafka connectors: if PIL is importable it
decodes images (any format it knows); otherwise a built-in pure-stdlib
decoder handles PNG (zlib inflate + filter reconstruction — the format
IS deflate plus five per-line filters, no codec library required).
Audio is WAV via the stdlib ``wave`` module + numpy.

Video (round 7, VERDICT r6 item 5): two concatenated-frame container
flavors behind one splitter — MJPEG (concatenated JPEGs, the classic
IP-camera/AVI-MJPG stream: frame boundaries found by a real JPEG
segment walker — entropy-scan with byte-stuffing/RST awareness, not a
naive FFD9 search) and MPNG (concatenated PNGs, the same shape with a
fully stdlib-decodable codec). Splitting is ALWAYS pure stdlib;
per-frame pixel decode is PIL for JPEG (capability-gated — without PIL
MJPEG raises the declared NotImplementedError) and built-in for PNG.
The byte-slicing frame sampler remains the oracle-facing stub;
``frame_sample(decode_stub=False)`` consumes real container frames.

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


# The pure-Python filter reconstruction below is ~50× slower than PIL's
# C path on Sub/Average/Paeth-filtered PNGs (measured — see SCALING.md
# "stdlib PNG fallback cost"). Fine for tests and small batches;
# shipping it to a cluster unknowingly is not. Each Python worker logs
# ONE warning when its cumulative stdlib-decoded payload count crosses
# the threshold (workers are long-lived, so per-executor this fires
# once, not per batch).
STDLIB_PNG_WARN_AT = 1_000
_stdlib_png_decoded = 0


def _note_stdlib_png_decode() -> None:
    global _stdlib_png_decoded
    _stdlib_png_decoded += 1
    if _stdlib_png_decoded == STDLIB_PNG_WARN_AT:
        import logging

        logging.getLogger(__name__).warning(
            "stdlib PNG fallback decoded %d payloads in this worker — PIL "
            "is not importable and the pure-Python filter reconstruction "
            "is ~50x slower on Sub/Average/Paeth-filtered PNGs; install "
            "Pillow on the cluster before running real-decode at scale "
            "(SCALING.md: stdlib PNG fallback cost)",
            STDLIB_PNG_WARN_AT,
        )


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
        elif f == 1:
            # Sub is an EXACT per-channel-lane prefix sum mod 256:
            # rec[x] = Σ line[x, x-ch, x-2ch, ...] & 0xFF — vectorized
            # (the mod commutes with addition, so one int64 cumsum per
            # lane reproduces the sequential filter bit-for-bit)
            rec = np.empty(stride, np.int32)
            for lane in range(channels):
                rec[lane::channels] = (
                    np.cumsum(line[lane::channels], dtype=np.int64) & 0xFF
                )
        elif f == 3:
            # Average is sequentially data-dependent through the left
            # neighbor. A whole-row fixpoint iteration was tried in
            # round 8 and REJECTED: a ±1 error entering an even
            # (a + up) sum survives the floor-halving unchanged, so
            # flat/gradient rows (the common case) never converge
            # short of stride/ch passes — measured SLOWER than the
            # scalar loop on every content class. Plain-int loop with
            # the branch hoisted out (zip + append, x < ch prologue).
            ch = channels
            line_l = line.tolist()
            prev_l = prev.tolist()
            rec_l = []
            ap = rec_l.append
            for d, b in zip(line_l[:ch], prev_l[:ch]):  # a = 0
                ap((d + (b >> 1)) & 0xFF)
            for d, b in zip(line_l[ch:], prev_l[ch:]):
                ap((d + ((rec_l[-ch] + b) >> 1)) & 0xFF)
            rec = np.asarray(rec_l, np.int32)
        elif f == 4:
            # Paeth is sequentially data-dependent through the
            # predictor SELECTION (pred can BE the left neighbor, so a
            # wrong guess propagates undamped — the Average fixpoint
            # trick does not converge here). Plain-int loop (numpy
            # scalar indexing costs ~30× more, the round-7 lesson),
            # with the a-independent terms hoisted OUT vectorized
            # (round 8): pa = |b-c| and bc = b-c depend only on the
            # previous row, so the inner loop computes just
            # pb = |a-c|, pc = |(a-c) + (b-c)| and the selection.
            ch = channels
            line_l = line.tolist()
            prev_l = prev.tolist()
            c_l = [0] * ch + prev_l[:-ch] if stride > ch else [0] * stride
            bc_l = [b - c for b, c in zip(prev_l, c_l)]
            pa_l = [v if v >= 0 else -v for v in bc_l]
            rec_l = []
            ap = rec_l.append
            for x in range(min(ch, stride)):  # a = c = 0 ⇒ pred = b
                ap((line_l[x] + prev_l[x]) & 0xFF)
            # 5-way zip: zero per-element index lookups besides the
            # rec_l[-ch] left-neighbor read (append keeps it at -ch)
            for d, b, cc, bc, pa in zip(
                line_l[ch:], prev_l[ch:], prev_l, bc_l[ch:], pa_l[ch:]
            ):
                a = rec_l[-ch]
                t = a - cc
                pb = t if t >= 0 else -t
                u = t + bc
                pc = u if u >= 0 else -u
                ap((d + (a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc))) & 0xFF)
            rec = np.asarray(rec_l, np.int32)
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
    _note_stdlib_png_decode()
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


# --------------------------------------------------------------- video --
def _png_frame_end(buf: bytes, start: int) -> int:
    """End offset (exclusive) of the PNG starting at ``start``: walk
    chunks (len + type + data + crc) until IEND's crc."""
    pos = start + len(_PNG_SIG)
    n = len(buf)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        pos += 8 + ln + 4
        if typ == b"IEND":
            return pos
    raise ValueError("truncated PNG frame")


def _jpeg_frame_end(buf: bytes, start: int) -> int:
    """End offset (exclusive) of the JPEG starting at ``start``: a real
    segment walk — length-prefixed marker segments, RST/TEM markers
    (no length), and an entropy scan after SOS honoring 0xFF00 byte
    stuffing — so an FFD9 inside an APPn segment (EXIF thumbnails) can
    never be mistaken for the frame's EOI."""
    pos = start + 2  # past SOI
    n = len(buf)
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            return pos + 2
        if marker == 0xFF:  # fill byte (B.1.1.2): only ONE byte consumed
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RST/TEM: no length
            pos += 2
            continue
        if pos + 4 > n:
            break
        (seg_len,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        pos += 2 + seg_len
        if marker == 0xDA:  # SOS: entropy-coded data until next true marker
            # jump between 0xFF candidates with bytes.find — entropy data
            # is mostly non-FF, so this is ~100× cheaper than a per-byte
            # Python loop (the Paeth-filter lesson applied here)
            while True:
                pos = buf.find(b"\xff", pos)
                if pos < 0 or pos + 2 > n:
                    pos = n  # truncated: fall out to the outer loop's end
                    break
                nxt = buf[pos + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos += 2  # stuffing / RST: still entropy data
                    continue
                if nxt == 0xD9:
                    return pos + 2
                break  # next segment (progressive scans) — outer loop
    raise ValueError("truncated JPEG frame")


def split_video_frames(payload: bytes) -> list[bytes]:
    """Concatenated-frame video container → per-frame byte slices.
    Pure stdlib for BOTH flavors (splitting needs structure, not pixel
    codecs): MPNG (PNG signature) and MJPEG (FFD8 SOI)."""
    frames: list[bytes] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + len(_PNG_SIG)] == _PNG_SIG:
            end = _png_frame_end(payload, pos)
        elif payload[pos : pos + 2] == b"\xff\xd8":
            end = _jpeg_frame_end(payload, pos)
        else:
            raise ValueError(
                f"not a concatenated-frame video payload at offset {pos} "
                "(expected PNG signature or JPEG SOI)"
            )
        frames.append(payload[pos:end])
        pos = end
    if not frames:
        raise ValueError("empty video payload")
    return frames


def decode_video(payload: bytes) -> list[np.ndarray]:
    """Video → list of per-frame uint8 arrays. PNG frames decode via the
    built-in decoder; JPEG frames need PIL (capability gate — the
    declared hook raises without it, splitting still works)."""
    frames = split_video_frames(payload)
    # gate on ANY JPEG frame — the splitter dispatches per frame, so a
    # mixed MPNG/MJPEG payload must not slip JPEG bytes past the gate
    # into the PNG decoder (confusing 'not a PNG' instead of the
    # declared capability error)
    if any(f[:2] == b"\xff\xd8" for f in frames) and _pil_or_none() is None:
        raise NotImplementedError(
            "MJPEG frame decode needs PIL (JPEG entropy decode is not in "
            "the stdlib) — frame SPLITTING and byte-level sampling still "
            "work; use MPNG payloads for a codec-free path"
        )
    return [decode_image(f) for f in frames]


def encode_mpng(frames: list[np.ndarray]) -> bytes:
    """Concatenated-PNG video encoder (the MPNG flavor) — the re-encode
    side of video resize and the test-fixture generator."""
    return b"".join(encode_png(f) for f in frames)


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
    if media_type == "video":
        # temporal luminance profile: up to FEATURE_DIM evenly-sampled
        # frames, mean luminance/255 each, zero-padded — the video twin
        # of the image histogram (round 7). SPLIT everything (cheap
        # structure walk) but pixel-DECODE only the sampled frames: a
        # 500-frame payload decodes 8 frames, not 500 (the pure-Python
        # PNG path makes the difference ~60×)
        parts = split_video_frames(payload)
        idx = np.unique(
            np.linspace(0, len(parts) - 1, min(FEATURE_DIM, len(parts))).astype(int)
        )
        sampled = [parts[i] for i in idx]
        if any(f[:2] == b"\xff\xd8" for f in sampled) and _pil_or_none() is None:
            raise NotImplementedError(
                "MJPEG frame decode needs PIL (JPEG entropy decode is not "
                "in the stdlib) — frame SPLITTING and byte-level sampling "
                "still work; use MPNG payloads for a codec-free path"
            )
        out = []
        for f in sampled:
            arr = decode_image(f).astype(np.float64)
            lum = arr if arr.ndim == 2 else arr[..., : min(3, arr.shape[2])].mean(axis=2)
            out.append(float(lum.mean()) / 255.0)
        return out + [0.0] * (FEATURE_DIM - len(out))
    raise NotImplementedError(
        f"real decode for media_type={media_type!r} is not a known codec "
        "(image/audio/video supported)"
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
    if media_type == "video":
        # temporal decimation: keep every factor-th frame's ORIGINAL
        # bytes (no transcode — splitting is stdlib for both flavors,
        # so this works even for MJPEG without PIL)
        frames = split_video_frames(payload)
        return b"".join(frames[::factor])
    raise NotImplementedError(
        f"real resize for media_type={media_type!r} is not a known codec"
    )
