"""Real media codecs, stdlib-only: PNG (zlib/struct), WAV (wave), and
uncompressed AVI (struct over RIFF chunks).

The container has no PIL/ffmpeg, but PNG, WAV, and raw-DIB AVI are
simple enough to decode for real with the standard library — so the
multimodal operators (operators/multimodal.py) get an
honest-to-goodness decode path for all three modalities instead of only
the md5 stubs. Scope (documented, asserted):

- PNG: 8-bit, non-interlaced, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth) on decode; encode writes filter-0 rows.
  This covers everything Pillow's default ``Image.save(..., 'PNG')``
  emits for small images and the overwhelming majority of PNGs in the
  wild that are 8-bit non-interlaced.
- WAV: PCM 16-bit via the stdlib ``wave`` module, any channel count.
- AVI: RIFF/AVI with a single uncompressed 24-bit DIB video stream
  (``BI_RGB`` — raw bottom-up BGR frames, the format every tool emits
  for "uncompressed AVI"). Compressed fourccs (MJPG/H264/...) need a
  real codec library and raise ValueError, loudly.

These run inside Arrow-batched pandas UDFs on executors; per-byte
filter reconstruction is row-sequential by specification (each scanline
filter references the previous scanline), so the Python loop is over
rows, with numpy vectorization within a row where the filter allows.

Reference parity note: the reference pipeline has no media path at all —
this module exists for the LLM-training-pipeline surface (multimodal
columns), per SURVEY.md §6.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (palette counts as 1 index byte pre-expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(payload: bytes | None) -> bool:
    return payload is not None and bytes(payload[:8]) == _PNG_SIG


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"WAVE"
    )


def is_avi(payload: bytes | None) -> bool:
    return (
        payload is not None
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"AVI "
    )


# --- PNG decode -------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (height, width*bpp) uint8."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: sequential in x
            cur = out[y]
            cur[:bpp] = line[:bpp]
            for x in range(bpp, stride):
                cur[x] = (int(line[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:  # Up: whole-row vectorizable
            out[y] = line + prev
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} at row {y}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8. Palette images are
    expanded to RGB. Raises ValueError on non-PNG or unsupported
    variants (16-bit, interlaced)."""
    data = bytes(payload)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        expect_crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != expect_crc:
            raise ValueError(f"PNG: bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"PNG: only 8-bit supported, got depth {depth}")
    if interlace != 0:
        raise ValueError("PNG: interlaced images not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {color_type}")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * bpp)
    if len(raw) != expect:
        raise ValueError(f"PNG: IDAT size {len(raw)} != expected {expect}")
    mat = _unfilter(raw, width, height, bpp).reshape(height, width, bpp)
    if color_type == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        mat = plte[mat[:, :, 0]]
    return mat


# --- PNG encode -------------------------------------------------------


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W) or (H, W, {1,2,3,4}) uint8 → PNG bytes (filter-0 rows)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride_rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    )
    idat = zlib.compress(stride_rows.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the classic index-map formulation)."""
    arr = np.asarray(pixels)
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


# --- WAV --------------------------------------------------------------


def encode_wav(samples: np.ndarray, framerate: int = 16000) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 → WAV (PCM16) bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, channels) int16 samples, framerate).
    PCM 16-bit only (the stdlib ``wave`` contract)."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"WAV: only PCM16 supported, width {wf.getsampwidth()}")
        n = wf.getnframes()
        rate = wf.getframerate()
        ch = wf.getnchannels()
        arr = np.frombuffer(wf.readframes(n), dtype=np.int16).reshape(-1, ch)
    return arr, rate


# --- real feature extraction -----------------------------------------


def png_features(payload: bytes, dim: int = 8) -> tuple[int, int, int, float, list[float]]:
    """Real image decode → (width, height, n_frames, duration_s,
    feature). Feature = per-channel mean/std of actual pixels (scaled to
    [0,1]) padded/truncated to ``dim`` — a deterministic stand-in for a
    learned encoder that is nonetheless a function of the REAL pixels."""
    mat = decode_png(payload).astype(np.float64) / 255.0
    h, w = mat.shape[:2]
    means = mat.reshape(-1, mat.shape[2]).mean(axis=0)
    stds = mat.reshape(-1, mat.shape[2]).std(axis=0)
    feat = [round(float(v), 6) for v in np.concatenate([means, stds])]
    feat = (feat + [0.0] * dim)[:dim]
    return w, h, 1, 0.0, feat


def wav_features(payload: bytes, dim: int = 8) -> tuple[int, int, int, float, list[float]]:
    """Real audio decode → (0, 0, n_frames, duration_s, feature).
    Feature = RMS energy of ``dim`` equal time chunks (mono mixdown,
    scaled to [0,1]) — the shape a CLAP-style encoder slot expects."""
    arr, rate = decode_wav(payload)
    n = arr.shape[0]
    duration = round(n / float(rate), 3)
    mono = arr.astype(np.float64).mean(axis=1) / 32768.0
    # array_split handles n < dim itself (some chunks come back empty
    # and the len(c) guard zeroes them) — a short clip keeps its real
    # RMS values instead of being misfeaturized as silence
    chunks = np.array_split(mono, dim) if n > 0 else []
    feat = [
        round(float(np.sqrt(np.mean(c * c))), 6) if len(c) else 0.0 for c in chunks
    ]
    feat = (feat + [0.0] * dim)[:dim]
    return 0, 0, n, duration, feat


# --- AVI (uncompressed DIB) ------------------------------------------


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + body (+ pad to even)."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(fourcc: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", fourcc + body)


def encode_avi(frames: np.ndarray, fps: int = 30) -> bytes:
    """(n_frames, H, W, 3) uint8 RGB → uncompressed AVI bytes (one
    'vids' stream of BI_RGB 24-bit DIB frames: bottom-up BGR rows,
    stride padded to 4 bytes — the canonical raw-AVI layout)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"encode_avi wants (n, H, W, 3) uint8, got {arr.shape}")
    n, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[::-1, :, ::-1]  # bottom-up rows, RGB->BGR
        if stride == w * 3:
            return bgr.tobytes()
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return padded.tobytes()

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10=AVIF_HASINDEX — we write idx1 below
        n, 0, 1,           # dwTotalFrames, dwInitialFrames, dwStreams
        frame_size,        # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,  # dwWidth, dwHeight, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"DIB ",
        0, 0, 0, 0,        # dwFlags, wPriority, wLanguage, dwInitialFrames
        1, fps,            # dwScale, dwRate (rate/scale = fps)
        0, n,              # dwStart, dwLength (frames)
        frame_size,        # dwSuggestedBufferSize
        -1, 0,             # dwQuality, dwSampleSize
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,   # biSize, biWidth, biHeight(bottom-up), biPlanes, biBitCount
        0,                 # biCompression = BI_RGB (uncompressed)
        frame_size, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"".join(_riff_chunk(b"00db", dib(arr[i])) for i in range(n))
    movi = _riff_list(b"movi", movi_body)
    # idx1: one entry per frame (fourcc, flags=KEYFRAME, offset, size)
    idx_entries = []
    off = 4  # offsets are relative to the start of 'movi' fourcc data
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_size))
        off += 8 + frame_size + (frame_size % 2)
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_riff(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in [pos, end)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, length
        pos += 8 + length + (length % 2)


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes → ((n_frames, H, W, 3) uint8 RGB, fps). The VIDEO
    stream must be uncompressed 24-bit DIB ('DIB '/BI_RGB — both
    bottom-up and top-down biHeight); compressed fourccs raise
    ValueError. Stream-aware: other streams (e.g. an audio track) may
    precede the video stream — strf is parsed only for the 'vids'
    stream's strl, and frame chunks are matched by that stream's index
    ('NNdb'/'NNdc'), so a video-as-stream-1 file decodes correctly
    instead of silently yielding zero frames."""
    data = bytes(payload)
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF signature)")
    width = height = None
    bit_count = compression = None
    top_down = False
    scale = rate = None
    usec_per_frame = None
    stream_count = 0
    vids_idx: int | None = None
    expect_video_strf = False
    frames_raw: list[bytes] = []

    def walk_list(pos: int, end: int) -> None:
        nonlocal width, height, bit_count, compression, top_down
        nonlocal scale, rate, usec_per_frame
        nonlocal stream_count, vids_idx, expect_video_strf
        for fourcc, body, length in _walk_riff(data, pos, end):
            if fourcc == b"LIST":
                walk_list(body + 4, body + length)  # skip list-type fourcc
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", data[body : body + 56])
                usec_per_frame = vals[0]
            elif fourcc == b"strh":
                if data[body : body + 4] == b"vids" and vids_idx is None:
                    vids_idx = stream_count
                    vals = struct.unpack("<IIII", data[body + 20 : body + 36])
                    scale, rate = vals[0], vals[1]
                    expect_video_strf = True
                else:
                    expect_video_strf = False
                stream_count += 1
            elif fourcc == b"strf" and expect_video_strf:
                # the strf belonging to the vids strh just seen — never
                # an audio WAVEFORMATEX misread as a BITMAPINFOHEADER
                (_, bw, bh, _, bc, comp) = struct.unpack(
                    "<IiiHHI", data[body : body + 20]
                )
                bit_count, compression = bc, comp
                width, height = bw, abs(bh)
                top_down = bh < 0  # negative biHeight = rows stored top-down
                expect_video_strf = False
            elif (
                vids_idx is not None
                and fourcc[:2] == b"%02d" % vids_idx
                and fourcc[2:4] in (b"db", b"dc")
            ):
                frames_raw.append(data[body : body + length])

    walk_list(12, len(data))
    if vids_idx is None:
        raise ValueError("AVI: no 'vids' stream header found")
    if width is None or height is None:
        raise ValueError("AVI: missing video strf header")
    if compression not in (0, None):
        raise ValueError(
            f"AVI: compressed stream (biCompression={compression:#x}); "
            "only BI_RGB uncompressed DIB is supported"
        )
    if bit_count != 24:
        raise ValueError(f"AVI: only 24-bit DIB supported, got {bit_count}")
    stride = (width * 3 + 3) & ~3
    out = np.zeros((len(frames_raw), height, width, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < stride * height:
            raise ValueError(
                f"AVI: frame {i} has {len(raw)} bytes, expected {stride * height}"
            )
        mat = np.frombuffer(raw, dtype=np.uint8, count=stride * height).reshape(
            height, stride
        )[:, : width * 3].reshape(height, width, 3)
        bgr = mat if top_down else mat[::-1]  # bottom-up rows -> top-down
        out[i] = bgr[:, :, ::-1]  # BGR -> RGB
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    else:
        fps = 30.0
    return out, float(fps)


def avi_features(payload: bytes, dim: int = 8) -> tuple[int, int, int, float, list[float]]:
    """Real video decode → (width, height, n_frames, duration_s,
    feature). Feature = mean luminance (Rec.601 weights, scaled [0,1])
    of ``dim`` equal TEMPORAL chunks — the per-segment brightness
    profile a video encoder slot expects, computed from real pixels."""
    frames, fps = decode_avi(payload)
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    duration = round(n / fps, 3) if fps > 0 else 0.0
    if n == 0:
        return w, h, 0, 0.0, [0.0] * dim
    luma = (
        frames[:, :, :, 0] * 0.299
        + frames[:, :, :, 1] * 0.587
        + frames[:, :, :, 2] * 0.114
    ).reshape(n, -1).mean(axis=1) / 255.0
    chunks = np.array_split(luma, dim)
    feat = [round(float(c.mean()), 6) if len(c) else 0.0 for c in chunks]
    feat = (feat + [0.0] * dim)[:dim]
    return w, h, n, duration, feat
