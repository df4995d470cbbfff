"""Pure-stdlib media codecs for the multimodal pipeline (driver mandate).

No image/audio libraries ship in this container, so the decoders are
implemented from the public container specs directly on stdlib + numpy:

- PNG (ISO/IEC 15948): chunk walk, IHDR parse, zlib-inflated IDAT,
  scanline unfiltering (filters 0-4) — supports non-interlaced 8-bit
  grayscale / RGB / RGBA, which covers the synthetic corpus and common
  training data; interlaced/16-bit/palette images raise ValueError.
- WAV (RIFF PCM): stdlib ``wave`` for framing, numpy for sample decode
  (16-bit PCM).
- Y4M (YUV4MPEG2, the mjpegtools/ffmpeg raw-video stream format): text
  stream header + FRAME markers + raw planes; luma-only and 4:2:0
  streams decode to real per-frame arrays. Compressed video codecs
  (H.264/VP9/...) remain the one seam that needs an external decoder.

Encoders exist so the synthetic media generator produces REAL container
bytes — the decode path in operators/multimodal.py is exercised end-to-end
with no fake seam for these two modalities.

All functions are plain bytes→dict/ndarray transforms: they run inside
Arrow-batched ``mapInPandas`` workers, never on the driver, and hold one
image/clip at a time (bounded memory per the batch-size knob upstream).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples per pixel


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 array (C=1 gray, 3 RGB, 4 RGBA)."""
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={bit_depth} color={color_type} "
                    f"interlace={interlace} (8-bit non-interlaced gray/RGB/RGBA only)"
                )
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: scanline size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros_like(lines)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        f, line = int(filters[y]), lines[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            out[y] = line
        elif f == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            out[y] = line + prev
        elif f == 1:  # Sub — per-byte-lane prefix sum mod 256, vectorized
            lanes = line.reshape(-1, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f in (3, 4):  # Average / Paeth depend on up+left — serial,
            # plain-int arithmetic (numpy uint8 scalar ops would warn on
            # every wrap and run slower)
            cur = bytearray(stride)
            prev_l = prev.tolist()
            line_l = line.tolist()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev_l[x]
                if f == 3:
                    cur[x] = (line_l[x] + (left + up) // 2) & 0xFF
                else:
                    ul = prev_l[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    cur[x] = (line_l[x] + pred) & 0xFF
            out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """HxWxC (or HxW) uint8 array → PNG bytes (filter 0, one IDAT)."""
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, channels = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((height, 1), dtype=np.uint8), img.reshape(height, -1)], axis=1
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (16-bit PCM)
# ---------------------------------------------------------------------------

def is_y4m(data: bytes) -> bool:
    return data[:9] == b"YUV4MPEG2"


def decode_y4m(data: bytes) -> dict:
    """YUV4MPEG2 bytes → dict(width, height, fps, n_frames, duration_ms,
    frames: N×H×W uint8 luma array).

    Y4M (the yuv4mpeg stream format of the mjpegtools/ffmpeg ecosystem) is
    an uncompressed container: a text stream header, then per-frame FRAME
    markers + raw planes. ``Cmono`` (luma-only) and ``C420``-family
    streams are supported; compressed codecs (H.264 etc.) remain outside
    the stdlib seam."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream: bad magic")
    nl = data.index(b"\n")
    params = data[9:nl].split()
    width = height = None
    fps_num, fps_den = 25, 1
    chroma = "420"
    for p in params:
        tag, val = chr(p[0]), p[1:].decode()
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            fps_num, fps_den = (int(x) for x in val.split(":"))
        elif tag == "C":
            chroma = val
    if not width or not height:
        raise ValueError("truncated Y4M: missing W/H")
    if not (chroma.startswith("mono") or chroma.startswith("420")):
        # C422/C444 have different frame sizes — reject explicitly instead
        # of mis-striding into the planes and reporting 'corrupt'
        raise ValueError(f"unsupported Y4M chroma {chroma!r} (mono/420 only)")
    luma_size = width * height
    frame_size = luma_size if chroma.startswith("mono") else luma_size * 3 // 2
    pos, frames = nl + 1, []
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: missing FRAME marker")
        pos = data.index(b"\n", pos) + 1
        plane = np.frombuffer(data[pos:pos + luma_size], dtype=np.uint8)
        if len(plane) < luma_size:
            raise ValueError("truncated Y4M frame")
        frames.append(plane.reshape(height, width))
        pos += frame_size
    fps = fps_num / fps_den
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "duration_ms": int(round(len(frames) * 1000 / fps)),
        "frames": np.stack(frames) if frames else np.zeros((0, height, width), np.uint8),
    }


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """N×H×W uint8 luma array → luma-only (Cmono) YUV4MPEG2 bytes."""
    n, height, width = frames.shape
    header = f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 Cmono\n"
    out = [header.encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].astype(np.uint8).tobytes())
    return b"".join(out)


def decode_wav(data: bytes) -> dict:
    """WAV bytes → dict(sample_rate, n_channels, n_samples, duration_ms,
    samples: float64 ndarray in [-1, 1]). Multi-channel audio is downmixed
    to mono (channel mean) so ``len(samples) == n_samples`` always holds —
    interleaved samples would silently disagree with the frame count."""
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate, n_ch, n_frames = w.getframerate(), w.getnchannels(), w.getnframes()
        pcm = np.frombuffer(w.readframes(n_frames), dtype="<i2")
    samples = pcm.astype(np.float64) / 32768.0
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_samples": n_frames,
        "duration_ms": int(round(n_frames * 1000 / rate)),
        "samples": samples,
    }


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float array in [-1, 1] → 16-bit PCM mono WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()
