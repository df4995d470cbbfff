"""Property-based codec tests (hypothesis): the stdlib PNG/WAV/Y4M codecs
must roundtrip ARBITRARY well-formed inputs losslessly (PNG/Y4M) or within
quantization error (WAV) — not just the synthetic generator's patterns.
Pure-Python, no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hypertrace_ingester_spark.functions import codecs


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_image(h, w, c, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([4000, 8000, 16000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_clip(n, rate, seed):
    rng = np.random.RandomState(seed)
    samples = rng.uniform(-1.0, 1.0, size=n)
    wav = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert wav["sample_rate"] == rate and wav["n_samples"] == n
    assert np.abs(wav["samples"] - samples).max() < 2 / 32768


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 12),
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    fps=st.sampled_from([1, 2, 25, 30]),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_any_stream(n, h, w, fps, seed):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=(n, h, w), dtype=np.uint8)
    vid = codecs.decode_y4m(codecs.encode_y4m(frames, fps, 1))
    assert vid["n_frames"] == n and vid["fps"] == fps
    assert (vid["frames"] == frames).all()


def _encode_png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference PNG encoder applying an explicit filter per scanline
    (spec arithmetic in plain ints) — exercises decode paths the repo's
    filter-0 encoder never produces."""
    import struct
    import zlib

    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(int)
    out = bytearray()
    prev = [0] * stride
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y].tolist()
        recon = line  # reconstructed bytes of this row (= original)
        filt = []
        for x in range(stride):
            left = recon[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt.append((line[x] - pred) & 0xFF)
        out.append(f)
        out.extend(filt)
        prev = recon

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        codecs.PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(2, 16),
    w=st.integers(2, 16),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
)
def test_png_decode_all_filter_types(h, w, c, seed, filters):
    """Sub/Up/Average/Paeth-filtered scanlines (what libpng really emits)
    decode identically to the reference spec arithmetic."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    data = _encode_png_with_filters(img, filters)
    out = codecs.decode_png(data)
    assert out.shape == img.shape and (out == img).all()
