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
