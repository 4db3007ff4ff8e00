"""Property-based tests (hypothesis) for the schema-repair library —
SURVEY §7.3.2 requires the normalization pass to be total (never throw on
arbitrary scraped headers) and idempotent (re-running a repair changes
nothing). Pure-Python properties: no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nba_data_pipeline_spark.functions.extract import ODDS_PATTERN  # noqa: F401
from nba_data_pipeline_spark.operators.normalize import (
    canonical_name,
    flatten_header,
    uniquify,
)

header_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@given(header_text)
@settings(max_examples=300, deadline=None)
def test_canonical_name_total_and_clean(name):
    out = canonical_name(name)
    assert isinstance(out, str) and out  # total: never raises, never empty
    assert "%" not in out  # '%' always rewritten
    assert not any(ch.isspace() for ch in out)  # whitespace collapsed to sep


@given(header_text)
@settings(max_examples=300, deadline=None)
def test_canonical_name_idempotent(name):
    once = canonical_name(name)
    assert canonical_name(once) == once


@given(st.lists(header_text, max_size=20))
@settings(max_examples=200, deadline=None)
def test_uniquify_unique_and_stable(names):
    out = uniquify(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out)  # all distinct
    # first occurrence of each name is preserved verbatim
    seen = set()
    for src, dst in zip(names, out):
        if src not in seen:
            assert dst == src
            seen.add(src)


@given(st.lists(header_text, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_flatten_header_total(parts):
    out = flatten_header(parts)
    assert isinstance(out, str) and out


# ---------------------------------------------------------------------------
# Real-codec roundtrip properties (pure Python, no Spark): for ARBITRARY
# content bytes and dimensions, encode -> decode must reproduce the payload
# exactly. The catalog exercises fixed 8x4/48-sample shapes; these pin the
# codecs across the whole parameter space.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from nba_data_pipeline_spark.operators.multimodal import (
    decode_nvid,
    decode_png,
    decode_wav,
    encode_nvid,
    encode_png,
    encode_wav,
)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
def test_png_roundtrip_any_dims_any_bytes(w, h, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    width, height, out = decode_png(encode_png(w, h, pixels))
    assert (width, height) == (w, h)
    assert out == pixels


@settings(max_examples=50, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    n_ch=st.integers(min_value=1, max_value=2),
    n_samples=st.integers(min_value=1, max_value=64),
    data=st.data(),
)
def test_wav_roundtrip_any_rate_channels_pcm(rate, n_ch, n_samples, data):
    n_bytes = n_samples * n_ch * 2
    pcm = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n_bytes, max_size=n_bytes))
    )
    r, ch, dur_ms, out = decode_wav(encode_wav(rate, n_ch, pcm))
    assert (r, ch) == (rate, n_ch)
    assert out == pcm
    assert dur_ms == n_samples * 1000 // rate


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=8),
        ),
        min_size=1,
        max_size=4,
    ),
    data=st.data(),
)
def test_nvid_roundtrip_variable_frame_dims(frames, data):
    payload_frames = []
    for w, h in frames:
        n = w * h * 3
        px = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
        )
        payload_frames.append((w, h, px))
    w, h, n_frames, pixels = decode_nvid(encode_nvid(payload_frames))
    # decode_nvid reports the LAST frame's dims and concatenates all pixels
    assert (w, h) == (payload_frames[-1][0], payload_frames[-1][1])
    assert n_frames == len(payload_frames)
    assert pixels == b"".join(px for _, _, px in payload_frames)
