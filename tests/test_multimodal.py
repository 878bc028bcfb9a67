"""Multimodal codec + plumbing tests.

The codecs (llm/codecs.py) are REAL BMP / RIFF-WAVE implementations; they
are pinned here against hand-built byte strings the encoders never produce
(top-down BMPs, WAVs with extra chunks before `data`), then the Spark-side
mapInPandas contracts (schema, fan-out keys, determinism) are asserted on
the registered queries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from recsys_spark_spark.llm import codecs
from recsys_spark_spark.llm.multimodal import FRAME_SIZE, FRAME_STRIDE, RESIZE_TARGET
from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()


# --- codec unit pins (no Spark) -------------------------------------------


def _hand_built_bmp_2x2() -> bytes:
    """A 2x2 24-bit BMP built byte-by-byte from the spec, NOT via
    encode_bmp. Pixels (row 0 = top): [(255,0,0), (0,255,0)] /
    [(0,0,255), (255,255,255)]. Stored bottom-up, BGR, rows padded 6->8."""
    row_bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # BGR + pad
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    img = row_bottom + row_top  # bottom-up: last image row first
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(img), 0, 0, 0, 0)
    return header + info + img


def test_decode_bmp_hand_built():
    px = codecs.decode_bmp(_hand_built_bmp_2x2())
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert px.shape == (2, 2, 3)
    assert (px == expect).all()


def test_decode_bmp_top_down():
    # same image declared with negative height (top-down row order)
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    row_bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
    img = row_top + row_bottom
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(img), 0, 0, 0, 0)
    px = codecs.decode_bmp(header + info + img)
    assert (px == codecs.decode_bmp(_hand_built_bmp_2x2())).all()


def test_decode_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"PNG\x00not a bmp at all" * 4)
    # 8-bit palettized is a real BMP variant we deliberately don't support
    header = struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 4, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        codecs.decode_bmp(header + info + b"\x00" * 4)


def test_bmp_roundtrip_padding_and_order():
    # 3-wide rows force padding (9 -> 12); gradient exposes row flips
    px = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(5, 3, 3)
    assert (codecs.decode_bmp(codecs.encode_bmp(px)) == px).all()


def _hand_built_wav(samples: list[int], with_extra_chunk: bool = False) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if with_extra_chunk:  # a LIST chunk the walker must skip (odd size -> pad)
        body += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_hand_built_with_chunk_walk():
    vals = [0, 1000, -1000, 32767, -32768]
    rate, samples = codecs.decode_wav(_hand_built_wav(vals, with_extra_chunk=True))
    assert rate == 8000
    assert samples.tolist() == vals


def test_decode_wav_rejects_stereo():
    data = struct.pack("<4h", 0, 0, 0, 0)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # 2 channels
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_roundtrip():
    arr = codecs.samples_from_bytes(b"hello wav", min_samples=300)
    rate, back = codecs.decode_wav(codecs.encode_wav(arr, rate=16000))
    assert rate == 16000
    assert (back == arr).all()


def test_resize_nearest_known_mapping():
    # 4x2 -> long edge 2: scale 0.5 -> 2x1; center sampling picks
    # src cols {1, 3} of src row 0
    px = np.array([[[i, i, i] for i in (10, 20, 30, 40)]], dtype=np.uint8)
    px = np.vstack([px, px + 100])  # 2 rows: values +100 in row 1
    out = codecs.resize_nearest(px, 2)
    assert out.shape == (1, 2, 3)
    assert out[0, 0, 0] == 120 and out[0, 1, 0] == 140  # row 1 (center), cols 1,3


def test_resize_upscales_small_images():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    out = codecs.resize_nearest(px, 9)
    assert out.shape == (6, 9, 3)


# --- Spark plumbing contracts ---------------------------------------------


def test_features_means_match_numpy(spark):
    rows = QUERIES["q_multimodal_features"](spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:20]:
        px = codecs.pixels_from_bytes(docs[r.doc_id].encode("utf-8"))
        h, w, _ = px.shape
        assert (r.width, r.height) == (w, h)
        sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert r.mean_r == round(float(sums[0]) / (h * w), 6)
        assert r.mean_g == round(float(sums[1]) / (h * w), 6)
        assert r.mean_b == round(float(sums[2]) / (h * w), 6)
        assert r.payload_bytes == len(codecs.encode_bmp(px))


def test_frames_fan_out_and_rms(spark):
    rows = QUERIES["q_multimodal_frames"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.frame_idx % FRAME_STRIDE == 0
        assert 1 <= r.n_samples <= FRAME_SIZE
        assert 0.0 <= r.rms <= 32768.0
    # spot-check one document's frames end-to-end
    doc = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").first()
    wav = codecs.encode_wav(codecs.samples_from_bytes(doc.text.encode("utf-8")))
    _, samples = codecs.decode_wav(wav)
    got = sorted(
        (r.frame_idx, r.rms) for r in rows if r.doc_id == doc.doc_id
    )
    n_frames = -(-len(samples) // FRAME_SIZE)
    assert [i for i, _ in got] == list(range(0, n_frames, FRAME_STRIDE))


def test_resize_preserves_contracts(spark):
    rows = QUERIES["q_multimodal_resize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # long edge hits the target, dims stay positive, payload is a real
        # BMP that decodes back to exactly (out_h, out_w)
        assert max(r.out_w, r.out_h) == RESIZE_TARGET, r
        assert r.out_w >= 1 and r.out_h >= 1, r
        assert r.out_bytes == len(r.resized), r
    px = codecs.decode_bmp(bytes(rows[0].resized))
    assert px.shape == (rows[0].out_h, rows[0].out_w, 3)


def test_resize_is_deterministic_across_runs(spark):
    a = {r.doc_id: bytes(r.resized) for r in QUERIES["q_multimodal_resize"](spark, SF_SMOKE).collect()}
    b = {r.doc_id: bytes(r.resized) for r in QUERIES["q_multimodal_resize"](spark, SF_SMOKE).collect()}
    assert a == b


# --- property tests: any image/stream round-trips ------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp(px)) == px).all()


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=n, dtype=np.int16)
    got_rate, back = codecs.decode_wav(codecs.encode_wav(samples, rate=rate))
    assert got_rate == rate
    assert (back == samples).all()


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    target=st.integers(1, 64),
)
def test_resize_dims_property(h, w, target):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    out = codecs.resize_nearest(px, target)
    oh, ow, _ = out.shape
    assert max(ow, oh) == target or (max(ow, oh) == 1 and target >= 1)
    assert ow >= 1 and oh >= 1
    # aspect preserved within rounding
    assert abs(ow / oh - w / h) <= max(w, h)  # sanity bound, exact below
    exact_ow = max(1, round(w * target / max(w, h)))
    exact_oh = max(1, round(h * target / max(w, h)))
    assert (ow, oh) == (exact_ow, exact_oh)
