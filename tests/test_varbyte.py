"""Codec unit/property tests (reference Lexicon.cpp:9-41,131-146)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cs6913_web_search_engines_spark.functions import varbyte


def rt(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    return varbyte.decode(varbyte.encode(arr), arr.size)


@pytest.mark.parametrize(
    "vals",
    [
        [0],
        [127],
        [128],
        [16383, 16384],
        [2**28 - 1, 2**28],
        [2**32 - 1],
        [0, 1, 127, 128, 255, 300, 2**21, 2**28, 2**31],
        [],
    ],
)
def test_roundtrip_boundaries(vals):
    assert rt(vals).tolist() == vals


def test_zero_is_one_byte():
    # Deviation from the reference (whose varbyteEncode emits nothing
    # for 0, Lexicon.cpp:11 — documented SURVEY §2.12.3): ours is total.
    assert varbyte.encode(np.array([0], dtype=np.uint64)) == b"\x00"


def test_wire_format_little_endian_7bit():
    # 300 = 0b10_0101100 → bytes [0xAC|0x80, 0x02] (low group first,
    # continuation bit on all but last) — same wire as the reference.
    assert varbyte.encode(np.array([300], dtype=np.uint64)) == bytes([0xAC, 0x02])
    assert varbyte.encode(np.array([127], dtype=np.uint64)) == bytes([0x7F])
    assert varbyte.encode(np.array([128], dtype=np.uint64)) == bytes([0x80, 0x01])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_roundtrip_property(vals):
    assert rt(vals).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500),
    st.sampled_from([1, 2, 64, 7]),
)
def test_delta_roundtrip(gaps_src, chunk):
    # build a strictly increasing docID list
    doc_ids = np.cumsum(np.asarray(gaps_src, dtype=np.int64) + 1)
    gaps = varbyte.delta_encode(doc_ids, chunk)
    # chunk-leading entries are absolute (reference resets prevDocId,
    # Lexicon.cpp:143-146)
    assert (gaps[0::chunk] == doc_ids[0::chunk]).all()
    back = varbyte.delta_decode(gaps, chunk)
    assert (back == doc_ids).all()


def test_chunk_independence():
    # any suffix of whole chunks decodes standalone
    doc_ids = np.arange(10, 1000, 7, dtype=np.int64)
    chunk = 64
    gaps = varbyte.delta_encode(doc_ids, chunk)
    back = varbyte.delta_decode(gaps[chunk:], chunk)
    assert (back == doc_ids[chunk:]).all()
