import numpy as np
import pytest

from searchengine_ray.codec import (
    decode_segmented,
    decode_sorted,
    delta_decode,
    delta_encode,
    encode_segmented,
    encode_sorted,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_small():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v.astype(np.int64))


def test_varbyte_roundtrip_random():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 2**40, size=10000, dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)) == b""
    assert len(varbyte_decode(b"")) == 0


def test_delta_roundtrip():
    v = np.array([3, 7, 7 + 100, 500, 501], dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(v)), v)


def test_sorted_roundtrip():
    rng = np.random.default_rng(1)
    v = np.unique(rng.integers(0, 10**9, size=5000))
    assert np.array_equal(decode_sorted(encode_sorted(v)), v)


@pytest.mark.parametrize("n_runs", [1, 2, 7])
def test_segmented_roundtrip(n_runs):
    rng = np.random.default_rng(n_runs)
    runs = [np.sort(rng.choice(1000, size=rng.integers(1, 30), replace=False)) for _ in range(n_runs)]
    values = np.concatenate(runs).astype(np.int64)
    offsets = np.zeros(n_runs + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([len(r) for r in runs])
    out = decode_segmented(encode_segmented(values, offsets), offsets)
    assert np.array_equal(out, values)


hypothesis = pytest.importorskip("hypothesis")
if hypothesis:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=10**6),
                min_size=0, max_size=20,
            ),
            min_size=1, max_size=12,
        )
    )
    def test_segmented_roundtrip_property(raw_runs):
        runs = [np.unique(np.asarray(r, dtype=np.int64)) for r in raw_runs]
        values = (
            np.concatenate(runs) if runs else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        offsets = np.zeros(len(runs) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum([len(r) for r in runs])
        out = decode_segmented(encode_segmented(values, offsets), offsets)
        assert np.array_equal(out, values)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**45), max_size=200)
    )
    def test_varbyte_roundtrip_property(xs):
        v = np.asarray(xs, dtype=np.int64)
        assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_segmented_zero_length_runs():
    # empty runs duplicate a run-start offset; the run after an empty run
    # must NOT inherit the previous run's prefix (carry-adjustment bug)
    runs = [[5, 9, 40], [], [3, 4], [], [], [7], []]
    values = np.array([x for r in runs for x in r], dtype=np.int64)
    offsets = np.zeros(len(runs) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([len(r) for r in runs])
    out = decode_segmented(encode_segmented(values, offsets), offsets)
    assert np.array_equal(out, values)


def test_compression_is_compact():
    # dense ascending ids -> ~1 byte per gap
    v = np.arange(0, 100000, 3, dtype=np.int64)
    assert len(encode_sorted(v)) < len(v) * 1.1
