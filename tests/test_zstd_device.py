"""Device-assisted zstd (anchor scan + native sequence walk + libzstd
ZSTD_compressSequences): standard frames, bit-exact decode through both
the system library and the from-spec decoder, size at least at
upstream-level-3 parity on a corpus with long-range structure."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from longtail_tpu.ops import zstd, zstd_device, zstd_frame  # noqa: E402


def _corpus(n):
    rng = np.random.default_rng(11)
    text = (b"the quick brown fox jumps over the lazy dog; pack box. "
            * 4000)
    tile = rng.integers(0, 256, 24 << 10, np.uint8).tobytes() * 20
    noise = rng.integers(0, 256, 1 << 19, np.uint8).tobytes()
    unit = text + bytes(1 << 18) + tile + noise
    return (unit * (n // len(unit) + 1))[:n]


@pytest.mark.skipif(zstd_device._zstd_api() is None,
                    reason="libzstd ZSTD_compressSequences unavailable")
def test_device_zstd_roundtrips_and_beats_level3_window():
    src = _corpus(4 << 20)
    host3 = zstd.compress(src, 3)
    # default tier: TPU anchors + TPU Huffman literals + from-spec frame
    # (no libzstd in the encode path).  Predefined FSE sequence tables
    # give up a hair vs libzstd's per-block optimal ones: within 0.5%.
    out = zstd_device.compress_block(src)
    assert zstd.decompress(out, len(src)) == src
    assert zstd_frame.decompress(out, len(src)) == src
    assert len(out) <= 1.005 * len(host3), (len(out), len(host3))
    # libzstd entropy tier: the whole-block window catches the
    # cross-unit repeats level 3's default window misses — no larger
    out2 = zstd_device.compress_block(src, entropy="libzstd")
    assert zstd.decompress(out2, len(src)) == src
    assert len(out2) <= len(host3), (len(out2), len(host3))


@pytest.mark.skipif(zstd_device._zstd_api() is None,
                    reason="libzstd ZSTD_compressSequences unavailable")
def test_device_zstd_edge_shapes():
    rng = np.random.default_rng(3)
    for src in [bytes(2 << 20),                      # pure zeros
                rng.integers(0, 256, 2 << 20, np.uint8).tobytes(),  # noise
                rng.integers(0, 256, 130000, np.uint8).tobytes(),
                b"x" * 100]:                         # sub-row -> host path
        out = zstd_device.compress_block(src)
        assert zstd.decompress(out, len(src)) == src


def test_sequence_walk_validates_bogus_anchors():
    """Garbage anchors must never corrupt the sequence set: the walk
    memcmp-rejects them and whatever survives round-trips."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, 200000, np.uint8).tobytes()
    apos = rng.integers(0, 199000, 500).astype(np.int64)
    apos.sort()
    aref = np.maximum(apos - rng.integers(1, 60000, 500), 0).astype(np.int64)
    seqs = zstd_device.sequences_from_anchors(src, apos, aref)
    # every surviving sequence references genuinely identical bytes
    cursor = 0
    for off, ll, ml, rep in seqs:
        p = cursor + int(ll)
        assert src[p:p + int(ml)] == src[p - int(off):p - int(off) + int(ml)]
        cursor = p + int(ml)
    if zstd_device._zstd_api() is not None:
        out = zstd_device.compress_sequences(src, seqs)
        if out is not None:
            assert zstd.decompress(out, len(src)) == src


def test_py_sequences_matches_native():
    src = _corpus(1 << 20)
    from longtail_tpu.parallel.device_match import fast_block_anchors

    words = jax.device_put(
        np.frombuffer(src, "<u4"))
    (apos, aref), = fast_block_anchors(
        words, len(src) // 4, max_offset_words=len(src) // 4)
    native = zstd_device.sequences_from_anchors(src, apos, aref)
    py = zstd_device._py_sequences(src, apos, aref, 1 << 20)
    np.testing.assert_array_equal(native, py)
