"""On-hardware Pallas-kernel exactness (run on the rig with
``LT_TESTS_TPU=1 python -m pytest tests/test_tpu_hw.py``).

The CPU suite exercises the XLA fallbacks plus interpret-mode kernels
(tests/test_tpu_branch.py); these tests pin the REAL compiled kernels —
stage-1 scan/walk, the pack kernel, BLAKE3, and the anchor scan —
against the host oracle on the chip itself, the ChunkerLargeFile
conformance philosophy (reference test/test.cpp:3363).  Skipped
automatically off-TPU.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs the real chip (LT_TESTS_TPU=1 on the rig)")


def test_device_pipeline_bit_exact_on_tpu():
    """Full chunk+hash pipeline on the chip vs native CDC + BLAKE3."""
    from longtail_tpu.formats.constants import chunker_params_from_target
    from longtail_tpu.ops import blake3, cdc
    from longtail_tpu.parallel.pipeline import DevicePartIndexer

    target = 32768
    indexer = DevicePartIndexer(target)
    B, P = indexer.lanes, indexer.part_bytes
    rng = np.random.default_rng(3)
    # structured lanes: random, periodic, zeros-with-noise-tail
    lanes = []
    lanes.append(rng.integers(0, 256, P, np.uint8))
    tile = rng.integers(0, 256, 4352, np.uint8)
    lanes.append(np.tile(tile, P // 4352 + 1)[:P])
    z = np.zeros(P, np.uint8)
    z[P // 2:] = rng.integers(0, 256, P - P // 2, np.uint8)
    lanes.append(z)
    mn, av, mx = chunker_params_from_target(target)
    parts = [(i, lanes[i % len(lanes)][: P - 13 * i])
             for i in range(B * 2)]
    for (tag, sizes, hashes), (_, data) in zip(
            indexer.index_stream(iter(parts)), parts):
        ends = cdc.chunk_part(data, mn, av, mx)
        ref_sizes = np.diff(np.concatenate([[0], ends]))
        np.testing.assert_array_equal(sizes.astype(np.int64), ref_sizes)
        starts = np.concatenate([[0], ends[:-1]]).astype(np.int64)
        ref = blake3.hash64_ranges(data, starts,
                                   ref_sizes.astype(np.int64))
        np.testing.assert_array_equal(hashes, ref)


def test_anchor_scan_on_tpu_yields_valid_lz4():
    from longtail_tpu.ops import lz4
    from longtail_tpu.parallel.device_lz4 import ROW_BYTES, compress_block

    rng = np.random.default_rng(5)
    tile = rng.integers(0, 256, 24 << 10, np.uint8).tobytes()
    src = (tile * 40 + rng.integers(0, 256, 1 << 20, np.uint8).tobytes()
           )[: 4 * ROW_BYTES]
    out = compress_block(src)
    assert lz4.decompress(out, len(src)) == src
    assert len(out) < len(src) // 2


def test_blake3_kernel_on_tpu_known_answers():
    from longtail_tpu.ops import blake3
    from longtail_tpu.ops.blake3_kernel import hash_chunks_words_device

    rng = np.random.default_rng(9)
    rows, padded = 1024, 4096
    data = rng.integers(0, 256, (rows, padded), np.uint8)
    lengths = rng.integers(1, padded + 1, rows).astype(np.int32)
    for r in range(rows):
        data[r, lengths[r]:] = 0
    words = np.ascontiguousarray(data).view("<u4")
    lo, hi = hash_chunks_words_device(
        jax.device_put(words.astype(np.uint32)),
        jax.device_put(lengths))
    got = np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32))
    want = np.array(
        [blake3.hash64(data[r, : lengths[r]].tobytes())
         for r in range(0, rows, 37)], dtype=np.uint64)
    np.testing.assert_array_equal(got[::37], want)


def test_entropy_pack_kernel_on_tpu():
    """Compiled Pallas bit-merge entropy pack vs the host Huffman
    bitstream, on the chip (CPU CI covers interpret mode only)."""
    from longtail_tpu.ops.device_entropy import _make_hufpack_xla
    from longtail_tpu.ops.entropy_kernel import (
        make_hufpack_rows_fn, pack_code_table)
    from longtail_tpu.ops.zstd_frame import build_huffman

    rng = np.random.default_rng(11)
    S, n_pad = 4, 8192
    lits = rng.choice(
        np.arange(256), size=(S, n_pad),
        p=np.r_[np.full(8, 0.09), np.full(248, 0.28 / 248)]
    ).astype(np.uint8)
    n_lit = np.array([n_pad, n_pad - 257, n_pad, 1311], np.int32)
    for s in range(S):
        lits[s, n_lit[s]:] = 0
    freqs = np.bincount(lits.reshape(-1), minlength=256)
    _, code_val, code_len = build_huffman(freqs.tolist())
    cv = np.zeros(256, np.int32)
    cl = np.zeros(256, np.int32)
    cv[: len(code_val)] = code_val
    cl[: len(code_len)] = code_len
    wx, tx = _make_hufpack_xla(n_pad, 6, S)(lits, n_lit, cv, cl)
    wx, tx = np.asarray(wx), np.asarray(tx)
    wp, tp = make_hufpack_rows_fn(n_pad, S)(
        lits.reshape(-1, 128), n_lit, pack_code_table(cv, cl))
    wp, tp = np.asarray(wp), np.asarray(tp)
    np.testing.assert_array_equal(tx, tp)
    for s in range(S):
        nw = (int(tx[s]) + 31) // 32
        np.testing.assert_array_equal(wx[s, :nw], wp[s, :nw])
