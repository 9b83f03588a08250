"""Pallas bit-merge entropy kernel (ops/entropy_kernel.py) vs the XLA
scatter oracle: identical backward Huffman bitstreams for every stream,
including partial fills and degenerate (single-run) rows.

Off-TPU the kernel runs in Pallas interpret mode — slow but exact; the
same comparison runs ON the chip via tests/test_tpu_hw.py."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from longtail_tpu.ops.device_entropy import _make_hufpack_xla  # noqa: E402
from longtail_tpu.ops.entropy_kernel import (  # noqa: E402
    MIN_PALLAS_PAD,
    make_hufpack_rows_fn,
    pack_code_table,
    words_pad,
)
from longtail_tpu.ops.zstd_frame import build_huffman  # noqa: E402


def _codes(lits):
    freqs = np.bincount(lits.reshape(-1), minlength=256)
    built = build_huffman(freqs.tolist())
    assert built is not None
    _, code_val, code_len = built
    cv = np.zeros(256, np.int32)
    cl = np.zeros(256, np.int32)
    cv[: len(code_val)] = code_val
    cl[: len(code_len)] = code_len
    return cv, cl


def _check(lits, n_lit):
    S, n_pad = lits.shape
    cv, cl = _codes(lits)
    wx, tx = _make_hufpack_xla(n_pad, 6, S)(lits, n_lit, cv, cl)
    wx, tx = np.asarray(wx), np.asarray(tx)
    rows = lits.reshape(S * (n_pad // 128), 128)
    wp, tp = make_hufpack_rows_fn(n_pad, S)(
        rows, n_lit, pack_code_table(cv, cl))
    wp, tp = np.asarray(wp), np.asarray(tp)
    np.testing.assert_array_equal(tx, tp)
    for s in range(S):
        nw = (int(tx[s]) + 31) // 32
        np.testing.assert_array_equal(wx[s, :nw], wp[s, :nw])


@pytest.mark.parametrize("s,n_pad,fill", [
    (1, 1024, 1024), (2, 1024, 977), (3, 2048, 1500), (2, 4096, 4096),
])
def test_kernel_matches_xla_oracle(s, n_pad, fill):
    assert n_pad >= MIN_PALLAS_PAD
    rng = np.random.default_rng(fill)
    lits = rng.choice(
        np.arange(256), size=(s, n_pad),
        p=np.r_[np.full(8, 0.09), np.full(248, 0.28 / 248)]
    ).astype(np.uint8)
    n_lit = np.full((s,), fill, np.int32)
    n_lit[-1] = max(1, fill - 129)          # ragged final stream
    for i in range(s):
        lits[i, n_lit[i]:] = 0
    _check(lits, n_lit)


def test_kernel_skewed_code_lengths():
    """A near-degenerate distribution exercises 1-bit codes (max window
    occupancy) and 11-bit codes (max spill) in the same stream."""
    rng = np.random.default_rng(9)
    lits = rng.choice(
        np.arange(256), size=(2, 2048),
        p=np.r_[[0.75], np.full(255, 0.25 / 255)]
    ).astype(np.uint8)
    _check(lits, np.array([2048, 2048], np.int32))


def test_words_pad_slack_covers_rmw():
    """The tile-window RMW touches at most HF+1 rows past the last data
    row and the totals row is the final row — words_pad must cover."""
    for n_pad in (1024, 4096, 131072):
        W, W128 = words_pad(n_pad)
        assert W128 * 128 > W
        assert W128 % 8 == 0
