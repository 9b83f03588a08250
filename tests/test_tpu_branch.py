"""TPU-branch coverage without a chip.

On CPU the production pipeline swaps in XLA fallbacks, so the TPU-only
pieces — the fixed-class/spill dispatch host logic, the stage-1 Pallas
scan/walk kernels, and the pack kernel — need direct tests: the host
logic with numpy fakes, the kernels in Pallas interpret mode against the
XLA oracle.  (This is how the round-3 class_plan power-of-two bug slips
through a green CPU suite otherwise.)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from longtail_tpu.parallel import pipeline as pl_mod  # noqa: E402
from longtail_tpu.parallel.device_chunker import ChunkerConfig  # noqa: E402
from longtail_tpu.parallel.pipeline import (  # noqa: E402
    DevicePartIndexer,
    _pow2_padded,
    class_floor,
    class_plan,
    pow2_cap,
)


@pytest.mark.parametrize("target", [1024, 3072, 24576, 32768])
def test_class_plan_covers_every_padded_class(target):
    """Every _pow2_padded output for sizes in [1, max_size] must be a
    planned class — a chunk whose class is absent from the plan would be
    silently dropped by _dispatch_buckets_tpu (round-3 bug: non-pow2
    max_size, e.g. target 24576 -> max 49152)."""
    cfg = ChunkerConfig.from_target(target)
    cap = pow2_cap(cfg.padded_chunk)
    floor = class_floor(cfg)
    plan_classes = {c for c, _ in class_plan(cfg, 64 << 20)}
    sizes = np.unique(np.concatenate([
        np.arange(1, min(cfg.max_size, 4096) + 1),
        np.linspace(1, cfg.max_size, 997).astype(np.int64),
        [cfg.max_size, cfg.max_size - 1, cfg.padded_chunk],
    ]))
    sizes = sizes[(sizes >= 1) & (sizes <= cfg.max_size)]
    padded = _pow2_padded(sizes, cap, floor)
    assert set(np.unique(padded)) <= plan_classes, target
    # and classes are powers of two (the BLAKE3 kernel requires it)
    for c in plan_classes:
        leaves = c // 1024
        assert leaves & (leaves - 1) == 0, c


class _FakeRes:
    """Stands in for the device (2, rows) hash array."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)

    def copy_to_host_async(self):
        pass

    def __array__(self, dtype=None, copy=None):
        return self._arr if dtype is None else self._arr.astype(dtype)


def _fake_pack_hash(cls, rows, kind="blake3"):
    def f(words2d, bs, bz):
        bs = np.asarray(bs).astype(np.uint32)
        bz = np.asarray(bz).astype(np.uint32)
        return _FakeRes(np.stack([bs, bz]))
    return f


def _fake_split(layout):
    def f(blob):
        blob = np.asarray(blob)
        out, o = [], 0
        for _, r in layout:
            out.append((blob[o:o + r], blob[o + r:o + 2 * r]))
            o += 2 * r
        return out
    return f


def _fake_concat(n):
    def f(*rs):
        return _FakeRes(np.concatenate([np.asarray(r) for r in rs],
                                       axis=1))
    return f


def _fake_stage3(layout, kind="blake3"):
    """Mirror of make_stage3_fn's blob contract: (words2d, blob) ->
    (2, sum r) with row 0 = starts, row 1 = sizes per slot."""
    def f(words2d, blob):
        blob = np.asarray(blob)
        outs, o = [], 0
        for _, r in layout:
            outs.append(np.stack([blob[o:o + r], blob[o + r:o + 2 * r]]))
            o += 2 * r
        return _FakeRes(np.concatenate(outs, axis=1))
    return f


def _bucket_rows(buckets):
    """Flatten either bucket format to (hash_arr_2xr, rows) pairs."""
    out = []
    for res, meta in buckets:
        arr = np.asarray(res)
        if isinstance(meta, list):
            for rows, off, r in meta:
                out.append((arr[:, off:off + r], rows))
        else:
            out.append((arr, meta))
    return out


@pytest.mark.parametrize("target", [1024, 24576])
def test_dispatch_buckets_tpu_covers_all_chunks(monkeypatch, target):
    """Host dispatch logic: every chunk row lands in exactly one bucket
    (planned slot or spill), with its own (start, size) — run with numpy
    fakes replacing the device calls."""
    monkeypatch.setattr(pl_mod, "make_pack_hash_fn", _fake_pack_hash)
    monkeypatch.setattr(pl_mod, "make_stage3_fn", _fake_stage3)
    indexer = DevicePartIndexer(target, lanes=1)
    cfg = indexer.cfg
    rng = np.random.default_rng(5)

    # enough chunks of the most common class to force spill dispatches,
    # plus sizes that exercise the non-pow2 cap class (target 24576:
    # 40000 -> class 65536, absent from the round-3 plan)
    plan = dict(indexer._class_plan)
    common = cfg.avg_size
    n_common = plan[int(_pow2_padded(
        np.array([common]), indexer._cap, indexer._floor)[0])]
    sizes = [common] * (n_common + n_common // 2 + 3)
    sizes += [cfg.max_size, cfg.max_size - 1, cfg.min_size + 1, 1000]
    if cfg.max_size > 40000:
        sizes += [40000, 33000]
    flat_sizes = np.array(sizes, dtype=np.int64)
    n = len(flat_sizes)
    flat_starts = np.cumsum(np.concatenate([[0], flat_sizes[:-1]]))
    padded = _pow2_padded(flat_sizes, indexer._cap, indexer._floor)

    buckets = indexer._dispatch_buckets_tpu(
        None, flat_starts, flat_sizes, padded)

    seen = np.zeros(n, dtype=np.int32)
    for arr, rows in _bucket_rows(buckets):
        k = len(rows)
        np.testing.assert_array_equal(arr[0][:k], flat_starts[rows])
        np.testing.assert_array_equal(arr[1][:k], flat_sizes[rows])
        seen[rows] += 1
    np.testing.assert_array_equal(seen, np.ones(n, dtype=np.int32))


def test_retire_assembles_bucket_hashes(monkeypatch):
    """retire() must place every bucket's hashes at the right chunk index
    and yield per-part slices in submission order."""
    monkeypatch.setattr(pl_mod, "make_pack_hash_fn", _fake_pack_hash)
    monkeypatch.setattr(pl_mod, "make_stage3_fn", _fake_stage3)
    indexer = DevicePartIndexer(1024, lanes=1)

    counts = np.array([3, 2], dtype=np.int64)
    lane_sizes = [np.array([1024, 2048, 512], np.uint32),
                  np.array([600, 1024], np.uint32)]
    flat_sizes = np.concatenate(lane_sizes).astype(np.int64)
    flat_starts = np.cumsum(np.concatenate([[0], flat_sizes[:-1]]))
    padded = _pow2_padded(flat_sizes, indexer._cap, indexer._floor)
    buckets = indexer._dispatch_buckets_tpu(
        None, flat_starts, flat_sizes, padded)
    entry = (["a", "b"], lane_sizes, counts, buckets)
    out = list(indexer.retire(entry))
    assert [t for t, _, _ in out] == ["a", "b"]
    got = np.concatenate([h for _, _, h in out])
    want = flat_starts.astype(np.uint64) | (
        flat_sizes.astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, want)


def _tiny_plan():
    from longtail_tpu.parallel.stage1 import Stage1Plan

    cfg = ChunkerConfig.from_target(1024)
    return Stage1Plan(cfg, lanes=8, part_bytes=16384)


def test_stage1_pallas_interpret_matches_xla_oracle():
    """The Pallas scan+walk kernels in interpret mode vs the exact XLA
    formulation, on a tiny geometry (the production path off-TPU never
    runs these kernels, so this is their only chipless coverage)."""
    from longtail_tpu.parallel.stage1 import (
        _make_stage1_pallas,
        _make_stage1_xla,
        repair_lane,
        unpack_stage1,
    )

    plan = _tiny_plan()
    B, P = plan.lanes, plan.part_bytes
    rng = np.random.default_rng(17)
    rows = rng.integers(0, 256, (B * P // 128, 128), dtype=np.uint8)
    lengths = np.array(
        [P, P - 137, P // 2, plan.cfg.min_size, 1, 700, P, P - 1],
        dtype=np.int32)
    flat = rows.reshape(-1)
    for b, ln in enumerate(lengths):           # zero past each length
        flat[b * P + ln: (b + 1) * P] = 0

    packed_p = np.asarray(_make_stage1_pallas(plan)(rows, lengths)[0])
    packed_x = np.asarray(_make_stage1_xla(plan)(rows, lengths)[0])
    sz_p, n_p, amb_p = unpack_stage1(packed_p, plan)
    sz_x, n_x, _ = unpack_stage1(packed_x, plan)
    for b in range(B):
        if amb_p[b]:
            fixed = repair_lane(flat[b * P: b * P + lengths[b]], plan.cfg)
            np.testing.assert_array_equal(fixed, sz_x[b, : n_x[b]])
        else:
            assert n_p[b] == n_x[b], b
            np.testing.assert_array_equal(
                sz_p[b, : n_p[b]], sz_x[b, : n_x[b]])


def test_pack_kernel_interpret_matches_gather():
    """The Pallas pack kernel in interpret mode vs a numpy gather: chunk
    bytes at arbitrary (unaligned) offsets must land at offset 0, zeroed
    past size."""
    from longtail_tpu.parallel.pipeline import (
        make_pack_fn,
        make_pad_words_fn,
    )

    padded, rows = 2048, 8
    n_bytes = 64 << 10
    rng = np.random.default_rng(23)
    data = rng.integers(0, 256, n_bytes, dtype=np.uint8)
    dev_rows = data.reshape(-1, 128)
    slack = padded // 4 + 2048
    words2d = make_pad_words_fn(slack)(jax.device_put(dev_rows))

    starts = np.array([0, 1, 3, 4095, 4096, 4097, 60000, 61337],
                      dtype=np.int32)
    sizes = np.array([2048, 2047, 1, 2048, 512, 1025, 2048, 1000],
                     dtype=np.int32)
    packed = np.asarray(make_pack_fn(padded, rows)(
        words2d, jax.device_put(starts), jax.device_put(sizes)))
    flat = np.zeros(n_bytes + padded + 8192, np.uint8)
    flat[:n_bytes] = data
    for r in range(rows):
        want = np.zeros(padded, np.uint8)
        want[: sizes[r]] = flat[starts[r]: starts[r] + sizes[r]]
        got = packed[r].astype("<u4").view(np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"row {r}")


def test_stage1_fused_bins_match_words_oracle():
    """The scan kernel's fused anchor bin-mins (interpret mode) must
    equal device_match.bin_mins_from_words on the same bytes, except
    the last bin of each tile (its final gram reads across the tile
    boundary — garbage by design, host-validated)."""
    from longtail_tpu.parallel.device_match import bin_mins_from_words
    from longtail_tpu.parallel.stage1 import _make_stage1_pallas

    plan = _tiny_plan()
    B, P = plan.lanes, plan.part_bytes
    rng = np.random.default_rng(31)
    rows = rng.integers(0, 256, (B * P // 128, 128), dtype=np.uint8)
    lengths = np.full((B,), P, dtype=np.int32)
    packed, bins, _ = _make_stage1_pallas(plan, with_anchors=True)(
        rows, lengths)
    bins = np.asarray(bins).reshape(-1)

    import jax.numpy as jnp
    words = jnp.asarray(
        np.ascontiguousarray(rows).view("<u4").reshape(-1))
    want = np.asarray(bin_mins_from_words(words, B * P // 4))
    bins_per_tile = plan.tile_bytes // 256
    keep = (np.arange(len(bins)) % bins_per_tile) != bins_per_tile - 1
    np.testing.assert_array_equal(bins[keep], want[keep])
    # and the packed chunk output is unchanged by the fused variant
    packed2 = np.asarray(_make_stage1_pallas(plan)(rows, lengths)[0])
    np.testing.assert_array_equal(np.asarray(packed), packed2)


def test_stage1_words_output_is_flat_relayout():
    """The scan kernel's fused words2d output (interpret mode) must be
    exactly the flat row-major little-endian u32 relayout of the byte
    rows (make_pad_words_fn semantics) over the real rows, with >= the
    requested slack rows appended."""
    from longtail_tpu.parallel.stage1 import (
        _make_stage1_pallas,
        words2d_rows,
    )

    plan = _tiny_plan()
    B, P = plan.lanes, plan.part_bytes
    rng = np.random.default_rng(41)
    rows = rng.integers(0, 256, (B * P // 128, 128), dtype=np.uint8)
    lengths = np.full((B,), P, dtype=np.int32)
    slack = 4096
    _, _, words2d = _make_stage1_pallas(plan, slack_words=slack)(
        rows, lengths)
    words2d = np.asarray(words2d)
    want = rows.reshape(-1).view("<u4").reshape(-1, 128)
    real = want.shape[0]
    assert words2d.shape == (words2d_rows(plan, slack), 128)
    assert words2d.shape[0] >= real + slack // 128
    np.testing.assert_array_equal(words2d[:real], want)
