"""Pallas TPU kernel for batched BLAKE3 chunk hashing (leaves + tree).

The batched XLA implementation (ops/blake3.py, ``hash_chunks_words``) is
correct but slow on TPU (~2 GB/s on v5e): XLA materializes intermediates
of the ~900-op compression chain between fusions, and the tree merge
becomes thousands of tiny dispatches.  This kernel keeps the 16-word
state and 16 message words in vector registers for all 16 block
compressions of each 1 KiB leaf, then performs the whole left-leaning
BLAKE3 tree merge *inside the same kernel tile* — chunks' leaves occupy
contiguous lanes and ``max_leaves`` (a power of two <= the 1024-lane
tile) always divides the tile, so parent merges are lane-shift +
compress steps with no HBM round trips.  Measured ~130 GB/s on v5e for
the leaf stage (vs 2 GB/s for the XLA form).

Layout: leaves are *lanes*.  Input words arrive transposed as
``(256, L)`` uint32 — column ``l`` holds leaf ``l``'s 256 little-endian
words — so the 16 message words of block ``k`` are contiguous row slices
``[16k, 16k+16)``, each a full ``(TL,)`` vector.

Reference behavior matched: 64-bit longtail digest = first two output
words (lib/blake3/longtail_blake3.c:81-102); tree structure per the
BLAKE3 spec (left-leaning binary tree over 1 KiB leaves, adjacent pairs
merge, odd tail carries).  Conformance: tests/test_hashes.py.
"""

from __future__ import annotations

import functools

import numpy as np

from longtail_tpu.ops.blake3 import (
    BLOCK_BYTES,
    CHUNK_END,
    CHUNK_START,
    IV,
    LEAF_BYTES,
    PARENT,
    PERM,
    ROOT,
)

_WORDS_PER_LEAF = LEAF_BYTES // 4             # 256
_BLOCKS_PER_LEAF = LEAF_BYTES // BLOCK_BYTES  # 16

# Leaves per grid step: one (8, 128) vreg worth of lanes keeps every state
# variable in exactly one register.
_TL = 1024
_TR, _TC = 8, 128  # (sublanes, lanes) view of a (TL,) state vector


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress_regs(jnp, h, m, t_lo, b, flags):
    """One BLAKE3 compression entirely in registers.

    h: list of 8 tile-shaped u32 arrays; m: list of 16; t_lo/b/flags:
    tile-shaped u32 (t_hi is always 0: leaf counters are < 2**32).
    Returns the 16 output words (cv = out[:8] = v[i] ^ v[i+8]).
    """
    u32 = np.uint32
    zero = t_lo * u32(0)
    v = list(h) + [zero + u32(IV[i]) for i in range(4)] + \
        [t_lo, zero, b, flags]
    m = list(m)
    for r in range(7):
        _g(v, 0, 4, 8, 12, m[0], m[1])
        _g(v, 1, 5, 9, 13, m[2], m[3])
        _g(v, 2, 6, 10, 14, m[4], m[5])
        _g(v, 3, 7, 11, 15, m[6], m[7])
        _g(v, 0, 5, 10, 15, m[8], m[9])
        _g(v, 1, 6, 11, 12, m[10], m[11])
        _g(v, 2, 7, 8, 13, m[12], m[13])
        _g(v, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[p] for p in PERM]
    return [v[i] ^ v[i + 8] for i in range(8)]


def _shift_lanes(jnp, pltpu, v, k: int):
    """out[i] = v[i + k] in flat (TL,) order over the (8, 128) tile view
    (k < 128).  Positions wrapping past the tile end return garbage — the
    caller masks them (merge partners never cross a chunk, and chunks
    never cross the tile)."""
    lane = jax_lane(jnp)
    rl = pltpu.roll(v, _TC - k, axis=1)
    rs = pltpu.roll(rl, _TR - 1, axis=0)
    return jnp.where(lane < _TC - k, rl, rs)


def jax_lane(jnp):
    import jax
    return jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 1)


def _hash_kernel(jnp, pltpu, pl_ds, pl_when, max_leaves: int, unroll: bool,
                 skip_empty: bool, wt_ref, meta_ref, out_ref):
    """Grid step: hash _TL leaves (16 blocks each) + in-tile tree merge.

    wt_ref:  (256, TL) u32 — transposed leaf words
    meta_ref:(3, TL) u32 — rows: leaf_len (bytes 0..1024), n_leaves of the
             owning chunk (broadcast across its leaves), leaf-in-chunk
             index (0..max_leaves-1)
    out_ref: (2, TL) u32 — lanes at multiples of max_leaves hold the
             chunk digest (lo, hi); other lanes are garbage.
    """
    u32 = np.uint32
    leaf_len = meta_ref[0, :].reshape(_TR, _TC).astype(jnp.int32)
    n_leaves = meta_ref[1, :].reshape(_TR, _TC).astype(jnp.int32)
    lam = meta_ref[2, :].reshape(_TR, _TC).astype(jnp.int32)  # leaf-in-chunk
    counter = lam.astype(u32)
    zero = counter * u32(0)
    single_leaf = n_leaves == 1

    if skip_empty:
        # pipeline mode: used rows are packed to the front, so a tile
        # whose leaves are all zero-length is pure padding — skip it
        # (breaks the "empty input hashes to the empty digest" contract,
        # hence opt-in; see hash_chunks_words_device)
        pl_when(jnp.max(leaf_len) > 0)(
            lambda: _hash_tile(jnp, pltpu, pl_ds, max_leaves, unroll,
                               wt_ref, out_ref, leaf_len, n_leaves, lam,
                               counter, zero, single_leaf))
        return
    _hash_tile(jnp, pltpu, pl_ds, max_leaves, unroll, wt_ref, out_ref,
               leaf_len, n_leaves, lam, counter, zero, single_leaf)


def _hash_tile(jnp, pltpu, pl_ds, max_leaves, unroll, wt_ref, out_ref,
               leaf_len, n_leaves, lam, counter, zero, single_leaf):
    u32 = np.uint32
    n_blocks = jnp.maximum(
        (leaf_len + np.int32(BLOCK_BYTES - 1)) // np.int32(BLOCK_BYTES),
        np.int32(1))

    # ---- leaf stage ----------------------------------------------------
    # Two lowerings of the same math: unrolled 16x on TPU (state stays in
    # vregs across blocks — the fori form measures 30x slower on-chip),
    # fori_loop under interpret mode (an unrolled ~20k-op body takes CPU
    # XLA the better part of an hour to compile; the loop body is ~1k ops)
    import jax

    h0 = [zero + u32(IV[i]) for i in range(8)]

    def leaf_body(k, state, m):
        h = list(state[:8])
        out01 = list(state[8:])
        blk_len = jnp.clip(
            leaf_len - k * np.int32(BLOCK_BYTES), 0, BLOCK_BYTES)
        is_last = n_blocks == k + 1
        flags = jnp.where(k == 0, u32(CHUNK_START), u32(0)) + zero \
            | jnp.where(is_last, u32(CHUNK_END), u32(0)) \
            | jnp.where(is_last & single_leaf, u32(ROOT), u32(0))
        cv = _compress_regs(jnp, h, m, counter, blk_len.astype(u32), flags)
        active = k < n_blocks
        h = [jnp.where(active, cv[i], h[i]) for i in range(8)]
        out01 = [jnp.where(active & is_last, cv[i], out01[i])
                 for i in range(2)]
        return tuple(h) + tuple(out01)

    state = tuple(h0) + (zero, zero)
    if unroll:
        for k in range(_BLOCKS_PER_LEAF):
            m = [wt_ref[16 * k + w, :].reshape(_TR, _TC) for w in range(16)]
            state = leaf_body(np.int32(k), state, m)
    else:
        def body(k, state):
            blk = wt_ref[pl_ds(16 * k, 16), :]
            m = [blk[w, :].reshape(_TR, _TC) for w in range(16)]
            return leaf_body(k, state, m)

        state = jax.lax.fori_loop(0, _BLOCKS_PER_LEAF, body, state)
    h = list(state[:8])
    out01 = list(state[8:])

    # ---- tree merge ----------------------------------------------------
    # Level l: live node i of a chunk sits at leaf-lane i * 2**l.  Merge
    # combines (2j, 2j+1) -> j; a node with no right partner carries up
    # unchanged at the same lane (the lane indices stay consistent:
    # (c-1)*2**l == ((c-1)/2) * 2**(l+1) when c is odd).
    levels = max(0, max_leaves.bit_length() - 1)
    for lvl in range(levels):
        step = 1 << lvl
        cnt = (n_leaves + np.int32(step - 1)) >> lvl  # ceil: nodes at lvl
        is_left = (lam & np.int32(2 * step - 1)) == 0
        node = lam >> np.int32(lvl)                    # node index at lvl
        has_right = is_left & ((node + 1) < cnt)
        is_root_merge = has_right & (cnt == 2)
        right = [_shift_lanes(jnp, pltpu, h[i], step) for i in range(8)]
        m = h + right
        h_iv = [zero + u32(IV[i]) for i in range(8)]
        flags = u32(PARENT) + jnp.where(is_root_merge, u32(ROOT), u32(0))
        cv = _compress_regs(jnp, h_iv, m, zero, zero + u32(BLOCK_BYTES),
                            flags)
        h = [jnp.where(has_right, cv[i], h[i]) for i in range(8)]

    out0 = jnp.where(single_leaf, out01[0], h[0])
    out1 = jnp.where(single_leaf, out01[1], h[1])
    out_ref[0, :] = out0.reshape(_TL)
    out_ref[1, :] = out1.reshape(_TL)


@functools.lru_cache(maxsize=16)
def _make_hash_fn(n_leaves: int, max_leaves: int,
                  skip_empty: bool = False):
    """Compiled pallas stage: (256, L) words + (3, L) meta -> (2, L)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_leaves % _TL == 0
    assert max_leaves & (max_leaves - 1) == 0 and max_leaves <= _TL
    grid = (n_leaves // _TL,)

    on_tpu = jax.default_backend() == "tpu"
    return pl.pallas_call(
        functools.partial(_hash_kernel, jnp, pltpu, pl.ds, pl.when,
                          max_leaves, on_tpu, skip_empty),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_WORDS_PER_LEAF, _TL), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, _TL), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, _TL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n_leaves), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )


def hash_chunks_words_device(words, lengths, skip_empty_tiles=False):
    """Drop-in device replacement for blake3.hash_chunks_words(xp=jnp).

    words: (rows, padded//4) u32, little-endian, zero past each row's
    length; lengths: (rows,) byte lengths. Returns (lo, hi) u32 pairs.
    Trace under jit.  padded must be a multiple of LEAF_BYTES, the leaf
    count per row a power of two, and rows*padded//LEAF_BYTES a multiple
    of 1024 (callers pad row counts; see parallel/pipeline.py).

    skip_empty_tiles: skip all-zero-length lane tiles entirely (their
    output is garbage).  Only for callers that pack used rows first and
    never read padding digests — it breaks hashing a genuinely empty
    input in a padding region.
    """
    import jax.numpy as jnp

    u32 = np.uint32
    rows, padded4 = words.shape
    padded = padded4 * 4
    assert padded % LEAF_BYTES == 0
    max_leaves = padded // LEAF_BYTES
    L = rows * max_leaves
    assert L % _TL == 0, (rows, padded)

    lengths = jnp.asarray(lengths, dtype=u32)
    n_leaves = jnp.maximum(
        (lengths + u32(LEAF_BYTES - 1)) // u32(LEAF_BYTES), u32(1))

    leaf_idx = jnp.arange(max_leaves, dtype=u32)[None, :]
    leaf_len = jnp.clip(
        lengths[:, None].astype(jnp.int32)
        - (leaf_idx * u32(LEAF_BYTES)).astype(jnp.int32),
        0, LEAF_BYTES).astype(u32)
    meta = jnp.stack([
        leaf_len.reshape(L),
        (n_leaves[:, None] + leaf_idx * u32(0)).reshape(L),
        (jnp.zeros((rows, 1), u32) + leaf_idx).reshape(L),
    ])  # (3, L)

    wt = words.reshape(L, _WORDS_PER_LEAF).T  # leaf-major (256, L)
    out2 = _make_hash_fn(L, max_leaves, skip_empty_tiles)(wt, meta)
    lo = out2[0].reshape(rows, max_leaves)[:, 0]
    hi = out2[1].reshape(rows, max_leaves)[:, 0]
    return lo, hi
