"""Pallas TPU kernel for batched BLAKE2s-64 chunk hashing.

Counterpart of ops/blake3_kernel.py for the BLAKE2 hash seam
(lib/blake2/longtail_blake2.c:43 — blake2s with an 8-byte digest).
BLAKE2s has no tree: each chunk chains sequentially over its 64-byte
blocks, so chunks ride the *lane* dimension and the block loop runs
in-kernel (``fori_loop`` + dynamic row slices keep the traced program a
single block body regardless of chunk size).

Layout: input words arrive transposed as ``(padded//4, rows)`` u32 —
column r holds chunk r's little-endian words — so block k's 16 message
words are rows [16k, 16k+16).

Conformance: hashlib.blake2s oracle via ops/blake2.py's batched form
(tests/test_hashes.py).
"""

from __future__ import annotations

import functools

import numpy as np

from longtail_tpu.ops.blake2 import IV, SIGMA, _PARAM0

BLOCK_BYTES = 64

# chunk-lanes per grid step (VMEM: (padded//4, _TC) u32 input block)
_TC = 256


def _rotr(x, n: int):
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


def _compress_regs(jnp, h, m, t, final_mask):
    u32 = np.uint32
    zero = t * u32(0)
    v = list(h) + [zero + u32(IV[i]) for i in range(8)]
    v[12] = v[12] ^ t                      # t_lo (t < 2**32 here)
    v[14] = jnp.where(final_mask, v[14] ^ u32(0xFFFFFFFF), v[14])
    for r in range(10):
        s = SIGMA[r]
        _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
        _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
        _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
        _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
        _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
        _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
        _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
        _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


@functools.lru_cache(maxsize=16)
def _make_hash_fn(padded: int, rows: int, skip_empty_tiles: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert padded % BLOCK_BYTES == 0 and rows % _TC == 0
    n_blocks_max = padded // BLOCK_BYTES
    p4 = padded // 4
    u32 = np.uint32

    def kernel(wt_ref, len_ref, out_ref):
        length = len_ref[0, :].astype(jnp.int32)       # (TC,)

        def tile_body():
            n_blocks = jnp.maximum(
                (length + np.int32(BLOCK_BYTES - 1))
                // np.int32(BLOCK_BYTES), np.int32(1))
            uzero = length.astype(u32) * u32(0)
            h0 = [uzero + u32(IV[i]) for i in range(8)]
            h0[0] = h0[0] ^ u32(_PARAM0)

            def body(k, h):
                blk = wt_ref[pl.ds(16 * k, 16), :]      # (16, TC)
                m = [blk[w, :] for w in range(16)]
                is_last = n_blocks == k + 1
                active = k < n_blocks
                t = jnp.minimum(
                    (k + 1) * np.int32(BLOCK_BYTES), length).astype(u32)
                out = _compress_regs(jnp, list(h), m, t, is_last)
                return tuple(
                    jnp.where(active, out[i], h[i]) for i in range(8))

            h = jax.lax.fori_loop(0, n_blocks_max, body, tuple(h0))
            out_ref[0, :] = h[0]
            out_ref[1, :] = h[1]

        if skip_empty_tiles:
            # data-plane pipeline mode: padding rows pack last, the plane
            # never hashes zero-size chunks — an all-zero-length tile is
            # pure padding whose output the caller never reads
            pl.when(jnp.max(length) > 0)(tile_body)
        else:
            # default: empty inputs are real and must hash (the BLAKE2s
            # empty-message digest comes from one all-zero final block)
            tile_body()

    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(rows // _TC,),
            in_specs=[
                pl.BlockSpec((p4, _TC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, _TC), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((2, rows), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )


def hash_chunks_words_device(words, lengths, skip_empty_tiles: bool = False):
    """Device BLAKE2s-64 over packed word rows: (rows, padded//4) u32 +
    (rows,) lengths -> (lo, hi) u32 pairs.  Trace under jit; rows must be
    a multiple of 256, padded a multiple of 64, zero past each length.

    skip_empty_tiles=True (the pipeline's mode) requires zero-length
    padding rows to be packed LAST: a 256-lane tile that is entirely
    zero-length is skipped and returns garbage for those lanes.  Leave
    False when genuinely empty inputs may appear anywhere."""
    import jax.numpy as jnp

    rows, p4 = words.shape
    wt = words.T                                      # (p4, rows)
    lens = jnp.asarray(lengths, dtype=jnp.uint32).reshape(1, rows)
    out2 = _make_hash_fn(p4 * 4, rows, skip_empty_tiles)(wt, lens)
    return out2[0], out2[1]
