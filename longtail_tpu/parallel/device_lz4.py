"""Device-side LZ4 match finding: the TPU half of the block codec.

The reference compresses blocks with upstream LZ4's scalar hash-chain
loop (lib/lz4/longtail_lz4.c:10, vendored lz4 1.10).  A literal port
would serialize on the TPU, so the O(n) search is re-derived as a
sort-based, fully data-parallel pass:

1. Sample an 8-byte gram at every 4-byte-aligned position of the block
   (the u32 word view the data plane already carries).
2. Hash the grams and ``lax.sort`` (hash, position, gram) tuples — the
   XLA TPU sort is fast and turns "hash table chaining" into "equal
   hashes are neighbors".
3. A sample matches when its sorted predecessor has the same gram within
   the 64 KiB LZ4 window; ties sort by position, so the predecessor is
   the *nearest* earlier occurrence (smallest offset = cheapest to
   encode and most likely in cache on decode).
4. Resort matches back to position order and fuse chains: consecutive
   samples matching consecutive references describe one long match, so
   runs compact to (start, ref, length) triples — the device->host
   payload is O(distinct matches), not O(bytes).

The *byte-level* LZ4 stream is then assembled on the host by a ~60-line
native C walk (native/lz4_assemble.c, ops/lz4.py fallback): literals are
memcpy'd straight out of the block, so the host does O(output) work with
no searching.  Outputs decode with any upstream LZ4 decoder; conformance
is tested against our from-spec decoder (ops/lz4.py) which is itself
golden-tested against the reference format.

Matches are 4-byte aligned on both sides (a deliberate ratio/throughput
trade: ~2-6% worse ratio than byte-granular upstream on mixed corpora,
thousands of times more parallel).
"""

from __future__ import annotations

import functools

import numpy as np

_WINDOW = 65535        # max LZ4 offset
_MIN_RUN_WORDS = 2     # emit matches >= 8 bytes (one gram)


@functools.lru_cache(maxsize=8)
def make_match_fn(n_words: int, max_runs: int):
    """jit: (words (n_words,) u32) ->
    (starts, refs, lens (max_runs,) i32 — word units, position order),
    n_runs () i32, overflow () i32.

    starts/refs/lens entries past n_runs are zero.  overflow != 0 means
    the run list was truncated (ratio loss only, never corruption).
    """
    import jax
    import jax.numpy as jnp

    u32 = jnp.uint32
    K = n_words - 2  # samples 0..K-1 have a full 8-byte gram + slack

    @jax.jit
    def fn(words):
        lo = words[:K]
        hi = words[1:K + 1]
        # multiplicative gram hash (fibonacci-style mixing)
        h = (lo * u32(0x9E3779B1)) ^ ((hi * u32(0x85EBCA77)) >> u32(13)) \
            ^ (hi << u32(7))
        idx = jnp.arange(K, dtype=jnp.int32)
        h_s, pos_s, lo_s, hi_s = jax.lax.sort(
            (h, idx, lo, hi), num_keys=2)
        same = (h_s[1:] == h_s[:-1]) & (lo_s[1:] == lo_s[:-1]) & \
               (hi_s[1:] == hi_s[:-1])
        offw = pos_s[1:] - pos_s[:-1]          # > 0: ties sorted by pos
        ok = same & (offw * 4 <= _WINDOW)
        # per-sorted-slot ref (slot 0 = pos_s[0] never matches: no
        # predecessor), then resort by position: pos_s is a permutation
        # of 0..K-1, so the result is dense — ref[p] = matching earlier
        # word position for sample p, or -1
        ref_sorted = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32),
             jnp.where(ok, pos_s[:-1], -1)])
        _, ref = jax.lax.sort((pos_s, ref_sorted), num_keys=1)
        m = ref >= 0
        prev_m = jnp.concatenate([jnp.zeros((1,), bool), m[:-1]])
        prev_ref = jnp.concatenate([jnp.zeros((1,), jnp.int32), ref[:-1]])
        chain = m & prev_m & (ref == prev_ref + 1)
        run_start = m & ~chain
        run_end = m & jnp.concatenate(
            [~chain[1:], jnp.ones((1,), bool)])
        # one compaction sort: run boundary samples (start, end, or both)
        # to the front, carrying the start flag and the ref so the host
        # can pair starts with ends without another device round trip
        sidx = jnp.arange(K, dtype=jnp.int32)
        boundary = run_start | run_end
        _, b_pos, b_sflag, b_ref = jax.lax.sort(
            ((~boundary).astype(jnp.int32), sidx,
             run_start.astype(jnp.int32), ref), num_keys=2)
        n_runs_total = jnp.sum(run_start.astype(jnp.int32))
        n_boundary = jnp.sum(boundary.astype(jnp.int32))
        out = jnp.stack(
            [b_pos[:max_runs], b_sflag[:max_runs], b_ref[:max_runs]])
        return out, jnp.minimum(n_boundary, max_runs), \
            (n_boundary > max_runs).astype(jnp.int32), n_runs_total

    return fn


@functools.lru_cache(maxsize=32)
def _make_trim_fn(rows_in: int, rows_out: int):
    import jax

    return jax.jit(lambda a: a[:, :rows_out])


def submit_matches(block_words, max_runs: int = 1 << 18):
    """Async half: dispatch the device scan, return a handle.  Callers
    pipelining many blocks submit them all before collecting."""
    n = int(block_words.shape[0])
    fn = make_match_fn(n, max_runs)
    out, cnt, ovf, _ = fn(block_words)
    cnt.copy_to_host_async()
    return (out, cnt, ovf, max_runs)


def collect_matches(handle):
    """Sync half: fetch + decode the compacted run-boundary list.

    Pairs starts with ends: both arrive position-sorted and runs are
    disjoint, so the i-th start pairs with the i-th end (single-sample
    runs appear in both)."""
    out, cnt, ovf, max_runs = handle
    cnt = int(cnt)                      # small scalar sync
    k = 256
    while k < cnt:
        k *= 2
    k = min(k, max_runs)
    out = np.asarray(_make_trim_fn(max_runs, k)(out))  # (3, k) fetch
    pos, sflag, ref = out[0][:cnt], out[1][:cnt], out[2][:cnt]
    # a boundary sample can be both start and end (single-sample run):
    # it has one entry with sflag=1; ends are samples where the *next*
    # boundary is a start (or the list ends)
    starts = pos[sflag == 1]
    srefs = ref[sflag == 1]
    next_is_start = np.concatenate([sflag[1:] == 1, [True]])
    is_end = (sflag == 0) | next_is_start
    ends = pos[is_end]
    m = min(len(starts), len(ends))
    starts, srefs, ends = starts[:m], srefs[:m], ends[:m]
    lens = ends - starts + _MIN_RUN_WORDS
    return (starts * 4, srefs * 4, lens * 4, int(ovf))


def find_matches(block_words, max_runs: int = 1 << 18):
    """One-shot: submit + collect (single-block callers)."""
    return collect_matches(submit_matches(block_words, max_runs))


def compress_block(src: bytes) -> bytes:
    """Full device-codec path: TPU match scan + host byte assembly.

    Output is standard LZ4 block format (decodable by upstream lz4 and
    ops/lz4.decompress).  Blocks pad to 1 MiB word-count classes so the
    whole codec compiles a handful of programs; the zero padding can only
    create matches past `len(src)`, which the assembler clips against the
    real length (full-word equality implies real-prefix equality, so
    clipped matches are always genuine).
    """
    import jax

    from longtail_tpu.ops import lz4 as _lz4

    n = len(src)
    if n < 4096:
        return _lz4.compress(src)  # host path for tiny blocks
    nw = -(-n // 4)
    cls = 1 << 18                  # 1 MiB of words granularity
    nw_pad = -(-nw // cls) * cls
    buf = np.zeros(nw_pad * 4, np.uint8)
    buf[:n] = np.frombuffer(src, np.uint8)
    words = jax.device_put(np.frombuffer(buf.tobytes(), "<u4"))
    starts, refs, lens, _ = find_matches(words)
    keep = starts < n
    return _lz4.assemble_matches(
        src, starts[keep], refs[keep], lens[keep])
