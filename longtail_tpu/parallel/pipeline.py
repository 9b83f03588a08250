"""Batched device chunk+hash pipeline — the production TPU data plane.

The reference's chunking hot loop is one Bikeshed job per file part
(``ChunkAssets`` src/longtail.c:2429-2462); ours batches file parts into
fixed-shape ``(lanes, part_bytes)`` uint8 buffers and streams them through
the device in a two-stage async pipeline:

- **Stage 1 (device)**: candidate scan + cut resolution
  (``device_chunker.candidate_mask`` / ``resolve_ends``) over a whole lane
  batch in one jitted dispatch. Only chunk *sizes* come back to host —
  a ~4000:1 data reduction vs the byte stream.
- **Stage 2 (host plan + device hash)**: host groups the resolved chunks by
  power-of-two padded size (static-shape discipline), then one jitted
  gather+BLAKE3 dispatch per size bucket hashes every chunk, reading the
  lane batch that is *already resident in HBM* from stage 1.

Because jax dispatch is async, stage 1 of batch N+1 and the host planning of
batch N overlap device compute; file I/O is overlapped by a prefetch thread.
The single-dispatch ``device_chunker.index_parts`` form instead gathers all
chunks padded to max_size, which is quadratic-ish in waste for production
part sizes (32 MiB parts -> TB-scale gathers) — this pipeline's bucketed
stage 2 keeps the gather at ~2x payload bytes.

Bit-exactness: stage 1 + stage 2 produce exactly the chunk boundaries and
BLAKE3-64 hashes of the host oracle (tests/test_pipeline.py).
"""

from __future__ import annotations

import functools
import queue
import threading
from collections import deque
from typing import Iterable, Iterator, Tuple

import numpy as np

from longtail_tpu.ops import blake3 as _blake3
from longtail_tpu.parallel.device_chunker import (
    ChunkerConfig,
    candidate_mask,
    next_candidate_ends,
    resolve_ends,
)

_LEAF = 1024


@functools.lru_cache(maxsize=16)
def make_resolve_fn(cfg: ChunkerConfig, max_chunks: int):
    """jit: (B, P) u8 parts + (B,) lengths -> (B, max_chunks) i32 sizes."""
    import jax
    import jax.numpy as jnp

    def fn(parts, lengths):
        mask = candidate_mask(parts, discriminator=cfg.discriminator)
        nexts = next_candidate_ends(mask, lengths)
        ends = resolve_ends(nexts, lengths, cfg, max_chunks)
        starts = jnp.concatenate(
            [jnp.zeros((ends.shape[0], 1), jnp.int32), ends[:, :-1]], axis=1)
        return ends - starts

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def make_gather_hash_fn(padded: int):
    """jit: (parts (B,P) u8, flat_starts (rows,) i32, sizes (rows,) i32)
    -> (lo, hi) u32 hash words. flat_starts index into parts.reshape(-1);
    rows with size 0 are padding (hash discarded by the caller)."""
    import jax
    import jax.numpy as jnp

    def fn(parts, flat_starts, sizes):
        flat = parts.reshape(-1)
        n = flat.shape[0]
        offs = jnp.arange(padded, dtype=jnp.int32)
        idx = flat_starts[:, None] + offs[None, :]
        in_range = offs[None, :] < sizes[:, None]
        data = jnp.where(
            in_range, jnp.take(flat, jnp.clip(idx, 0, n - 1), axis=0), 0)
        return _blake3.hash_chunks_u32(data, sizes, xp=jnp)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def make_pad_words_fn(slack_words: int):
    """jit: (B, P) u8 -> (>= B*P//4 + slack_words,) u32 little-endian word
    view, zero-padded to a multiple of 1024 words so the pack kernel can
    view it as (n, 1024) 4 KiB rows with every DMA window in bounds."""
    import jax
    import jax.numpy as jnp

    def fn(parts):
        words = jax.lax.bitcast_convert_type(
            parts.reshape(-1, 4), jnp.uint32)
        n = words.shape[0] + slack_words
        return jnp.pad(words, (0, -(-n // 1024) * 1024 - words.shape[0]))

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def make_pack_hash_fn(padded: int, rows: int):
    """jit: (flat_words (Nw,) u32, starts (rows,) i32 byte offsets,
    sizes (rows,) i32) -> (lo, hi) u32 hash words.

    Packs each chunk's bytes into a (rows, padded//4) u32 word batch with a
    Pallas kernel, then BLAKE3-hashes the batch.  A flat ``jnp.take``
    gather lowers to a dynamic gather (~750 ms vs ~3 ms of BLAKE3 work on a
    64 MiB batch); instead each row issues one 2-D DMA of the
    (n_rows, 1024)-word window holding its chunk — the word stream is
    viewed as rows of 1024 words (4 KiB) so both DMA sides carry standard
    2-D tiling (a 1-D HBM->VMEM DMA trips "tiling mismatch for 1D tiles"
    in Mosaic) — then shifts the extra 0..4095 window bytes off
    in-register: a dynamic lane rotate + one-row sublane carry emulates
    the flattened word rotate, and a sub-word byte funnel shift finishes.
    flat_words must carry >= padded//4 + 2048 slack words past the last
    valid start and be a multiple of 1024 words long (make_pad_words_fn).
    Rows with size 0 are padding.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # 8 rows per grid step: the output block sublane dim must be a multiple
    # of 8, and batching the DMAs keeps the DMA engine busy.  `rows` is
    # pow2-rounded >= 32 by the caller.
    R = 8
    assert rows % R == 0
    P4 = padded // 4          # payload words per row
    L = 128                   # words per window row (one 8x128 i32 tile
    #                           spans exactly 4 KiB -> a dynamic dim-0 slice
    #                           at (start // 4096) * 8 is tile-aligned)
    NW = 8 * (-(-(P4 + 1024 + L) // 1024))  # window rows, multiple of 8
    NOUT = P4 // L            # payload rows written out (P4 % 128 == 0)
    u32 = jnp.uint32

    def pack_kernel(starts_ref, sizes_ref, words_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, 2)
        nslot = 1 - slot

        def dma(row, s, i):
            r0 = (starts_ref[row] // 4096) * 8   # 4 KiB floor, 8-row tiles
            return pltpu.make_async_copy(
                words_ref.at[pl.ds(pl.multiple_of(r0, 8), NW)],
                scratch.at[s, i], sems.at[s, i])

        @pl.when(g == 0)
        def _():
            for i in range(R):
                dma(i, 0, i).start()

        @pl.when(g + 1 < rows // R)
        def _():
            for i in range(R):
                dma((g + 1) * R + i, nslot, i).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (NW, L), 1)
        byte0 = (jax.lax.broadcasted_iota(jnp.int32, (NW, L), 0) * L
                 + lane) * 4
        rows_out = []
        for i in range(R):
            dma(g * R + i, slot, i).wait()
            start = starts_ref[g * R + i]
            d = jax.lax.rem(start, 4096)      # byte offset within window
            q = jax.lax.div(d, 4)             # word shift, 0..1023
            qr = jax.lax.div(q, L)            # whole-row part, 0..7
            qc = jax.lax.rem(q, L)            # in-row part, 0..127
            r8 = (jax.lax.rem(d, 4) * 8).astype(u32)  # sub-word bit shift
            v = scratch[slot, i]              # (NW, L)
            # y[a, b] = flatwindow[qc + a*L + b]: dynamic lane left-rotate
            # by qc (cyclic roll right by L - qc), lanes that wrapped take
            # the next sublane row's value instead.
            w = pltpu.roll(v, L - qc, axis=1)
            w1 = pltpu.roll(w, NW - 1, axis=0)      # w[a+1, b]
            y = jnp.where(lane < L - qc, w, w1)
            # u[a, b] = y[a + qr, b]: 8-way select over static row rolls
            # (dynamic sublane rotates are not universally supported)
            u = pltpu.roll(y, NW - 7, axis=0)       # k = 7
            for k in range(6, -1, -1):
                u = jnp.where(qr == k,
                              pltpu.roll(y, (NW - k) % NW, axis=0), u)
            # un[j] = flatwindow[q + j + 1]: static single-word shift
            s1 = pltpu.roll(u, L - 1, axis=1)       # u[a, (b+1) % L]
            d1 = pltpu.roll(s1, NW - 1, axis=0)     # u[a+1, (b+1) % L]
            un = jnp.where(lane < L - 1, s1, d1)
            # funnel shift; two-step left shift keeps counts < 32 when r8=0
            row = (u >> r8) | ((un << (u32(31) - r8)) << u32(1))
            # zero bytes at and beyond this row's size (exact hash input)
            nb = jnp.clip(sizes_ref[g * R + i] - byte0, 0, 4)
            nbp = jnp.minimum(nb, 3).astype(u32)    # keep shifts < 32
            partial_mask = (u32(1) << (nbp * 8)) - u32(1)
            mask = jnp.where(nb >= 4, u32(0xFFFFFFFF),
                             jnp.where(nb > 0, partial_mask, u32(0)))
            rows_out.append((row & mask)[:NOUT])
        out_ref[:] = jnp.stack(rows_out, axis=0)     # (R, NOUT, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (R, NOUT, L), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, R, NW, L), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, R)),
        ],
    )

    def fn(flat_words, starts, sizes):
        words2d = flat_words.reshape(-1, L)
        packed = pl.pallas_call(
            pack_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, NOUT, L), jnp.uint32),
            interpret=jax.default_backend() != "tpu",
        )(starts, sizes, words2d)
        packed = packed.reshape(rows, NOUT * L)
        return _blake3.hash_chunks_words(packed, sizes, xp=jnp)

    return jax.jit(fn)


def _pow2_padded(sizes: np.ndarray, cap: int) -> np.ndarray:
    """Next power-of-two multiple of 1 KiB >= size, capped at cap."""
    leaves = np.maximum(-(-sizes // _LEAF), 1)
    pow2 = np.uint64(1) << np.uint64(
        np.ceil(np.log2(leaves)).astype(np.int64))
    return np.minimum(pow2.astype(np.int64) * _LEAF, cap)


# Per-dispatch packed-chunk budget: rows * padded <= this.  One dispatch
# shape per size class at steady state, so the number of distinct compiled
# programs stays O(#size classes) — compiles are expensive (remote AOT).
_ROWS_BUDGET = 8 << 20


def _rows_cap(padded: int) -> int:
    return max(32, _ROWS_BUDGET // int(padded))


def _round_rows(n: int, cap: int) -> int:
    """Pad bucket row counts to powers of two in [32, cap]."""
    r = 32
    while r < n and r < cap:
        r *= 2
    return min(r, cap)


def _prefetch(it: Iterable, depth: int) -> Iterator:
    """Pull from `it` on a background thread so file I/O overlaps device
    compute (the analog of the reference's channel-1 block-reader jobs)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for x in it:
                q.put(x)
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is _END:
            return
        if isinstance(x, BaseException):
            raise x
        yield x


class DevicePartIndexer:
    """Streams file parts through the device chunk+hash pipeline.

    Parameters: ``target_chunk_size`` fixes the chunking geometry and the
    part size (``target_chunk_size * 1024``, src/longtail.c:2396-2404);
    ``batch_bytes`` sizes the lane batch (static shape -> one compile).
    """

    def __init__(self, target_chunk_size: int,
                 batch_bytes: int = 64 << 20, lanes: int | None = None):
        self.cfg = ChunkerConfig.from_target(target_chunk_size)
        self.part_bytes = target_chunk_size * 1024
        self.lanes = lanes or max(1, batch_bytes // self.part_bytes)
        self.max_chunks = self.cfg.max_chunks(self.part_bytes)
        self._resolve = make_resolve_fn(self.cfg, self.max_chunks)

    def submit(self, tags, dev_parts, lengths):
        """Stage 1 on an already-device-resident (B, P) uint8 batch:
        dispatch the resolve step (async) and return the stage-1 entry."""
        sizes_dev = self._resolve(dev_parts, lengths)  # async
        return (tags, dev_parts, sizes_dev)

    def submit_host(self, batch):
        """Stage 1 from host parts: pack (tag, bytes) pairs into a lane
        batch, stage to device, dispatch resolve."""
        import jax

        B, P = self.lanes, self.part_bytes
        tags = [t for t, _ in batch]
        buf = np.zeros((B, P), dtype=np.uint8)
        lengths = np.zeros((B,), dtype=np.int32)
        for i, (_, part) in enumerate(batch):
            part = np.asarray(part, dtype=np.uint8)
            if len(part) > P:
                raise ValueError(
                    f"part of {len(part)} bytes > part_bytes {P}")
            buf[i, : len(part)] = part
            lengths[i] = len(part)
        return self.submit(tags, jax.device_put(buf), lengths)

    def plan_hash(self, entry):
        """Stage 2: sync stage-1 sizes, group chunks into power-of-two size
        buckets, dispatch one gather+BLAKE3 call per bucket (async)."""
        tags, dev_parts, sizes_dev = entry
        P = self.part_bytes
        n = len(tags)
        sizes = np.asarray(sizes_dev)  # sync point for stage 1
        counts = (sizes > 0).sum(axis=1)
        lane_sizes = []
        all_starts, all_sizes = [], []
        for b in range(n):
            sz = sizes[b, : counts[b]].astype(np.int64)
            lane_sizes.append(sz.astype(np.uint32))
            st = np.zeros(len(sz), dtype=np.int64)
            np.cumsum(sz[:-1], out=st[1:])
            all_starts.append(st + b * P)
            all_sizes.append(sz)
        if all_starts:
            flat_starts = np.concatenate(all_starts)
            flat_sizes = np.concatenate(all_sizes)
        else:
            flat_starts = np.zeros(0, np.int64)
            flat_sizes = np.zeros(0, np.int64)
        padded = _pow2_padded(flat_sizes, self.cfg.padded_chunk) \
            if len(flat_sizes) else flat_sizes
        flat_dev = make_pad_words_fn(
            self.cfg.padded_chunk // 4 + 2048)(dev_parts)
        buckets = []
        for cls_size in np.unique(padded):
            rows_all = np.flatnonzero(padded == cls_size)
            cap = _rows_cap(int(cls_size))
            for off in range(0, len(rows_all), cap):
                rows = rows_all[off: off + cap]
                r = _round_rows(len(rows), cap)
                bs = np.zeros(r, dtype=np.int32)
                bz = np.zeros(r, dtype=np.int32)
                bs[: len(rows)] = flat_starts[rows]
                bz[: len(rows)] = flat_sizes[rows]
                lo, hi = make_pack_hash_fn(int(cls_size), r)(
                    flat_dev, bs, bz)  # async
                buckets.append((lo, hi, rows))
        return (tags, lane_sizes, counts[:n], buckets)

    def retire(self, entry):
        """Stage 3: sync the bucket hash results and yield
        (tag, sizes u32, hashes u64) per part in submission order."""
        tags, lane_sizes, counts, buckets = entry
        total = int(counts.sum())
        hashes = np.empty(total, dtype=np.uint64)
        for lo, hi, rows in buckets:
            lo = np.asarray(lo).astype(np.uint64)
            hi = np.asarray(hi).astype(np.uint64)
            hashes[rows] = (lo | (hi << np.uint64(32)))[: len(rows)]
        off = 0
        for tag, sz, cnt in zip(tags, lane_sizes, counts):
            yield tag, sz, hashes[off: off + int(cnt)]
            off += int(cnt)

    def index_stream(self, tagged_parts: Iterable[Tuple[object, np.ndarray]],
                     prefetch_depth: int | None = None,
                     ) -> Iterator[Tuple[object, np.ndarray, np.ndarray]]:
        """Consume (tag, part_bytes) pairs; yield (tag, sizes u32, hashes u64)
        per part in submission order. Parts must be <= part_bytes long."""
        B = self.lanes
        depth = prefetch_depth if prefetch_depth is not None else 2 * B
        src = _prefetch(tagged_parts, depth) if depth else iter(tagged_parts)

        stage1: deque = deque()
        stage2: deque = deque()
        batch: list = []
        for item in src:
            batch.append(item)
            if len(batch) == B:
                stage1.append(self.submit_host(batch))
                batch = []
                if len(stage1) >= 2:
                    stage2.append(self.plan_hash(stage1.popleft()))
                if len(stage2) >= 2:
                    yield from self.retire(stage2.popleft())
        if batch:
            stage1.append(self.submit_host(batch))
        while stage1:
            stage2.append(self.plan_hash(stage1.popleft()))
        while stage2:
            yield from self.retire(stage2.popleft())
