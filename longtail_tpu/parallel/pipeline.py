"""Batched device chunk+hash pipeline — the production TPU data plane.

The reference's chunking hot loop is one Bikeshed job per file part
(``ChunkAssets`` src/longtail.c:2429-2462); ours batches file parts into
fixed-shape row buffers and streams them through the device in a
three-stage async pipeline:

- **Stage 1 (device)**: fused Pallas candidate scan + cut-resolution walk
  (parallel/stage1.py) over a whole lane batch: three dispatches, ~9 GB/s
  on a v5e chip.  Only chunk *sizes* come back to host — a ~1000:1 data
  reduction vs the byte stream.
- **Stage 2 (host plan)**: host groups the resolved chunks by
  power-of-two padded size class (static-shape discipline), repairing any
  ambiguity-flagged lane exactly via the native host chunker.
- **Stage 3 (device)**: per class, one Pallas pack kernel gathers chunk
  bytes at arbitrary offsets out of the resident batch into aligned word
  rows, and the Pallas BLAKE3 kernel (ops/blake3_kernel.py) hashes them
  (~100 GB/s).

Shape discipline: every device program sees a handful of static shapes —
one stage-1 geometry and one (padded, rows) pair per size class — so a
cold start compiles ~10 programs; ``DevicePartIndexer(prewarm=True)``
compiles them concurrently at construction.  Device buffers use the
canonical ``(n_bytes // 128, 128)`` u8 row layout end to end: XLA's
compile time for large u8 reshapes is pathological (139 s for a 64 MiB
(B, P) -> rows reshape on this toolchain), so hosts lay out rows before
``device_put`` and device code never reshapes u8.

Because jax dispatch is async, stage 1 of batch N+1 overlaps host
planning of batch N and the hash dispatches of batch N-1; file I/O is
overlapped by a prefetch thread.

Bit-exactness: stages 1-3 produce exactly the chunk boundaries and
BLAKE3-64 hashes of the host oracle (tests/test_pipeline.py), with
flagged lanes re-chunked on host (stage1 docstring).
"""

from __future__ import annotations

import functools
import queue
import threading
from collections import deque
from typing import Iterable, Iterator, Tuple

import numpy as np

from longtail_tpu.ops.blake3_kernel import hash_chunks_words_device
from longtail_tpu.parallel.device_chunker import ChunkerConfig
from longtail_tpu.parallel.stage1 import (
    Stage1Plan,
    make_stage1_fn,
    repair_lane,
    unpack_stage1,
)

_LEAF = 1024

# Per-dispatch packed-chunk budget: rows * padded == this for every size
# class, so each class has exactly ONE compiled (padded, rows) variant and
# rows * padded / 1024 leaves is always a multiple of 1024 (the BLAKE3
# kernel's lane-tile requirement).
_ROWS_BUDGET = 8 << 20


def _rows_for(padded: int) -> int:
    # floor 256: the blake2 kernel tiles 256 chunk-lanes per grid step
    # (and 256 * max class size still fits the dispatch budget 2x over)
    return max(256, _ROWS_BUDGET // int(padded))


def _padded_words_rows(n_u8_rows: int, slack_words: int) -> int:
    """Row count of make_pad_words_fn's output for an (R, 128) u8 input."""
    w2 = n_u8_rows // 4
    extra = -(-slack_words // 128)
    return w2 + ((-(w2 + extra)) % 8) + extra


@functools.lru_cache(maxsize=8)
def make_pad_words_fn(slack_words: int):
    """jit: (R, 128) u8 rows -> (R2, 128) u32 little-endian word rows,
    zero-padded with >= slack_words extra words and a row count divisible
    by 8, so every pack-kernel DMA window is in bounds."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(rows_u8):
        R = rows_u8.shape[0]
        words = jax.lax.bitcast_convert_type(
            rows_u8.reshape(R, 32, 4), jnp.uint32)   # (R, 32)
        w2 = words.reshape(R // 4, 128)
        pad_rows = _padded_words_rows(R, slack_words) - w2.shape[0]
        return jnp.pad(w2, ((0, pad_rows), (0, 0)))

    return fn


def _words_hasher(kind: str, device: bool):
    """words-level hash entry for a hash seam: (words, lengths)->(lo, hi)."""
    if kind == "blake3":
        if device:
            return functools.partial(hash_chunks_words_device,
                                     skip_empty_tiles=True)
        from longtail_tpu.ops import blake3 as _b
        import jax.numpy as jnp
        return lambda w, s: _b.hash_chunks_words(w, s, xp=jnp)
    if kind == "blake2":
        if device:
            from longtail_tpu.ops import blake2_kernel as _b2k
            return functools.partial(_b2k.hash_chunks_words_device,
                                     skip_empty_tiles=True)
        from longtail_tpu.ops import blake2 as _b2
        import jax.numpy as jnp
        return lambda w, s: _b2.hash_chunks_words(w, s, xp=jnp)
    raise ValueError(f"no device hasher for {kind!r}")


@functools.lru_cache(maxsize=32)
def make_gather_hash_xla(padded: int, rows: int, kind: str = "blake3"):
    """Pure-XLA stage 3 (non-TPU backends): flat-gather chunk bytes out of
    the word rows and hash with the batched XLA hasher.  Exact but slow on
    TPU (dynamic gather); used where pallas interpret mode would unroll
    the grid at trace time.  Gather and hash are SEPARATE jits: fusing the
    take-gather into the hash's fori body hangs the XLA CPU optimizer
    (observed minutes-to-hours; each piece alone compiles in seconds)."""
    import jax
    import jax.numpy as jnp

    hasher = _words_hasher(kind, device=False)

    @jax.jit
    def gather_fn(words2d, starts, sizes):
        flat = words2d.reshape(-1)
        nw = flat.shape[0]
        # gather word-aligned window then shift off the 0..3 byte phase
        w0 = starts // 4
        offs = jnp.arange(padded // 4 + 1, dtype=jnp.int32)
        idx = jnp.clip(w0[:, None] + offs[None, :], 0, nw - 1)
        win = jnp.take(flat, idx, axis=0)            # (rows, P4+1)
        sh = ((starts % 4) * 8).astype(jnp.uint32)[:, None]
        lo = win[:, :-1] >> sh
        # two-step left shift keeps counts < 32 when sh == 0
        hi = (win[:, 1:] << (jnp.uint32(31) - sh)) << jnp.uint32(1)
        words = lo | hi                              # (rows, P4)
        byte0 = (jnp.arange(padded // 4, dtype=jnp.int32) * 4)[None, :]
        nb = jnp.clip(sizes[:, None] - byte0, 0, 4)
        nbp = jnp.minimum(nb, 3).astype(jnp.uint32)
        pmask = (jnp.uint32(1) << (nbp * 8)) - jnp.uint32(1)
        m = jnp.where(nb >= 4, jnp.uint32(0xFFFFFFFF),
                      jnp.where(nb > 0, pmask, jnp.uint32(0)))
        return words & m

    # NOTE: no jnp.stack on the hash output — appending a stack to the
    # hash graph makes the XLA CPU backend emit a program that never
    # terminates (observed on jax 0.9 / this toolchain; each piece alone
    # runs fine).  retire() np.asarray's the (lo, hi) tuple instead.
    hash_fn = jax.jit(hasher)

    def fn(words2d, starts, sizes):
        return hash_fn(gather_fn(words2d, starts, sizes), sizes)

    return fn


def _pack_callable(padded: int, rows: int):
    """The raw (unjitted) Pallas pack-kernel callable, shared by the
    per-class jits (make_pack_fn / make_pack_hash_fn) and the fused
    whole-batch stage-3 program (make_stage3_fn): (starts, sizes,
    words2d) -> (rows, NOUT, L) u32.

    Each row issues one 2-D DMA of the (n_rows, 1024)-word window holding
    its chunk — the word stream is viewed as rows of 128 words (512 B) so
    both DMA sides carry standard 2-D tiling — then shifts the extra
    0..4095 window bytes off in-register: a dynamic lane rotate + one-row
    sublane carry emulates the flattened word rotate, and a sub-word byte
    funnel shift finishes.  (A flat ``jnp.take`` gather would lower to a
    dynamic gather: ~750 ms vs ~3 ms of BLAKE3 work on a 64 MiB batch.)
    words2d must carry >= padded//4 + 2048 slack words past the last
    valid start and have a row count divisible by 8 (make_pad_words_fn).
    Rows with size 0 are padding and MUST be packed last (a grid step
    whose first row is empty is skipped entirely).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # 32 rows per grid step (8 for tiny row counts): the output block
    # sublane dim must be a multiple of 8, batching the DMAs keeps the
    # DMA engine busy, and a wide step amortizes the fixed per-grid-step
    # cost (the same overhead that dominated the walk kernel; 8-row
    # steps measured ~4.4 us/step for ~1 us of work).
    R = 32 if rows % 32 == 0 else 8
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
        # used rows are packed to the front, so a step whose FIRST row has
        # size 0 is all padding: skip its DMAs and compute entirely (its
        # output is garbage the host never reads).  Callers size classes
        # generously; this makes the padding rows free.
        has_work = sizes_ref[g * R] > 0

        def dma(row, s, i):
            r0 = (starts_ref[row] // 4096) * 8   # 4 KiB floor, 8-row tiles
            return pltpu.make_async_copy(
                words_ref.at[pl.ds(pl.multiple_of(r0, 8), NW)],
                scratch.at[s, i], sems.at[s, i])

        @pl.when((g == 0) & has_work)
        def _():
            for i in range(R):
                dma(i, 0, i).start()

        @pl.when((g + 1 < rows // R)
                 & (sizes_ref[jnp.minimum((g + 1) * R, rows - 1)] > 0))
        def _():
            for i in range(R):
                dma((g + 1) * R + i, nslot, i).start()

        @pl.when(has_work)
        def _compute():
            lane = jax.lax.broadcasted_iota(jnp.int32, (NW, L), 1)
            byte0 = (jax.lax.broadcasted_iota(jnp.int32, (NW, L), 0) * L
                     + lane) * 4
            rows_out = []
            for i in range(R):
                dma(g * R + i, slot, i).wait()
                start = starts_ref[g * R + i]
                d = jax.lax.rem(start, 4096)  # byte offset within window
                q = jax.lax.div(d, 4)         # word shift, 0..1023
                qr = jax.lax.div(q, L)        # whole-row part, 0..7
                qc = jax.lax.rem(q, L)        # in-row part, 0..127
                r8 = (jax.lax.rem(d, 4) * 8).astype(u32)  # sub-word bits
                v = scratch[slot, i]          # (NW, L)
                # y[a, b] = flatwindow[qc + a*L + b]: dynamic lane
                # left-rotate by qc (cyclic roll right by L - qc), lanes
                # that wrapped take the next sublane row's value instead.
                w = pltpu.roll(v, L - qc, axis=1)
                w1 = pltpu.roll(w, NW - 1, axis=0)      # w[a+1, b]
                y = jnp.where(lane < L - qc, w, w1)
                # u[a, b] = y[a + qr, b]: 8-way select over static row
                # rolls (dynamic sublane rotates aren't supported)
                u = pltpu.roll(y, NW - 7, axis=0)       # k = 7
                for k in range(6, -1, -1):
                    u = jnp.where(qr == k,
                                  pltpu.roll(y, (NW - k) % NW, axis=0), u)
                # un[j] = flatwindow[q + j + 1]: static single-word shift
                s1 = pltpu.roll(u, L - 1, axis=1)       # u[a, (b+1) % L]
                d1 = pltpu.roll(s1, NW - 1, axis=0)     # u[a+1, (b+1) % L]
                un = jnp.where(lane < L - 1, s1, d1)
                # funnel shift; two-step left keeps counts < 32 when r8=0
                row = (u >> r8) | ((un << (u32(31) - r8)) << u32(1))
                # zero bytes at/after this row's size (exact hash input)
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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (R, NOUT, L), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, R, NW, L), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, R)),
        ],
    )

    def call(words2d, starts, sizes):
        packed = pl.pallas_call(
            pack_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, NOUT, L), jnp.uint32),
            interpret=jax.default_backend() != "tpu",
        )(starts, sizes, words2d)
        return packed.reshape(rows, NOUT * L)

    return call


@functools.lru_cache(maxsize=16)
def make_pack_fn(padded: int, rows: int):
    """jit of the Pallas pack kernel alone (see _pack_callable)."""
    import jax

    return jax.jit(_pack_callable(padded, rows))


@functools.lru_cache(maxsize=16)
def make_pack_hash_fn(padded: int, rows: int, kind: str = "blake3"):
    """jit: (words2d (N2, 128) u32, starts (rows,) i32 byte offsets,
    sizes (rows,) i32) -> (lo, hi) u32 hash words.

    Packs each chunk's bytes into a (rows, padded//4) u32 word batch with
    the Pallas pack kernel (make_pack_fn), then hashes the batch with the
    Pallas tree kernel.  Same input contract as make_pack_fn."""
    import jax
    import jax.numpy as jnp

    pack = make_pack_fn(padded, rows)
    hasher = _words_hasher(kind, device=True)

    @jax.jit
    def fn(words2d, starts, sizes):
        lo, hi = hasher(pack(words2d, starts, sizes), sizes)
        return jnp.stack([lo, hi])          # (2, rows): one D2H fetch

    return fn


def _row_mult(cls: int) -> int:
    """Row-count divisibility for a size class: the blake2 kernel tiles
    256 lanes, the blake3 kernel needs rows*leaves % 1024 == 0."""
    leaves = cls // _LEAF
    return max(256, 1024 // max(leaves, 1))


def pow2_cap(padded_chunk: int) -> int:
    """Largest size class: next power-of-two multiple of 1 KiB >=
    padded_chunk.  Every class must be a power-of-two leaf count (the
    BLAKE3 kernel requires it), so when max_size is not a power of two
    (e.g. target 24576 -> max 49152) the cap class rounds UP — a clamp to
    padded_chunk itself would produce a class class_plan never plans and
    _dispatch_buckets_tpu would silently drop those chunks."""
    leaves = -(-padded_chunk // _LEAF)
    p = 1
    while p < leaves:
        p *= 2
    return p * _LEAF


def class_floor(cfg: ChunkerConfig) -> int:
    """Smallest size class: the power-of-two >= 2 * min_size (capped).
    Chunks below it pad up into the floor class — the sub-min classes
    hold a small fraction of the bytes, and folding them cuts the
    compiled-program count (cold prewarm) and the per-batch dispatch
    count (each dispatch costs an RTT on the dev rig) by ~40%."""
    f = _LEAF
    target = min(2 * cfg.min_size, pow2_cap(cfg.padded_chunk))
    while f < target:
        f *= 2
    return f


def class_plan(cfg: ChunkerConfig, batch_bytes: int) -> tuple:
    """Fixed per-batch bucket geometry: ((cls, rows), ...) for every
    power-of-two size class from class_floor up.  Every class gets rows
    for 1.4x the batch's TOTAL expected chunk count (capped by the hard
    per-class maximum batch_bytes / (cls/2)): real corpora concentrate
    chunks in whatever class their structure favors (a text-heavy batch
    cuts ~3/4 of its chunks at the floor class), so share-based
    provisioning spilled on every batch.  Generous rows are ~free at
    runtime — the pack kernel skips all-padding row groups and the hash
    kernel skips empty tiles — and since the fused stage-3 program keeps
    packed buffers as jit-internal intermediates, they cost peak HBM
    only while their class executes.  Overflow beyond 1.4x total still
    spills to same-shape extra dispatches (correctness fallback)."""
    e_total = max(1, batch_bytes // cfg.avg_size)
    cap = pow2_cap(cfg.padded_chunk)
    floor = class_floor(cfg)

    plan = []
    c = floor
    while c <= cap:
        # hard max chunks whose padded class is c: sizes > c/2 (for the
        # floor class: sizes > min_size, its smallest possible member)
        hard = batch_bytes // max(c // 2, cfg.min_size)
        m = _row_mult(c)
        rows = min(int(1.4 * e_total), max(hard, 1))
        rows = max(m, -(-rows // m) * m)
        plan.append((c, rows))
        c *= 2
    return tuple(plan)


@functools.lru_cache(maxsize=8)
def make_stage3_fn(layout: tuple, kind: str = "blake3"):
    """ONE jit for the whole of stage 3: (words2d, blob) -> (2, sum r)
    u32 hash words.  The blob is the concatenation of each planned
    class's starts then sizes (make_split_fn layout); inside the program
    each class slice feeds its Pallas pack kernel + tree-hash kernel and
    the per-class results concatenate.  Collapses the former split +
    K pack+hash + concat dispatch chain into a single dispatch — each
    jit CALL costs ~1 ms of host overhead on the dev rig, which at
    ~10 dispatches/batch was the pipeline's actual bottleneck.  A bonus:
    the (large, padded) packed-chunk buffers become jit-internal
    intermediates, live only while their class executes."""
    import jax
    import jax.numpy as jnp

    packs = [(r, _pack_callable(cls, r)) for cls, r in layout]
    hasher = _words_hasher(kind, device=True)

    @jax.jit
    def fn(words2d, blob):
        outs = []
        o = 0
        for r, pack in packs:
            st = blob[o:o + r]
            sz = blob[o + r:o + 2 * r]
            o += 2 * r
            lo, hi = hasher(pack(words2d, st, sz), sz)
            outs.append(jnp.stack([lo, hi]))
        return jnp.concatenate(outs, axis=1)

    return fn


@functools.lru_cache(maxsize=8)
def make_split_fn(layout: tuple):
    """jit: one uploaded i32 blob -> per-class (starts, sizes) device
    arrays.  `layout` is ((cls, rows), ...); blob is the concatenation of
    each class's starts then sizes.  One H2D upload per batch instead of
    two per bucket (each numpy-arg upload costs an RTT on this rig)."""
    import jax

    @jax.jit
    def fn(blob):
        out = []
        o = 0
        for _, r in layout:
            out.append((blob[o:o + r], blob[o + r:o + 2 * r]))
            o += 2 * r
        return out

    return fn


@functools.lru_cache(maxsize=32)
def make_concat_fn(n: int):
    """jit: n (2, r_i) hash results -> one (2, sum r_i) array, so the
    whole batch's hashes ride ONE device->host fetch (each fetch costs
    an RTT on this rig; a structured batch can have 9+ buckets)."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda *rs: jnp.concatenate(rs, axis=1))


def _pow2_padded(sizes: np.ndarray, cap: int, floor: int = _LEAF
                 ) -> np.ndarray:
    """Next power-of-two multiple of 1 KiB >= size, clamped to
    [floor, cap] (both must be planned classes)."""
    leaves = np.maximum(-(-sizes // _LEAF), 1)
    pow2 = np.uint64(1) << np.uint64(
        np.ceil(np.log2(leaves)).astype(np.int64))
    return np.clip(pow2.astype(np.int64) * _LEAF, floor, cap)


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
    ``batch_bytes`` sizes the lane batch (static shape -> one compile set).
    ``prewarm`` compiles every device program concurrently up front.
    """

    def __init__(self, target_chunk_size: int,
                 batch_bytes: int = 64 << 20, lanes: int | None = None,
                 prewarm: bool = False, hash_kind: str = "blake3",
                 device=None, compress: bool = False):
        import jax

        self.hash_kind = hash_kind
        self.device = device       # pin all work to one mesh device
        self.compress = compress   # stage-1 also emits anchor bin-mins
        self.cfg = ChunkerConfig.from_target(target_chunk_size)
        self.part_bytes = target_chunk_size * 1024
        self._on_tpu = jax.default_backend() == "tpu"
        self.lanes = lanes or max(1, batch_bytes // self.part_bytes)
        if not self._on_tpu and lanes is None:
            # XLA CPU compile time grows superlinearly with the lane
            # count (186 s at B=64 vs 9 s at B=3 for the resolve scan)
            # and the host backend gains nothing from wide batches
            self.lanes = min(self.lanes, 8)
        self.plan = Stage1Plan(self.cfg, self.lanes, self.part_bytes)
        # in-flight batches per pipeline stage: deep enough that the one
        # synchronous fetch per batch overlaps other batches' dispatches
        self.queue_depth = 3
        self._cap = pow2_cap(self.cfg.padded_chunk)
        self._floor = class_floor(self.cfg)
        self._slack = self._cap // 4 + 2048
        self._class_plan = class_plan(self.cfg, self.lanes * self.part_bytes)
        self._stage1 = make_stage1_fn(self.plan, device,
                                      with_anchors=compress,
                                      slack_words=self._slack)
        if prewarm:
            self.prewarm()

    # -- compile warmup ---------------------------------------------------

    def prewarm(self) -> None:
        """Compile every device program this pipeline can dispatch, in
        parallel (cold-start compile latency hiding; the persistent jax
        compilation cache makes later runs instant)."""
        import concurrent.futures as cf

        import jax
        import jax.numpy as jnp

        B, P = self.lanes, self.part_bytes
        R = B * P // 128

        def warm_stage1():
            rows = jnp.zeros((R, 128), jnp.uint8)
            lens = jnp.zeros((B,), jnp.int32)
            jax.block_until_ready(self._stage1(rows, lens)[0])

        def warm_stage3():
            from longtail_tpu.parallel.stage1 import words2d_rows

            n2 = words2d_rows(self.plan, self._slack) if self._on_tpu \
                else _padded_words_rows(R, self._slack)
            w2 = jnp.zeros((n2, 128), jnp.uint32)
            n = sum(2 * r for _, r in self._class_plan)
            jax.block_until_ready(
                make_stage3_fn(self._class_plan, self.hash_kind)(
                    w2, jnp.zeros((n,), jnp.int32)))

        def warm_anchor_bins():
            from longtail_tpu.parallel.device_match import (
                make_bins_anchor_packed_fn,
            )

            n_bins = B * P // 256
            jax.block_until_ready(make_bins_anchor_packed_fn(
                n_bins, (8 << 20) // 256)(
                    jnp.zeros((n_bins,), jnp.uint32)))

        jobs = [warm_stage1, warm_stage3]
        if self.compress:
            jobs.append(warm_anchor_bins)
        with cf.ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            list(ex.map(lambda f: f(), jobs))

    # -- stage 1 ----------------------------------------------------------

    def submit(self, tags, dev_rows, lengths, host_rows=None):
        """Stage 1 on an already-device-resident (B*P//128, 128) uint8 row
        batch: dispatch the resolve step (async; the result's D2H copy is
        started immediately) and return the stage-1 entry.  host_rows
        (same bytes on host) enables cheap lane repair.  With
        compress=True the scan kernel also emits the anchor bin-mins,
        carried device-resident in the entry; the word-row relayout for
        stage 3 is computed in the scan dispatch either way."""
        packed, bins, words2d = self._stage1(dev_rows, lengths)  # async
        return (tags, dev_rows, lengths, packed, host_rows, bins, words2d)

    def submit_host(self, batch):
        """Stage 1 from host parts: pack (tag, bytes) pairs into the row
        batch, stage to device, dispatch resolve."""
        import jax

        B, P = self.lanes, self.part_bytes
        tags = [t for t, _ in batch]
        buf = np.zeros((B * P // 128, 128), dtype=np.uint8)
        flat = buf.reshape(-1)
        lengths = np.zeros((B,), dtype=np.int32)
        for i, (_, part) in enumerate(batch):
            part = np.asarray(part, dtype=np.uint8)
            if len(part) > P:
                raise ValueError(
                    f"part of {len(part)} bytes > part_bytes {P}")
            flat[i * P: i * P + len(part)] = part
            lengths[i] = len(part)
        return self.submit(tags, jax.device_put(buf, self.device),
                           lengths, host_rows=buf)

    # -- stage 2 + 3 ------------------------------------------------------

    def plan_hash(self, entry, keep_words: bool = False):
        """Stage 2: sync stage-1 sizes, repair any ambiguity-flagged lane,
        group chunks into power-of-two size buckets, dispatch one
        pack+BLAKE3 call per bucket group (async).

        keep_words=True appends the device-resident word-row batch and
        the stage-1 anchor bin-mins to the returned entry (entries [4]
        and [5]) so a stage-4 consumer (the device block codec,
        parallel/device_match.py) can run on the SAME HBM-resident data
        without a re-upload or a re-read."""
        tags, dev_rows, lengths, packed_dev, host_rows, bins, words2d = \
            entry
        P = self.part_bytes
        n_lanes = len(tags)
        packed = np.asarray(packed_dev)  # sync point (D2H already running)
        sizes, counts, amb = unpack_stage1(packed, self.plan)
        for b in range(n_lanes):
            if amb[b]:
                if host_rows is not None:
                    lane = host_rows.reshape(-1)[b * P: b * P + lengths[b]]
                else:
                    rp = P // 128
                    lane = np.asarray(
                        dev_rows[b * rp: (b + 1) * rp]).reshape(-1)
                    lane = lane[: lengths[b]]
                fixed = repair_lane(lane, self.cfg)
                counts[b] = len(fixed)
                sizes[b, : len(fixed)] = fixed
                sizes[b, len(fixed):] = 0

        lane_sizes = []
        all_starts, all_sizes = [], []
        for b in range(n_lanes):
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
        padded = _pow2_padded(flat_sizes, self._cap, self._floor) \
            if len(flat_sizes) else flat_sizes
        if self._on_tpu:
            buckets = self._dispatch_buckets_tpu(
                words2d, flat_starts, flat_sizes, padded)
        else:
            buckets = self._dispatch_buckets_xla(
                words2d, flat_starts, flat_sizes, padded)
        if keep_words:
            return (tags, lane_sizes, counts[:n_lanes], buckets, words2d,
                    bins)
        return (tags, lane_sizes, counts[:n_lanes], buckets)

    def _dispatch_buckets_tpu(self, words2d, flat_starts, flat_sizes,
                              padded):
        """Fixed class plan, one H2D blob upload, ONE fused stage-3
        dispatch (split + per-class pack + hash + concat in a single
        program), ONE concatenated D2H hash fetch: on the dev rig every
        jit call, numpy-arg upload, and result fetch costs ~1 ms+, so
        the whole batch rides one of each."""
        import jax

        plan = self._class_plan
        blob_parts = []
        mapping = []   # chunk-row indices per planned slot
        spills = []    # (cls, r, rows) overflow slots, dispatched apart
        for cls, r in plan:
            rows_all = np.flatnonzero(padded == cls)
            head, rest = rows_all[:r], rows_all[r:]
            bs = np.zeros(r, dtype=np.int32)
            bz = np.zeros(r, dtype=np.int32)
            bs[: len(head)] = flat_starts[head]
            bz[: len(head)] = flat_sizes[head]
            blob_parts += [bs, bz]
            mapping.append(head)
            for off in range(0, len(rest), r):
                spills.append((cls, r, rest[off: off + r]))
        blob = jax.device_put(np.concatenate(blob_parts), self.device)
        # the blob layout is ALWAYS the class plan — one compiled stage-3
        # program, so no batch's chunk-size distribution can trigger a
        # cold mid-run compile (spill slots go separately below)
        allres = make_stage3_fn(plan, self.hash_kind)(words2d, blob)
        allres.copy_to_host_async()
        slots = []     # (rows_idx, offset into the concat) per slot
        off = 0
        for (cls, r), rows in zip(plan, mapping):
            slots.append((rows, off, r))
            off += r
        buckets = [(allres, slots)]
        # spill slots: rare (every class is provisioned for 1.4x the
        # batch's TOTAL expected chunks), so they pay their own upload +
        # dispatch + fetch rather than perturbing the fixed fast path
        for cls, r, rows in spills:
            sb = np.zeros(r, dtype=np.int32)
            sz = np.zeros(r, dtype=np.int32)
            sb[: len(rows)] = flat_starts[rows]
            sz[: len(rows)] = flat_sizes[rows]
            res = make_pack_hash_fn(cls, r, self.hash_kind)(
                words2d, jax.device_put(sb, self.device),
                jax.device_put(sz, self.device))
            res.copy_to_host_async()
            buckets.append((res, rows))
        return buckets

    def _dispatch_buckets_xla(self, words2d, flat_starts, flat_sizes,
                              padded):
        """Non-TPU path: small pow2-rounded shapes (compile diversity is
        cheap on CPU, and interpret-mode pallas is avoided entirely)."""
        buckets = []
        for cls_size in np.unique(padded):
            rows_all = np.flatnonzero(padded == cls_size)
            cap = _rows_for(int(cls_size))
            for off in range(0, len(rows_all), cap):
                rows = rows_all[off: off + cap]
                r = 32
                while r < len(rows):
                    r *= 2
                hash_fn = make_gather_hash_xla(int(cls_size), r,
                                               self.hash_kind)
                bs = np.zeros(r, dtype=np.int32)
                bz = np.zeros(r, dtype=np.int32)
                bs[: len(rows)] = flat_starts[rows]
                bz[: len(rows)] = flat_sizes[rows]
                res = hash_fn(words2d, bs, bz)  # async
                buckets.append((res, rows))
        return buckets

    def submit_compress(self, entry, block_bytes: int = 8 << 20,
                        max_offset_words: int = 16383):
        """Stage 4: anchor extraction for the batch (requires
        plan_hash(keep_words=True)).  With compress=True the stage-1
        scan already emitted the per-bin gram-hash argmins in the same
        byte pass, so only the small bin-level sorts run here; otherwise
        the fast-tier scan re-reads the resident word rows.  Returns the
        single-fetch packed result — collect with collect_compress()."""
        from longtail_tpu.parallel.device_match import (
            make_bins_anchor_packed_fn,
            make_fast_anchor_packed_fn,
        )

        bins = entry[5]
        if bins is not None:
            n_bins = int(np.prod(bins.shape))
            fn = make_bins_anchor_packed_fn(
                n_bins, block_bytes // 256,
                max_offset_words=max_offset_words)
            packed = fn(bins)
        else:
            words2d = entry[4]
            n_words = int(np.prod(words2d.shape))
            fn = make_fast_anchor_packed_fn(
                n_words, block_bytes // 4,
                max_offset_words=max_offset_words)
            packed = fn(words2d)   # (B, 2*cap + 1): pos | ref | count
        packed.copy_to_host_async()
        return packed

    @staticmethod
    def collect_compress(handle):
        """Sync stage-4 results (ONE device fetch): per-block
        position-sorted byte-offset (pos, ref) anchor lists, ready for
        ops/lz4.assemble_anchors (or the zstd sequence encoder)."""
        arr = np.asarray(handle)
        cap = (arr.shape[1] - 1) // 2
        out = []
        for b in range(arr.shape[0]):
            c = int(arr[b, -1])
            out.append((arr[b, :c].astype(np.int64) * 4,
                        arr[b, cap:cap + c].astype(np.int64) * 4))
        return out

    def retire(self, entry):
        """Stage 3 drain: sync the bucket hash results and yield
        (tag, sizes u32, hashes u64) per part in submission order."""
        tags, lane_sizes, counts, buckets = entry[:4]
        total = int(counts.sum())
        hashes = np.empty(total, dtype=np.uint64)
        for res, meta in buckets:
            res = np.asarray(res)
            if isinstance(meta, list):
                # TPU path: one concatenated (2, sum_r) fetch + slot map
                for rows, off, r in meta:
                    lo = res[0, off:off + r].astype(np.uint64)
                    hi = res[1, off:off + r].astype(np.uint64)
                    hashes[rows] = (lo | (hi << np.uint64(32)))[: len(rows)]
            else:
                lo = res[0].astype(np.uint64)
                hi = res[1].astype(np.uint64)
                hashes[meta] = (lo | (hi << np.uint64(32)))[: len(meta)]
        off = 0
        for tag, sz, cnt in zip(tags, lane_sizes, counts):
            yield tag, sz, hashes[off: off + int(cnt)]
            off += int(cnt)

    # -- streaming driver -------------------------------------------------

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
        d = self.queue_depth
        for item in src:
            batch.append(item)
            if len(batch) == B:
                stage1.append(self.submit_host(batch))
                batch = []
                if len(stage1) >= d:
                    stage2.append(self.plan_hash(stage1.popleft()))
                if len(stage2) >= d:
                    yield from self.retire(stage2.popleft())
        if batch:
            stage1.append(self.submit_host(batch))
        while stage1:
            stage2.append(self.plan_hash(stage1.popleft()))
        while stage2:
            yield from self.retire(stage2.popleft())


class MeshPartIndexer:
    """The Pallas data plane on a device mesh: one device-pinned
    DevicePartIndexer per mesh device, batches dealt round-robin, results
    retired in global submission order.

    This runs the SAME stage-1 scan+walk kernels and pack+hash kernels as
    the single-chip path on every device (SURVEY §2.5: one hot loop for
    every configuration, src/longtail.c:2429-2462) — unlike the round-2/3
    mesh step, which fell back to the slow XLA chunker formulation under
    shard_map.  Each device's pipeline overlaps independently; a
    single-device mesh therefore matches the non-mesh pipeline's
    throughput by construction.  Global dedup stays a host-side
    concatenate+unique in the single-controller driver (the all-gather
    collective in parallel/distributed.py covers the multi-process
    case)."""

    def __init__(self, target_chunk_size: int, devices,
                 batch_bytes_per_dev: int = 64 << 20,
                 lanes: int | None = None, prewarm: bool = False,
                 hash_kind: str = "blake3"):
        self.indexers = [
            DevicePartIndexer(target_chunk_size,
                              batch_bytes=batch_bytes_per_dev,
                              lanes=lanes, hash_kind=hash_kind,
                              device=d)
            for d in devices
        ]
        if prewarm:
            self.indexers[0].prewarm()   # programs are shared per shape
        self.part_bytes = self.indexers[0].part_bytes
        self.cfg = self.indexers[0].cfg

    def index_stream(self, tagged_parts, prefetch_depth: int | None = None):
        """Same contract as DevicePartIndexer.index_stream, fanned out
        over every mesh device."""
        n = len(self.indexers)
        B = self.indexers[0].lanes
        depth = prefetch_depth if prefetch_depth is not None else 2 * B * n
        src = _prefetch(tagged_parts, depth) if depth else iter(tagged_parts)

        stage1: deque = deque()   # (device_idx, entry), FIFO = global order
        stage2: deque = deque()
        batch: list = []
        bi = 0
        d = self.indexers[0].queue_depth * n
        for item in src:
            batch.append(item)
            if len(batch) == B:
                i = bi % n
                stage1.append((i, self.indexers[i].submit_host(batch)))
                bi += 1
                batch = []
                if len(stage1) >= d:
                    i, e = stage1.popleft()
                    stage2.append((i, self.indexers[i].plan_hash(e)))
                if len(stage2) >= d:
                    i, e = stage2.popleft()
                    yield from self.indexers[i].retire(e)
        if batch:
            i = bi % n
            stage1.append((i, self.indexers[i].submit_host(batch)))
        while stage1:
            i, e = stage1.popleft()
            stage2.append((i, self.indexers[i].plan_hash(e)))
        while stage2:
            i, e = stage2.popleft()
            yield from self.indexers[i].retire(e)
