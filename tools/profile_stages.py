#!/usr/bin/env python
"""Per-stage timing of the device data plane on the real chip.

Times each dispatch group of the DevicePartIndexer pipeline separately
(scan / suffix / walk / post / pad / pack+hash / anchors) to locate the
bottleneck.  Rig rules (see memory): block_until_ready is fake — force
completion by fetching a small device-accumulated scalar; perturb inputs
every iteration (the runtime caches identical executions); long warmup
(the tunnel ramps with traffic).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from longtail_tpu.parallel.pipeline import DevicePartIndexer
from bench import structured_rows


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--batch-mib", type=int, default=64)
    ap.add_argument("--compress", action="store_true")
    args = ap.parse_args()
    N = args.iters

    t0 = time.perf_counter()
    indexer = DevicePartIndexer(32768, batch_bytes=args.batch_mib << 20,
                                prewarm=True, compress=args.compress)
    log(f"prewarm: {time.perf_counter() - t0:.1f}s "
        f"(lanes={indexer.lanes}, classes={indexer._class_plan})")
    B, P = indexer.lanes, indexer.part_bytes
    R = B * P // 128
    base_R = 3 * (R // 8)
    base_dev = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(7), (base_R, 128), 0, 256,
        jnp.int32).astype(jnp.uint8))()
    batch = jax.jit(lambda b: structured_rows(b, jnp))(base_dev)
    lengths = np.full((B,), P, dtype=np.int32)
    lengths_dev = jax.device_put(lengths.astype(np.int32))
    perturb = jax.jit(lambda b, s: b ^ s)

    acc_add = jax.jit(lambda a, x: a + jnp.sum(x.astype(jnp.int32)))

    gb = N * B * P / 1e9

    def timeit(name, fn, warm=4):
        """fn(i) -> a device array; accumulate a scalar, fetch once."""
        for i in range(warm):
            a = acc_add(jnp.int32(0), fn(1000 + i))
        _ = np.asarray(a)
        t0 = time.perf_counter()
        a = jnp.int32(0)
        for i in range(N):
            a = acc_add(a, fn(i))
        _ = np.asarray(a)
        dt = time.perf_counter() - t0
        log(f"{name:28s} {dt / N * 1e3:8.2f} ms/batch   {gb / dt:6.2f} GB/s")
        return dt

    # dispatch overhead floor: trivial kernel on a tiny array
    tiny = jax.device_put(np.zeros((8, 128), np.uint8))
    timeit("tiny-dispatch floor", lambda i: perturb(tiny, jnp.uint8(i % 255 + 1)))

    timeit("perturb (64M copy)", lambda i: perturb(batch, jnp.uint8(i % 255 + 1)))

    # stage-1 internals (pallas path only)
    from longtail_tpu.parallel import stage1 as s1
    plan = indexer.plan

    full_s1 = indexer._stage1
    timeit("stage1 (scan+pad | walk)", lambda i: full_s1(
        perturb(batch, jnp.uint8(i % 255 + 1)), lengths_dev)[0])

    # pack+hash on realistic chunk geometry: use one real batch's plan
    entry = indexer.submit([None] * B, batch, lengths, host_rows=None)
    tags, dev_rows, lens_, packed_dev, _, bins, words2d = entry
    packed = np.asarray(packed_dev)
    sizes, counts, amb = s1.unpack_stage1(packed, plan)
    all_starts, all_sizes = [], []
    for b in range(B):
        sz = sizes[b, : counts[b]].astype(np.int64)
        st = np.zeros(len(sz), dtype=np.int64)
        np.cumsum(sz[:-1], out=st[1:])
        all_starts.append(st + b * P)
        all_sizes.append(sz)
    flat_starts = np.concatenate(all_starts)
    flat_sizes = np.concatenate(all_sizes)
    from longtail_tpu.parallel.pipeline import _pow2_padded
    padded = _pow2_padded(flat_sizes, indexer._cap, indexer._floor)
    log(f"chunks: {len(flat_sizes)}  classes: "
        f"{[(c, int((padded == c).sum())) for c, _ in indexer._class_plan]}")

    def pack_all(i):
        bl = indexer._dispatch_buckets_tpu(
            words2d, flat_starts, flat_sizes, padded)
        return bl[0][0]

    timeit("blob+fused stage3", pack_all)

    # host plan_hash (includes the sync)
    def s2(i):
        e = indexer.submit([None] * B,
                           perturb(batch, jnp.uint8(i % 255 + 1)), lengths)
        e2 = indexer.plan_hash(e, keep_words=args.compress)
        return e2[3][0][0]

    timeit("stage1+plan_hash (sync)", s2)

    if args.compress:
        def s3(i):
            e = indexer.submit([None] * B,
                               perturb(batch, jnp.uint8(i % 255 + 1)), lengths)
            e2 = indexer.plan_hash(e, keep_words=True)
            return indexer.submit_compress(e2)
        timeit("stage1+plan+anchors", s3)

    # full pipelined loop (bench-style, queue depth 3)
    from collections import deque

    def full_loop(n, compress):
        stage1q: deque = deque()
        stage2q: deque = deque()
        d = indexer.queue_depth

        def drain(item):
            e, ch = item
            for _, _, h in indexer.retire(e):
                pass
            if ch is not None:
                indexer.collect_compress(ch)
        for i in range(n):
            stage1q.append(indexer.submit(
                [None] * B, perturb(batch, jnp.uint8(i % 255 + 1)), lengths))
            if len(stage1q) >= d:
                e = indexer.plan_hash(stage1q.popleft(), keep_words=compress)
                ch = indexer.submit_compress(e) if compress else None
                stage2q.append((e, ch))
            if len(stage2q) >= d:
                drain(stage2q.popleft())
        while stage1q:
            e = indexer.plan_hash(stage1q.popleft(), keep_words=compress)
            ch = indexer.submit_compress(e) if compress else None
            stage2q.append((e, ch))
        while stage2q:
            drain(stage2q.popleft())

    full_loop(6, args.compress)  # warm
    t0 = time.perf_counter()
    full_loop(N, args.compress)
    dt = time.perf_counter() - t0
    log(f"{'full pipelined loop':28s} {dt / N * 1e3:8.2f} ms/batch   "
        f"{gb / dt:6.2f} GB/s")


if __name__ == "__main__":
    main()
