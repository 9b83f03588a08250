#!/usr/bin/env python
"""Benchmark harness (driver contract): prints ONE JSON line to stdout.

Measures the production TPU data plane — content-defined chunking
(candidate scan + cut resolution) plus per-chunk BLAKE3-64 hashing — as
end-to-end pipeline throughput in GB/s on the real chip, over a synthetic
workload, via longtail_tpu.parallel.pipeline.DevicePartIndexer.

This is the re-design of the reference's chunking hot loop (one Bikeshed
thread job per file part, ``ChunkAssets`` src/longtail.c:2429-2462 +
``DynamicChunking`` :1989-2311).  Baseline target: 5 GB/s/chip
(BASELINE.md, driver-set).  ``vs_baseline`` is value / 5.0.

Human-readable progress goes to stderr; stdout carries only the JSON line.

Usage: python bench.py [--gib N] [--mode chunk_hash|compress|downsync]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

# persistent XLA compile cache: first run pays the (remote, slow) AOT
# compiles; repeat runs start hot.  config.update, not env vars: the env
# image's sitecustomize imports jax at interpreter startup, freezing
# env-derived config before this file runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

BASELINE_GBPS = 5.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_corpus(total_bytes: int, seed: int = 7) -> np.ndarray:
    """Synthetic corpus with realistic structure at every layer: each
    64 MiB segment is a fresh structured batch (periodic/zeros/tiled/
    noise — see structured_rows, compresses ~2.5-4x like the reference's
    game-content corpora, CHANGELOG.md:51-58), and every 8th segment
    duplicates an earlier one so chunk-level dedup sees real hits.  The
    old corpus (one 16 MiB tile repeated) deduped ~250x and made
    store-side numbers meaninglessly easy."""
    rng = np.random.default_rng(seed)
    seg = 64 << 20
    out = np.empty(-(-total_bytes // seg) * seg, np.uint8)
    n_seg = len(out) // seg
    R = seg // 128
    for j in range(n_seg):
        if j >= 5 and j % 8 == 7:
            out[j * seg:(j + 1) * seg] = out[(j - 5) * seg:(j - 4) * seg]
            continue
        base = rng.integers(0, 256, (3 * (R // 8), 128), dtype=np.uint8)
        out[j * seg:(j + 1) * seg] = structured_rows(base, np).reshape(-1)
    return out[:total_bytes]


def parts_of(buf: np.ndarray, part_bytes: int):
    for off in range(0, len(buf), part_bytes):
        yield off, buf[off:off + part_bytes]


def structured_rows(base_rows, xp):
    """Build a realistic 8-region corpus batch from random base rows:
    2/8 short-period data (4.25 KiB tiles: text-analog), 1/8 zeros,
    2/8 24 KiB tile repeats, 3/8 incompressible noise.  Works for both
    numpy (host mirror) and jnp (device), so the device corpus and the
    host mirror are byte-identical (threefry is bit-deterministic
    across backends).  base_rows carries the 3/8 of unique randomness;
    the output has 8/3 x base rows."""
    r8 = base_rows.shape[0] // 3
    text = xp.tile(base_rows[:34], (2 * r8 // 34 + 1, 1))[: 2 * r8]
    zeros = xp.zeros((r8, 128), dtype=base_rows.dtype)
    tiled = xp.tile(base_rows[34:226], (2 * r8 // 192 + 1, 1))[: 2 * r8]
    noise = base_rows
    return xp.concatenate([text, zeros, tiled, noise], axis=0)


def bench_data_plane(total_bytes: int, target_chunk_size: int,
                     with_compress: bool, verify: bool = True,
                     batch_mib: int = 256) -> dict:
    """Device data-plane throughput over HBM-resident part batches:
    chunk (CDC scan + walk) + BLAKE3 hash, and optionally + the device
    block-codec anchor scan with host LZ4 assembly (the full
    chunk+hash+compress metric of BASELINE.md).

    The workload lives in HBM (generated on device): on this dev rig the
    host<->device path is a network tunnel capped at ~40 MB/s, which is
    not representative of production DMA and would mask all kernel work.
    Host planning, all result fetches, and (with_compress) the host-side
    LZ4 stream assembly against a byte-identical host mirror are
    included.  Each iteration XOR-perturbs the resident batch (the rig's
    runtime caches identical executions); the perturbation preserves
    byte-equality structure, so anchors remain valid against the
    unperturbed mirror and assembly output sizes are exact.

    verify=True pins correctness on the record: one deterministic batch's
    chunk sizes AND hashes are compared against the host oracle (native
    CDC + BLAKE3), and assembled blocks are decompressed and compared to
    the mirror bit-for-bit.  A wrong cut, hash, or match fails the bench.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from longtail_tpu.ops import lz4
    from longtail_tpu.parallel.pipeline import DevicePartIndexer

    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")

    t0 = time.perf_counter()
    # 256 MiB batches: the dev rig charges ~1 ms of host overhead per
    # jit call and a tunnel RTT per sync, so per-batch costs must be
    # amortized over as many bytes as HBM comfortably holds
    indexer = DevicePartIndexer(target_chunk_size, prewarm=True,
                                compress=with_compress,
                                batch_bytes=batch_mib << 20)
    log(f"prewarm (concurrent compile of all programs): "
        f"{time.perf_counter() - t0:.1f}s")
    B, P = indexer.lanes, indexer.part_bytes
    batch_bytes = B * P
    block_bytes = 8 << 20
    blocks_per_batch = batch_bytes // block_bytes
    n_batches = max(1, -(-total_bytes // batch_bytes))
    log(f"workload: {n_batches} batches x {batch_bytes >> 20} MiB "
        f"({B} lanes x {P >> 20} MiB parts), structured corpus")

    R = B * P // 128
    base_R = 3 * (R // 8)

    def gen(xp_random_rows):
        return structured_rows(xp_random_rows, jnp)

    t0 = time.perf_counter()
    base_dev = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(7), (base_R, 128), 0, 256,
        jnp.int32).astype(jnp.uint8))()
    batch_dev = jax.jit(gen)(base_dev)
    half = R // 2

    @jax.jit
    def perturb(b, s1, s2):
        # two independent u8 salts -> 65k distinct executions (the rig
        # caches identical ones), equality structure preserved
        return jnp.concatenate([b[:half] ^ s1, b[half:] ^ s2])

    def perturbed(b, i):
        return perturb(b, jnp.uint8(i % 255 + 1),
                       jnp.uint8((i // 255) % 255 + 1))

    jax.block_until_ready(perturbed(batch_dev, 0))
    log(f"on-device corpus gen: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        base_host = np.asarray(jax.jit(lambda: jax.random.randint(
            jax.random.PRNGKey(7), (base_R, 128), 0, 256,
            jnp.int32).astype(jnp.uint8))())
    mirror = structured_rows(base_host, np)          # (R, 128) u8
    mirror_flat = mirror.reshape(-1)
    mirror_blocks = [
        mirror_flat[b * block_bytes:(b + 1) * block_bytes].tobytes()
        for b in range(blocks_per_batch)]
    log(f"host mirror gen: {time.perf_counter() - t0:.1f}s")
    lengths = np.full((B,), P, dtype=np.int32)

    if with_compress:
        # warm the anchor-fn compile before timing
        e = indexer.plan_hash(indexer.submit(
            [None] * B, batch_dev, lengths), keep_words=True)
        jax.block_until_ready(indexer.submit_compress(e))

    asm_pool = ThreadPoolExecutor(max_workers=2)

    def run(n: int, compress: bool):
        stage1: deque = deque()
        stage2: deque = deque()
        asm_futures = []
        n_chunks = n_bytes = 0

        asm_buf = threading.local()

        def assemble(anchors):
            # per-thread reusable dst: the into-variant skips the memset
            # + copy-out of the bytes API (~3x assembly throughput)
            dst = getattr(asm_buf, "dst", None)
            if dst is None:
                dst = asm_buf.dst = np.empty(
                    lz4.compress_bound(block_bytes), np.uint8)
            total = 0
            for b, (apos, aref) in enumerate(anchors[:blocks_per_batch]):
                r = lz4.assemble_anchors_into(
                    mirror_blocks[b], apos, aref, dst)
                # store-raw-when-bigger, as the reference's
                # compressblockstore does (longtail_compressblockstore.c:86)
                total += min(r, block_bytes)
            return total

        def drain(item):
            nonlocal n_chunks, n_bytes
            entry, ch = item
            for _, sizes, hashes in indexer.retire(entry):
                n_chunks += len(hashes)
                n_bytes += int(np.asarray(sizes, dtype=np.int64).sum())
            if ch is not None:
                anchors = indexer.collect_compress(ch)
                asm_futures.append(asm_pool.submit(assemble, anchors))

        d = indexer.queue_depth
        for i in range(n):
            stage1.append(indexer.submit(
                [None] * B, perturbed(batch_dev, i), lengths))
            if len(stage1) >= d:
                e = indexer.plan_hash(stage1.popleft(),
                                      keep_words=compress)
                ch = indexer.submit_compress(e) if compress else None
                stage2.append((e, ch))
            if len(stage2) >= d:
                drain(stage2.popleft())
        while stage1:
            e = indexer.plan_hash(stage1.popleft(), keep_words=compress)
            ch = indexer.submit_compress(e) if compress else None
            stage2.append((e, ch))
        while stage2:
            drain(stage2.popleft())
        comp_bytes = sum(f.result() for f in asm_futures)
        return n_chunks, n_bytes, comp_bytes

    t0 = time.perf_counter()
    # steady-state shapes + the rig tunnel's traffic ramp (the rig's
    # throughput climbs with sustained traffic; a short warmup
    # understates the pipeline by up to ~2x)
    n_chunks, _, _ = run(max(8, n_batches // 2), with_compress)
    log(f"warmup: {time.perf_counter() - t0:.1f}s ({n_chunks} chunks)")

    result = {}
    if with_compress:
        t0 = time.perf_counter()
        n_chunks, n_bytes, comp = run(n_batches, True)
        dt = time.perf_counter() - t0
        assert n_bytes == n_batches * batch_bytes, (n_bytes, n_batches)
        gbps = n_bytes / dt / 1e9
        ratio = n_bytes / max(comp, 1)
        log(f"chunk+hash+compress: {dt:.2f}s  {gbps:.3f} GB/s  "
            f"{n_chunks} chunks  ratio {ratio:.2f}x")
        result.update({
            "metric": "chunk_hash_compress_throughput",
            "value": round(gbps, 3),
            "unit": "GB/s",
            "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            "compress_ratio": round(ratio, 2),
        })
        # context sub-metric: chunk+hash alone on a shorter run
        sub = min(n_batches, 16)
        t0 = time.perf_counter()
        _, nb, _ = run(sub, False)
        result["chunk_hash_gbps"] = round(nb / (time.perf_counter() - t0)
                                          / 1e9, 3)
        log(f"chunk+hash only (context): {result['chunk_hash_gbps']} GB/s")
        # context: the DEFAULT codec's device-assisted path (zstd via
        # anchor scan + ZSTD_compressSequences) vs host level 3, one block
        from longtail_tpu.ops import zstd as _z
        from longtail_tpu.ops import zstd_device
        if zstd_device._zstd_api() is not None:
            zt = h3 = raw = 0
            for blk in mirror_blocks:
                zout = zstd_device.compress_block(blk)
                assert _z.decompress(zout, len(blk)) == blk
                zt += len(zout)
                h3 += len(_z.compress(blk, 3))
                raw += len(blk)
            result["zstd_device_ratio"] = round(raw / zt, 2)
            result["zstd_level3_ratio"] = round(raw / h3, 2)
            log(f"zstd device-assisted (context, full batch): ratio "
                f"{result['zstd_device_ratio']}x vs host level3 "
                f"{result['zstd_level3_ratio']}x (decode verified)")
    else:
        t0 = time.perf_counter()
        n_chunks, n_bytes, _ = run(n_batches, False)
        dt = time.perf_counter() - t0
        assert n_bytes == n_batches * batch_bytes, (n_bytes, n_batches)
        gbps = n_bytes / dt / 1e9
        log(f"chunk+hash: {dt:.2f}s  {gbps:.3f} GB/s  {n_chunks} chunks")
        result.update({
            "metric": "chunk_hash_throughput",
            "value": round(gbps, 3),
            "unit": "GB/s",
            "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        })

    if verify:
        result["verified"] = verify_data_plane(
            indexer, batch_dev, lengths, mirror, mirror_blocks,
            target_chunk_size, with_compress)
    asm_pool.shutdown()
    return result


def verify_data_plane(indexer, batch_dev, lengths, mirror, mirror_blocks,
                      target_chunk_size: int, with_compress: bool) -> bool:
    """Bit-exactness on the record: device chunk sizes + hashes vs the
    host oracle (native CDC + BLAKE3), and device-anchored LZ4 blocks
    decode back to the mirror.  Raises on any mismatch."""
    from longtail_tpu.formats.constants import chunker_params_from_target
    from longtail_tpu.ops import blake3, cdc, lz4

    mn, av, mx = chunker_params_from_target(target_chunk_size)
    B, P = indexer.lanes, indexer.part_bytes
    entry = indexer.plan_hash(
        indexer.submit([None] * B, batch_dev, lengths),
        keep_words=with_compress)
    ch = indexer.submit_compress(entry) if with_compress else None
    flat = mirror.reshape(-1)
    t0 = time.perf_counter()
    for lane, (_, sizes, hashes) in enumerate(indexer.retire(entry)):
        data = flat[lane * P: lane * P + int(lengths[lane])]
        ref_ends = cdc.chunk_part(data, mn, av, mx)
        ref_sizes = np.diff(np.concatenate([[0], ref_ends]))
        assert np.array_equal(sizes.astype(np.int64), ref_sizes), \
            f"lane {lane}: chunk sizes diverge from host oracle"
        starts = np.concatenate([[0], ref_ends[:-1]]).astype(np.int64)
        ref_hashes = blake3.hash64_ranges(
            data, starts, ref_sizes.astype(np.int64))
        assert np.array_equal(hashes, ref_hashes), \
            f"lane {lane}: chunk hashes diverge from host oracle"
    log(f"verify: {B} lanes chunk+hash bit-exact vs host oracle "
        f"({time.perf_counter() - t0:.1f}s)")
    if ch is not None:
        anchors = indexer.collect_compress(ch)
        for b in range(min(len(mirror_blocks), len(anchors))):
            apos, aref = anchors[b]
            out = lz4.assemble_anchors(mirror_blocks[b], apos, aref)
            assert lz4.decompress(out, len(mirror_blocks[b])) == \
                mirror_blocks[b], f"block {b}: lz4 roundtrip mismatch"
        log(f"verify: {len(anchors)} device-anchored LZ4 blocks decode "
            "bit-exact")
    return True


def bench_mesh_chunk_hash(total_bytes: int, target_chunk_size: int) -> dict:
    """The mesh data plane on the available devices: the same resident
    batch loop as the main bench, but dealt round-robin over
    MeshPartIndexer's device-pinned pipelines.  On the 1-chip rig this
    pins the VERDICT 'single-device mesh within ~10% of non-mesh'
    criterion; on a pod slice it scales per device."""
    from collections import deque

    import jax
    import jax.numpy as jnp

    from longtail_tpu.parallel.pipeline import MeshPartIndexer

    devices = jax.devices()
    mesh_ix = MeshPartIndexer(target_chunk_size, devices, prewarm=True,
                              batch_bytes_per_dev=256 << 20)
    n = len(devices)
    B, P = mesh_ix.indexers[0].lanes, mesh_ix.part_bytes
    batch_bytes = B * P
    n_batches = max(2 * n, -(-total_bytes // batch_bytes))
    R = batch_bytes // 128
    base_R = 3 * (R // 8)
    base_dev = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(7), (base_R, 128), 0, 256,
        jnp.int32).astype(jnp.uint8))()
    batch0 = jax.jit(lambda b: structured_rows(b, jnp))(base_dev)
    per_dev = [jax.device_put(batch0, d) for d in devices]
    perturb = jax.jit(lambda b, s: b ^ s)
    jax.block_until_ready([perturb(b, jnp.uint8(1)) for b in per_dev])
    lengths = np.full((B,), P, dtype=np.int32)

    def run(nb):
        stage1: deque = deque()
        stage2: deque = deque()
        n_bytes = 0
        d = mesh_ix.indexers[0].queue_depth * n
        for i in range(nb):
            k = i % n
            stage1.append((k, mesh_ix.indexers[k].submit(
                [None] * B, perturb(per_dev[k], jnp.uint8(i % 255 + 1)),
                lengths)))
            if len(stage1) >= d:
                k, e = stage1.popleft()
                stage2.append((k, mesh_ix.indexers[k].plan_hash(e)))
            if len(stage2) >= d:
                k, e = stage2.popleft()
                for _, sizes, _ in mesh_ix.indexers[k].retire(e):
                    n_bytes += int(np.asarray(sizes, np.int64).sum())
        while stage1:
            k, e = stage1.popleft()
            stage2.append((k, mesh_ix.indexers[k].plan_hash(e)))
        while stage2:
            k, e = stage2.popleft()
            for _, sizes, _ in mesh_ix.indexers[k].retire(e):
                n_bytes += int(np.asarray(sizes, np.int64).sum())
        return n_bytes

    # warm steady shapes on every device; the rig's tunnel runtime also
    # ramps up with traffic, so a short warmup understates throughput
    run(max(8, 2 * n, n_batches // 3))
    t0 = time.perf_counter()
    n_bytes = run(n_batches)
    dt = time.perf_counter() - t0
    gbps = n_bytes / dt / 1e9
    log(f"mesh[{n} dev] chunk+hash: {dt:.2f}s {gbps:.3f} GB/s")
    return {
        "metric": "mesh_chunk_hash_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "n_devices": n,
    }


def bench_device_compress(total_bytes: int) -> dict:
    """Device LZ4 codec alone: batched fast-tier anchor scan
    (parallel/device_match.py) + native host assembly, over
    device-resident 64 MiB word batches (input staging excluded, same
    convention as the data-plane bench).  Reports device-scan GB/s,
    host-assembly GB/s/core, ratio vs the host greedy encoder."""
    import jax
    import jax.numpy as jnp

    from longtail_tpu.ops import lz4
    from longtail_tpu.parallel.device_match import (
        fast_block_anchors,
        make_fast_anchor_fn,
    )

    batch = 64 << 20
    block = 8 << 20
    total_bytes = max(batch, (total_bytes // batch) * batch)
    n_batches = total_bytes // batch
    rng = np.random.default_rng(11)
    text = (b"the quick brown fox jumps over the lazy dog; "
            b"pack my box with five dozen liquor jugs. ") * 12000
    tile = rng.integers(0, 256, 24 << 10, np.uint8).tobytes() * 40
    noise = rng.integers(0, 256, 1 << 20, np.uint8).tobytes()
    unit = text + bytes(1 << 19) + tile + noise
    corpus = (unit * (batch // len(unit) + 1))[:batch]
    w = jax.device_put(np.frombuffer(corpus, "<u4").copy())
    fn = make_fast_anchor_fn(batch // 4, block // 4)
    jax.block_until_ready(fn(w))
    log(f"device-lz4 workload: {n_batches} x 64 MiB batches")

    # device scan alone: perturb + dispatch per batch (async), counts
    # fetched per handle — a fused unrolled loop would blow up compile
    perturb = jax.jit(lambda x, s: x ^ s)
    sum_counts = jax.jit(lambda c: jnp.sum(c))
    _ = np.asarray(sum_counts(fn(perturb(w, jnp.uint32(1)))[2]))
    t0 = time.perf_counter()
    handles = [sum_counts(fn(perturb(w, jnp.uint32(i + 2)))[2])
               for i in range(n_batches)]
    _ = [np.asarray(h) for h in handles]
    scan_dt = time.perf_counter() - t0
    scan_gbps = n_batches * batch / scan_dt / 1e9

    # assembly + ratio on one batch
    anchors = fast_block_anchors(w, block // 4)
    srcs = [corpus[b * block:(b + 1) * block]
            for b in range(batch // block)]
    _ = lz4.assemble_anchors(srcs[0], *anchors[0])
    t0 = time.perf_counter()
    comp = 0
    for src, (apos, aref) in zip(srcs, anchors):
        comp += len(lz4.assemble_anchors(src, apos, aref))
    asm_gbps = batch / (time.perf_counter() - t0) / 1e9
    for src, (apos, aref) in zip(srcs, anchors):
        out = lz4.assemble_anchors(src, apos, aref)
        assert lz4.decompress(out, len(src)) == src
    host_comp = sum(len(lz4.compress(s)) for s in srcs)
    log(f"device lz4 scan: {scan_gbps:.2f} GB/s; assembly "
        f"{asm_gbps:.2f} GB/s/core; ratio {batch / comp:.2f}x "
        f"(host greedy {batch / host_comp:.2f}x); decode verified")
    return {
        "metric": "device_lz4_scan_throughput",
        "value": round(scan_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(scan_gbps / BASELINE_GBPS, 3),
        "compress_ratio": round(batch / comp, 2),
        "host_greedy_ratio": round(batch / host_comp, 2),
        "assembly_gbps_per_core": round(asm_gbps, 3),
    }


def bench_device_decode(total_bytes: int) -> dict:
    """The decode-side experiment on the record: batched LZ4 decode on
    the TPU (parse + interval expansion + pointer-jump gathers,
    parallel/device_decode.py) vs the host scalar decoder, bit-exact
    both ways.  The honest finding this mode documents: decode is
    random-access bound, and the chip's gather rate caps device decode
    below one host core — which is WHY the production downsync keeps
    decode host-side while the TPU owns the encode-side scan."""
    import jax

    from longtail_tpu.ops import lz4
    from longtail_tpu.parallel.device_decode import (
        decode_block_device,
        make_resolve_fn,
        parse_sequences,
    )

    block = 4 << 20
    n_blocks = max(4, min(16, total_bytes // block))
    rng = np.random.default_rng(5)
    tile = rng.integers(0, 256, 24 << 10, np.uint8).tobytes()
    text = (b"the quick brown fox jumps over the lazy dog; "
            b"pack my box with five dozen liquor jugs. ") * 6000
    blocks = []
    for i in range(n_blocks):
        noise = rng.integers(0, 256, block // 4, np.uint8).tobytes()
        raw = ((text + bytes(1 << 18) + tile * 20 + noise)
               * 4)[:block]
        blocks.append((raw, lz4.compress(raw)))
    log(f"device-decode workload: {n_blocks} x {block >> 20} MiB blocks "
        f"(ratio {sum(len(r) for r, _ in blocks) / sum(len(c) for _, c in blocks):.2f}x)")

    # warm compiles + verify bit-exactness on every block
    for raw, comp in blocks[:2]:
        assert decode_block_device(comp, len(raw)) == raw

    t0 = time.perf_counter()
    for raw, comp in blocks:
        out = decode_block_device(comp, len(raw))
        assert len(out) == len(raw)
    dev_dt = time.perf_counter() - t0
    dev_gbps = n_blocks * block / dev_dt / 1e9

    t0 = time.perf_counter()
    dst = np.empty(block, np.uint8)
    for raw, comp in blocks:
        lz4.decompress_into(comp, dst)
    host_dt = time.perf_counter() - t0
    host_gbps = n_blocks * block / host_dt / 1e9
    for raw, comp in blocks:
        assert decode_block_device(comp, len(raw)) == raw
    log(f"device decode: {dev_gbps:.3f} GB/s; host decode: "
        f"{host_gbps:.3f} GB/s/core (both bit-exact)")
    return {
        "metric": "device_lz4_decode_throughput",
        "value": round(dev_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(dev_gbps / BASELINE_GBPS, 3),
        "host_decode_gbps_per_core": round(host_gbps, 3),
        "note": "capability experiment: gather-rate-bound; production "
                "downsync keeps decode host-side by measurement",
    }


def bench_device_entropy(total_bytes: int) -> dict:
    """The TPU Huffman entropy stage on the record: device-packed zstd
    literal sections (ops/device_entropy.py) over text-like literal
    streams — throughput, byte-identity with the host encoder on exact-
    histogram sizes, and the full device-zstd block (TPU anchors + TPU
    literals entropy + from-spec frame, no libzstd in the encode path)
    vs libzstd level 3."""
    from longtail_tpu.ops import zstd as _z
    from longtail_tpu.ops import zstd_device, zstd_frame
    from longtail_tpu.ops.device_entropy import encode_literals_device

    rng = np.random.default_rng(13)
    text = (b"the quick brown fox jumps over the lazy dog; "
            b"pack my box with five dozen liquor jugs. " * 4000)
    skew = rng.choice(np.arange(256), size=1 << 20,
                      p=np.r_[np.full(16, 0.05),
                              np.full(240, 0.2 / 240)]).astype(np.uint8)
    sections = []
    seg = 128 << 10                     # one zstd block's literals
    stream = (text + skew.tobytes()) * 8
    n = max(seg, min(total_bytes, len(stream)))
    for off in range(0, n - seg + 1, seg):
        sections.append(stream[off:off + seg])

    # byte-identity on an exact-histogram size
    probe = sections[0][: 48 << 10]
    assert encode_literals_device(probe) == \
        zstd_frame._encode_literals(probe)

    # kernel throughput over DEVICE-RESIDENT literal streams (same
    # convention as every other device mode: the rig's 40 MB/s host<->
    # device tunnel is not production DMA and would mask all kernel
    # work).  One dispatch packs a 64-stream batch via the Pallas
    # bit-merge kernel; iterations cycle 4 pre-staged resident batches
    # (distinct inputs — the rig caches identical executions — without
    # paying an on-device roll per iteration, which costs as much as
    # the pack itself); one tiny fetch forces completion.
    import jax
    import jax.numpy as jnp

    from longtail_tpu.ops.entropy_kernel import (
        make_hufpack_rows_fn,
        pack_code_table,
    )
    from longtail_tpu.ops.zstd_frame import build_huffman

    S, seg_pad = 128, 128 << 10
    big = (stream * (S * seg_pad // len(stream) + 1))[: S * seg_pad]
    lits_np = np.frombuffer(big, np.uint8).reshape(S, seg_pad)
    freqs = np.bincount(lits_np[:4].reshape(-1), minlength=256)
    _, code_val, code_len = build_huffman(freqs.tolist())
    fn = make_hufpack_rows_fn(seg_pad, S)
    tv = jax.device_put(pack_code_table(np.asarray(code_val),
                                        np.asarray(code_len)))
    bufs = [jax.device_put(np.roll(lits_np, k, axis=0).reshape(-1, 128))
            for k in range(4)]
    n_lit = jax.device_put(np.full((S,), seg_pad, np.int32))
    tot = jax.jit(lambda t: jnp.sum(t))
    _ = np.asarray(tot(fn(bufs[0], n_lit, tv)[1]))         # warm
    for k in range(12):                                    # ramp the rig
        _, t = fn(bufs[k % 4], n_lit, tv)
    _ = np.asarray(tot(t))
    iters = 16
    t0 = time.perf_counter()
    acc = None
    for k in range(iters):
        w, t = fn(bufs[k % 4], n_lit, tv)
        acc = tot(t)
    _ = np.asarray(acc)
    dt = time.perf_counter() - t0
    kernel_raw = iters * S * seg_pad
    gbps = kernel_raw / dt / 1e9
    comp = sum(len(encode_literals_device(s)) for s in sections)
    raw = sum(len(s) for s in sections)
    log(f"device literals entropy (resident batch): {gbps:.3f} GB/s; "
        f"section ratio {raw / comp:.2f}x")

    # full device-zstd block, no libzstd in the encode path
    block = stream[: 4 << 20]
    frame = zstd_device.compress_block(block)
    assert zstd_frame.decompress(frame, len(block)) == block
    result = {
        "metric": "device_entropy_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "section_ratio": round(raw / comp, 2),
        "device_zstd_ratio": round(len(block) / len(frame), 2),
    }
    if _z._load_native() is not None:
        assert _z.decompress(frame, len(block)) == block
        result["zstd_level3_ratio"] = round(
            len(block) / len(_z.compress(block, 3)), 2)
        log(f"device-zstd frame (TPU anchors + TPU entropy): ratio "
            f"{result['device_zstd_ratio']}x vs host L3 "
            f"{result['zstd_level3_ratio']}x (upstream-decode verified)")
    return result


def bench_compress(total_bytes: int) -> dict:
    """Host block-codec throughput (compress+decompress verify), LZ4 path."""
    from longtail_tpu.ops import lz4

    buf = make_corpus(total_bytes)
    block = 8 << 20
    t0 = time.perf_counter()
    comp = 0
    for off in range(0, len(buf), block):
        comp += len(lz4.compress(buf[off:off + block].tobytes()))
    dt = time.perf_counter() - t0
    gbps = total_bytes / dt / 1e9
    log(f"lz4 compress: {dt:.2f}s {gbps:.3f} GB/s ratio "
        f"{total_bytes / comp:.2f}x")
    return {
        "metric": "lz4_compress_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }


def bench_real_data(total_bytes: int, path: str) -> dict:
    """Real on-disk data mode: chunk+dedup+compress an actual directory
    tree (default /usr) so ratio and dedup-rate claims rest on real
    content, not the constructed corpus.  Host data plane (the tree is
    host-resident; the device benches measure kernels on HBM-resident
    data by design).  Reports end-to-end upsync GB/s, compress ratio,
    and chunk-level dedup rate."""
    import shutil
    import tempfile

    from longtail_tpu import api
    from longtail_tpu.formats import constants as C
    from longtail_tpu.stores.compressblockstore import CompressBlockStore
    from longtail_tpu.stores.fsblockstore import FSBlockStore
    from longtail_tpu.stores.storage import FSStorage

    if not os.path.isdir(path):
        log(f"real-data path {path} absent; skipping")
        return {"metric": "real_data_upsync_throughput", "value": 0.0,
                "unit": "GB/s", "vs_baseline": 0.0, "skipped": True}
    base = tempfile.mkdtemp(prefix="lt_real_")
    try:
        st = FSStorage()
        store = CompressBlockStore(
            FSBlockStore(st, os.path.join(base, "store")))
        t0 = time.perf_counter()
        vi, vsi = api.upsync(
            st, path.rstrip("/"), store,
            compression_tag=C.COMPRESSION_TYPE_ZSTD_DEFAULT, workers=8)
        dt = time.perf_counter() - t0
        raw = int(vi.asset_sizes.sum())
        stored = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(base, "store"))
            for f in fs)
        # version index chunk table is already unique; dedup rate =
        # referenced asset bytes over unique chunk bytes
        unique_chunk_bytes = int(
            np.asarray(vi.chunk_sizes, np.int64).sum())
        dedup = raw / max(unique_chunk_bytes, 1)
        gbps = raw / dt / 1e9
        log(f"real-data upsync [{path}]: {raw / 1e9:.2f} GB in {dt:.1f}s "
            f"= {gbps:.3f} GB/s; ratio {raw / max(stored, 1):.2f}x; "
            f"chunk dedup {dedup:.2f}x ({vi.asset_count} assets, "
            f"{vi.chunk_count} chunks)")
        return {
            "metric": "real_data_upsync_throughput",
            "value": round(gbps, 3),
            "unit": "GB/s",
            "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            "compress_ratio": round(raw / max(stored, 1), 2),
            "chunk_dedup_ratio": round(dedup, 2),
            "raw_gb": round(raw / 1e9, 2),
            "path": path,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_downsync(total_bytes: int) -> dict:
    """End-to-end cold downsync (the reference's headline unpack benchmark,
    CHANGELOG.md:51-78): upsync a synthetic tree into a zstd fs store, then
    reconstruct it through the CLI in a subprocess — wall-clock GB/s plus
    the child's peak RSS (the 0.4.1 memory story)."""
    import shutil
    import subprocess
    import tempfile

    from longtail_tpu import api
    from longtail_tpu.formats import constants as C
    from longtail_tpu.stores.compressblockstore import CompressBlockStore
    from longtail_tpu.stores.fsblockstore import FSBlockStore
    from longtail_tpu.stores.storage import FSStorage

    base = tempfile.mkdtemp(prefix="lt_bench_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        corpus = make_corpus(total_bytes)
        file_bytes = 64 << 20
        for i in range(0, len(corpus), file_bytes):
            with open(os.path.join(src, f"f{i // file_bytes:04d}.bin"),
                      "wb") as f:
                f.write(corpus[i:i + file_bytes].tobytes())
        del corpus
        st = FSStorage()
        store = CompressBlockStore(
            FSBlockStore(st, os.path.join(base, "store")))
        t0 = time.perf_counter()
        vi, _ = api.upsync(
            st, src, store,
            compression_tag=C.COMPRESSION_TYPE_ZSTD_DEFAULT, workers=8)
        up_dt = time.perf_counter() - t0
        lvi = os.path.join(base, "v.lvi")
        with open(lvi, "wb") as f:
            f.write(vi.to_bytes())
        stored = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(base, "store")) for f in fs)
        log(f"upsync: {up_dt:.2f}s {total_bytes / up_dt / 1e9:.3f} GB/s "
            f"ratio {total_bytes / stored:.2f}x")

        out = os.path.join(base, "out")
        t0 = time.perf_counter()
        child = subprocess.Popen(
            [sys.executable, "-m", "longtail_tpu.cli", "--workers", "8",
             "downsync",
             "--storage-uri", os.path.join(base, "store"),
             "--source-path", lvi, "--target-path", out],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        # sample /proc: getrusage(RUSAGE_CHILDREN).ru_maxrss counts the
        # brief fork window where the child still shares this process's
        # (corpus-sized) pages, wildly overstating the child's real peak
        rss_kb = 0
        while child.poll() is None:
            try:
                with open(f"/proc/{child.pid}/status") as f:
                    for ln in f:
                        if ln.startswith("VmRSS"):
                            rss_kb = max(rss_kb, int(ln.split()[1]))
            except FileNotFoundError:
                break   # pid vanished between poll() and open()
            time.sleep(0.05)
        child.wait()    # reap + ensure returncode is set after the break
        if child.returncode != 0:
            raise RuntimeError(f"downsync failed: {child.returncode}")
        dt = time.perf_counter() - t0
        gbps = total_bytes / dt / 1e9
        log(f"downsync: {dt:.2f}s {gbps:.3f} GB/s  peak RSS "
            f"{rss_kb / 1048576:.2f} GiB")
        # verify a sample file round-tripped
        sample = sorted(os.listdir(src))[0]
        with open(os.path.join(src, sample), "rb") as a, \
                open(os.path.join(out, sample), "rb") as b:
            assert a.read() == b.read(), "reconstruction mismatch"
        return {
            "metric": "downsync_throughput",
            "value": round(gbps, 3),
            "unit": "GB/s",
            "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            "peak_rss_gib": round(rss_kb / 1048576, 3),
            "upsync_gbps": round(total_bytes / up_dt / 1e9, 3),
            "compress_ratio": round(total_bytes / stored, 2),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=4.0,
                    help="workload size in GiB")
    ap.add_argument("--mode", default="chunk_hash_compress",
                    choices=["chunk_hash_compress", "chunk_hash",
                             "mesh_chunk_hash", "compress",
                             "device_compress", "device_decode",
                             "device_entropy", "downsync", "real"])
    ap.add_argument("--path", default="/usr",
                    help="directory tree for --mode real")
    ap.add_argument("--target-chunk-size", type=int, default=32768)
    ap.add_argument("--batch-mib", type=int, default=256)
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the bit-exactness verification phase")
    args = ap.parse_args()

    total = int(args.gib * 2**30)
    if args.mode == "chunk_hash_compress":
        result = bench_data_plane(total, args.target_chunk_size,
                                  with_compress=True,
                                  verify=not args.no_verify,
                                  batch_mib=args.batch_mib)
    elif args.mode == "chunk_hash":
        result = bench_data_plane(total, args.target_chunk_size,
                                  with_compress=False,
                                  verify=not args.no_verify,
                                  batch_mib=args.batch_mib)
    elif args.mode == "mesh_chunk_hash":
        result = bench_mesh_chunk_hash(total, args.target_chunk_size)
    elif args.mode == "downsync":
        result = bench_downsync(total)
    elif args.mode == "device_compress":
        result = bench_device_compress(total)
    elif args.mode == "device_decode":
        result = bench_device_decode(total)
    elif args.mode == "device_entropy":
        result = bench_device_entropy(total)
    elif args.mode == "real":
        result = bench_real_data(total, args.path)
    else:
        result = bench_compress(total)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
