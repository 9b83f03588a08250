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
    """Synthetic corpus: random base tiles with repeated spans so both the
    chunker (cut distribution) and dedup see realistic structure."""
    rng = np.random.default_rng(seed)
    tile = rng.integers(0, 256, size=16 << 20, dtype=np.uint8)
    reps = -(-total_bytes // len(tile))
    buf = np.tile(tile, reps)[:total_bytes]
    # overwrite some spans with earlier content -> duplicate chunks
    n = len(buf)
    for _ in range(8):
        src = int(rng.integers(0, max(1, n // 2)))
        dst = int(rng.integers(n // 2, max(n // 2 + 1, n - (1 << 20))))
        ln = int(min(1 << 20, n - dst))
        buf[dst:dst + ln] = buf[src:src + ln]
    return buf


def parts_of(buf: np.ndarray, part_bytes: int):
    for off in range(0, len(buf), part_bytes):
        yield off, buf[off:off + part_bytes]


def bench_chunk_hash(total_bytes: int, target_chunk_size: int) -> dict:
    """Device chunk+hash pipeline throughput over HBM-resident part batches.

    The workload lives in HBM (generated on device): on this dev rig the
    host<->device path is a network tunnel capped at ~40 MB/s, which is not
    representative of production DMA and would mask all kernel work.  The
    host planning step (stage-2 bucketing) and all result fetches are
    included — this is the full pipeline minus input staging.
    """
    from collections import deque

    import jax
    import jax.numpy as jnp

    from longtail_tpu.parallel.pipeline import DevicePartIndexer

    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")

    t0 = time.perf_counter()
    indexer = DevicePartIndexer(target_chunk_size, prewarm=True)
    log(f"prewarm (concurrent compile of all programs): "
        f"{time.perf_counter() - t0:.1f}s")
    B, P = indexer.lanes, indexer.part_bytes
    batch_bytes = B * P
    n_batches = max(1, -(-total_bytes // batch_bytes))
    # every submission gets a DISTINCT input: this rig's remote runtime
    # caches identical executions, so repeating a batch would fake the
    # number.  A bounded pool of generated batches stays resident (>2 GiB
    # resident pushes the chip into HBM pressure and tanks throughput) and
    # each submission XORs in the iteration index — one cheap device pass
    # that makes every execution's input unique.
    k = min(8, n_batches)
    log(f"workload: {n_batches} batches x {batch_bytes >> 20} MiB "
        f"({B} lanes x {P >> 20} MiB parts), {k} resident + xor-perturb")

    R = B * P // 128
    gen = jax.jit(lambda key: jax.random.randint(
        key, (R, 128), 0, 256, jnp.int32).astype(jnp.uint8))
    perturb = jax.jit(lambda b, s: b ^ s)
    t0 = time.perf_counter()
    batches = [gen(jax.random.PRNGKey(i)) for i in range(k)]
    jax.block_until_ready(batches)
    jax.block_until_ready(perturb(batches[0], jnp.uint8(1)))
    log(f"on-device corpus gen: {time.perf_counter() - t0:.1f}s")
    lengths = np.full((B,), P, dtype=np.int32)

    # context: measure the (tunnel-capped) host->device staging rate on a
    # small probe (excluded from the metric, see docstring)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.zeros(1 << 20, np.uint8)))
    dt = time.perf_counter() - t0
    log(f"context: device_put 1 MiB took {dt:.2f}s "
        f"(~{1 / max(dt, 1e-9):.1f} MB/s tunnel; excluded, see docstring)")

    def run(n: int, verbose: bool = False):
        stage1: deque = deque()
        stage2: deque = deque()
        n_chunks = n_bytes = 0

        def drain(entry):
            nonlocal n_chunks, n_bytes
            for _, sizes, hashes in indexer.retire(entry):
                n_chunks += len(hashes)
                n_bytes += int(np.asarray(sizes, dtype=np.int64).sum())

        d = indexer.queue_depth
        for i in range(n):
            if verbose:
                log(f"  submit {i} @ {time.perf_counter() - tv:.1f}s")
            stage1.append(indexer.submit(
                [None] * B,
                perturb(batches[i % k], jnp.uint8((i // k + 1) & 255)),
                lengths))
            if len(stage1) >= d:
                if verbose:
                    log(f"  plan @ {time.perf_counter() - tv:.1f}s")
                stage2.append(indexer.plan_hash(stage1.popleft()))
            if len(stage2) >= d:
                if verbose:
                    log(f"  drain @ {time.perf_counter() - tv:.1f}s")
                drain(stage2.popleft())
        while stage1:
            stage2.append(indexer.plan_hash(stage1.popleft()))
        while stage2:
            drain(stage2.popleft())
        return n_chunks, n_bytes

    tv = time.perf_counter()

    t0 = time.perf_counter()
    n_chunks, _ = run(min(4, k), verbose=True)  # warmup: steady-state shapes
    log(f"warmup: {time.perf_counter() - t0:.1f}s ({n_chunks} chunks)")

    t0 = time.perf_counter()
    n_chunks, n_bytes = run(n_batches)
    dt = time.perf_counter() - t0
    assert n_bytes == n_batches * batch_bytes, (n_bytes, n_batches)
    gbps = n_bytes / dt / 1e9
    log(f"chunk+hash: {dt:.2f}s  {gbps:.3f} GB/s  {n_chunks} chunks")
    return {
        "metric": "chunk_hash_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }


def bench_device_compress(total_bytes: int) -> dict:
    """Device LZ4 codec: TPU sort-based match scan + native host assembly
    (parallel/device_lz4.py).  Input staging is excluded (device-resident
    word stream, same convention as chunk_hash); the measured loop is
    match scan + match-list fetch + host byte assembly + ratio check."""
    import jax

    from longtail_tpu.ops import lz4
    from longtail_tpu.parallel.device_lz4 import find_matches

    block = 8 << 20
    total_bytes = max(block, (total_bytes // block) * block)
    # LZ4's window is 64 KiB: build a corpus with *in-window* structure
    # (text, struct arrays, zero spans, 24 KiB tile repeats, noise) so
    # the ratio is meaningful — make_corpus's MiB-scale duplicate spans
    # are invisible to LZ4 (they are what the dedup layer catches)
    rng = np.random.default_rng(11)
    text = (b"the quick brown fox jumps over the lazy dog; "
            b"pack my box with five dozen liquor jugs. ") * 12000
    struct = np.arange(0, 1 << 18, dtype="<u4").tobytes() * 2
    tile = rng.integers(0, 256, 24 << 10, np.uint8).tobytes() * 40
    noise = rng.integers(0, 256, 1 << 20, np.uint8).tobytes()
    unit = text + struct + bytes(1 << 19) + tile + noise
    reps = -(-total_bytes // len(unit))
    corpus = np.frombuffer((unit * reps)[:total_bytes], np.uint8)
    n_blocks = total_bytes // block
    log(f"device-lz4 workload: {n_blocks} x {block >> 20} MiB blocks")
    dev_blocks = []
    for off in range(0, total_bytes, block):
        w = np.frombuffer(corpus[off:off + block].tobytes(), "<u4")
        dev_blocks.append(jax.device_put(w))
    jax.block_until_ready(dev_blocks)

    # warmup / compile
    find_matches(dev_blocks[0])

    from longtail_tpu.parallel.device_lz4 import (
        collect_matches,
        submit_matches,
    )

    t0 = time.perf_counter()
    comp_total = 0
    handles = [submit_matches(w) for w in dev_blocks]  # async pipeline
    for i, h in enumerate(handles):
        starts, refs, lens, _ = collect_matches(h)
        src = corpus[i * block:(i + 1) * block].tobytes()
        keep = starts < block
        out = lz4.assemble_matches(src, starts[keep], refs[keep],
                                   lens[keep])
        comp_total += len(out)
    dt = time.perf_counter() - t0
    gbps = total_bytes / dt / 1e9
    # verify one block decodes bit-exactly
    back = lz4.decompress(out, block)
    assert back == src, "device lz4 roundtrip mismatch"
    log(f"device lz4: {dt:.2f}s {gbps:.3f} GB/s ratio "
        f"{total_bytes / comp_total:.2f}x (decode verified)")
    # context: the host native-C path on the same corpus
    t0 = time.perf_counter()
    host_total = sum(
        len(lz4.compress(corpus[o:o + block].tobytes()))
        for o in range(0, min(total_bytes, 16 * block), block))
    host_dt = time.perf_counter() - t0
    host_gbps = min(total_bytes, 16 * block) / host_dt / 1e9
    log(f"host lz4 (context): {host_gbps:.3f} GB/s ratio "
        f"{min(total_bytes, 16 * block) / host_total:.2f}x")
    return {
        "metric": "device_lz4_compress_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "compress_ratio": round(total_bytes / comp_total, 2),
        "host_lz4_gbps": round(host_gbps, 3),
    }


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


def bench_downsync(total_bytes: int) -> dict:
    """End-to-end cold downsync (the reference's headline unpack benchmark,
    CHANGELOG.md:51-78): upsync a synthetic tree into a zstd fs store, then
    reconstruct it through the CLI in a subprocess — wall-clock GB/s plus
    the child's peak RSS (the 0.4.1 memory story)."""
    import resource
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
            compression_tag=C.COMPRESSION_TYPE_ZSTD_DEFAULT, workers=16)
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
        subprocess.run(
            [sys.executable, "-m", "longtail_tpu.cli", "--workers", "16",
             "downsync",
             "--storage-uri", os.path.join(base, "store"),
             "--source-path", lvi, "--target-path", out],
            check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        dt = time.perf_counter() - t0
        rss_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
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
    ap.add_argument("--mode", default="chunk_hash",
                    choices=["chunk_hash", "compress", "device_compress",
                             "downsync"])
    ap.add_argument("--target-chunk-size", type=int, default=32768)
    args = ap.parse_args()

    total = int(args.gib * 2**30)
    if args.mode == "chunk_hash":
        result = bench_chunk_hash(total, args.target_chunk_size)
    elif args.mode == "downsync":
        result = bench_downsync(total)
    elif args.mode == "device_compress":
        result = bench_device_compress(total)
    else:
        result = bench_compress(total)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
