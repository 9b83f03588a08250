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
import sys
import time

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
    import jax

    from longtail_tpu.parallel.pipeline import DevicePartIndexer

    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")

    indexer = DevicePartIndexer(target_chunk_size)
    part_bytes = indexer.part_bytes
    log(f"corpus: {total_bytes / 2**30:.2f} GiB, part={part_bytes >> 20} MiB,"
        f" lanes={indexer.lanes}")
    t0 = time.perf_counter()
    buf = make_corpus(total_bytes)
    log(f"corpus built in {time.perf_counter() - t0:.1f}s")

    # warmup: compile resolve + the common hash-bucket shapes
    warm = buf[: part_bytes * indexer.lanes * 2]
    t0 = time.perf_counter()
    n_chunks = 0
    for _, sizes, hashes in indexer.index_stream(parts_of(warm, part_bytes)):
        n_chunks += len(hashes)
    log(f"warmup: {time.perf_counter() - t0:.1f}s ({n_chunks} chunks)")

    t0 = time.perf_counter()
    n_chunks = 0
    n_bytes = 0
    uniq = set()
    for _, sizes, hashes in indexer.index_stream(parts_of(buf, part_bytes)):
        n_chunks += len(hashes)
        n_bytes += int(np.asarray(sizes, dtype=np.int64).sum())
        uniq.update(hashes.tolist())
    dt = time.perf_counter() - t0
    assert n_bytes == total_bytes, (n_bytes, total_bytes)
    gbps = total_bytes / dt / 1e9
    log(f"chunk+hash: {dt:.2f}s  {gbps:.3f} GB/s  "
        f"{n_chunks} chunks ({len(uniq)} unique)")
    return {
        "metric": "chunk_hash_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=4.0,
                    help="workload size in GiB")
    ap.add_argument("--mode", default="chunk_hash",
                    choices=["chunk_hash", "compress"])
    ap.add_argument("--target-chunk-size", type=int, default=32768)
    args = ap.parse_args()

    total = int(args.gib * 2**30)
    if args.mode == "chunk_hash":
        result = bench_chunk_hash(total, args.target_chunk_size)
    else:
        result = bench_compress(total)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
