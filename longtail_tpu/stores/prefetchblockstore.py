"""Prefetching block-store wrapper: makes ``preflight_get`` a real
read-ahead pipeline.

The reference overlaps block fetch with decompress/scatter through
channel-1 block-reader jobs capped at 32 in flight
(src/longtail.c:5169, MAX_BLOCKS_PER_PARTIAL_ASSET_WRITE :4997,
GetMaxParallelBlockReadJobs :5026); ``PreflightGet`` is the hint that
starts them (src/longtail.h:789-799).  This wrapper is the composable
form: on preflight it starts bounded background fetches through the
backing store; ``get_stored_block`` consumes the prefetched result (or
falls through).  The residency bound caps peak memory at
``max_resident`` undelivered blocks — the analog of the reference's
in-flight cap, and the lever behind its 0.4.1 peak-memory fix
(CHANGELOG.md:73-76).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np

from longtail_tpu.formats.store_index import StoreIndex, StoredBlock
from longtail_tpu.stores.blockstore import BlockStoreBase


class PrefetchBlockStore(BlockStoreBase):
    def __init__(self, backing, workers: int = 4, max_resident: int = 32):
        super().__init__()
        self.backing = backing
        self._pool = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="block-prefetch")
        self._resident = threading.Semaphore(max_resident)
        self._lock = threading.Lock()
        self._futures: OrderedDict[int, Future] = OrderedDict()

    def _fetch(self, block_hash: int) -> StoredBlock:
        # acquired inside the worker: beyond max_resident undelivered
        # blocks, workers park here instead of buffering more memory
        self._resident.acquire()
        try:
            return self.backing.get_stored_block(block_hash)
        except BaseException:
            self._resident.release()
            raise

    def preflight_get(self, block_hashes) -> None:
        self.stats.bump("preflight_count")
        with self._lock:
            for h in np.asarray(block_hashes, dtype=np.uint64):
                h = int(h)
                if h not in self._futures:
                    self._futures[h] = self._pool.submit(self._fetch, h)

    def get_stored_block(self, block_hash: int) -> StoredBlock:
        with self._lock:
            fut = self._futures.pop(int(block_hash), None)
        if fut is None:
            return self.backing.get_stored_block(block_hash)
        try:
            block = fut.result()
        except BaseException:
            raise
        self._resident.release()
        self.stats.bump("get_stored_block_count")
        return block

    def cancel_prefetch(self) -> None:
        """Drop undelivered prefetches (releasing their memory bound)."""
        with self._lock:
            futures = list(self._futures.values())
            self._futures.clear()
        for fut in futures:
            if not fut.cancel():
                try:
                    fut.result()
                    self._resident.release()
                except BaseException:
                    pass

    # -- forwards ----------------------------------------------------------

    def put_stored_block(self, stored_block: StoredBlock) -> None:
        self.backing.put_stored_block(stored_block)

    def get_existing_content(self, chunk_hashes: np.ndarray,
                             min_block_usage_percent: int = 0) -> StoreIndex:
        return self.backing.get_existing_content(
            chunk_hashes, min_block_usage_percent)

    def prune_blocks(self, keep_block_hashes) -> int:
        return self.backing.prune_blocks(keep_block_hashes)

    def flush(self) -> None:
        self.cancel_prefetch()
        self.backing.flush()
