"""Two-tier cache store (lib/cacheblockstore/longtail_cacheblockstore.c):
gets try the local store and fall back to remote with an async write-back to
local (:106-200); puts go to both (:427-560); get_existing_content consults
remote and completes from local (:671-720)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from longtail_tpu.formats.store_index import StoredBlock
from longtail_tpu.stores.blockstore import BlockStoreBase


class CacheBlockStore(BlockStoreBase):
    def __init__(self, local, remote, writeback_workers: int = 2):
        super().__init__()
        self.local = local
        self.remote = remote
        self._writeback = ThreadPoolExecutor(max_workers=writeback_workers)
        self._pending = []

    def get_stored_block(self, block_hash: int) -> StoredBlock:
        self.stats.bump("get_stored_block_count")
        try:
            return self.local.get_stored_block(block_hash)
        except Exception:
            pass
        block = self.remote.get_stored_block(block_hash)
        fut = self._writeback.submit(self.local.put_stored_block, block)
        self._pending.append(fut)
        return block

    def put_stored_block(self, stored_block: StoredBlock) -> None:
        self.stats.bump("put_stored_block_count")
        self.remote.put_stored_block(stored_block)
        self.local.put_stored_block(stored_block)

    def preflight_get(self, block_hashes) -> None:
        self.remote.preflight_get(block_hashes)

    def get_existing_content(self, chunk_hashes: np.ndarray,
                             min_block_usage_percent: int = 0):
        self.stats.bump("get_existing_content_count")
        return self.remote.get_existing_content(
            chunk_hashes, min_block_usage_percent)

    def prune_blocks(self, keep_block_hashes) -> int:
        return self.remote.prune_blocks(keep_block_hashes)

    def flush(self) -> None:
        for fut in self._pending:
            try:
                fut.result()
            except Exception:
                pass  # cache write-back failures are non-fatal
        self._pending = []
        self.local.flush()
        self.remote.flush()
        self.stats.bump("flush_count")
