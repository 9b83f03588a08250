"""Share wrapper (lib/shareblockstore/longtail_shareblockstore.c): coalesces
concurrent get_stored_block calls for the same block so the backing store
sees one fetch (:12-35, :106-200)."""

from __future__ import annotations

import threading

from longtail_tpu.stores.blockstore import BlockStoreBase


class ShareBlockStore(BlockStoreBase):
    def __init__(self, backing):
        super().__init__()
        self.backing = backing
        self._lock = threading.Lock()
        self._in_flight: dict[int, threading.Event] = {}
        self._results: dict[int, object] = {}

    def get_stored_block(self, block_hash: int):
        key = int(block_hash)
        with self._lock:
            ev = self._in_flight.get(key)
            if ev is None:
                ev = threading.Event()
                self._in_flight[key] = ev
                owner = True
            else:
                owner = False
        if not owner:
            ev.wait()
            result = self._results.get(key)
            if isinstance(result, BaseException):
                raise result
            if result is not None:
                self.stats.bump("get_stored_block_count")
                return result
            # fetch completed and was evicted; fall through to direct fetch
            return self.backing.get_stored_block(key)
        try:
            block = self.backing.get_stored_block(key)
            result = block
        except BaseException as e:
            result = e
        with self._lock:
            self._results[key] = result
            ev.set()
            # results are only held while waiters may exist; clean up soon
            del self._in_flight[key]

        def _cleanup():
            with self._lock:
                self._results.pop(key, None)
        timer = threading.Timer(0.5, _cleanup)
        timer.daemon = True
        timer.start()
        if isinstance(result, BaseException):
            self.stats.bump("get_stored_block_fail_count")
            raise result
        self.stats.bump("get_stored_block_count")
        return result

    def put_stored_block(self, stored_block) -> None:
        self.stats.bump("put_stored_block_count")
        self.backing.put_stored_block(stored_block)

    def preflight_get(self, block_hashes) -> None:
        self.backing.preflight_get(block_hashes)

    def get_existing_content(self, chunk_hashes,
                             min_block_usage_percent: int = 0):
        self.stats.bump("get_existing_content_count")
        return self.backing.get_existing_content(
            chunk_hashes, min_block_usage_percent)

    def prune_blocks(self, keep_block_hashes) -> int:
        return self.backing.prune_blocks(keep_block_hashes)

    def flush(self) -> None:
        self.backing.flush()
        self.stats.bump("flush_count")
