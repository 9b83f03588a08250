"""Block-centric version reconstruction (Longtail_ChangeVersion2,
src/longtail.c:8720-8911).

The v2 design fetches every needed block exactly once and scatters its chunks
into all target files at their final offsets (CreateBlockWriteInfos :8571,
WriteContentBlock2Job :8347) — no per-asset re-fetch, no LRU cache needed.
Zero-size assets and directories are materialized separately
(WriteNonBlockAssetsJob :8292); removed assets are deleted children-first
(CleanUpRemoveAssets :7758); permissions are retained last
(RetainPermissions :7931).

``write_version`` (full unpack, Longtail_WriteVersion :6471) is the same
machinery against an empty target.
"""

from __future__ import annotations

import dataclasses
import errno
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from longtail_tpu.core.diff import VersionDiff, create_version_diff, \
    get_required_chunk_hashes
from longtail_tpu.formats.store_index import StoreIndex
from longtail_tpu.formats.version_index import VersionIndex
from longtail_tpu.stores.storage import Storage, StorageError, ensure_parent_dirs
from longtail_tpu.utils.cancel import check
from longtail_tpu.utils.progress import null_progress


@dataclasses.dataclass
class _ChunkWrite:
    asset_index: int
    file_offset: int
    block_offset: int
    size: int


def _build_block_write_infos(version_index: VersionIndex,
                             store_index: StoreIndex,
                             asset_indexes) -> dict[int, list[_ChunkWrite]]:
    """block store-position -> scatter list (CreateBlockWriteInfos :8571)."""
    # chunk hash -> (block position, offset inside uncompressed block data)
    chunk_to_block: dict[int, tuple[int, int]] = {}
    for b in range(store_index.block_count):
        hashes, sizes = store_index.block_chunks(b)
        off = 0
        for h, s in zip(hashes, sizes):
            chunk_to_block.setdefault(int(h), (b, off))
            off += int(s)

    per_block: dict[int, list[_ChunkWrite]] = {}
    for a in asset_indexes:
        a = int(a)
        file_offset = 0
        for ci in version_index.asset_chunks(a):
            h = int(version_index.chunk_hashes[ci])
            size = int(version_index.chunk_sizes[ci])
            try:
                b, block_off = chunk_to_block[h]
            except KeyError:
                raise KeyError(
                    f"chunk {h:#x} needed by {version_index.path(a)} "
                    f"not found in any store block") from None
            per_block.setdefault(b, []).append(
                _ChunkWrite(a, file_offset, block_off, size))
            file_offset += size
    return per_block


def _full_path(root: str, path: str) -> str:
    return f"{root}/{path}" if root else path


def clean_up_removed_assets(storage: Storage, source: VersionIndex,
                            diff: VersionDiff, root: str) -> None:
    """Delete removed assets, children before parents (:7758)."""
    for i in diff.source_removed_asset_indexes:
        path = source.path(int(i))
        full = _full_path(root, path.rstrip("/"))
        try:
            if path.endswith("/"):
                storage.remove_dir(full)
            else:
                storage.remove_file(full)
        except (StorageError, FileNotFoundError, OSError) as e:
            if getattr(e, "errno", None) not in (errno.ENOENT, errno.ENOTEMPTY):
                raise


def retain_permissions(storage: Storage, target: VersionIndex, root: str,
                       asset_indexes=None) -> None:
    indexes = range(target.asset_count) if asset_indexes is None else \
        (int(i) for i in asset_indexes)
    for i in indexes:
        path = target.path(int(i))
        full = _full_path(root, path.rstrip("/"))
        try:
            storage.set_permissions(full, int(target.permissions[int(i)]))
        except (StorageError, FileNotFoundError, OSError):
            pass


def change_version(block_store, version_storage: Storage,
                   target_version_index: VersionIndex,
                   store_index: StoreIndex, root: str,
                   source_version_index: VersionIndex | None = None,
                   diff: VersionDiff | None = None,
                   retain_permissions_flag: bool = True,
                   workers: int = 8, cancel_token=None,
                   progress=null_progress) -> None:
    """Longtail_ChangeVersion2 (src/longtail.c:8720)."""
    target = target_version_index
    if source_version_index is not None and diff is None:
        diff = create_version_diff(source_version_index, target)

    if diff is not None and source_version_index is not None:
        clean_up_removed_assets(version_storage, source_version_index,
                                diff, root)
        write_assets = np.concatenate([
            diff.target_added_asset_indexes,
            diff.target_content_modified_asset_indexes]).astype(np.int64)
    else:
        write_assets = np.arange(target.asset_count, dtype=np.int64)

    block_store.preflight_get(store_index.block_hashes)

    # non-block assets: directories and zero-size files (:8292); order is
    # short-to-long path so parents exist first
    ordered = sorted((int(a) for a in write_assets),
                     key=lambda a: len(target.path(a)))
    chunked_assets = []
    for a in ordered:
        check(cancel_token)
        path = target.path(a)
        full = _full_path(root, path.rstrip("/"))
        if path.endswith("/"):
            if not version_storage.is_dir(full):
                ensure_parent_dirs(version_storage, full + "/x")
                try:
                    version_storage.create_dir(full)
                except StorageError as e:
                    if e.errno != errno.EEXIST:
                        raise
        elif int(target.asset_sizes[a]) == 0:
            ensure_parent_dirs(version_storage, full)
            version_storage.write(full, b"")
        else:
            chunked_assets.append(a)

    # pre-create/truncate every chunked target file to its final size so
    # concurrent block scatters never race on sizing
    for a in chunked_assets:
        full = _full_path(root, target.path(a))
        ensure_parent_dirs(version_storage, full)
        version_storage.write_ranges(full, int(target.asset_sizes[a]), [])

    per_block = _build_block_write_infos(target, store_index, chunked_assets)
    total = len(per_block)

    def apply_block(item) -> None:
        check(cancel_token)
        b, writes = item
        block = block_store.get_stored_block(int(store_index.block_hashes[b]))
        data = block.block_data
        by_asset: dict[int, list[tuple[int, bytes]]] = {}
        for w in writes:
            by_asset.setdefault(w.asset_index, []).append(
                (w.file_offset, data[w.block_offset:w.block_offset + w.size]))
        for a, ranges in by_asset.items():
            full = _full_path(root, target.path(a))
            version_storage.write_ranges(
                full, int(target.asset_sizes[a]), ranges)

    items = list(per_block.items())
    if workers > 1 and total > 1:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            done = 0
            for _ in pool.map(apply_block, items):
                done += 1
                progress(done, total)
    else:
        for i, item in enumerate(items):
            apply_block(item)
            progress(i + 1, total)

    if retain_permissions_flag:
        retain_permissions(version_storage, target, root)


def write_version(block_store, version_storage: Storage,
                  store_index: StoreIndex,
                  version_index: VersionIndex, root: str,
                  retain_permissions_flag: bool = True,
                  workers: int = 8, cancel_token=None,
                  progress=null_progress) -> None:
    """Full unpack of a version into an empty folder
    (Longtail_WriteVersion, src/longtail.c:6471)."""
    change_version(block_store, version_storage, version_index, store_index,
                   root, retain_permissions_flag=retain_permissions_flag,
                   workers=workers, cancel_token=cancel_token,
                   progress=progress)
