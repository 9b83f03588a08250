"""zstd codec dispatch: native C fast path with the from-spec Python
implementation (ops/zstd_frame.py) as oracle and fallback.

Mirrors ops/lz4.py's structure: callers get `compress`/`decompress`; the
implementation is selected once at import by probing the native library.
"""

from __future__ import annotations

from longtail_tpu.ops import zstd_frame

import ctypes

_native = None


def _load_native():
    """Bind the native zstd codec once; False caches a failed probe."""
    global _native
    if _native is None:
        try:
            from longtail_tpu import native
            lib = native.load("zstd_block", ["zstd_block.c"])
            if lib is not None:
                lib.lt_zstd_compress.restype = ctypes.c_long
                lib.lt_zstd_compress.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
                lib.lt_zstd_decompress.restype = ctypes.c_long
                lib.lt_zstd_decompress.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_char_p, ctypes.c_size_t]
            _native = lib if lib is not None else False
        except Exception:
            _native = False
    return _native or None


def compress_bound(n: int) -> int:
    # worst case: raw blocks (3-byte headers per 128 KiB) + frame header
    return n + (n // zstd_frame.BLOCK_MAX + 1) * 3 + 16


def compress(data: bytes, level: int = 3) -> bytes:
    lib = _load_native()
    if lib is not None:
        bound = compress_bound(len(data))
        dst = ctypes.create_string_buffer(bound)
        n = lib.lt_zstd_compress(data, len(data), dst, bound, level)
        if n > 0:
            return dst.raw[:n]
    return zstd_frame.compress(data, level)


def decompress(data: bytes, raw_size: int) -> bytes:
    lib = _load_native()
    if lib is not None:
        dst = ctypes.create_string_buffer(max(raw_size, 1))
        n = lib.lt_zstd_decompress(data, len(data), dst, raw_size)
        if n == raw_size:
            return dst.raw[:raw_size]
        if n >= 0:
            raise zstd_frame.ZstdError(
                f"native zstd produced {n} bytes, expected {raw_size}")
    return zstd_frame.decompress(data, raw_size)
