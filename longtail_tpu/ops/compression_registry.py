"""Compression codecs keyed by block tag (the reference's CompressionAPI +
registry seam, src/longtail.h:266-294,
lib/compressionregistry/longtail_full_compression_registry.c).

Tag 0 stores raw.  'lz42' is the LZ4 block format.  The zstd family tags
('ztd1'..'ztd5') map to our zstd-format codec (landing with the entropy-coder
milestone); until then they raise and callers should pick LZ4.
"""

from __future__ import annotations

from longtail_tpu.formats import constants as C
from longtail_tpu.ops import lz4


class Lz4Codec:
    tags = (C.COMPRESSION_TYPE_LZ4_DEFAULT,)

    def compress(self, tag: int, data: bytes) -> bytes:
        return lz4.compress(data)

    def decompress(self, tag: int, data: bytes, raw_size: int) -> bytes:
        return lz4.decompress(data, raw_size)


_CODECS: dict[int, object] = {}


def register_codec(codec) -> None:
    for tag in codec.tags:
        _CODECS[tag] = codec


register_codec(Lz4Codec())


def get_codec(tag: int):
    try:
        return _CODECS[tag]
    except KeyError:
        raise KeyError(f"no compression codec registered for tag {tag:#x}")


def supported_tags() -> set[int]:
    return set(_CODECS)
