"""Storage + block-store layer.

Mirrors the reference's composable seams (StorageAPI src/longtail.h:364-393,
BlockStoreAPI :789-799): a filesystem abstraction (real fs + in-memory fake)
and content-addressed block stores that wrap each other
(compress -> cache -> share -> fs / archive).
"""
