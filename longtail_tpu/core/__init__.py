"""Core algorithms: indexing, dedup planning, diff, reconstruction.

Pure data-model code programmed against the storage/hash/chunker seams, like
the reference core (src/longtail.c) but organized around batched array
operations instead of per-item job graphs.
"""
