"""Multi-chip sharding: the distributed analog of the reference's thread-pool
fan-out (SURVEY §2.5).

The reference is single-node: Bikeshed threads chunk file parts and the only
cross-process coordination is a filesystem lock. Scaling the same workload
over a TPU slice is a data-parallel + collective problem:

- file parts are batched into ``(lanes, part_bytes)`` buffers and the lane
  axis is sharded over the device mesh (``shard_map``) — each chip runs the
  full chunk-scan + cut-resolution + BLAKE3 step on its lanes;
- global dedup (the role NCCL/MPI would play in a port) is a collective:
  every chip ``all_gather``s the per-shard chunk-hash lists over ICI, then
  sorts and uniques the combined set — replicated output, so any host can
  assemble the store/version index without further exchange.

Hashes travel as (lo, hi) u32 pairs (XLA's native lane width); sorting uses
a single 64-bit f-ordering key built from the pair.
"""

from __future__ import annotations

import functools

import numpy as np

from longtail_tpu.parallel.device_chunker import ChunkerConfig, index_parts


def _mesh_axis(mesh):
    assert len(mesh.axis_names) == 1, "one data axis expected"
    return mesh.axis_names[0]


def sharded_index_step(parts, lengths, cfg: ChunkerConfig, mesh):
    """The full distributed step: chunk + hash every lane on its own device,
    then all-gather and globally dedup the chunk hashes.

    parts: (B, P) uint8 with B divisible by mesh size; lengths: (B,) int32.
    Returns (ends (B,C) i32, sizes (B,C) i32,
             uniq_lo (N,) u32, uniq_hi (N,) u32, uniq_count () i32)
    where N = total chunk slots and entries past uniq_count are zero.
    The unique set is replicated on every device.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    axis = _mesh_axis(mesh)
    n_dev = mesh.devices.size
    B, Pb = parts.shape
    assert B % n_dev == 0, (B, n_dev)
    C = cfg.max_chunks(Pb)

    def local(parts_l, lengths_l):
        ends, sizes, lo, hi = index_parts(parts_l, lengths_l, cfg)
        valid = sizes.reshape(-1) > 0
        lo = jnp.where(valid, lo, 0)
        hi = jnp.where(valid, hi, 0)
        # collective: everyone sees every shard's (lo, hi, valid)
        lo_g = jax.lax.all_gather(lo, axis, tiled=True)
        hi_g = jax.lax.all_gather(hi, axis, tiled=True)
        valid_g = jax.lax.all_gather(valid, axis, tiled=True)
        # sort by the (hi, lo) u32 pair — no 64-bit lanes on device — with
        # valid entries before padding among equal keys (lexsort: last key
        # is primary) so "first of each key group" is a valid entry whenever
        # the group has one
        order = jnp.lexsort((~valid_g, lo_g, hi_g))
        lo_s, hi_s, valid_s = lo_g[order], hi_g[order], valid_g[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool),
             (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        keep = first & valid_s
        n_uniq = keep.sum().astype(jnp.int32)
        # compact kept entries to the front; non-kept scatter to a dump slot
        dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
        n = lo_s.shape[0]
        idx = jnp.where(keep, dest, n)
        uniq_lo = jnp.zeros((n + 1,), jnp.uint32).at[idx].set(
            jnp.where(keep, lo_s, 0))[:-1]
        uniq_hi = jnp.zeros((n + 1,), jnp.uint32).at[idx].set(
            jnp.where(keep, hi_s, 0))[:-1]
        return ends, sizes, uniq_lo, uniq_hi, n_uniq

    # check_vma=False: the uniq outputs are value-replicated (everyone ran
    # the same sort over the same all-gathered set) but that replication is
    # not statically provable to the vma checker.
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(), P(), P()),
        check_vma=False,
    )
    return fn(parts, lengths)


@functools.lru_cache(maxsize=4)
def make_sharded_index_fn(cfg: ChunkerConfig, mesh):
    import jax
    return jax.jit(
        lambda p, l: sharded_index_step(p, l, cfg, mesh))


def host_unique_hashes(lo: np.ndarray, hi: np.ndarray,
                       count: int) -> np.ndarray:
    """Assemble the replicated device output into host uint64 hashes."""
    h = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint64)
    return h[: int(count)]
