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


def sharded_chunk_step(parts, lengths, cfg: ChunkerConfig, mesh,
                       dedup_slots: int):
    """Production mesh step for chunk_assets: chunk + hash every lane on
    its own device and run the global-dedup collective over *compacted*
    per-shard hash lists.

    Unlike sharded_index_step (which all-gathers every chunk slot,
    padding included), each shard first compacts its valid (lo, hi)
    pairs to the front and only ``dedup_slots`` entries ride the
    all-gather — sized ~4x the expected chunk count, with an overflow
    flag when pathological data (everything at min chunk size) exceeds
    it so the host can fall back to host-side dedup.

    Returns (sizes (B, C) i32 [sharded], lo (B, C) u32 [sharded],
             hi (B, C) u32 [sharded],
             uniq_lo/uniq_hi (n_dev * dedup_slots,) u32 [replicated],
             n_uniq () i32, overflow () i32).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    axis = _mesh_axis(mesh)
    n_dev = mesh.devices.size
    B, Pb = parts.shape
    assert B % n_dev == 0, (B, n_dev)
    K = int(dedup_slots)

    def local(parts_l, lengths_l):
        _, sizes, lo, hi = index_parts(parts_l, lengths_l, cfg)
        lo = lo.reshape(sizes.shape)
        hi = hi.reshape(sizes.shape)
        valid = sizes.reshape(-1) > 0
        # compact valid entries to the front, keep at most K
        dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
        n_valid = jnp.sum(valid.astype(jnp.int32))
        overflow_l = (n_valid > K).astype(jnp.int32)
        keep = valid & (dest < K)
        idx = jnp.where(keep, dest, K)
        clo = jnp.zeros((K + 1,), jnp.uint32).at[idx].set(
            jnp.where(keep, lo.reshape(-1), 0), mode="drop")[:K]
        chi = jnp.zeros((K + 1,), jnp.uint32).at[idx].set(
            jnp.where(keep, hi.reshape(-1), 0), mode="drop")[:K]
        n_local = jnp.minimum(n_valid, K)
        # collective: compacted lists only (the ICI payload is
        # O(chunks), not O(slots))
        lo_g = jax.lax.all_gather(clo, axis, tiled=True)
        hi_g = jax.lax.all_gather(chi, axis, tiled=True)
        n_g = jax.lax.all_gather(n_local.reshape(1), axis, tiled=True)
        ov = jax.lax.psum(overflow_l, axis)
        slot = jnp.arange(n_dev * K, dtype=jnp.int32)
        valid_g = (slot % K) < jnp.repeat(n_g, K, total_repeat_length=n_dev * K)
        order = jnp.lexsort((~valid_g, lo_g, hi_g))
        lo_s, hi_s, valid_s = lo_g[order], hi_g[order], valid_g[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool),
             (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        keep_u = first & valid_s
        n_uniq = keep_u.sum().astype(jnp.int32)
        dest_u = jnp.cumsum(keep_u.astype(jnp.int32)) - 1
        n = lo_s.shape[0]
        idx_u = jnp.where(keep_u, dest_u, n)
        uniq_lo = jnp.zeros((n + 1,), jnp.uint32).at[idx_u].set(
            jnp.where(keep_u, lo_s, 0))[:-1]
        uniq_hi = jnp.zeros((n + 1,), jnp.uint32).at[idx_u].set(
            jnp.where(keep_u, hi_s, 0))[:-1]
        return sizes, lo, hi, uniq_lo, uniq_hi, n_uniq, ov

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None),
                   P(), P(), P(), P()),
        check_vma=False,
    )
    return fn(parts, lengths)


def default_dedup_slots(cfg: ChunkerConfig, lanes_per_dev: int,
                        part_bytes: int) -> int:
    """~4x the expected chunk count per shard, capped at the worst case."""
    worst = lanes_per_dev * cfg.max_chunks(part_bytes)
    expected = lanes_per_dev * (4 * part_bytes // cfg.avg_size + 8)
    return int(min(worst, expected))


@functools.lru_cache(maxsize=4)
def make_sharded_chunk_fn(cfg: ChunkerConfig, mesh, lanes_per_dev: int,
                          part_bytes: int):
    import jax
    slots = default_dedup_slots(cfg, lanes_per_dev, part_bytes)
    return jax.jit(
        lambda p, l: sharded_chunk_step(p, l, cfg, mesh, slots))


def host_unique_hashes(lo: np.ndarray, hi: np.ndarray,
                       count: int) -> np.ndarray:
    """Assemble the replicated device output into host uint64 hashes."""
    h = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint64)
    return h[: int(count)]
