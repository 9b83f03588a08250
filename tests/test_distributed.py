"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ends, sizes, lo, hi = out
    assert ends.shape == sizes.shape
    assert lo.shape == hi.shape


def test_sharded_matches_unsharded():
    """ends/sizes from the sharded step == single-device index_parts."""
    from jax.sharding import Mesh
    from longtail_tpu.parallel.device_chunker import (
        ChunkerConfig, make_index_parts_fn)
    from longtail_tpu.parallel.distributed import make_sharded_index_fn

    n = min(4, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("d",))
    cfg = ChunkerConfig.from_target(1024)
    rng = np.random.default_rng(5)
    B, P = 2 * n, 1024 * 4
    parts = rng.integers(0, 256, size=(B, P), dtype=np.uint8)
    lengths = np.full((B,), P, dtype=np.int32)
    lengths[1] = 57

    ends_s, sizes_s, _, _, _ = make_sharded_index_fn(cfg, mesh)(parts, lengths)
    ends_1, sizes_1, _, _ = make_index_parts_fn(cfg)(parts, lengths)
    np.testing.assert_array_equal(np.asarray(ends_s), np.asarray(ends_1))
    np.testing.assert_array_equal(np.asarray(sizes_s), np.asarray(sizes_1))
