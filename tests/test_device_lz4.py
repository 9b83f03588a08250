"""Device LZ4 codec conformance: sort-based match scan + assembler must
produce valid LZ4 block streams that decode bit-exactly, on every data
shape that stresses the run-fusing logic."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from longtail_tpu.ops import lz4  # noqa: E402
from longtail_tpu.parallel.device_lz4 import find_matches  # noqa: E402


def _roundtrip(src: bytes) -> float:
    n = len(src)
    nw = -(-n // 4) + 2
    buf = np.zeros(nw * 4, np.uint8)
    buf[:n] = np.frombuffer(src, np.uint8)
    words = np.frombuffer(buf.tobytes(), "<u4")
    starts, refs, lens, _ = find_matches(jax.numpy.asarray(words))
    keep = starts < n
    out = lz4.assemble_matches(src, starts[keep], refs[keep], lens[keep])
    assert lz4.decompress(out, n) == src
    return n / max(len(out), 1)


def test_device_lz4_roundtrips():
    rng = np.random.default_rng(21)
    cases = {
        "zeros": bytes(1 << 16),
        "periodic45": (b"the quick brown fox jumps over the lazy.. " * 1600),
        "struct": np.arange(0, 1 << 14, dtype="<u4").tobytes(),
        "noise": rng.integers(0, 256, 1 << 16, np.uint8).tobytes(),
        "tiled": rng.integers(0, 256, 6 << 10, np.uint8).tobytes() * 10,
        "mixed": (bytes(5000) + rng.integers(0, 256, 40000, np.uint8)
                  .tobytes() + b"ab" * 8000),
        "tail": rng.integers(0, 256, (1 << 16) + 3, np.uint8).tobytes(),
    }
    ratios = {}
    for name, src in cases.items():
        ratios[name] = _roundtrip(src)
    # structure must actually compress
    assert ratios["zeros"] > 50
    assert ratios["periodic45"] > 5
    assert ratios["tiled"] > 3
    assert ratios["noise"] < 1.1


def test_device_lz4_matches_are_real():
    """Every emitted match must reference truly identical bytes (the
    assembler trusts the device list for the copy regions)."""
    rng = np.random.default_rng(3)
    tile = rng.integers(0, 256, 3000, np.uint8).tobytes()
    src = tile * 7 + rng.integers(0, 256, 5000, np.uint8).tobytes()
    n = len(src)
    nw = -(-n // 4) + 2
    buf = np.zeros(nw * 4, np.uint8)
    buf[:n] = np.frombuffer(src, np.uint8)
    words = np.frombuffer(buf.tobytes(), "<u4")
    starts, refs, lens, _ = find_matches(jax.numpy.asarray(words))
    assert len(starts) > 0
    for s, r, ln in zip(starts, refs, lens):
        e = min(int(s + ln), len(src))
        assert src[s:e] == src[r:r + (e - s)], (s, r, ln)
