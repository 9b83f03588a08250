"""Fused Pallas CDC stage 1: candidate scan + cut resolution on TPU.

Replaces the round-2 XLA formulation (device_chunker.candidate_mask +
resolve_ends) whose 255-`where` LUT tree ran as unfused HBM passes and
whose cut resolution was an 8k-step `lax.scan` of full-array gathers
(~0.07 GB/s measured).  The redesign:

- **Scan kernel** (`_scan_kernel`): one pass over the byte stream in VMEM.
  The 256-entry HPCDC table lookup is two 128-lane `dynamic_gather`s plus
  a select (~free); the 48-tap rolling-window XOR telescopes into 6
  shift-rotate-XOR doubling steps (S_2k[p] = S_k[p] ^ rotl(S_k[p-k], k));
  candidates are reduced *in-kernel* to per-segment summaries — the two
  smallest candidate ends and a count per `Z`-byte segment — so the dense
  mask never touches HBM.  ~1000:1 data reduction.

- **Walk kernel** (`_walk_kernel`): the sequential min/max constraint walk
  (Longtail_HPCDCNextChunk semantics, lib/hpcdcchunker/
  longtail_hpcdcchunker.c:289-306) runs as a single-core Pallas loop over
  the VMEM-resident segment summaries: each step is a handful of row loads
  and masked reductions instead of a dispatch, so the ~2k-step walk costs
  ~0.3 ms instead of ~400 s.

- **Exactness**: per-segment (min1, min2, count) resolves "first candidate
  end > q" exactly unless a segment holds 3+ candidates *and* both kept
  ends precede the query — statistically ~1e-5 of batches at the default
  geometry (candidate rate 1/discriminator, Z ~ discriminator/16).  Such
  lanes are flagged and re-chunked exactly on the host (native C scanner,
  ops/cdc.chunk_part); bit-exactness is unconditional.

Matches the reference hot loop it replaces: ChunkAssets
src/longtail.c:2429-2462 + DynamicChunking :1989-2311.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from longtail_tpu.formats.constants import CHUNKER_WINDOW_SIZE as WINDOW
from longtail_tpu.ops.cdc import HASH_TABLE, discriminator_from_avg
from longtail_tpu.parallel.device_chunker import ChunkerConfig

_BIG = np.int32(2**31 - 1)
_SEG_LANES = 128  # segments per output row (and per walk row-load)


def segment_bytes(cfg: ChunkerConfig) -> int:
    """Segment size Z: power of two ~ discriminator/16 so the expected
    candidate count per segment is ~0.06 (3+ candidates ~ 4e-5)."""
    d = cfg.discriminator
    z = 128
    while z * 32 <= d and z < 4096:
        z *= 2
    return z


def _rotl(x, r: int, jnp):
    r %= 32
    if r == 0:
        return x
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _shift_back(jnp, pltpu, full, k: int):
    """out[r, c] = full[flat(r,c) - k] over the (R, 128) row-major view
    (1 <= k <= 128).  Row 0's wrapped lanes read the last row (garbage —
    callers mask positions below the window/part start)."""
    import jax
    lane = jax.lax.broadcasted_iota(jnp.int32, full.shape, 1)
    rl = pltpu.roll(full, k, axis=1)
    rs = pltpu.roll(rl, 1, axis=0)
    return jnp.where(lane >= k, rl, rs)


def _make_scan_kernel(cfg: ChunkerConfig, part_bytes: int, tile_bytes: int,
                      z: int, with_anchors: bool = False,
                      with_words: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RT = tile_bytes // 128           # tile rows
    HR = 8                           # halo rows (1024 bytes >= WINDOW-1)
    SEG_T = tile_bytes // z          # segments per tile (= _SEG_LANES)
    ZR = z // 128                    # rows per segment
    BINS_T = tile_bytes // 256       # anchor bins per tile (= RT // 2)
    WR = RT // 4                     # word rows per tile
    tiles_per_part = part_bytes // tile_bytes
    d = np.uint32(cfg.discriminator)
    u32 = jnp.uint32

    def words_from_bytes(xu8):
        """(RT, 128) u8 -> the flat-row-major little-endian u32 word
        rows (WR, 128) of the same bytes — the relayout make_pad_words_fn
        did as a separate XLA pass (12.8 GB/s measured: a u8 reshape+
        bitcast lowers to a slow lane shuffle).  In-kernel: a VMEM
        pltpu.bitcast packs byte j of out[r, l] from in[4r + j, l]
        (sublane-grouped, NOT flat), then four constant-index lane
        gathers undo the permutation: flat word w = r*128 + l wants
        bytes 512r + 4l + j = rows 4r + (4l+j)//128, lanes (4l+j)%128 =
        byte (4l+j)>>7 of W[r, (4l+j)&127]."""
        W = pltpu.bitcast(xu8, jnp.uint32)          # (WR, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, W.shape, 1)
        F = jnp.zeros(W.shape, u32)
        for j in range(4):
            q = 4 * lane + j
            g = jnp.take_along_axis(W, q & 127, axis=1)
            sh = ((q >> 7).astype(u32)) * u32(8)
            F = F | (((g >> sh) & u32(0xFF)) << u32(8 * j))
        return F

    def bin_mins(F):
        """Per-256-byte-bin packed argmin of the 8-byte-gram hash —
        device_match.bin_mins_from_words computed in-tile from the
        word rows (the fast compression tier rides the same byte read
        as the chunk scan).  The last gram of each tile reads across
        the tile boundary (garbage): the host assembler memcmp-rejects
        false anchors."""
        lane = jax.lax.broadcasted_iota(jnp.int32, F.shape, 1)
        rl = pltpu.roll(F, 127, axis=1)
        rn = pltpu.roll(rl, F.shape[0] - 1, axis=0)
        w1 = jnp.where(lane < 127, rl, rn)          # next word
        h = (F * u32(0x9E3779B1)) ^ ((w1 * u32(0x85EBCA77)) >> u32(13)) \
            ^ (w1 << u32(7))
        packed = (h & ~u32(63)) | (lane & 63).astype(u32)
        # mosaic has no unsigned reductions: the sign-flip bijection
        # makes i32 ordering match u32 ordering.  A 64-lane-group min
        # needs a (WR, 128) -> (2*WR, 64) row split mosaic can't shape-
        # cast; transpose + sublane mins produce the same values with
        # the tile's bins emitted as [even bins | odd bins] — scan_fn
        # un-permutes in XLA.
        pi = jax.lax.bitcast_convert_type(
            packed ^ u32(0x80000000), jnp.int32)
        t = pi.T                                    # (128, WR)
        even = jnp.min(t[:64], axis=0)              # bin 2r of row r
        odd = jnp.min(t[64:], axis=0)               # bin 2r + 1
        mi = jnp.stack([even, odd])                 # (2, WR)
        return jax.lax.bitcast_convert_type(mi, u32) ^ u32(0x80000000)

    def kernel(lengths_ref, x_ref, halo_ref, tlo_ref, thi_ref,
               min1_ref, min2_ref, cnt_ref, *extra_refs):
        i = pl.program_id(0)
        part = i // tiles_per_part
        length = lengths_ref[part]

        full = jnp.concatenate(
            [halo_ref[:].astype(jnp.int32), x_ref[:].astype(jnp.int32)],
            axis=0)  # (HR + RT, 128)

        if with_anchors or with_words:
            F = words_from_bytes(x_ref[:])
        if with_words:
            extra_refs[1 if with_anchors else 0][:, :] = F
        if with_anchors:
            # rows 2t, 2t+1 of the bins output hold tile t's even / odd
            # bins respectively (scan_fn un-permutes to global bin order)
            extra_refs[0][pl.ds((i % 8) * 2, 2), :] = bin_mins(F)

        # table lookup: two 128-entry lane gathers + select
        idx = full & 127
        tlo = jnp.broadcast_to(tlo_ref[0:1, :], idx.shape)
        thi = jnp.broadcast_to(thi_ref[0:1, :], idx.shape)
        tv = jnp.where(full < 128,
                       jnp.take_along_axis(tlo, idx, axis=1),
                       jnp.take_along_axis(thi, idx, axis=1))  # u32

        # 48-tap window XOR by doubling: S_2k[p] = S_k[p]^rotl(S_k[p-k],k)
        s = tv
        for k in (1, 2, 4, 8):
            s = s ^ _rotl(_shift_back(jnp, pltpu, s, k), k, jnp)
        s16 = s
        s32 = s16 ^ _rotl(_shift_back(jnp, pltpu, s16, 16), 16, jnp)
        h = s16 ^ _rotl(_shift_back(jnp, pltpu, s32, 16), 16, jnp)
        h = h[HR:, :]  # (RT, 128): rolling hash at each tile position

        # candidate mask
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (RT, 128), 0)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (RT, 128), 1)
        pos = (i * RT + r_iota) * 128 + c_iota          # absolute flat pos
        pos_in_part = pos - part * part_bytes
        fire = (h % d) == (d - u32(1))
        live = fire & (pos_in_part >= WINDOW - 1) & (pos_in_part < length)
        ends = jnp.where(live, pos + 1, _BIG)           # candidate cut ends

        # per-segment summaries: (SEG_T, ZR*128)
        seg = ends.reshape(SEG_T, ZR * 128)
        m1 = jnp.min(seg, axis=1)
        seg2 = jnp.where(seg == m1[:, None], _BIG, seg)
        m2 = jnp.min(seg2, axis=1)
        cnt = jnp.sum(live.astype(jnp.int32).reshape(SEG_T, ZR * 128),
                      axis=1)
        # output blocks hold 8 tiles' rows (sublane-divisibility); this
        # grid step owns row i % 8 of the current block
        r = i % 8
        min1_ref[pl.ds(r, 1), :] = m1.reshape(1, SEG_T)
        min2_ref[pl.ds(r, 1), :] = m2.reshape(1, SEG_T)
        cnt_ref[pl.ds(r, 1), :] = cnt.reshape(1, SEG_T)

    n_tiles_total = None  # bound at call time

    def build(n_bytes_total: int, slack_words: int = 0):
        n_tiles = n_bytes_total // tile_bytes
        assert n_tiles % 8 == 0, (n_bytes_total, tile_bytes)
        out_specs = [
            pl.BlockSpec((8, SEG_T), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SEG_T), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SEG_T), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_tiles, SEG_T), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SEG_T), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SEG_T), jnp.int32),
        ]
        if with_anchors:
            out_specs.append(
                pl.BlockSpec((16, WR), lambda i, *_: (i // 8, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((2 * n_tiles, WR), jnp.uint32))
        if with_words:
            # trailing slack blocks are never written (garbage): the
            # pack kernel masks all bytes at/after each chunk's size,
            # so only in-bounds-ness matters, which allocation provides
            slack_rows = -(-slack_words // 128)
            extra = -(-slack_rows // WR)
            out_specs.append(
                pl.BlockSpec((WR, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(
                ((n_tiles + extra) * WR, 128), jnp.uint32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((RT, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                # halo: previous 1024 bytes (8 rows); clamped at stream start
                pl.BlockSpec(
                    (HR, 128),
                    lambda i, *_: (jnp.maximum(i * (RT // HR) - 1, 0), 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )

    return build


def _make_walk_kernel(cfg: ChunkerConfig, B: int, part_bytes: int, z: int,
                      c_pad: int):
    """Sequential constraint walk over per-segment summaries.

    Inputs (VMEM, all (ROWS, 128) i32 with ROWS = B*Sp/128):
      min1v / min2v / cntv — per-segment summaries
      sufv — sufv[s] = min over segments s' > s (same part) of min1[s']
    SMEM: lengths (B, 1) i32.
    Outputs: ends (c_pad, 128) i32 (lane b = part b's cut ends) and
      flags (8, 128) i32 (row 0 lane b = n_chunks, row 1 = ambiguous).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Sp = part_bytes // z
    assert Sp % 128 == 0
    mn = np.int32(cfg.min_size)
    mx = np.int32(cfg.max_size)
    lgz = z.bit_length() - 1

    def kernel(len_ref, min1_ref, min2_ref, cnt_ref, suf_ref,
               ends_ref, flags_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def extract(ref, grow, fill):
            """ref[grow // 128, grow % 128] via masked reduce."""
            row = ref[pl.ds(grow // 128, 1), :]
            return jnp.min(jnp.where(lane == grow % 128, row, fill))

        def lane_step(b, s):
            """One walk step for part b at cut position s; returns
            (e, ambiguous)."""
            L = len_ref[b, 0]
            q = s + mn                       # first admissible end is > q
            t = jnp.minimum(q >> lgz, Sp - 1)
            grow = b * Sp + t
            qa = q + b * part_bytes          # absolute flat position
            m1 = extract(min1_ref, grow, _BIG)
            m2 = extract(min2_ref, grow, _BIG)
            cn = extract(cnt_ref, grow, _BIG)
            suf = extract(suf_ref, grow, _BIG)
            in_seg = jnp.where(
                m1 > qa, m1, jnp.where(m2 > qa, m2, _BIG))
            amb = (cn >= 3) & (m2 <= qa) & (m1 <= qa)
            e_cand = jnp.minimum(in_seg, suf) - b * part_bytes
            rem = L - s
            limit = jnp.where(rem > mx, s + mx, L)
            e = jnp.minimum(jnp.where(e_cand > q, e_cand, limit), limit)
            e = jnp.where(rem <= mn, L, e)
            return e, amb

        # U cut-steps per loop iteration with ONE whole-row store each:
        # the while_loop's fixed per-iteration cost and per-lane
        # predicated dynamic stores dominated the original walk (~5.7 us
        # per step on-chip for ~0.5 us of compute).  Inactive lanes hold
        # their state and write garbage into rows >= their n_chunks,
        # which the size-packing masks off (idx < n).  c_pad % U == 0,
        # so stores never pass c_pad.
        U = 4
        assert c_pad % U == 0
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(state):
            i, ss, nn, aa = state
            for u in range(U):
                row = jnp.zeros((1, 128), jnp.int32)
                new_ss, new_nn, new_aa = [], [], []
                for b in range(B):
                    s = ss[b]
                    active = s < len_ref[b, 0]
                    e, amb = lane_step(b, s)
                    e_eff = jnp.where(active, e, s)
                    row = jnp.where(lane_row == b, e_eff, row)
                    new_ss.append(e_eff)
                    new_nn.append(nn[b] + jnp.where(active, 1, 0))
                    new_aa.append(aa[b] | (active & amb).astype(jnp.int32))
                ends_ref[pl.ds(i + u, 1), :] = row
                ss, nn, aa = tuple(new_ss), tuple(new_nn), tuple(new_aa)
            return (i + U, ss, nn, aa)

        def cond(state):
            i, ss, nn, aa = state
            unfinished = False
            for b in range(B):
                unfinished = unfinished | (ss[b] < len_ref[b, 0])
            return unfinished & (i < c_pad)

        z32 = jnp.int32(0)
        state = (z32, tuple(z32 for _ in range(B)),
                 tuple(z32 for _ in range(B)),
                 tuple(z32 for _ in range(B)))
        ends_ref[:, :] = jnp.zeros((c_pad, 128), jnp.int32)
        final = jax.lax.while_loop(cond, body, state)
        _, _, nn, aa = final
        nvec = jnp.zeros((1, 128), jnp.int32)
        avec = jnp.zeros((1, 128), jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for b in range(B):
            nvec = jnp.where(lane == b, nn[b], nvec)
            avec = jnp.where(lane == b, aa[b], avec)
        flags_ref[0:1, :] = nvec
        flags_ref[1:2, :] = avec
        flags_ref[2:8, :] = jnp.zeros((6, 128), jnp.int32)

    rows = B * Sp // 128

    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[
                pl.BlockSpec((B, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((c_pad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )


def words2d_rows(plan: "Stage1Plan", slack_words: int) -> int:
    """Row count of the scan kernel's words2d output (TPU path): the
    real word rows plus >= slack_words of unwritten slack, rounded up to
    whole word-row blocks."""
    WR = plan.tile_bytes // 512
    n_tiles = plan.lanes * plan.part_bytes // plan.tile_bytes
    slack_rows = -(-slack_words // 128)
    return (n_tiles + -(-slack_rows // WR)) * WR


def sizes_pack_u16(plan: "Stage1Plan") -> bool:
    """True when the packed stage-1 fetch stores (size-1) as u16 pairs."""
    return plan.cfg.max_size <= (1 << 16)


def unpack_stage1(packed: np.ndarray, plan: "Stage1Plan"):
    """Decode the packed stage-1 fetch -> (sizes i32 (B, c_pad), n, amb)."""
    c_pad = plan.c_pad
    if sizes_pack_u16(plan):
        pairs = packed[:, : c_pad // 2].astype(np.uint32)
        n = packed[:, c_pad // 2]
        amb = packed[:, c_pad // 2 + 1]
        sizes = np.empty((packed.shape[0], c_pad), np.int32)
        sizes[:, 0::2] = (pairs & 0xFFFF).astype(np.int32)
        sizes[:, 1::2] = (pairs >> 16).astype(np.int32)
        idx = np.arange(c_pad, dtype=np.int32)[None, :]
        sizes = np.where(idx < n[:, None], sizes + 1, 0)
        return sizes, n.copy(), amb
    return (packed[:, :c_pad].copy(), packed[:, c_pad].copy(),
            packed[:, c_pad + 1])


@dataclasses.dataclass(frozen=True)
class Stage1Plan:
    """Static geometry for a (cfg, lanes, part_bytes) pipeline instance."""
    cfg: ChunkerConfig
    lanes: int
    part_bytes: int

    @property
    def z(self) -> int:
        return segment_bytes(self.cfg)

    @property
    def tile_bytes(self) -> int:
        return self.z * _SEG_LANES

    @property
    def c_pad(self) -> int:
        c = self.part_bytes // (self.cfg.min_size + 1) + 1
        return -(-c // 128) * 128


@functools.lru_cache(maxsize=32)
def make_stage1_fn(plan: Stage1Plan, device=None,
                   with_anchors: bool = False, slack_words: int = 0):
    """jit: (rows (B*P//128, 128) u8 — parts flattened part-major into
    128-byte rows, lengths (B,) i32) -> packed (B, c_pad + 2) i32:
    columns [0, c_pad) = chunk sizes, column c_pad = n_chunks, column
    c_pad + 1 = ambig flag (one array -> one device->host fetch).

    sizes[b, i] for i < n_chunks[b] are the chunk sizes of part b in
    order; entries past n_chunks are 0.  ambig[b] != 0 means lane b's
    cuts may be wrong (3+ candidates crowded a segment) and the host must
    re-chunk that lane exactly (see repair_lane).

    The fn returns (packed, bins_or_None, words2d): ``words2d`` is the
    (R2, 128) u32 word-row relayout of the batch (make_pad_words_fn
    semantics, ``slack_words`` of zero pad) computed in the SAME dispatch
    as the scan — stage 3's pack kernels consume it without a separate
    pad call (each jit call costs ~1 ms of host dispatch overhead on the
    dev rig, the pipeline's actual bottleneck)."""
    import jax

    if jax.default_backend() != "tpu":
        return _make_stage1_xla(plan, device, with_anchors, slack_words)
    # the pallas path follows its committed inputs' placement
    return _make_stage1_pallas(plan, with_anchors, slack_words)


def _make_stage1_pallas(plan: Stage1Plan, with_anchors: bool = False,
                        slack_words: int = 0):
    """The Pallas scan+walk stage-1 path.  Off-TPU the kernels run in
    interpret mode — slow, but exact: tests use this to pin the kernels
    against the XLA oracle without a chip.

    with_anchors=True adds a fourth scan-kernel output — the per-256-byte
    -bin packed gram-hash argmins the fast compression tier consumes
    (device_match.bin_mins_from_words fused into the byte pass)."""
    import jax
    import jax.numpy as jnp

    cfg, B, P = plan.cfg, plan.lanes, plan.part_bytes
    z, tile = plan.z, plan.tile_bytes
    Sp = P // z
    scan_kernel = _make_scan_kernel(cfg, P, tile, z, with_anchors,
                                    with_words=True)(B * P, slack_words)
    walk = _make_walk_kernel(cfg, B, P, z, plan.c_pad)
    tlo = jnp.asarray(HASH_TABLE[:128][None, :])
    thi = jnp.asarray(HASH_TABLE[128:][None, :])

    # Two jitted stages (scan+pad, then suffix+walk+post): each jit CALL
    # costs ~1 ms of host overhead on the dev rig, so stage 1 rides two
    # dispatches.  Fusing the scan pallas-call together with the walk's
    # associative-scan + reshape graph is where the remote toolchain's
    # compile time explodes (measured 193 s vs ~12 s split in round 2),
    # so the split is scan | walk, not all-in-one.  The input is the
    # canonical (B*P//128, 128) row layout — reshaping a (B, P) u8
    # array inside XLA costs 139 s of *compile* time on this toolchain,
    # so hosts pack rows before device_put and device code never
    # reshapes u8 (the pad below keeps the flat byte order: (R, 128) u8
    # rows -> (R, 32, 4) -> bitcast u32 -> (R//4, 128) word rows).
    @jax.jit
    def scan_fn(rows_u8, lengths):
        # the scan kernel emits the word-row relayout (words_from_bytes)
        # as its last output — no separate pad/bitcast pass
        outs = list(scan_kernel(lengths.astype(jnp.int32), rows_u8,
                                rows_u8, tlo, thi))
        if with_anchors:
            # un-permute the kernel's per-tile (even row, odd row) bin
            # layout back to global bin order (see bin_mins)
            b = outs[3]                       # (2 * n_tiles, WR)
            T2, WRr = b.shape
            outs[3] = b.reshape(T2 // 2, 2, WRr).transpose(0, 2, 1) \
                .reshape(T2 // 2, 2 * WRr)
        return tuple(outs)

    # sizes ride the (slow, per-byte-charged) D2H path as packed u16 pairs
    # when the geometry allows: entry i < n stores (size-1) in 16 bits
    u16_ok = sizes_pack_u16(plan)

    @jax.jit
    def walk_fn(min1, min2, cnt, lengths):
        # (n_tiles, SEG_T) -> (B, Sp) -> per-part suffix-min of min1 over
        # *later* segments (exclusive)
        m1p = min1.reshape(B, Sp)
        suf = jax.lax.associative_scan(
            jnp.minimum, m1p, reverse=True, axis=1)
        suf = jnp.concatenate(
            [suf[:, 1:], jnp.full((B, 1), _BIG, jnp.int32)], axis=1)
        ends128, flags = walk(
            lengths.astype(jnp.int32).reshape(B, 1),
            m1p.reshape(-1, 128), min2.reshape(-1, 128),
            cnt.reshape(-1, 128), suf.reshape(-1, 128))
        # single packed i32 output: sizes | n | amb — one device->host
        # fetch per batch (the dev tunnel charges per RTT and per byte)
        ends = ends128[:, :B].T                      # (B, c_pad)
        n = flags[0, :B]
        amb = flags[1, :B]
        starts = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), ends[:, :-1]], axis=1)
        idx = jnp.arange(plan.c_pad, dtype=jnp.int32)[None, :]
        sizes = jnp.where(idx < n[:, None], ends - starts, 0)
        if u16_ok:
            sm1 = jnp.where(idx < n[:, None], sizes - 1, 0)
            pairs = sm1[:, 0::2] | (sm1[:, 1::2] << 16)
            return jnp.concatenate(
                [pairs, n[:, None], amb[:, None]], axis=1)
        return jnp.concatenate(
            [sizes, n[:, None], amb[:, None]], axis=1)

    def fn(rows_u8, lengths):
        outs = scan_fn(rows_u8, lengths)
        if with_anchors:
            min1, min2, cnt, bins, words2d = outs
        else:
            (min1, min2, cnt, words2d), bins = outs, None
        packed = walk_fn(min1, min2, cnt, lengths)
        packed.copy_to_host_async()
        return packed, bins, words2d

    return fn


def _make_stage1_xla(plan: Stage1Plan, device=None,
                     with_anchors: bool = False, slack_words: int = 0):
    """Pure-XLA stage 1 with the same contract as the pallas path: the
    round-2 candidate_mask + resolve_ends formulation (device_chunker.py).
    Used on non-TPU backends (tests, CPU meshes), where pallas interpret
    mode would unroll the grid at trace time; it is exact, so ambig is
    always 0.  ``device`` pins the resolve program to a mesh device (the
    per-device mesh data plane runs one of these per virtual device)."""
    import jax
    import jax.numpy as jnp

    from longtail_tpu.parallel.device_chunker import (
        candidate_mask,
        next_candidate_ends,
        resolve_ends,
    )

    cfg, B, P = plan.cfg, plan.lanes, plan.part_bytes
    c_pad = plan.c_pad

    # two jits: fusing the u16 packing into the 8k-step resolve scan's
    # program sends the XLA CPU optimizer into the weeds (observed >1 h),
    # and so does a large in-graph u8 reshape — the rows->parts reshape
    # happens on host (a free numpy view)
    @jax.jit
    def resolve_fn(parts, lengths):
        lengths = lengths.astype(jnp.int32)
        mask = candidate_mask(parts, discriminator=cfg.discriminator)
        nexts = next_candidate_ends(mask, lengths)
        return resolve_ends(nexts, lengths, cfg, c_pad)

    @jax.jit
    def post_fn(ends):
        starts = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), ends[:, :-1]], axis=1)
        sizes = ends - starts
        n = jnp.sum((sizes > 0).astype(jnp.int32), axis=1)
        if sizes_pack_u16(plan):
            idx = jnp.arange(c_pad, dtype=jnp.int32)[None, :]
            sm1 = jnp.where(idx < n[:, None], sizes - 1, 0)
            pairs = sm1[:, 0::2] | (sm1[:, 1::2] << 16)
            return jnp.concatenate(
                [pairs, n[:, None], jnp.zeros((B, 1), jnp.int32)], axis=1)
        return jnp.concatenate(
            [sizes, n[:, None], jnp.zeros((B, 1), jnp.int32)], axis=1)

    if with_anchors:
        from longtail_tpu.parallel.device_match import bin_mins_from_words

        @jax.jit
        def bins_fn(rows_u8):
            words = jax.lax.bitcast_convert_type(
                rows_u8.reshape(-1, 32, 4), jnp.uint32).reshape(-1)
            return bin_mins_from_words(words, (B * P) // 4)

    def wrapped(rows_u8, lengths):
        import jax

        from longtail_tpu.parallel.pipeline import make_pad_words_fn

        parts = np.asarray(rows_u8).reshape(B, P)
        if device is not None:
            parts = jax.device_put(parts, device)
        packed = post_fn(resolve_fn(parts, lengths))
        packed.copy_to_host_async()
        words2d = make_pad_words_fn(slack_words)(rows_u8)
        bins = bins_fn(rows_u8) if with_anchors else None
        return packed, bins, words2d

    return wrapped


def repair_lane(part_bytes_u8: np.ndarray, cfg: ChunkerConfig) -> np.ndarray:
    """Exact host re-chunk of one flagged lane; returns chunk sizes."""
    from longtail_tpu.ops.cdc import chunk_part

    ends = chunk_part(part_bytes_u8, cfg.min_size, cfg.avg_size,
                      cfg.max_size)
    return np.diff(np.concatenate([[0], ends])).astype(np.int32)
