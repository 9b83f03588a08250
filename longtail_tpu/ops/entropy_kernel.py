"""Pallas bit-merge kernel for the TPU Huffman entropy stage.

Replaces the XLA scatter-add formulation of the backward Huffman pack
(device_entropy.make_hufpack_fn): per-element ``.at[w].add`` lowered to
TPU scatters running at ~0.03 GB/s — the round-5 recorded finding.  The
kernel reformulates the pack so NO scatter (and no per-element gather
fan-in) is needed:

- **Row windows.**  Literals are processed 128 per vector row.  A row's
  codes span at most 31 + 128*11 bits -> a 47-word contiguous window of
  the output stream, at a word offset known from the bit carry of all
  later literals (the stream is backward: literal i sits at bit offset
  sum(len[j] for j > i), LSB-up — zstd RFC 8878 §4.2.1 bitstream rules,
  mirrored from the reference's vendored upstream Huffman writer, the
  seam longtail wraps at lib/zstd/longtail_zstd.c:99-137).

- **Wrapping-sum windows.**  Within a row, per-word contributions are
  bit-disjoint, so each output word equals an exact *sum* over a
  contiguous lane range (offsets are monotone), and any lane-range sum
  is a difference of two wrapping u32 prefix sums — carries cancel mod
  2^32 because the true per-word total fits 32 bits.  One lane cumsum
  per contribution stream (low word / spill word), a 7-step vectorized
  bisect for the 48 word-boundary lanes, and two boundary gathers
  produce the whole 47-word window: ~40 vector ops per 128 literals,
  no scatter.

- **Batched merge tree.**  Row windows pair up level by level until one
  window per tile remains: the hi partner shifts up by the word gap —
  the per-window lane shift is ONE same-shape take_along_axis gather
  (level arrays stay >= (2,128), the shape Mosaic's gather supports;
  measured 1.5x faster than a 7-step conditional roll ladder), the row
  shift a log roll ladder over sublanes with an iota-AND window-
  boundary guard (row counts pow2: exact heights measured SLOWER —
  non-pow2 sublane shapes fight the vreg layout) — and ORs over the lo
  partner.  All windows of a level live in one window-major array, so
  every op is a large vector op; the tile window then ORs into the
  VMEM-resident output stream with a single dynamic read-OR-write.
  (Measured alternatives on-chip: per-row dynamic stores in a fori cost
  ~4.4 us/row; a list-of-small-rows tree ~100 ns per tiny op — both
  orders of magnitude off; the batched tree packs 128 KiB streams at
  ~3.8-4.0 GB/s in 16 MiB dispatches.)  Tiles are walked in reverse
  stream order behind a scalar bit-carry; word overlap between adjacent
  tiles is handled by the OR (their bits are disjoint by construction).

Output contract matches device_entropy.make_hufpack_fn: words hold the
exact host ``_huf_encode_stream`` bit pattern (sentinel excluded — the
host appends it), so sections drop into upstream-decodable zstd frames.

Conformance: tests/test_device_entropy.py pins kernel output (interpret
mode off-TPU) against the XLA oracle and the host encoder.
"""

from __future__ import annotations

import functools

import numpy as np

MAX_HUF_BITS = 11  # zstd RFC 8878 Huffman depth limit (zstd_frame)


def pack_code_table(code_val, code_len) -> np.ndarray:
    """(256,) canonical codes -> (2, 128) i32 packed (val | len << 16)
    rows for the kernel's two-gather table lookup."""
    cv = np.zeros(256, np.int32)
    cl = np.zeros(256, np.int32)
    cv[: len(code_val)] = code_val
    cl[: len(code_len)] = code_len
    return (cv | (cl << 16)).reshape(2, 128)


def words_pad(n_pad: int) -> tuple[int, int]:
    """(useful word count W, padded out rows W128) for a stream of
    n_pad literal slots."""
    W = (n_pad * MAX_HUF_BITS + 31) // 32 + 1
    _, _, hf = _merge_geometry(max(n_pad, MIN_PALLAS_PAD))
    W128 = -(-W // 128) + hf + 2   # slack: tile-window RMW + totals row
    W128 = -(-W128 // 8) * 8       # Mosaic block sublane divisibility
    return W, W128


def _row_tile(n_pad: int) -> int:
    r128 = n_pad // 128
    return min(256, r128)


MIN_PALLAS_PAD = 1024   # Mosaic wants row-tile blocks of >= 8 sublanes


def _pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _merge_geometry(n_pad: int):
    """Static merge-tree geometry for one tile of RT row-windows.

    Level k merges pairs of 2^k-row windows: the word gap between the
    partners is at most the lo partner's worst-case word span maxd_k,
    and merged window widths accumulate gap + width.  Window row counts
    are padded to powers of two so the batched row-shift ladders can
    mask window boundaries with an iota-AND.  Returns
    (RT, [(maxd_k, Hp_in, Hp_out)], H_final_unpadded)."""
    RT = _row_tile(n_pad)
    width = 46                       # one row: 31 + 128*11 bits + spill
    levels = []
    g, k = RT, 0
    hp = 1
    while g > 1:
        maxd = ((1 << k) * 128 * MAX_HUF_BITS + 31) // 32 + 2
        width = maxd + width
        ho = _pow2(-(-width // 128))
        levels.append((maxd, hp, ho))
        hp = ho
        g //= 2
        k += 1
    return RT, levels, -(-width // 128)


@functools.lru_cache(maxsize=16)
def make_hufpack_rows_fn(n_pad: int, n_streams: int, _stage: int = 3):
    """jit: (rows (S * n_pad/128, 128) u8 — streams flattened stream-
    major into 128-byte rows, n_lit (S, 1) i32, tv (2, 128) i32 packed
    code table) -> (words (S, W128*128) u32, totals (S, 1) i32).

    words[s].reshape(-1)[:W] is the backward Huffman bitstream of
    stream s (host appends the sentinel); totals[s] its bit length.

    ``_stage`` gates the kernel for on-chip stage profiling (-1 grid
    only, 0 cumsums, 1 +windows, 2 +merge tree, 3 full — the default;
    lower stages emit placeholder output, production always uses 3)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_pad % 128 == 0 and n_pad >= MIN_PALLAS_PAD, n_pad
    S = n_streams
    R128 = n_pad // 128
    RT, levels, HF = _merge_geometry(n_pad)
    T = R128 // RT
    W, W128 = words_pad(n_pad)
    u32 = jnp.uint32
    i32 = jnp.int32

    def kernel(nlit_ref, x_ref, tv_ref, out_ref, carry_s):
        i = pl.program_id(0)
        j = pl.program_id(1)
        tt = (T - 1) - j            # tile index in stream order

        @pl.when(j == 0)
        def _init():
            out_ref[:, :] = jnp.zeros((W128, 128), u32)
            carry_s[0] = i32(0)

        tilecarry = carry_s[0]
        n_lit = nlit_ref[i]

        @pl.when(tt * (RT * 128) < n_lit)
        def _tile():
            _tile_body(x_ref, tv_ref, out_ref, carry_s,
                       tilecarry, n_lit, tt)

        @pl.when(j == T - 1)
        def _fin():
            # total bit count rides the last (always-pad) out row: the
            # tile-window RMW never reaches it (words_pad slack)
            out_ref[pl.ds(W128 - 1, 1), :] = (
                jnp.zeros((1, 128), u32) + carry_s[0].astype(u32))

    def _tile_body(x_ref, tv_ref, out_ref, carry_s, tilecarry, n_lit, tt):
        if _stage < 0:                                 # profiling stub
            carry_s[0] = tilecarry + 1
            return
        # --- vector phase: per-row 47-word windows -------------------
        x = x_ref[:].astype(i32)                       # (RT, 128)
        idx = x & 127
        tlo = jnp.broadcast_to(tv_ref[0:1, :], idx.shape)
        thi = jnp.broadcast_to(tv_ref[1:2, :], idx.shape)
        tv = jnp.where(x < 128,
                       jnp.take_along_axis(tlo, idx, axis=1),
                       jnp.take_along_axis(thi, idx, axis=1))

        r_iota = jax.lax.broadcasted_iota(i32, (RT, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (RT, 128), 1)
        pos = (tt * RT + r_iota) * 128 + lane          # stream position
        live = pos < n_lit
        L = jnp.where(live, tv >> 16, 0)               # code lengths
        V = jnp.where(live, tv & 0xFFFF, 0).astype(u32)

        def lane_cumsum(v):
            # inclusive prefix along lanes (wrapping for u32)
            for k in (1, 2, 4, 8, 16, 32, 64):
                r = pltpu.roll(v, k, axis=1)
                v = v + jnp.where(lane >= k, r, jnp.zeros_like(v))
            return v

        P = lane_cumsum(L)                             # i32
        last = jnp.full((RT, 128), 127, i32)
        # P monotone along lanes -> row total = lane max, broadcast
        rowtot = jnp.broadcast_to(
            jnp.max(P, axis=1, keepdims=True), (RT, 128))

        # carry_r = tilecarry + bits of later rows in this tile
        C = rowtot
        for k in (1, 2, 4, 8, 16, 32, 64, 128):
            if k >= RT:
                break
            r = pltpu.roll(C, k, axis=0)
            C = C + jnp.where(r_iota >= k, r, jnp.zeros_like(C))
        # C monotone along sublanes -> tile total = sublane max
        tiletot = jnp.broadcast_to(
            jnp.max(C, axis=0, keepdims=True), (RT, 128))
        carryv = tilecarry + (tiletot - C)             # (RT,128) per-row

        lam = (carryv & 31) + (rowtot - P)             # local bit offset
        sh = (lam & 31).astype(u32)
        lo = V << sh
        hi = (V >> (u32(31) - sh)) >> u32(1)
        Slo = lane_cumsum(lo)
        Shi = lane_cumsum(hi)
        if _stage == 0:                                # profiling stub
            out_ref[pl.ds(0, RT), :] = Slo ^ Shi
            carry_s[0] = tilecarry + jnp.min(tiletot)
            return
        tot_lo = jnp.take_along_axis(Slo, last, axis=1)
        tot_hi = jnp.take_along_axis(Shi, last, axis=1)

        # bisect: cnt[k] = #{lanes: lam >= 32*(k+1)} (lam non-increasing)
        Tq = 32 * (lane + 1)
        cnt = jnp.zeros((RT, 128), i32)
        for s in (64, 32, 16, 8, 4, 2, 1):
            t = cnt + s
            probe = jnp.take_along_axis(
                lam, jnp.minimum(t - 1, 127), axis=1)
            ok = (probe >= Tq) & (t <= 128)
            cnt = jnp.where(ok, t, cnt)

        gidx = jnp.maximum(cnt - 1, 0)
        G = jnp.where(cnt > 0,
                      jnp.take_along_axis(Slo, gidx, axis=1), u32(0))
        H = jnp.where(cnt > 0,
                      jnp.take_along_axis(Shi, gidx, axis=1), u32(0))
        Gm1 = jnp.where(lane == 0, tot_lo, pltpu.roll(G, 1, axis=1))
        Hm1 = jnp.where(lane == 0, tot_hi, pltpu.roll(H, 1, axis=1))
        Hm2 = jnp.where(lane < 2, tot_hi, pltpu.roll(H, 2, axis=1))
        win = (Gm1 - G) + (Hm2 - Hm1)                  # u32, exact OR

        if _stage == 1:                                # profiling stub
            out_ref[pl.ds(0, RT), :] = win
            tile_bits0 = jnp.min(tiletot)
            carry_s[0] = tilecarry + tile_bits0
            return

        # --- merge tree: RT row-windows -> one tile window -----------
        # Windows pair up level by level: the hi partner (earlier in
        # the stream, higher bit offset) shifts up by the word gap d
        # and ORs over the lo partner.  All windows of a level live in
        # ONE window-major (G*Hp, 128) array so every op stays a large
        # vector op (a per-row fori placement cost ~4.4 us per row on-
        # chip; a list-of-small-rows tree cost ~100 ns per tiny op —
        # both orders of magnitude off speed-of-light).  Per-window
        # lane shifts ride a log roll ladder masked by the broadcast
        # gap; the row shift rides a log roll ladder over sublanes with
        # an iota-AND window-boundary guard (row counts are pow2).
        A = win                                        # (RT*1, 128)
        WB = carryv >> 5                               # (RT,128) offsets
        g = RT
        for maxd, hp, ho in levels:
            gh = g // 2
            A3 = A.reshape(gh, 2 * hp, 128)
            ev = A3[:, :hp, :].reshape(gh * hp, 128)
            od = A3[:, hp:, :].reshape(gh * hp, 128)
            wbe = WB.reshape(gh, 2, 128)[:, 0, :]
            wbo = WB.reshape(gh, 2, 128)[:, 1, :]
            d = wbe - wbo                              # per-window gap
            if ho > hp:
                zpad = jnp.zeros((gh, ho - hp, 128), u32)
                ev = jnp.concatenate(
                    [ev.reshape(gh, hp, 128), zpad], axis=1
                ).reshape(gh * ho, 128)
                od = jnp.concatenate(
                    [od.reshape(gh, hp, 128), zpad], axis=1
                ).reshape(gh * ho, 128)
            drow = jnp.broadcast_to(
                d.reshape(gh, 1, 128), (gh, ho, 128)).reshape(gh * ho, 128)
            dl = drow & 127
            lanez = jax.lax.broadcasted_iota(i32, (gh * ho, 128), 1)
            wr = jax.lax.broadcasted_iota(
                i32, (gh * ho, 128), 0) & (ho - 1)     # row in window
            # per-window lane shift as ONE same-shape gather (all
            # level arrays here are >= (2,128); Mosaic supports the
            # equal-shape 2D take_along_axis) — measured faster than a
            # 7-step conditional roll ladder
            ev = jnp.take_along_axis(ev, (lanez - dl) & 127, axis=1)
            dr = drow >> 7
            b = 1
            while b <= (maxd >> 7):
                r = pltpu.roll(ev, b, axis=0)
                r = jnp.where(wr >= b, r, jnp.zeros_like(r))
                ev = jnp.where((dr & b) != 0, r, ev)
                b <<= 1
            up = pltpu.roll(ev, 1, axis=0)
            up = jnp.where(wr >= 1, up, jnp.zeros_like(up))
            A = od | jnp.where(lanez >= dl, ev, up)
            WB, g = wbo, gh

        if _stage == 2:                                # profiling stub
            out_ref[pl.ds(0, HF), :] = A[:HF, :]
            tile_bits1 = jnp.min(tiletot)
            carry_s[0] = tilecarry + tile_bits1
            return

        # --- one dynamic RMW: tile window ORs into the out stream ----
        wbT = tilecarry >> 5
        R0 = wbT >> 7
        qoff = wbT & 127
        F = A[:HF, :]                                  # (HF, 128)
        laneH = jax.lax.broadcasted_iota(i32, (HF, 128), 1)
        F = jnp.take_along_axis(F, (laneH - qoff) & 127, axis=1)
        z1 = jnp.zeros((1, 128), u32)
        lo_rows = jnp.concatenate([F, z1], axis=0)     # (HF+1, 128)
        up_rows = jnp.concatenate([z1, F], axis=0)
        laneF = jax.lax.broadcasted_iota(i32, (HF + 1, 128), 1)
        placed = jnp.where(laneF >= qoff, lo_rows, up_rows)
        cur = out_ref[pl.ds(R0, HF + 1), :]
        out_ref[pl.ds(R0, HF + 1), :] = cur | placed

        tile_bits = jnp.min(tiletot)                   # scalar (equal)
        carry_s[0] = tilecarry + tile_bits

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, T),
        in_specs=[
            pl.BlockSpec((RT, 128),
                         lambda i, j, *_: (i * T + (T - 1 - j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W128, 128), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    import jax as _jax
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _jax.ShapeDtypeStruct((S * W128, 128), jnp.uint32),
        ],
        interpret=_jax.default_backend() != "tpu",
    )

    @_jax.jit
    def fn(rows_u8, n_lit, tv):
        (words,) = call(n_lit.astype(jnp.int32).reshape(S), rows_u8, tv)
        words = words.reshape(S, W128 * 128)
        totals = words[:, (W128 - 1) * 128].astype(jnp.int32)
        return words, totals

    return fn
