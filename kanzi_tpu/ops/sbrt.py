"""Batched SBRT (MTF / RANK / TIMESTAMP) forward + inverse on device.

Reference: src/transform/SBRT.cpp:22-145. The transform is a sequential
256-symbol rank automaton: per byte, qc = ((i & m1) + (p[c] & m2)) >>
shift decides how far symbol c's rank rises; everything between shifts
down one. One XLA scan step costs ~4 us on TPU (the in-scan gathers
dominate); this Pallas kernel keeps the whole [G, 256] rank/p/q state
in VMEM and advances G independent blocks per step at VPU speed —
the batched-blocks axis is the reference's own parallel model (one
task per block, src/io/CompressedOutputStream.cpp:476-540).

Used by the device l5 chain (BWT -> RANK -> ZRLT -> ANS0) and the mesh
pipelines; the host native automaton (native/transforms.cpp) remains
the single-block CLI path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 16            # blocks per grid cell
WIN_B = 2048      # bytes per block per grid window

_MODES = {1: (-1, 0, 0), 2: (-1, -1, 1), 3: (0, -1, 0)}   # MTF/RANK/TS


def _sbrt_kernel(mode_consts, inverse, in_ref, len_ref, out_ref,
                 rk_ref, p_ref, q_ref):
    """One grid cell: G blocks x WIN_B bytes (grid = (groups, windows);
    state resets at window 0 of each group). in/out are packed
    big-endian u32 words [G, WIN_B//4]."""
    m1, m2, shift = mode_consts
    w = pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when(w == 0)
    def _():
        syms0 = jax.lax.broadcasted_iota(jnp.int32, (G, 256), 1)
        rk_ref[:, :] = syms0
        p_ref[:, :] = jnp.zeros((G, 256), jnp.int32)
        q_ref[:, :] = jnp.zeros((G, 256), jnp.int32)

    syms = jax.lax.broadcasted_iota(jnp.int32, (G, 256), 1)
    lens = len_ref[:, :]                                  # [G, 128]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)

    def gather256(tbl, idx):
        """tbl [G, 256], idx [G, 128] (values < 256) -> [G, 128]."""
        lo = jnp.take_along_axis(tbl[:, :128], idx & 127, axis=1)
        hi = jnp.take_along_axis(tbl[:, 128:], idx & 127, axis=1)
        return jnp.where(idx < 128, lo, hi)

    def word_body(t4, carry):
        tile_out, = carry
        # 128-aligned slab: Mosaic requires lane-dim vector loads at
        # provable multiples of 128 (a 32-aligned 32-wide ds dies with
        # "cannot statically prove that index ... is a multiple of 128")
        slab = in_ref[:, pl.ds(pl.multiple_of((t4 >> 7) * 128, 128), 128)]
        wrd = jnp.take_along_axis(
            slab, jnp.zeros((G, 128), jnp.int32) + (t4 & 127),
            axis=1).astype(jnp.uint32)
        for b4 in range(4):
            ranks = rk_ref[:, :]
            val = ((wrd >> np.uint32(24 - 8 * b4))
                   & np.uint32(0xFF)).astype(jnp.int32)
            byte_i = w * WIN_B + t4 * 4 + b4
            alive = (byte_i < lens)[:, :1]                # [G, 1]
            c_or_r = val[:, :1]                           # [G, 1]
            if inverse:
                r = c_or_r
                # c = symbol currently holding rank r
                c = jnp.sum(jnp.where(ranks == r, syms, 0), axis=1,
                            keepdims=True)
                emit = c
            else:
                c = c_or_r
                r = gather256(ranks, jnp.broadcast_to(c, (G, 128)))[:, :1]
                emit = r
            i_vec = jnp.full((G, 1), 0, jnp.int32) + byte_i
            pc = gather256(p_ref[:, :], jnp.broadcast_to(c, (G, 128)))[:, :1]
            qc = ((i_vec & m1) + (pc & m2)) >> shift
            above = (ranks < r) & (q_ref[:, :] > qc)
            new_r = jnp.max(jnp.where(above, ranks + 1, 0), axis=1,
                            keepdims=True)
            shift_up = (ranks >= new_r) & (ranks < r) & alive
            is_c = (syms == c) & alive
            rk_ref[:, :] = jnp.where(
                is_c, new_r, jnp.where(shift_up, ranks + 1, ranks))
            p_ref[:, :] = jnp.where(is_c, i_vec, p_ref[:, :])
            q_ref[:, :] = jnp.where(is_c, qc, q_ref[:, :])
            # pack emitted byte into the out word tile
            slot = (t4 & 127)
            m = (lanes == slot).astype(jnp.int32)
            keep = jnp.where(alive, emit, val)            # passthrough pad
            tile_out = tile_out + (keep << (24 - 8 * b4)) * m

        @pl.when((t4 & 127) == 127)
        def _():
            doff = pl.multiple_of((t4 >> 7) * 128, 128)
            out_ref[:, pl.ds(doff, 128)] = tile_out

        tile_out = tile_out * (1 - ((t4 & 127) == 127).astype(jnp.int32))
        return (tile_out,)

    (_tile,) = jax.lax.fori_loop(0, WIN_B // 4, word_body,
                                 (jnp.zeros((G, 128), jnp.int32),))


@lru_cache(maxsize=16)
def _sbrt_fn(mode: int, inverse: bool, groups: int, n_win: int):
    from functools import partial
    kern = partial(_sbrt_kernel, _MODES[mode], inverse)
    return pl.pallas_call(
        kern,
        grid=(groups, n_win),
        in_specs=[
            pl.BlockSpec((G, WIN_B // 4), lambda g, w: (g, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda g, w: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, WIN_B // 4), lambda g, w: (g, w),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups * G, n_win * (WIN_B // 4)),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, 256), jnp.int32) for _ in range(3)],
    )


def _pack_words(blocks: np.ndarray) -> np.ndarray:
    b, L = blocks.shape
    w = blocks.reshape(b, L // 4, 4).astype(np.uint32)
    return ((w[:, :, 0] << 24) | (w[:, :, 1] << 16)
            | (w[:, :, 2] << 8) | w[:, :, 3]).astype(np.int32)


def sbrt_batch(blocks: np.ndarray, lens: np.ndarray, mode: int,
               inverse: bool) -> np.ndarray:
    """Transform a batch of blocks on device. blocks [B, L] u8 (L padded
    to a WIN_B multiple is handled here), lens [B]. Returns [B, L] u8."""
    import kanzi_tpu.ops as _ops
    _ops.count("sbrt_device", blocks.shape[0])
    b, L = blocks.shape
    Lp = -(-max(L, 4) // WIN_B) * WIN_B
    bp = -(-b // G) * G
    x = np.zeros((bp, Lp), np.uint8)
    x[:b, :L] = blocks
    lens2 = np.zeros((bp, 128), np.int32)
    lens2[:b, :] = np.asarray(lens, np.int64)[:, None]
    fn = _sbrt_fn(mode, inverse, bp // G, Lp // WIN_B)
    out = np.asarray(fn(jnp.asarray(_pack_words(x)),
                        jnp.asarray(lens2)))
    ob = np.ascontiguousarray(out.astype(np.uint32)).view(np.uint8)
    # big-endian words -> bytes
    ob = ob.reshape(bp, Lp // 4, 4)[:, :, ::-1].reshape(bp, Lp)
    return ob[:b, :L]
