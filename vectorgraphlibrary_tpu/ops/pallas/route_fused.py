"""Fused Pallas execution of the Beneš route.

The XLA path in ops/route.py materializes every masked-exchange stage in HBM
(~34 stages × full-array IO for n=2^24 — measured ~90 ms on v5e). This module
executes the same plan in THREE Pallas kernels (one when the array is small
enough), each a single HBM round-trip:

    kernel A  "big" stages — row distances ≥ B rows — operate only on the
              super-block index q of row r = q·B + s.  Blocked (Q, C, 128)
              with the full q-dimension resident in VMEM.
    kernel B  "mid" stages — row distances B/2 … 1 — plus the arbitrary
              intra-128-lane shuffle.  Blocked (B, 128) contiguous rows.
    kernel A' remaining big stages of the second half.

Two design rules keep the kernels on the VPU fast path:
- masks are WORD-PACKED per element (int32: bit j = swap decision of stage j),
  so extracting a stage's mask is a shift+and — the XLA path's
  bitpacked-uint8 → bool[n] unpack forces a cross-lane relayout every stage;
- partner values come from two circular rolls + a parity select
  (y[i] = x[i XOR d] == select(i&d, roll(x,+d), roll(x,-d))), never from
  reshape-flips that would retile VMEM.

Stage order bookkeeping (matching ops/route.py): forward applies in-half
levels 0..L-1 (row distance R/2 → 1), lane shuffle, out-half levels L-1..0
(1 → R/2); inverse applies out-half 0..L-1, inverse shuffle, in-half L-1..0.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = bool(int(os.environ.get("VGL_PALLAS_INTERPRET", "0")))

# max rows per mid-kernel block: 2^10 rows × 128 lanes × 4 B = 512 KB/array
# (the kernel holds x + words + lane + out blocks PLUS per-stage roll/select
# temporaries in scoped VMEM; 2^12-row blocks measured 24.3 MB > the 16 MB cap)
_KB_MAX = 10


def split_levels(n: int) -> tuple[int, int]:
    """(kb, kq): number of mid (within-B-block) and big (super-block) exchange
    levels per half for an n-slot route. R = n/128 rows, B = 2^kb, Q = 2^kq."""
    r_levels = max(n.bit_length() - 1 - 7, 0)     # log2(R)
    kb = min(r_levels, _KB_MAX)
    kq = r_levels - kb
    return kb, kq


def build_word_masks(in_m: np.ndarray, out_m: np.ndarray, n: int
                     ) -> tuple[np.ndarray, np.ndarray | None]:
    """Pack per-stage bit masks (uint8 [levels, n]) into per-element words.

    mid_words  int32 [R, 128]: bit j      = in-half stage with row-dist B/2>>j
                               bit 16+j   = out-half stage with row-dist 1<<j
    big_words  int32 [R, 128]: bit j      = in-half stage with row-dist R/2>>j
                               bit 16+j   = out-half stage with row-dist B<<j
    (None when kq == 0).  levels = kb + kq per half."""
    kb, kq = split_levels(n)
    levels = kb + kq
    assert in_m.shape[0] == levels, (in_m.shape, levels)
    assert kb <= 16 and kq <= 16, (kb, kq)
    r = n // 128

    mid = np.zeros(n, np.int32)
    for j in range(kb):
        mid |= in_m[kq + j].astype(np.int32) << j
        mid |= out_m[levels - 1 - j].astype(np.int32) << (16 + j)
    big = None
    if kq > 0:
        big = np.zeros(n, np.int32)
        for j in range(kq):
            big |= in_m[j].astype(np.int32) << j
            big |= out_m[kq - 1 - j].astype(np.int32) << (16 + j)
        big = big.reshape(r, 128)
    return mid.reshape(r, 128), big


def _xor_swap(x: jax.Array, swap: jax.Array, dist: int, axis: int) -> jax.Array:
    """y[i] = x[i ^ dist] where swap, else x[i] — along `axis` (size % 2d == 0)."""
    up = jnp.roll(x, -dist, axis=axis)          # x[i + dist] lands at i
    dn = jnp.roll(x, dist, axis=axis)           # x[i - dist] lands at i
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    partner = jnp.where((idx & dist) != 0, dn, up)
    return jnp.where(swap, partner, x)


def _mid_kernel(kb: int, inverse: bool, x_ref, w_ref, lane_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:]
    b = 1 << kb
    if not inverse:
        for j in range(kb):                      # in-half, row-dist B/2 → 1
            bit = ((w >> j) & 1) == 1
            x = _xor_swap(x, bit, b >> (j + 1), axis=0)
        x = jnp.take_along_axis(x, lane_ref[:], axis=1)
        for j in range(kb):                      # out-half, row-dist 1 → B/2
            bit = ((w >> (16 + j)) & 1) == 1
            x = _xor_swap(x, bit, 1 << j, axis=0)
    else:
        for j in range(kb - 1, -1, -1):          # out-half, row-dist B/2 → 1
            bit = ((w >> (16 + j)) & 1) == 1
            x = _xor_swap(x, bit, 1 << j, axis=0)
        x = jnp.take_along_axis(x, lane_ref[:], axis=1)
        for j in range(kb - 1, -1, -1):          # in-half, row-dist 1 → B/2
            bit = ((w >> j) & 1) == 1
            x = _xor_swap(x, bit, (1 << kb) >> (j + 1), axis=0)
    o_ref[:] = x


def _big_kernel(kq: int, half: str, inverse: bool, x_ref, w_ref, o_ref):
    """Big stages over the q axis of (Q, C, 128) blocks.

    half='in'  forward: in-half bits j=0..kq-1 (q-dist Q/2 → 1)
    half='out' forward: out-half bits 16+j, j=0..kq-1 (q-dist 1 → Q/2)
    inverse flips both the half used and the iteration order (see apply)."""
    x = x_ref[:]
    w = w_ref[:]
    q = 1 << kq
    if half == "in":
        js = range(kq) if not inverse else range(kq - 1, -1, -1)
        for j in js:
            bit = ((w >> j) & 1) == 1
            x = _xor_swap(x, bit, q >> (j + 1), axis=0)
    else:
        js = range(kq) if not inverse else range(kq - 1, -1, -1)
        for j in js:
            bit = ((w >> (16 + j)) & 1) == 1
            x = _xor_swap(x, bit, 1 << j, axis=0)
    o_ref[:] = x


def _mid_call(x2: jax.Array, words: jax.Array, lane: jax.Array, kb: int,
              inverse: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r = x2.shape[0]
    b = 1 << kb
    spec = lambda: pl.BlockSpec((b, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mid_kernel, kb, inverse),
        grid=(r // b,),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=_INTERPRET,
    )(x2, words, lane)


def _big_call(x2: jax.Array, words: jax.Array, kb: int, kq: int, half: str,
              inverse: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r = x2.shape[0]
    q, b = 1 << kq, 1 << kb
    # (Q, C, 128) blocks: full q-dim resident; C rows of each super-block
    c = max(8, (1 << _KB_MAX) // q)
    c = min(c, b)
    x3 = x2.reshape(q, b, 128)
    w3 = words.reshape(q, b, 128)
    spec = lambda: pl.BlockSpec((q, c, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_big_kernel, kq, half, inverse),
        grid=(b // c,),
        in_specs=[spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=_INTERPRET,
    )(x3, w3)
    return out.reshape(r, 128)


def apply_route_fused(plan, x: jax.Array, inverse: bool = False) -> jax.Array:
    """Fused equivalent of ops.route.apply_route (same RoutePlan contract)."""
    n = plan.n
    kb, kq = plan.kb, plan.kq
    orig_dtype = x.dtype
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    assert x.dtype.itemsize == 4, x.dtype
    x2 = x.reshape(-1, 128)
    lane = plan.lane_idx if not inverse else plan.lane_inv
    if not inverse:
        if kq:
            x2 = _big_call(x2, plan.big_words, kb, kq, "in", False)
        x2 = _mid_call(x2, plan.mid_words, lane, kb, False)
        if kq:
            x2 = _big_call(x2, plan.big_words, kb, kq, "out", False)
    else:
        if kq:
            x2 = _big_call(x2, plan.big_words, kb, kq, "out", True)
        x2 = _mid_call(x2, plan.mid_words, lane, kb, True)
        if kq:
            x2 = _big_call(x2, plan.big_words, kb, kq, "in", True)
    out = x2.reshape(-1)
    if orig_dtype == jnp.bool_:
        out = out.astype(jnp.bool_)
    return out
