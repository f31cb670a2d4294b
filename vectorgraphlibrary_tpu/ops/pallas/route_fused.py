"""Fused Pallas execution of the Beneš route (+ fused advance "finish").

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

Design rules that keep the kernels on the VPU fast path:
- masks are WORD-PACKED per element (int32: bit j = swap decision of stage j),
  so extracting a stage's mask is a shift+and — the XLA path's
  bitpacked-uint8 → bool[n] unpack forces a cross-lane relayout every stage;
- the forward lane-shuffle index (7 bits) rides in the SAME word (bits
  10..15 + 26), so the forward mid kernel reads two arrays, not three;
- partner values come from two circular rolls + a parity select
  (y[i] = x[i XOR d] == select(i&d, roll(x,+d), roll(x,-d))), never from
  reshape-flips that would retile VMEM;
- per-slot STATIC advance metadata (slot-is-a-real-edge, slot-is-a-self-loop)
  rides in spare mask bits (31/30 for the forward output order, 29/28 for the
  inverse output order), so the advance's epilogue — weight combine + validity
  masking, the whole per-edge `edge_op` of the hot algorithms — fuses into the
  route's LAST kernel at zero extra memory traffic ("finish", see FinishSpec).
  The reference reads adjacency per edge to do this (advance_worker.hpp);
  here the downstream reduction never touches adjacency at all.

Stage order bookkeeping (matching ops/route.py): forward applies in-half
levels 0..L-1 (row distance R/2 → 1), lane shuffle, out-half levels L-1..0
(1 → R/2); inverse applies out-half 0..L-1, inverse shuffle, in-half L-1..0.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = bool(int(os.environ.get("VGL_PALLAS_INTERPRET", "0")))
# min contiguous rows per big-kernel block (see _one_big)
_C_MIN = int(os.environ.get("VGL_ROUTE_CMIN", "8"))

# max rows per mid-kernel block: 2^10 rows × 128 lanes × 4 B = 512 KB/array
# (the kernel holds x + words + out blocks PLUS per-stage roll/select
# temporaries in scoped VMEM; 2^12-row blocks measured 24.3 MB > the 16 MB cap)
_KB_MAX = 10
# big-stage words use bits [0, kq) and [16, 16+kq) plus flag bits 28-31:
# kq ≤ 12 keeps them disjoint → routes up to n = 2^(7+_KB_MAX+12) = 2^29 slots.
_KQ_MAX = 12


@dataclasses.dataclass(frozen=True)
class FinishSpec:
    """Static epilogue fused into the route's last kernel (the restricted
    edge_op of the hot advance): x' = wop(x, w); out = valid ? x' : ident,
    where valid/self-loop are the per-slot flag bits baked into the plan."""

    ident: float                       # combine monoid identity (mask value)
    exclude_self_loops: bool = False   # also mask slots flagged self-loop
    weight_op: Optional[str] = None    # None | 'add' | 'min' | 'max' | 'mul'


def split_levels(n: int) -> tuple[int, int]:
    """(kb, kq): number of mid (within-B-block) and big (super-block) exchange
    levels per half for an n-slot route. R = n/128 rows, B = 2^kb, Q = 2^kq."""
    r_levels = max(n.bit_length() - 1 - 7, 0)     # log2(R)
    kb = min(r_levels, _KB_MAX)
    kq = r_levels - kb
    return kb, kq


def build_word_masks(in_m: np.ndarray, out_m: np.ndarray, n: int,
                     lane_fwd: Optional[np.ndarray] = None,
                     flags_fwd: Optional[np.ndarray] = None,
                     flags_inv: Optional[np.ndarray] = None,
                     ) -> tuple[np.ndarray, np.ndarray | None]:
    """Pack per-stage bit masks (uint8 [levels, n]) into per-element words.

    mid_words  int32 [R, 128]: bit j    = in-half stage with row-dist B/2>>j
                               bit 16+j = out-half stage with row-dist 1<<j
                               bits 10..15 + 26 = forward lane-shuffle index
    big_words  int32 [R, 128]: bit j    = in-half stage with row-dist R/2>>j
                               bit 16+j = out-half stage with row-dist B<<j
    (big is None when kq == 0).  levels = kb + kq per half.

    flags_fwd/flags_inv (uint8 [n], bit0 = valid-slot, bit1 = self-loop) are
    packed into the kernel that runs LAST in the respective direction —
    big_words when kq > 0 else mid_words — at bits 31/30 (fwd) and 29/28 (inv),
    indexed by that direction's OUTPUT slot position."""
    kb, kq = split_levels(n)
    levels = kb + kq
    assert in_m.shape[0] == levels, (in_m.shape, levels)
    # lane bits live at 10..15(+26): kb may not spill into them
    assert kb <= 10 and kq <= _KQ_MAX, (kb, kq)
    r = n // 128

    mid = np.zeros(n, np.uint32)
    for j in range(kb):
        mid |= in_m[kq + j].astype(np.uint32) << j
        mid |= out_m[levels - 1 - j].astype(np.uint32) << (16 + j)
    if lane_fwd is not None:
        lf = lane_fwd.reshape(-1).astype(np.uint32)
        mid |= (lf & 63) << 10
        mid |= (lf >> 6) << 26
    big = None
    if kq > 0:
        big = np.zeros(n, np.uint32)
        for j in range(kq):
            big |= in_m[j].astype(np.uint32) << j
            big |= out_m[kq - 1 - j].astype(np.uint32) << (16 + j)
    flag_target = big if big is not None else mid
    if flags_fwd is not None:
        f = flags_fwd.astype(np.uint32)
        flag_target |= (f & 1) << 31          # forward-output valid
        flag_target |= ((f >> 1) & 1) << 30   # forward-output self-loop
    if flags_inv is not None:
        f = flags_inv.astype(np.uint32)
        flag_target |= (f & 1) << 29          # inverse-output valid
        flag_target |= ((f >> 1) & 1) << 28   # inverse-output self-loop
    mid32 = mid.view(np.int32).reshape(r, 128)
    big32 = None if big is None else big.view(np.int32).reshape(r, 128)
    return mid32, big32


def _xor_swap(x: jax.Array, swap: jax.Array, dist: int, axis: int) -> jax.Array:
    """y[i] = x[i ^ dist] where swap, else x[i] — along `axis` (size % 2d == 0)."""
    up = jnp.roll(x, -dist, axis=axis)          # x[i + dist] lands at i
    dn = jnp.roll(x, dist, axis=axis)           # x[i - dist] lands at i
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    partner = jnp.where((idx & dist) != 0, dn, up)
    return jnp.where(swap, partner, x)


def _finish(x, w, wt, finish: FinishSpec, fwd: bool, dtype):
    """Apply the fused advance epilogue: optional weight combine, then mask
    non-edge (and optionally self-loop) slots to the combine identity, using
    the static flag bits of this direction's output order."""
    if wt is not None:
        op = {"add": jnp.add, "min": jnp.minimum, "max": jnp.maximum,
              "mul": jnp.multiply}[finish.weight_op]
        x = op(x, wt)
    vb, sb = (31, 30) if fwd else (29, 28)
    ok = ((w >> vb) & 1) == 1
    if finish.exclude_self_loops:
        ok &= ((w >> sb) & 1) == 0
    return jnp.where(ok, x, jnp.asarray(finish.ident, dtype))


def _mid_kernel(kb: int, inverse: bool, finish, *refs):
    if inverse:
        if finish is not None:
            x_ref, w_ref, lane_ref, wt_ref, o_ref = (
                refs if len(refs) == 5 else
                (refs[0], refs[1], refs[2], None, refs[3]))
        else:
            x_ref, w_ref, lane_ref, o_ref = refs
            wt_ref = None
    else:
        if finish is not None and len(refs) == 4:
            x_ref, w_ref, wt_ref, o_ref = refs
        else:
            x_ref, w_ref, o_ref = refs
            wt_ref = None
    in_dtype = x_ref.dtype
    x = x_ref[:]
    if in_dtype.itemsize == 1:
        # int8 data path (bool pulls): HBM moves 1 B/slot, compute runs int32
        x = x.astype(jnp.int32)
    w = w_ref[:]
    b = 1 << kb
    if not inverse:
        for j in range(kb):                      # in-half, row-dist B/2 → 1
            bit = ((w >> j) & 1) == 1
            x = _xor_swap(x, bit, b >> (j + 1), axis=0)
        lane = ((w >> 10) & 63) | (((w >> 26) & 1) << 6)
        x = jnp.take_along_axis(x, lane, axis=1)
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
    if finish is not None:
        x = _finish(x, w, None if wt_ref is None else wt_ref[:],
                    finish, fwd=not inverse, dtype=x.dtype)
    o_ref[:] = x.astype(in_dtype)


def _big_kernel(pairs, axis: int, fwd_for_finish: bool, finish, *refs):
    """Apply (bit_index, distance) exchange pairs along `axis` of the block.
    `pairs` is already ordered for the requested direction."""
    if finish is not None and len(refs) == 4:
        x_ref, w_ref, wt_ref, o_ref = refs
    else:
        x_ref, w_ref, o_ref = refs
        wt_ref = None
    in_dtype = x_ref.dtype
    x = x_ref[:]
    if in_dtype.itemsize == 1:
        x = x.astype(jnp.int32)
    w = w_ref[:]
    for bit, dist in pairs:
        sw = ((w >> bit) & 1) == 1
        x = _xor_swap(x, sw, dist, axis=axis)
    if finish is not None:
        x = _finish(x, w, None if wt_ref is None else wt_ref[:],
                    finish, fwd=fwd_for_finish, dtype=x.dtype)
    o_ref[:] = x.astype(in_dtype)


# largest q extent one big kernel may hold resident (VMEM budget: measured
# kq=10 wants 24 MB of scoped VMEM vs the 16 MB cap)
_KQ_SINGLE_MAX = 8


def _split_kq(kq: int) -> tuple[int, int]:
    """(kq1 inner, kq2 outer): one big kernel holds the whole q extent in
    VMEM; past _KQ_SINGLE_MAX super-blocks that blows the scoped-VMEM budget,
    so large routes split the big stages into an OUTER kernel (top kq2 q-bits
    resident) and an INNER kernel (next kq1 bits resident)."""
    if kq <= _KQ_SINGLE_MAX:
        return kq, 0
    kq2 = kq // 2
    return kq - kq2, kq2


def _big_pairs(kb: int, kq: int, half: str, which: str):
    """Forward-order (bit, distance) pairs for one big kernel.

    q-space distances: in-half level j has distance Q >> (j+1); out-half
    level j has distance 1 << j (bit 16+j). The OUTER kernel owns levels with
    q-distance ≥ Q1 (exchange axis = q2), the INNER the rest (axis = q1);
    distances are re-expressed in the owning axis's units."""
    kq1, kq2 = _split_kq(kq)
    q, q1 = 1 << kq, 1 << kq1
    pairs = []
    if half == "in":
        for j in range(kq):
            dist = q >> (j + 1)                 # in q units
            outer = dist >= q1
            if (which == "outer") == outer:
                pairs.append((j, dist // q1 if outer else dist))
    else:
        for j in range(kq):
            dist = 1 << j
            outer = dist >= q1
            if (which == "outer") == outer:
                pairs.append((16 + j, dist // q1 if outer else dist))
    return tuple(pairs)


def _mid_call(x2: jax.Array, words: jax.Array, lane_inv, kb: int,
              inverse: bool, finish=None, weights=None) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r = x2.shape[0]
    b = 1 << kb
    spec = lambda: pl.BlockSpec((b, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    ins = [x2, words]
    if inverse:
        ins.append(lane_inv)
    if weights is not None:
        ins.append(weights.reshape(r, 128))
    return pl.pallas_call(
        functools.partial(_mid_kernel, kb, inverse, finish),
        grid=(r // b,),
        in_specs=[spec() for _ in ins],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        # donate x2 into the output when it is a route intermediate; when the
        # caller's array is still live (e.g. the route's first kernel on an
        # input that escapes, like BFS's levels_s), XLA copy-insertion adds a
        # copy to honor the alias — an opportunistic saving, not a guaranteed
        # in-place write
        input_output_aliases={0: 0},
        interpret=_INTERPRET,
    )(*ins)


def _one_big(x2: jax.Array, words: jax.Array, kq1: int, kq2: int, which: str,
             pairs, finish, weights, fwd: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r = x2.shape[0]
    q1, q2 = 1 << kq1, 1 << kq2
    b = r // (q1 * q2)
    # contiguous extent per block: c*128*4 B chunks between q-strides. The
    # floor (_C_MIN) trades VMEM (3 arrays x q*c*128*4 B resident) against
    # HBM efficiency of the strided reads; 16+ exceeds the 16 MB scoped-VMEM
    # budget at q1=256 (compile-time OOM), so 8 stands
    # (VGL_ROUTE_CMIN to re-tune on parts with more VMEM).
    if which == "inner":
        shape = (q2, q1, b, 128)
        c = min(max(_C_MIN, 2048 // q1), b)
        block = (1, q1, c, 128)
        grid = (q2, b // c)
        index = lambda i, j: (i, 0, j, 0)
        axis = 1
    else:
        shape = (q2, q1 * b, 128)
        c = min(max(_C_MIN, 2048 // q2), q1 * b)
        block = (q2, c, 128)
        grid = ((q1 * b) // c,)
        index = lambda i: (0, i, 0)
        axis = 0
    spec = lambda: pl.BlockSpec(block, index, memory_space=pltpu.VMEM)
    ins = [x2.reshape(shape), words.reshape(shape)]
    if weights is not None:
        ins.append(weights.reshape(shape))
    out = pl.pallas_call(
        functools.partial(_big_kernel, pairs, axis, fwd, finish),
        grid=grid,
        in_specs=[spec() for _ in ins],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct(shape, x2.dtype),
        input_output_aliases={0: 0},       # opportunistic donate — see _mid_call
        interpret=_INTERPRET,
    )(*ins)
    return out.reshape(r, 128)


def _big_call(x2: jax.Array, words: jax.Array, kb: int, kq: int, half: str,
              inverse: bool, finish=None, weights=None) -> jax.Array:
    """One half's big stages as 1 kernel (kq ≤ 8) or an outer+inner pair.
    Forward 'in' runs big→small distances (outer then inner); forward 'out'
    the reverse; inverse swaps kernel order and reverses pairs."""
    kq1, kq2 = _split_kq(kq)
    if kq2 == 0:
        seq = ["inner"]
    elif half == "in":
        seq = ["outer", "inner"] if not inverse else ["inner", "outer"]
    else:
        seq = ["inner", "outer"] if not inverse else ["outer", "inner"]
    for idx, which in enumerate(seq):
        pairs = _big_pairs(kb, kq, half, which)
        last = idx == len(seq) - 1
        if not pairs and not (last and finish is not None):
            continue
        if inverse:
            pairs = pairs[::-1]
        x2 = _one_big(x2, words, kq1, kq2, which, pairs,
                      finish if last else None,
                      weights if last else None, fwd=not inverse)
    return x2


def apply_route_fused(plan, x: jax.Array, inverse: bool = False,
                      finish: Optional[FinishSpec] = None,
                      weights: Optional[jax.Array] = None) -> jax.Array:
    """Fused equivalent of ops.route.apply_route (same RoutePlan contract).

    With `finish`, the LAST kernel additionally applies the restricted advance
    epilogue (weight combine + static validity/self-loop masking) — requires a
    plan built with flags (plan.has_flags). `weights` is the per-output-slot
    static value array ([n], 4-byte dtype)."""
    n = plan.n
    kb, kq = plan.kb, plan.kq
    if finish is not None:
        assert plan.has_flags, "plan built without finish flags"
        assert (weights is not None) == (finish.weight_op is not None)
    orig_dtype = x.dtype
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    assert x.dtype.itemsize in (1, 4), x.dtype   # int8 = bool-pull fast path
    x2 = x.reshape(-1, 128)
    if not inverse:
        if kq:
            x2 = _big_call(x2, plan.big_words, kb, kq, "in", False)
            x2 = _mid_call(x2, plan.mid_words, None, kb, False)
            x2 = _big_call(x2, plan.big_words, kb, kq, "out", False,
                           finish=finish, weights=weights)
        else:
            x2 = _mid_call(x2, plan.mid_words, None, kb, False,
                           finish=finish, weights=weights)
    else:
        if kq:
            x2 = _big_call(x2, plan.big_words, kb, kq, "out", True)
            x2 = _mid_call(x2, plan.mid_words, plan.lane_inv, kb, True)
            x2 = _big_call(x2, plan.big_words, kb, kq, "in", True,
                           finish=finish, weights=weights)
        else:
            x2 = _mid_call(x2, plan.mid_words, plan.lane_inv, kb, True,
                           finish=finish, weights=weights)
    out = x2.reshape(-1)
    if orig_dtype == jnp.bool_ and finish is None:
        out = out.astype(jnp.bool_)
    return out
