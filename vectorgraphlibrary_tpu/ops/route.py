"""Static Beneš routing: move per-edge values from source-grouped (OUT-ELL) slot
order to destination-grouped (IN-ELL) slot order without per-element gathers.

This is the framework's answer to the reference's hardware vector gather
(`nec/advance_all_active.hpp` relies on SX-Aurora's 256-lane gather; TPU XLA
per-element gather runs ~0.1 G/s). A permutation fixed at import time is executed as

    log2(N)-7 masked exchange stages (distance N/2 ... 128)   — XLA fuses these
    one arbitrary intra-128 lane shuffle                       — Pallas kernel
    log2(N)-7 masked exchange stages (distance 128 ... N/2)

measured at ~0.4 ms for N = 2^23 on TPU v5e vs ~75 ms for jnp.take — the advance's
gather cost drops from the bottleneck to noise. Masks are computed by the native
router (native/benes.cpp) once per graph import.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CI escape hatch: force the routed code paths on non-TPU backends so the CPU
# test suite exercises the same program structure the TPU runs (the routes
# themselves execute via the XLA stage path or interpret-mode Pallas there).
_FORCE_ROUTED = bool(int(os.environ.get("VGL_FORCE_ROUTED", "0")))


def routed_backend() -> bool:
    """True when routed (gather-free) execution should be preferred. On CPU
    hosts a single XLA gather beats the multi-stage Beneš exchange, so dryruns
    and plain-CPU runs fall back to gathers unless VGL_FORCE_ROUTED/interpret
    mode asks for route coverage."""
    from .pallas import route_fused
    return (jax.default_backend() in ("tpu", "axon") or _FORCE_ROUTED
            or route_fused._INTERPRET)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RoutePlan:
    """Stage masks come in two encodings:
    - BIT-PACKED planes (uint8, little-endian within bytes) for the XLA
      stage-by-stage path (CPU / tiny routes): 8x smaller over narrow
      host→device links, unpacked by a shift+and fused into the stage select;
    - WORD-PACKED per-element int32 (one bit per stage) for the fused Pallas
      path (ops/pallas/route_fused.py): a stage's mask is a shift+and with no
      cross-lane relayout, and the whole route runs in ≤3 kernels."""

    # stage-by-stage XLA-path data; None on TPU when the fused word masks
    # exist ("slim" plans — at scale-22 these would waste ~1.7 GB of HBM)
    in_masks: Optional[jax.Array]     # uint8 [levels, n // 8]
    out_masks: Optional[jax.Array]    # uint8 [levels, n // 8]
    lane_idx: Optional[jax.Array]     # int32 [n // 128, 128]
    lane_inv: jax.Array = None  # int32 [n//128,128] (kept: inverse mid kernel)
    mid_words: Optional[jax.Array] = None   # int32 [n//128, 128]
    big_words: Optional[jax.Array] = None   # int32 [n//128, 128] (kq > 0 only)
    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    levels: int = dataclasses.field(metadata=dict(static=True), default=0)
    kb: int = dataclasses.field(metadata=dict(static=True), default=0)
    kq: int = dataclasses.field(metadata=dict(static=True), default=0)
    # advance plans carry per-slot valid/self-loop flags in spare mask-word
    # bits, enabling the fused route "finish" (route_fused.FinishSpec)
    has_flags: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)


def make_route_plan(perm: np.ndarray, fused: bool = True,
                    flags_fwd: Optional[np.ndarray] = None,
                    flags_inv: Optional[np.ndarray] = None) -> RoutePlan:
    """Host: compute stage masks for y = x[perm] (|perm| = 2^k >= 256).

    flags_fwd/flags_inv: optional uint8 [n] per-slot advance metadata (bit0 =
    slot holds a real edge, bit1 = self-loop edge) indexed by the forward /
    inverse OUTPUT slot order — packed into spare mask-word bits for the fused
    finish epilogue."""
    from .. import native
    in_m, out_m, lane = native.benes_route(perm)
    lane2d = lane.reshape(-1, 128)
    lane_inv = np.empty_like(lane2d)
    np.put_along_axis(lane_inv, lane2d,
                      np.broadcast_to(np.arange(128, dtype=np.int32),
                                      lane2d.shape), axis=1)
    n = len(perm)
    mid_words = big_words = None
    kb = kq = 0
    has_flags = False
    if fused and n >= 1024:                      # fused needs >= 8 rows of 128
        from .pallas.route_fused import build_word_masks, split_levels
        kb, kq = split_levels(n)
        mid_np, big_np = build_word_masks(in_m, out_m, n, lane_fwd=lane2d,
                                          flags_fwd=flags_fwd,
                                          flags_inv=flags_inv)
        mid_words = jnp.asarray(mid_np)
        big_words = None if big_np is None else jnp.asarray(big_np)
        has_flags = flags_fwd is not None or flags_inv is not None
    # slim plans on TPU: the stage-by-stage XLA path is never taken when the
    # fused word masks exist, so don't ship its arrays to HBM
    slim = (mid_words is not None
            and jax.default_backend() in ("tpu", "axon"))
    return RoutePlan(
        in_masks=None if slim else jnp.asarray(
            np.packbits(in_m, axis=1, bitorder="little")),
        out_masks=None if slim else jnp.asarray(
            np.packbits(out_m, axis=1, bitorder="little")),
        lane_idx=None if slim else jnp.asarray(lane2d),
        lane_inv=jnp.asarray(lane_inv),
        mid_words=mid_words, big_words=big_words,
        n=n, levels=in_m.shape[0], kb=kb, kq=kq, has_flags=has_flags)


def _unpack_bits(packed: jax.Array, n: int) -> jax.Array:
    """uint8 [n//8] → bool [n], little-endian bit order within each byte."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(n).astype(bool)


def _exchange(x: jax.Array, packed_mask: jax.Array, d: int) -> jax.Array:
    x3 = x.reshape(-1, 2, d)
    m3 = _unpack_bits(packed_mask, x.shape[0]).reshape(-1, 2, d)
    return jnp.where(m3, x3[:, ::-1, :], x3).reshape(-1)


def _lane_shuffle_tpu(vals2d: jax.Array, lane_idx: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = vals2d.shape[0]
    tr = 2048
    while r % tr != 0:
        tr //= 2

    def kernel(v_ref, i_ref, o_ref):
        v = v_ref[:]
        if v.dtype.itemsize == 1:        # int8 shuffles run int32 in VMEM
            o_ref[:] = jnp.take_along_axis(
                v.astype(jnp.int32), i_ref[:], axis=1).astype(v.dtype)
        else:
            o_ref[:] = jnp.take_along_axis(v, i_ref[:], axis=1)

    return pl.pallas_call(
        kernel, grid=(r // tr,),
        in_specs=[pl.BlockSpec((tr, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tr, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(vals2d.shape, vals2d.dtype),
    )(vals2d, lane_idx)


def _lane_shuffle(vals2d: jax.Array, lane_idx: jax.Array) -> jax.Array:
    if jax.default_backend() in ("tpu", "axon"):
        return _lane_shuffle_tpu(vals2d, lane_idx)
    return jnp.take_along_axis(vals2d, lane_idx, axis=1)


def apply_route(plan: RoutePlan, x: jax.Array, inverse: bool = False
                ) -> jax.Array:
    """Device: y[i] = x[perm[i]] (forward) or y[perm[i]] = x[i] (inverse).

    The inverse runs the (involutive) exchange stages in reverse order with the
    inverse lane shuffle — this is how pull-over-outgoing reuses the same plan.

    Dispatch: fused Pallas path (3 kernels, one HBM round-trip each) on TPU
    when the plan carries word-packed masks; stage-by-stage XLA path otherwise.
    """
    assert x.shape[0] == plan.n, (x.shape, plan.n)
    if plan.mid_words is not None:
        from .pallas import route_fused
        if jax.default_backend() in ("tpu", "axon") or route_fused._INTERPRET:
            return route_fused.apply_route_fused(plan, x, inverse=inverse)
    if plan.in_masks is None:
        raise RuntimeError(
            "route plan has no stage-by-stage masks (slim plan: a graph "
            "loaded in a TPU process drops them, graph/persistence.py); the "
            "XLA route path cannot run it — re-load the graph in a CPU "
            "process or run on the TPU backend")
    k = plan.n.bit_length() - 1
    if not inverse:
        for lev in range(plan.levels):
            x = _exchange(x, plan.in_masks[lev], 1 << (k - 1 - lev))
        x = _lane_shuffle(x.reshape(-1, 128), plan.lane_idx).reshape(-1)
        for lev in range(plan.levels - 1, -1, -1):
            x = _exchange(x, plan.out_masks[lev], 1 << (k - 1 - lev))
    else:
        for lev in range(plan.levels):
            x = _exchange(x, plan.out_masks[lev], 1 << (k - 1 - lev))
        x = _lane_shuffle(x.reshape(-1, 128), plan.lane_inv).reshape(-1)
        for lev in range(plan.levels - 1, -1, -1):
            x = _exchange(x, plan.in_masks[lev], 1 << (k - 1 - lev))
    return x
