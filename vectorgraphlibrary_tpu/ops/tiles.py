"""Tile-layout helpers for narrow (flat lane-major) buckets.

Narrow ELL rows (width < 128) stored one-per-array-row waste up to 127/128 of the
VPU lanes and force slow lane relayouts. Flat buckets pack 128/width vertex-rows
per 128-lane array row; these helpers do the per-row (grouped) reductions and
broadcasts without relayouts:
- grouped sum  = one MXU matmul against a 0/1 group matrix;
- grouped min/max/or = log2(width) lane rolls + a strided lane selection;
- row broadcast = matmul against the transposed group matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import monoid as M


@functools.lru_cache(maxsize=None)
def _group_matrix_np(width: int) -> np.ndarray:
    return (np.arange(128)[:, None] // width ==
            np.arange(128 // width)[None, :]).astype(np.float32)


def _group_matrix(width: int):
    """S[l, g] = 1 if lane l belongs to group g (128/width groups). Only the
    NumPy array is cached — caching a jnp constant would leak tracers."""
    return jnp.asarray(_group_matrix_np(width))


def group_reduce_flat(msg2d: jax.Array, width: int, mon, rows: int) -> jax.Array:
    """(m, 128) lane-major masked messages -> per-vertex-row reduction [rows].
    Messages must already carry the monoid identity in invalid slots.

    add (float) and or (bool) go through one MXU matmul against the group matrix;
    other monoids use a lane-dim split + reduce (one relayout, chosen over log2(w)
    roll chains whose op count blows up XLA compile time)."""
    m = msg2d.shape[0]
    if mon.name == "add" and jnp.issubdtype(msg2d.dtype, jnp.floating):
        red = jnp.dot(msg2d, _group_matrix(width),
                      preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        return red.reshape(-1)[:rows].astype(msg2d.dtype)
    if mon.name == "any01":
        # values contractually in {0,1} with identity 0 (the explicit any01
        # monoid, set only by advance_pull_value's bool-pull path):
        # max == any == sum>0 — one MXU matmul instead of a lane reduce
        red = jnp.dot(msg2d.astype(jnp.float32), _group_matrix(width),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return (red > 0).reshape(-1)[:rows].astype(msg2d.dtype)
    if mon.name == "or" and msg2d.dtype == jnp.dtype(bool):
        red = jnp.dot(msg2d.astype(jnp.float32), _group_matrix(width),
                      preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        return (red > 0).reshape(-1)[:rows]
    if mon.name == "add" and jnp.issubdtype(msg2d.dtype, jnp.integer):
        # exact for ANY int32: split each value into hi = v >> 16 (arithmetic,
        # sign-carrying, |hi| < 2^15) and lo = v & 0xFFFF (< 2^16); each partial
        # row sum stays < 128 * 2^16 = 2^23 < 2^24, so both f32 matmuls are exact
        # and v = hi * 65536 + lo recombines losslessly
        g = _group_matrix(width)
        hi = jnp.dot((msg2d >> 16).astype(jnp.float32), g,
                     preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        lo = jnp.dot((msg2d & 0xFFFF).astype(jnp.float32), g,
                     preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        red = hi.astype(jnp.int64 if msg2d.dtype.itemsize > 4 else jnp.int32
                        ) * 65536 + lo.astype(jnp.int32)
        return red.reshape(-1)[:rows].astype(msg2d.dtype)
    # min/max/or-words: pair-halving strided lane tree. NEVER reshape to
    # [m, groups, width] — XLA materializes that 3-D shape with the minor
    # `width` dim padded to a full (8,128) tile, a 128/width x memory blowup
    # (34 GB for a 1 GB slot array at scale 24) that made every min-class
    # pull 2.5x an add-pull (r5 exp_cc24d). Halving pairs via strided lane
    # slices keeps every intermediate 2-D and touches ~log2(w) padded passes.
    x = msg2d
    w = width
    while w > 1:
        x = mon.combine(x[:, ::2], x[:, 1::2])
        w //= 2
    return x.reshape(-1)[:rows]


def broadcast_rows_flat(x_slice: jax.Array, width: int, m: int) -> jax.Array:
    """[rows_pad] per-vertex values -> (m, 128) lane-major slot values (each
    vertex-row's value repeated across its width-slot group).

    Uses an f32 matmul against the 0/1 group matrix. Floats have infinities
    encoded around the matmul (inf * 0 would poison the row sums with NaN).
    Integers are split into hi/lo 16-bit halves (two matmuls) so the broadcast
    is EXACT for any int32 value — CC/SV labels can exceed 2^24 on large shards
    and a single f32 matmul would silently corrupt them."""
    groups = 128 // width
    gm = _group_matrix(width).T
    if x_slice.dtype.itemsize == 1:
        # int8 (bool-pull) values fit f32 exactly — one matmul, no hi/lo split
        out = jnp.dot(x_slice.reshape(m, groups).astype(jnp.float32), gm,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return out.astype(x_slice.dtype)
    if jnp.issubdtype(x_slice.dtype, jnp.integer):
        x2 = x_slice.reshape(m, groups)
        hi = jnp.dot((x2 >> 16).astype(jnp.float32), gm,
                     preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        lo = jnp.dot((x2 & 0xFFFF).astype(jnp.float32), gm,
                     preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        out = (hi.astype(jnp.int64 if x2.dtype.itemsize > 4 else jnp.int32)
               * 65536 + lo.astype(jnp.int32))
        return out.astype(x_slice.dtype)
    x2 = x_slice.reshape(m, groups).astype(jnp.float32)
    is_float = jnp.issubdtype(x_slice.dtype, jnp.floating)
    BIG = jnp.float32(1e30)
    if is_float:
        x2 = jnp.clip(x2, -BIG, BIG)
    out = jnp.dot(x2, gm, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if is_float:
        out = jnp.where(out >= BIG, jnp.inf, out)
        out = jnp.where(out <= -BIG, -jnp.inf, out)
    return out.astype(x_slice.dtype)


def row_ids_flat(row_start: int, width: int, m: int) -> jax.Array:
    """(m, 128) int32: owning vertex-row id of each lane-major slot."""
    flat = (jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0) * 128 +
            jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1))
    return row_start + flat // width
