"""The three vertex-array exchange policies as XLA collectives.

Reference (`vgl_compute_api/common/mpi_exchange.hpp`, SURVEY.md §2.4.5):
- EXCHANGE_ALL (:78-187): ring MPI_Sendrecv of full arrays + merge_op
  → here: ``merge_all`` = psum/pmin/pmax over the edge axis (XLA lowers to
  ICI-optimal reduce);
- EXCHANGE_RECENTLY_CHANGED (:14-53): copy_if delta compaction + ring + merge
  → here: ``merge_changed`` masks unchanged entries to the merge identity and
  reduces — on TPU a dense masked allreduce of V values beats ragged deltas until
  V is enormous (the compacted path is the planned Pallas ppermute-ring upgrade);
- EXCHANGE_PRIVATE_DATA (:193-271): MPI_Allgatherv of owned vertex ranges
  → here: ``gather_private`` = all_gather over the vertex axis.

All functions are meant to be called INSIDE shard_map bodies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import EDGE_AXIS, VERTEX_AXIS

_MERGE = {
    "add": lambda x, ax: jax.lax.psum(x, ax),
    "min": lambda x, ax: jax.lax.pmin(x, ax),
    "max": lambda x, ax: jax.lax.pmax(x, ax),
    "or": lambda x, ax: jax.lax.pmax(x.astype(jnp.int32), ax).astype(x.dtype),
}


def merge_all(x, merge_op: str, axis: str = EDGE_AXIS):
    """EXCHANGE_ALL analog: elementwise merge of per-device candidate arrays."""
    return _MERGE[merge_op](x, axis)


def merge_changed(x, prev, merge_op: str, axis: str = EDGE_AXIS):
    """EXCHANGE_RECENTLY_CHANGED analog: only changed entries participate; the
    merge identity stands in for 'not sent' (reference merge_op path :146-150)."""
    if merge_op == "add":
        return prev + jax.lax.psum(x - prev, axis)
    if merge_op == "min":
        ident = jnp.array(jnp.inf, x.dtype) if jnp.issubdtype(
            x.dtype, jnp.floating) else jnp.array(jnp.iinfo(x.dtype).max, x.dtype)
        return jnp.minimum(prev, jax.lax.pmin(jnp.where(x != prev, x, ident), axis))
    if merge_op == "max":
        ident = jnp.array(-jnp.inf, x.dtype) if jnp.issubdtype(
            x.dtype, jnp.floating) else jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
        return jnp.maximum(prev, jax.lax.pmax(jnp.where(x != prev, x, ident), axis))
    raise ValueError(merge_op)


def gather_private(x_local, axis: str = VERTEX_AXIS):
    """EXCHANGE_PRIVATE_DATA analog: allgather owned contiguous vertex ranges."""
    return jax.lax.all_gather(x_local, axis, tiled=True)


def scatter_to_owner(values, global_idx, v_local: int, axis: str = VERTEX_AXIS,
                     combine: str = "add", init=None):
    """Scatter edge-parallel messages into this device's owned vertex range;
    out-of-range indices drop (they belong to other devices' ranges)."""
    rank = jax.lax.axis_index(axis)
    local = global_idx - rank * v_local
    # negative indices WRAP in JAX scatter (python indexing semantics); force
    # out-of-range destinations to an out-of-bounds slot so mode="drop" applies
    local = jnp.where((local >= 0) & (local < v_local), local, v_local)
    out = (jnp.zeros((v_local,), values.dtype) if init is None else init)
    at = out.at[local]
    if combine == "add":
        return at.add(values, mode="drop")
    if combine == "min":
        return at.min(values, mode="drop")
    if combine == "max":
        return at.max(values, mode="drop")
    raise ValueError(combine)
