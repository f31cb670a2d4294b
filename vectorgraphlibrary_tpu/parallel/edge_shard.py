"""Edge-partitioned distributed graph representation.

Each device owns an equal padded slice of the (src, dst, weight) edge list in
ORIGINAL id space, plus the range-partitioned vertex state. This replaces the
reference's replicated-graph + per-rank vertex-threshold slicing
(`advance_worker.hpp:239-264`) with true edge partitioning (SURVEY.md §7.1
"Distribution" calls this the upgrade over VGL's replicated graph).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..io.edges_container import EdgesContainer
from .mesh import EDGE_AXIS, VERTEX_AXIS


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedEdgeGraph:
    """COO edge list padded to n_e * per-shard-multiple, sharded over the 'e' axis."""

    src: jax.Array        # int32 [e_pad], sharded P('e'); pad = v (out of range)
    dst: jax.Array        # int32 [e_pad], sharded P('e')
    weights: jax.Array    # float32 [e_pad]
    out_degrees: jax.Array  # int32 [v_pad], replicated
    v: int = dataclasses.field(metadata=dict(static=True), default=0)
    v_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    e: int = dataclasses.field(metadata=dict(static=True), default=0)
    e_pad: int = dataclasses.field(metadata=dict(static=True), default=0)


def build_sharded_edge_graph(ec: EdgesContainer, mesh) -> ShardedEdgeGraph:
    n_e = mesh.shape[EDGE_AXIS]
    n_v = mesh.shape[VERTEX_AXIS]
    v = ec.vertices_count
    v_pad = _round_up(v, 8 * n_v)
    e_pad = _round_up(max(ec.edges_count, n_e * 8), n_e * 8)

    src = np.full(e_pad, v, np.int32)   # pad edges point at invalid vertex
    dst = np.full(e_pad, v_pad + 1, np.int32)  # out of every range → dropped
    w = np.zeros(e_pad, np.float32)
    src[:ec.edges_count] = ec.src_ids
    dst[:ec.edges_count] = ec.dst_ids
    if ec.weights is not None:
        w[:ec.edges_count] = ec.weights
    outdeg = np.zeros(v_pad, np.int32)
    outdeg[:v] = np.bincount(ec.src_ids, minlength=v)

    es = NamedSharding(mesh, P(EDGE_AXIS))
    rep = NamedSharding(mesh, P())
    return ShardedEdgeGraph(
        src=jax.device_put(jnp.asarray(src), es),
        dst=jax.device_put(jnp.asarray(dst), es),
        weights=jax.device_put(jnp.asarray(w), es),
        out_degrees=jax.device_put(jnp.asarray(outdeg), rep),
        v=v, v_pad=v_pad, e=ec.edges_count, e_pad=e_pad)
