"""HITS (hubs & authorities).

Capability match for the reference HITS (`algorithms/hits/hits.hpp:5-176`):
alternating gather phases — auth[v] = Σ hub[u] over incoming edges, hub[v] = Σ
auth[w] over outgoing edges — each followed by L2 normalization, with a direction
flip between phases (the reference's change_traversal_direction). TPU-native: both
phases are tiled pulls (the hub phase pulls over the outgoing container via the
container-swap trick), the whole iteration loop in one jitted `lax.fori_loop` in
ORIGINAL space with per-phase reorders fused as gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraversalDirection
from ..graph.device import VGLGraph
from ..graph.vertices import VertexArray
from ..ops.advance import advance_pull_value
from . import common

S, G, O = (TraversalDirection.SCATTER, TraversalDirection.GATHER,
           TraversalDirection.ORIGINAL)


@functools.partial(jax.jit, static_argnums=(1,))
def _hits_run(graph: VGLGraph, iterations: int):
    v, v_pad = graph.v, graph.v_pad
    real = jnp.arange(v_pad, dtype=jnp.int32) < v
    auth0 = jnp.where(real, 1.0, 0.0).astype(jnp.float32)
    hub0 = auth0

    def normalize(x):
        n = jnp.sqrt(jnp.sum(x * x))
        return jnp.where(n > 0, x / n, x)

    def body(_, state):
        auth, hub = state
        hub_g = common.to_direction(graph, hub, O, G)
        auth_new = advance_pull_value(graph, hub_g, "add", direction=G)
        auth = normalize(common.to_direction(graph, auth_new, G, O) * real)
        auth_s = common.to_direction(graph, auth, O, S)
        hub_new = advance_pull_value(graph, auth_s, "add", direction=S)
        hub = normalize(common.to_direction(graph, hub_new, S, O) * real)
        return auth, hub

    return jax.lax.fori_loop(0, iterations, body, (auth0, hub0))


def vgl_hits(graph: VGLGraph, iterations: int = 20
             ) -> tuple[VertexArray, VertexArray]:
    auth, hub = _hits_run(graph, iterations)
    return (VertexArray(values=auth, direction=O),
            VertexArray(values=hub, direction=O))


def seq_hits(ec, iterations: int = 20) -> tuple[np.ndarray, np.ndarray]:
    v = ec.vertices_count
    auth = np.ones(v)
    hub = np.ones(v)
    for _ in range(iterations):
        a = np.zeros(v)
        np.add.at(a, ec.dst_ids, hub[ec.src_ids])
        n = np.linalg.norm(a)
        auth = a / n if n > 0 else a
        h = np.zeros(v)
        np.add.at(h, ec.src_ids, auth[ec.dst_ids])
        n = np.linalg.norm(h)
        hub = h / n if n > 0 else h
    return auth.astype(np.float32), hub.astype(np.float32)
