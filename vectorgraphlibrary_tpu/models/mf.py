"""Maximum flow — Edmonds-Karp (BFS-augmenting Ford-Fulkerson), fully on device.

Capability match for the reference MF (`algorithms/mf/mf.h:10-38`, `mf.hpp`):
the reference drives augmentation with its BFS abstraction (`mf_bfs`,
mf.hpp:5-50) and updates path flow host-side per edge. Here the WHOLE algorithm
is one jitted program over a static residual-arc graph:

- residual structure: 2e arcs (forward copy + backward copy of every edge),
  imported once as a TILE_CSR graph — the structure never changes, only the
  per-arc residual capacities do;
- outer lax.while_loop = augmentations; inner loop 1 = level-synchronous BFS
  over arcs with positive residual, tracking a PARENT ARC per vertex via a
  min-combine advance whose per-edge value is the arc id (masked to BIG where
  residual is exhausted);
- inner loop 2 = the path walk: O(path) scalar steps following parent arcs
  from sink to source, accumulating the bottleneck and an arc mask;
- the residual update is two fused vector ops (subtract along the path, add
  on the reverse arcs) — no CSR rebuild, no host round-trips at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraversalDirection
from ..graph.device import VGLGraph, import_graph
from ..graph.edges import DirectedEdgeValues, _tile_values
from ..io.edges_container import EdgesContainer
from ..ops.advance import advance_pull
from . import common

S, G, O = (TraversalDirection.SCATTER, TraversalDirection.GATHER,
           TraversalDirection.ORIGINAL)
_BIG = jnp.int32(2**30)
_EPS = 1e-6


@functools.partial(jax.jit, static_argnums=(5,))
def _ek_run(g2: VGLGraph, res0, arc_slot_in, arc_src_o, src_sink,
            max_augmentations: int):
    """Device Edmonds-Karp. res0: [2e] residual per arc (COO order);
    arc_slot_in: int32 [e_pad2] arc id per incoming CSR slot (pad = BIG);
    arc_src_o: int32 [2e] ORIGINAL source vertex of each arc."""
    v, v_pad = g2.v, g2.v_pad
    e2 = res0.shape[0]
    source, sink = src_sink
    INF = jnp.iinfo(jnp.int32).max
    sid_g = jnp.take(g2.incoming.orig_to_sorted, source)
    tid_g = jnp.take(g2.incoming.orig_to_sorted, sink)
    rev_idx = jnp.concatenate([jnp.arange(e2 // 2, e2, dtype=jnp.int32),
                               jnp.arange(0, e2 // 2, dtype=jnp.int32)])

    def augment(state):
        res, total, aug, go = state
        # per-arc BFS weights in incoming CSR slot order: arc id where the
        # arc still has residual, BIG otherwise
        res_slot = jnp.take(res, jnp.minimum(arc_slot_in, e2 - 1), mode="clip")
        w_flat = jnp.where((arc_slot_in < e2) & (res_slot > _EPS),
                           arc_slot_in, _BIG)
        ev = _tile_values(jnp.concatenate([w_flat, jnp.array([_BIG])]),
                          g2.incoming)

        levels0 = jnp.full(v_pad, INF, jnp.int32).at[sid_g].set(1)
        parent0 = jnp.full(v_pad, _BIG, jnp.int32)

        def bfs_cond(s):
            levels, parent, cur, grew = s
            return grew & (levels[tid_g] == INF)

        def bfs_body(s):
            levels, parent, cur, _ = s
            on = levels == cur
            cand = advance_pull(g2, {}, lambda sv, dv, w: w, "min",
                                edge_values=ev, src_active=on, direction=G)
            newly = (levels == INF) & (cand < _BIG)
            return (jnp.where(newly, cur + 1, levels),
                    jnp.where(newly, cand, parent),
                    cur + 1, jnp.any(newly))

        levels, parent_g, _, _ = jax.lax.while_loop(
            bfs_cond, bfs_body, (levels0, parent0, jnp.int32(1), True))
        found = levels[tid_g] < INF
        # parent arcs back in ORIGINAL vertex order for the path walk
        parent_o = jnp.take(parent_g, g2.incoming.orig_to_sorted, mode="clip")

        def walk_cond(s):
            u, b, mask = s
            return u != source

        def walk_body(s):
            u, b, mask = s
            arc = jnp.take(parent_o, u)
            b = jnp.minimum(b, jnp.take(res, arc))
            mask = mask.at[arc].set(True)
            return jnp.take(arc_src_o, arc), b, mask

        u0 = jnp.where(found, sink, source)
        _, bottleneck, mask = jax.lax.while_loop(
            walk_cond, walk_body,
            (u0, jnp.float32(jnp.inf), jnp.zeros(e2, bool)))
        bottleneck = jnp.where(found, bottleneck, 0.0)
        delta = bottleneck * mask
        res = res - delta + jnp.take(delta, rev_idx)
        return res, total + bottleneck, aug + 1, found

    def cond(state):
        res, total, aug, go = state
        return go & (aug < max_augmentations)

    _, total, aug, _ = jax.lax.while_loop(
        cond, augment, (res0, jnp.float32(0.0), jnp.int32(0), True))
    return total, aug


def vgl_ford_fulkerson(ec: EdgesContainer, graph: VGLGraph, source: int,
                       sink: int, max_augmentations: int = 10_000) -> float:
    """Edmonds-Karp max flow source→sink; returns the flow value.
    `graph` is unused (kept for the reference-shaped API); the residual-arc
    graph is built here once (cites mf.hpp:5-50 for the BFS split)."""
    v, e = ec.vertices_count, ec.edges_count
    src2 = np.concatenate([ec.src_ids, ec.dst_ids]).astype(np.int32)
    dst2 = np.concatenate([ec.dst_ids, ec.src_ids]).astype(np.int32)
    host = []
    g2 = import_graph(EdgesContainer(src2, dst2, v), _host_out=host,
                      build_route=False, keep_edge_slots=True)
    h_out, h_in = host
    e2 = 2 * e
    # incoming CSR slot -> arc id (static)
    arc_slot_in = np.full(h_in.edges_pad, int(_BIG), np.int64)
    arc_slot_in[:e2] = h_in.edge_perm[:e2]
    res0 = np.concatenate([ec.weights.astype(np.float32),
                           np.zeros(e, np.float32)])
    total, aug = _ek_run(g2, jnp.asarray(res0),
                         jnp.asarray(arc_slot_in, jnp.int32),
                         jnp.asarray(src2),
                         jnp.asarray([source, sink], jnp.int32),
                         max_augmentations)
    return float(total)


def vgl_mf_bfs_levels(ec: EdgesContainer, graph: VGLGraph, flow: np.ndarray,
                      source: int):
    """Device residual-BFS levels for a given flow assignment (the reference's
    standalone mf_bfs surface)."""
    v = ec.vertices_count
    src2 = np.concatenate([ec.src_ids, ec.dst_ids]).astype(np.int32)
    dst2 = np.concatenate([ec.dst_ids, ec.src_ids]).astype(np.int32)
    host = []
    g2 = import_graph(EdgesContainer(src2, dst2, v), _host_out=host,
                      build_route=False, keep_edge_slots=True)
    h_out, h_in = host
    e2 = 2 * ec.edges_count
    arc_slot_in = np.full(h_in.edges_pad, int(_BIG), np.int64)
    arc_slot_in[:e2] = h_in.edge_perm[:e2]
    res = np.concatenate([(ec.weights - flow).astype(np.float32),
                          flow.astype(np.float32)])

    INF = jnp.iinfo(jnp.int32).max
    res_slot = jnp.take(jnp.asarray(res),
                        jnp.minimum(jnp.asarray(arc_slot_in), e2 - 1),
                        mode="clip")
    w_flat = jnp.where((jnp.asarray(arc_slot_in) < e2) & (res_slot > _EPS),
                       jnp.asarray(arc_slot_in, jnp.int32), _BIG)
    ev = _tile_values(jnp.concatenate([w_flat, jnp.array([_BIG])]),
                      g2.incoming)
    sid_g = int(np.asarray(g2.incoming.orig_to_sorted[source]))
    levels = jnp.full(g2.v_pad, INF, jnp.int32).at[sid_g].set(1)
    cur = 1
    while True:
        on = levels == cur
        cand = advance_pull(g2, {}, lambda sv, dv, w: w, "min",
                            edge_values=ev, src_active=on, direction=G)
        newly = (levels == INF) & (cand < _BIG)
        if int(jnp.sum(newly)) == 0:
            break
        levels = jnp.where(newly, cur + 1, levels)
        cur += 1
    out = jnp.take(levels, g2.incoming.orig_to_sorted, mode="clip")
    return np.asarray(out)[:v]


def seq_ford_fulkerson(ec: EdgesContainer, source: int, sink: int) -> float:
    """Oracle via SciPy maximum_flow (integer capacities)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import maximum_flow
    v = ec.vertices_count
    capi = np.maximum(ec.weights.astype(np.int64), 1)
    # dedupe parallel edges by summing capacities
    a = sp.csr_matrix((capi, (ec.src_ids, ec.dst_ids)), shape=(v, v))
    a = sp.csr_matrix(a)                      # sums duplicates
    return float(maximum_flow(a, source, sink).flow_value)
