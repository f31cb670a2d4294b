"""Maximum flow — Edmonds-Karp (BFS-augmenting Ford-Fulkerson).

Capability match for the reference MF (`algorithms/mf/mf.h:10-38`, `mf.hpp`):
VGL-BFS finds an augmenting path on the residual graph (`mf_bfs`, mf.hpp:5-50),
then the path flow update happens host-side via per-edge get/add/subtract on the
EdgesArray — the same split here: the level computation is a device pull over the
residual adjacency (edge weights = residual capacities, rebuilt per augmentation
via edge_array_from_flat), path extraction and flow update are host NumPy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraversalDirection
from ..graph.device import VGLGraph
from ..graph.edges import edge_array_from_flat
from ..io.edges_container import EdgesContainer
from ..ops.advance import advance_pull_fast
from . import common

S, G, O = (TraversalDirection.SCATTER, TraversalDirection.GATHER,
           TraversalDirection.ORIGINAL)


def _host_residual_csr(ec: EdgesContainer):
    """Host residual adjacency: forward slots [0,e), backward slots [e,2e)."""
    v, e = ec.vertices_count, ec.edges_count
    src = np.concatenate([ec.src_ids, ec.dst_ids])
    dst = np.concatenate([ec.dst_ids, ec.src_ids])
    eid = np.arange(2 * e)
    order = np.argsort(src, kind="stable")
    indptr = np.concatenate([[0], np.cumsum(np.bincount(src, minlength=v))])
    return indptr, dst[order], eid[order]


def vgl_ford_fulkerson(ec: EdgesContainer, graph: VGLGraph, source: int,
                       sink: int, max_augmentations: int = 10_000) -> float:
    v, e = ec.vertices_count, ec.edges_count
    cap = ec.weights.astype(np.float64)
    flow = np.zeros(e)
    indptr, nbr, slot = _host_residual_csr(ec)

    total = 0.0
    for _ in range(max_augmentations):
        # residual capacities per direction
        res_fwd = (cap - flow).astype(np.float32)       # along original edges
        res_bwd = flow.astype(np.float32)               # against original edges
        # host BFS (shortest augmenting path, Edmonds-Karp)
        parent_edge = np.full(v, -1, np.int64)
        parent = np.full(v, -1, np.int64)
        parent[source] = source
        frontier = [source]
        found = False
        res_all = np.concatenate([res_fwd, res_bwd])
        while frontier and not found:
            nxt = []
            for u in frontier:
                for i in range(indptr[u], indptr[u + 1]):
                    w = nbr[i]
                    if parent[w] != -1 or res_all[slot[i]] <= 1e-9:
                        continue
                    parent[w] = u
                    parent_edge[w] = slot[i]
                    if w == sink:
                        found = True
                        break
                    nxt.append(w)
                if found:
                    break
            frontier = nxt
        if parent[sink] == -1:
            break
        # extract path, find bottleneck, update flows
        path = []
        u = sink
        while u != source:
            path.append(parent_edge[u])
            u = parent[u]
        bottleneck = min(res_all[s] for s in path)
        for s in path:
            if s < e:
                flow[s] += bottleneck
            else:
                flow[s - e] -= bottleneck
        total += float(bottleneck)
    return total


def vgl_mf_bfs_levels(ec: EdgesContainer, graph: VGLGraph, flow: np.ndarray,
                      source: int):
    """Device residual-BFS levels (the reference's mf_bfs device step): pull over
    incoming with forward residual + pull over outgoing with backward residual."""
    cap = ec.weights
    host = []
    from ..graph.device import import_graph
    # residual weights on the SAME graph structure
    res_fwd = (cap - flow).astype(np.float32)
    res_bwd = flow.astype(np.float32)
    from ..graph.build import build_directed_csr
    h_out = build_directed_csr(ec.src_ids, ec.dst_ids, v := ec.vertices_count)
    h_in = build_directed_csr(ec.dst_ids, ec.src_ids, v)
    from ..graph.edges import build_edge_array_from_host
    ea_f = build_edge_array_from_host(res_fwd, graph, h_out, h_in)
    ea_b = build_edge_array_from_host(res_bwd, graph, h_out, h_in)

    v_pad = graph.v_pad
    INF = jnp.iinfo(jnp.int32).max
    sid = int(np.asarray(graph.incoming.orig_to_sorted[source]))
    levels_o = jnp.full(v_pad, INF, jnp.int32).at[source].set(1)
    cur = 1
    while True:
        lg = common.to_direction(graph, levels_o, O, G)
        on = lg == cur
        fwd = advance_pull_fast(graph, {"m": on},
                                lambda s, d, w: s["m"] & (w > 0), "or",
                                edge_values=ea_f.incoming, direction=G)
        fwd_o = common.to_direction(graph, fwd, G, O)
        ls = common.to_direction(graph, levels_o, O, S)
        on_s = ls == cur
        bwd = advance_pull_fast(graph, {"m": on_s},
                                lambda s, d, w: s["m"] & (w > 0), "or",
                                edge_values=ea_b.outgoing, direction=S)
        bwd_o = common.to_direction(graph, bwd, S, O)
        newly = (levels_o == INF) & (fwd_o | bwd_o)
        if int(jnp.sum(newly)) == 0:
            break
        levels_o = jnp.where(newly, cur + 1, levels_o)
        cur += 1
    return np.asarray(levels_o)[:v]


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
