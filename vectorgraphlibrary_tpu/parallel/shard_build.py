"""Sharded flagship container: destination-range partitioned TILE_CSR.

This is the distributed (and out-of-HBM single-chip) form of the flagship
format — the TPU-native answer to the reference's per-rank VectorCSR slicing
(`vect_csr/vect_csr_graph.h:44-48` MPI thresholds used by
`nec/advance_worker.hpp:239-264`) and to ShardedCSRGraph's dst-range shards
(`sharded_csr_graph/sharded_csr_graph.h:16-40`). Each shard owns a contiguous
ORIGINAL-id destination range and holds its edge set as a full tiled+routed
TILE_CSR subgraph over the whole vertex space, so the SAME routed advance
kernels run per shard unchanged.

The enabling trick is the unified TileLayout (graph/build.py): every shard is
built against the elementwise-max layout, so all shards share identical static
shapes and stack into ONE pytree (leaves [S, ...]). Execution then chooses:
- shard_map over a device mesh axis (one shard per chip, psum/pmin merge) —
  multi-chip;
- lax.scan over the leading axis — sequential shards on one chip, for graphs
  whose single Beneš route would not fit HBM (RMAT-24 scale path).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VGLConfig, DEFAULT_CONFIG, GraphFormat
from ..graph.build import (HostDirectedCSR, TileLayout, build_directed_csr,
                           layout_of, unify_layouts)
from ..graph.device import VGLGraph, _to_device_directed
from ..io.edges_container import EdgesContainer


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << int(np.ceil(np.log2(x)))


def _complete_perm(partial: np.ndarray) -> np.ndarray:
    """Fill -1 entries of a partial permutation bijectively with unused values."""
    n = len(partial)
    used = np.zeros(n, bool)
    used[partial[partial >= 0]] = True
    out = partial.copy()
    holes = np.flatnonzero(partial < 0)
    out[holes] = np.flatnonzero(~used)[:len(holes)]
    return out


def _vertex_perm(h_left: HostDirectedCSR, h_right: HostDirectedCSR,
                 v: int, v_pad: int) -> np.ndarray:
    """perm with left_vals[i] = right_vals[perm[i]] for real vertices; gaps
    completed bijectively (their values are never read — masked rows)."""
    p = np.full(v_pad, -1, np.int64)
    real = h_left.sorted_to_orig < v                       # positions with a vertex
    p[real] = h_right.orig_to_sorted[h_left.sorted_to_orig[real]]
    return _complete_perm(p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedTileGraph:
    """S stacked TILE_CSR shards (leaves [S, ...]) + per-shard edge counts."""

    stacked: VGLGraph                 # every array leaf has leading dim S
    edges_per_shard: jax.Array        # int32 [S]
    n_shards: int = dataclasses.field(metadata=dict(static=True), default=1)
    v: int = dataclasses.field(metadata=dict(static=True), default=0)
    v_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    e: int = dataclasses.field(metadata=dict(static=True), default=0)

    def shard(self, s: int) -> VGLGraph:
        """Host-side view of one shard (for debugging/tests)."""
        return jax.tree.map(lambda a: a[s], self.stacked)


def take_shard(stacked: VGLGraph) -> VGLGraph:
    """Inside shard_map: strip the per-device leading dim (length 1)."""
    return jax.tree.map(lambda a: a[0], stacked)


def import_sharded(ec: EdgesContainer, n_shards: int,
                   cfg: VGLConfig = DEFAULT_CONFIG,
                   _host_out: Optional[list] = None,
                   keep_edge_slots: Optional[bool] = None,
                   slim: bool = False) -> ShardedTileGraph:
    """Partition COO by destination range, build every shard against the
    unified layouts, stack. _host_out receives [(h_out, h_in), ...] per shard
    for weight layout.

    keep_edge_slots: ship per-slot CSR edge indices (needed only to lay out
    EdgeArray weights); defaults to ec.weights is not None, like import_graph.
    slim: strip every leaf the fused value-pull path never reads (adjacency
    tiles, CSR arrays, renumber maps — see slim_value_pull) — the out-of-HBM
    scale path for PR/HITS/BFS/CC, TPU-only (CPU fallbacks need adjacency)."""
    v, e = ec.vertices_count, ec.edges_count
    # hash (mod) destination partitioning: contiguous ranges concentrate
    # power-law RMAT hubs (low original ids) in shard 0, and the unified
    # layout would then size EVERY shard like shard 0 — mod-S spreads the
    # skew so per-shard work actually drops n-fold
    shard_id = ec.dst_ids % n_shards
    selfloop = ec.src_ids == ec.dst_ids

    parts = []
    for s in range(n_shards):
        m = shard_id == s
        parts.append((ec.src_ids[m], ec.dst_ids[m], selfloop[m]))

    # pass 1: natural layouts per shard per direction → unified layouts
    louts, lins = [], []
    for src_s, dst_s, _ in parts:
        louts.append(layout_of(np.bincount(src_s, minlength=v), cfg))
        lins.append(layout_of(np.bincount(dst_s, minlength=v), cfg))
    L_out, L_in = unify_layouts(louts), unify_layouts(lins)
    v_pad = max(_next_pow2(max(L_out.total_rows, L_in.total_rows, v)), 1024)
    e_pad = max(8 * ((max(len(p[0]) for p in parts) + 7) // 8), 8)

    # pass 2: per-shard builds under the unified static shapes
    from ..graph.route_build import build_advance_route
    from ..ops.route import make_route_plan
    graphs: List[VGLGraph] = []
    for src_s, dst_s, sl_s in parts:
        h_out = build_directed_csr(src_s, dst_s, v, cfg, layout=L_out,
                                   v_pad=v_pad)
        h_in = build_directed_csr(dst_s, src_s, v, cfg, layout=L_in,
                                  v_pad=v_pad)
        _pad_edges(h_out, e_pad)
        _pad_edges(h_in, e_pad)
        route, out_slots, in_slots = build_advance_route(
            h_out, h_in, selfloop_edges=sl_s)
        vroute = make_route_plan(_vertex_perm(h_out, h_in, v, v_pad))
        vroute_so = make_route_plan(_complete_perm(np.where(
            h_out.sorted_to_orig < v, h_out.sorted_to_orig, -1).astype(np.int64)))
        vroute_go = make_route_plan(_complete_perm(np.where(
            h_in.sorted_to_orig < v, h_in.sorted_to_orig, -1).astype(np.int64)))
        if _host_out is not None:
            _host_out.append((h_out, h_in))
        with_eidx = (ec.weights is not None if keep_edge_slots is None
                     else keep_edge_slots)
        g = VGLGraph(
            outgoing=_to_device_directed(h_out, e_static=e_pad,
                                         with_eidx=with_eidx),
            incoming=_to_device_directed(h_in, e_static=e_pad,
                                         with_eidx=with_eidx),
            advance_route=route, vertex_route_s_from_g=vroute,
            vertex_route_s_from_o=vroute_so, vertex_route_g_from_o=vroute_go,
            v=v, v_pad=v_pad, e=e_pad, out_slots=out_slots, in_slots=in_slots,
            graph_format=GraphFormat.SHARDED_CSR)
        graphs.append(slim_value_pull(g) if slim else g)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
    return ShardedTileGraph(
        stacked=stacked,
        edges_per_shard=jnp.asarray([len(p[0]) for p in parts], jnp.int32),
        n_shards=n_shards, v=v, v_pad=v_pad, e=e)


def slim_value_pull(g: VGLGraph) -> VGLGraph:
    """Strip every array the fused value-pull path (advance_pull_value with
    route+flags, routed reorders) never reads: CSR arrays, renumber maps,
    adjacency/eidx tiles. Keeps routes + huge seg_ids + static tile metadata.
    ~3x less HBM per shard — the difference between RMAT-24 fitting one v5e
    chip and not. TPU-only: the CPU gather fallbacks need the stripped leaves
    (tests cover slim under VGL_PALLAS_INTERPRET=1, which forces the fused
    path on CPU)."""
    def slim_dir(dg: "DeviceDirectedGraph"):
        return dataclasses.replace(
            dg, row_ptr=None, col_idx=None, degrees=None,
            sorted_to_orig=None, orig_to_sorted=None,
            buckets=tuple(dataclasses.replace(b, adj=None, eidx=None)
                          for b in dg.buckets),
            huge=(None if dg.huge is None
                  else dataclasses.replace(dg.huge, adj=None, eidx=None)))
    return dataclasses.replace(g, outgoing=slim_dir(g.outgoing),
                               incoming=slim_dir(g.incoming))


def estimated_shard_slots(ec: EdgesContainer, n_shards: int,
                          cfg: VGLConfig = DEFAULT_CONFIG) -> int:
    """Max per-shard route size n (pow2 slot count) WITHOUT building anything —
    pick n_shards so this stays ≤ 2^28 before paying the route build
    (route_fused caps at 2^29; 2^28 leaves HBM headroom for the plan words)."""
    v = ec.vertices_count
    shard_id = ec.dst_ids % n_shards
    worst = 0
    for s in range(n_shards):
        m = shard_id == s
        for deg in (np.bincount(ec.src_ids[m], minlength=v),
                    np.bincount(ec.dst_ids[m], minlength=v)):
            lay = layout_of(deg, cfg)
            slots = (lay.huge_chunks_pad * lay.huge_chunk_w
                     + sum(w * rp for w, rp in lay.buckets))
            worst = max(worst, _next_pow2(max(slots, 256)))
    return worst


def _pad_edges(h: HostDirectedCSR, e_pad: int) -> None:
    """Grow a shard's edge arrays to the unified e_pad (static uniformity)."""
    if h.edges_pad == e_pad:
        return
    assert e_pad > h.edges_pad
    grow = e_pad - h.edges_pad
    h.col_idx = np.concatenate(
        [h.col_idx, np.full(grow, h.vertices_pad, np.int32)])
    h.edge_perm = np.concatenate(
        [h.edge_perm, np.full(grow, e_pad, np.int64)])
    h.edges_pad = e_pad


def shard_edge_values(coo_values: np.ndarray, sg: ShardedTileGraph,
                      ec: EdgesContainer, hosts: List[Tuple],
                      pad_value=0):
    """Per-shard EdgeArrays (stacked) for COO-ordered edge values."""
    from ..graph.edges import build_edge_array_from_host
    shard_id = ec.dst_ids % sg.n_shards
    arrays = []
    for s in range(sg.n_shards):
        m = shard_id == s
        g = sg.shard(s)
        h_out, h_in = hosts[s]
        arrays.append(build_edge_array_from_host(coo_values[m], g, h_out, h_in,
                                                 pad_value=pad_value))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *arrays)
