"""Advance: edge traversal — the framework's hot path.

TPU-native re-design of the reference's scatter/gather advance
(`vgl_compute_api/common/advance.hpp:6-232` dispatching into the 9-kernel NEC worker
`nec/advance_worker.hpp:219-361`). The kernel-per-degree-class structure survives —
huge rows (vector-engine analog), wide ELL buckets, and flat lane-major narrow
buckets (the VectorExtension analog; see graph/device.py TileBucket) — and push with
a conflicting combine becomes either (a) a pull over the transposed container or
(b) a compacted-frontier ragged-expand + functional scatter-combine, replacing
`vovertake/novob` vector stores and `enable_safe_stores`
(`nec/graph_abstractions_nec.h:332-333`).

Three execution strategies:
- advance_pull: gather-based (general, XLA element gathers — slow on TPU, used for
  one-shot/prologue computations and as the differential-testing reference);
- advance_pull_routed: gather-FREE hot path — broadcast per-source messages over
  the source tiles, Beneš-route them into destination slot order (ops/route.py),
  masked grouped row-reduction. ~100x the gather path on TPU;
- advance_push_sparse: work-efficient compacted-frontier expansion + scatter.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

# int8 payloads for bool pulls: measured 2.0x faster on v5e (scale-20 or-pull
# 5.4 ms vs 10.9 ms int32 — route traffic is 1 B/slot instead of 4, kernels
# compute in int32 after a VMEM-local cast). VGL_BOOL_I8=0 reverts.
_BOOL_I8 = bool(int(os.environ.get("VGL_BOOL_I8", "1")))

from ..config import TraversalDirection
from ..graph.device import DeviceDirectedGraph, HugeTile, VGLGraph
from ..graph.edges import DirectedEdgeValues
from . import monoid as M
from . import tiles as T

# gather-path edge_op(src_vals: Dict[str, Array[rows, W]],
#                     dst_vals: Dict[str, Array[rows, 1]],
#                     w: Optional[Array[rows, W]]) -> Array[rows, W]
EdgeOp = Callable


def _gather_src(arrs: Dict[str, jax.Array], adj: jax.Array) -> Dict[str, jax.Array]:
    return {k: jnp.take(a, adj, axis=0, mode="clip") for k, a in arrs.items()}


def _ext_tail(a: jax.Array, extra: int = 128) -> jax.Array:
    """Append `extra` zero slots so tile row slices can overrun v_pad.

    dynamic_slice CLAMPS out-of-bounds starts: a tail bucket whose rows_pad
    padding extends past v_pad would silently read values shifted backwards
    (rows_pad is rounded to the flat-lane multiple, up to 127 rows past the
    last real row). The padded slots themselves are masked downstream (adj
    sentinel / valid flag), only the slice base must stay in bounds."""
    return jnp.concatenate([a, jnp.zeros((extra,), a.dtype)])


def _dst_slice(arrs: Dict[str, jax.Array], start: int, rows_pad: int
               ) -> Dict[str, jax.Array]:
    return {k: jax.lax.dynamic_slice_in_dim(
                _ext_tail(a), start, rows_pad, axis=0)[:, None]
            for k, a in arrs.items()}


def _assemble(parts, covered, v_pad, ident, dtype):
    if covered < v_pad:
        parts.append(jnp.full((v_pad - covered,), ident, dtype=dtype))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _slot_rows(dg: DeviceDirectedGraph) -> jax.Array:
    """Owning row (sorted vertex id) of each CSR edge slot; pad slots → v_pad."""
    slots = jnp.arange(dg.e_pad, dtype=jnp.int32)
    return jnp.searchsorted(dg.row_ptr[1:], slots, side="right").astype(
        jnp.int32)


def _advance_pull_csr(graph: VGLGraph, src_arrays, edge_op, combine,
                      dst_arrays, edge_values, src_active, direction,
                      out_dtype, scatter: bool) -> jax.Array:
    """Advance over the plain CSR / EDGES_LIST containers (reference 4-way
    container switch, common/advance.hpp:32-111): edge-parallel gather of
    source values over col_idx, then either a SORTED segment reduction over
    row_ptr-derived rows (CSR) or a functional scatter-combine (EDGES_LIST —
    the TPU-safe stand-in for the reference's flat COO scatter stores)."""
    mon = M.get(combine)
    dg = graph.direction(direction)
    dst_arrays = dst_arrays or {}
    rows = _slot_rows(dg)
    sv = {k: jnp.take(a, dg.col_idx, mode="clip")[:, None]
          for k, a in src_arrays.items()}
    dv = {k: jnp.take(a, rows, mode="clip")[:, None]
          for k, a in dst_arrays.items()}
    w = None if edge_values is None else edge_values.flat[:, None]
    probe_w = None if w is None else w[:1]
    probe = edge_op({k: a[:1] for k, a in sv.items()},
                    {k: a[:1] for k, a in dv.items()}, probe_w)
    dtype = out_dtype or probe.dtype
    ident = mon.identity(dtype)
    msg = edge_op(sv, dv, w).astype(dtype)[:, 0]
    valid = dg.col_idx < dg.v_pad
    if src_active is not None:
        valid = valid & jnp.take(src_active, dg.col_idx, mode="clip")
    if scatter:
        out = jnp.full((graph.v_pad,), ident, dtype)
        idx = jnp.where(valid, rows, graph.v_pad)
        return mon.scatter_at(out, idx, jnp.where(valid, msg, ident),
                              mode="drop")
    msg = jnp.where(valid, msg, ident)
    seg = jnp.minimum(rows, graph.v_pad)
    return mon.segment_reduce(msg, seg, graph.v_pad + 1,
                              indices_are_sorted=True)[:graph.v_pad]


def advance_pull(graph: VGLGraph,
                 src_arrays: Dict[str, jax.Array],
                 edge_op: EdgeOp,
                 combine,
                 dst_arrays: Optional[Dict[str, jax.Array]] = None,
                 edge_values: Optional[DirectedEdgeValues] = None,
                 src_active: Optional[jax.Array] = None,
                 direction: TraversalDirection = TraversalDirection.GATHER,
                 out_dtype=None) -> jax.Array:
    """Gather-based aggregate over incoming edges of every vertex (gather-mode
    advance, reference common_gather advance.hpp:116-123). Returns [v_pad] in the
    traversal direction's sorted ordering; zero-degree/padded rows get the monoid
    identity. src_arrays: per-src-vertex inputs, [v_pad], same ordering.

    Container dispatch (the reference's advance.hpp:32-111 switch): TILE_CSR /
    CSR_VG run the tiled kernels below; CSR runs the edge-parallel sorted
    segment reduction; EDGES_LIST the edge-parallel scatter-combine."""
    from ..config import GraphFormat
    if graph.graph_format == GraphFormat.CSR:
        return _advance_pull_csr(graph, src_arrays, edge_op, combine,
                                 dst_arrays, edge_values, src_active,
                                 direction, out_dtype, scatter=False)
    if graph.graph_format == GraphFormat.EDGES_LIST:
        return _advance_pull_csr(graph, src_arrays, edge_op, combine,
                                 dst_arrays, edge_values, src_active,
                                 direction, out_dtype, scatter=True)
    mon = M.get(combine)
    dg = graph.direction(direction)
    dst_arrays = dst_arrays or {}

    probe_src = {k: v[:1, None] for k, v in src_arrays.items()}
    probe_dst = {k: v[:1, None] for k, v in dst_arrays.items()}
    probe_w = None if edge_values is None else edge_values.flat[:1][:, None]
    probe = edge_op(probe_src, probe_dst, probe_w)
    dtype = out_dtype or probe.dtype
    ident = mon.identity(dtype)

    parts = []
    covered = 0

    if dg.huge is not None:
        h = dg.huge
        sv = _gather_src(src_arrays, h.adj)
        dvals = {k: jnp.take(a, h.seg_ids, mode="clip")[:, None]
                 for k, a in dst_arrays.items()}
        w = None if edge_values is None else edge_values.huge_tile
        msg = edge_op(sv, dvals, w).astype(dtype)
        valid = h.adj < dg.v_pad
        if src_active is not None:
            valid = valid & jnp.take(src_active, h.adj, mode="clip")
        msg = jnp.where(valid, msg, ident)
        chunk_red = mon.reduce_axis(msg, 1)
        seg = mon.segment_reduce(chunk_red, h.seg_ids, h.n_rows + 1,
                                 indices_are_sorted=True)
        parts.append(seg[:h.n_rows])
        covered = h.n_rows

    for i, b in enumerate(dg.buckets):
        sv = _gather_src(src_arrays, b.adj)
        w = None if edge_values is None else edge_values.bucket_tiles[i]
        if b.flat:
            m = b.slots // 128
            rowids = T.row_ids_flat(b.row_start, b.width, m)
            dvals = {k: jnp.take(a, rowids, mode="clip")
                     for k, a in dst_arrays.items()}
        else:
            dvals = _dst_slice(dst_arrays, b.row_start, b.rows_pad)
        msg = edge_op(sv, dvals, w).astype(dtype)
        valid = b.adj < dg.v_pad
        if src_active is not None:
            valid = valid & jnp.take(src_active, b.adj, mode="clip")
        msg = jnp.where(valid, msg, ident)
        if b.flat:
            parts.append(T.group_reduce_flat(msg, b.width, mon, b.rows))
        else:
            parts.append(mon.reduce_axis(msg, 1)[:b.rows])
        covered = b.row_start + b.rows

    return _assemble(parts, covered, graph.v_pad, ident, dtype)


def _broadcast_over_tiles(dg: DeviceDirectedGraph, src_vec: jax.Array,
                          total_slots: int, n: int) -> jax.Array:
    """Generate per-edge-slot messages by broadcasting src_vec over the
    source-side tiles — row identity, no per-element gathers."""
    parts = []
    if dg.huge is not None:
        h = dg.huge
        seg_vals = jnp.take(src_vec, h.seg_ids, mode="clip")
        parts.append(jnp.broadcast_to(seg_vals[:, None],
                                      (h.n_chunks_pad, h.chunk_w)).ravel())
    src_ext = _ext_tail(src_vec)
    for b in dg.buckets:
        rows = jax.lax.dynamic_slice_in_dim(src_ext, b.row_start, b.rows_pad)
        if b.flat:
            parts.append(T.broadcast_rows_flat(rows, b.width,
                                               b.slots // 128).ravel())
        else:
            parts.append(jnp.broadcast_to(rows[:, None],
                                          (b.rows_pad, b.width)).ravel())
    flat = jnp.concatenate(parts) if parts else jnp.zeros((0,), src_vec.dtype)
    if flat.shape[0] < n:
        flat = jnp.concatenate([
            flat, jnp.zeros((n - flat.shape[0],), src_vec.dtype)])
    return flat


# routed edge_op(vals, src_ids, dst_ids, w) -> msg; all tiles of identical shape
def advance_pull_routed(graph: VGLGraph,
                        src_vec: jax.Array,
                        edge_op,
                        combine,
                        edge_values: Optional[DirectedEdgeValues] = None,
                        src_active: Optional[jax.Array] = None,
                        direction: TraversalDirection = TraversalDirection.GATHER,
                        out_dtype=None) -> jax.Array:
    """Gather-free advance: broadcast per-source messages over the source-side
    tiles, Beneš-route them into destination-tile slot order, reduce per
    destination row. src_vec is in the SOURCE side's sorted ordering (SCATTER when
    direction=GATHER and vice versa); the result is in the DESTINATION side's.

    edge_op(vals, src_ids, dst_ids, w): vals = routed per-edge source values;
    src_ids = adjacency tile (destination-side sorted ids of sources); dst_ids =
    owning row ids (computed, no gather); w = optional edge values."""
    from .route import apply_route
    mon = M.get(combine)
    assert graph.advance_route is not None, "graph imported without route"
    if direction == TraversalDirection.GATHER:
        src_dg, dst_dg = graph.outgoing, graph.incoming
        inverse = False
    else:
        src_dg, dst_dg = graph.incoming, graph.outgoing
        inverse = True
    plan = graph.advance_route
    n = plan.n

    if src_active is not None:
        # inactive sources carry the combine's absorbing value (edge ops used by
        # the algorithms preserve it: linear in vals for add/or, monotone for
        # min/max)
        src_vec = jnp.where(src_active, src_vec,
                            jnp.array(_mask_value(mon, src_vec.dtype),
                                      src_vec.dtype))

    msgs = _broadcast_over_tiles(src_dg, src_vec, 0, n)
    routed = apply_route(plan, msgs, inverse=inverse)
    # materialize: the routed array feeds one slice per destination tile; without
    # a barrier XLA re-fuses (re-computes) the whole exchange chain into every
    # consumer (measured 5x slowdown)
    routed = jax.lax.optimization_barrier(routed)

    probe = edge_op(routed[:1][:, None], dst_dg.col_idx[:1][:, None],
                    dst_dg.col_idx[:1][:, None],
                    None if edge_values is None
                    else edge_values.flat[:1][:, None])
    dtype = out_dtype or probe.dtype
    ident = mon.identity(dtype)

    parts = []
    covered = 0
    offset = 0
    if dst_dg.huge is not None:
        h = dst_dg.huge
        size = h.n_chunks_pad * h.chunk_w
        vals = jax.lax.dynamic_slice_in_dim(routed, offset, size).reshape(
            h.n_chunks_pad, h.chunk_w)
        offset += size
        dst_ids = jnp.broadcast_to(h.seg_ids[:, None],
                                   (h.n_chunks_pad, h.chunk_w))
        w = None if edge_values is None else edge_values.huge_tile
        msg = edge_op(vals, h.adj, dst_ids, w).astype(dtype)
        msg = jnp.where(h.adj < dst_dg.v_pad, msg, ident)
        chunk_red = mon.reduce_axis(msg, 1)
        seg = mon.segment_reduce(chunk_red, h.seg_ids, h.n_rows + 1,
                                 indices_are_sorted=True)
        parts.append(seg[:h.n_rows])
        covered = h.n_rows
    for i, b in enumerate(dst_dg.buckets):
        size = b.slots
        vals = jax.lax.dynamic_slice_in_dim(routed, offset, size).reshape(
            b.adj.shape)
        offset += size
        w = None if edge_values is None else edge_values.bucket_tiles[i]
        if b.flat:
            m = size // 128
            dst_ids = T.row_ids_flat(b.row_start, b.width, m)
        else:
            dst_ids = b.row_start + jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (b.rows_pad, 1), 0),
                (b.rows_pad, b.width))
        msg = edge_op(vals, b.adj, dst_ids, w).astype(dtype)
        msg = jnp.where(b.adj < dst_dg.v_pad, msg, ident)
        if b.flat:
            parts.append(T.group_reduce_flat(msg, b.width, mon, b.rows))
        else:
            parts.append(mon.reduce_axis(msg, 1)[:b.rows])
        covered = b.row_start + b.rows
    return _assemble(parts, covered, graph.v_pad, ident, dtype)


def _dst_tile_vals(dst_dg: DeviceDirectedGraph, arrs: Dict[str, jax.Array],
                   tile) -> Dict[str, jax.Array]:
    """Per-dst-vertex values expanded to a tile's slot shape WITHOUT element
    gathers: row slices + broadcasts (flat buckets via the group matmul)."""
    out = {}
    for k, a in arrs.items():
        if isinstance(tile, HugeTile):
            out[k] = jnp.take(a, tile.seg_ids, mode="clip")[:, None]
        elif tile.flat:
            rows = jax.lax.dynamic_slice_in_dim(_ext_tail(a), tile.row_start,
                                                tile.rows_pad)
            out[k] = T.broadcast_rows_flat(rows, tile.width, tile.slots // 128)
        else:
            rows = jax.lax.dynamic_slice_in_dim(_ext_tail(a), tile.row_start,
                                                tile.rows_pad)
            out[k] = jnp.broadcast_to(rows[:, None], (tile.rows_pad, tile.width))
    return out


def advance_pull_fast(graph: VGLGraph,
                      src_arrays: Dict[str, jax.Array],
                      edge_op: EdgeOp,
                      combine,
                      dst_arrays: Optional[Dict[str, jax.Array]] = None,
                      edge_values: Optional[DirectedEdgeValues] = None,
                      src_active: Optional[jax.Array] = None,
                      direction: TraversalDirection = TraversalDirection.GATHER,
                      out_dtype=None) -> jax.Array:
    """Drop-in replacement for `advance_pull` (same contract: arrays in the
    traversal direction's ordering, result [v_pad] in that ordering) that
    executes gather-FREE when the graph carries routes: each src array is
    vertex-routed to the source side's ordering, broadcast over the source
    tiles, Beneš-routed to destination slot order; dst arrays are row-slice
    broadcasts; src_active is routed and applied after the edge op (exact
    semantics, unlike the absorbing-value trick). Falls back to the gather
    path when the graph has no route (XLA element gathers, ~0.1 G/s on TPU —
    three orders of magnitude slower than the routed path)."""
    from .route import apply_route, routed_backend
    if (graph.advance_route is None or graph.vertex_route_s_from_g is None
            or not routed_backend()):
        # CPU hosts (dryruns, virtual meshes): the single gather beats the
        # multi-stage Beneš exchange — mirror reorder()'s backend gate
        return advance_pull(graph, src_arrays, edge_op, combine,
                            dst_arrays=dst_arrays, edge_values=edge_values,
                            src_active=src_active, direction=direction,
                            out_dtype=out_dtype)
    mon = M.get(combine)
    dst_arrays = dst_arrays or {}
    plan = graph.advance_route
    vplan = graph.vertex_route_s_from_g
    n = plan.n
    if direction == TraversalDirection.GATHER:
        src_dg, dst_dg = graph.outgoing, graph.incoming
        inverse = False
        to_src_order = lambda a: apply_route(vplan, a)           # G -> S
    else:
        src_dg, dst_dg = graph.incoming, graph.outgoing
        inverse = True
        to_src_order = lambda a: apply_route(vplan, a, inverse=True)  # S -> G

    routed = {}
    for k, a in src_arrays.items():
        msgs = _broadcast_over_tiles(src_dg, to_src_order(a), 0, n)
        routed[k] = jax.lax.optimization_barrier(
            apply_route(plan, msgs, inverse=inverse))
    routed_active = None
    if src_active is not None:
        am = _broadcast_over_tiles(src_dg, to_src_order(src_active), 0, n)
        routed_active = jax.lax.optimization_barrier(
            apply_route(plan, am, inverse=inverse))

    probe = edge_op({k: v[:1][:, None] for k, v in routed.items()},
                    {k: v[:1][:, None] for k, v in dst_arrays.items()},
                    None if edge_values is None
                    else edge_values.flat[:1][:, None])
    dtype = out_dtype or probe.dtype
    ident = mon.identity(dtype)

    def consume(tile, offset, w):
        if isinstance(tile, HugeTile):
            shape = (tile.n_chunks_pad, tile.chunk_w)
        else:
            shape = tile.adj.shape
        size = shape[0] * shape[1]
        sv = {k: jax.lax.dynamic_slice_in_dim(v, offset, size).reshape(shape)
              for k, v in routed.items()}
        dv = _dst_tile_vals(dst_dg, dst_arrays, tile)
        msg = edge_op(sv, dv, w).astype(dtype)
        valid = tile.adj < dst_dg.v_pad
        if routed_active is not None:
            act = jax.lax.dynamic_slice_in_dim(
                routed_active, offset, size).reshape(shape)
            valid = valid & act
        return jnp.where(valid, msg, ident), offset + size

    parts = []
    covered = 0
    offset = 0
    if dst_dg.huge is not None:
        h = dst_dg.huge
        w = None if edge_values is None else edge_values.huge_tile
        msg, offset = consume(h, offset, w)
        chunk_red = mon.reduce_axis(msg, 1)
        seg = mon.segment_reduce(chunk_red, h.seg_ids, h.n_rows + 1,
                                 indices_are_sorted=True)
        parts.append(seg[:h.n_rows])
        covered = h.n_rows
    for i, b in enumerate(dst_dg.buckets):
        w = None if edge_values is None else edge_values.bucket_tiles[i]
        msg, offset = consume(b, offset, w)
        if b.flat:
            parts.append(T.group_reduce_flat(msg, b.width, mon, b.rows))
        else:
            parts.append(mon.reduce_axis(msg, 1)[:b.rows])
        covered = b.row_start + b.rows
    return _assemble(parts, covered, graph.v_pad, ident, dtype)


def _reduce_dst_tiles(dst_dg: DeviceDirectedGraph, finished: jax.Array,
                      mon, dtype, v_pad_out: int, ident) -> jax.Array:
    """Per-destination-row reduction over PRE-MASKED route output: `finished`
    already carries the monoid identity in every non-edge slot (the fused
    finish epilogue), so — unlike the advance_pull_routed consume path — no
    adjacency tile is ever read."""
    parts = []
    covered = 0
    offset = 0
    if dst_dg.huge is not None:
        h = dst_dg.huge
        size = h.n_chunks_pad * h.chunk_w
        vals = jax.lax.dynamic_slice_in_dim(finished, offset, size).reshape(
            h.n_chunks_pad, h.chunk_w)
        offset += size
        chunk_red = mon.reduce_axis(vals, 1)
        seg = mon.segment_reduce(chunk_red, h.seg_ids, h.n_rows + 1,
                                 indices_are_sorted=True)
        parts.append(seg[:h.n_rows])
        covered = h.n_rows
    for b in dst_dg.buckets:
        # shape from static metadata, NOT b.adj: slim (value-pull-only) shards
        # ship no adjacency tiles at all
        shape = ((b.slots // 128, 128) if b.flat else (b.rows_pad, b.width))
        vals = jax.lax.dynamic_slice_in_dim(finished, offset, b.slots).reshape(
            shape)
        offset += b.slots
        if b.flat:
            parts.append(T.group_reduce_flat(vals, b.width, mon, b.rows))
        else:
            parts.append(mon.reduce_axis(vals, 1)[:b.rows])
        covered = b.row_start + b.rows
    return _assemble(parts, covered, v_pad_out, ident, dtype)


def advance_pull_value(graph: VGLGraph,
                       src_vec: jax.Array,
                       combine,
                       edge_values: Optional[DirectedEdgeValues] = None,
                       weight_op: Optional[str] = None,
                       exclude_self_loops: bool = False,
                       src_active: Optional[jax.Array] = None,
                       direction: TraversalDirection = TraversalDirection.GATHER,
                       out_dtype=None,
                       src_in_src_order: bool = False,
                       return_slots: bool = False) -> jax.Array:
    """Restricted-form fast advance — the speed-of-light path for the hot
    algorithms. Per-edge message = ``weight_op(src_value, edge_value)`` (or the
    raw src value), masked to the combine identity on non-edge slots and,
    optionally, self-loop slots. Covers PR (add, no self-loops), BFS bottom-up
    (or), CC hook (min), HITS (add), SSSP pull (min of value+w), SSWP (max of
    min(value, w)).

    Same contract as advance_pull/advance_pull_fast: ``src_vec`` [v_pad] in the
    traversal direction's ordering, result [v_pad] in that ordering. On TPU the
    epilogue fuses into the route's last Pallas kernel via the plan's static
    flag bits (route_fused.FinishSpec) — the reduction then never reads
    adjacency; on hosts without the fused plan it lowers to the equivalent
    general edge_op through advance_pull_fast/advance_pull.

    src_in_src_order=True: ``src_vec`` is already in the SOURCE side's sorted
    ordering (SCATTER when direction=GATHER and vice versa) — skips the
    input's vertex route. Lets ping-pong algorithms (HITS auth/hub) keep state
    in the orderings each phase produces/consumes and pay ZERO per-iteration
    reorders (the reference pays change_traversal_direction each phase,
    hits.hpp:5-176).

    return_slots=True (fused-route path only): skip the per-row reduction and
    return the PRE-MASKED routed slot values flat [plan.n] in destination
    tile-slot order (huge chunks row-major, then each bucket row-major; non-
    edge slots hold the combine identity). This is the no-reduce advance —
    neighborhood computations that are not monoids (label-propagation's mode)
    read their messages at route speed instead of via element gathers."""
    from .route import apply_route, routed_backend
    from .pallas import route_fused
    mon = M.get(combine)
    plan = graph.advance_route
    vplan = graph.vertex_route_s_from_g
    fused_ok = (plan is not None and vplan is not None
                and getattr(plan, "has_flags", False)
                and plan.mid_words is not None
                and (jax.default_backend() in ("tpu", "axon")
                     or route_fused._INTERPRET))
    if weight_op is not None:
        if edge_values is None or edge_values.slot_flat is None:
            # e.g. device-rebuilt edge arrays (MF residuals) lack the
            # slot-ordered copy — use the generic path
            fused_ok = False
        # absorbing-value src_active masking must survive the weight combine
        assert src_active is None or mon.name in ("min", "max") \
            or weight_op == "mul", (mon.name, weight_op)

    if not fused_ok:
        assert not return_slots, "return_slots requires the fused route path"
        if src_in_src_order:
            # the generic paths expect direction-ordered inputs: convert back
            # (costs the route this flag elides — correctness-only fallback)
            from ..models import common as _mc
            src_side = (TraversalDirection.SCATTER
                        if direction == TraversalDirection.GATHER
                        else TraversalDirection.GATHER)
            src_vec = _mc.to_direction(graph, src_vec, src_side, direction)
            if src_active is not None:
                src_active = _mc.to_direction(graph, src_active, src_side,
                                              direction)
        # generic-edge-op fallback (gather path on CPU, routed on TPU w/o flags)
        wops = {None: lambda x, w: x, "add": lambda x, w: x + w,
                "min": jnp.minimum, "max": jnp.maximum, "mul": jnp.multiply}
        wop = wops[weight_op]
        srcs = {"x": src_vec}
        dsts = {}
        if exclude_self_loops:
            ids = jnp.arange(graph.v_pad, dtype=jnp.int32)
            srcs["id"] = ids
            dsts["id"] = ids

        def edge_op(s, d, w):
            x = wop(s["x"], w) if weight_op is not None else s["x"]
            if exclude_self_loops:
                ident = _mask_value(mon, x.dtype)
                x = jnp.where(s["id"] == d["id"], jnp.asarray(ident, x.dtype), x)
            return x

        return advance_pull_fast(graph, srcs, edge_op, combine,
                                 dst_arrays=dsts, edge_values=edge_values,
                                 src_active=src_active, direction=direction,
                                 out_dtype=out_dtype)

    if direction == TraversalDirection.GATHER:
        src_dg, dst_dg = graph.outgoing, graph.incoming
        inverse = False
        to_src_order = lambda a: apply_route(vplan, a)           # G -> S
    else:
        src_dg, dst_dg = graph.incoming, graph.outgoing
        inverse = True
        to_src_order = lambda a: apply_route(vplan, a, inverse=True)
    if src_in_src_order:
        to_src_order = lambda a: a

    weights = edge_values.slot_flat if weight_op is not None else None
    is_bool = src_vec.dtype == jnp.bool_
    if is_bool:
        # bool pulls (BFS bottom-up "or") ride the route as int8: 1 B/slot of
        # HBM instead of 4 (kernels cast to int32 in VMEM, so only the
        # memory-bound loads/stores shrink) — measured 2.0x on v5e
        src_vec = src_vec.astype(jnp.int8 if _BOOL_I8 else jnp.int32)
        if mon.name == "or":
            mon = M.get("any01")        # or over {0,1} == max, identity 0
    dtype = out_dtype or (jnp.result_type(src_vec.dtype, weights.dtype)
                          if weights is not None else src_vec.dtype)
    src_vec = src_vec.astype(dtype)
    assert jnp.dtype(dtype).itemsize in (1, 4), dtype
    # bool-or runs as max over {0,1} int32: the mask/empty-row identity must
    # stay 0 (int32's max-identity would cast back to True)
    ident = 0 if is_bool else _mask_value(mon, dtype)
    if src_active is not None:
        src_vec = jnp.where(src_active, src_vec, jnp.asarray(ident, dtype))

    msgs = _broadcast_over_tiles(src_dg, to_src_order(src_vec), 0, plan.n)
    finish = route_fused.FinishSpec(ident=ident,
                                    exclude_self_loops=exclude_self_loops,
                                    weight_op=weight_op)
    routed = route_fused.apply_route_fused(plan, msgs, inverse=inverse,
                                           finish=finish, weights=weights)
    if return_slots:
        return routed
    out = _reduce_dst_tiles(dst_dg, routed, mon, dtype, graph.v_pad,
                            jnp.asarray(ident, dtype))
    if is_bool:
        # strictly-positive test, NOT astype(bool): rows with no tile chunks
        # (sharded-layout gaps) come out of segment_max as int32 min, which
        # would cast to True
        out = out > 0
    return out


def advance_cells(graph: VGLGraph,
                  cell_op,
                  combine,
                  edge_values: Optional[DirectedEdgeValues] = None,
                  direction: TraversalDirection = TraversalDirection.GATHER,
                  out_dtype=None) -> jax.Array:
    """Per-destination reduction over adjacency cells WITHOUT source values:
    msg = cell_op(src_ids, dst_ids, w). One pass over the tiles — for structural
    quantities (self-loop counts, filtered degrees)."""
    from ..config import GraphFormat
    mon = M.get(combine)
    dg = graph.direction(direction)
    if graph.graph_format in (GraphFormat.CSR, GraphFormat.EDGES_LIST):
        rows = _slot_rows(dg)
        w = None if edge_values is None else edge_values.flat[:, None]
        probe = cell_op(dg.col_idx[:1][:, None], rows[:1][:, None],
                        None if w is None else w[:1])
        dtype = out_dtype or probe.dtype
        ident = mon.identity(dtype)
        msg = cell_op(dg.col_idx[:, None], rows[:, None], w).astype(dtype)[:, 0]
        msg = jnp.where(dg.col_idx < dg.v_pad, msg, ident)
        seg = jnp.minimum(rows, graph.v_pad)
        return mon.segment_reduce(msg, seg, graph.v_pad + 1,
                                  indices_are_sorted=True)[:graph.v_pad]
    probe = cell_op(dg.col_idx[:1][:, None], dg.col_idx[:1][:, None],
                    None if edge_values is None
                    else edge_values.flat[:1][:, None])
    dtype = out_dtype or probe.dtype
    ident = mon.identity(dtype)
    parts = []
    covered = 0
    if dg.huge is not None:
        h = dg.huge
        dst_ids = jnp.broadcast_to(h.seg_ids[:, None],
                                   (h.n_chunks_pad, h.chunk_w))
        w = None if edge_values is None else edge_values.huge_tile
        msg = cell_op(h.adj, dst_ids, w).astype(dtype)
        msg = jnp.where(h.adj < dg.v_pad, msg, ident)
        chunk_red = mon.reduce_axis(msg, 1)
        seg = mon.segment_reduce(chunk_red, h.seg_ids, h.n_rows + 1,
                                 indices_are_sorted=True)
        parts.append(seg[:h.n_rows])
        covered = h.n_rows
    for i, b in enumerate(dg.buckets):
        w = None if edge_values is None else edge_values.bucket_tiles[i]
        if b.flat:
            dst_ids = T.row_ids_flat(b.row_start, b.width, b.slots // 128)
        else:
            dst_ids = b.row_start + jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (b.rows_pad, 1), 0),
                (b.rows_pad, b.width))
        msg = cell_op(b.adj, dst_ids, w).astype(dtype)
        msg = jnp.where(b.adj < dg.v_pad, msg, ident)
        if b.flat:
            parts.append(T.group_reduce_flat(msg, b.width, mon, b.rows))
        else:
            parts.append(mon.reduce_axis(msg, 1)[:b.rows])
        covered = b.row_start + b.rows
    return _assemble(parts, covered, graph.v_pad, ident, dtype)


def _mask_value(mon, dtype):
    """Value that makes a source's messages act as the combine identity."""
    d = jnp.dtype(dtype)
    if mon.name in ("add", "or", "any01"):
        return 0
    if mon.name == "min":
        return jnp.inf if jnp.issubdtype(d, jnp.floating) else jnp.iinfo(d).max
    if mon.name == "max":
        return -jnp.inf if jnp.issubdtype(d, jnp.floating) else jnp.iinfo(d).min
    raise ValueError(mon.name)


def advance_push_sparse(graph: VGLGraph,
                        frontier_ids: jax.Array,       # int32 [cap], pad = v_pad
                        frontier_valid: jax.Array,     # bool [cap]
                        edge_capacity: int,
                        src_arrays: Dict[str, jax.Array],
                        edge_op: EdgeOp,
                        combine,
                        out: jax.Array,
                        edge_values: Optional[DirectedEdgeValues] = None,
                        direction: TraversalDirection = TraversalDirection.SCATTER,
                        ) -> jax.Array:
    """Work-efficient push from a compacted frontier (sparse advance, the analog of
    the reference's sparse collective kernel `nec/advance_sparse.hpp:190-250`).

    Expands the frontier's ragged adjacency into a flat padded edge list of static
    size ``edge_capacity`` (cumsum + searchsorted), gathers messages edge-parallel,
    and scatter-combines into ``out`` ([v_pad], same ordering)."""
    mon = M.get(combine)
    dg = graph.direction(direction)
    cap = frontier_ids.shape[0]

    # ALL per-frontier lookups happen at CAP size (cheap when the tiered
    # capacities are small), and the edge_capacity-sized stages are exactly
    # four passes: mark-scatter+cummax (owner), one fused owner-indexed
    # gather group (delta + per-source values), one fused e_slot-indexed
    # gather group (adjacency + edge values), and the final scatter-combine.
    # Gathers sharing an index array fuse into one pass in XLA; element
    # gathers cost ~24 ns/elem on this chip regardless (see
    # docs/tpu_random_access.md), which is why the caller's tier ladder —
    # not this function — is the real work-efficiency mechanism.
    degs = jnp.where(frontier_valid,
                     jnp.take(dg.degrees, frontier_ids, mode="clip"), 0)
    row_start_c = jnp.take(dg.row_ptr, frontier_ids, mode="clip")
    ends = jnp.cumsum(degs)                                     # inclusive
    starts_local = ends - degs
    # per-frontier-row constant: e_slot = pos + delta[owner]
    delta_c = row_start_c - starts_local
    sv_cap = {k: jnp.take(a, frontier_ids, mode="clip")
              for k, a in src_arrays.items()}
    total = ends[-1] if cap > 0 else jnp.int32(0)

    pos = jnp.arange(edge_capacity, dtype=jnp.int32)
    # owner row of each flat edge slot WITHOUT searchsorted (which lowers to
    # log(cap) rounds of element gathers — measured ~150 ms at 2^20 slots):
    # scatter each nonempty row's index at its start offset, then a cummax
    # fills the run. Zero-degree rows share start offsets and must not
    # scatter (their run length is 0).
    frontier_idx = jnp.arange(cap, dtype=jnp.int32)
    # rows whose start offset overflows edge_capacity (contract violation:
    # frontier degree sum > capacity) must DROP, not clamp — a clamp would
    # scatter onto slot capacity-1 and steal the last slot's ownership
    mark_slot = jnp.where(frontier_valid & (degs > 0)
                          & (starts_local < edge_capacity),
                          starts_local, edge_capacity)
    owner_c = jnp.full(edge_capacity, -1, jnp.int32).at[mark_slot].max(
        frontier_idx, mode="drop")
    owner_c = jax.lax.cummax(owner_c)
    evalid = (pos < total) & (owner_c >= 0)
    owner_c = jnp.clip(owner_c, 0, cap - 1)

    e_slot = jnp.where(evalid,
                       pos + jnp.take(delta_c, owner_c, mode="clip"),
                       dg.e_pad)
    dsts = jnp.take(dg.col_idx, e_slot, mode="clip")
    sv = {k: jnp.take(a, owner_c, mode="clip")[:, None]
          for k, a in sv_cap.items()}
    w = (None if edge_values is None
         else jnp.take(edge_values.flat, e_slot, mode="clip")[:, None])
    msg = edge_op(sv, {}, w)[:, 0]
    msg = msg.astype(out.dtype)

    scatter_idx = jnp.where(evalid, dsts, out.shape[0])   # OOB → dropped
    return mon.scatter_at(out, scatter_idx, msg, mode="drop")
