"""Binary persistence for preprocessed graphs.

Capability match for the reference's per-format binary save/load
(`save_main_content_to_binary_file`, vect_csr_graph.h:90-92; extensions
.vgl/.vcsr/.el, framework_types.h:85-100): the expensive import pipeline —
degree sort, tiling, Beneš route computation — runs once, then the whole device
graph round-trips through one .npz file.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import GraphFormat
from .device import (DeviceDirectedGraph, HugeTile, TileBucket, VGLGraph)
from ..ops.route import RoutePlan


def _pack_directed(prefix: str, dg: DeviceDirectedGraph, out: dict) -> None:
    # per-array keys are optional: slim (value-pull-only) shards ship None for
    # CSR arrays / renumber maps / adjacency tiles (shard_build.slim_value_pull)
    def put(key, arr):
        if arr is not None:
            out[key] = np.asarray(arr)
    put(f"{prefix}.row_ptr", dg.row_ptr)
    put(f"{prefix}.col_idx", dg.col_idx)
    put(f"{prefix}.degrees", dg.degrees)
    put(f"{prefix}.sorted_to_orig", dg.sorted_to_orig)
    put(f"{prefix}.orig_to_sorted", dg.orig_to_sorted)
    out[f"{prefix}.meta"] = np.asarray([dg.v, dg.v_pad, dg.e, dg.e_pad,
                                        len(dg.buckets),
                                        1 if dg.huge is not None else 0])
    for i, b in enumerate(dg.buckets):
        put(f"{prefix}.b{i}.adj", b.adj)
        put(f"{prefix}.b{i}.eidx", b.eidx)
        out[f"{prefix}.b{i}.meta"] = np.asarray(
            [b.width, b.row_start, b.rows, b.rows_pad])
    if dg.huge is not None:
        h = dg.huge
        put(f"{prefix}.huge.adj", h.adj)
        put(f"{prefix}.huge.eidx", h.eidx)
        out[f"{prefix}.huge.seg_ids"] = np.asarray(h.seg_ids)
        out[f"{prefix}.huge.meta"] = np.asarray(
            [h.chunk_w, h.n_rows, h.n_chunks, h.n_chunks_pad])


def _unpack_directed(prefix: str, z, conv=None) -> DeviceDirectedGraph:
    conv = conv or jnp.asarray
    v, v_pad, e, e_pad, nb, has_huge = z[f"{prefix}.meta"].tolist()

    def opt(key):
        return conv(z[key]) if key in z else None
    buckets = []
    for i in range(nb):
        w, rs, r, rp = z[f"{prefix}.b{i}.meta"].tolist()
        buckets.append(TileBucket(
            adj=opt(f"{prefix}.b{i}.adj"), eidx=opt(f"{prefix}.b{i}.eidx"),
            width=w, row_start=rs, rows=r, rows_pad=rp))
    huge = None
    if has_huge:
        cw, nr, nc, ncp = z[f"{prefix}.huge.meta"].tolist()
        huge = HugeTile(adj=opt(f"{prefix}.huge.adj"),
                        eidx=opt(f"{prefix}.huge.eidx"),
                        seg_ids=conv(z[f"{prefix}.huge.seg_ids"]),
                        chunk_w=cw, n_rows=nr, n_chunks=nc, n_chunks_pad=ncp)
    return DeviceDirectedGraph(
        row_ptr=opt(f"{prefix}.row_ptr"),
        col_idx=opt(f"{prefix}.col_idx"),
        degrees=opt(f"{prefix}.degrees"),
        sorted_to_orig=opt(f"{prefix}.sorted_to_orig"),
        orig_to_sorted=opt(f"{prefix}.orig_to_sorted"),
        buckets=tuple(buckets), huge=huge,
        v=v, v_pad=v_pad, e=e, e_pad=e_pad)


def _pack_route(prefix: str, plan, out: dict) -> None:
    if plan.in_masks is not None:          # absent on slim (TPU fused) plans
        out[f"{prefix}.in_masks"] = np.asarray(plan.in_masks)
        out[f"{prefix}.out_masks"] = np.asarray(plan.out_masks)
        out[f"{prefix}.lane_idx"] = np.asarray(plan.lane_idx)
    out[f"{prefix}.lane_inv"] = np.asarray(plan.lane_inv)
    if plan.mid_words is not None:
        out[f"{prefix}.mid_words"] = np.asarray(plan.mid_words)
    if plan.big_words is not None:
        out[f"{prefix}.big_words"] = np.asarray(plan.big_words)
    out[f"{prefix}.meta"] = np.asarray([plan.n, plan.levels, plan.kb, plan.kq,
                                        1 if plan.has_flags else 0])


def _unpack_route(prefix: str, z, conv=None):
    import jax
    conv = conv or jnp.asarray
    meta = z[f"{prefix}.meta"].tolist()
    n, levels, kb, kq, has_flags = (meta if len(meta) == 5
                                    else meta + [0, 0, 0])
    mid = (conv(z[f"{prefix}.mid_words"])
           if f"{prefix}.mid_words" in z else None)
    big = (conv(z[f"{prefix}.big_words"])
           if f"{prefix}.big_words" in z else None)
    # graphs BUILT on a CPU host carry the stage-by-stage XLA-path arrays
    # (in/out bitmasks + forward lane shuffle); a TPU loading a fused plan
    # never reads them — dropping here is what lets the 2x2^28-slot scale-24
    # shards fit one 16 GB chip (~2.2 GB/shard of dead mask data otherwise).
    # numpy mode (conv=np.asarray, streaming loader) drops them too: the
    # stream path only ever device_puts the fused arrays.
    slim = mid is not None and (conv is not jnp.asarray
                                or jax.default_backend() in ("tpu", "axon"))
    def opt(key):
        if slim:
            return None
        return conv(z[key]) if key in z else None
    return RoutePlan(in_masks=opt(f"{prefix}.in_masks"),
                     out_masks=opt(f"{prefix}.out_masks"),
                     lane_idx=opt(f"{prefix}.lane_idx"),
                     lane_inv=conv(z[f"{prefix}.lane_inv"]),
                     mid_words=mid, big_words=big,
                     n=n, levels=levels, kb=kb, kq=kq,
                     has_flags=bool(has_flags))


_VROUTES = (("vroute", "vertex_route_s_from_g"),
            ("vroute_so", "vertex_route_s_from_o"),
            ("vroute_go", "vertex_route_g_from_o"))


def save_graph_to_binary_file(graph: VGLGraph, path: str,
                              compressed: bool = True) -> None:
    out = {}
    _pack_directed("out", graph.outgoing, out)
    _pack_directed("in", graph.incoming, out)
    out["meta"] = np.asarray([graph.v, graph.v_pad, graph.e, graph.out_slots,
                              graph.in_slots])
    out["format"] = np.asarray([graph.graph_format.value], dtype="U16")
    if graph.advance_route is not None:
        _pack_route("route", graph.advance_route, out)
    for prefix, attr in _VROUTES:
        if getattr(graph, attr) is not None:
            _pack_route(prefix, getattr(graph, attr), out)
    (np.savez_compressed if compressed else np.savez)(path, **out)


def load_graph_from_binary_file(path: str, as_numpy: bool = False) -> VGLGraph:
    """as_numpy=True keeps every leaf a host numpy array (no device_put) —
    the streaming executor (parallel/streaming.py) loads shards this way and
    ships them to HBM one at a time per sweep."""
    z = np.load(path)
    conv = np.asarray if as_numpy else jnp.asarray
    v, v_pad, e, out_slots, in_slots = z["meta"].tolist()
    route = _unpack_route("route", z, conv) if "route.meta" in z else None
    vroutes = {attr: (_unpack_route(prefix, z, conv)
                      if f"{prefix}.meta" in z else None)
               for prefix, attr in _VROUTES}
    return VGLGraph(
        outgoing=_unpack_directed("out", z, conv),
        incoming=_unpack_directed("in", z, conv),
        advance_route=route, **vroutes,
        v=v, v_pad=v_pad, e=e, out_slots=out_slots, in_slots=in_slots,
        graph_format=GraphFormat.parse(str(z["format"][0])))


def save_sharded_graph(sg, path_prefix: str, compressed: bool = False) -> None:
    """Persist a ShardedTileGraph as one .npz per shard + a meta file
    (reference ShardedCSRGraph saves per-shard binaries,
    sharded_csr_graph/*.hpp). Uncompressed by default: the scale-24 artifact
    is ~10 GB and 2 host cores would spend minutes deflating route masks."""
    import json
    for s in range(sg.n_shards):
        save_graph_to_binary_file(sg.shard(s), f"{path_prefix}.shard{s}.npz",
                                  compressed=compressed)
    with open(f"{path_prefix}.meta.json", "w") as f:
        json.dump({"n_shards": sg.n_shards, "v": sg.v, "v_pad": sg.v_pad,
                   "e": sg.e,
                   "edges_per_shard":
                       np.asarray(sg.edges_per_shard).tolist()}, f)


def save_sharded_weights(slot_weights, path_prefix: str) -> None:
    """Persist per-shard INCOMING route-slot weight arrays (f32 [n] each) as
    `{prefix}.weights{s}.npy` — real per-edge values riding the same
    persistence path as the graph (VERDICT r4 #2; reference bar:
    edges_array.h:9-63). Slot order = route_build.slot_map(h_in), the order
    the fused GATHER finish consumes."""
    for s, w in enumerate(slot_weights):
        np.save(f"{path_prefix}.weights{s}.npy", np.asarray(w))


def load_sharded_weights(path_prefix: str, n_shards: int,
                         as_numpy: bool = False):
    """Load per-shard incoming slot weights; returns a list of [n] arrays
    (numpy) or one stacked jnp [S, n] array."""
    ws = [np.load(f"{path_prefix}.weights{s}.npy", mmap_mode="r")
          for s in range(n_shards)]
    if as_numpy:
        return ws
    return jnp.stack([jnp.asarray(np.asarray(w)) for w in ws])


def load_sharded_graph(path_prefix: str):
    import json
    import jax
    from ..parallel.shard_build import ShardedTileGraph
    with open(f"{path_prefix}.meta.json") as f:
        meta = json.load(f)
    graphs = [load_graph_from_binary_file(f"{path_prefix}.shard{s}.npz")
              for s in range(meta["n_shards"])]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
    return ShardedTileGraph(
        stacked=stacked,
        edges_per_shard=jnp.asarray(meta["edges_per_shard"],
                                    dtype=jnp.int32),
        n_shards=meta["n_shards"], v=meta["v"], v_pad=meta["v_pad"],
        e=meta["e"])
