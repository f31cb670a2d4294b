#!/usr/bin/env python
"""Build & persist the RMAT-25 edge-factor-32 sharded flagship graph — the
reference's LARGE synthetic tier (`/root/reference/apps/scripts/settings.py:109`
`syn_rmat_25_32`, |E| ≈ 1.07B) — with REAL per-edge weights stored in
route-slot order (VERDICT r4 #1/#2).

Differences from apps/build_scale24.py (which this supersedes for the large
tier):

- **Parallel per-shard builds.** Workers are pure NumPy + the native Beneš
  router — no JAX arrays, no TPU-client init — so two processes saturate both
  host cores; each writes its own `.shard{s}.npz` directly (the per-shard
  files already being the persistence format, graph/persistence.py).
- **Hash destination partitioning.** `dst % S` concentrates RMAT hubs: ids
  with many low zero bits carry most in-edges (at scale 24 the mod-2 split
  was 204M/64M). A multiplicative hash (Knuth 0x9E3779B9, top bits) balances
  shards to ±2%, keeping every per-shard route at n = 2^28.
- **Slim-save.** The stage-by-stage XLA-path arrays (in/out bitmasks +
  forward lane index — ~40% of the scale-24 npz bytes) are never read on TPU
  (persistence._unpack_route drops them at load); they are skipped at SAVE
  so the ~44 GB artifact stays affordable.
- **Real weights.** The generator's per-edge f32 weights are laid out in each
  shard's INCOMING route-slot order (`route_build.slot_map(h_in)`) and saved
  as `.weights{s}.npy` — the GATHER-direction pulls consume them exactly like
  `slot_hash_weight_fn` payloads, but the values round-trip from disk
  (reference bar: edges_array.h:9-63 — weights are first-class at scale).

Scale-25 does NOT fit 16 GB HBM stacked (8 shards × ~4.4 GB resident), so the
bench side streams shards host→device per sweep (parallel/streaming.py)
instead of the lax.scan residency path used at scale 24.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("VGL_S25_SCALE", "25"))
DEGREE = int(os.environ.get("VGL_S25_DEGREE", "32"))
N_SHARDS = int(os.environ.get("VGL_S25_SHARDS", "8"))
WORKERS = int(os.environ.get("VGL_S25_WORKERS", "2"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("VGL_S25_CACHE", os.path.join(REPO, ".cache"))
PREFIX = os.path.join(CACHE, f"rmat{SCALE}_{DEGREE}_slimw")

import numpy as np  # noqa: E402

from vectorgraphlibrary_tpu.config import DEFAULT_CONFIG  # noqa: E402
from vectorgraphlibrary_tpu.graph.build import (  # noqa: E402
    build_directed_csr, layout_of, unify_layouts)
from vectorgraphlibrary_tpu.graph.route_build import (  # noqa: E402
    build_pull_permutation, _slot_flags)
from vectorgraphlibrary_tpu import native  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << int(np.ceil(np.log2(x)))


def shard_of(dst: np.ndarray, n_shards: int) -> np.ndarray:
    """Multiplicative-hash destination partition (balanced under RMAT skew)."""
    h = (dst.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(
        0xFFFFFFFFFFFFFFFF)
    return ((h >> np.uint64(61)) % np.uint64(n_shards)).astype(np.int32)


# ---------------------------------------------------------------------------
# NumPy route plan (the worker-side twin of ops/route.make_route_plan with
# fused=True on a TPU target: only lane_inv + mid/big word masks survive)
# ---------------------------------------------------------------------------

def np_route_plan(perm: np.ndarray, flags_fwd=None, flags_inv=None) -> dict:
    from vectorgraphlibrary_tpu.ops.pallas.route_fused import (
        build_word_masks, split_levels)
    n = len(perm)
    in_m, out_m, lane = native.benes_route(perm)
    lane2d = lane.reshape(-1, 128)
    lane_inv = np.empty_like(lane2d)
    np.put_along_axis(lane_inv, lane2d,
                      np.broadcast_to(np.arange(128, dtype=np.int32),
                                      lane2d.shape), axis=1)
    kb, kq = split_levels(n)
    mid_np, big_np = build_word_masks(in_m, out_m, n, lane_fwd=lane2d,
                                      flags_fwd=flags_fwd, flags_inv=flags_inv)
    levels = in_m.shape[0]
    del in_m, out_m
    has_flags = flags_fwd is not None or flags_inv is not None
    out = {"lane_inv": lane_inv, "mid_words": mid_np,
           "meta": np.asarray([n, levels, kb, kq, 1 if has_flags else 0])}
    if big_np is not None:
        out["big_words"] = big_np
    return out


def _pack_route_np(prefix: str, plan: dict, out: dict) -> None:
    for k, a in plan.items():
        out[f"{prefix}.{k}"] = a


def _pack_directed_slim_np(prefix: str, h, e_pad: int, out: dict) -> None:
    """Slim per-direction pack: tile metadata + huge seg_ids only (the exact
    key schema persistence._unpack_directed reads; array keys absent = None,
    matching shard_build.slim_value_pull)."""
    out[f"{prefix}.meta"] = np.asarray(
        [h.vertices_count, h.vertices_pad, e_pad, e_pad,
         len(h.buckets), 1 if h.huge is not None else 0])
    for i, b in enumerate(h.buckets):
        out[f"{prefix}.b{i}.meta"] = np.asarray(
            [b.width, b.row_start, b.rows, b.rows_pad])
    if h.huge is not None:
        hh = h.huge
        out[f"{prefix}.huge.seg_ids"] = np.asarray(hh.seg_ids, np.int32)
        out[f"{prefix}.huge.meta"] = np.asarray(
            [hh.chunk_w, hh.n_rows, hh.n_chunks, hh.n_chunks_pad])


def _complete_perm(partial: np.ndarray) -> np.ndarray:
    n = len(partial)
    used = np.zeros(n, bool)
    used[partial[partial >= 0]] = True
    out = partial.copy()
    holes = np.flatnonzero(partial < 0)
    out[holes] = np.flatnonzero(~used)[:len(holes)]
    return out


# worker globals, shared copy-on-write through fork
_G = {}


def build_shard(s: int) -> dict:
    t0 = time.time()
    src_s, dst_s, sl_s, w_s = _G["parts"][s]
    L_out, L_in, v, v_pad, e_pad = (_G["L_out"], _G["L_in"], _G["v"],
                                    _G["v_pad"], _G["e_pad"])
    cfg = DEFAULT_CONFIG
    log(f"shard {s}: building CSRs ({len(src_s):,} edges)")
    h_out = build_directed_csr(src_s, dst_s, v, cfg, layout=L_out, v_pad=v_pad)
    h_in = build_directed_csr(dst_s, src_s, v, cfg, layout=L_in, v_pad=v_pad)
    for h in (h_out, h_in):          # unify e_pad (shard_build._pad_edges)
        if h.edges_pad != e_pad:
            grow = e_pad - h.edges_pad
            h.col_idx = np.concatenate(
                [h.col_idx, np.full(grow, h.vertices_pad, np.int32)])
            h.edge_perm = np.concatenate(
                [h.edge_perm, np.full(grow, e_pad, np.int64)])
            h.edges_pad = e_pad
    log(f"shard {s}: CSRs done ({time.time()-t0:.0f}s); advance route ...")
    perm, out_total, in_total, m_src, m_dst = build_pull_permutation(h_out,
                                                                    h_in)
    n = len(perm)
    flags_fwd = _slot_flags(n, m_dst, sl_s)
    flags_inv = _slot_flags(n, m_src, sl_s)
    route = np_route_plan(perm, flags_fwd=flags_fwd, flags_inv=flags_inv)
    del perm, flags_fwd, flags_inv, m_src

    # incoming route-slot weights (GATHER pulls only — see BASELINE.md)
    wslots = np.zeros(n, np.float32)
    wslots[m_dst] = w_s
    np.save(f"{PREFIX}.weights{s}.npy", wslots)
    del wslots, m_dst, w_s

    log(f"shard {s}: advance route done ({time.time()-t0:.0f}s); vroutes ...")
    p = np.full(v_pad, -1, np.int64)
    real = h_out.sorted_to_orig < v
    p[real] = h_in.orig_to_sorted[h_out.sorted_to_orig[real]]
    vroute = np_route_plan(_complete_perm(p))
    vroute_so = np_route_plan(_complete_perm(np.where(
        h_out.sorted_to_orig < v, h_out.sorted_to_orig, -1).astype(np.int64)))
    vroute_go = np_route_plan(_complete_perm(np.where(
        h_in.sorted_to_orig < v, h_in.sorted_to_orig, -1).astype(np.int64)))

    log(f"shard {s}: packing npz ({time.time()-t0:.0f}s)")
    out = {}
    _pack_directed_slim_np("out", h_out, e_pad, out)
    _pack_directed_slim_np("in", h_in, e_pad, out)
    out["meta"] = np.asarray([v, v_pad, e_pad, out_total, in_total])
    out["format"] = np.asarray(["sharded_csr"], dtype="U16")
    _pack_route_np("route", route, out)
    _pack_route_np("vroute", vroute, out)
    _pack_route_np("vroute_so", vroute_so, out)
    _pack_route_np("vroute_go", vroute_go, out)
    np.savez(f"{PREFIX}.shard{s}.npz", **out)
    log(f"shard {s}: DONE in {time.time()-t0:.0f}s")
    return {"s": s, "edges": int(len(src_s)), "route_n": n,
            "out_slots": int(out_total), "in_slots": int(in_total)}


def main():
    os.makedirs(CACHE, exist_ok=True)
    if os.path.exists(f"{PREFIX}.meta.json"):
        log(f"already built: {PREFIX}.meta.json")
        return 0
    t0 = time.time()
    from vectorgraphlibrary_tpu.io import generation
    log(f"generating RMAT scale={SCALE} deg={DEGREE} (weighted) ...")
    ec = generation.rmat(scale=SCALE, avg_degree=DEGREE, seed=42,
                         weighted=True)
    v, e = ec.vertices_count, ec.edges_count
    log(f"generated |V|={v:,} |E|={e:,} ({time.time()-t0:.0f}s)")

    # PR constants now, while the COO is in RAM (bench side never re-gens)
    from vectorgraphlibrary_tpu.parallel.sharded import pr_consts
    rev, dmask = pr_consts(ec)
    np.savez(f"{PREFIX}.prconsts.npz", rev=rev, dmask=dmask)
    del rev, dmask
    log(f"prconsts saved ({time.time()-t0:.0f}s); partitioning ...")

    sid = shard_of(ec.dst_ids, N_SHARDS)
    selfloop = ec.src_ids == ec.dst_ids
    parts = []
    for s in range(N_SHARDS):
        m = sid == s
        parts.append((ec.src_ids[m], ec.dst_ids[m], selfloop[m],
                      ec.weights[m]))
        log(f"  shard {s}: {int(m.sum()):,} edges")
    del sid, selfloop, ec
    log(f"partitioned ({time.time()-t0:.0f}s); computing unified layouts ...")

    cfg = DEFAULT_CONFIG
    louts, lins = [], []
    for src_s, dst_s, _, _ in parts:
        louts.append(layout_of(np.bincount(src_s, minlength=v), cfg))
        lins.append(layout_of(np.bincount(dst_s, minlength=v), cfg))
    L_out, L_in = unify_layouts(louts), unify_layouts(lins)
    v_pad = max(_next_pow2(max(L_out.total_rows, L_in.total_rows, v)), 1024)
    e_pad = max(8 * ((max(len(p[0]) for p in parts) + 7) // 8), 8)
    log(f"layouts done ({time.time()-t0:.0f}s): v_pad=2^"
        f"{v_pad.bit_length()-1} e_pad={e_pad:,}")

    _G.update(parts=parts, L_out=L_out, L_in=L_in, v=v, v_pad=v_pad,
              e_pad=e_pad)
    native._load()                     # build/load the .so BEFORE forking
    with mp.get_context("fork").Pool(WORKERS, maxtasksperchild=1) as pool:
        infos = pool.map(build_shard, range(N_SHARDS), chunksize=1)

    with open(f"{PREFIX}.meta.json", "w") as f:
        json.dump({"n_shards": N_SHARDS, "v": v, "v_pad": int(v_pad),
                   "e": e,
                   "edges_per_shard": [i["edges"] for i in
                                       sorted(infos, key=lambda i: i["s"])],
                   "weighted": True, "partition": "dst-hash",
                   "route_n": infos[0]["route_n"]}, f)
    log(f"ALL DONE in {time.time()-t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
