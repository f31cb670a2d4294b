"""Round-4 design experiments on the real TPU (scale-20 graph, one session).

CAVEAT (learned the hard way): `timeit` here measures ONE dispatch per call,
so every sub-30 ms result is swamped by the ~28 ms tunnel round-trip — only
the MS-BFS wall and the >30 ms deltas are meaningful. For ms-level ops use
apps/ubench_prims.py's pattern (K reps inside one jitted fori_loop).

Experiments:

1. MS-BFS (bit-parallel 32/64 roots) wall + per-level or-pull costs
2. bool vs int32-word or-pull per call
3. compact_ids alternatives: current cumsum+scatter vs lax.sort vs top_k
4. advance_push_sparse stage timings (expansion vs scatter)
5. route big-kernel block extent (_C_MIN) sweep for int8 payloads

Writes /tmp/exp_r4.json and prints one line per result.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
from vectorgraphlibrary_tpu.io import generation
from vectorgraphlibrary_tpu.graph.device import import_graph
from vectorgraphlibrary_tpu.graph.edges import build_edge_array_from_host
from vectorgraphlibrary_tpu.graph.frontier import Frontier, compact_ids
from vectorgraphlibrary_tpu.models import bfs, common
from vectorgraphlibrary_tpu.ops.advance import (advance_pull_value,
                                                advance_push_sparse)
from vectorgraphlibrary_tpu.ops.pallas import route_fused
from vectorgraphlibrary_tpu.config import TraversalDirection

S, G = TraversalDirection.SCATTER, TraversalDirection.GATHER
RESULTS = {}


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0].ravel()[0]))


def rec(name, **kw):
    RESULTS[name] = kw
    print(name, kw, flush=True)
    with open("/tmp/exp_r4.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    t0 = time.time()
    ec = generation.rmat(scale=20, avg_degree=16, seed=42, weighted=True)
    host = []
    g = import_graph(ec, _host_out=host)
    ea = build_edge_array_from_host(ec.weights, g, host[0], host[1])
    v_pad = g.v_pad
    print(f"import done {time.time()-t0:.0f}s  n_route={g.advance_route.n}",
          flush=True)

    # ---- 1/2: or-pull flavors ----
    rng = np.random.default_rng(0)
    mask_bool = jnp.asarray(rng.random(v_pad) < 0.3)
    words = jnp.asarray(rng.integers(0, 2**31, v_pad).astype(np.int32))

    pull_or = jax.jit(lambda gg, m: advance_pull_value(
        gg, m, "or", direction=G, src_in_src_order=True))
    dt = timeit(pull_or, g, mask_bool)
    rec("orpull_bool_i8_ms", ms=round(dt * 1e3, 3))

    dt = timeit(pull_or, g, words)
    rec("orpull_words_i32_ms", ms=round(dt * 1e3, 3))

    pull_add = jax.jit(lambda gg, x: advance_pull_value(
        gg, x, "add", direction=G, src_in_src_order=True))
    dt = timeit(pull_add, g, words.astype(jnp.float32))
    rec("addpull_f32_ms", ms=round(dt * 1e3, 3))

    # ---- MS-BFS end to end ----
    roots = [common.select_random_source(ec, seed=100 + s) for s in range(64)]
    warm = [common.select_random_source(ec, seed=s) for s in range(64)]
    sync(bfs.vgl_msbfs(g, warm).values)
    t1 = time.perf_counter()
    lv = bfs.vgl_msbfs(g, roots).values
    sync(lv)
    dt = time.perf_counter() - t1
    # graph500-style traversed edges: sum of outdegs over visited, per root
    outdeg_s = g.outgoing.degrees.astype(jnp.float32)
    edges_tr = float(jnp.sum((lv > 0).astype(jnp.float32) @ outdeg_s))
    rec("msbfs64_scale20", wall_ms=round(dt * 1e3, 1),
        gteps=round(edges_tr / dt / 1e9, 2),
        edges_traversed=int(edges_tr))

    # ---- 3: compact_ids alternatives ----
    frontier_sizes = {}
    for density, cap in ((0.02, 1 << 15), (0.10, 1 << 17)):
        m = jnp.asarray(rng.random(v_pad) < density)
        fr = Frontier(mask=m, size=jnp.sum(m, dtype=jnp.int32),
                      neighbours_count=jnp.int32(0), direction=S)

        cur = jax.jit(lambda fm, c=cap: compact_ids(
            Frontier(mask=fm, size=jnp.sum(fm, dtype=jnp.int32),
                     neighbours_count=jnp.int32(0), direction=S), c)[0])
        dt = timeit(cur, m)
        rec(f"compact_cur_d{density}_cap{cap}", ms=round(dt * 1e3, 3))

        def sort_compact(fm, c=cap):
            keys = jnp.where(fm, jnp.arange(v_pad, dtype=jnp.int32),
                             jnp.int32(v_pad))
            return jax.lax.sort(keys)[:c]
        dt = timeit(jax.jit(sort_compact), m)
        rec(f"compact_sort_d{density}_cap{cap}", ms=round(dt * 1e3, 3))

        def topk_compact(fm, c=cap):
            keys = jnp.where(fm, jnp.int32(2 * v_pad) - jnp.arange(
                v_pad, dtype=jnp.int32), jnp.int32(0))
            vals, idx = jax.lax.top_k(keys, c)
            return jnp.where(vals > 0, idx, v_pad)
        dt = timeit(jax.jit(topk_compact), m)
        rec(f"compact_topk_d{density}_cap{cap}", ms=round(dt * 1e3, 3))

    # ---- 4: push stage timings (cap 2^15 ids, ecap 2^17) ----
    cap, ecap = 1 << 15, 1 << 17
    m = jnp.asarray(rng.random(v_pad) < 0.02)
    fr = Frontier(mask=m, size=jnp.sum(m, dtype=jnp.int32),
                  neighbours_count=jnp.int32(0), direction=S)
    ids, valid = jax.jit(lambda: compact_ids(fr, cap))()
    levels = jnp.where(m, 1, jnp.iinfo(jnp.int32).max).astype(jnp.int32)

    dg = g.outgoing

    def stage_owner(ids, valid, degrees=None, row_ptr=None, col_idx=None):
        degs = jnp.where(valid, jnp.take(degrees, ids, mode="clip"), 0)
        ends = jnp.cumsum(degs)
        starts = ends - degs
        fidx = jnp.arange(cap, dtype=jnp.int32)
        mark = jnp.where(valid & (degs > 0) & (starts < ecap), starts, ecap)
        owner = jnp.full(ecap, -1, jnp.int32).at[mark].max(fidx, mode="drop")
        owner = jax.lax.cummax(owner)
        return owner, starts, ends

    dt = timeit(jax.jit(lambda i, vl, dd: stage_owner(i, vl, degrees=dd)),
                ids, valid, dg.degrees)
    rec("push_stage_owner_ms", ms=round(dt * 1e3, 3))

    def stage_expand(ids, valid, degrees, row_ptr, col_idx):
        owner, starts, ends = stage_owner(ids, valid, degrees=degrees)
        pos = jnp.arange(ecap, dtype=jnp.int32)
        evalid = (pos < ends[-1]) & (owner >= 0)
        owner = jnp.clip(owner, 0, cap - 1)
        src = jnp.take(ids, owner, mode="clip")
        row_start = jnp.take(row_ptr, src, mode="clip")
        e_off = pos - jnp.take(starts, owner, mode="clip")
        e_slot = jnp.where(evalid, row_start + e_off, dg.e_pad)
        dsts = jnp.take(col_idx, e_slot, mode="clip")
        return dsts, evalid

    dt = timeit(jax.jit(stage_expand), ids, valid, dg.degrees, dg.row_ptr,
                dg.col_idx)
    rec("push_stage_expand_ms", ms=round(dt * 1e3, 3))

    def full_push(gg, ids, valid, lv):
        return advance_push_sparse(
            gg, ids, valid, ecap, {"l": lv},
            lambda s, d, w: jnp.zeros_like(s["l"]) + 2, "min", lv,
            direction=S)

    dt = timeit(jax.jit(full_push), g, ids, valid, levels)
    rec("push_full_cur_ms", ms=round(dt * 1e3, 3))

    # ---- 5: route _C_MIN sweep for int8 ----
    for cmin in (8, 16, 32):
        route_fused._C_MIN = cmin
        jax.clear_caches()
        try:
            f = jax.jit(lambda gg, m: advance_pull_value(
                gg, m, "or", direction=G, src_in_src_order=True))
            dt = timeit(f, g, mask_bool)
            rec(f"orpull_bool_cmin{cmin}_ms", ms=round(dt * 1e3, 3))
        except Exception as e:                      # compile OOM expected >16
            rec(f"orpull_bool_cmin{cmin}_ms", error=str(e)[:200])
    route_fused._C_MIN = 8
    jax.clear_caches()

    # f32 weighted min-pull with bigger cmin (PR/SSSP path)
    for cmin in (8, 16):
        route_fused._C_MIN = cmin
        jax.clear_caches()
        try:
            f = jax.jit(lambda gg, ev, x: advance_pull_value(
                gg, x, "min", edge_values=ev, weight_op="add",
                direction=G, src_in_src_order=True))
            dt = timeit(f, g, ea.incoming, words.astype(jnp.float32))
            rec(f"minwpull_f32_cmin{cmin}_ms", ms=round(dt * 1e3, 3))
        except Exception as e:
            rec(f"minwpull_f32_cmin{cmin}_ms", error=str(e)[:200])
    route_fused._C_MIN = 8

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
