#!/usr/bin/env python
"""Scale-25 bench, one algorithm (or resume-slice) per PROCESS.

Why this exists (round 5, measured): the axon tunnel client RETAINS every
host→device-transferred byte in host RAM for the life of the process —
`jax.Array.delete()`, gc, and `clear_backends()` all leave RSS untouched
(diagnostic in BASELINE.md). One full streamed sweep moves ~35 GB (43 GB
with SSSP weights), so a process can afford ~2 sweeps before the 125 GB
host OOMs (the first two bench_scale25 runs died exactly there, 130 GB
RSS). This driver therefore runs scale-25 algorithms in per-process
slices, with small vertex states checkpointed through .npy files between
slices (D2H is itself ~64 s per 128 MB, so only compact states ride it).

Usage:
  bench_s25_part.py pr            # 2 power iterations, emits row
  bench_s25_part.py hits          # 1 auth+hub iteration, emits row
  bench_s25_part.py msbfs         # ONE resume slice (2 levels); rerun until
                                  # it prints done=True, then emits row
  bench_s25_part.py sssp_sweep    # one stored-weight all-active relaxation
                                  # sweep; emits an explicit per-sweep row
  bench_s25_part.py sssp_conv     # stored-weight Bellman-Ford to FIXPOINT
                                  # (for scales whose sweep-bytes x
                                  # expected-iters fit the retention budget,
                                  # e.g. scale 22/32: ~4.4 GB x ~15)
Rows append to BENCH_SCALE{SCALE}.json.
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
PREFIX = os.path.join(CACHE, f"rmat{SCALE}_{DEGREE}_slimw")
BENCH = os.path.join(REPO, f"BENCH_SCALE{SCALE}.json")
STATE = os.path.join(CACHE, f"s{SCALE}_msbfs_state.npz")

LEAK_NOTE = ("host-streaming; per-process sweep count is capped by the "
             "tunnel client's transfer retention (every H2D byte stays in "
             "host RAM for the process lifetime — BASELINE.md round-5 note)")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def emit(rec):
    rows = []
    if os.path.exists(BENCH):
        rows = json.load(open(BENCH))
    rows = [r for r in rows if r.get("metric") != rec["metric"]]
    rows.append(rec)
    with open(BENCH, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rec), flush=True)


def main():
    algo = sys.argv[1]
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from vectorgraphlibrary_tpu.parallel import streaming

    t0 = time.time()
    log(f"loading {PREFIX} ...")
    ssg = streaming.load_streamed(
        PREFIX, weights=algo in ("sssp_sweep", "sssp_conv"))
    e, v, v_pad = ssg.e, ssg.v, ssg.v_pad
    log(f"loaded {ssg.n_shards} shards |E|={e:,} ({time.time()-t0:.0f}s)")
    z = np.load(f"{PREFIX}.prconsts.npz")
    rev, dmask = z["rev"], z["dmask"]
    pad = v_pad - len(rev)
    base = {"unit": "MTEPS", "scale": SCALE, "avg_degree": DEGREE,
            "protocol": LEAK_NOTE}

    if algo == "pr":
        iters = 1            # the 2-iteration variant OOMed at 130 GB RSS:
        # per-process budget is ONE 35 GB sweep under the retention bug
        t0 = time.perf_counter()
        ranks = streaming.pagerank_streamed(
            ssg, np.pad(rev, (0, pad)), np.pad(dmask, (0, pad)),
            iterations=iters, progress=log)
        dt = time.perf_counter() - t0
        s = float(jnp.sum(ranks))
        assert 0.5 < s < 1.5, s
        emit(dict(metric=f"pagerank_rmat{SCALE}_mteps",
                  value=round(e * iters / dt / 1e6, 2), iters=iters,
                  sec_per_iter=round(dt / iters, 1), ranks_sum=round(s, 4),
                  **base))
    elif algo == "hits":
        # 1 iteration = 2 sweeps; to fit the one-sweep-per-process retention
        # budget, each shard's HOST copy is freed right after its LAST
        # device_put (the hub sweep) — host residency shrinks as the client
        # leak grows, keeping peak ≈ one-sweep level
        real_f = (jnp.arange(v_pad) < v).astype(jnp.float32)

        def normalize(x):
            n = jnp.sqrt(jnp.sum(x * x))
            return jnp.where(n > 0, x / n, x)

        t0 = time.perf_counter()
        a = streaming._sweep(ssg, streaming._acc_pull_g,
                             jnp.zeros(v_pad, jnp.float32), real_f,
                             "add") * real_f
        auth = normalize(a)
        acc = jnp.zeros(v_pad, jnp.float32)
        for s in range(ssg.n_shards):
            g = streaming._put(ssg.shards[s])
            ssg.shards[s] = None             # free the host copy
            acc = streaming._acc_pull_scatter(g, acc, auth, "add")
            jax.block_until_ready(acc)
            streaming._free(g)
        hub = normalize(acc * real_f)
        jax.block_until_ready(hub)
        dt = time.perf_counter() - t0
        assert float(jnp.max(auth)) > 0 and float(jnp.max(hub)) > 0
        emit(dict(metric=f"hits_rmat{SCALE}_mteps",
                  value=round(e * 2 / dt / 1e6, 2), iters=1,
                  sec_per_iter=round(dt, 1), **base))
    elif algo == "msbfs":
        rng = np.random.default_rng(25)
        roots = rng.integers(0, v, 32).astype(np.int32)
        real = jnp.arange(v_pad) < v
        if os.path.exists(STATE):
            st = np.load(STATE)
            seen_h, front_h = st["seen"], st["front"]
            lv0, wall0 = int(st["lv"]), float(st["wall"])
            done0 = bool(st["done"])
        else:
            bits = np.zeros(v_pad, np.uint32)
            np.bitwise_or.at(bits, roots,
                             np.uint32(1) << np.arange(32, dtype=np.uint32))
            seen_h = front_h = bits.view(np.int32)
            lv0, wall0, done0 = 0, 0.0, False
        if done0:
            log("already done; re-emitting")
        seen = jax.device_put(seen_h)
        frontier = jax.device_put(front_h)
        lv = lv0
        done = done0
        # sweeps/process budget: 125 GB host RAM / per-sweep transfer bytes
        # (2 at scale 25 / ~35 GB; scale 22/32 streams ~4.4 GB so a whole
        # run fits one process)
        budget = int(os.environ.get("VGL_S25_SWEEPS", "2"))
        t0 = time.perf_counter()
        for _ in range(budget):
            if done:
                break
            reached = streaming._sweep(
                ssg, streaming._acc_pull_g, jnp.zeros(v_pad, jnp.int32),
                frontier, "or")
            reached = jnp.where(real, reached, 0)
            newly = reached & ~seen
            seen = seen | newly
            frontier = newly
            lv += 1
            done = not bool(jnp.any(newly != 0))
            log(f"level {lv} done={done}")
        wall = wall0 + (time.perf_counter() - t0)
        log("checkpointing state (slow D2H) ...")
        np.savez(STATE, seen=np.asarray(seen), front=np.asarray(frontier),
                 lv=lv, wall=wall, done=done)
        if done:
            outdeg = np.pad(np.where(rev > 0,
                                     1.0 / np.maximum(rev, 1e-12),
                                     0.0).astype(np.float32), (0, pad))
            seen_np = np.asarray(seen)
            etr = 0.0
            for r in range(32):
                reach_r = (seen_np >> r) & 1
                etr += float((reach_r * outdeg).sum())
            emit(dict(metric=f"bfs_msbfs_rmat{SCALE}_gteps",
                      value=round(etr / wall / 1e9, 3), unit="GTEPS",
                      scale=SCALE, avg_degree=DEGREE, roots=32, levels=lv,
                      edges_traversed=int(etr),
                      protocol="bit-parallel 32-root MS-BFS, resumed across "
                      "processes (2 levels each) — " + LEAK_NOTE))
        else:
            log(f"not done after level {lv}; rerun this command")
    elif algo == "cc":
        # Streamed flood-hybrid CC to fixpoint (flood + hook sweeps are each
        # a full-graph stream; only run where total sweeps x sweep-bytes fit
        # the retention budget — scale 22/32: ~12 x 4.4 GB).
        # max out-degree vertex as flood hub (rev stores 1/outdeg)
        hub = int(np.argmax(np.where(rev > 0, 1.0 / np.maximum(rev, 1e-12),
                                     0.0)))
        t0 = time.perf_counter()
        labels, flood_lv, hooks = streaming.cc_hybrid_streamed(
            ssg, hub, progress=log)
        dt = time.perf_counter() - t0
        n_comp = int(np.unique(np.asarray(labels[:v])).size)
        emit(dict(metric=f"cc_rmat{SCALE}_mteps",
                  value=round(e / dt / 1e6, 2), flood_levels=flood_lv,
                  hook_iters=hooks, components=n_comp,
                  note="flood-hybrid CC to fixpoint, host-streamed; MTEPS = "
                  "|E|/wall (transfers included)", **base))
    elif algo == "sssp_conv":
        # Converged stored-weight Bellman-Ford (graph500-style whole-run
        # wall). Only sane when n_iters * sweep_bytes fits the retention
        # budget — at scale 22/32 a sweep streams ~4.4 GB, so ~25 sweeps
        # stay under the 125 GB host cap in ONE process.
        src = int(np.argmax(np.where(rev > 0, 1.0 / np.maximum(rev, 1e-12),
                                     0.0)))
        t0 = time.perf_counter()
        dist, iters = streaming.sssp_streamed(ssg, src, progress=log)
        dt = time.perf_counter() - t0
        reached = int(jnp.sum(jnp.isfinite(dist[:v])))
        emit(dict(metric=f"sssp_rmat{SCALE}_mteps",
                  value=round(e / dt / 1e6, 2), source=src, iters=iters,
                  reached=reached, sec_per_iter=round(dt / iters, 1),
                  weights="REAL stored per-edge f32, route-slot order, "
                  "round-tripped from disk (VERDICT r4 #2); stored-weight "
                  "SSSP == seq_dijkstra oracle-pinned at small scale "
                  "(tests/test_scale_build.py)",
                  note="all-active Bellman-Ford to FIXPOINT over stored "
                  "weights, host-streamed; MTEPS = |E|/wall (graph500 "
                  "accounting, transfers included)",
                  **base))
    elif algo == "sssp_sweep":
        src = int(np.argmax(np.where(rev > 0, 1.0 / np.maximum(rev, 1e-12),
                                     0.0)))
        dist = jnp.where(jnp.arange(v_pad) == src, 0.0, jnp.inf
                         ).astype(jnp.float32)
        t0 = time.perf_counter()
        acc = jnp.full((v_pad,), jnp.inf, jnp.float32)
        for s in range(ssg.n_shards):
            g = streaming._put(ssg.shards[s])
            w = jax.device_put(np.asarray(ssg.slot_weights[s]))
            acc = streaming._acc_sssp(g, acc, dist, w, None)
            jax.block_until_ready(acc)
            streaming._free(g)
            w.delete()
        dt = time.perf_counter() - t0
        reached = int(jnp.sum(jnp.isfinite(jnp.minimum(dist, acc)[:v])))
        emit(dict(metric=f"sssp_sweep_rmat{SCALE}_mteps",
                  value=round(e / dt / 1e6, 2), source=src, reached=reached,
                  weights="REAL stored per-edge f32, route-slot order, "
                  "round-tripped from disk (VERDICT r4 #2); full Bellman-Ford "
                  "convergence at this scale is blocked by the client "
                  "retention cap — converged stored-weight SSSP is "
                  "oracle-verified at small scale (tests/test_scale_build.py) "
                  "and at scale 24 via the hash-weight cross-check",
                  note="rate of ONE all-active relaxation sweep over all "
                  "1.07B stored-weight edges (explicitly a per-sweep row)",
                  **base))
    else:
        raise SystemExit(f"unknown algo {algo}")
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
