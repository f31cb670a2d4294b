"""Driver benchmark: the BASELINE.md contract configs on the real TPU.

Prints one JSON line PER metric; the LAST line is the headline
pagerank_rmat18_mteps (kept stable across rounds for the driver's
vs_baseline tracking). All lines are also written to bench_results.json.

Metrics (BASELINE.md targets):
- pagerank_rmat18_mteps : PR power iterations, MTEPS = e*iters/time
- bfs_do_rmat20_gteps   : device-resident direction-optimizing BFS,
                          GTEPS = e/time per traversal (graph500 style)
- sssp_rmat20_mteps     : all-active Bellman-Ford to fixpoint, MTEPS = e/time
- cc_sv_rmat20_mteps    : Shiloach-Vishkin to fixpoint, MTEPS = e/time
- hits_rmat20_mteps     : 20 iterations, MTEPS = e*iters/time
- sssp/cc on a real graph when one is cached under .graphs/ (zero-egress
  environments skip with a note; see vectorgraphlibrary_tpu/io/corpus.py)
- optional scale-22 PR/BFS with VGL_BENCH_SCALE22=1 (adds ~15 min of
  preprocessing; results recorded in BENCH_SCALE22.json when run)

Timing protocol: every measured run is ONE jitted device program executed
after an identical warmup, so the ~25 ms host→TPU tunnel dispatch latency is
amortized (PR/HITS) or counted once per traversal (BFS/SSSP/CC) — matching
the reference's whole-algorithm wall measurement (performance_stats.hpp:259).
"""
import json
import os
import sys
import time

BASELINE_MTEPS = 1000.0      # GAPBS/Ligra-class CPU PageRank ballpark


def _sync(out):
    """Reliable completion barrier: read one element back to the host.
    (block_until_ready on the experimental axon backend has been observed to
    return early for repeated identical dispatches.)"""
    import numpy as np
    return float(np.asarray(out.ravel()[0]))


def _bench(fn, _ignored=None):
    _sync(fn())
    t0 = time.perf_counter()
    out = fn()
    _sync(out)
    return time.perf_counter() - t0


def main():
    import jax
    import numpy as np
    from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from vectorgraphlibrary_tpu.io import generation
    from vectorgraphlibrary_tpu.graph.device import import_graph
    from vectorgraphlibrary_tpu.graph.edges import build_edge_array_from_host
    from vectorgraphlibrary_tpu.models import pr, bfs, sssp, cc, hits, common

    metrics = []

    def emit(metric, value, unit, vs_baseline=None, **extra):
        rec = {"metric": metric, "value": round(value, 1), "unit": unit}
        if vs_baseline is not None:
            rec["vs_baseline"] = round(vs_baseline, 3)
        rec.update(extra)
        metrics.append(rec)
        print(json.dumps(rec), flush=True)
        with open("bench_results.json", "w") as f:   # survive partial runs
            json.dump(metrics, f, indent=1)
        return rec


    # ---------------- scale-20 family (one shared import) ----------------
    s20, d20 = 20, 16
    ec20 = generation.rmat(scale=s20, avg_degree=d20, seed=42, weighted=True)
    host = []
    g20 = import_graph(ec20, _host_out=host)
    ea20 = build_edge_array_from_host(ec20.weights, g20, host[0], host[1])
    del host

    # DO-BFS: time per traversal; warmup and timed runs use DIFFERENT
    # sources (identical repeated dispatches can be coalesced by the tunnel)
    _sync(bfs.vgl_bfs_device(g20,
                             common.select_random_source(ec20, seed=0)).values)
    sources = [common.select_random_source(ec20, seed=s) for s in range(1, 4)]
    t0 = time.perf_counter()
    for src in sources:
        _sync(bfs.vgl_bfs_device(g20, src).values)
    dt = (time.perf_counter() - t0) / len(sources)
    emit(f"bfs_do_rmat{s20}_gteps", ec20.edges_count / dt / 1e9, "GTEPS",
         scale=s20, avg_degree=d20)

    dt = _bench(lambda: sssp.vgl_dijkstra_all_active(g20, ea20, sources[0])[0]
                .values)
    emit(f"sssp_rmat{s20}_mteps", ec20.edges_count / dt / 1e6, "MTEPS",
         scale=s20, avg_degree=d20)

    dt = _bench(lambda: cc.vgl_shiloach_vishkin(g20)[0].values)
    emit(f"cc_sv_rmat{s20}_mteps", ec20.edges_count / dt / 1e6, "MTEPS",
         scale=s20, avg_degree=d20)

    hits_iters = 20
    dt = _bench(lambda: hits.vgl_hits(g20, iterations=hits_iters)[0].values)
    emit(f"hits_rmat{s20}_mteps", ec20.edges_count * hits_iters / dt / 1e6,
         "MTEPS", scale=s20, avg_degree=d20, iters=hits_iters)
    del g20, ea20, ec20

    # ---------------- real graph (cached corpus), if present --------------
    try:
        from vectorgraphlibrary_tpu.io import corpus
        name, ecr = corpus.any_cached_graph()
    except Exception:
        name, ecr = None, None
    if ecr is not None:
        # weights BEFORE import: import_graph keys keep_edge_slots off
        # ec.weights, and the device tiles need eidx to lay out the weights
        if ecr.weights is None:
            ecr = ecr.with_random_weights(7)
        hostr = []
        gr = import_graph(ecr, _host_out=hostr)
        ear = build_edge_array_from_host(ecr.weights, gr, hostr[0], hostr[1])
        src = common.select_random_source(ecr, seed=1)
        dt = _bench(lambda: sssp.vgl_dijkstra_all_active(gr, ear, src)[0]
                    .values)
        emit(f"sssp_{name}_mteps", ecr.edges_count / dt / 1e6, "MTEPS")
        dt = _bench(lambda: cc.vgl_shiloach_vishkin(gr)[0].values)
        emit(f"cc_{name}_mteps", ecr.edges_count / dt / 1e6, "MTEPS")
        del gr, ear
    else:
        print(json.dumps({"note": "no cached real graph (zero-egress); "
                          "drop a KONECT file under .graphs/ to enable"}),
              flush=True)

    # ---------------- optional scale-22 (opt-in: ~15 min preprocessing) ---
    if os.environ.get("VGL_BENCH_SCALE22"):
        s22, d22 = 22, 16
        ec22 = generation.rmat(scale=s22, avg_degree=d22, seed=42)
        g22 = import_graph(ec22)
        iters22 = 20
        dt = _bench(lambda: pr.vgl_page_rank(
            g22, max_iterations=iters22, use_convergence=False)[0].values)
        emit(f"pagerank_rmat{s22}_mteps",
             ec22.edges_count * iters22 / dt / 1e6, "MTEPS",
             scale=s22, avg_degree=d22)
        _sync(bfs.vgl_bfs_device(
            g22, common.select_random_source(ec22, seed=2)).values)
        src = common.select_random_source(ec22, seed=3)
        t0 = time.perf_counter()
        _sync(bfs.vgl_bfs_device(g22, src).values)
        dt = time.perf_counter() - t0
        emit(f"bfs_do_rmat{s22}_gteps", ec22.edges_count / dt / 1e9, "GTEPS",
             scale=s22, avg_degree=d22)
        with open("BENCH_SCALE22.json", "w") as f:
            json.dump(metrics, f, indent=1)
        del g22, ec22

    # ---------------- headline: PR RMAT-18 (LAST line, driver-parsed) -----
    scale, degree, iters = 18, 32, 100
    ec = generation.rmat(scale=scale, avg_degree=degree, seed=42,
                         weighted=False)
    graph = import_graph(ec)
    dt = _bench(lambda: pr.vgl_page_rank(graph, max_iterations=iters,
                                         use_convergence=False)[0].values)
    mteps = ec.edges_count * iters / dt / 1e6
    emit(f"pagerank_rmat{scale}_mteps", mteps, "MTEPS",
         vs_baseline=mteps / BASELINE_MTEPS)


if __name__ == "__main__":
    main()
