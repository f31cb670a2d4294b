"""Flagship benchmark: PageRank power iterations on RMAT scale-18 (avg degree 32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric = MTEPS (edges/s/1e6), graph500-style, matching the reference's primary
metric (performance_stats.hpp:259-262). vs_baseline is measured against a 1.0 GTEPS
nominal single-socket multicore PageRank figure (the reference publishes no in-repo
numbers — BASELINE.md; 1 GTEPS is the GAPBS/Ligra-class CPU ballpark its README
claims to significantly outperform)."""
import json
import sys
import time

BASELINE_MTEPS = 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from vectorgraphlibrary_tpu.io import generation
    from vectorgraphlibrary_tpu.graph.device import import_graph
    from vectorgraphlibrary_tpu.models import pr

    scale, degree, iters = 18, 32, 100
    ec = generation.rmat(scale=scale, avg_degree=degree, seed=42, weighted=False)
    graph = import_graph(ec)

    # warmup / compile (same static iteration count as the timed run)
    ranks, _ = pr.vgl_page_rank(graph, max_iterations=iters,
                                use_convergence=False)
    jax.block_until_ready(ranks.values)

    # one jitted call of `iters` power iterations: amortizes the ~25 ms axon
    # tunnel dispatch latency so the number reflects device throughput
    t0 = time.perf_counter()
    ranks, it = pr.vgl_page_rank(graph, max_iterations=iters,
                                 use_convergence=False)
    jax.block_until_ready(ranks.values)
    dt = time.perf_counter() - t0

    mteps = ec.edges_count * iters / dt / 1e6
    print(json.dumps({
        "metric": f"pagerank_rmat{scale}_mteps",
        "value": round(mteps, 1),
        "unit": "MTEPS",
        "vs_baseline": round(mteps / BASELINE_MTEPS, 3),
    }))


if __name__ == "__main__":
    main()
