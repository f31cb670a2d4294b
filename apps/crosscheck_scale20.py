#!/usr/bin/env python
"""Scale-20 cross-check of the sharded import/scan path (the machinery the
RMAT-24 run uses) against the single-chip flagship AND the NumPy oracle:
PR over import_sharded+scan must match vgl_page_rank over import_graph and
seq_page_rank, all on the same RMAT-20 COO. Writes SCALE20_CROSSCHECK.json.

This is the 'import that verifies' spot-check for the scale-24 artifact:
the 8-device-mesh tests pin shard correctness at scale 10; this pins the
exact single-chip scan path at a quarter of the scale-24 configuration.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax.numpy as jnp
    from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from vectorgraphlibrary_tpu.io import generation
    from vectorgraphlibrary_tpu.graph.device import import_graph
    from vectorgraphlibrary_tpu.parallel.shard_build import import_sharded
    from vectorgraphlibrary_tpu.parallel import sharded
    from vectorgraphlibrary_tpu.models import pr
    import vectorgraphlibrary_tpu as vgl

    t0 = time.time()
    scale, degree, iters = 20, 16, 10
    ec = generation.rmat(scale=scale, avg_degree=degree, seed=42,
                         weighted=False)
    print(f"[{time.time()-t0:.0f}s] generated", flush=True)

    sg = import_sharded(ec, 2, slim=True)
    print(f"[{time.time()-t0:.0f}s] sharded import done", flush=True)
    got_scan = np.asarray(sharded.pagerank_sharded_scan(
        sg, ec, max_iterations=iters))[:ec.vertices_count]
    print(f"[{time.time()-t0:.0f}s] scan PR done", flush=True)
    del sg

    graph = import_graph(ec)
    print(f"[{time.time()-t0:.0f}s] single-chip import done", flush=True)
    ranks, _ = pr.vgl_page_rank(graph, max_iterations=iters,
                                use_convergence=False)
    got_single = vgl.as_original_numpy(ranks, graph)[:ec.vertices_count]
    print(f"[{time.time()-t0:.0f}s] single-chip PR done", flush=True)
    del graph

    want = pr.seq_page_rank(ec, max_iterations=iters, use_convergence=False)
    err_scan = float(np.max(np.abs(got_scan - want)))
    err_single = float(np.max(np.abs(got_single - want)))
    err_cross = float(np.max(np.abs(got_scan - got_single)))
    ok = err_scan < 1e-6 and err_single < 1e-6
    out = {"scale": scale, "avg_degree": degree, "iters": iters,
           "max_abs_err_scan_vs_oracle": err_scan,
           "max_abs_err_single_vs_oracle": err_single,
           "max_abs_err_scan_vs_single": err_cross,
           "ok": ok}
    print(json.dumps(out), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALE20_CROSSCHECK.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
