#!/usr/bin/env python
"""Build & persist the RMAT-24 sharded flagship graph (the BASELINE scale-24
configs: PR/HITS/BFS/CC "on twitter-scale RMAT-24, 1 host edge-partitioned").

Host-side preprocessing (degree sort, unified tile layouts, Beneš routes) takes
tens of minutes on 2 cores, so this runs ONCE and persists per-shard .npz
artifacts under .cache/; bench_scale24.py then loads them onto the TPU in
seconds. Shards are built SLIM (shard_build.slim_value_pull): only the fused
value-pull leaves ship, which is what makes RMAT-24 fit one 16 GB v5e chip.

Shard count is chosen so every per-shard route stays ≤ 2^28 slots
(route_fused's fused-kernel cap is 2^29; 2^28 leaves HBM headroom).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("VGL_S24_SCALE", "24"))
DEGREE = int(os.environ.get("VGL_S24_DEGREE", "16"))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")   # build on host: jnp arrays
    # stay in RAM, no TPU-tunnel roundtrips while packing the .npz artifacts
    import numpy as np
    from vectorgraphlibrary_tpu.io import generation
    from vectorgraphlibrary_tpu.parallel.shard_build import (
        import_sharded, estimated_shard_slots)
    from vectorgraphlibrary_tpu.graph import persistence

    os.makedirs(CACHE, exist_ok=True)
    prefix = os.path.join(CACHE, f"rmat{SCALE}_{DEGREE}_slim")
    if os.path.exists(f"{prefix}.meta.json"):
        log(f"already built: {prefix}.meta.json")
        return

    t0 = time.time()
    log(f"generating RMAT scale={SCALE} deg={DEGREE} ...")
    ec = generation.rmat(scale=SCALE, avg_degree=DEGREE, seed=42,
                         weighted=False)
    log(f"generated |V|=2^{SCALE} |E|={ec.edges_count:,} "
        f"({time.time()-t0:.0f}s)")

    n_shards = 2
    while True:
        worst = estimated_shard_slots(ec, n_shards)
        log(f"n_shards={n_shards}: worst per-shard route n=2^"
            f"{worst.bit_length()-1}")
        if worst <= 1 << 28 or n_shards >= 16:
            break
        n_shards *= 2

    log(f"importing {n_shards} slim shards (routes included) ...")
    sg = import_sharded(ec, n_shards, slim=True)
    log(f"imported ({time.time()-t0:.0f}s); saving to {prefix}.* ...")
    persistence.save_sharded_graph(sg, prefix)
    log(f"done in {time.time()-t0:.0f}s total")


if __name__ == "__main__":
    main()
