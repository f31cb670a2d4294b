"""Isolate the scale-24 CC cost anomaly: cc_hybrid's 18 sweeps took 9.35 s
(519 ms avg) while HITS add-pull scans run 152 ms — which flavor is slow?
Times one pull-scan of each (combine x direction) on the persisted scale-24
shards.  Per-call timing is fine here (~28 ms dispatch << 150+ ms scans).
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
from vectorgraphlibrary_tpu.graph import persistence
from vectorgraphlibrary_tpu.parallel import sharded

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def timeit(fn, *args, reps=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    prefix = os.path.join(CACHE, "rmat24_16_slim")
    t0 = time.time()
    sg = persistence.load_sharded_graph(prefix)
    print(f"loaded ({time.time()-t0:.0f}s)", flush=True)
    v_pad = sg.v_pad
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(v_pad) < 0.3)
    labels = jnp.asarray(rng.integers(0, v_pad, v_pad).astype(np.int32))
    ranks = jnp.asarray(rng.random(v_pad).astype(np.float32))
    out = {}

    for name, x, comb in (("or_bool", mask, "or"),
                          ("min_i32", labels, "min"),
                          ("add_f32", ranks, "add")):
        for dname, d in (("G", sharded.G), ("S", sharded.S)):
            f = jax.jit(lambda s, xx, comb=comb, d=d:
                        sharded.sharded_pull_scan(s, xx, comb, direction=d))
            dt = timeit(f, sg, x)
            out[f"scan_{name}_{dname}_ms"] = round(dt * 1e3, 1)
            print(f"scan {name} {dname}: {dt*1e3:.1f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
