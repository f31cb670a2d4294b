"""r5 experiment (VERDICT r4 #4): is min-f32 faster than min-i32 at scale 24?
Labels < 2^24 are f32-exact, so CC hooks could ride the faster class if one
exists. Also re-times the full cc_hybrid to decompose wall = flood + hooks."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
from vectorgraphlibrary_tpu.graph import persistence
from vectorgraphlibrary_tpu.parallel import sharded

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def sync(x):
    return float(np.asarray(x.ravel()[0]))

def timeit(fn, *args, reps=3):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), ts

def main():
    prefix = os.path.join(REPO, ".cache", "rmat24_16_slim")
    t0 = time.time()
    sg = persistence.load_sharded_graph(prefix)
    print(f"loaded ({time.time()-t0:.0f}s)", flush=True)
    v_pad = sg.v_pad
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(v_pad) < 0.3)
    lab_i = jnp.asarray(rng.integers(0, v_pad, v_pad).astype(np.int32))
    lab_f = lab_i.astype(jnp.float32)
    ranks = jnp.asarray(rng.random(v_pad).astype(np.float32))
    out = {}
    for name, x, comb in (("or_bool", mask, "or"),
                          ("min_i32", lab_i, "min"),
                          ("min_f32", lab_f, "min"),
                          ("max_f32", lab_f, "max"),
                          ("add_f32", ranks, "add")):
        for dname, d in (("G", sharded.G), ("S", sharded.S)):
            f = jax.jit(lambda s, xx, comb=comb, d=d:
                        sharded.sharded_pull_scan(s, xx, comb, direction=d))
            dt, ts = timeit(f, sg, x)
            out[f"scan_{name}_{dname}_ms"] = round(dt * 1e3, 1)
            print(f"scan {name} {dname}: {dt*1e3:.1f} ms  {['%.0f'%(t*1e3) for t in ts]}", flush=True)
    # full hybrid for decomposition
    hub = 0  # any; just for timing structure use max-degree-ish vertex 0
    f = jax.jit(lambda s, h: sharded.cc_hybrid_sharded_scan(s, h))
    labels, fl, hi = f(sg, jnp.int32(hub)); sync(labels)
    t0 = time.perf_counter()
    labels, fl, hi = f(sg, jnp.int32(hub)); sync(labels)
    dt = time.perf_counter() - t0
    out["cc_hybrid_wall_s"] = round(dt, 2)
    out["flood_levels"] = int(fl); out["hook_iters"] = int(hi)
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
