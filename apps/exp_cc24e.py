"""r5: post-fix re-measure — min-pull, add-pull, or-pull + full cc_hybrid."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
from vectorgraphlibrary_tpu.graph import persistence
from vectorgraphlibrary_tpu.parallel import sharded
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
def sync(x): return float(np.asarray(x.ravel()[0]))
def timeit(fn, *args, reps=3):
    sync(fn(*args)); ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); sync(fn(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)
def main():
    t0=time.time()
    sg = persistence.load_sharded_graph(os.path.join(REPO,".cache","rmat24_16_slim"))
    print(f"loaded {time.time()-t0:.0f}s", flush=True)
    v_pad = sg.v_pad
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(v_pad) < 0.3)
    lab = jnp.asarray(rng.integers(0, v_pad, v_pad).astype(np.int32))
    ranks = jnp.asarray(rng.random(v_pad).astype(np.float32))
    out = {}
    for name, x, comb in (("min_i32", lab, "min"), ("add_f32", ranks, "add"),
                          ("or_bool", mask, "or")):
        f = jax.jit(lambda s, xx, comb=comb: sharded.sharded_pull_scan(s, xx, comb, direction=sharded.G))
        dt = timeit(f, sg, x)
        out[f"scan_{name}_G_ms"] = round(dt*1e3,1)
        print(f"scan {name} G: {dt*1e3:.1f} ms", flush=True)
    f = jax.jit(lambda s, h: sharded.cc_hybrid_sharded_scan(s, h))
    labels, fl, hi = f(sg, jnp.int32(0)); sync(labels)
    t0 = time.perf_counter(); labels, fl, hi = f(sg, jnp.int32(0)); sync(labels)
    dt = time.perf_counter()-t0
    out["cc_hybrid_wall_s"] = round(dt,2); out["flood_levels"]=int(fl); out["hook_iters"]=int(hi)
    out["cc_mteps"] = round(268435456/dt/1e6, 1)
    print(json.dumps(out), flush=True)
if __name__ == "__main__":
    main()
