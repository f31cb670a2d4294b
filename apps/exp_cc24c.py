"""r5: decompose the min-pull vs add-pull gap at scale 24 using the new
no-reduce advance: route-only (return_slots) vs full pull, per combine."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
from vectorgraphlibrary_tpu.graph import persistence
from vectorgraphlibrary_tpu.parallel import sharded
from vectorgraphlibrary_tpu.parallel.sharded import _shard_pull_original
from vectorgraphlibrary_tpu.ops.advance import advance_pull_value
from vectorgraphlibrary_tpu.models import common

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def sync(x): return float(np.asarray(x.ravel()[0]))

def timeit(fn, *args, reps=3):
    sync(fn(*args)); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

def main():
    sg = persistence.load_sharded_graph(os.path.join(REPO, ".cache", "rmat24_16_slim"))
    print("loaded", flush=True)
    v_pad = sg.v_pad
    rng = np.random.default_rng(0)
    lab_i = jnp.asarray(rng.integers(0, v_pad, v_pad).astype(np.int32))
    ranks = jnp.asarray(rng.random(v_pad).astype(np.float32))
    G = sharded.G

    def scan_slots(sgs, x, combine):
        def body(acc, g):
            src_dir = sharded.S
            x_s = common.to_direction(g, x, sharded.O, src_dir)
            slots = advance_pull_value(g, x_s, combine, direction=G,
                                       src_in_src_order=True,
                                       return_slots=True)
            return acc + slots[0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), sgs.stacked)
        return acc

    def scan_full(sgs, x, combine):
        return sharded.sharded_pull_scan(sgs, x, combine, direction=G)

    out = {}
    for name, x, comb in (("min_i32", lab_i, "min"), ("add_f32", ranks, "add")):
        f1 = jax.jit(lambda s, xx, c=comb: scan_slots(s, xx, c))
        f2 = jax.jit(lambda s, xx, c=comb: scan_full(s, xx, c))
        d1 = timeit(f1, sg, x); d2 = timeit(f2, sg, x)
        out[f"{name}_routeonly_ms"] = round(d1*1e3, 1)
        out[f"{name}_full_ms"] = round(d2*1e3, 1)
        print(f"{name}: route-only {d1*1e3:.1f} ms, full {d2*1e3:.1f} ms", flush=True)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
