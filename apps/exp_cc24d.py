"""r5: which destination tile class makes the in-situ min reduce cost ~180ms?
Times _reduce_dst_tiles over a REAL routed slot array (shard 0 of scale-24),
full vs per-class (huge-only / wide-only / flat-only), min vs add."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
from vectorgraphlibrary_tpu.graph import persistence
from vectorgraphlibrary_tpu.ops import monoid as M, tiles as T
from vectorgraphlibrary_tpu.ops.advance import _reduce_dst_tiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def sync(x): return float(np.asarray(x.ravel()[0]))

def timeit(fn, *args, reps=3):
    sync(fn(*args)); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

def reduce_class(dg, finished, mon, dtype, v_pad, ident, klass):
    import jax.lax as lax
    parts = []
    offset = 0
    acc = jnp.zeros((), jnp.float32)
    if dg.huge is not None:
        h = dg.huge
        size = h.n_chunks_pad * h.chunk_w
        if klass in ("huge", "all"):
            vals = lax.dynamic_slice_in_dim(finished, offset, size).reshape(
                h.n_chunks_pad, h.chunk_w)
            cr = mon.reduce_axis(vals, 1)
            seg = mon.segment_reduce(cr, h.seg_ids, h.n_rows + 1,
                                     indices_are_sorted=True)
            acc = acc + seg[0].astype(jnp.float32)
        offset += size
    for b in dg.buckets:
        is_flat = b.width < 128
        take = (klass == "all" or (klass == "flat" and is_flat)
                or (klass == "wide" and not is_flat))
        if take:
            shape = ((b.slots // 128, 128) if is_flat else (b.rows_pad, b.width))
            vals = lax.dynamic_slice_in_dim(finished, offset, b.slots).reshape(shape)
            if is_flat:
                r = T.group_reduce_flat(vals, b.width, mon, b.rows)
            else:
                r = mon.reduce_axis(vals, 1)[:b.rows]
            acc = acc + r[0].astype(jnp.float32)
        offset += b.slots
    return acc

def main():
    g = persistence.load_graph_from_binary_file(
        os.path.join(REPO, ".cache", "rmat24_16_slim.shard0.npz"))
    print("loaded shard0", flush=True)
    n = g.advance_route.n
    rng = np.random.default_rng(0)
    ri = jnp.asarray(rng.integers(0, 1 << 24, n).astype(np.int32))
    rf = jnp.asarray(rng.random(n).astype(np.float32))
    out = {}
    for cname, x in (("min", ri), ("min_f32", rf), ("add", rf)):
        mon = M.get("min" if cname.startswith("min") else "add")
        ident = mon.identity(x.dtype)
        for klass in ("all", "huge", "wide", "flat"):
            f = jax.jit(lambda fin, k=klass, mon=mon, ident=ident:
                        reduce_class(g.incoming, fin, mon, fin.dtype,
                                     g.v_pad, ident, k))
            dt = timeit(f, x)
            out[f"red_{cname}_{klass}_ms"] = round(dt*1e3, 1)
            print(f"reduce {cname:8s} {klass:5s}: {dt*1e3:7.1f} ms", flush=True)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
