"""r5: grouped-min implementations for flat lane-major buckets.
Current group_reduce_flat uses reshape(m, groups, width)+reduce(axis=2) —
a lane relayout that makes min-pulls 2x add-pulls at scale 24 (330 vs 172 ms).
Candidates measured on [m,128] int32, width in {4,8,16}:
  a) reshape+reduce (current)
  b) roll-chain: log2(w) lane rolls + strided ::width lane slice
  c) pair-halving: log2(w) rounds of min(x[:, ::2], x[:, 1::2])
  d) matmul-compress roll-chain: rolls + exact hi/lo matmul lane selection
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

def sync(x): return float(np.asarray(x.ravel()[0]))

def timeit(fn, *args, reps=3):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0=time.perf_counter(); sync(fn(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

M_ROWS = 1 << 21          # 2^21 x 128 = 2^28 elems (scale-24 slot count)
REP = 4                   # loop inside jit to amortize dispatch

def loop(body, x):
    return jax.lax.fori_loop(0, REP, lambda i, v: body(v) + i, x[: M_ROWS // 1])

def a_reshape(x, w):
    r = jnp.min(x.reshape(M_ROWS, 128 // w, w), axis=2)
    return r

def b_roll(x, w):
    k = 1
    while k < w:
        x = jnp.minimum(x, jnp.roll(x, -k, axis=1))
        k *= 2
    return x[:, ::w]

def c_pair(x, w):
    while w > 1:
        x = jnp.minimum(x[:, ::2], x[:, 1::2])
        w //= 2
    return x

def d_rollmm(x, w):
    k = 1
    while k < w:
        x = jnp.minimum(x, jnp.roll(x, -k, axis=1))
        k *= 2
    sel = (np.arange(128)[:, None] == (np.arange(128 // w) * w)[None, :]
           ).astype(np.float32)
    selj = jnp.asarray(sel)
    hi = jnp.dot((x >> 16).astype(jnp.float32), selj,
                 preferred_element_type=jnp.float32)
    lo = jnp.dot((x & 0xFFFF).astype(jnp.float32), selj,
                 preferred_element_type=jnp.float32)
    return hi.astype(jnp.int32) * 65536 + lo.astype(jnp.int32)

def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 24, (M_ROWS, 128)).astype(np.int32))
    out = {}
    for w in (4, 8, 16):
        ref = np.asarray(a_reshape(x, w))
        for name, fn in (("a_reshape", a_reshape), ("b_roll", b_roll),
                         ("c_pair", c_pair), ("d_rollmm", d_rollmm)):
            got = np.asarray(fn(x, w))
            assert np.array_equal(got, ref), (name, w)
            f = jax.jit(lambda xx, fn=fn, w=w: jax.lax.fori_loop(
                0, REP, lambda i, acc: acc + fn(xx + i, w)[:, :1].astype(jnp.int32).sum(),
                jnp.int32(0)))
            dt = timeit(f, x) / REP
            gbs = M_ROWS * 128 * 4 / dt / 1e9
            out[f"{name}_w{w}_ms"] = round(dt * 1e3, 1)
            print(f"{name} w={w}: {dt*1e3:6.1f} ms  ({gbs:.0f} GB/s in)", flush=True)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
