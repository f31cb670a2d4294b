"""r5 (VERDICT r4 #3b): what does a BFS or-scatter really cost at sparse-push
sizes, and can a single fused kernel beat the ~7-op XLA chain?
Measures at ecap 2^15..2^17 into v_pad 2^20:
  a) at[].max scatter (current path's final stage)
  b) lax.sort + at[].max(indices_are_sorted=True)
  c) Pallas kernel: out int32 [v_pad] VMEM-resident, grid-sequential
     scalar-loop or-scatter (single kernel, no XLA passes)
"""
import functools, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

def sync(x): return float(np.asarray(x.ravel()[0]))

def timeit(fn, *args, reps=3):
    sync(fn(*args)); ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); sync(fn(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

V = 1 << 20
REP = 8

@jax.jit
def a_scatter(dsts, out):
    def body(i, o):
        return o.at[dsts + i].max(1, mode="drop")
    return jax.lax.fori_loop(0, REP, body, out)

@jax.jit
def b_sorted(dsts, out):
    def body(i, o):
        s = jax.lax.sort(dsts + i)
        return o.at[s].max(1, mode="drop", indices_are_sorted=True)
    return jax.lax.fori_loop(0, REP, body, out)

def _kern(dst_ref, out_ref):
    # out [V//128, 128] VMEM; per dst: load its 128-lane row, OR a one-hot,
    # store back (scalar dynamic index on the SUBLANE dim is legal)
    blk = dst_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    def body(j, _):
        idx = dst_ref[j]
        @pl.when(idx < V)
        def _():
            row = idx // 128
            lane = idx % 128
            cur = out_ref[row, :]
            out_ref[row, :] = cur | (lanes[0] == lane).astype(jnp.int32)
        return 0
    jax.lax.fori_loop(0, blk, body, 0)

def make_c(ecap):
    grid = max(ecap // 4096, 1)
    f = pl.pallas_call(
        _kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((4096,), lambda i: (i,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((V // 128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V // 128, 128), jnp.int32),
        input_output_aliases={},
    )
    @jax.jit
    def run(dsts):
        def body(i, acc):
            return acc + f(dsts + i)[0, 0]
        return jax.lax.fori_loop(0, REP, body, jnp.int32(0))
    return run

def main():
    rng = np.random.default_rng(0)
    out = {}
    for lg in (15, 16, 17):
        ecap = 1 << lg
        dsts = jnp.asarray(rng.integers(0, V, ecap).astype(np.int32))
        o0 = jnp.zeros(V, jnp.int32)
        for name, f in (("a_scatter", a_scatter), ("b_sorted", b_sorted)):
            dt = timeit(f, dsts, o0) / REP
            out[f"{name}_2^{lg}_ms"] = round(dt*1e3, 2)
            print(f"{name} 2^{lg}: {dt*1e3:.2f} ms", flush=True)
        try:
            fc = make_c(ecap)
            dt = timeit(fc, dsts) / REP
            out[f"c_pallas_2^{lg}_ms"] = round(dt*1e3, 2)
            print(f"c_pallas 2^{lg}: {dt*1e3:.2f} ms", flush=True)
        except Exception as ex:
            print(f"c_pallas 2^{lg}: FAILED {type(ex).__name__}: {str(ex)[:300]}", flush=True)
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
