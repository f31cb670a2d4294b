"""Microbenchmarks of the random-access primitives that bound the sparse
(frontier-driven) code paths on this TPU: element/row gathers, scatters,
sorts, scans.  Pure synthetic arrays — no graph build — so a full sweep runs
in ~a minute and can be re-run whenever the part or the tunnel changes.

Timing: each op runs K times inside ONE jitted lax.fori_loop with a value
dependency chained through the carry, so per-op time excludes dispatch
(~28 ms on the tunnel) and per-iteration launch (~0.27 ms, subtracted via a
measured empty loop).  Usage:  python apps/ubench_prims.py [K]
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(op, init_carry, k: int):
    """Run carry = op(carry, i) k times in one jit; return seconds/iter."""

    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, k, lambda i, c: op(c, i), c0)

    out = run(init_carry)          # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init_carry)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / k


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)
    results = {}

    # empty-loop baseline (per-iteration launch overhead)
    base = timed_loop(lambda c, i: c + 1, jnp.int32(0), k)
    results["empty_loop_ms"] = base * 1e3

    def rec(name, secs, elems=None, bytes_moved=None):
        ms = max(secs - base, 0.0) * 1e3
        row = {"ms": round(ms, 4)}
        if elems:
            row["ns_per_elem"] = round(ms * 1e6 / elems, 3)
        if bytes_moved:
            row["gbs"] = round(bytes_moved / (ms * 1e-3) / 1e9, 2)
        results[name] = row
        print(name, row, flush=True)

    NT, NI = 1 << 24, 1 << 17          # table 16M, 131k indices
    table = jnp.asarray(rng.integers(0, 100, NT).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, NT, NI).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    # 1. element gather, random indices
    op = lambda c, i: c + jnp.take(table, (idx + c) % NT, mode="clip")
    rec("gather_elem_2e17", timed_loop(op, jnp.zeros(NI, jnp.int32), k), NI)

    # 2. element gather, sorted indices
    op = lambda c, i: c + jnp.take(table, jnp.minimum(idx_sorted + (c % 2),
                                                      NT - 1), mode="clip")
    rec("gather_elem_sorted_2e17",
        timed_loop(op, jnp.zeros(NI, jnp.int32), k), NI)

    # 3. row gathers: [R, W] tables, gather NR rows
    for rw, w in ((1 << 19, 32), (1 << 17, 128), (1 << 14, 1024)):
        t2 = table[: rw * w].reshape(rw, w)
        nr = 1 << 15
        ridx = jnp.asarray(rng.integers(0, rw, nr).astype(np.int32))
        op = lambda c, i, t2=t2, ridx=ridx, rw=rw: c + jnp.take(
            t2, (ridx + c[0, 0]) % rw, axis=0, mode="clip")
        rec(f"gather_rows_{nr}x{w}",
            timed_loop(op, jnp.zeros((nr, w), jnp.int32), k),
            nr, bytes_moved=nr * w * 4)

    # 4. take_along_axis lane shuffle [rows, 1024]
    rows = 1 << 10
    perm = jnp.asarray(
        np.stack([rng.permutation(1024) for _ in range(rows)]).astype(
            np.int32))
    m2 = table[: rows * 1024].reshape(rows, 1024)
    op = lambda c, i: c + jnp.take_along_axis(m2 + c[:, :1], perm, axis=1)
    rec("take_along_axis_1024x1024",
        timed_loop(op, jnp.zeros((rows, 1024), jnp.int32), k),
        rows * 1024, bytes_moved=rows * 1024 * 4)

    # 5. element scatter (max-combine), random targets
    NV = 1 << 20
    sidx = jnp.asarray(rng.integers(0, NV, NI).astype(np.int32))
    vals = jnp.ones(NI, jnp.int32)
    op = lambda c, i: c.at[(sidx + i) % NV].max(vals, mode="drop")
    rec("scatter_max_2e17_into_2e20",
        timed_loop(op, jnp.zeros(NV, jnp.int32), k), NI)

    # 6. element scatter small (2^15 into 2^15 words)
    NW = 1 << 15
    widx = jnp.asarray(rng.integers(0, NW, NW).astype(np.int32))
    wvals = jnp.ones(NW, jnp.int32)
    op = lambda c, i: c.at[(widx + i) % NW].max(wvals, mode="drop")
    rec("scatter_max_2e15_into_2e15",
        timed_loop(op, jnp.zeros(NW, jnp.int32), k), NW)

    # 7. row scatter: set 2^15 rows of 32 into [2^19, 32]
    rw = 1 << 19
    nr = 1 << 15
    rvals = jnp.ones((nr, 32), jnp.int32)
    ridx = jnp.asarray(rng.integers(0, rw, nr).astype(np.int32))
    op = lambda c, i: c.at[(ridx + i) % rw].max(rvals, mode="drop")
    rec(f"scatter_rows_{nr}x32",
        timed_loop(op, jnp.zeros((rw, 32), jnp.int32), k),
        nr, bytes_moved=nr * 32 * 4)

    # 8. sorts
    for n in (1 << 17, 1 << 20):
        keys = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        op = lambda c, i, keys=keys: jnp.sort(keys + c[0])[::1] + c
        rec(f"sort_{n}", timed_loop(op, jnp.zeros(n, jnp.int32), k), n)
        pay = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        op = lambda c, i, keys=keys, pay=pay: jax.lax.sort(
            [keys + c[0], pay], num_keys=1)[1] + c
        rec(f"sort_kv_{n}", timed_loop(op, jnp.zeros(n, jnp.int32), k), n)

    # 9. scans
    for n in (1 << 17, 1 << 20):
        x = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
        op = lambda c, i, x=x: c + jnp.cumsum(x + c[0])
        rec(f"cumsum_{n}", timed_loop(op, jnp.zeros(n, jnp.int32), k), n)
        op = lambda c, i, x=x: jnp.maximum(c, jax.lax.cummax(x + c[0]))
        rec(f"cummax_{n}", timed_loop(op, jnp.zeros(n, jnp.int32), k), n)

    # 10. searchsorted 2^17 queries in 2^20 table
    st = jnp.sort(jnp.asarray(rng.integers(0, 1 << 30, 1 << 20).astype(
        np.int32)))
    q = jnp.asarray(rng.integers(0, 1 << 30, NI).astype(np.int32))
    op = lambda c, i: c + jnp.searchsorted(st, q + c[0]).astype(jnp.int32)
    rec("searchsorted_2e17_in_2e20",
        timed_loop(op, jnp.zeros(NI, jnp.int32), k), NI)

    print(json.dumps({"backend": jax.default_backend(), **results}))


if __name__ == "__main__":
    main()
