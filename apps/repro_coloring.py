"""Bisect the scale-18 coloring TPU worker fault (VERDICT r3 weak #5).

Runs the coloring pipeline's pieces from least to most suspect, printing a
marker before each so the crashing stage is identified by the last marker in
the log even if the worker dies.  VGL_REPRO_SCALE / VGL_REPRO_DEG configure
the graph (default 18 / 32 — the faulting bench config).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vectorgraphlibrary_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
from vectorgraphlibrary_tpu.io import generation
from vectorgraphlibrary_tpu.graph.device import import_graph
from vectorgraphlibrary_tpu.models import common, coloring
from vectorgraphlibrary_tpu.config import TraversalDirection

O, S, G = (TraversalDirection.ORIGINAL, TraversalDirection.SCATTER,
           TraversalDirection.GATHER)

SCALE = int(os.environ.get("VGL_REPRO_SCALE", "18"))
DEG = int(os.environ.get("VGL_REPRO_DEG", "32"))


def step(name):
    print(f"=== {name}", flush=True)


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0].ravel()[0]))


def main():
    t0 = time.time()
    ec = generation.rmat(scale=SCALE, avg_degree=DEG, seed=42)
    g = import_graph(ec)
    v_pad = g.v_pad
    print(f"import {time.time()-t0:.0f}s v_pad={v_pad} n={g.advance_route.n}",
          flush=True)
    rng = np.random.default_rng(0)
    prio = jnp.asarray(rng.permutation(v_pad).astype(np.int32))
    colors = jnp.asarray(
        np.where(rng.random(v_pad) < 0.5, rng.integers(0, 64, v_pad), -1)
        .astype(np.int32))

    step("clz on big array")
    x = jnp.asarray(rng.integers(1, 2**31, v_pad).astype(np.int32))
    lsb = x & (-x)
    out = 31 - jnp.clip(jax.lax.clz(lsb.astype(jnp.uint32)).astype(jnp.int32),
                        0, 31)
    sync(out)

    step("banned_word or-pull (single round, w=0)")

    def banned(gg, colors, w):
        def op(s, d, wt):
            c = s["c"]
            in_word = (c >= 0) & (c // 32 == w)
            return jnp.where(in_word, jnp.left_shift(jnp.int32(1), c % 32),
                             jnp.int32(0))
        return common.undirected_pull(gg, {"c": colors}, op, "or")

    sync(jax.jit(lambda gg, c: banned(gg, c, 0))(g, colors))

    step("priority min-pull (2 routed arrays)")

    def prio_pull(gg, colors, prio):
        def op(s, d, wt):
            return jnp.where(s["c"] == coloring.UNCOLORED, s["p"],
                             jnp.int32(2**31 - 1))
        return common.undirected_pull(gg, {"c": colors, "p": prio}, op, "min")

    sync(jax.jit(prio_pull)(g, colors, prio))

    step("one full round body (no while_loop)")

    def one_round(gg, colors, prio):
        words = 2
        uncolored = colors == coloring.UNCOLORED

        def op(s, d, wt):
            return jnp.where(s["c"] == coloring.UNCOLORED, s["p"],
                             jnp.int32(2**31 - 1))
        nb_best = common.undirected_pull(gg, {"c": colors, "p": prio}, op,
                                         "min")
        winner = uncolored & (prio <= nb_best)
        cand = jnp.full(v_pad, jnp.int32(words * 32), jnp.int32)
        for w in range(words):
            bw = banned(gg, colors, w)
            free = jnp.bitwise_not(bw)
            lsb = free & (-free)
            pos = 31 - jnp.clip(jax.lax.clz(lsb.astype(jnp.uint32)).astype(
                jnp.int32), 0, 31)
            cand = jnp.minimum(cand, jnp.where(free != 0, 32 * w + pos,
                                               jnp.int32(words * 32)))
        return jnp.where(winner & (cand < words * 32), cand, colors)

    sync(jax.jit(one_round)(g, colors, prio))

    step("jitted while_loop, 3 rounds")
    sync(coloring._coloring_run(g, prio, 2, 3)[0])

    step("full vgl_coloring")
    cols, rounds = coloring.vgl_coloring(g)
    print("rounds:", rounds, "max color:",
          int(jnp.max(cols.values)), flush=True)

    step("ALL STAGES PASSED")


if __name__ == "__main__":
    main()
