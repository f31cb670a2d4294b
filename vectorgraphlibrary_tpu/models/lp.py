"""Label propagation (community detection).

Capability match for the reference LP (`algorithms/lp/lp.h:15-27`): iterative
mode-of-neighbor-labels until stable. The reference ships GPU + sequential variants
only (no NEC implementation, SURVEY.md §2.5); here: a TPU variant computing the
neighborhood mode per degree bucket by sorting each padded ELL row (jnp.sort along
the width axis) and taking the longest run — a fully vectorized mode with no
scatter. Huge-class rows (deg > cfg.huge_degree_threshold) use their first
row-chunk's mode (a documented sampling approximation for hub vertices, akin to the
reference GPU active-condition policies in lp_constants.h).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraversalDirection
from ..graph.device import VGLGraph
from ..graph.vertices import VertexArray
from . import common

G, O = TraversalDirection.GATHER, TraversalDirection.ORIGINAL
_BIG = jnp.int32(2**31 - 1)


def _row_mode(sorted_rows: jax.Array, fallback: jax.Array) -> jax.Array:
    """Mode of each row of an ascending-sorted [rows, W] array; padding = _BIG.
    Ties break toward the smaller label (first-longest run wins argmax)."""
    rows, w = sorted_rows.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    newrun = jnp.concatenate([
        jnp.ones((rows, 1), bool),
        sorted_rows[:, 1:] != sorted_rows[:, :-1]], axis=1)
    start = jax.lax.cummax(jnp.where(newrun, idx, -1), axis=1)
    runlen = idx - start + 1
    valid = sorted_rows < _BIG
    runlen = jnp.where(valid, runlen, 0)
    best = jnp.argmax(runlen, axis=1)
    mode = jnp.take_along_axis(sorted_rows, best[:, None], axis=1)[:, 0]
    any_valid = valid[:, 0]
    return jnp.where(any_valid, mode, fallback)


@jax.jit
def _lp_step(graph: VGLGraph, labels_g: jax.Array):
    """One LP round in GATHER ordering: labels <- mode of in-neighbor labels."""
    dg = graph.incoming
    v_pad = graph.v_pad
    parts = []
    covered = 0
    if dg.huge is not None:
        h = dg.huge
        vals = jnp.take(labels_g, h.adj, mode="clip")
        vals = jnp.where(h.adj < v_pad, vals, _BIG)
        srt = jnp.sort(vals, axis=1)
        chunk_mode = _row_mode(srt, _BIG)
        # first chunk of each row (chunks are row-major per vertex)
        first = jnp.concatenate([
            jnp.ones((1,), bool), h.seg_ids[1:] != h.seg_ids[:-1]])
        row_mode = jnp.full((h.n_rows + 1,), _BIG, jnp.int32).at[
            jnp.where(first, h.seg_ids, h.n_rows)].min(
            chunk_mode.astype(jnp.int32), mode="drop")
        fallback = jax.lax.dynamic_slice_in_dim(labels_g, 0, h.n_rows)
        got = row_mode[:h.n_rows]
        parts.append(jnp.where(got < _BIG, got, fallback))
        covered = h.n_rows
    for b in dg.buckets:
        adj = b.adj.reshape(b.rows_pad, b.width) if b.flat else b.adj
        vals = jnp.take(labels_g, adj, mode="clip")
        vals = jnp.where(adj < v_pad, vals, _BIG)
        srt = jnp.sort(vals, axis=1)
        fallback = jax.lax.dynamic_slice_in_dim(labels_g, b.row_start, b.rows_pad)
        parts.append(_row_mode(srt, fallback)[:b.rows])
        covered = b.row_start + b.rows
    if covered < v_pad:
        parts.append(jax.lax.dynamic_slice_in_dim(
            labels_g, covered, v_pad - covered))
    new = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    changes = jnp.sum(new != labels_g, dtype=jnp.int32)
    return new, changes


def vgl_label_propagation(graph: VGLGraph, max_iterations: int = 20
                          ) -> tuple[VertexArray, int]:
    """Labels start as ORIGINAL vertex ids (converted to GATHER ordering)."""
    ids = jnp.arange(graph.v_pad, dtype=jnp.int32)
    labels_o = jnp.where(ids < graph.v, ids, _BIG)
    labels = jnp.take(labels_o, graph.incoming.sorted_to_orig, mode="clip")
    it = 0
    for it in range(1, max_iterations + 1):
        labels, changes = _lp_step(graph, labels)
        if int(changes) == 0:
            break
    out = jnp.take(labels, graph.incoming.orig_to_sorted, mode="clip")
    return VertexArray(values=out, direction=O), it


def seq_label_propagation(ec, max_iterations: int = 20) -> np.ndarray:
    """Sequential oracle with the same synchronous mode semantics (mode over
    in-neighbors, ties to smaller label, keep own label if no in-neighbors)."""
    v = ec.vertices_count
    labels = np.arange(v, dtype=np.int64)
    # adjacency with multiplicity preserved (parallel edges weight the mode,
    # matching the device semantics); csr_matrix would collapse duplicates
    order = np.argsort(ec.dst_ids, kind="stable")
    indices = ec.src_ids[order]
    counts = np.bincount(ec.dst_ids, minlength=v)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    for _ in range(max_iterations):
        new = labels.copy()
        for u in range(v):
            nb = labels[indices[indptr[u]:indptr[u + 1]]]
            if len(nb) == 0:
                continue
            vals, counts = np.unique(nb, return_counts=True)
            new[u] = vals[np.argmax(counts)]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels.astype(np.int32)
