"""BFS benchmark app (reference apps/bfs/bfs.cpp analog)."""
import sys

from app_common import run_app
import vectorgraphlibrary_tpu as vgl
from vectorgraphlibrary_tpu.models import bfs
from vectorgraphlibrary_tpu.utils import verify


def run_round(ec, graph, weights, source, cfg):
    if cfg.algorithm_variant == "td":
        return bfs.vgl_top_down(graph, source).values
    return bfs.vgl_bfs(graph, source).values     # direction-optimizing default


def check_round(ec, graph, weights, source, result, cfg):
    from vectorgraphlibrary_tpu.config import TraversalDirection
    arr = vgl.VertexArray(values=result, direction=TraversalDirection.SCATTER)
    got = vgl.as_original_numpy(arr, graph)
    want = bfs.seq_top_down(ec, source)
    return verify.verify_results(got, want)


if __name__ == "__main__":
    sys.exit(run_app("bfs", run_round, check_round))
