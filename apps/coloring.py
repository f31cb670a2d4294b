"""Graph coloring benchmark app (reference apps/coloring analog)."""
import sys

import numpy as np

from app_common import run_app
from vectorgraphlibrary_tpu.models import coloring
from vectorgraphlibrary_tpu.utils import verify


def run_round(ec, graph, weights, source, cfg):
    colors, _ = coloring.vgl_coloring(graph)
    return colors.values


def check_round(ec, graph, weights, source, result, cfg):
    return verify.verify_colors(ec, np.asarray(result)[:graph.v])


if __name__ == "__main__":
    sys.exit(run_app("coloring", run_round, check_round, needs_source=False))
