from . import common, pr, bfs, sssp
