from . import timer, perf_stats
