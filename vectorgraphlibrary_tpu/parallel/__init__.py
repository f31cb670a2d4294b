from . import mesh, edge_shard, collectives, distributed
