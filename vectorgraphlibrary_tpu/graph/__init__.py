from . import build, device, vertices, edges, frontier
