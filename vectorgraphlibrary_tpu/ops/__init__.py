from . import monoid, advance, compute, reduce, frontier_ops
