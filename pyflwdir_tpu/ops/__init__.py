"""Data-parallel flow-graph kernels (pointer doubling, stencils, fixpoints)."""

from . import fill, graph, order, plan, stencil, walk
from .graph import (
    accumulate,
    accumulate_downstream,
    fillnodata_downstream,
    fillnodata_upstream,
    main_upstream,
    path_reduce,
    path_sum,
    pit_mask,
    propagate_downstream,
    rank,
    reach,
    roots,
    self_loop,
    upstream_count,
    valid_mask,
)

__all__ = [
    "graph",
    "fill",
    "order",
    "plan",
    "stencil",
    "walk",
    "accumulate",
    "accumulate_downstream",
    "fillnodata_downstream",
    "fillnodata_upstream",
    "main_upstream",
    "path_reduce",
    "path_sum",
    "pit_mask",
    "propagate_downstream",
    "rank",
    "reach",
    "roots",
    "self_loop",
    "upstream_count",
    "valid_mask",
]
