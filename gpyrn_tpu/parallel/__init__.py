"""Multi-chip scaling utilities (mesh construction, sharded multi-start
optimization, walker/evidence-sample data parallelism).

The reference package is single-process with no parallelism of any kind
(SURVEY.md §0, §5.8); these are the TPU-native equivalents built on
``jax.sharding.Mesh`` + XLA SPMD collectives over ICI.
"""
from gpyrn_tpu.parallel.mesh import (DP_AXIS, LAT_AXIS, make_mesh,
                                     shard_along, use_mesh)
from gpyrn_tpu.parallel.multistart import (make_multistart_step,
                                           multistart_optimize)
from gpyrn_tpu.parallel.panel_fit import PanelEngine, make_panel_engine
from gpyrn_tpu.parallel.iterative_sharded import cg_solve_sharded

__all__ = [
    "DP_AXIS", "LAT_AXIS", "make_mesh", "shard_along", "use_mesh",
    "make_multistart_step", "multistart_optimize",
    "PanelEngine", "make_panel_engine", "cg_solve_sharded",
]
