from bayesdll_tpu.parallel.mesh import init_distributed, make_mesh
from bayesdll_tpu.parallel.chains import MultiChainTrainer
from bayesdll_tpu.parallel.tp import (make_tp_mesh, make_tp_constraints,
                                      shard_runner_for_tp)

__all__ = ["init_distributed", "make_mesh", "MultiChainTrainer",
           "make_tp_mesh", "make_tp_constraints", "shard_runner_for_tp"]
