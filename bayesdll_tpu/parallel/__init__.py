from bayesdll_tpu.parallel.mesh import init_distributed, make_mesh
from bayesdll_tpu.parallel.chains import MultiChainTrainer

__all__ = ["init_distributed", "make_mesh", "MultiChainTrainer"]
