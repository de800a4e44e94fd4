from bayesdll_tpu.parallel.mesh import make_mesh
from bayesdll_tpu.parallel.chains import MultiChainTrainer

__all__ = ["make_mesh", "MultiChainTrainer"]
