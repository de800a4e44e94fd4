import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.utils import checkpoint as ocpkt
from tests.helpers import tiny_setup


def test_orbax_state_roundtrip(tmp_path):
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="sghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.1",
                 "burnin": "0", "thin": "1", "bias": "informative",
                 "nst": "2", "momentum_decay": "0.05"},
        epochs=1, batch_size=64, lr=1e-2)
    runner = get_runner_cls("sghmc")(target, theta_init, net_state, cfg)
    runner.epoch_begin(0)
    runner.train_one_epoch(0, train)

    path = str(tmp_path / "orbax_state")
    ocpkt.save(path, runner.state)

    template = runner.init_state(jnp.asarray(theta_init))
    restored = ocpkt.restore(path, template)
    np.testing.assert_array_equal(np.asarray(restored.theta),
                                  np.asarray(runner.state.theta))
    np.testing.assert_array_equal(np.asarray(restored.v),
                                  np.asarray(runner.state.v))
    assert int(restored.moments.cnt) == int(runner.state.moments.cnt)
