"""Multi-host execution path (SURVEY.md §5.8; VERDICT r1 missing #4):
2 local processes x 4 virtual CPU devices each run a chain-sharded sampler
step over one GLOBAL ('chain','data') mesh, collectives riding Gloo/TCP —
the CPU stand-in for a multi-host TPU pod with DCN."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from bayesdll_tpu.parallel import init_distributed, make_mesh
init_distributed(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 8, len(jax.devices())   # global device view

import numpy as np
from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.models import create_backbone
from bayesdll_tpu.parallel import MultiChainTrainer

cfg = Config(method="sgld", dataset="synthetic", backbone="mlp_mnist",
             epochs=1, batch_size=32, lr=1e-2,
             hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.1",
                      "burnin": "0", "thin": "1", "bias": "informative",
                      "nst": "2"})
model, shape, _ = create_backbone("mlp_mnist", num_classes=10, width=16,
                                  depth=2)
target, theta_init, net_state = make_flat_target(
    model, (784,), nd_size=256, num_classes=10, rng=jax.random.PRNGKey(0))
runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)

mesh = make_mesh(2, 4)   # 2 chains x 4 data shards ACROSS the 2 processes
trainer = MultiChainTrainer(runner, mesh)
trainer._epoch_begin_chains(0)

rng = np.random.RandomState(0)   # identical global batches on each process
for step in range(3):
    x = rng.randn(2, 32, 784).astype(np.float32)
    y = rng.randint(0, 10, (2, 32)).astype(np.int32)
    loss_c, err_c = trainer.step(x, y, runner.step_scalars(0))
    print(f"STEP {step} pid {pid} loss {np.asarray(loss_c).tolist()}",
          flush=True)

# host-fetch, checkpoint save/load, and Gaussian-mixture eval must all work
# with chain-sharded arrays spanning the OTHER process's devices.
# workdir is SHARED across processes: under multi-process the auto backend
# picks orbax, where every process writes its own shards of one checkpoint
# directory (no process_allgather materialization — VERDICT r3 missing #5)
from bayesdll_tpu.parallel.runner import MultiChainRunner, _fetch_global
mcr = MultiChainRunner(runner, mesh, workdir=f"/tmp/mh_test_{port}")
mcr.trainer = trainer
means, vars_ = trainer.chain_mean_vars()
m_np = _fetch_global(means)
assert m_np.shape == (2, target.dim), m_np.shape
assert mcr._use_orbax()   # auto backend => orbax under multi-process
ckpt_path = mcr.save_ckpt(0)
assert os.path.isdir(ckpt_path), ckpt_path
theta_before = _fetch_global(trainer.states.theta)
mcr.load_ckpt(ckpt_path)
theta_after = _fetch_global(mcr.trainer.states.theta)
assert (theta_before == theta_after).all()
print(f"ORBAX pid {pid} roundtrip ok", flush=True)

# the pickle backend stays available when forced
mcr.cfg.ckpt_backend = "pickle"
pkl_path = mcr.save_ckpt(0, fname=f"chains_ckpt_{pid}.pkl")
mcr.load_ckpt(pkl_path)
mcr.cfg.ckpt_backend = "auto"
loader = [(x[0], y[0], np.ones(32, np.float32))]
pack = mcr.evaluate(loader)   # dispatches to the Gaussian-mixture path
print(f"EVAL pid {pid} loss {float(pack[0]):.6f}", flush=True)

# cyclical multi-chain path under multi-process sharding: one epoch of
# csghmc with a cycle boundary exercises _cyclical_after_batch's
# host-fetches, the vmapped chain likelihoods, and the GMM evaluate
from bayesdll_tpu.data.loader import ArrayLoader
from bayesdll_tpu.parallel.runner import MultiChainRunner as MCR
rng2 = np.random.RandomState(7)
xs_all = rng2.randn(128, 784).astype(np.float32)
ys_all = rng2.randint(0, 10, 128).astype(np.int32)
tr_loader = ArrayLoader(xs_all, ys_all, 32, shuffle=True, seed=5,
                        drop_last=True)
te_loader = ArrayLoader(xs_all[:64], ys_all[:64], 32, shuffle=False)
cfg2 = Config(method="csghmc", dataset="synthetic", backbone="mlp_mnist",
              epochs=1, batch_size=32, lr=1e-2, num_cycles=1,
              test_eval_freq=1,
              hparams={"prior_sig": "0.05", "Ninflate": "1.0", "nd": "0.01",
                       "thin": "1", "bias": "informative", "nst": "1",
                       "momentum_decay": "0.05"})
runner2 = get_runner_cls("csghmc")(target, theta_init, net_state, cfg2)
mesh2 = make_mesh(2, 4)
mcr2 = MCR(runner2, mesh2)
res = mcr2.train(tr_loader, None, te_loader)
print(f"CYC pid {pid} nll {res['nll']:.6f}", flush=True)
print(f"DONE pid {pid}", flush=True)
"""


@pytest.mark.slow
def test_two_process_chain_sharded_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    wfile = tmp_path / "worker.py"
    wfile.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen(
        [sys.executable, str(wfile), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo") for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    # both processes observed the identical replicated per-chain losses
    lines0 = [l for l in outs[0].splitlines() if l.startswith("STEP")]
    lines1 = [l for l in outs[1].splitlines() if l.startswith("STEP")]
    assert len(lines0) == 3 and len(lines1) == 3
    for l0, l1 in zip(lines0, lines1):
        assert l0.split("pid 0")[-1] == l1.split("pid 1")[-1], (l0, l1)
    # the fetched (process_allgather'd) eval is identical on both processes
    ev0 = [l for l in outs[0].splitlines() if l.startswith("EVAL")]
    ev1 = [l for l in outs[1].splitlines() if l.startswith("EVAL")]
    assert len(ev0) == 1 and len(ev1) == 1
    # orbax sharded save/restore round-tripped on both processes
    assert "ORBAX pid 0 roundtrip ok" in outs[0]
    assert "ORBAX pid 1 roundtrip ok" in outs[1]
    assert ev0[0].split("pid 0")[-1] == ev1[0].split("pid 1")[-1], (ev0, ev1)
    # cyclical multi-chain (cycle boundary + GMM eval) identical on both
    cy0 = [l for l in outs[0].splitlines() if l.startswith("CYC")]
    cy1 = [l for l in outs[1].splitlines() if l.startswith("CYC")]
    assert len(cy0) == 1 and len(cy1) == 1
    assert cy0[0].split("pid 0")[-1] == cy1[0].split("pid 1")[-1], (cy0, cy1)
    assert "DONE pid 0" in outs[0] and "DONE pid 1" in outs[1]
