"""CLI driver end-to-end (the reference's demo_mnist/demo_vision surface)."""

import glob
import os

from bayesdll_tpu.cli import demo, pretrain


def test_demo_cli_end_to_end(tmp_path):
    results = demo.main([
        "--method", "sgld",
        "--dataset", "synthetic",
        "--backbone", "mlp_mnist",
        "--epochs", "2",
        "--batch_size", "64",
        "--lr", "2e-2",
        "--log_dir", str(tmp_path),
        "--hparams",
        "prior_sig=1.0,Ninflate=1.0,nd=0.1,burnin=0,thin=2,"
        "bias=informative,nst=2",
    ])
    assert "nll" in results
    # run dir contains logs.txt + artifacts (reference `demo_mnist.py:92-98`)
    logs = glob.glob(str(tmp_path / "**" / "logs.txt"), recursive=True)
    assert logs, "logs.txt not written"
    ckpts = glob.glob(str(tmp_path / "**" / "ckpt.pkl"), recursive=True)
    assert ckpts


def test_demo_cli_resume(tmp_path):
    common = [
        "--method", "vanilla", "--dataset", "synthetic",
        "--backbone", "mlp_mnist", "--batch_size", "64", "--lr", "1e-2",
        "--log_dir", str(tmp_path), "--hparams", "wd=1e-4,bias=penalty",
        "--seed", "3",
    ]
    demo.main(common + ["--epochs", "2"])
    ckpts = glob.glob(str(tmp_path / "**" / "ckpt.pkl"), recursive=True)
    assert ckpts
    results = demo.main(common + ["--epochs", "3", "--resume", ckpts[0]])
    assert "nll" in results


def test_pretrain_cli_default_hparams(tmp_path):
    # override the default burnin=5 so a 2-epoch smoke run reaches eval
    results = pretrain.main([
        "--method", "sghmc", "--dataset", "synthetic",
        "--backbone", "mlp_mnist", "--epochs", "2", "--batch_size", "64",
        "--lr", "1e-2", "--momentum", "0.0", "--log_dir", str(tmp_path),
        "--val_heldout", "0.1",
        "--hparams",
        "prior_sig=1.0,Ninflate=1e3,nd=0.1,burnin=0,thin=2,"
        "bias=informative,nst=2,momentum_decay=0.05",
    ])
    assert "nll" in results


def test_demo_cli_cnn_backbone(tmp_path):
    """cnn_mnist backbone end-to-end (BASELINE.md config 3's 'MNIST CNN')."""
    results = demo.main([
        "--method", "csghmc",
        "--dataset", "synthetic",
        "--backbone", "cnn_mnist",
        "--epochs", "2",
        "--batch_size", "64",
        "--lr", "2e-2",
        "--num_cycles", "2",
        "--log_dir", str(tmp_path),
        "--hparams",
        "prior_sig=0.05,Ninflate=1.0,nd=0.01,thin=2,bias=informative,"
        "nst=2,momentum_decay=0.05",
    ])
    assert "nll" in results
    assert results["test_err"] < 0.6
