"""Alias driver matching the reference's `demo_mnist.py` entry point:
enforces the MNIST MLP setup (reference `demo_mnist.py:16-54` defaults:
dataset=mnist, backbone=mlp_mnist, val_heldout=0.1).

  python -m bayesdll_tpu.cli.demo_mnist --method sgld ...
"""

import sys

from bayesdll_tpu.cli import demo


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--dataset" not in argv:
        argv += ["--dataset", "mnist"]
    if "--backbone" not in argv:
        argv += ["--backbone", "mlp_mnist"]
    return demo.main(argv)


if __name__ == "__main__":
    main()
