"""Alias driver matching the reference's `demo_mnist.py` entry point:
defaults to the MNIST MLP setup (reference `demo_mnist.py:16-54`).

  python -m bayesdll_tpu.cli.demo_mnist --method sgld ...
"""

from bayesdll_tpu.cli import demo


def main(argv=None):
    argv = list(argv) if argv is not None else None
    return demo.main(argv)


if __name__ == "__main__":
    main()
