"""On-device UQ / calibration metrics: ECE, MCE, NLL, temperature scaling.

TPU-native redesign of the reference's numpy/scipy calibration module
(reference `calibration.py`).  The binning and metric math run as jitted jnp
(segment-sum binning instead of a python loop over bins — reference
`calibration.py:24-67`); the scalar temperature fit and the matplotlib
reliability plot stay on host (they are tiny, post-hoc, and off the hot path).

Definitions (bit-matched to the reference):
  * Binning is over ALL (example, class) pairs: probs and one-hot labels are
    flattened to length N*K (reference `calibration.py:43-51`).
  * bins = right boundaries linspace(0, 1+1e-8, M+1)[1:]; membership by
    digitize (reference `calibration.py:53-55`).
  * ECE = sum_b |acc_b - conf_b| * n_b / N;  MCE = max_b |acc_b - conf_b|
    (reference `calibration.py:242-243`).
  * NLL = mean( logsumexp(logits/T) - (logits/T)[y] )
    (reference `calibration.py:246-249`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize
import scipy.special


@functools.partial(jax.jit, static_argnames=("num_bins",))
def calc_bins(labels, logits, num_bins: int, temperature=1.0):
    """Confidence binning over all (example, class) pairs.

    Returns (bins, bin_accs, bin_confs, bin_sizes) as jnp arrays.
    """
    n, k = logits.shape
    labels_oneh = jax.nn.one_hot(labels, k, dtype=jnp.float32).reshape(-1)
    preds = jax.nn.softmax(logits / temperature, axis=1).reshape(-1)

    bins = jnp.linspace(0.0, 1.0 + 1e-8, num_bins + 1)[1:]
    binned = jnp.searchsorted(bins, preds, side="right")
    binned = jnp.clip(binned, 0, num_bins - 1)

    ones = jnp.ones_like(preds)
    bin_sizes = jax.ops.segment_sum(ones, binned, num_segments=num_bins)
    acc_sum = jax.ops.segment_sum(labels_oneh, binned, num_segments=num_bins)
    conf_sum = jax.ops.segment_sum(preds, binned, num_segments=num_bins)
    nonzero = bin_sizes > 0
    bin_accs = jnp.where(nonzero, acc_sum / jnp.maximum(bin_sizes, 1.0), 0.0)
    bin_confs = jnp.where(nonzero, conf_sum / jnp.maximum(bin_sizes, 1.0), 0.0)
    return bins, bin_accs, bin_confs, bin_sizes


@jax.jit
def nll_from_logits(labels, logits, temperature=1.0):
    """Posterior-predictive NLL (reference `calibration.py:246-249`)."""
    z = logits / temperature
    lse = jax.scipy.special.logsumexp(z, axis=1)
    picked = jnp.take_along_axis(z, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    return jnp.mean(lse - picked)


def compute_metrics(labels, logits, num_bins: int = 15, temperature: float = 1.0):
    """(ece, mce, nll) as python floats."""
    labels = jnp.asarray(labels)
    logits = jnp.asarray(logits, jnp.float32)
    _, bin_accs, bin_confs, bin_sizes = calc_bins(labels, logits, num_bins, temperature)
    gap = jnp.abs(bin_accs - bin_confs)
    ece = float(jnp.sum(gap * bin_sizes / jnp.sum(bin_sizes)))
    mce = float(jnp.max(gap))
    nll = float(nll_from_logits(labels, logits, temperature))
    return ece, mce, nll


def analyze(labels, logits, num_bins: int = 15,
            plot_save_path: Optional[str] = None, temperature: float = 1.0):
    """ECE/MCE/NLL + optional reliability plot (reference `calibration.py:215-259`)."""
    labels_j = jnp.asarray(labels)
    logits_j = jnp.asarray(logits, jnp.float32)
    bins, bin_accs, bin_confs, bin_sizes = calc_bins(
        labels_j, logits_j, num_bins, temperature)
    gap = jnp.abs(bin_accs - bin_confs)
    ece = float(jnp.sum(gap * bin_sizes / jnp.sum(bin_sizes)))
    mce = float(jnp.max(gap))
    nll = float(nll_from_logits(labels_j, logits_j, temperature))
    if plot_save_path is not None:
        draw_reliability_plot(
            np.asarray(bins), np.asarray(bin_accs), plot_save_path,
            title=f"Temperature = {temperature}", ece=ece, mce=mce, nll=nll)
    return ece, mce, nll


def find_optimal_temperature(labels, logits,
                             plot_save_path: Optional[str] = None,
                             max_iter: int = 10000) -> Tuple[float, bool]:
    """Fit T minimising validation NLL (reference `calibration.py:174-211`).

    Scalar 1-D optimisation on host via scipy; returns (Topt, success).
    """
    labels = np.asarray(labels)
    logits = np.asarray(logits, np.float64)

    def fun(t):
        z = logits / t
        return float(np.mean(
            scipy.special.logsumexp(z, axis=1) - z[np.arange(len(labels)), labels]
        ))

    temps, losses = [], []

    def callback(x):
        temps.append(float(np.ravel(x)[0]))
        losses.append(fun(x))

    result = scipy.optimize.minimize(
        fun, np.ones(1), options={"maxiter": max_iter}, callback=callback)
    success = bool(result.success)
    topt = float(np.ravel(result.x)[0]) if result.x is not None else 1.0

    if plot_save_path is not None and temps:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(10, 4))
        plt.subplot(121)
        plt.plot(range(len(temps)), temps)
        plt.title("Temperature T"); plt.xlabel("Iterations")
        plt.subplot(122)
        plt.plot(range(len(losses)), losses)
        plt.title("NLL on validation set"); plt.xlabel("Iterations")
        plt.savefig(plot_save_path, bbox_inches="tight")
        plt.close()
    return topt, success


def draw_reliability_plot(bins, bin_accs, fig_name, title=None,
                          ece=None, mce=None, nll=None):
    """Reliability diagram (reference `calibration.py:70-120`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.patches as mpatches

    bins = np.asarray(bins)
    bin_accs = np.asarray(bin_accs)
    bin_centers = (np.insert(bins, 0, 0)[:-1] + bins) / 2
    width = bin_centers[1] - bin_centers[0] if len(bin_centers) > 1 else 1.0

    fig = plt.figure(figsize=(8, 8))
    ax = fig.gca()
    ax.set_xlim(0, 1 + 1e-8); ax.set_ylim(0, 1)
    plt.xlabel("Confidence"); plt.ylabel("Accuracy")
    ax.set_axisbelow(True)
    ax.grid(color="gray", linestyle="dashed")
    plt.bar(bin_centers, bin_centers, width=width, alpha=0.3,
            edgecolor="black", color="r", hatch="\\")
    plt.bar(bin_centers, bin_accs, width=width, alpha=0.3,
            edgecolor="black", color="b")
    plt.plot([0, 1], [0, 1], "--", color="gray", linewidth=2)
    ax.set_aspect("equal", adjustable="box")
    handles = []
    if ece is not None:
        handles.append(mpatches.Patch(color="green", label=f"ECE = {ece*100:.2f}%"))
    if mce is not None:
        handles.append(mpatches.Patch(color="red", label=f"MCE = {mce*100:.2f}%"))
    if nll is not None:
        handles.append(mpatches.Patch(color="blue", label=f"NLL = {nll:.4f}"))
    if handles:
        plt.legend(handles=handles, loc="lower right")
    if title:
        plt.title(title)
    plt.savefig(fig_name, bbox_inches="tight")
    plt.close()
