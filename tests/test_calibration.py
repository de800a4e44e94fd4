import numpy as np
import scipy.special

from bayesdll_tpu.utils import calibration


def _ref_metrics(labels, logits, num_bins, temperature=1.0):
    """Numpy transcription of the reference's binning + metrics
    (reference `calibration.py:24-67,242-249`)."""
    k = logits.shape[1]
    labels_oneh = np.eye(k)[labels].flatten()
    preds = scipy.special.softmax(logits / temperature, axis=1).flatten()
    bins = np.linspace(0, 1 + 1e-8, num_bins + 1)[1:]
    binned = np.digitize(preds, bins)
    bin_accs = np.zeros(num_bins)
    bin_confs = np.zeros(num_bins)
    bin_sizes = np.zeros(num_bins)
    for b in range(num_bins):
        sel = binned == b
        bin_sizes[b] = sel.sum()
        if bin_sizes[b] > 0:
            bin_accs[b] = labels_oneh[sel].sum() / bin_sizes[b]
            bin_confs[b] = preds[sel].sum() / bin_sizes[b]
    ece = (np.abs(bin_accs - bin_confs) * bin_sizes / bin_sizes.sum()).sum()
    mce = np.abs(bin_accs - bin_confs).max()
    z = logits / temperature
    nll = np.mean(scipy.special.logsumexp(z, axis=1)
                  - z[np.arange(len(labels)), labels])
    return ece, mce, nll


def test_metrics_match_reference_implementation():
    rng = np.random.RandomState(0)
    logits = rng.randn(200, 5).astype(np.float32) * 3
    labels = rng.randint(0, 5, size=200)
    for temp in (1.0, 2.5):
        ece_r, mce_r, nll_r = _ref_metrics(labels, logits, 15, temp)
        ece, mce, nll = calibration.compute_metrics(labels, logits, 15, temp)
        assert abs(ece - ece_r) < 1e-5
        assert abs(mce - mce_r) < 1e-5
        assert abs(nll - nll_r) < 1e-5


def test_perfectly_calibrated_ece_zero():
    # One-hot-certain predictions, always correct -> ECE 0 in the top bin.
    n, k = 64, 4
    labels = np.arange(n) % k
    logits = np.full((n, k), -20.0, np.float32)
    logits[np.arange(n), labels] = 20.0
    ece, mce, nll = calibration.compute_metrics(labels, logits, 15)
    assert ece < 1e-5
    assert nll < 1e-5


def test_temperature_scaling_recovers_scale():
    # Logits deliberately over-sharpened by 4x: optimal T should be ~4.
    rng = np.random.RandomState(1)
    true_logits = rng.randn(2000, 3) * 2.0
    probs = scipy.special.softmax(true_logits, axis=1)
    labels = np.array([rng.choice(3, p=p) for p in probs])
    sharp_logits = true_logits * 4.0
    topt, success = calibration.find_optimal_temperature(labels, sharp_logits)
    assert success
    assert 3.0 < topt < 5.5
    # NLL at Topt must beat NLL at T=1
    _, _, nll_t1 = calibration.compute_metrics(labels, sharp_logits, 15, 1.0)
    _, _, nll_topt = calibration.compute_metrics(labels, sharp_logits, 15, topt)
    assert nll_topt < nll_t1
