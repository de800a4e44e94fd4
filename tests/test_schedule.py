import numpy as np

from bayesdll_tpu.core.schedule import CyclicalSchedule


def _ref_lr(base_lr, m, epochs, bpe, epoch, batch):
    """Hand transcription of the reference formula
    (reference `methods/cyclical.py:29-45`)."""
    K = epochs * bpe
    cl = K // m
    k = epoch * bpe + batch + 1
    cycle_pos = ((k - 1) % cl) / cl
    return base_lr * (1 + np.cos(np.pi * cycle_pos)) / 2


def test_lr_matches_reference_formula():
    sch = CyclicalSchedule(base_lr=0.1, num_cycles=4, epochs=8,
                           batches_per_epoch=10)
    for ep in range(8):
        for b in range(10):
            step = ep * 10 + b
            expect = _ref_lr(0.1, 4, 8, 10, ep, b)
            assert abs(sch.lr_py(step) - expect) < 1e-12
            assert abs(float(sch.lr(np.int32(step))) - expect) < 1e-6


def test_lr_starts_high_ends_low_per_cycle():
    sch = CyclicalSchedule(base_lr=0.1, num_cycles=2, epochs=4,
                           batches_per_epoch=50)
    cl = sch.cycle_length_int
    assert abs(sch.lr_py(0) - 0.1) < 1e-12           # cycle start: base_lr
    assert sch.lr_py(cl - 1) < 0.001                  # cycle end: ~0
    assert abs(sch.lr_py(cl) - 0.1) < 1e-12           # restart


def test_sampling_phase_boundary():
    sch = CyclicalSchedule(base_lr=0.1, num_cycles=2, epochs=4,
                           batches_per_epoch=25, proportion_exploration=0.5)
    cl = sch.cycle_length_float
    for step in range(int(2 * cl)):
        cycle_pos = (step % cl) / cl
        assert sch.should_sample_py(step) == (cycle_pos >= 0.5)


def test_last_in_cycle_and_cycle_number():
    sch = CyclicalSchedule(base_lr=0.1, num_cycles=4, epochs=8,
                           batches_per_epoch=10)
    cl = sch.cycle_length_float  # 20.0
    lasts = [s for s in range(80) if sch.last_in_cycle_py(s)]
    assert lasts == [int(cl) - 1, int(2 * cl) - 1, int(3 * cl) - 1,
                     int(4 * cl) - 1]
    assert sch.cycle_number_py(0) == 1
    assert sch.cycle_number_py(int(cl)) == 2
    assert sch.cycle_number_py(79) == 4
