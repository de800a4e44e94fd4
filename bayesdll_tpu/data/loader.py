"""Host-side array loader with static batch shapes.

Replaces the reference's `torch.utils.data.DataLoader` worker processes
(reference `datasets.py:104`).  Design rules for TPU:
  * Training batches all share one static shape (`drop_last=True`) so the
    jitted train step compiles exactly once.
  * Eval batches are padded to the batch size with a `valid` 0/1 mask so the
    jitted eval step also compiles once; metric code masks out padding.
"""

from __future__ import annotations

import numpy as np


class ArrayLoader:
    def __init__(self, x, y, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, augment_fn=None):
        assert len(x) == len(y)
        self.x = np.asarray(x)
        self.y = np.asarray(y, dtype=np.int32)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._seed = seed
        self._rng = np.random.RandomState(seed)
        self.n = len(x)
        self.augment_fn = augment_fn  # (batch_x, rng) -> batch_x

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def eval_view(self):
        """Un-augmented, unshuffled view over the SAME examples — for passes
        that must see plain train data (LA stage-2 Fisher accumulates over
        un-augmented examples, reference `methods/la.py:375-387`)."""
        return ArrayLoader(self.x, self.y, self.batch_size, shuffle=False,
                           drop_last=False, augment_fn=None)

    def chain_view(self, c: int, epoch: int = 0):
        """View over the SAME examples whose shuffle/augment order is a
        pure function of (seed, chain, epoch).  Multi-chain training
        advances n_chain iterators concurrently — a shared RandomState
        would make the order depend on thread interleaving — and the
        stateless epoch seeding lets a resumed run reproduce any epoch's
        order with no replay of earlier epochs."""
        return ArrayLoader(self.x, self.y, self.batch_size,
                           shuffle=self.shuffle,
                           seed=(self._seed + 7919 * (c + 1)
                                 + 104729 * epoch) % (2 ** 31 - 1),
                           drop_last=self.drop_last,
                           augment_fn=self.augment_fn)

    @property
    def num_examples(self):
        return self.n

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        bs = self.batch_size
        nb = len(self)
        for b in range(nb):
            sel = idx[b * bs:(b + 1) * bs]
            xb, yb = self.x[sel], self.y[sel]
            if self.augment_fn is not None:
                xb = self.augment_fn(xb, self._rng)
            if len(sel) < bs:  # pad final eval batch to static shape
                pad = bs - len(sel)
                xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
                yb = np.concatenate([yb, np.zeros((pad,), yb.dtype)])
                valid = np.concatenate(
                    [np.ones(len(sel), np.float32), np.zeros(pad, np.float32)])
            else:
                valid = np.ones(bs, np.float32)
            yield xb, yb, valid
