"""Small utilities: running averages, bit counting, coordinate set ops.

Parity targets in /root/reference/utils.py: AverageMeter (:9), count_bits
(:30), overlapping_mask (:672).  The canonical-sort helpers
(sort_tensor/sort_points, :142-187) have no equivalent here by design —
flat Morton tensors are always in canonical order.
"""

import numpy as np


class AverageMeter:
    """Running average tracker (reference utils.py:9-28)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0


def count_bits(strings):
    """Total bits in a (possibly nested) structure of byte strings
    (reference utils.py:30-50)."""
    if isinstance(strings, (bytes, bytearray)):
        return 8 * len(strings)
    if isinstance(strings, (list, tuple)):
        return sum(count_bits(s) for s in strings)
    if isinstance(strings, dict):
        return sum(count_bits(s) for s in strings.values())
    raise TypeError(f"cannot count bits of {type(strings)}")


def overlapping_mask(keys_a, keys_b, warn_duplicates=True):
    """Boolean mask over keys_a marking members of keys_b (both int64
    Morton-key arrays). Exact set membership — the reference's decimal
    packing hash (utils.py:672-700) is collision-prone by construction."""
    keys_a = np.asarray(keys_a)
    keys_b = np.unique(np.asarray(keys_b))
    idx = np.searchsorted(keys_b, keys_a)
    idx = np.minimum(idx, max(len(keys_b) - 1, 0))
    mask = len(keys_b) > 0
    mask = (keys_b[idx] == keys_a) if mask else np.zeros(len(keys_a), bool)
    if warn_duplicates:
        ua, ca = np.unique(keys_a, return_counts=True)
        if (ca > 1).any():
            print(f"Warning: {int((ca > 1).sum())} duplicate coordinates "
                  "in overlapping_mask input")
    return mask
