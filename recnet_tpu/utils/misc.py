"""Small utilities (reference: utils.py)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def sample_n(lst: Sequence, n: int,
             rng: np.random.Generator | None = None) -> List:
    """Sample n items without replacement (reference: utils.py:23-27 —
    dead code there, kept for API completeness)."""
    rng = rng or np.random.default_rng()
    idx = rng.choice(len(lst), n, replace=False)
    return [lst[i] for i in idx]
