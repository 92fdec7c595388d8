"""Testing helpers (reference symtensor/testing/utils.py)."""

from __future__ import annotations

import contextlib
import re
import warnings

import numpy as np


@contextlib.contextmanager
def does_not_warn(category=Warning, match=None):
    """Inverse of pytest.warns: fail if a matching warning is emitted
    (reference testing/utils.py:3-16).  With `match`, only warnings whose
    message matches the regex count (``re.search``, the same semantics as
    ``pytest.warns(match=...)``)."""
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        yield
    bad = [
        w
        for w in rec
        if issubclass(w.category, category)
        and (match is None or re.search(match, str(w.message)))
    ]
    if bad:
        raise AssertionError(
            f"unexpected warning(s): {[str(w.message) for w in bad]}"
        )


def random_symmetric(rank: int, dim: int, rng=None, dtype=np.float64):
    """Random dense symmetric array (oracle-side, NumPy)."""
    from ..ops.symmetrize import symmetrize

    rng = rng or np.random.default_rng(0)
    if rank == 0:
        return np.asarray(rng.normal(), dtype=dtype)
    a = rng.normal(size=(dim,) * rank).astype(dtype)
    return np.asarray(symmetrize(a), dtype=dtype)
