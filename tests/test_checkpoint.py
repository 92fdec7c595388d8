"""Checkpoint/resume via orbax on symtensor pytrees (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st


def test_orbax_roundtrip(tmp_path, rng):
    import orbax.checkpoint as ocp

    from symtensor_tpu.models import polynomial

    params = polynomial.init(jax.random.PRNGKey(0), ranks=(2, 3), dim=6)
    ckptr = ocp.PyTreeCheckpointer()
    path = tmp_path / "ckpt"
    ckptr.save(str(path), params)
    restored = ckptr.restore(str(path), item=params)
    for k in params["terms"]:
        a, b = params["terms"][k], restored["terms"][k]
        assert type(b) is type(a)
        assert (b.rank, b.dim) == (a.rank, a.dim)
        assert a.array_equal(b)
