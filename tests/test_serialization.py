"""Serialization round-trips (reference testing/api.py:412-424 analog) +
pytree checkpointability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu import serialization as ser
from symtensor_tpu.ops.symmetrize import symmetrize


def random_sym(rank, dim, rng):
    return np.asarray(symmetrize(rng.normal(size=(dim,) * rank)))


@pytest.mark.parametrize(
    "fmt", [st.DenseSymmetricTensor, st.FlatSymmetricTensor, st.PermClsSymmetricTensor]
)
def test_json_roundtrip(fmt, rng):
    A = fmt.from_dense(random_sym(3, 4, rng))
    B = ser.from_json(ser.to_json(A))
    assert type(B) is type(A)
    assert (B.rank, B.dim) == (A.rank, A.dim)
    assert A.allclose(B, rtol=1e-12, atol=1e-12)


def test_json_roundtrip_decomp(rng):
    A = st.DecompSymmetricTensor(
        rank=3,
        dim=4,
        weights=jnp.asarray(rng.normal(size=(2, 2))),
        factors=jnp.asarray(rng.normal(size=(2, 4))),
        multiplicities=(2, 1),
    )
    B = ser.from_json(ser.to_json(A))
    assert B.multiplicities == (2, 1)
    assert A.toflat().allclose(B.toflat())


def test_json_scalar_compression_preserved(rng):
    A = st.PermClsSymmetricTensor(rank=3, dim=6, data={"iii": 2.0})
    B = ser.from_json(ser.to_json(A))
    assert set(B.scalar_classes) == set(A.scalar_classes)
    assert A.allclose(B)


@pytest.mark.parametrize(
    "fmt", [st.FlatSymmetricTensor, st.PermClsSymmetricTensor]
)
def test_npz_roundtrip(fmt, tmp_path, rng):
    A = fmt.from_dense(random_sym(4, 3, rng))
    p = str(tmp_path / "t.npz")
    ser.save(p, A)
    B = ser.load(p)
    assert type(B) is type(A)
    assert A.array_equal(B)


def test_npz_roundtrip_decomp(tmp_path, rng):
    A = st.DecompSymmetricTensor.from_vector(jnp.asarray(rng.normal(size=5)), 3)
    p = str(tmp_path / "d.npz")
    ser.save(p, A)
    B = ser.load(p)
    assert B.multiplicities == A.multiplicities
    assert A.toflat().array_equal(B.toflat())


def test_pytree_checkpoint_shape(rng):
    """Any tensor is a pytree of arrays — flatten/unflatten round-trips, so
    orbax-style checkpointing works out of the box."""
    A = st.PermClsSymmetricTensor.from_dense(random_sym(3, 4, rng))
    leaves, treedef = jax.tree.flatten(A)
    as_np = [np.asarray(l) for l in leaves]  # what a checkpointer stores
    B = jax.tree.unflatten(treedef, [jnp.asarray(a) for a in as_np])
    assert A.array_equal(B)


def test_npz_path_without_suffix(tmp_path, rng):
    A = st.FlatSymmetricTensor.from_dense(random_sym(2, 3, rng))
    p = str(tmp_path / "noext")
    ser.save(p, A)
    B = ser.load(p)
    assert A.array_equal(B)
