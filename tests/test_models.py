"""Model-layer tests: polynomial regression and Gaussian moment hierarchy."""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu.models import moments, polynomial
from symtensor_tpu.ops.symmetrize import symmetrize


def test_polynomial_model_forward(rng):
    key = jax.random.PRNGKey(0)
    params = polynomial.init(key, ranks=(1, 2, 3), dim=5, dtype=jnp.float64)
    xs = jnp.asarray(rng.normal(size=(4, 5)))
    out = polynomial.apply_batched(params, xs)
    # oracle from densified coefficient tensors
    expect = np.zeros(4)
    for t in params["terms"].values():
        dense = np.asarray(t.todense())
        r = t.rank
        spec = "".join("abcdef"[:r]) + "," + ",".join(
            f"B{c}" for c in "abcdef"[:r]
        )
        # einsum with batch: build manually
        for b in range(4):
            v = dense
            for _ in range(r):
                v = v @ np.asarray(xs[b])
            expect[b] += float(v)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-10)


def gaussian_moment_oracle(mean, cov, r):
    """Exact E[x^{⊗r}] by brute-force Isserlis over pairings (small d, r<=4)."""
    d = len(mean)
    out = np.zeros((d,) * r)
    idxs = list(itertools.product(range(d), repeat=r))
    # use the recursion directly on dense tensors
    ms = {0: np.ones(()), 1: np.array(mean)}
    m2 = np.array(cov) + np.outer(mean, mean)
    ms[2] = m2
    for k in range(3, r + 1):
        t1 = np.multiply.outer(np.array(mean), ms[k - 1])
        t2 = np.multiply.outer(np.array(cov), ms[k - 2]) * (k - 1)
        ms[k] = np.asarray(symmetrize(t1 + t2))
    return ms[r]


@pytest.mark.parametrize("r", [1, 2, 3, 4, 5])
def test_gaussian_moments_match_oracle(r, rng):
    d = 3
    mean = rng.normal(size=d)
    a = rng.normal(size=(d, d))
    cov = a @ a.T
    ms = moments.gaussian_moments(jnp.asarray(mean), jnp.asarray(cov), r)
    oracle = gaussian_moment_oracle(mean, cov, r)
    np.testing.assert_allclose(
        np.asarray(ms[r - 1].todense()), oracle, rtol=1e-8, atol=1e-10
    )


def test_gaussian_moments_match_montecarlo(rng):
    # independent statistical check of rank-3 moments
    d = 2
    mean = np.array([0.3, -0.1])
    cov = np.array([[0.5, 0.2], [0.2, 0.4]])
    ms = moments.gaussian_moments(jnp.asarray(mean), jnp.asarray(cov), 3)
    samples = rng.multivariate_normal(mean, cov, size=400_000)
    mc = np.einsum("bi,bj,bk->ijk", samples, samples, samples) / len(samples)
    np.testing.assert_allclose(
        np.asarray(ms[2].todense()), mc, atol=0.02
    )


def test_polynomial_expectation(rng):
    d = 3
    mean = rng.normal(size=d)
    a = rng.normal(size=(d, d))
    cov = a @ a.T
    ms = moments.gaussian_moments(jnp.asarray(mean), jnp.asarray(cov), 3)
    A2 = st.FlatSymmetricTensor.from_dense(
        jnp.asarray(symmetrize(rng.normal(size=(d, d))))
    )
    A3 = st.FlatSymmetricTensor.from_dense(
        jnp.asarray(symmetrize(rng.normal(size=(d, d, d))))
    )
    got = float(moments.polynomial_expectation([A2, A3], ms))
    d2 = np.asarray(A2.todense())
    d3 = np.asarray(A3.todense())
    m2 = np.asarray(ms[1].todense())
    m3 = np.asarray(ms[2].todense())
    expect = np.einsum("ij,ij->", d2, m2) + np.einsum("ijk,ijk->", d3, m3)
    np.testing.assert_allclose(got, expect, rtol=1e-7)


def test_hierarchy_step_five_tensor(rng):
    """BASELINE config 4 shape: decomp coupling tensor contracted against a
    5-tensor list of rank-2 moments."""
    d = 5
    A = st.DecompSymmetricTensor(
        rank=3, dim=d,
        weights=jnp.asarray(rng.normal(size=(2,))),
        factors=jnp.asarray(rng.normal(size=(2, d))),
        multiplicities=(3,), dtype=jnp.float64,
    )
    chis = []
    for i in range(d):
        m = rng.normal(size=(d, d))
        chis.append(st.DecompSymmetricTensor.from_matrix(jnp.asarray((m + m.T) / 2)))
    out = moments.hierarchy_step(A, chis, n_times=1)
    assert out.rank == 3 - 1 + 2
    # oracle
    da = np.asarray(A.todense())
    acc = np.zeros((d,) * 4)
    for i in range(d):
        acc += np.multiply.outer(da[i], np.asarray(chis[i].todense()))
    np.testing.assert_allclose(
        np.asarray(out.todense()), np.asarray(symmetrize(acc)), atol=1e-8
    )
