"""Sharding tests on the 8-device virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu import parallel, symalg


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return parallel.make_mesh((4, 2), ("dp", "tp"))


def test_poly_eval_sharded_matches_single(mesh, rng):
    rank, dim, B = 3, 10, 8
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    xs = jnp.asarray(rng.normal(size=(B, dim)))
    out = parallel.poly_eval_batched_sharded(A, xs, mesh)
    ref = jax.vmap(
        lambda x: symalg.contract_all_indices_with_vector(A, x)
    )(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-9)


def test_poly_eval_sharded_jit_grad(mesh, rng):
    rank, dim, B = 2, 9, 4
    n = st.utils.indep_size(rank, dim)  # 45: not divisible by 2 → padding
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    xs = jnp.asarray(rng.normal(size=(B, dim)))

    @jax.jit
    def f(A, xs):
        return parallel.poly_eval_batched_sharded(A, xs, mesh).sum()

    dense = np.asarray(A.todense())
    expect = np.einsum("ij,bi,bj->", dense, np.asarray(xs), np.asarray(xs))
    np.testing.assert_allclose(float(f(A, xs)), expect, rtol=1e-9)

    g = jax.grad(lambda xs: f(A, xs))(xs)
    expect_g = 2 * np.einsum("ij,bj->bi", dense, np.asarray(xs))
    np.testing.assert_allclose(np.asarray(g), expect_g, rtol=1e-8)


def test_shard_flat_placement(mesh, rng):
    rank, dim = 2, 15  # n = 120, divisible by 2
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    As = parallel.shard_flat(A, mesh, "tp")
    assert not As.data.sharding.is_fully_replicated
    x = jnp.asarray(rng.normal(size=dim))
    got = float(symalg.contract_all_indices_with_vector(As, x))
    ref = float(symalg.contract_all_indices_with_vector(A, x))
    np.testing.assert_allclose(got, ref, rtol=1e-9)
    with pytest.raises(ValueError):
        parallel.shard_flat(
            st.FlatSymmetricTensor.zeros(2, 9), mesh, "tp"
        )  # 45 not divisible


@pytest.mark.parametrize("rank,dim", [(3, 8), (4, 9), (5, 6)])
def test_poly_eval_sharded_grouped_matches(mesh, rng, rank, dim):
    """Grouped GEMM layout sharded over every group's head axis — the
    production multi-chip path (no O(n) colex tables)."""
    from symtensor_tpu.kernels.poly_eval import poly_eval_flat_batched

    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n), jnp.float32)
    )
    xs = jnp.asarray(rng.normal(size=(8, dim)), jnp.float32)
    got = parallel.poly_eval_batched_sharded_grouped(A, xs, mesh)
    want = poly_eval_flat_batched(A, xs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5
    )
    # views actually live sharded: at least one big group is not replicated
    views = parallel.shard_group_views(A, mesh)
    assert any(not v.sharding.is_fully_replicated for v in views)


def test_basis_change_sharded_matches(mesh, rng):
    """Column-sharded blocked basis change == unsharded (f64, tiny blocks
    force multi-chunk scheduling under sharding)."""
    from symtensor_tpu.ops.basis_change import basis_change_packed

    for rank, dim in [(3, 6), (4, 5)]:
        n = st.utils.indep_size(rank, dim)
        A = st.FlatSymmetricTensor(
            rank=rank, dim=dim,
            data=jnp.asarray(rng.normal(size=n), jnp.float64),
        )
        W = jnp.asarray(rng.normal(size=(dim, dim)))
        want = basis_change_packed(A, W)
        got = basis_change_packed(A, W, mesh=mesh, block_elems=500)
        np.testing.assert_allclose(
            np.asarray(got.data), np.asarray(want.data), atol=1e-12
        )
        # round 5: the output stays tp-SHARDED (the old global-scatter
        # emit left it replicated — A/2 + C/2 residency was fictional)
        spec = got.data.sharding.spec
        assert "tp" in str(spec), spec


def test_basis_change_sharded_oversized_shard_gathers(mesh, rng):
    """A per-shard root above SYMTENSOR_GATHER_MAX_BYTES is gathered in
    masked pieces inside the shard body (round 5; was a hard error)."""
    import os

    from symtensor_tpu.ops.basis_change import basis_change_packed

    rank, dim = 4, 6
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim,
        data=jnp.asarray(rng.normal(size=n), jnp.float64),
    )
    W = jnp.asarray(rng.normal(size=(dim, dim)))
    want = basis_change_packed(A, W)
    os.environ["SYMTENSOR_GATHER_MAX_BYTES"] = "64"  # force many pieces
    try:
        got = basis_change_packed(A, W, mesh=mesh, block_elems=500)
    finally:
        del os.environ["SYMTENSOR_GATHER_MAX_BYTES"]
    np.testing.assert_allclose(
        np.asarray(got.data), np.asarray(want.data), atol=1e-12
    )


def test_model_training_sharded(mesh, rng):
    import optax

    from symtensor_tpu.models import polynomial

    key = jax.random.PRNGKey(0)
    params = polynomial.init(key, ranks=(2, 3), dim=8, dtype=jnp.float64)
    xs = jnp.asarray(rng.normal(size=(16, 8)))
    ys = jnp.asarray(rng.normal(size=(16,)))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, xs, ys):
        return polynomial.train_step(params, opt_state, xs, ys, optimizer)

    l0 = None
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, xs, ys)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0  # training reduces the loss


def test_tensordot_sharded_matches_stream(mesh, rng):
    from symtensor_tpu.ops import outer as outer_mod
    from symtensor_tpu.parallel.sharding import tensordot_sharded

    for (ra, rb, ax) in [(3, 3, 1), (2, 3, 1), (3, 3, 2)]:
        A = st.FlatSymmetricTensor(
            rank=ra, dim=8,
            data=jnp.asarray(rng.normal(size=st.utils.indep_size(ra, 8))),
        )
        B = st.FlatSymmetricTensor(
            rank=rb, dim=8,
            data=jnp.asarray(rng.normal(size=st.utils.indep_size(rb, 8))),
        )
        got = tensordot_sharded(A, B, ax, mesh)
        ref = outer_mod.tensordot(A, B, axes=ax, stream=True)
        np.testing.assert_allclose(
            np.asarray(got.data), np.asarray(ref.data), rtol=1e-12
        )


def test_tensordot_sharded_operands_memory_scaling(mesh, rng):
    """operands='sharded': per-device operand residency is 1/n_tp of each
    value vector (the memory-scaling mode); result matches the
    single-chip streamed op."""
    from symtensor_tpu.ops import outer as outer_mod
    from symtensor_tpu.parallel.sharding import tensordot_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    ntp = mesh.shape["tp"]
    for (ra, rb, ax) in [(3, 3, 1), (2, 3, 1), (3, 3, 2)]:
        na, nb = st.utils.indep_size(ra, 8), st.utils.indep_size(rb, 8)
        # place the operands SHARDED up front — the memory-scaling premise
        # is that the full vectors never sit on one device
        pad_a, pad_b = (-na) % ntp, (-nb) % ntp
        a_dev = jax.device_put(
            jnp.asarray(rng.normal(size=na)), NamedSharding(mesh, P())
        )
        A = st.FlatSymmetricTensor._raw(ra, 8, a_dev)
        B = st.FlatSymmetricTensor._raw(
            rb, 8, jnp.asarray(rng.normal(size=nb))
        )
        got = tensordot_sharded(A, B, ax, mesh, axis="tp",
                                operands="sharded")
        ref = outer_mod.tensordot(A, B, axes=ax, stream=True)
        np.testing.assert_allclose(
            np.asarray(got.data), np.asarray(ref.data), rtol=1e-10
        )
        # residency check: each device's addressable shard of the padded
        # operand holds (na+pad)/ntp values — strictly less than na
        from symtensor_tpu.parallel.sharding import _pad_len

        shard_len = (na + _pad_len(na, ntp)) // ntp
        assert shard_len < na


def test_basis_change_sharded_root_memory(mesh, rng):
    """The t=0 step kernel keeps the root SHARDED: per-device argument
    bytes drop by root·(1−1/n_tp) relative to the replicated-root compile
    of the same kernel (the 'A/n_dev per device' claim of the f32-at-
    rank-6 story, docs/benchmarks.md).  AOT compile + memory_analysis —
    no execution needed."""
    from symtensor_tpu.ops import basis_change as bc
    from symtensor_tpu.utils import combinatorics as comb
    from symtensor_tpu.utils.tables import tables as _tables
    from jax.sharding import NamedSharding, PartitionSpec as P

    r, d = 4, 24
    k = r - 1
    n = comb.indep_size(r, d)         # 17 550
    n_k = comb.indep_size(k, d)       # 2 600
    ntp = mesh.shape["tp"]
    n_pad = n + ((-n) % ntp)
    wp, nsel_pad, seg = 4, 4, 256
    tbl = _tables(r, d).insert_table(k)
    Wm = jnp.zeros((d, d + wp), jnp.float32)
    bs = jnp.zeros((4,), jnp.int32)
    root_sh = jax.device_put(
        jnp.asarray(rng.normal(size=n_pad), jnp.float32),
        NamedSharding(mesh, P("tp")),
    )

    def compile_one(mesh_axis, root):
        kern = bc._step_kernel(
            1, (n_pad,), n_k, d, k, wp, nsel_pad, seg,
            "float32", "float32", False, mesh_axis,
        )
        return kern.lower(
            (root,), tbl, Wm, 0, bs, bs, bs
        ).compile().memory_analysis()

    ma_sharded = compile_one((mesh, "tp"), root_sh)
    ma_repl = compile_one(None, jax.device_put(
        jnp.asarray(root_sh), NamedSharding(mesh, P())
    ))
    root_bytes = n_pad * 4
    saved = ma_repl.argument_size_in_bytes - ma_sharded.argument_size_in_bytes
    expect = root_bytes * (ntp - 1) // ntp
    assert abs(saved - expect) <= 0.1 * root_bytes, (
        f"sharded-root per-device argument bytes save {saved}, "
        f"expected ≈ {expect} (root {root_bytes})"
    )
