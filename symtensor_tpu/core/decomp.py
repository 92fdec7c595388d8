"""DecompSymmetricTensor — outer-product (CP-style) format.

T = Symmetrize( Σ_{a1…ak} w[a1…ak] · f_{a1}^{⊗m1} ⊗ … ⊗ f_{ak}^{⊗mk} )

with weights ``w`` (rank-k tensor over the factor index), factors ``f``
(num_factors × dim) and multiplicities ``(m1…mk)``, symmetrization performed
lazily on retrieval — the reference's ``DecompSymmetricTensor``
(symtensor/decomp_symmtensor.py:14-37). Basis change is an O(1)-in-rank
factor transform (decomp_symmtensor.py:1012) and polynomial evaluation is
O(num_factors·dim) (ibid.:67-71).

Improvements over the reference (SURVEY.md §7): einsum specs are *generated*
for any number of independent factors (the reference hard-codes rank ≤ 4
tables, decomp_symmtensor.py:473-791, and caps num_indep_factors at 4);
element retrieval uses the position-subset identity shared with ops/outer.py.
"""

from __future__ import annotations

import itertools
import string
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import combinatorics as comb
from ..utils.precision import value_prec
from .base import SymmetricTensor, default_dtype
from .flat import FlatSymmetricTensor

_LETTERS = string.ascii_lowercase


@jax.tree_util.register_pytree_node_class
class DecompSymmetricTensor(SymmetricTensor):
    format = "decomp"

    def __init__(
        self,
        rank: Optional[int] = None,
        dim: Optional[int] = None,
        weights=None,
        factors=None,
        multiplicities: Optional[Tuple[int, ...]] = None,
        dtype=None,
    ):
        if rank is None or dim is None:
            raise ValueError("need rank and dim")
        rank, dim = int(rank), int(dim)
        dtype = dtype or default_dtype()
        if multiplicities is None:
            multiplicities = (rank,) if rank > 0 else ()
        multiplicities = tuple(int(m) for m in multiplicities)
        if sum(multiplicities) != rank:
            raise ValueError(
                f"multiplicities {multiplicities} must sum to rank {rank}"
            )
        if any(m <= 0 for m in multiplicities):
            raise ValueError("multiplicities must be positive")
        k = len(multiplicities)
        if weights is None and factors is None:
            # empty decomposition == zero tensor with one zero factor
            factors = jnp.zeros((1, dim), dtype=dtype)
            weights = jnp.zeros((1,) * k if k else (), dtype=dtype)
        weights = jnp.asarray(weights, dtype=dtype)
        factors = jnp.asarray(factors, dtype=dtype)
        if factors.ndim != 2 or factors.shape[1] != dim:
            raise ValueError(
                f"factors must be (num_factors, {dim}); got {factors.shape}"
            )
        F = factors.shape[0]
        if weights.shape != (F,) * k:
            raise ValueError(
                f"weights must be {(F,) * k} for {k} independent factors; "
                f"got {weights.shape}"
            )
        self.rank, self.dim = rank, dim
        self.weights, self.factors = weights, factors
        self.multiplicities = multiplicities

    # ------------------------------------------------------------- pytree

    def tree_flatten(self):
        return (self.weights, self.factors), (
            self.rank,
            self.dim,
            self.multiplicities,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.rank, obj.dim, obj.multiplicities = aux
        obj.weights, obj.factors = leaves
        return obj

    @classmethod
    def _raw(cls, rank, dim, weights, factors, multiplicities):
        return cls.tree_unflatten((rank, dim, tuple(multiplicities)),
                                  (weights, factors))

    # ------------------------------------------------------------ creation

    @classmethod
    def from_vector(cls, v, rank: int) -> "DecompSymmetricTensor":
        """T = v^⊗rank (reference decomp_tensor_from_vector,
        decomp_symmtensor.py:1652)."""
        v = jnp.asarray(v)
        return cls._raw(
            rank,
            v.shape[0],
            jnp.ones((1,), dtype=v.dtype),
            v[None, :],
            (rank,),
        )

    @classmethod
    def from_matrix(
        cls, mat, cutoff: float = 1e-12, top_k: Optional[int] = None
    ) -> "DecompSymmetricTensor":
        """Rank-2 tensor from a symmetric matrix via eigendecomposition,
        dropping (near-)zero eigenvalues (reference
        decomp_tensor_from_matrix, decomp_symmtensor.py:1617, and
        decomp_utils.py:4-47)."""
        mat = jnp.asarray(mat)
        w, v = jnp.linalg.eigh(mat)
        if isinstance(w, jax.core.Tracer):
            keep = jnp.ones_like(w, dtype=bool)  # cannot prune traced
            weights, vecs = w, v
        else:
            keep = np.abs(np.asarray(w)) > cutoff
            if top_k is not None:
                order = np.argsort(-np.abs(np.asarray(w)))
                sel = np.zeros_like(keep)
                sel[order[:top_k]] = True
                keep = keep & sel
            if not keep.any():
                keep = np.zeros_like(keep)
                keep[int(np.argmax(np.abs(np.asarray(w))))] = True
            weights, vecs = w[np.nonzero(keep)[0]], v[:, np.nonzero(keep)[0]]
        return cls._raw(
            2, mat.shape[0], weights, vecs.T, (2,)
        )

    @classmethod
    def zeros(cls, rank: int, dim: int, dtype=None) -> "DecompSymmetricTensor":
        return cls(rank=rank, dim=dim, dtype=dtype)

    # ----------------------------------------------------------- structure

    @property
    def num_factors(self) -> int:
        return self.factors.shape[0]

    @property
    def num_indep_factors(self) -> int:
        return len(self.multiplicities)

    @property
    def num_arrangements(self) -> int:
        """#distinct orderings of the factor groups in the outer product
        (reference decomp_symmtensor.py:279): r!/∏ m_t!."""
        return comb.multinom(self.rank, self.multiplicities)

    @property
    def size(self) -> int:
        """Stored elements (reference: num_factors·(dim+1),
        decomp_symmtensor.py:811 — here the exact leaf count)."""
        return int(self.weights.size + self.factors.size)

    @property
    def dtype(self):
        return self.weights.dtype

    def astype(self, dtype) -> "DecompSymmetricTensor":
        return self._raw(
            self.rank,
            self.dim,
            self.weights.astype(dtype),
            self.factors.astype(dtype),
            self.multiplicities,
        )

    # --------------------------------------------------- multiplicity ops

    def split_factors(self, pos: int) -> "DecompSymmetricTensor":
        """Equivalent tensor with multiplicity `pos` split:
        (…, m_pos, …) → (…, m_pos−1, 1, …). Functional (the reference
        mutates in place, decomp_symmtensor.py:323)."""
        m = self.multiplicities
        if m[pos] <= 1:
            raise ValueError("cannot split a multiplicity-1 factor")
        k = self.num_indep_factors
        if k + 1 > len(_LETTERS) - 1:
            raise NotImplementedError("too many independent factors")
        # new weights W'[a…, z, …] = W[a…] δ_{a_pos z}
        ins = _LETTERS[:k]
        spec = f"{ins},{ins[pos]}z->{ins[: pos + 1]}z{ins[pos + 1 :]}"
        eye = jnp.eye(self.num_factors, dtype=self.dtype)
        new_w = jnp.einsum(spec, self.weights, eye)
        new_m = m[:pos] + (m[pos] - 1, 1) + m[pos + 1 :]
        return self._raw(self.rank, self.dim, new_w, self.factors, new_m)

    def sort_multiplicities(self) -> "DecompSymmetricTensor":
        m = self.multiplicities
        order = tuple(
            int(i) for i in np.argsort([-v for v in m], kind="stable")
        )
        if order == tuple(range(len(m))):
            return self
        new_w = jnp.transpose(self.weights, order)
        new_m = tuple(m[i] for i in order)
        return self._raw(self.rank, self.dim, new_w, self.factors, new_m)

    def match_multiplicities(self, mult: Sequence[int]) -> "DecompSymmetricTensor":
        """Equivalent tensor with the given multiplicity pattern, reached by
        sorting + splitting (reference decomp_symmtensor.py:412)."""
        mult = tuple(int(v) for v in mult)
        if sum(mult) != self.rank:
            raise ValueError("target multiplicities must sum to rank")
        out = self.sort_multiplicities()
        guard = 0
        while out.multiplicities != mult:
            if guard > self.rank + 1:
                raise ValueError(
                    f"cannot match {out.multiplicities} to {mult}"
                )
            guard += 1
            for i, target in enumerate(mult):
                cur = out.multiplicities
                if i >= len(cur) or cur[i] < target:
                    raise ValueError(
                        f"cannot match {self.multiplicities} to {mult}: "
                        "individual multiplicities can only decrease"
                    )
                if cur[i] > target:
                    out = out.split_factors(i)
                    break
        return out

    def find_common_multiplicities(self, other) -> Tuple[int, ...]:
        """Finest-of-the-two common refinement both operands can be split to
        (reference decomp_symmtensor.py:424)."""
        a = tuple(sorted(self.multiplicities, reverse=True))
        b = tuple(sorted(other.multiplicities, reverse=True))
        if self.rank != other.rank:
            raise ValueError("ranks must match")

        def refine(x, y):
            # greedy common refinement of two partitions of rank
            out = []
            x, y = list(x), list(y)
            i = j = 0
            while i < len(x) and j < len(y):
                m = min(x[i], y[j])
                out.append(m)
                x[i] -= m
                y[j] -= m
                if x[i] == 0:
                    i += 1
                if y[j] == 0:
                    j += 1
            return tuple(out)

        return refine(a, b)

    # ------------------------------------------------------------- content

    def _subset_chains(self):
        """All ways to split positions {0..r-1} into ordered groups of sizes
        multiplicities; with sorted index rows, averaging the product over
        these chains performs the lazy symmetrization exactly (same identity
        as ops/outer.py)."""
        r = self.rank
        chains = [((), tuple(range(r)))]
        parts = []
        for m in self.multiplicities:
            new = []
            for done, remaining in chains:
                for S in itertools.combinations(remaining, m):
                    rem = tuple(i for i in remaining if i not in S)
                    new.append((done + (S,), rem))
            chains = new
        return [done for done, rem in chains]

    def toflat(self) -> FlatSymmetricTensor:
        from ..utils.tables import tables

        r, d, k = self.rank, self.dim, self.num_indep_factors
        if r == 0:
            return FlatSymmetricTensor._raw(0, 1, self.weights.reshape(1))
        t = tables(r, d)
        rep = t.rep  # (n, r) int32
        chains = self._subset_chains()
        spec_in = [_LETTERS[:k]] + [f"{c}n" for c in _LETTERS[:k]]
        spec = ",".join(spec_in) + "->n"
        acc = None
        fT = self.factors  # (F, d)
        for chain in chains:
            us = []
            for t_i, S in enumerate(chain):
                u = jnp.ones(
                    (self.num_factors, rep.shape[0]), dtype=self.dtype
                )
                for p in S:
                    u = u * fT[:, rep[:, p]]
                us.append(u)
            term = jnp.einsum(
                spec, self.weights, *us, precision=value_prec(self.dtype)
            )
            acc = term if acc is None else acc + term
        vals = acc / len(chains)
        return FlatSymmetricTensor._raw(r, d, vals)

    def todense(self) -> jnp.ndarray:
        return self.toflat().todense()

    # ----------------------------------------------------------- indexing

    def class_values(self, cls):
        counts = comb.as_class_counts(cls)
        return self.toflat().class_values(counts)

    def element(self, idx: Sequence[int]):
        r, k = self.rank, self.num_indep_factors
        if r == 0:
            return self.weights.reshape(())
        idx = self._canon_index(idx)
        idxa = jnp.stack([jnp.asarray(i) for i in idx])
        chains = self._subset_chains()
        spec_in = [_LETTERS[:k]] + list(_LETTERS[:k])
        spec = ",".join(spec_in) + "->"
        acc = None
        for chain in chains:
            us = []
            for S in chain:
                u = jnp.ones((self.num_factors,), dtype=self.dtype)
                for p in S:
                    u = u * self.factors[:, idxa[p]]
                us.append(u)
            term = jnp.einsum(
                spec, self.weights, *us, precision=value_prec(self.dtype)
            )
            acc = term if acc is None else acc + term
        return acc / len(chains)

    def _partial(self, idx):
        return self.toflat()._partial(idx)

    def set_class(self, cls, value):
        raise TypeError(
            "DecompSymmetricTensor does not support item assignment "
            "(reference decomp_symmtensor.py:793); convert to another format"
        )

    set_element = set_class

    # --------------------------------------------------------- linear ops

    def scale(self, c) -> "DecompSymmetricTensor":
        return self._raw(
            self.rank,
            self.dim,
            self.weights * jnp.asarray(c, dtype=self.dtype),
            self.factors,
            self.multiplicities,
        )

    def __neg__(self):
        return self.scale(-1.0)

    def add_decomp(self, other: "DecompSymmetricTensor") -> "DecompSymmetricTensor":
        """Exact structural addition: match multiplicities, concatenate
        factors, block-embed weights (reference symmetric_add,
        decomp_symmtensor.py:1151)."""
        if (self.rank, self.dim) != (other.rank, other.dim):
            raise ValueError("rank/dim mismatch")
        if self.rank == 0:
            # k == 0: both slicers below would be the empty tuple and the
            # second set() would overwrite the first — add weights directly.
            return self._raw(
                0, self.dim, self.weights + other.weights, self.factors, ()
            )
        m = self.find_common_multiplicities(other)
        a = self.match_multiplicities(m)
        b = other.match_multiplicities(m)
        Fa, Fb = a.num_factors, b.num_factors
        k = len(m)
        factors = jnp.concatenate([a.factors, b.factors], axis=0)
        shape = (Fa + Fb,) * k
        w = jnp.zeros(shape, dtype=jnp.result_type(a.dtype, b.dtype))
        w = w.at[tuple(slice(0, Fa) for _ in range(k))].set(a.weights)
        w = w.at[tuple(slice(Fa, Fa + Fb) for _ in range(k))].set(b.weights)
        return self._raw(self.rank, self.dim, w, factors, m)

    def outer_decomp(self, other: "DecompSymmetricTensor") -> "DecompSymmetricTensor":
        """Symmetrized outer product — exact and lazy in this format:
        weights ⊗ weights, factors concat, multiplicities concat (reference
        symmetric_outer, decomp_symmtensor.py:1307)."""
        if self.dim != other.dim:
            raise ValueError("dim mismatch")
        ka, kb = self.num_indep_factors, other.num_indep_factors
        Fa, Fb = self.num_factors, other.num_factors
        w = jnp.tensordot(self.weights, other.weights, axes=0)
        # embed each operand's factor index range into the concat factors
        factors = jnp.concatenate([self.factors, other.factors], axis=0)
        # weights live on (Fa,)*ka × (Fb,)*kb — pad to (Fa+Fb,)^(ka+kb)
        big = jnp.zeros((Fa + Fb,) * (ka + kb), dtype=w.dtype)
        big = big.at[
            tuple(slice(0, Fa) for _ in range(ka))
            + tuple(slice(Fa, Fa + Fb) for _ in range(kb))
        ].set(w)
        return self._raw(
            self.rank + other.rank,
            self.dim,
            big,
            factors,
            self.multiplicities + other.multiplicities,
        )

    def tensordot_decomp(self, other: "DecompSymmetricTensor", axes: int = 1):
        """Symmetrized tensordot staying in decomposed form.

        axes=0 → outer; axes=1 → exact slot-pair expansion (works for any
        multiplicity patterns — lifts the reference's restriction);
        axes=k≥2 → closed form via Gram powers when both operands have a
        single independent factor group (reference decomp_symmtensor.py:1411
        supports exactly that case)."""
        if self.dim != other.dim:
            raise ValueError("dim mismatch")
        if axes == 0:
            return self.outer_decomp(other)
        ra, rb = self.rank, other.rank
        if axes > min(ra, rb):
            raise ValueError("too many axes")
        G = jnp.dot(
            self.factors, other.factors.T,
            precision=value_prec(self.dtype),
        )  # (Fa, Fb) Gram matrix

        if self.num_indep_factors == 1 and other.num_indep_factors == 1:
            # T = Σ λ_a f_a^{⊗ra}, S = Σ μ_b g_b^{⊗rb}
            # T ·_k S = Σ_ab λ_a μ_b (f_a·g_b)^k f^{⊗ra−k} ⊗ g^{⊗rb−k}
            w = (
                self.weights[:, None]
                * other.weights[None, :]
                * G**axes
            )
            r_out = ra + rb - 2 * axes
            if r_out == 0:
                return w.sum()
            mult = tuple(m for m in (ra - axes, rb - axes) if m > 0)
            factors = jnp.concatenate([self.factors, other.factors], axis=0)
            Fa, Fb = self.num_factors, other.num_factors
            if len(mult) == 2:
                big = jnp.zeros((Fa + Fb, Fa + Fb), dtype=w.dtype)
                big = big.at[:Fa, Fa:].set(w)
                return self._raw(r_out, self.dim, big, factors, mult)
            if ra - axes > 0:
                return self._raw(
                    r_out, self.dim, w.sum(1), self.factors, mult
                )
            return self._raw(r_out, self.dim, w.sum(0), other.factors, mult)

        if axes == 1:
            # contract one slot of each: average over which factor group the
            # contracted index belongs to on each side
            terms = []
            for t_i, mt in enumerate(self.multiplicities):
                for s_i, ms in enumerate(other.multiplicities):
                    scale = (mt / ra) * (ms / rb)
                    a_red = _reduce_mult(self, t_i)
                    b_red = _reduce_mult(other, s_i)
                    # weights coupling through G along the contracted groups
                    term = _couple(a_red, b_red, self, other, t_i, s_i, G,
                                   scale)
                    terms.append(term)
            out = terms[0]
            for t in terms[1:]:
                out = out.add_decomp(t)
            return out

        raise NotImplementedError(
            "decomp tensordot with axes ≥ 2 needs single-multiplicity "
            "operands; convert with .toflat() for the general case"
        )

    # ----------------------------------------------- domain contractions

    def contract_all_indices_with_matrix(self, W) -> "DecompSymmetricTensor":
        """Basis change = one factor matmul (decomp_symmtensor.py:1012)."""
        W = jnp.asarray(W, dtype=self.dtype)
        if W.shape[0] != self.dim:
            raise ValueError("W rows must equal dim")
        return self._raw(
            self.rank,
            W.shape[1],
            self.weights,
            jnp.dot(self.factors, W, precision=value_prec(self.dtype)),
            self.multiplicities,
        )

    def contract_all_indices_with_vector(self, x):
        """(weights · ∏_t (factors@x)^{m_t}).sum()
        (decomp_symmtensor.py:67-71,1025)."""
        x = jnp.asarray(x, dtype=self.dtype)
        v = jnp.dot(self.factors, x, precision=value_prec(self.dtype))  # (F,)
        k = self.num_indep_factors
        if k == 0:
            return self.weights.reshape(())
        spec = ",".join([_LETTERS[:k]] + list(_LETTERS[:k])) + "->"
        return jnp.einsum(
            spec,
            self.weights,
            *[v ** m for m in self.multiplicities],
            precision=value_prec(self.dtype),
        )

    def reduce_factors(self, cutoff: float = 1e-12, top_k=None):
        """Re-decompose a rank-2 single-group tensor through eigh when the
        factor count exceeds the dimension (reference
        decomp_symmtensor.py:915)."""
        if self.rank != 2:
            raise NotImplementedError("reduce_factors supports rank 2")
        return DecompSymmetricTensor.from_matrix(
            self.todense(), cutoff=cutoff, top_k=top_k
        )


def _reduce_mult(t: DecompSymmetricTensor, pos: int):
    """Multiplicity pattern of `t` with m_pos decremented (dropping zeros),
    plus the bookkeeping of whether the group survives."""
    m = list(t.multiplicities)
    m[pos] -= 1
    survives = m[pos] > 0
    if not survives:
        m.pop(pos)
    return tuple(m), survives


def _couple(a_red, b_red, A, B, t_i, s_i, G, scale):
    """One term of the axes=1 decomp tensordot: contract factor group t_i of
    A with group s_i of B through the Gram matrix."""
    (ma, a_survives) = a_red
    (mb, b_survives) = b_red
    ka, kb = A.num_indep_factors, B.num_indep_factors
    Fa, Fb = A.num_factors, B.num_factors
    la = _LETTERS[:ka]
    lb = _LETTERS[ka : ka + kb]
    spec = f"{la},{lb},{la[t_i]}{lb[s_i]}->{la}{lb}"
    w = jnp.einsum(
        spec, A.weights, B.weights, G.astype(A.weights.dtype),
        precision=value_prec(A.weights.dtype),
    )
    w = w * scale
    # sum out contracted groups that vanished; keep as diagonal otherwise
    # (a surviving contracted group still refers to its factor index)
    out_axes_a = [i for i in range(ka) if (i != t_i or a_survives)]
    out_axes_b = [i for i in range(kb) if (i != s_i or b_survives)]
    if not a_survives:
        w = w.sum(axis=t_i, keepdims=True)
    if not b_survives:
        w = w.sum(axis=ka + s_i, keepdims=True)
    # embed into concatenated factor space
    mult = tuple(
        [A.multiplicities[i] - (i == t_i) for i in out_axes_a]
        + [B.multiplicities[i] - (i == s_i) for i in out_axes_b]
    )
    k_out = len(mult)
    factors = jnp.concatenate([A.factors, B.factors], axis=0)
    big = jnp.zeros((Fa + Fb,) * k_out, dtype=w.dtype)
    # squeeze dropped axes, then block-embed
    squeeze_axes = []
    if not a_survives:
        squeeze_axes.append(t_i)
    if not b_survives:
        squeeze_axes.append(ka + s_i)
    w = w.reshape([s for i, s in enumerate(w.shape) if i not in squeeze_axes])
    slicer = tuple(slice(0, Fa) for _ in out_axes_a) + tuple(
        slice(Fa, Fa + Fb) for _ in out_axes_b
    )
    if k_out == 0:
        return w.reshape(())
    big = big.at[slicer].set(w)
    return DecompSymmetricTensor._raw(
        sum(mult), A.dim, big, factors, mult
    )
