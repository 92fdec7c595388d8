"""Serialization: JSON codec + binary checkpointing.

The reference serializes through scityping/pydantic ``Data`` dataclasses with
σ-class tuple keys stringified for JSON (base.py:618-630,
permcls_symtensor.py:686-708). Here every tensor is a pytree, so binary
checkpointing is free through any pytree checkpointer (orbax); this module
adds (a) a human-readable JSON codec with a layout compatible in spirit with
the reference ({format, rank, dim, data{σ-label: values}}), and (b) a
dependency-free .npz save/load for large tensors.
"""

from __future__ import annotations

import json
from typing import Union

import jax.numpy as jnp
import numpy as np

from .core.base import SymmetricTensor
from .core.decomp import DecompSymmetricTensor
from .core.dense import DenseSymmetricTensor
from .core.flat import FlatSymmetricTensor
from .core.permcls import PermClsSymmetricTensor
from .core.sparse_flat import SparseFlatSymmetricTensor
from .utils import combinatorics as comb

FORMATS = {
    "dense": DenseSymmetricTensor,
    "flat": FlatSymmetricTensor,
    "permcls": PermClsSymmetricTensor,
    "decomp": DecompSymmetricTensor,
    "sparse_flat": SparseFlatSymmetricTensor,
}


def to_dict(t: SymmetricTensor) -> dict:
    """JSON-ready dict representation."""
    head = {
        "format": t.format,
        "rank": t.rank,
        "dim": t.dim,
        "dtype": str(np.dtype(t.dtype)),
    }
    if t.format in ("dense", "flat"):
        head["data"] = np.asarray(t.data).tolist()
    elif t.format == "permcls":
        head["data"] = {
            comb.class_label(k): np.asarray(v).tolist()
            for k, v in t.data.items()
        }
    elif t.format == "decomp":
        head["data"] = {
            "weights": np.asarray(t.weights).tolist(),
            "factors": np.asarray(t.factors).tolist(),
            "multiplicities": list(t.multiplicities),
        }
    elif t.format == "sparse_flat":
        head["data"] = {
            "values": np.asarray(t.bcoo.data).tolist(),
            "indices": np.asarray(t.rep).tolist(),
        }
    else:
        raise TypeError(f"unknown format {t.format!r}")
    return head


def from_dict(d: dict) -> SymmetricTensor:
    fmt = d["format"]
    rank, dim = int(d["rank"]), int(d["dim"])
    dtype = jnp.dtype(d["dtype"])
    data = d["data"]
    if fmt == "dense":
        return DenseSymmetricTensor._raw(
            rank, dim, jnp.asarray(np.array(data, dtype=dtype))
        )
    if fmt == "flat":
        return FlatSymmetricTensor._raw(
            rank, dim, jnp.asarray(np.array(data, dtype=dtype))
        )
    if fmt == "permcls":
        store = {
            comb.class_counts(label): jnp.asarray(np.array(v, dtype=dtype))
            for label, v in data.items()
        }
        # rank-0: the empty label maps to counts ()
        return PermClsSymmetricTensor(rank=rank, dim=dim, data=store, dtype=dtype)
    if fmt == "decomp":
        return DecompSymmetricTensor._raw(
            rank,
            dim,
            jnp.asarray(np.array(data["weights"], dtype=dtype)),
            jnp.asarray(np.array(data["factors"], dtype=dtype)),
            tuple(data["multiplicities"]),
        )
    if fmt == "sparse_flat":
        idx = np.array(data["indices"], dtype=np.int64).reshape(-1, rank)
        return SparseFlatSymmetricTensor.from_entries(
            rank, dim, idx, np.array(data["values"], dtype=dtype),
            dtype=dtype,
        )
    raise TypeError(f"unknown format {fmt!r}")


def to_json(t: SymmetricTensor) -> str:
    return json.dumps(to_dict(t))


def from_json(s: Union[str, bytes]) -> SymmetricTensor:
    return from_dict(json.loads(s))


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to extensionless paths; normalize so that
    save/load agree for any input path."""
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def save(path: str, t: SymmetricTensor) -> None:
    """Binary .npz checkpoint (use orbax for full-pytree training state)."""
    path = _npz_path(path)
    arrays = {}
    meta = {"format": t.format, "rank": t.rank, "dim": t.dim}
    if t.format in ("dense", "flat"):
        arrays["data"] = np.asarray(t.data)
    elif t.format == "permcls":
        meta["classes"] = [comb.class_label(k) for k in t.data]
        for k, v in t.data.items():
            arrays[f"class_{comb.class_label(k) or 'scalar'}"] = np.asarray(v)
    elif t.format == "decomp":
        meta["multiplicities"] = list(t.multiplicities)
        arrays["weights"] = np.asarray(t.weights)
        arrays["factors"] = np.asarray(t.factors)
    elif t.format == "sparse_flat":
        arrays["values"] = np.asarray(t.bcoo.data)
        arrays["indices"] = np.asarray(t.rep)
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load(path: str) -> SymmetricTensor:
    path = _npz_path(path)
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        fmt, rank, dim = meta["format"], meta["rank"], meta["dim"]
        if fmt == "dense":
            return DenseSymmetricTensor._raw(rank, dim, jnp.asarray(z["data"]))
        if fmt == "flat":
            return FlatSymmetricTensor._raw(rank, dim, jnp.asarray(z["data"]))
        if fmt == "permcls":
            store = {
                comb.class_counts(label): jnp.asarray(
                    z[f"class_{label or 'scalar'}"]
                )
                for label in meta["classes"]
            }
            return PermClsSymmetricTensor._raw(rank, dim, store)
        if fmt == "decomp":
            return DecompSymmetricTensor._raw(
                rank,
                dim,
                jnp.asarray(z["weights"]),
                jnp.asarray(z["factors"]),
                tuple(meta["multiplicities"]),
            )
        if fmt == "sparse_flat":
            return SparseFlatSymmetricTensor.from_entries(
                rank, dim, z["indices"].astype(np.int64), z["values"]
            )
    raise TypeError(f"unknown format {fmt!r}")
