"""Tensor/data-parallel sharding rules for the Flax BERT family.

No reference counterpart (the reference runs single-device torch inference);
this is the TPU-native scaling path: params are laid out over a ``(dp, tp)``
mesh with attention heads and MLP hidden dim split across ``tp`` (Megatron
layout — one all-reduce per block), batch split across ``dp``. XLA inserts the
psums from these shardings; no hand-written collectives needed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def encoder_param_spec(path_parts: tuple[str, ...]) -> P:
    """PartitionSpec for one param by its tree path (Megatron-style TP)."""
    path = "/".join(path_parts)
    if "attention" in path:
        if any(f"/{n}/" in path or path.endswith(n) for n in ("query", "key", "value")):
            # DenseGeneral kernel [H, heads, head_dim] / bias [heads, head_dim]
            if path.endswith("kernel"):
                return P(None, "tp", None)
            if path.endswith("bias"):
                return P("tp", None)
        if "/out/" in path:
            # DenseGeneral kernel [heads, head_dim, H]
            if path.endswith("kernel"):
                return P("tp", None, None)
            return P()  # out bias replicated
    if "mlp_in" in path:
        return P(None, "tp") if path.endswith("kernel") else P("tp")
    if "mlp_out" in path:
        return P("tp", None) if path.endswith("kernel") else P()
    return P()  # embeddings, norms, heads: replicated


def _path_names(path) -> tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return tuple(names)


def param_shardings(params, mesh: Mesh):
    """Param tree → NamedSharding tree using encoder_param_spec."""

    def spec_for(path, leaf):
        spec = encoder_param_spec(_path_names(path))
        if len(spec) > leaf.ndim:
            spec = P(*spec[: leaf.ndim])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
