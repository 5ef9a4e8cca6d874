"""Tensor parallelism over the `model` mesh axis.

The motivating case is the large-vocab preset (models/config.py
`large-vocab`, 50k vocab): its CTC head is a (d_model, vocab) projection
of ~9.6M params — bigger than the whole 6.2M acoustic model — and with
Adam it triples in optimizer state. Sharding it over MODEL_AXIS splits
params, grads, and optimizer moments across chips; XLA inserts the
all-gather for the (B, T, vocab) logits and the reduce-scatter for the
kernel gradient automatically (sharding propagation — no user-level
collectives, SURVEY.md §2.4; the reference's only distribution story is
a dead `distributed:` yaml stanza, /root/reference/configs/train.yaml:87-91).

Rules are matched on parameter-path suffixes so the QAT (QuantDense) and
INT8 (DynamicInt8Dense) head variants — same `proj/kernel|bias` leaf
names — shard identically.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path-suffix, spec): a param whose flattened key path ends with the
# suffix gets the spec; everything else is replicated.
TP_RULES: List[Tuple[Tuple[str, ...], P]] = [
    # CTC head: column-parallel over the vocab axis.
    (("ctc_head", "proj", "kernel"), P(None, MODEL_AXIS)),
    (("ctc_head", "proj", "bias"), P(MODEL_AXIS)),
    # Expert parallelism (EP): MoE expert weights (models/moe.py) carry a
    # leading num_experts axis — shard it over the same model axis. The
    # router stays replicated; XLA's sharding propagation turns the
    # dispatch einsum into the token all-to-all.
    (("moe", "w_in"), P(MODEL_AXIS, None, None)),
    (("moe", "b_in"), P(MODEL_AXIS, None)),
    (("moe", "w_out"), P(MODEL_AXIS, None, None)),
    (("moe", "b_out"), P(MODEL_AXIS, None)),
]


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def tp_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for `params` under the TP rules."""

    def spec_for(path, leaf):
        names = _path_names(path)
        for suffix, spec in TP_RULES:
            if names[-len(suffix):] == suffix:
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree for `params` (replicated except TP_RULES)."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), tp_param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params_tp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place `params` on `mesh` with the TP shardings."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_param_shardings(params, mesh)
    )


def tp_tree_shardings(tree: Any, params: Dict[str, Any], mesh: Mesh) -> Any:
    """Shardings for a params-derived pytree (e.g. optimizer state).

    Optimizer moments mirror the param tree somewhere inside optax's
    state structure (same dict names, different wrapper types), so leaves
    are matched by PATH SUFFIX against the TP-sharded params — e.g. any
    leaf whose path ends in ('ctc_head', 'proj', 'kernel') (the CTC head
    Dense is name='proj' in models/model.py) and has the kernel's shape
    gets the kernel's sharding. Shape-based matching is
    NOT sound here: a replicated param can share (shape, dtype) with the
    sharded head bias (e.g. any (vocab,)-shaped fp32 bias when another
    layer width equals vocab_size) and would silently inherit the MODEL
    sharding for its moments. Every unmatched leaf is replicated.
    """
    sharded_by_path: Dict[Tuple[str, ...], Tuple[Tuple[int, ...], NamedSharding]] = {}
    specs = jax.tree_util.tree_flatten_with_path(tp_param_specs(params))[0]
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for (path, spec), (_, leaf) in zip(specs, leaves):
        if spec != P():
            sharded_by_path[_path_names(path)] = (
                tuple(leaf.shape), NamedSharding(mesh, spec)
            )

    rep = NamedSharding(mesh, P())

    def leaf_sharding(path, x):
        if hasattr(x, "shape"):
            names = _path_names(path)
            for ppath, (shape, sh) in sharded_by_path.items():
                if (len(names) >= len(ppath)
                        and names[-len(ppath):] == ppath
                        and tuple(x.shape) == shape):
                    return sh
        return rep

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)
