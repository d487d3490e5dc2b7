"""Activation sharding constraints — sequence parallelism the XLA way.

The reference has no model parallelism (SURVEY §2.3: data-parallel DDP only;
sequences are <=16 frames). The TPU-native scaling lever beyond data
parallelism is sharding the T*L token axis of the attention stacks: annotate
the token activations with a `seq` mesh axis and let XLA partition the
attention einsums and insert the collectives over ICI (the "pick a mesh,
annotate, let XLA do the rest" recipe).

Usage:
    mesh = make_mesh([n_data, n_seq], ("data", "seq"))
    set_active_mesh(mesh)        # constraints become live
    ... run the same jitted steps ...

All constraints are no-ops when no mesh is registered or the mesh lacks the
requested axes, so single-chip and pure-DP paths are unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def _constraint(x, spec_axes):
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    spec = []
    for dim, ax in enumerate(spec_axes):
        if (
            ax is not None
            and ax in mesh.axis_names
            and x.shape[dim] % mesh.shape[ax] == 0
        ):
            spec.append(ax)
        else:
            spec.append(None)  # drop axes that don't exist or don't divide
    if all(s is None for s in spec):
        return x
    spec = spec + [None] * (x.ndim - len(spec))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def shard_tokens(x, batch_axis="data", token_axis="seq"):
    """Constrain (B, N, C) token activations to (data, seq, None)."""
    return _constraint(x, (batch_axis, token_axis))


def shard_batch_only(x, batch_axis="data"):
    return _constraint(x, (batch_axis,))
