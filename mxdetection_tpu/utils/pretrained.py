"""Merge converted pretrained backbone weights into model variables.

Reference equivalent: pretrained load with layer-name matching + fresh init
for new layers (SURVEY.md §5.4). Missing keys keep their random init; extra
keys in the file error loudly (name-mapping bugs must not pass silently).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _set_path(tree: dict, parts: list[str], value):
    node = tree
    for p in parts[:-1]:
        if p not in node:
            raise KeyError(f"path {'/'.join(parts)}: {p!r} not in model tree "
                           f"(have {list(node)[:8]}...)")
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        raise KeyError(f"leaf {'/'.join(parts)} not in model tree")
    old = node[leaf]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"{'/'.join(parts)}: shape {value.shape} != model {old.shape}")
    node[leaf] = jnp.asarray(value, old.dtype)


def load_backbone(variables: dict, npz_path: str, scope: str = "backbone") -> dict:
    """Returns a new variables dict with backbone leaves replaced.

    The npz keys are ``params/...`` / ``batch_stats/...`` relative to the
    backbone scope (see tools/convert_pretrained.py).
    """
    import jax

    variables = jax.tree.map(lambda x: x, variables)  # shallow-deep copy
    data = np.load(npz_path)
    n = 0
    for key in data.files:
        coll, rest = key.split("/", 1)
        _set_path(variables[coll][scope], rest.split("/"), data[key])
        n += 1
    if n == 0:
        raise ValueError(f"{npz_path} contained no arrays")
    return variables
