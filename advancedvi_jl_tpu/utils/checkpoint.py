"""Checkpoint / resume for optimization state.

The reference implements resume as in-memory warm-starting only (``optimize``
accepts ``state=``, reference: src/optimize.jl:50-62) with a tested
split-run == single-run bitwise invariant.  Here every algorithm state is a
pure pytree that already includes the PRNG key and iteration counter, so
durable checkpointing is leaf serialization + the same warm-start path:
``optimize(..., state=restore_state(path, template))`` is bit-identical to an
uninterrupted run (tests/test_checkpoint.py).

Format: one .npz with positionally-indexed leaves plus a structure
fingerprint.  Restore requires a template state with the same treedef
(obtained from ``algorithm.init``) — this keeps the format trivially portable
(no pickled code) and works for any pytree the framework ever produces.
Typed PRNG keys are stored as their raw key data and re-wrapped on restore.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _fingerprint(treedef) -> str:
    # str(treedef) embeds reprs of callables held in static fields
    # (`<function mymod.<locals>.<lambda> at 0x7f...>`): both the memory
    # address and the qualname vary across processes/definitions sites, so
    # normalize all function/method/object reprs — otherwise durable restore
    # always fails for targets like FnTarget / FactorizedTarget.  Structural
    # mismatches are still caught: container structure, field names, and
    # non-callable static config survive normalization.
    text = str(treedef)
    # names may themselves contain '<...>' (e.g. '<lambda>', '<locals>'), so
    # anchor on the trailing ' at 0x...' rather than '[^>]*'
    text = re.sub(
        r"<(function|bound method|cyfunction) .*? at 0x[0-9a-f]+>",
        r"<\1>",
        text,
    )
    text = re.sub(r"0x[0-9a-f]+", "0x0", text)
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def _norm_path(path: str) -> str:
    # np.savez appends ".npz" to extensionless paths; normalize so
    # save_state/restore_state stay symmetric.
    return path if path.endswith(".npz") else path + ".npz"


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def save_state(path: str, state: Any) -> None:
    path = _norm_path(path)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {}
    for i, x in enumerate(leaves):
        if _is_key(x):
            arrays[f"key_{i}"] = np.asarray(
                jax.device_get(jax.random.key_data(x))
            )
        else:
            arrays[f"leaf_{i}"] = np.asarray(jax.device_get(x))
    arrays["__fingerprint__"] = np.asarray(_fingerprint(treedef))
    np.savez(path, **arrays)


def restore_state(path: str, template_state: Any) -> Any:
    """Rebuild a state pytree from disk onto the template's structure."""
    with np.load(_norm_path(path), allow_pickle=False) as data:
        leaves, treedef = jax.tree.flatten(template_state)
        got = str(data["__fingerprint__"])
        want = _fingerprint(treedef)
        if got != want:
            raise ValueError(
                f"checkpoint structure mismatch: file={got} template={want}. "
                "Construct the template with the same algorithm/model "
                "configuration that produced the checkpoint."
            )
        new_leaves = []
        for i, leaf in enumerate(leaves):
            if f"key_{i}" in data:
                impl = jax.random.key_impl(leaf) if _is_key(leaf) else "threefry2x32"
                new_leaves.append(
                    jax.random.wrap_key_data(
                        jnp.asarray(data[f"key_{i}"]), impl=impl
                    )
                )
            else:
                arr = data[f"leaf_{i}"]
                new_leaves.append(
                    jnp.asarray(arr, dtype=leaf.dtype)
                    if hasattr(leaf, "dtype")
                    else type(leaf)(arr)
                )
        return jax.tree.unflatten(treedef, new_leaves)
