"""Checkpoint / persistence of precomputed contexts.

The reference's persistent artifacts are key formats and the two-phase verify
context EDP_SIGV_CTX (pubkey + 16-point q_table, reference:
source/ed25519_verify.c:44-47) — an amortizable precompute worth caching.
Here those contexts are array pytrees, serialized to a single `.npz` so a
serving fleet can Verify_Init once per public key and ship the table to every
worker/host (SURVEY.md §5 "Checkpoint / resume").

Works for any pytree of arrays with dict/list/tuple structure (verify
contexts, blinding contexts' device half, folding tables).
"""

import json

import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_verify_ctx", "load_verify_ctx"]

_SENTINEL = "__curve25519_tpu_pytree__"


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        spec = {}
        for k, v in sorted(tree.items()):
            if k.startswith("_"):      # host-side private fields don't persist
                continue
            spec[k] = _flatten(v, f"{prefix}/{k}", out)
        return {"kind": "dict", "children": spec}
    if isinstance(tree, (list, tuple)):
        spec = [_flatten(v, f"{prefix}/{i}", out) for i, v in enumerate(tree)]
        return {"kind": "list" if isinstance(tree, list) else "tuple",
                "children": spec}
    out[prefix] = np.asarray(tree)
    return {"kind": "leaf", "key": prefix}


def _unflatten(spec, arrays, to_jax):
    kind = spec["kind"]
    if kind == "dict":
        return {k: _unflatten(s, arrays, to_jax)
                for k, s in spec["children"].items()}
    if kind in ("list", "tuple"):
        vals = [_unflatten(s, arrays, to_jax) for s in spec["children"]]
        return vals if kind == "list" else tuple(vals)
    a = arrays[spec["key"]]
    if to_jax:
        import jax.numpy as jnp
        return jnp.asarray(a)
    return a


def save_pytree(path, tree):
    """Serialize a pytree of arrays to `path` (.npz appended if absent —
    np.savez does this silently, so both sides normalize the same way).
    Keys starting with '_' (host-side secrets kept for chaining, e.g.
    blinding '_b') are skipped."""
    out = {}
    spec = _flatten(tree, "t", out)
    out[_SENTINEL] = np.frombuffer(json.dumps(spec).encode(), np.uint8)
    np.savez(path, **out)


def load_pytree(path, to_jax=True):
    """Load a pytree saved by save_pytree; leaves become jax arrays by
    default (numpy with to_jax=False). Accepts the path with or without
    the .npz suffix save_pytree's np.savez appends."""
    import os
    if not os.path.exists(path) and os.path.exists(str(path) + ".npz"):
        path = str(path) + ".npz"
    with np.load(path) as z:
        spec = json.loads(bytes(z[_SENTINEL]).decode())
        arrays = {k: z[k] for k in z.files if k != _SENTINEL}
    return _unflatten(spec, arrays, to_jax)


def save_verify_ctx(path, ctx):
    """Persist a verify_init() context (pk + q_table planes + ok mask)."""
    save_pytree(path, ctx)


def load_verify_ctx(path):
    """Restore a verify context usable directly by verify_check()."""
    return load_pytree(path)
