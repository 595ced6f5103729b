"""Batched host->device placement for parameter trees.

`jax.device_put` on a pytree issues one transfer per leaf. On this
platform the device sits behind a remote tunnel where each transfer is a
round-trip; placing a ~200-leaf StyleGAN tree leaf-by-leaf takes minutes
when the endpoint is contended (observed while loading converted torch
checkpoints — `models/stylegan.py` conversion notes). `device_put_packed`
instead concatenates the leaves into ONE host buffer per distinct dtype,
transfers each buffer once, and splits/reshapes on device in a single
compiled program (one dispatch; the executable is persistently cached by
the compile cache, keyed on the shape signature).

This is a load-time utility: the reference's equivalent surface is
`torch.load(...).cuda()` at driver startup (e.g. `eval_stylegan_inv.py`
checkpoint loading); there is no algorithmic content here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def cast_float_leaves(tree: Any, dtype: Optional[Any]) -> Any:
    """Cast floating-point leaves to `dtype`; other leaves pass through.

    `dtype=None` is the identity. Outputs are jax arrays (jnp.asarray, not
    ndarray.astype): a numpy-bf16 leaf would follow NUMPY promotion rules in
    un-jitted use (bf16 * python-float -> f32), breaking dtype uniformity;
    a jax array stays weakly-typed bf16. Works on concrete trees and under
    tracing (leaves only need a `.dtype`).
    """
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda a: jnp.asarray(a, dtype)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def device_put_packed(tree: Any, device: Optional[Any] = None) -> Any:
    """Place `tree` on `device` with one transfer per distinct leaf dtype.

    Equivalent to `jax.device_put(tree, device)` for uncommitted/default
    placement, but O(#dtypes) transfers + one split dispatch instead of
    O(#leaves) transfers. Leaves may be numpy arrays, python scalars, or
    already-placed jax arrays (the latter pass through untouched).
    """
    leaves, treedef = jax.tree.flatten(tree)
    out = list(leaves)
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            # already placed: leave alone under default placement, but honor
            # an explicit device (device-to-device copy, no host round-trip)
            if device is not None:
                out[i] = jax.device_put(leaf, device)
            continue
        a = np.asarray(leaf)
        groups.setdefault(a.dtype, []).append((i, a))

    for dtype, items in groups.items():
        shapes = tuple(a.shape for _, a in items)
        if len(items) == 1:
            (i, a), = items
            out[i] = jax.device_put(a, device)
            continue
        flat = np.concatenate([a.reshape(-1) for _, a in items])
        flat_d = jax.device_put(flat, device)

        def split(f, _shapes=shapes):
            parts = []
            off = 0
            for s in _shapes:
                n = int(np.prod(s, dtype=np.int64))
                parts.append(jax.lax.slice(f, (off,), (off + n,)).reshape(s))
                off += n
            return tuple(parts)

        # no donation: slice outputs can never alias the packed input, so
        # XLA would just warn. Peak HBM is transiently 2x this dtype-group;
        # the packed buffer is freed as soon as the split lands.
        parts = jax.jit(split)(flat_d)
        for (i, _), p in zip(items, parts):
            out[i] = p

    return jax.tree.unflatten(treedef, out)
