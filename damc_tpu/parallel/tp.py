"""Model-axis (tensor) parallelism for the large conv stacks.

SURVEY.md §2.6: the core DAMC nets are latent MLPs and small conv stacks
(data/chain parallelism is the right tool), but the mesh keeps a `model`
axis reserved for the one genuinely large component — the StyleGAN-256
synthesis/encoder stacks (conv channels up to 512, ~26M params) and the
VGG16 perceptual net (~134M params of conv kernels).

The TPU-native mechanism is GSPMD: we annotate parameter leaves with a
channel-sharding policy and let pjit partition every conv/matmul and insert
the ICI collectives — no manual collective code. Policy: shard the LAST
axis (output channels for HWIO conv kernels and (in, out) dense kernels)
across `model` when it divides evenly and is wide enough to be worth
communicating for; replicate everything else (biases, blur kernels, noise
buffers, norm scales).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def channel_sharding_spec(mesh: Mesh, min_channels: int = 64):
    """Pytree of NamedShardings for `tree`: last-axis channel sharding.

    Returns a function tree -> sharding tree (apply with jax.tree.map over
    the params)."""
    n_model = mesh.shape[MODEL_AXIS]

    def leaf_sharding(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if (
            n_model > 1
            and len(shape) >= 2
            and shape[-1] >= min_channels
            and shape[-1] % n_model == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS)
            )
        return NamedSharding(mesh, P())

    return leaf_sharding


def _on_noise_path(path) -> bool:
    return any("noise" in str(getattr(k, "key", k)) for k in path)


def channel_sharding_tree(mesh: Mesh, params: Any, min_channels: int = 64):
    """NamedSharding pytree for `params`: last-axis channel sharding for
    wide kernels, everything else replicated.

    Path-aware so the StyleGAN per-layer noise BUFFERS — (H, W) arrays that
    can look like wide 2-D kernels — stay replicated per the module policy
    (spatially sharding them is numerically fine under GSPMD but inserts a
    reshard at every noise-add)."""
    leaf = channel_sharding_spec(mesh, min_channels)
    rep = NamedSharding(mesh, P())

    def pick(path, x):
        return rep if _on_noise_path(path) else leaf(x)

    return jax.tree_util.tree_map_with_path(pick, params)


def shard_params_channelwise(mesh: Mesh, params: Any, min_channels: int = 64):
    """device_put a param tree with output channels sharded over `model`.

    Under a jitted apply, GSPMD propagates the shardings through every conv
    and matmul (each device holds and computes 1/n_model of the output
    channels) and inserts the collectives where layers need re-partitioning.
    Numerically identical to the replicated execution (tested on the virtual
    mesh); per-device parameter memory drops by ~n_model for the wide
    layers.
    """
    shardings = channel_sharding_tree(mesh, params, min_channels)
    return jax.tree.map(jax.device_put, params, shardings)
