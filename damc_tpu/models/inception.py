"""InceptionV3 pool3 feature extractor for FID, in pure JAX.

Re-implements the FID-variant InceptionV3 that `pytorch_fid_wrapper` runs on
GPU for the reference (`/root/reference/workspace/src/MCMC.py:8,139`):
torchvision's inception_v3 graph with pytorch-fid's three deviations —
(a) InceptionA/C/E average-pool branches use count_include_pad=False,
(b) Mixed_7c's pool branch uses MAX pooling (reproducing the original TF
model), (c) the classifier head is dropped; features are the 2048-d global
average pool ("pool3").

Pure-function design: params are a nested dict converted from the published
torch checkpoint (`pt_inception-2015-12-05-6726825d.pth`) via
`convert_torch_state_dict`; the forward is plain jnp (NHWC, MXU-friendly
convs, BN folded at conversion time). No torchvision dependency; `torch.load`
is only needed when converting a checkpoint.

Input convention matches pytorch-fid: images in [0, 1], bilinear-resized to
299x299, then scaled to [-1, 1].
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 0.001

WEIGHTS_ENV_VAR = "DAMC_INCEPTION_WEIGHTS"
DEFAULT_WEIGHTS_PATHS = (
    os.path.expanduser("~/.cache/damc/pt_inception-2015-12-05-6726825d.pth"),
    os.path.expanduser(
        "~/.cache/torch/hub/checkpoints/pt_inception-2015-12-05-6726825d.pth"
    ),
)


# --------------------------------------------------------------------------
# Primitive ops (NHWC)
# --------------------------------------------------------------------------

def _conv(x, kernel, stride=(1, 1), padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, kernel, stride, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _basic_conv(x, p, stride=(1, 1), padding="VALID"):
    """Conv (bias-free) + folded BN + ReLU. p = {'kernel', 'scale', 'offset'}
    with BN statistics folded into scale/offset at conversion time."""
    y = _conv(x, p["kernel"], stride, padding)
    return jax.nn.relu(y * p["scale"] + p["offset"])


def _max_pool(x, window=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def _avg_pool_excl_pad(x, window=3, stride=1):
    """3x3 stride-1 SAME average pool with count_include_pad=False."""
    dims, strides = (1, window, window, 1), (1, stride, stride, 1)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, "SAME")
    counts = jax.lax.reduce_window(
        jnp.ones_like(x[..., :1]), 0.0, jax.lax.add, dims, strides, "SAME"
    )
    return summed / counts


# --------------------------------------------------------------------------
# Inception blocks (params are dicts keyed by torch submodule names)
# --------------------------------------------------------------------------

def _seq(x, p, names_strides_pads):
    for name, stride, pad in names_strides_pads:
        x = _basic_conv(x, p[name], stride, pad)
    return x


def _inception_a(x, p):
    b1 = _basic_conv(x, p["branch1x1"])
    b5 = _seq(x, p, [("branch5x5_1", (1, 1), "VALID"), ("branch5x5_2", (1, 1), "SAME")])
    b3 = _seq(
        x,
        p,
        [
            ("branch3x3dbl_1", (1, 1), "VALID"),
            ("branch3x3dbl_2", (1, 1), "SAME"),
            ("branch3x3dbl_3", (1, 1), "SAME"),
        ],
    )
    bp = _basic_conv(_avg_pool_excl_pad(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _basic_conv(x, p["branch3x3"], (2, 2), "VALID")
    bd = _seq(
        x,
        p,
        [
            ("branch3x3dbl_1", (1, 1), "VALID"),
            ("branch3x3dbl_2", (1, 1), "SAME"),
        ],
    )
    bd = _basic_conv(bd, p["branch3x3dbl_3"], (2, 2), "VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(x, p):
    b1 = _basic_conv(x, p["branch1x1"])
    b7 = _seq(
        x,
        p,
        [
            ("branch7x7_1", (1, 1), "VALID"),
            ("branch7x7_2", (1, 1), "SAME"),
            ("branch7x7_3", (1, 1), "SAME"),
        ],
    )
    bd = _seq(
        x,
        p,
        [
            ("branch7x7dbl_1", (1, 1), "VALID"),
            ("branch7x7dbl_2", (1, 1), "SAME"),
            ("branch7x7dbl_3", (1, 1), "SAME"),
            ("branch7x7dbl_4", (1, 1), "SAME"),
            ("branch7x7dbl_5", (1, 1), "SAME"),
        ],
    )
    bp = _basic_conv(_avg_pool_excl_pad(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _basic_conv(x, p["branch3x3_1"])
    b3 = _basic_conv(b3, p["branch3x3_2"], (2, 2), "VALID")
    b7 = _seq(
        x,
        p,
        [
            ("branch7x7x3_1", (1, 1), "VALID"),
            ("branch7x7x3_2", (1, 1), "SAME"),
            ("branch7x7x3_3", (1, 1), "SAME"),
        ],
    )
    b7 = _basic_conv(b7, p["branch7x7x3_4"], (2, 2), "VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(x, p, pool: str):
    b1 = _basic_conv(x, p["branch1x1"])
    b3 = _basic_conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate(
        [
            _basic_conv(b3, p["branch3x3_2a"], (1, 1), "SAME"),
            _basic_conv(b3, p["branch3x3_2b"], (1, 1), "SAME"),
        ],
        axis=-1,
    )
    bd = _basic_conv(x, p["branch3x3dbl_1"])
    bd = _basic_conv(bd, p["branch3x3dbl_2"], (1, 1), "SAME")
    bd = jnp.concatenate(
        [
            _basic_conv(bd, p["branch3x3dbl_3a"], (1, 1), "SAME"),
            _basic_conv(bd, p["branch3x3dbl_3b"], (1, 1), "SAME"),
        ],
        axis=-1,
    )
    if pool == "max":  # FIDInceptionE_2 quirk (Mixed_7c)
        bp = _max_pool(x, 3, 1, "SAME")
    else:
        bp = _avg_pool_excl_pad(x)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Dict, x: jax.Array, resize: bool = True) -> jax.Array:
    """images (B, H, W, 3) in [0, 1] -> pool3 features (B, 2048)."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)  # grayscale -> RGB
    if resize:
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
    x = 2.0 * x - 1.0

    x = _basic_conv(x, params["Conv2d_1a_3x3"], (2, 2), "VALID")
    x = _basic_conv(x, params["Conv2d_2a_3x3"], (1, 1), "VALID")
    x = _basic_conv(x, params["Conv2d_2b_3x3"], (1, 1), "SAME")
    x = _max_pool(x)
    x = _basic_conv(x, params["Conv2d_3b_1x1"], (1, 1), "VALID")
    x = _basic_conv(x, params["Conv2d_4a_3x3"], (1, 1), "VALID")
    x = _max_pool(x)
    x = _inception_a(x, params["Mixed_5b"])
    x = _inception_a(x, params["Mixed_5c"])
    x = _inception_a(x, params["Mixed_5d"])
    x = _inception_b(x, params["Mixed_6a"])
    x = _inception_c(x, params["Mixed_6b"])
    x = _inception_c(x, params["Mixed_6c"])
    x = _inception_c(x, params["Mixed_6d"])
    x = _inception_c(x, params["Mixed_6e"])
    x = _inception_d(x, params["Mixed_7a"])
    x = _inception_e(x, params["Mixed_7b"], pool="avg")
    x = _inception_e(x, params["Mixed_7c"], pool="max")
    return jnp.mean(x, axis=(1, 2))


# --------------------------------------------------------------------------
# Architecture table (for shape-checked random init / conversion validation)
# --------------------------------------------------------------------------

def _a_spec(cin, pool):
    return {
        "branch1x1": (cin, 64, 1, 1),
        "branch5x5_1": (cin, 48, 1, 1),
        "branch5x5_2": (48, 64, 5, 5),
        "branch3x3dbl_1": (cin, 64, 1, 1),
        "branch3x3dbl_2": (64, 96, 3, 3),
        "branch3x3dbl_3": (96, 96, 3, 3),
        "branch_pool": (cin, pool, 1, 1),
    }


def _b_spec(cin):
    return {
        "branch3x3": (cin, 384, 3, 3),
        "branch3x3dbl_1": (cin, 64, 1, 1),
        "branch3x3dbl_2": (64, 96, 3, 3),
        "branch3x3dbl_3": (96, 96, 3, 3),
    }


def _c_spec(cin, c7):
    return {
        "branch1x1": (cin, 192, 1, 1),
        "branch7x7_1": (cin, c7, 1, 1),
        "branch7x7_2": (c7, c7, 1, 7),
        "branch7x7_3": (c7, 192, 7, 1),
        "branch7x7dbl_1": (cin, c7, 1, 1),
        "branch7x7dbl_2": (c7, c7, 7, 1),
        "branch7x7dbl_3": (c7, c7, 1, 7),
        "branch7x7dbl_4": (c7, c7, 7, 1),
        "branch7x7dbl_5": (c7, 192, 1, 7),
        "branch_pool": (cin, 192, 1, 1),
    }


def _d_spec(cin):
    return {
        "branch3x3_1": (cin, 192, 1, 1),
        "branch3x3_2": (192, 320, 3, 3),
        "branch7x7x3_1": (cin, 192, 1, 1),
        "branch7x7x3_2": (192, 192, 1, 7),
        "branch7x7x3_3": (192, 192, 7, 1),
        "branch7x7x3_4": (192, 192, 3, 3),
    }


def _e_spec(cin):
    return {
        "branch1x1": (cin, 320, 1, 1),
        "branch3x3_1": (cin, 384, 1, 1),
        "branch3x3_2a": (384, 384, 1, 3),
        "branch3x3_2b": (384, 384, 3, 1),
        "branch3x3dbl_1": (cin, 448, 1, 1),
        "branch3x3dbl_2": (448, 384, 3, 3),
        "branch3x3dbl_3a": (384, 384, 1, 3),
        "branch3x3dbl_3b": (384, 384, 3, 1),
        "branch_pool": (cin, 192, 1, 1),
    }


ARCH_SPEC = {
    "Conv2d_1a_3x3": (3, 32, 3, 3),
    "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (32, 64, 3, 3),
    "Conv2d_3b_1x1": (64, 80, 1, 1),
    "Conv2d_4a_3x3": (80, 192, 3, 3),
    "Mixed_5b": _a_spec(192, 32),
    "Mixed_5c": _a_spec(256, 64),
    "Mixed_5d": _a_spec(288, 64),
    "Mixed_6a": _b_spec(288),
    "Mixed_6b": _c_spec(768, 128),
    "Mixed_6c": _c_spec(768, 160),
    "Mixed_6d": _c_spec(768, 160),
    "Mixed_6e": _c_spec(768, 192),
    "Mixed_7a": _d_spec(768),
    "Mixed_7b": _e_spec(1280),
    "Mixed_7c": _e_spec(2048),
}


def init_random_params(key: jax.Array, seed: int = 0) -> Dict:
    """Shape-correct random params (for tests / environments w/o weights).

    Host-side NumPy generation: per-leaf `jax.random.normal` calls would
    compile one tiny XLA program per distinct shape (~90 shapes, ~30 s on
    CPU); this is test plumbing, not model numerics. `key` is accepted for
    signature compatibility; `seed` drives the NumPy stream.
    """
    del key
    rng = np.random.RandomState(seed)

    def leaf(spec):
        cin, cout, kh, kw = spec
        return {
            "kernel": jnp.asarray(
                rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.05
            ),
            "scale": jnp.ones((cout,)),
            "offset": jnp.zeros((cout,)),
        }

    params: Dict = {}
    for name, spec in ARCH_SPEC.items():
        if isinstance(spec, tuple):
            params[name] = leaf(spec)
        else:
            params[name] = {sub: leaf(s) for sub, s in spec.items()}
    return params


# --------------------------------------------------------------------------
# Weight conversion
# --------------------------------------------------------------------------

def convert_torch_state_dict(state_dict) -> Dict:
    """torch (pytorch-fid / torchvision inception) state_dict -> params tree.

    Folds BatchNorm into per-channel (scale, offset): conv OIHW -> HWIO,
    scale = gamma / sqrt(var + eps), offset = beta - mean * scale.
    """
    params: Dict = {}
    convs = sorted(
        {k[: -len(".conv.weight")] for k in state_dict if k.endswith(".conv.weight")}
    )
    for name in convs:
        w = np.asarray(state_dict[f"{name}.conv.weight"], np.float32)
        gamma = np.asarray(state_dict[f"{name}.bn.weight"], np.float32)
        beta = np.asarray(state_dict[f"{name}.bn.bias"], np.float32)
        mean = np.asarray(state_dict[f"{name}.bn.running_mean"], np.float32)
        var = np.asarray(state_dict[f"{name}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + BN_EPS)
        offset = beta - mean * scale
        node = params
        parts = name.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        # host numpy: one packed device placement happens at load time
        # (utils/placement), not one transfer per leaf
        node[parts[-1]] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "scale": scale,
            "offset": offset,
        }
    return params


def load_inception_params(path: Optional[str] = None) -> Dict:
    """Load + convert the pytorch-fid InceptionV3 checkpoint."""
    candidates = [path] if path else [os.environ.get(WEIGHTS_ENV_VAR), *DEFAULT_WEIGHTS_PATHS]
    for cand in candidates:
        if cand and os.path.exists(cand):
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
            return convert_torch_state_dict(sd)
    raise FileNotFoundError(
        f"InceptionV3 weights not found; set ${WEIGHTS_ENV_VAR} or place the "
        f"pytorch-fid checkpoint at one of {DEFAULT_WEIGHTS_PATHS}"
    )


def try_load_inception_feature_fn(
    path: Optional[str] = None,
) -> Optional[Callable[[jax.Array], jax.Array]]:
    """Jitted pool3 feature fn, or None when no weights are on disk."""
    try:
        params = load_inception_params(path)
    except FileNotFoundError:
        return None

    # Params as jit ARGUMENT: captured arrays become program literals
    # (24M weights -> ~100 MB lowered program) and can overflow
    # remote-compile transports; as arguments the program is tiny.
    # Placed once (packed) so the per-batch calls don't re-transfer.
    from ..utils.placement import device_put_packed

    params = device_put_packed(params)
    pool3 = jax.jit(inception_pool3)

    def feature_fn(x):
        return pool3(params, x)

    return feature_fn
