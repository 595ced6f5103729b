"""StyleGAN-1 stack for the inversion workload, in pure-function JAX (NHWC).

Covers the reference's pretrained inference stack (SURVEY.md §2.3):
  * generator: mapping (8 equalized-lr dense layers + pixel-norm input),
    truncation (psi=0.7 over the first 8 of 14 layers), progressive synthesis
    4->256 with per-resolution UpConv/Conv blocks, AdaIN style modulation,
    fixed noise buffers, blur, and the fused conv-transpose upscale for
    res >= 128 (`stylegan_generator_network.py`)
  * inversion encoder: image -> W+ (14 x 512 = 7168) residual pyramid with
    BatchNorm (`stylegan_encoder_network.py`)
  * VGG16 perceptual features (Keras-style preprocessing, truncated at
    block4_conv3 / layer 23) (`perceptual_model.py`)
  * the DAMC wrapper semantics: `generator_apply` consumes FLAT W+ codes
    (B, 7168) and runs synthesis only (`stylegan_generator.py:111-114`);
    mapping+truncation remain available for the NaN-latent rescue
    (`src/MCMC.py:83-94`).

Design: params are nested dicts converted from the published `.pth`
checkpoints (`convert_generator_state_dict` etc.); forwards are plain jnp so
they jit/pjit cleanly and the equalized-lr ("wscale") constants fold into the
graph. Random-init helpers exist so shape tests run without weights; numeric
parity against the torch reference is tested layer-by-layer in
`tests/test_stylegan.py`.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

W_DIM = 512
INIT_RES = 4
FMAPS_BASE = 16 << 10
FMAPS_MAX = 512
AUTO_FUSED_MIN_RES = 128
TRUNCATION_PSI = 0.7
TRUNCATION_LAYERS = 8
MAPPING_LAYERS = 8
MAPPING_LR_MUL = 0.01
GAIN = math.sqrt(2.0)


def nf(res: int) -> int:
    return min(FMAPS_BASE // res, FMAPS_MAX)


def num_synthesis_layers(resolution: int) -> int:
    return int(np.log2(resolution // INIT_RES * 2)) * 2


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def _conv(x, kernel_hwio, stride=1, padding="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x,
        kernel_hwio,
        (stride, stride),
        padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _pixel_norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def _instance_norm(x, eps=1e-8):
    x = x - jnp.mean(x, axis=(1, 2), keepdims=True)
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=(1, 2), keepdims=True) + eps)


def _upsample_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


_BLUR_1D = np.array([1.0, 2.0, 1.0], np.float32)
_BLUR_2D = np.outer(_BLUR_1D, _BLUR_1D)
_BLUR_2D /= _BLUR_2D.sum()


def _blur(x):
    c = x.shape[-1]
    # follow x's dtype so a bf16 compute path stays bf16 end-to-end
    kernel = jnp.asarray(_BLUR_2D, x.dtype)[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))  # HWIO with I=1, depthwise
    return _conv(x, kernel, padding=((1, 1), (1, 1)), groups=c)


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------

def _dense_block(p, x, lr_mul=MAPPING_LR_MUL, gain=GAIN, act="lrelu"):
    """Equalized-lr dense: y = x W^T * (gain/sqrt(fan_in) * lr_mul) + b * lr_mul.

    (`stylegan_generator_network.py:703-754` DenseBlock + WScaleLayer.)
    """
    fan_in = x.shape[-1]
    scale = gain / math.sqrt(fan_in) * lr_mul
    y = x @ p["weight"].T * scale + p["bias"] * lr_mul
    return _lrelu(y) if act == "lrelu" else y


def mapping_apply(params: Dict, z: jax.Array) -> jax.Array:
    """z (B, 512) -> w (B, num_layers*512) (repeat_w=False wrapper config,
    `stylegan_generator.py:44`)."""
    w = _pixel_norm(z)
    for i in range(MAPPING_LAYERS):
        w = _dense_block(params[f"dense{i}"], w)
    return w


def truncation_apply(params: Dict, w: jax.Array, resolution: int = 256) -> jax.Array:
    """w (B, L*512) -> truncated W+ (B, L, 512)
    (`stylegan_generator_network.py:190-230`)."""
    n_layers = num_synthesis_layers(resolution)
    w = w.reshape(-1, n_layers, W_DIM)
    coefs = np.ones((1, n_layers, 1), np.float32)
    coefs[:, :TRUNCATION_LAYERS] *= TRUNCATION_PSI
    w_avg = params["w_avg"].reshape(1, 1, W_DIM)
    return w_avg + (w - w_avg) * jnp.asarray(coefs)


def _style_mod(p, x, w):
    """AdaIN: x * (s0 + 1) + s1, style = equalized dense(w) with gain=1,
    lr_mul=1 (`stylegan_generator_network.py:426-447`)."""
    style = _dense_block(p["dense"], w, lr_mul=1.0, gain=1.0, act="linear")
    c = x.shape[-1]
    s = style.reshape(-1, 2, c)
    return x * (s[:, 0][:, None, None, :] + 1.0) + s[:, 1][:, None, None, :]


def _epilogue(p, x, w):
    """noise -> bias -> lrelu -> instance-norm -> style modulation
    (`stylegan_generator_network.py:480-508`)."""
    x = x + p["noise"][None, :, :, None] * p["noise_weight"][None, None, None, :]
    x = x + p["bias"][None, None, None, :]
    x = _lrelu(x)
    x = _instance_norm(x)
    return _style_mod(p["style_mod"], x, w)


def _up_conv_fused(p, x):
    """Fused upsample+conv as conv_transpose with the padded-kernel fold
    (`stylegan_generator_network.py:606-616`). p['weight'] is (3, 3, in, out)
    exactly like the torch parameter."""
    cin = p["weight"].shape[2]
    scale = GAIN / math.sqrt(cin * 9)
    k = p["weight"] * scale
    k = jnp.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))
    k = k[1:, 1:] + k[:-1, 1:] + k[1:, :-1] + k[:-1, :-1]  # (4, 4, in, out)
    # torch's F.conv_transpose2d(stride=2, padding=1) == lax.conv_transpose
    # with 'SAME' + transpose_kernel (kernel as (kh, kw, out, in)) — verified
    # numerically against the torch oracle in tests/test_stylegan.py.
    return jax.lax.conv_transpose(
        x,
        k.transpose(0, 1, 3, 2),
        strides=(2, 2),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )


def _up_conv_block(p, x, w, fused: bool):
    if fused:
        x = _up_conv_fused(p, x)
    else:
        cin = x.shape[-1]
        scale = GAIN / math.sqrt(cin * 9)
        x = _upsample_nearest(x)
        x = _conv(x, p["kernel"], padding=((1, 1), (1, 1))) * scale
    x = _blur(x)
    return _epilogue(p["epilogue"], x, w)


def _conv_block(p, x, w):
    cin = x.shape[-1]
    scale = GAIN / math.sqrt(cin * 9)
    x = _conv(x, p["kernel"], padding=((1, 1), (1, 1))) * scale
    return _epilogue(p["epilogue"], x, w)


def _last_conv_block(p, x):
    cin = x.shape[-1]
    x = _conv(x, p["kernel"], padding="VALID") * (1.0 / math.sqrt(cin))
    return x + p["bias"][None, None, None, :]


def synthesis_apply(params: Dict, wp: jax.Array, resolution: int = 256) -> jax.Array:
    """W+ (B, L, 512) -> image (B, res, res, 3) in [-1, 1] (final tanh per the
    wrapper config, `stylegan_generator.py:46`). lod=0 (full-resolution) path.
    """
    final_log2 = int(np.log2(resolution))
    b = wp.shape[0]
    x = jnp.broadcast_to(params["const"][None], (b, INIT_RES, INIT_RES, nf(INIT_RES)))
    x = _epilogue(params["layer0"]["epilogue"], x, wp[:, 0])
    x = _conv_block(params["layer1"], x, wp[:, 1])
    image = _last_conv_block(params["output0"], x)

    for res_log2 in range(3, final_log2 + 1):
        res = 2 ** res_log2
        block_idx = res_log2 - 2
        fused = res >= AUTO_FUSED_MIN_RES  # fused_scale='auto'
        x = _up_conv_block(params[f"layer{2 * block_idx}"], x, wp[:, 2 * block_idx], fused)
        x = _conv_block(params[f"layer{2 * block_idx + 1}"], x, wp[:, 2 * block_idx + 1])
        image = _last_conv_block(params[f"output{block_idx}"], x)
    return jnp.tanh(image)


def generator_apply(params: Dict, z_flat: jax.Array, resolution: int = 256) -> jax.Array:
    """The DAMC G(z): FLAT W+ codes (B, L*512) -> synthesis only — mapping and
    truncation are bypassed (`stylegan_generator.py:111-114`)."""
    n_layers = num_synthesis_layers(resolution)
    wp = z_flat.reshape(-1, n_layers, W_DIM)
    return synthesis_apply(params["synthesis"], wp, resolution)


def sample_w_codes(params: Dict, key: jax.Array, b: int, resolution: int = 256) -> jax.Array:
    """Fresh truncated W+ codes from z ~ N(0, I) — the NaN-rescue path of
    `sample_invert_z` (`src/MCMC.py:88-91`). Returns flat (B, L*512)."""
    z = jax.random.normal(key, (b, W_DIM))
    w = mapping_apply(params["mapping"], z)
    wp = truncation_apply(params["truncation"], w, resolution)
    return wp.reshape(b, -1)


# --------------------------------------------------------------------------
# Inversion encoder
# --------------------------------------------------------------------------

def _bn_inference(p, x, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def encoder_apply(params: Dict, x: jax.Array, resolution: int = 256) -> jax.Array:
    """image (B, res, res, 3) in [-1, 1] -> flat W+ codes (B, L*512).

    use_wscale=False / use_bn=True wrapper config (`stylegan_encoder.py:27-28`).
    With use_wscale off, the ResBlock's conv scale and WScale multiplier cancel
    (`stylegan_encoder_network.py:322-330`), leaving conv + bias -> BN -> lrelu.
    """
    num_blocks = int(np.log2(resolution))
    # block0: FirstBlock (scale=1.0 when use_wscale=False)
    p = params["block0"]
    x = _lrelu(_bn_inference(p["bn"], _conv(x, p["kernel"], padding=((1, 1), (1, 1)))))

    for block_idx in range(1, num_blocks - 1):
        p = params[f"block{block_idx}"]
        x = _avg_pool2(x)
        if "shortcut_kernel" in p:
            y = _lrelu(
                _bn_inference(p["shortcut_bn"], _conv(x, p["shortcut_kernel"], padding="VALID"))
            )
        else:
            y = x
        h = _conv(x, p["conv1_kernel"], padding=((1, 1), (1, 1))) + p["conv1_bias"]
        h = _lrelu(_bn_inference(p["bn1"], h))
        h = _conv(h, p["conv2_kernel"], padding=((1, 1), (1, 1))) + p["conv2_bias"]
        h = _lrelu(_bn_inference(p["bn2"], h))
        x = h + y

    # LastBlock: flatten -> equalized dense (gain 1) -> BN over (B, C, 1, 1)
    p = params[f"block{num_blocks - 1}"]
    # torch flattens NCHW: (B, C, 4, 4) -> (B, C*16); our x is NHWC, so
    # transpose before flattening to match the checkpoint's fc layout.
    b = x.shape[0]
    x = x.transpose(0, 3, 1, 2).reshape(b, -1)
    scale = 1.0 / math.sqrt(x.shape[-1])
    x = x @ p["weight"].T * scale
    return _bn_inference(p["bn"], x)


# --------------------------------------------------------------------------
# VGG16 perceptual features
# --------------------------------------------------------------------------

_VGG_MEAN_BGR = np.array([103.939, 116.779, 123.68], np.float32)
_VGG_CHANNELS = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)


def vgg16_features(params: Dict, x: jax.Array) -> jax.Array:
    """images (B, H, W, 3) RGB in [-1, 1] -> block4_conv3 ReLU features
    (keras preprocessing: [0,255], BGR, mean-subtract; `perceptual_model.py:76-84`).
    """
    x = (x + 1.0) * (255.0 / 2.0)
    x = x[..., ::-1] - jnp.asarray(_VGG_MEAN_BGR, x.dtype)
    i = 0
    for spec in _VGG_CHANNELS:
        if spec == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        else:
            p = params[f"conv{i}"]
            x = jax.nn.relu(_conv(x, p["kernel"], padding=((1, 1), (1, 1))) + p["bias"])
            i += 1
    return x


# --------------------------------------------------------------------------
# Weight conversion (torch .pth state dicts -> param trees)
#
# Converters return HOST numpy trees: conversion is pure host work, and
# emitting one device array per parameter costs O(n_params) synchronous
# tunnel round-trips on this platform (minutes when the remote endpoint is
# contended). Callers that loop jitted calls over the tree must place it
# once with jax.device_put (evaluate_inversion does; numpy jit arguments
# are re-transferred on every call).
# --------------------------------------------------------------------------

def _np(t):
    return np.asarray(t, np.float32)


def _oihw_to_hwio(w):
    return np.ascontiguousarray(_np(w).transpose(2, 3, 1, 0))


def _epilogue_from_sd(sd, prefix):
    return {
        "noise": (_np(sd[f"{prefix}.apply_noise.noise"])[0, 0]),
        "noise_weight": (_np(sd[f"{prefix}.apply_noise.weight"])),
        "bias": (_np(sd[f"{prefix}.bias"])),
        "style_mod": {
            "dense": {
                "weight": (_np(sd[f"{prefix}.style_mod.dense.fc.weight"])),
                "bias": (_np(sd[f"{prefix}.style_mod.dense.wscale.bias"])),
            }
        },
    }


def convert_generator_state_dict(sd, resolution: int = 256) -> Dict:
    """torch `StyleGANGeneratorNet.state_dict()` -> params tree."""
    params: Dict = {"mapping": {}, "truncation": {}, "synthesis": {}}
    for i in range(MAPPING_LAYERS):
        params["mapping"][f"dense{i}"] = {
            "weight": (_np(sd[f"mapping.dense{i}.fc.weight"])),
            "bias": (_np(sd[f"mapping.dense{i}.wscale.bias"])),
        }
    params["truncation"]["w_avg"] = (_np(sd["truncation.w_avg"]))

    syn = params["synthesis"]
    final_log2 = int(np.log2(resolution))
    syn["const"] = (_np(sd["synthesis.layer0.const"])[0].transpose(1, 2, 0))
    for res_log2 in range(2, final_log2 + 1):
        res = 2 ** res_log2
        block_idx = res_log2 - 2
        l0, l1 = f"layer{2 * block_idx}", f"layer{2 * block_idx + 1}"
        if res == INIT_RES:
            syn[l0] = {"epilogue": _epilogue_from_sd(sd, f"synthesis.{l0}.epilogue")}
        elif res >= AUTO_FUSED_MIN_RES:
            syn[l0] = {
                # fused UpConv stores (3, 3, in, out) directly
                "weight": (_np(sd[f"synthesis.{l0}.weight"])),
                "epilogue": _epilogue_from_sd(sd, f"synthesis.{l0}.epilogue"),
            }
        else:
            syn[l0] = {
                "kernel": _oihw_to_hwio(sd[f"synthesis.{l0}.conv.weight"]),
                "epilogue": _epilogue_from_sd(sd, f"synthesis.{l0}.epilogue"),
            }
        syn[l1] = {
            "kernel": _oihw_to_hwio(sd[f"synthesis.{l1}.conv.weight"]),
            "epilogue": _epilogue_from_sd(sd, f"synthesis.{l1}.epilogue"),
        }
        syn[f"output{block_idx}"] = {
            "kernel": _oihw_to_hwio(sd[f"synthesis.output{block_idx}.conv.weight"]),
            "bias": (_np(sd[f"synthesis.output{block_idx}.bias"])),
        }
    return params


def convert_encoder_state_dict(sd, resolution: int = 256) -> Dict:
    """torch `StyleGANEncoderNet.state_dict()` -> params tree."""

    def bn(prefix):
        return {
            "weight": (_np(sd[f"{prefix}.bn.weight"])),
            "bias": (_np(sd[f"{prefix}.bn.bias"])),
            "running_mean": (_np(sd[f"{prefix}.bn.running_mean"])),
            "running_var": (_np(sd[f"{prefix}.bn.running_var"])),
        }

    params: Dict = {}
    num_blocks = int(np.log2(resolution))
    params["block0"] = {
        "kernel": _oihw_to_hwio(sd["block0.conv.weight"]),
        "bn": bn("block0.bn"),
    }
    for i in range(1, num_blocks - 1):
        p = {
            "conv1_kernel": _oihw_to_hwio(sd[f"block{i}.conv1.weight"]),
            "conv1_bias": (_np(sd[f"block{i}.wscale1.bias"])),
            "bn1": bn(f"block{i}.bn1"),
            "conv2_kernel": _oihw_to_hwio(sd[f"block{i}.conv2.weight"]),
            "conv2_bias": (_np(sd[f"block{i}.wscale2.bias"])),
            "bn2": bn(f"block{i}.bn2"),
        }
        if f"block{i}.conv.weight" in sd:  # channel-changing shortcut
            p["shortcut_kernel"] = _oihw_to_hwio(sd[f"block{i}.conv.weight"])
            p["shortcut_bn"] = bn(f"block{i}.bn")
        params[f"block{i}"] = p
    last = num_blocks - 1
    params[f"block{last}"] = {
        "weight": (_np(sd[f"block{last}.fc.weight"])),
        "bn": bn(f"block{last}.bn"),
    }
    # NOTE on wscale1/wscale2 bias: with use_wscale=False the conv scale and
    # wscale multiplier cancel exactly, but the *bias* is NOT rescaled — torch
    # computes (conv/s)*s + bias, so bias converts verbatim. Verified against
    # the torch reference in tests/test_stylegan.py.
    return params


def convert_vgg16_state_dict(sd) -> Dict:
    """torch VGG16 (`perceptual_model.py`) state_dict -> params tree.
    Keys are layer{idx}.weight/bias for conv layers."""
    params: Dict = {}
    conv_idx = 0
    for layer_idx in range(23):
        if f"layer{layer_idx}.weight" in sd:
            params[f"conv{conv_idx}"] = {
                "kernel": _oihw_to_hwio(sd[f"layer{layer_idx}.weight"]),
                "bias": (_np(sd[f"layer{layer_idx}.bias"])),
            }
            conv_idx += 1
    return params


def load_stylegan(
    generator_path: Optional[str] = None,
    encoder_path: Optional[str] = None,
    vgg_path: Optional[str] = None,
    resolution: int = 256,
) -> Dict:
    """Load + convert whichever checkpoints are provided."""
    import torch

    out: Dict = {}
    if generator_path:
        sd = torch.load(generator_path, map_location="cpu", weights_only=True)
        sd = {k: v for k, v in sd.items()}
        out["generator"] = convert_generator_state_dict(sd, resolution)
    if encoder_path:
        sd = torch.load(encoder_path, map_location="cpu", weights_only=True)
        out["encoder"] = convert_encoder_state_dict(sd, resolution)
    if vgg_path:
        sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
        out["vgg"] = convert_vgg16_state_dict(sd)
    return out
