"""Reference-checkpoint migration: torch `.pth.tar` -> damc_tpu param trees.

Lets a user of the PyTorch reference switch to this framework mid-project:
converts the reference's training checkpoints (`train_gen_recon.py:282-294`
save format — G/Q/Q_dummy/E state dicts) into our Flax param trees with
EXACT numerical parity (verified layer-by-layer in tests/test_torch_parity.py
and tests/test_torch_compat.py).

Mappings (all verified empirically against torch):
  * Linear (out,in) -> Dense kernel (in,out) transpose
  * Conv2d OIHW -> Conv HWIO transpose(2,3,1,0)
  * ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose (kh,kw,in,out) with
    a SPATIAL FLIP (torch's transposed conv flips; flax's does not)
  * InstanceNorm2d affine -> GroupNorm(group_size=1) scale/bias
  * ConcatSquashLinearSkipCtx -> ConcatSquashLinear (ctx kernel/bias owned
    directly; gate/bias/lin/skip as named Dense submodules)

Optimizer states are NOT converted (torch Adam moments and optax states have
different dtypes/trees); training resumes with fresh optimizers, which the
reference itself effectively does for E (`train_gen_recon.py:163-170`).

Converters return HOST numpy trees (conversion is host work; per-leaf
device arrays cost O(n_params) tunnel round-trips — see utils/placement).
Orbax saves numpy directly; callers feeding a jit loop should place once
with `utils.placement.device_put_packed`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t, np.float32)


def _dense(sd, prefix):
    p = {"kernel": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.ascontiguousarray(_np(sd[f"{prefix}.bias"]))
    return p


def _conv(sd, prefix):
    p = {"kernel": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.ascontiguousarray(_np(sd[f"{prefix}.bias"]))
    return p


def _conv_transpose(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (in, out, kh, kw)
    p = {
        "kernel": np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    }
    if f"{prefix}.bias" in sd:
        p["bias"] = np.ascontiguousarray(_np(sd[f"{prefix}.bias"]))
    return p


def convert_generator(sd: Dict) -> Dict:
    """torch `_netG_*` state_dict -> DeconvGenerator params.

    The reference stacks are Sequential with ConvTranspose2d at even indices
    (`diffusion_net.py:20-203`)."""
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("gen.") and "weight" in k}
    )
    params = {}
    for i, idx in enumerate(idxs):
        params[f"ConvTranspose_{i}"] = _conv_transpose(sd, f"gen.{idx}")
    return {"params": params}


def convert_toy_generator(sd: Dict) -> Dict:
    """torch toy `G` state_dict -> ToyGenerator params.

    The reference toy likelihood net is Sequential Linears at even indices
    (`toy_example/toy_example.py:22-47`). It is never checkpointed by the
    reference (random per run) — this direction exists so OUR exported toy
    checkpoints (which do carry G for reproducibility) round-trip."""
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("net.") and "weight" in k}
    )
    return {
        "params": {
            f"Dense_{i}": _dense(sd, f"net.{idx}") for i, idx in enumerate(idxs)
        }
    }


def convert_ebm(sd: Dict) -> Dict:
    """torch `_netE` -> LatentEBM params (`diffusion_net.py:207-223`)."""
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("ebm.") and "weight" in k}
    )
    return {
        "params": {
            f"Dense_{i}": _dense(sd, f"ebm.{idx}") for i, idx in enumerate(idxs)
        }
    }


def convert_conv_encoder(sd: Dict, prefix: str = "net") -> Dict:
    """torch `Encoder_*` -> ConvEncoder params (`diffusion_net.py:227-413`).

    Sequential layout: Conv2d / InstanceNorm2d / LeakyReLU triplets with a
    final Conv2d."""
    conv_idxs, norm_idxs = [], []
    for k in sd:
        if not k.startswith(prefix + "."):
            continue
        idx = int(k[len(prefix) + 1 :].split(".")[0])
        if k.endswith(".weight"):
            shape = _np(sd[k]).shape
            (conv_idxs if len(shape) == 4 else norm_idxs).append(idx)
    params = {}
    for i, idx in enumerate(sorted(set(conv_idxs))):
        params[f"Conv_{i}"] = _conv(sd, f"{prefix}.{idx}")
    for i, idx in enumerate(sorted(set(norm_idxs))):
        params[f"GroupNorm_{i}"] = {
            "scale": np.ascontiguousarray(_np(sd[f"{prefix}.{idx}.weight"])),
            "bias": np.ascontiguousarray(_np(sd[f"{prefix}.{idx}.bias"])),
        }
    return {"params": params}


def _csl(sd, prefix):
    """torch ConcatSquashLinearSkipCtx -> ConcatSquashLinear params
    (`diffusion_net.py:417-445`)."""
    return {
        "ctx_kernel": np.ascontiguousarray(_np(sd[f"{prefix}._layer_ctx.1.weight"]).T),
        "ctx_bias": np.ascontiguousarray(_np(sd[f"{prefix}._layer_ctx.1.bias"])),
        "_gate": _dense(sd, f"{prefix}._hyper_gate"),
        "_hyper_bias": _dense(sd, f"{prefix}._hyper_bias"),
        "_lin": _dense(sd, f"{prefix}._layer.0"),
        "_skip": _dense(sd, f"{prefix}._skip"),
    }


def convert_denoiser(sd: Dict, prefix: str = "") -> Dict[str, Dict]:
    """torch `Diffusion_UnetA` -> LatentDenoiser params
    (`diffusion_net.py:463-533`). Returns the bare param dict (no 'params'
    wrapper) so it can nest inside the amortizer tree."""
    pre = prefix + "." if prefix else ""
    p = {
        "fourier_b": np.ascontiguousarray(_np(sd[f"{pre}B"])),
        "time_d1": _dense(sd, f"{pre}time_mlp.1"),
        "time_d2": _dense(sd, f"{pre}time_mlp.3"),
    }
    for group, count in (("in_layers", 3), ("mid_layers", 1), ("out_layers", 3)):
        for i in range(count):
            p[f"{group}_{i}"] = _csl(sd, f"{pre}{group}.{i}")
    return p


def convert_amortizer(sd: Dict, dataset: str = "cifar10") -> Dict:
    """torch `_netQ_U` -> DAMCAmortizer params (`diffusion_net.py:537-645`).

    Covers the conv-encoder datasets and 'toy' (MLP encoder); the StyleGAN
    variant's encoder is external/frozen (`models/stylegan.py` converters).
    The reference's unused legacy `xemb` parameter is dropped.
    """
    params: Dict = {"p": convert_denoiser(sd, "p")}
    params["prior_emb"] = {
        "Dense_0": _dense(sd, "prior_emb.0"),
        "Dense_1": _dense(sd, "prior_emb.2"),
    }
    if dataset == "toy":
        enc_idxs = sorted(
            {int(k.split(".")[1]) for k in sd if k.startswith("encoder.") and k.endswith("weight")}
        )
        params["encoder"] = {
            f"Dense_{i}": _dense(sd, f"encoder.{idx}") for i, idx in enumerate(enc_idxs)
        }
    elif dataset != "stylegan":
        params["encoder"] = convert_conv_encoder(sd, "encoder.net")["params"]
    return {"params": params}


# --------------------------------------------------------------------------
# Reverse direction: damc_tpu param trees -> reference torch state dicts
# --------------------------------------------------------------------------
#
# Exact inverses of the mappings above, emitting the reference classes'
# Sequential key layouts (verified by strict round-trip tests against the
# real reference modules, tests/test_torch_compat.py):
#   * generators: ConvTranspose2d at even indices 0,2,..  (`diffusion_net.py:26-47`)
#   * EBM: Linear at 0,2,4                                 (`:212-220`)
#   * encoders: (Conv2d, InstanceNorm2d, LeakyReLU) triplets, final Conv2d
#     at 3k                                                (`:233-262`)
#   * prior_emb: Linear at 0,2                             (`:577-581`)
#   * toy MLP encoder: Linear at 0,2,4,6      (`toy_example/.../diffusion_net.py:166-174`)


def _t(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _export_dense(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _export_conv(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _export_conv_transpose(p, sd, prefix):
    # inverse of _conv_transpose: (kh, kw, in, out) -> flip -> (in, out, kh, kw)
    k = _t(p["kernel"]).transpose(2, 3, 0, 1)
    sd[f"{prefix}.weight"] = np.ascontiguousarray(k[:, :, ::-1, ::-1])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def export_generator(params: Dict) -> Dict[str, np.ndarray]:
    """DeconvGenerator params -> torch `_netG_*` state_dict arrays."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(len(p)):
        _export_conv_transpose(p[f"ConvTranspose_{i}"], sd, f"gen.{2 * i}")
    return sd


def export_toy_generator(params: Dict) -> Dict[str, np.ndarray]:
    """ToyGenerator params -> torch toy-`G` state_dict arrays
    (Sequential Linears at 0/2/4/6, `toy_example/toy_example.py:26-34`)."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(len(p)):
        _export_dense(p[f"Dense_{i}"], sd, f"net.{2 * i}")
    return sd


def export_ebm(params: Dict) -> Dict[str, np.ndarray]:
    """LatentEBM params -> torch `_netE` state_dict arrays."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(len(p)):
        _export_dense(p[f"Dense_{i}"], sd, f"ebm.{2 * i}")
    return sd


def export_conv_encoder(p: Dict, prefix: str = "net") -> Dict[str, np.ndarray]:
    """ConvEncoder params -> torch `Encoder_*` state_dict arrays."""
    sd: Dict[str, np.ndarray] = {}
    n_conv = sum(1 for k in p if k.startswith("Conv_"))
    n_norm = sum(1 for k in p if k.startswith("GroupNorm_"))
    for i in range(n_conv):
        _export_conv(p[f"Conv_{i}"], sd, f"{prefix}.{3 * i}")
    for i in range(n_norm):
        sd[f"{prefix}.{3 * i + 1}.weight"] = _t(p[f"GroupNorm_{i}"]["scale"])
        sd[f"{prefix}.{3 * i + 1}.bias"] = _t(p[f"GroupNorm_{i}"]["bias"])
    return sd


def _export_csl(p, sd, prefix):
    sd[f"{prefix}._layer_ctx.1.weight"] = _t(p["ctx_kernel"]).T
    sd[f"{prefix}._layer_ctx.1.bias"] = _t(p["ctx_bias"])
    _export_dense(p["_gate"], sd, f"{prefix}._hyper_gate")
    _export_dense(p["_hyper_bias"], sd, f"{prefix}._hyper_bias")
    _export_dense(p["_lin"], sd, f"{prefix}._layer.0")
    _export_dense(p["_skip"], sd, f"{prefix}._skip")


def export_denoiser(p: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """LatentDenoiser params -> torch `Diffusion_UnetA` state_dict arrays."""
    pre = prefix + "." if prefix else ""
    sd: Dict[str, np.ndarray] = {pre + "B": _t(p["fourier_b"])}
    _export_dense(p["time_d1"], sd, f"{pre}time_mlp.1")
    _export_dense(p["time_d2"], sd, f"{pre}time_mlp.3")
    for group, count in (("in_layers", 3), ("mid_layers", 1), ("out_layers", 3)):
        for i in range(count):
            _export_csl(p[f"{group}_{i}"], sd, f"{pre}{group}.{i}")
    return sd


def export_amortizer(params: Dict, dataset: str = "cifar10", nxemb: int = 1024) -> Dict[str, np.ndarray]:
    """DAMCAmortizer params -> torch `_netQ_U` state_dict arrays.

    The reference's unused legacy `xemb` parameter (`diffusion_net.py:576`,
    dropped on import) is re-emitted as zeros of shape (1, nxemb) so
    `load_state_dict(strict=True)` succeeds.
    """
    p = params["params"]
    sd = export_denoiser(p["p"], "p")
    sd["xemb"] = np.zeros((1, nxemb), np.float32)
    _export_dense(p["prior_emb"]["Dense_0"], sd, "prior_emb.0")
    _export_dense(p["prior_emb"]["Dense_1"], sd, "prior_emb.2")
    if dataset == "toy":
        n = sum(1 for k in p.get("encoder", {}) if k.startswith("Dense_"))
        for i in range(n):
            _export_dense(p["encoder"][f"Dense_{i}"], sd, f"encoder.{2 * i}")
    elif dataset != "stylegan" and "encoder" in p:
        sd.update(export_conv_encoder(p["encoder"], "encoder.net"))
    return sd


def export_reference_checkpoint(
    state, path: str, dataset: str = "cifar10", nxemb: int = 1024
) -> None:
    """Save a DAMCState as a reference-format `.pth.tar` (torch tensors).

    The output loads into the reference's training/eval scripts
    (`train_gen_recon.py:163-170` reads {G,Q,Q_dummy,E}_state_dict + iter) —
    migration works in BOTH directions.

    dataset='toy' follows the toy checkpoint shape (`toy_example.py:242-247`:
    Q/Q_dummy/iter, no E — the toy workload has no EBM) plus a G_state_dict
    the reference never saves (its toy G is random per run); the extra key is
    ignored by the reference's resume and makes the frozen likelihood net
    reproducible here."""
    import torch

    as_torch = lambda sd: {
        k: torch.from_numpy(np.array(v, np.float32, copy=True)) for k, v in sd.items()
    }
    if dataset == "toy":
        g_sd = export_toy_generator(state.params_g)
    else:
        g_sd = export_generator(state.params_g)
    ckpt = {
        "iter": int(state.step),
        "G_state_dict": as_torch(g_sd),
        "Q_state_dict": as_torch(export_amortizer(state.params_q, dataset, nxemb)),
        "Q_dummy_state_dict": as_torch(export_amortizer(state.params_q_ema, dataset, nxemb)),
    }
    if state.params_e is not None:
        ckpt["E_state_dict"] = as_torch(export_ebm(state.params_e))
    torch.save(ckpt, path)


def convert_reference_checkpoint(path: str, dataset: str = "cifar10") -> Dict:
    """Load a reference `.pth.tar` and convert every model it contains.

    Returns {'params_g', 'params_e', 'params_q', 'params_q_ema'} (whichever
    state dicts are present). Plug into `DAMCState.replace(...)` to resume.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)

    out: Dict = {"iter": int(ckpt.get("iter", 0))}
    if "G_state_dict" in ckpt:
        if dataset == "toy":
            out["params_g"] = convert_toy_generator(ckpt["G_state_dict"])
        else:
            out["params_g"] = convert_generator(ckpt["G_state_dict"])
    if "E_state_dict" in ckpt:
        out["params_e"] = convert_ebm(ckpt["E_state_dict"])
    if "Q_state_dict" in ckpt:
        out["params_q"] = convert_amortizer(ckpt["Q_state_dict"], dataset)
    if "Q_dummy_state_dict" in ckpt:
        out["params_q_ema"] = convert_amortizer(ckpt["Q_dummy_state_dict"], dataset)
    return out
