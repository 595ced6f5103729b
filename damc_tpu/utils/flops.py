"""Analytic FLOPs model for the gen_recon sampling phase (round-3 evidence).

Why this exists: XLA's `compiled.cost_analysis()` counts the body of a
`lax.scan`/`while` loop ONCE, not x trip-count — on the sampling phase
(30-step posterior + 60-step prior + 100-step sweep, all scans) it
under-reports true FLOPs by ~30x, which made the phase look like 2.5% MFU
when it is actually compute-bound near the one-pass-bf16 matmul rate
(artifacts/mfu_probe.json: a chained 4096^2 f32 matmul measures
~148 TFLOP/s on v5e; bf16 operands ~178). This module counts the multiplied
work by hand from the SAME layer specs the models are built from
(models/generators.py::generator_spec, models/encoders.py::encoder_spec,
models/denoiser.py widths), so bench.py can report achieved-FLOPs/MFU that
carries its own derivation. Validated against XLA cost_analysis on
UN-scanned single applies in tests/test_flops_model.py.

Conventions: 1 MAC = 2 FLOPs; elementwise/activation work is ignored
(<2% of conv/matmul work at these shapes); backward-through-input of a
conv/matmul costs the same MACs as its forward (the sampling phase never
needs weight gradients — everything is stop_gradient'd except z).
"""

from __future__ import annotations

from typing import Optional

from ..models.encoders import encoder_spec
from ..models.generators import generator_spec

# Dense bf16 peak FLOP/s per chip by device_kind substring (public specs).
# Single source of truth for every MFU computation (bench.py,
# tools/mfu_probe.py).
PEAK_BF16_BY_DEVICE_KIND = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v5": 459e12,  # bare "TPU v5" = v5p (checked AFTER the lite/e variants)
}


def peak_bf16_flops(device_kind: str):
    """Chip dense-bf16 peak for an MFU denominator; None if unknown.

    Dict insertion order IS the match order (lite/e variants before the
    bare "v5" catch-all) — add new chips to the dict only."""
    dk = device_kind.lower()
    for key, peak in PEAK_BF16_BY_DEVICE_KIND.items():
        if key in dk:
            return peak
    return None


def xla_cost_flops(jitted, args):
    """FLOPs of a compiled program per XLA's own cost model, or None.

    Counts a lax.scan body ONCE (see module docstring) — only valid as a
    cross-check on un-scanned programs. Shared by bench.py and
    tools/mfu_probe.py."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _out_hw(size: int, kernel: int, stride: int, padding) -> int:
    """Output spatial size of a conv layer as encoder_spec encodes it."""
    if padding == "SAME":
        return -(-size // stride)
    if padding == "VALID":
        return (size - kernel) // stride + 1
    # explicit symmetric int padding p (the torch k=4,s=2,p=1 case)
    p = padding if isinstance(padding, int) else padding[0]
    return (size + 2 * p - kernel) // stride + 1


def conv_fwd_flops(h: int, w: int, cin: int, cout: int, k: int, stride: int,
                   padding) -> tuple[float, int]:
    """(FLOPs for one image, out_size) of a dense conv layer."""
    oh = _out_hw(h, k, stride, padding)
    return 2.0 * oh * oh * k * k * cin * cout, oh


def _convt_taps_1d(h: int, k: int, stride: int, pad: int, out: int) -> int:
    """EXACT per-dimension tap count of a ConvTranspose: for each output o,
    the number of kernel taps ki with (o + pad - ki) % stride == 0 and
    0 <= (o + pad - ki)//stride < h. Edge clipping matters at these map
    sizes (23% of interior MACs at h=4, k=4, s=2)."""
    total = 0
    for o in range(out):
        for ki in range(k):
            j = o + pad - ki
            if j % stride == 0 and 0 <= j // stride < h:
                total += 1
    return total


def convt_fwd_flops(h: int, cin: int, cout: int, k: int, stride: int,
                    padding: str = "SAME") -> tuple[float, int]:
    """(FLOPs for one image, out_size) of a ConvTranspose layer, exact.

    Padding mapping mirrors models/generators.py: 'VALID' stride-1 = torch
    pad 0 (out = h + k - 1, the 1x1 -> k first layer); 'SAME' stride-2 k=4 =
    torch pad 1 (out = 2h); 'SAME' stride-1 k=3 = torch pad 1 (out = h)."""
    if padding == "VALID":
        out, pad = h + k - 1, 0
    else:
        out = stride * h
        pad = (k - stride) // 2 if stride > 1 else (k - 1) // 2
    taps = _convt_taps_1d(h, k, stride, pad, out)
    return 2.0 * taps * taps * cin * cout, out


def generator_fwd_flops(dataset: str, ngf: int, nc: int, nz: int) -> float:
    """One G(z) forward, per image."""
    total, size, cin = 0.0, 1, nz
    for features, kernel, stride, pad in generator_spec(dataset, ngf, nc):
        f, size = convt_fwd_flops(size, cin, features, kernel, stride, pad)
        total += f
        cin = features
    return total


def encoder_fwd_flops(dataset: str, nemb: int, nif: int, image_size: int,
                      nc: Optional[int] = None) -> float:
    """One encoder forward, per image. `nc` is the image channel count
    (cfg.model.nc); the dataset-based fallback exists for callers that
    predate the parameter."""
    if nc is None:
        nc = 3 if dataset != "mnist" else 1
    total, size, cin = 0.0, image_size, nc
    for features, kernel, stride, padding, _act in encoder_spec(dataset, nemb, nif):
        f, size = conv_fwd_flops(size, size, cin, features, kernel, stride, padding)
        total += f
        cin = features
    return total


def _csl_dims(nz: int, nf: int, widths=None):
    """(dim_in, dim_out) of every ConcatSquashLinear in the denoiser U-Net
    (models/denoiser.py::LatentDenoiser.setup)."""
    narrow, wide = widths or (32 * nf, 64 * nf)
    return [
        (2 * nz, narrow), (narrow, wide), (wide, wide),   # in
        (wide, wide),                                      # mid
        (2 * wide, wide), (2 * wide, narrow), (2 * narrow, nz),  # out
    ]


def denoiser_fwd_flops(nz: int, nxemb: int, ntemb: int, nf: int,
                       widths=None) -> float:
    """One eps-prediction eval, per sample, on the hoisted sampling path
    (ctx 'pre' tables precomputed per sweep — see denoiser_sweep_setup_flops
    for that cost). Per eval each ConcatSquashLinear still runs FOUR
    matmuls (models/denoiser.py::film_from_pre + apply_x): the FiLM _gate
    and _hyper_bias (dim_out x dim_out each, NOT hoistable — they act on
    the combined per-step pre), and the x-path _lin and _skip (dim_in x
    dim_out each); plus the fourier input projection."""
    mac = sum(2 * di * do + 2 * do * do for di, do in _csl_dims(nz, nf, widths))
    fourier = nz * (nz // 2)
    return 2.0 * (mac + fourier)


def denoiser_sweep_setup_flops(nz: int, nxemb: int, ntemb: int, nf: int,
                               n_steps: int, widths=None) -> tuple[float, float]:
    """Per-sweep cost of sample_tables (models/denoiser.py): returns
    (per_sample, whole_sweep_batch_independent).

    per_sample: SiLU(xemb) @ Kx per layer, once per sweep per sample.
    batch-independent: the (n_steps, ntemb) temb MLP + SiLU(temb) @ Kt per
    layer for the whole step grid, amortized over the batch."""
    outs = [do for _, do in _csl_dims(nz, nf, widths)]
    per_sample = 2.0 * nxemb * sum(outs)
    per_grid = 2.0 * n_steps * (ntemb * sum(outs) + 2 * ntemb * ntemb)
    return per_sample, per_grid


def ebm_fwd_flops(nz: int, ndf: int, n_hidden: int = 2) -> float:
    dims, d = [], nz
    for _ in range(n_hidden):
        dims.append((d, ndf))
        d = ndf
    dims.append((d, 1))
    return 2.0 * sum(di * do for di, do in dims)


def sampling_phase_flops(cfg, batch: int) -> dict:
    """Total FLOPs of one gen_recon sampling phase at batch B.

    Structure (train/step.py:60-102, bench.py::bench_sampling_phase):
      * sample_q: encoder once + n_interval denoiser evals (guidance off at
        every reference call site => 1 eval/step);
      * posterior Langevin: g_l_steps x grad_z[||x-G(z)||^2/2s^2 + E(z)]
        = fwd + input-bwd of G and E per step (no weight grads);
      * prior Langevin: e_l_steps x grad_z E(z) over 2B chains.
    """
    m, d, mc = cfg.model, cfg.diffusion, cfg.mcmc
    g_fwd = generator_fwd_flops(m.dataset, m.ngf, m.nc, m.nz)
    enc_fwd = encoder_fwd_flops(m.dataset, m.nxemb, m.nif, m.image_size, m.nc)
    den_fwd = denoiser_fwd_flops(m.nz, m.nxemb, m.ntemb, m.nf)
    setup_per_sample, setup_grid = denoiser_sweep_setup_flops(
        m.nz, m.nxemb, m.ntemb, m.nf, d.n_interval
    )
    e_fwd = ebm_fwd_flops(m.nz, m.ndf)

    sweep = batch * (enc_fwd + d.n_interval * den_fwd + setup_per_sample) + setup_grid
    posterior = batch * mc.g_l_steps * (2.0 * g_fwd + 2.0 * e_fwd)
    prior = 2 * batch * mc.e_l_steps * (2.0 * e_fwd)
    return {
        "generator_fwd_per_image": g_fwd,
        "encoder_fwd_per_image": enc_fwd,
        "denoiser_eval_per_sample": den_fwd,
        "ebm_fwd_per_sample": e_fwd,
        "sweep": sweep,
        "posterior": posterior,
        "prior": prior,
        "total": sweep + posterior + prior,
    }
