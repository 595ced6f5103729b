"""AOT serving artifacts: serialized, pre-lowered serving programs.

The reference deploys by shipping source + a `.pth.tar` and re-running its
Python model code at load time (`eval_gen_recon.py:28-60`). On TPU the
idiomatic deployment unit is different: `jax.export` serializes the jitted
program itself (StableHLO, lowered for a fixed set of platforms) with the
trained params baked in as constants. An artifact directory is therefore
fully self-contained — loading it needs **no model-building code, no
checkpoint, and no trace**, just `jax.export.deserialize` + compile — and
it is immune to model-code drift between training and serving.

Layout of an artifact directory:

    meta.json               format/version, paths, shapes, platforms
    damc_b<B>.jaxexport     serialized Exported: (keys[B,2]) -> images
    ebm_b<B>.jaxexport      (keys[B,2]) -> images   [when the config has an EBM]
    recon_b<B>.jaxexport    (keys[B,2], x[B,H,W,C]) -> (x_hat, z)

The programs are the SAME functions the live `SamplerService` jits
(`serve.build_serving_fns` is the single source of truth), exported at one
fixed batch size — the deterministic single-bucket serving mode. Exporting
for `platforms=("cpu", "tpu")` lets one artifact built on a CPU dev box
serve on TPU and vice versa; per-request determinism (key = fold_in(seed, i))
carries over unchanged because the exported program IS the live program.

Serving from an artifact: `SamplerService.from_artifact(dir)` or
`python -m damc_tpu.cli.serve --artifact dir`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .serve import build_serving_fns
from .utils.config import Config

FORMAT_VERSION = 1
_META = "meta.json"


def _program_file(path: str, batch_size: int) -> str:
    return f"{path}_b{batch_size}.jaxexport"


def export_serving_artifact(
    state,
    models,
    cfg: Config,
    out_dir,
    batch_size: int = 16,
    recon_langevin_steps: int = 10,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Dict[str, Any]:
    """Export the serving programs for `state` into `out_dir`.

    One serialized program per path at ONE fixed batch size (the
    deterministic serving bucket). Params are captured as program
    constants. Returns the written meta dict."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    sg = jax.lax.stop_gradient
    params_e = sg(state.params_e) if models.ebm is not None else None
    fns = build_serving_fns(
        models, sg(state.params_q), sg(state.params_g), params_e, cfg,
        recon_langevin_steps,
    )

    image_shape = (cfg.model.image_size, cfg.model.image_size, cfg.model.nc)
    key = jax.random.PRNGKey(0)
    key_spec = jax.ShapeDtypeStruct((batch_size,) + key.shape, key.dtype)
    x_spec = jax.ShapeDtypeStruct((batch_size,) + image_shape, jnp.float32)

    files = {}
    for path, (fn, _, _) in fns.items():
        specs = (key_spec, x_spec) if path == "recon" else (key_spec,)
        exported = jax.export.export(jax.jit(fn), platforms=list(platforms))(
            *specs
        )
        fname = _program_file(path, batch_size)
        (out / fname).write_bytes(exported.serialize())
        files[path] = fname

    meta: Dict[str, Any] = {
        "format_version": FORMAT_VERSION,
        "kind": "damc_serving_artifact",
        "paths": sorted(fns),
        "files": files,
        "batch_size": int(batch_size),
        "image_shape": list(image_shape),
        "nz": int(cfg.model.nz),
        "dataset": cfg.model.dataset,
        "recon_langevin_steps": int(recon_langevin_steps),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "trained_step": int(jax.device_get(state.step)),
        # The exported input spec bakes in the export host's PRNG key
        # layout (threefry: shape (2,) uint32; rbg: (4,)). A serving box
        # with a different jax_default_prng_impl would build mismatched
        # keys and fail with an opaque shape error — record the layout so
        # load_serving_artifact can fail with a clear message instead.
        "prng_impl": str(jax.config.jax_default_prng_impl),
        "key_shape": list(key.shape),
        "key_dtype": str(key.dtype),
    }
    (out / _META).write_text(json.dumps(meta, indent=2))
    return meta


def load_serving_artifact(
    artifact_dir,
) -> Tuple[Dict[str, Callable], Dict[str, Any]]:
    """Deserialize an artifact directory into `(fns, meta)` where `fns`
    maps each path to a jitted callable at the exported batch size.

    Raises ValueError on a missing/unsupported meta, and surfaces
    jax.export's own error when the current backend is not among the
    artifact's platforms (exported programs refuse to run elsewhere)."""
    d = Path(artifact_dir)
    meta_path = d / _META
    if not meta_path.is_file():
        raise ValueError(f"{d} is not a serving artifact: no {_META}")
    meta = json.loads(meta_path.read_text())
    if meta.get("kind") != "damc_serving_artifact":
        raise ValueError(f"{meta_path} is not a damc serving artifact")
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"artifact format_version {meta.get('format_version')} not "
            f"supported (this build reads {FORMAT_VERSION})"
        )
    # jax.default_backend() reports 'gpu' on CUDA/ROCm boxes but
    # jax.export platform names are 'cuda'/'rocm' — expand the alias before
    # the membership check so a cpu,cuda artifact is not spuriously
    # rejected on GPU (Exported.call re-checks the real platform anyway).
    backend = jax.default_backend()
    backend_names = {"gpu": ("cuda", "rocm")}.get(backend, (backend,))
    if not any(b in meta["platforms"] for b in backend_names):
        raise ValueError(
            f"artifact was exported for platforms {meta['platforms']}; "
            f"current backend is {backend!r}"
        )
    # Validate the PRNG key layout against the export host's (see
    # export_serving_artifact); absent fields = pre-layout artifact, skip.
    if "key_shape" in meta:
        probe = jax.random.PRNGKey(0)
        if (
            list(probe.shape) != list(meta["key_shape"])
            or str(probe.dtype) != meta["key_dtype"]
        ):
            raise ValueError(
                f"artifact was exported with PRNG impl "
                f"{meta.get('prng_impl')!r} (key shape {meta['key_shape']}, "
                f"dtype {meta['key_dtype']}); this process builds keys of "
                f"shape {list(probe.shape)}, dtype {probe.dtype} — set "
                f"jax_default_prng_impl to match the export host"
            )
    fns: Dict[str, Callable] = {}
    for path in meta["paths"]:
        f = d / meta["files"][path]
        if not f.is_file():
            raise ValueError(f"artifact is missing program file {f}")
        exported = jax.export.deserialize(f.read_bytes())
        fns[path] = jax.jit(exported.call)
    return fns, meta
