"""One-command real-FID readiness (VERDICT r3 item 4).

The BASELINE gate "FID within 5% of the reference" needs the real
pytorch-fid InceptionV3 checkpoint (`pt_inception-2015-12-05-6726825d.pth`),
which this image does not ship — every recorded quality number therefore
uses the honestly-labeled `frechet_rand` fallback (cli/common.py). This
tool makes the proof a single command the moment weights exist:

    DAMC_INCEPTION_WEIGHTS=/path/to/pt_inception-2015-12-05-6726825d.pth \
        python tools/validate_real_inception.py

It (1) converts the checkpoint with `convert_torch_state_dict` (BN folded),
(2) runs the SAME weights through the torch reconstruction of pytorch-fid's
graph (tests/test_inception_full_graph.py — architecture pinned by the
existing oracle tests) and through our JAX NHWC graph on a fixed seeded
image set, (3) asserts pool3 features match within the golden tolerance the
oracle tests established (2e-3 relative), and (4) computes FID between two
halves of the set from both feature stacks and asserts the values agree.
Reference anchor: `/root/reference/workspace/src/MCMC.py:130-144`
(pfw.fid on InceptionV3 pool3 statistics).

Exit 0 + one JSON line on success; exit 2 with a clear message when no
weights are available. `tests/test_real_inception.py` runs the same core
and is skipped-by-default until weights exist.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

FEATURE_RTOL = 2e-3  # golden tolerance from tests/test_inception_full_graph.py
FID_ATOL = 0.1  # |FID_jax - FID_torch| on identical images, 256-sample halves


def find_weights(path: str | None = None) -> str | None:
    from damc_tpu.models.inception import DEFAULT_WEIGHTS_PATHS, WEIGHTS_ENV_VAR

    for cand in [path, os.environ.get(WEIGHTS_ENV_VAR), *DEFAULT_WEIGHTS_PATHS]:
        if cand and os.path.exists(cand):
            return cand
    return None


def validate(weights_path: str, n: int = 256, image_size: int = 32) -> dict:
    """Convert + dual-stack feature/FID comparison. Returns a verdict dict
    (raises AssertionError with context on any mismatch)."""
    import jax
    import jax.numpy as jnp
    import torch

    from damc_tpu.metrics.fid import compute_stats, frechet_distance
    from damc_tpu.models.inception import (
        convert_torch_state_dict,
        inception_pool3,
    )
    from test_inception_full_graph import TorchFIDInception

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    model = TorchFIDInception()
    # The published checkpoint also carries AuxLogits + fc (unused past
    # pool3); load what the graph needs and fail on anything missing.
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not missing, f"checkpoint is missing graph weights: {missing[:5]}"
    model.eval()
    params = convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    )

    # Fixed seeded image set in [0,1] at dataset resolution; both stacks
    # resize to 299 with bilinear/align_corners=False (the pytorch-fid
    # protocol; resize parity is pinned by test_resize_matches_torch_...).
    x = np.random.RandomState(0).rand(n, image_size, image_size, 3).astype(
        np.float32
    )
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        xt = torch.nn.functional.interpolate(
            xt, size=(299, 299), mode="bilinear", align_corners=False
        )
        ref_feats = np.concatenate(
            [model(xt[i : i + 32]).numpy() for i in range(0, n, 32)]
        )
    pool3 = jax.jit(lambda p, xx: inception_pool3(p, xx, resize=True))
    mine_feats = np.concatenate(
        [
            np.asarray(pool3(params, jnp.asarray(x[i : i + 32])))
            for i in range(0, n, 32)
        ]
    )
    scale = float(np.abs(ref_feats).mean())
    feat_err = float(np.max(np.abs(mine_feats - ref_feats)))
    # Same golden tolerance as the oracle tests
    # (tests/test_inception_full_graph.py::test_pool3_matches_torch_*).
    np.testing.assert_allclose(
        mine_feats, ref_feats, atol=FEATURE_RTOL * scale, rtol=FEATURE_RTOL
    )

    # FID between the two halves of the SAME image set, from each stack's
    # features — the end-to-end number the 5% BASELINE gate consumes.
    def fid_of(feats):
        half = n // 2
        mu1, s1 = compute_stats(lambda b: b, [feats[:half]])
        mu2, s2 = compute_stats(lambda b: b, [feats[half:]])
        return float(frechet_distance(mu1, s1, mu2, s2))

    fid_torch = fid_of(ref_feats)
    fid_jax = fid_of(mine_feats)
    assert abs(fid_jax - fid_torch) <= FID_ATOL, (
        f"FID mismatch: jax {fid_jax:.4f} vs torch {fid_torch:.4f}"
    )

    # The CLI path must now resolve to the REAL metric, not frechet_rand
    # (make_feature_fn reads $DAMC_INCEPTION_WEIGHTS via
    # try_load_inception_feature_fn).
    from damc_tpu.cli.common import make_feature_fn
    from damc_tpu.models.inception import WEIGHTS_ENV_VAR
    from damc_tpu.utils.config import preset

    cfg = preset("cifar10")
    old = os.environ.get(WEIGHTS_ENV_VAR)
    os.environ[WEIGHTS_ENV_VAR] = weights_path
    try:
        _, metric_name = make_feature_fn(cfg)
    finally:
        if old is None:
            os.environ.pop(WEIGHTS_ENV_VAR, None)
        else:
            os.environ[WEIGHTS_ENV_VAR] = old
    assert metric_name == "fid", (
        f"make_feature_fn resolved {metric_name!r}, expected real 'fid'"
    )

    return {
        "weights": weights_path,
        "n_images": n,
        "pool3_max_abs_err": feat_err,
        "pool3_feature_scale": scale,
        "fid_torch_stack": fid_torch,
        "fid_jax_stack": fid_jax,
        "fid_abs_diff": abs(fid_jax - fid_torch),
        "metric_name": metric_name,
        "ok": True,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default=None, help="checkpoint path "
                   "(default: $DAMC_INCEPTION_WEIGHTS / known locations)")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--out", default=None, help="also write the verdict JSON here")
    args = p.parse_args(argv)
    path = find_weights(args.weights)
    if path is None:
        print(
            "no InceptionV3 weights found: set $DAMC_INCEPTION_WEIGHTS to "
            "pt_inception-2015-12-05-6726825d.pth (this image ships none; "
            "all recorded quality numbers use the labeled frechet_rand "
            "fallback until then)",
            file=sys.stderr,
        )
        raise SystemExit(2)
    verdict = validate(path, n=args.n, image_size=args.image_size)
    line = json.dumps(verdict)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
