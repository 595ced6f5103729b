"""Real-FID readiness (VERDICT r3 item 4): tools/validate_real_inception.py.

The image ships no InceptionV3 checkpoint, so the BASELINE "FID within 5%"
gate has never been evaluated with real features. These tests keep the
one-command proof path working:

* the fabricated-weights test exercises the ENTIRE tool (state_dict load ->
  conversion -> dual-stack features -> FID agreement -> CLI metric
  resolution) on a random-but-realistic checkpoint, so the tool cannot rot;
* the real-weights test is skipped until $DAMC_INCEPTION_WEIGHTS exists,
  and passes the moment it does — making the gate provable on arrival.
"""

import os
import sys

import pytest
import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from validate_real_inception import find_weights, validate  # noqa: E402


def _fabricate_checkpoint(path: str) -> str:
    """A pytorch-fid-shaped state_dict with signal-preserving random
    weights (the oracle fixture's init, tests/test_inception_full_graph.py)."""
    from test_inception_full_graph import TorchFIDInception

    torch.manual_seed(0)
    model = TorchFIDInception()
    gen = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
                m.weight.normal_(0.0, (2.0 / fan_in) ** 0.5, generator=gen)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.normal_(0.0, 0.1, generator=gen)
                m.running_mean.normal_(0.0, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
    torch.save(model.state_dict(), path)
    return path


@pytest.mark.slow
def test_validate_tool_with_fabricated_weights(tmp_path):
    path = _fabricate_checkpoint(str(tmp_path / "fake_inception.pth"))
    verdict = validate(path, n=4, image_size=16)
    assert verdict["ok"] and verdict["metric_name"] == "fid"
    assert verdict["fid_abs_diff"] <= 0.1
    assert verdict["n_images"] == 4


@pytest.mark.slow
@pytest.mark.skipif(
    find_weights() is None,
    reason="no real InceptionV3 weights on this machine "
    "(set $DAMC_INCEPTION_WEIGHTS to pt_inception-2015-12-05-6726825d.pth)",
)
def test_real_inception_weights_prove_fid_parity():
    """THE readiness gate: runs automatically once real weights exist."""
    verdict = validate(find_weights())
    assert verdict["ok"] and verdict["metric_name"] == "fid"
