"""eval_stylegan_inv CLI end-to-end: .pth weight loading -> conversion ->
Q sweep + Adam refine -> metrics, at res 32 with fabricated random-init
reference checkpoints (the published flat-state-dict format,
`stylegan_generator.py:75-78`)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/workspace/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference oracle not available"
)
if os.path.isdir(REF):
    sys.path.insert(0, REF)


@pytest.mark.slow
def test_eval_stylegan_inv_cli_roundtrip(tmp_path, capsys):
    import torch
    from PIL import Image

    from stylegan.perceptual_model import VGG16
    from stylegan.stylegan_encoder_network import StyleGANEncoderNet
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    from damc_tpu.cli import eval_stylegan_inv

    torch.manual_seed(0)
    gen = StyleGANGeneratorNet(resolution=32, repeat_w=False, final_tanh=True)
    enc = StyleGANEncoderNet(resolution=32, use_wscale=False, use_bn=True)
    vgg = VGG16()
    g_pth = str(tmp_path / "gen.pth")
    e_pth = str(tmp_path / "enc.pth")
    f_pth = str(tmp_path / "vgg16.pth")
    torch.save(gen.state_dict(), g_pth)
    torch.save(enc.state_dict(), e_pth)
    torch.save(vgg.state_dict(), f_pth)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 256, (32, 32, 3), np.uint8), "RGB"
        ).save(img_dir / f"{i}.png")

    eval_stylegan_inv.main([
        "--dataset", "ffhq",
        "--data_path", str(img_dir),
        "--pretrained_G_path", g_pth,
        "--pretrained_E_path", e_pth,
        "--pretrained_F_path", f_pth,
        "--resolution", "32",
        "--batch_size", "2",
        "--g_l_steps", "2",
        "--limit", "4",
    ])
    out = capsys.readouterr().out
    assert "recon MSE" in out
    # Metric must be honestly labeled (no Inception weights in this image).
    assert ("frechet_rand" in out) or ("FID" in out)  # fallback or real-weights label
    mse = float(out.split("recon MSE")[1].split()[0])
    assert np.isfinite(mse)

    # the bf16 Adam-refine flag must plumb through to a finite result too
    eval_stylegan_inv.main([
        "--dataset", "ffhq",
        "--data_path", str(img_dir),
        "--pretrained_G_path", g_pth,
        "--pretrained_E_path", e_pth,
        "--pretrained_F_path", f_pth,
        "--resolution", "32",
        "--batch_size", "2",
        "--g_l_steps", "2",
        "--compute_dtype", "bfloat16",
        "--limit", "4",
    ])
    out_bf16 = capsys.readouterr().out
    mse_bf16 = float(out_bf16.split("recon MSE")[1].split()[0])
    assert np.isfinite(mse_bf16)
    # 2 Adam steps on identical inputs: dtypes agree to a few percent
    assert abs(mse_bf16 - mse) / mse < 0.05, (mse, mse_bf16)
