"""Config presets must match the reference defaults exactly (SURVEY.md §5)."""

import pytest

from damc_tpu.utils import preset


def test_cifar10_preset():
    cfg = preset("cifar10")
    # train_gen_recon.py:58-60, 351-406
    assert (cfg.model.nz, cfg.model.ngf) == (128, 128)
    assert cfg.model.nxemb == 1024 and cfg.model.ntemb == 128 and cfg.model.nif == 64
    assert cfg.diffusion.n_interval == 100
    assert cfg.diffusion.logsnr_min == -5.1 and cfg.diffusion.logsnr_max == 9.8
    assert cfg.diffusion.residual and cfg.diffusion.var_type == "large"
    assert cfg.diffusion.with_noise and cfg.diffusion.p_mask == 0.2
    assert cfg.mcmc.g_l_steps == 30 and cfg.mcmc.g_l_step_size == 0.1
    assert cfg.mcmc.g_llhd_sigma == 0.1
    assert cfg.mcmc.e_l_steps == 60 and cfg.mcmc.e_l_step_size == 0.4
    assert (cfg.optim.g_lr, cfg.optim.e_lr, cfg.optim.q_lr) == (2e-4, 1e-4, 2e-4)
    assert cfg.optim.betas == (0.5, 0.999)
    assert cfg.optim.q_weight_decay == 1e-4
    assert cfg.optim.q_max_norm == 100.0
    assert cfg.train.batch_size == 128
    assert cfg.train.q_updates == 6
    assert cfg.train.ema_rho == 0.005 and cfg.train.ema_every == 10
    assert cfg.train.prior_chains == "double"
    assert cfg.train.n_fid_samples == 50_000


def test_cifar10_stable_preset():
    """Production preset = reference-exact cifar10 + the CD-runaway
    mitigation (alpha=2e-4, 100k-iter endurance evidence in
    artifacts/cd_runs/reg2e4_100k) with a finite CD-gap alarm ceiling."""
    import dataclasses

    from damc_tpu.train.driver_utils import cd_gap_ceiling

    base, stable = preset("cifar10"), preset("cifar10-stable")
    assert stable.train.e_energy_reg == 2e-4
    # Reference CD stays the default; the stable preset differs ONLY in
    # the regularizer knob.
    assert base.train.e_energy_reg == 0.0
    assert stable == dataclasses.replace(
        base, train=dataclasses.replace(base.train, e_energy_reg=2e-4)
    )
    assert cd_gap_ceiling(stable.train.e_energy_reg) == 1.25 / 2e-4
    assert cd_gap_ceiling(base.train.e_energy_reg) is None


def test_svhn_celeba_presets():
    svhn = preset("svhn")
    assert (svhn.model.nz, svhn.model.ngf) == (100, 64)  # train_gen_recon.py:64-66
    c64 = preset("celeba64")
    assert (c64.model.nz, c64.model.ngf) == (100, 128)  # :70-72
    chq = preset("celebaHQ")
    assert (chq.model.nz, chq.model.ngf) == (128, 128)  # :89-91
    assert chq.mcmc.g_llhd_sigma == 1.0  # README.md:58
    assert chq.model.image_size == 256


def test_anomaly_preset():
    cfg = preset("mnist_anomaly")
    # train_anomaly_det.py:260-290
    assert cfg.model.nz == 8 and cfg.model.ngf == 128 and cfg.model.nif == 128
    assert cfg.model.nxemb == 1024 and cfg.model.nc == 1
    assert cfg.mcmc.g_llhd_sigma == 1.0
    assert (cfg.optim.g_lr, cfg.optim.e_lr, cfg.optim.q_lr) == (1e-4, 5e-5, 1e-4)
    assert cfg.optim.q_weight_decay == 0.0
    assert cfg.train.prior_chains == "single"
    assert cfg.train.q_loss_both_branches and not cfg.train.random_mask
    assert cfg.train.eval_every == 500 and cfg.train.ckpt_every == 1000
    assert cfg.train.heldout_digit == 9


def test_toy_preset():
    cfg = preset("toy")
    # toy_example.py:304-341
    assert cfg.model.nz == 2 and cfg.model.nxemb == 128
    assert cfg.diffusion.p_mask == 0.1
    assert cfg.mcmc.g_l_steps == 50 and cfg.mcmc.g_llhd_sigma == 0.25
    assert cfg.optim.q_weight_decay == 1e-2
    assert cfg.train.batch_size == 500 and cfg.train.ema_rho == 0.75
    assert cfg.train.prior_chains == "none"
    assert not cfg.train.update_g and not cfg.train.update_e


def test_unknown_preset_raises():
    with pytest.raises(ValueError):
        preset("imagenet")


def test_cli_overrides():
    import argparse

    from damc_tpu.cli.common import add_common_flags, config_from_args

    p = argparse.ArgumentParser()
    add_common_flags(p)
    args = p.parse_args(
        ["--dataset", "svhn", "--g_l_steps", "7", "--q_lr", "3e-4", "--batch_size", "32"]
    )
    cfg = config_from_args(args)
    assert cfg.model.dataset == "svhn"
    assert cfg.mcmc.g_l_steps == 7
    assert cfg.optim.q_lr == 3e-4
    assert cfg.train.batch_size == 32
    # untouched defaults survive
    assert cfg.mcmc.e_l_steps == 60


def test_cli_full_reference_flag_inventory():
    """Every semantic knob of the reference argparse blocks
    (`train_gen_recon.py:351-406`) is settable from the CLI, and bool flags
    parse strictly (reference `type=bool` footgun fixed)."""
    import argparse

    from damc_tpu.cli.common import add_common_flags, config_from_args

    p = argparse.ArgumentParser()
    add_common_flags(p)
    args = p.parse_args(
        [
            "--dataset", "cifar10", "--nc", "1", "--var_type", "small",
            "--diffusion_residual", "False", "--Q_with_noise", "false",
            "--g_l_with_noise", "0", "--e_l_with_noise", "true",
            "--q_max_norm", "50", "--e_max_norm", "60", "--g_max_norm", "70",
            "--n_interval_posterior", "25", "--n_interval_prior", "25",
            "--fid_batch_size", "250", "--logsnr_min", "-4.0",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.model.nc == 1
    assert cfg.diffusion.var_type == "small"
    assert cfg.diffusion.residual is False
    assert cfg.diffusion.with_noise is False
    assert cfg.mcmc.g_l_with_noise is False and cfg.mcmc.e_l_with_noise is True
    assert (cfg.optim.q_max_norm, cfg.optim.e_max_norm, cfg.optim.g_max_norm) == (50, 60, 70)
    assert cfg.diffusion.n_interval == 25
    assert cfg.train.fid_batch_size == 250
    assert cfg.diffusion.logsnr_min == -4.0

    # strict bool parsing: "False" must not parse truthy
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        p.parse_args(["--diffusion_residual", "maybe"])


def test_cli_reference_spellings_verbatim():
    """A reference command line works verbatim: interval flags under their
    reference names (print/plot/ckpt/fid_iter `train_gen_recon.py:402-405`,
    eval_iter `train_anomaly_det.py:305`) and the *_is_grad_clamp toggles
    (`:395-397`; False == clipping disabled == max_norm inf)."""
    import argparse
    import math

    from damc_tpu.cli.common import add_common_flags, config_from_args

    p = argparse.ArgumentParser()
    add_common_flags(p)
    args = p.parse_args(
        [
            "--dataset", "cifar10",
            "--print_iter", "7", "--plot_iter", "111", "--ckpt_iter", "222",
            "--fid_iter", "333",
            "--q_is_grad_clamp", "False", "--e_is_grad_clamp", "true",
            "--g_max_norm", "70", "--g_is_grad_clamp", "false",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.train.print_every == 7
    assert cfg.train.plot_every == 111
    assert cfg.train.ckpt_every == 222
    assert cfg.train.eval_every == 333
    assert math.isinf(cfg.optim.q_max_norm)
    # toggle False beats an explicit max_norm, like the reference
    assert math.isinf(cfg.optim.g_max_norm)
    # True keeps the preset norm
    assert cfg.optim.e_max_norm == 100.0

    # anomaly spelling
    args2 = argparse.ArgumentParser()
    add_common_flags(args2)
    assert config_from_args(
        args2.parse_args(["--eval_iter", "500"])
    ).train.eval_every == 500


def test_config_json_is_strict_json_with_inf_max_norm(tmp_path):
    """--x_is_grad_clamp false maps to max_norm=inf; the run's config.json
    provenance must remain STRICT JSON (no bare Infinity token) so external
    tooling (jq/JS) can parse it."""
    import argparse
    import json
    import os

    from damc_tpu.cli.common import add_common_flags, config_from_args, make_log_dir

    p = argparse.ArgumentParser()
    add_common_flags(p)
    cfg = config_from_args(
        p.parse_args(["--g_is_grad_clamp", "false", "--log_path", str(tmp_path)])
    )
    log_dir = make_log_dir(cfg)
    text = open(os.path.join(log_dir, "config.json")).read()

    def boom(const):
        raise AssertionError(f"non-strict JSON constant in config.json: {const}")

    parsed = json.loads(text, parse_constant=boom)
    assert parsed["optim"]["g_max_norm"] == "inf"
