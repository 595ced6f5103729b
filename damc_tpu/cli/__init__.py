"""CLI entry points mirroring the reference scripts:

  python -m damc_tpu.cli.train_gen_recon    (train_gen_recon.py)
  python -m damc_tpu.cli.train_anomaly_det  (train_anomaly_det.py)
  python -m damc_tpu.cli.eval_gen_recon     (eval_gen_recon.py)
  python -m damc_tpu.cli.eval_anomaly_det   (eval_anomaly_det.py)
  python -m damc_tpu.cli.toy                (toy_example/toy_example.py)
  python -m damc_tpu.cli.eval_stylegan_inv  (eval_stylegan_inv.py)
"""
