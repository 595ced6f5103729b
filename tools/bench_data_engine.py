"""Data-engine throughput: native C++ paths vs NumPy vs the reference's
per-item torch pipeline.

The reference feeds training through torchvision datasets + torch DataLoader
(`train_gen_recon.py:180-185`; per-item PIL decode for LSUN at
`data/dataset.py:47-64,297-335`). This repo ships three escalating paths:

  * `Loader`        — NumPy epoch-shuffled batch slicing ([-1,1] + flip),
  * `NativeLoader`  — C++ thread-pool batch engine with a prefetch ring
                      (native/batch_loader.cpp),
  * `decode_crop_resize_batch` — C++ libjpeg center-crop+resize pipeline
                      (native/jpeg_pipeline.cpp), vs the PIL equivalent
                      `_decode_crop_resize` (exact reference semantics).

This tool measures all of them on the same data and records images/sec to
`artifacts/data_engine_bench.json`. Torch DataLoader is measured with a
Dataset that mirrors the reference's per-item work (uint8 HWC -> CHW float
[-1,1] + random flip, default collate). NOTE: this image has ONE CPU core,
so thread pools cannot scale here — what the numbers isolate is per-image
software overhead (C++ vs NumPy slicing vs per-item Python/PIL); on a real
TPU-VM host (dozens of cores) the threaded paths additionally scale.

Usage:
    python tools/bench_data_engine.py [--quick] [--out artifacts/data_engine_bench.json]
"""

import argparse
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed_batches(it, n_batches, batch_size, warmup=2):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches * batch_size / dt


def bench_batch_assembly(n_images, res, batch, n_batches):
    """images/sec for the three in-memory batch engines + torch DataLoader."""
    from damc_tpu.data.datasets import Loader
    from damc_tpu.data.native_loader import NativeLoader, native_loader_available

    rng = np.random.RandomState(0)
    store = rng.randint(0, 256, (n_images, res, res, 3), np.uint8)
    out = {}

    numpy_loader = Loader(store, batch_size=batch, augment_flip=True, seed=0)
    out["numpy_loader_images_per_sec"] = timed_batches(
        numpy_loader.stream(), n_batches, batch
    )

    if native_loader_available():
        nat = NativeLoader(store, batch_size=batch, augment_flip=True, seed=0)
        try:
            out["native_loader_images_per_sec"] = timed_batches(
                nat.stream(), n_batches, batch
            )
        finally:
            nat.close()
    else:
        out["native_loader_images_per_sec"] = None

    import torch

    class RefStyleDataset(torch.utils.data.Dataset):
        """Per-item transform work as the reference's torchvision pipeline
        does it: ToTensor (HWC uint8 -> CHW float [0,1]) + Normalize(0.5) +
        RandomHorizontalFlip, then default collate."""

        def __len__(self):
            return n_images

        def __getitem__(self, i):
            img = torch.from_numpy(store[i].transpose(2, 0, 1).copy())
            img = img.float() / 255.0 * 2.0 - 1.0
            if torch.rand(()) < 0.5:
                img = torch.flip(img, dims=[-1])
            return img, i

    dl = torch.utils.data.DataLoader(
        RefStyleDataset(), batch_size=batch, shuffle=True, num_workers=0,
        drop_last=True,
    )

    def cycle():
        while True:
            yield from dl

    out["torch_dataloader_images_per_sec"] = timed_batches(
        cycle(), n_batches, batch
    )
    return out


def bench_jpeg_decode(n_bufs, src_res, dst_res, rounds):
    """JPEG->tensor images/sec: native libjpeg batch pipeline vs the PIL
    per-image path (exact reference `data/dataset.py:47-64` semantics)."""
    from PIL import Image

    from damc_tpu.data.datasets import _decode_crop_resize
    from damc_tpu.data.native_jpeg import (
        decode_crop_resize_batch,
        native_jpeg_available,
    )

    rng = np.random.RandomState(1)
    bufs = []
    for _ in range(n_bufs):
        # Non-square so the center-crop path is exercised.
        arr = rng.randint(0, 256, (src_res + 37, src_res, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="JPEG", quality=90)
        bufs.append(b.getvalue())

    out = {}
    t0 = time.perf_counter()
    for _ in range(rounds):
        for b in bufs:
            _decode_crop_resize(b, dst_res)
    out["pil_decode_images_per_sec"] = rounds * n_bufs / (time.perf_counter() - t0)

    if native_jpeg_available():
        decode_crop_resize_batch(bufs[:2], dst_res)  # warm
        t0 = time.perf_counter()
        for _ in range(rounds):
            decode_crop_resize_batch(bufs, dst_res)
        out["native_jpeg_images_per_sec"] = (
            rounds * n_bufs / (time.perf_counter() - t0)
        )
    else:
        out["native_jpeg_images_per_sec"] = None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny smoke sizes")
    ap.add_argument("--out", default="artifacts/data_engine_bench.json")
    args = ap.parse_args()

    if args.quick:
        assembly = bench_batch_assembly(n_images=512, res=32, batch=64, n_batches=4)
        # Two scale regimes: crop==out (identity fast path, decode-bound)
        # and a real Lanczos downscale (LSUN sources are larger than 256).
        jpeg_id = bench_jpeg_decode(n_bufs=8, src_res=256, dst_res=256, rounds=1)
        jpeg_dn = bench_jpeg_decode(n_bufs=8, src_res=400, dst_res=256, rounds=1)
    else:
        # CIFAR-scale assembly; LSUN-scale (256^2 output) JPEG decode.
        assembly = bench_batch_assembly(
            n_images=50_000, res=32, batch=128, n_batches=100
        )
        jpeg_id = bench_jpeg_decode(n_bufs=64, src_res=256, dst_res=256, rounds=5)
        jpeg_dn = bench_jpeg_decode(n_bufs=64, src_res=400, dst_res=256, rounds=5)

    payload = {
        "cpu_count": os.cpu_count(),
        "quick": args.quick,
        "assembly_cifar_scale": {
            k: (round(v, 1) if v else v) for k, v in assembly.items()
        },
        "jpeg_decode_256_identity": {
            k: (round(v, 1) if v else v) for k, v in jpeg_id.items()
        },
        "jpeg_decode_400_to_256": {
            k: (round(v, 1) if v else v) for k, v in jpeg_dn.items()
        },
    }
    for section in (
        "assembly_cifar_scale",
        "jpeg_decode_256_identity",
        "jpeg_decode_400_to_256",
    ):
        vals = payload[section]
        base_key = (
            "torch_dataloader_images_per_sec"
            if vals.get("torch_dataloader_images_per_sec")
            else "pil_decode_images_per_sec"
        )
        base = vals.get(base_key)
        for k, v in list(vals.items()):
            if v and base and k != base_key:
                vals[k + "_vs_ref_path"] = round(v / base, 2)
    print(json.dumps(payload, indent=2))
    if args.out:
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
