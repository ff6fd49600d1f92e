"""Host input-pipeline throughput vs the measured device rate (VERDICT r4
item 4: the 4,719 img/s DeiT-tiny EVA device rate is only real if the host
can decode that fast).

Generates a synthetic JPEG ImageFolder (default 2,000 files at ImageNet-
ish resolutions), then measures PrefetchLoader img/s at the DeiT-tiny
train transform (RandomResizedCrop 224 -> normalize; optional timm-policy
RandAugment like the recipe's rand-m9-mstd0.5-inc1) for both decode
backends:

  thread   - GIL-shared decode threads (the round-3 loader)
  process  - spawn-context pool (round 4; the GIL fix)

Usage: python scripts/bench_input_pipeline.py [--files 2000] [--aug]
       [--img-size 224] [--batch 256] [--workers N]
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import argparse
import tempfile
import time

import numpy as np

DEVICE_RATE = 4719.0  # BENCH_r03 deit_tiny_p8 EVA img/s


def make_folder(root: str, n_files: int, n_classes: int = 8):
    from PIL import Image

    rng = np.random.default_rng(0)
    sizes = [(500, 375), (375, 500), (640, 480), (256, 256)]
    for i in range(n_files):
        cdir = os.path.join(root, f"class_{i % n_classes:03d}")
        os.makedirs(cdir, exist_ok=True)
        w, h = sizes[i % len(sizes)]
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(
            os.path.join(cdir, f"img_{i:05d}.jpg"), quality=85)


def measure(root: str, img_size: int, batch: int, workers: int,
            backend: str, aug: bool, warm_batches: int = 2) -> float:
    from efficient_attention_tpu.data.imagenet import (
        ImageFolderDataset,
        PrefetchLoader,
    )

    augment = None
    if aug:
        from efficient_attention_tpu.data.randaugment import RandAugment

        augment = RandAugment.from_config("rand-m9-mstd0.5-inc1")
    ds = ImageFolderDataset(root, img_size=img_size, train=True,
                            augment=augment)
    idx = np.arange(len(ds))
    idx = np.tile(idx, max(1, (batch * 24) // len(idx) + 1))
    loader = PrefetchLoader(ds, batch, idx[: batch * 24],
                            num_threads=workers, backend=backend)
    it = iter(loader)
    for _ in range(warm_batches):  # pool/thread spin-up
        next(it)
    n = 0
    t0 = time.perf_counter()
    for imgs, _ in it:
        n += imgs.shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=2000)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--aug", action="store_true",
                    help="timm RandAugment rand-m9-mstd0.5-inc1 (recipe)")
    ap.add_argument("--root", default="")
    args = ap.parse_args()

    tmp = None
    root = args.root
    if not root:
        tmp = tempfile.TemporaryDirectory(prefix="synthjpeg_")
        root = tmp.name
        t0 = time.perf_counter()
        make_folder(root, args.files)
        print(f"generated {args.files} jpegs in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    def report(label, rate):
        verdict = "OK (>= device)" if rate >= DEVICE_RATE else \
            f"SHORT ({rate / DEVICE_RATE:.2f}x of device; scales with " \
            f"host cores x{os.cpu_count()})"
        print(f"{label:16s} workers={args.workers:3d} "
              f"{rate:8.0f} img/s  vs device {DEVICE_RATE:.0f}: {verdict}",
              flush=True)

    for backend in ("thread", "process"):
        report(f"jpeg/{backend}", measure(
            root, args.img_size, args.batch, args.workers, backend,
            args.aug))

    # pre-decoded uint8 cache path: no JPEG entropy decode on the
    # training path (CachedUint8Dataset)
    from efficient_attention_tpu.data.imagenet import (
        CachedUint8Dataset,
        PrefetchLoader,
    )

    cache = os.path.join(root, "u8cache")
    if not os.path.exists(cache + ".imgs.npy"):
        t0 = time.perf_counter()
        CachedUint8Dataset.build(root, cache)
        print(f"built uint8 cache in {time.perf_counter() - t0:.1f}s",
              flush=True)
    ds = CachedUint8Dataset(cache, img_size=args.img_size, train=True)
    idx = np.tile(np.arange(len(ds)),
                  (args.batch * 24) // len(ds) + 1)[: args.batch * 24]
    loader = PrefetchLoader(ds, args.batch, idx, num_threads=args.workers)
    it = iter(loader)
    next(it); next(it)  # noqa: E702  (spin-up)
    n, t0 = 0, time.perf_counter()
    for imgs, _ in it:
        n += imgs.shape[0]
    report("uint8-cache", n / (time.perf_counter() - t0))
    if tmp:
        tmp.cleanup()


if __name__ == "__main__":
    main()
