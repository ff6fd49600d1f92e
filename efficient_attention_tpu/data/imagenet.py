"""Image-classification input pipeline: host decode -> device augment.

Replaces ``vit/datasets.py`` (timm transforms + torchvision ImageFolder) the
TPU way: JPEG decode + resize happen in a multi-threaded host pool feeding a
prefetch queue; randomized augmentation that is cheap and shape-preserving
(crop/flip/erasing/mixup) runs on device inside the jitted step.  A synthetic
dataset (fairseq ``benchmark/dummy_*`` analogue) keeps training/benchmarks
runnable with no data on disk.
"""
from __future__ import annotations

import math
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_DEFAULT_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_DEFAULT_STD = np.array([0.229, 0.224, 0.225], np.float32)

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def find_classes(root: str) -> Tuple[List[str], dict]:
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    return classes, {c: i for i, c in enumerate(classes)}


class ImageFolderDataset:
    """Minimal ImageFolder (``datasets.ImageFolder`` equivalent)."""

    def __init__(self, root: str, img_size: int = 224, train: bool = True,
                 augment=None, interpolation: str = "bicubic"):
        self.root = root
        self.img_size = img_size
        self.train = train
        # optional fn(PIL.Image, rng) -> PIL.Image applied after RRC+flip
        # (RandAugment / color jitter; see data/randaugment.py)
        self.augment = augment
        # timm --train-interpolation: bicubic/bilinear/nearest, or 'random'
        # (a per-sample draw between bicubic and bilinear)
        self.interpolation = interpolation
        classes, class_to_idx = find_classes(root)
        self.classes = classes
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append(
                        (os.path.join(cdir, fname), class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def _interp(self, rng):
        from PIL import Image

        table = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR,
                 "nearest": Image.NEAREST}
        name = self.interpolation
        if name == "random":
            name = "bicubic" if rng.random() < 0.5 else "bilinear"
        return table[name]

    def load(self, idx: int, rng: np.random.Generator) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[idx]
        img = Image.open(path).convert("RGB")
        s = self.img_size
        if self.train:
            # random-resized-crop (scale 0.08-1.0) + hflip, host side
            w, h = img.size
            for _ in range(10):
                area = w * h * rng.uniform(0.08, 1.0)
                ar = math.exp(rng.uniform(math.log(3 / 4), math.log(4 / 3)))
                cw = int(round(math.sqrt(area * ar)))
                ch = int(round(math.sqrt(area / ar)))
                if cw <= w and ch <= h:
                    x0 = rng.integers(0, w - cw + 1)
                    y0 = rng.integers(0, h - ch + 1)
                    img = img.crop((x0, y0, x0 + cw, y0 + ch))
                    break
            img = img.resize((s, s), self._interp(rng))
            if rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if self.augment is not None:
                img = self.augment(img, rng)
        else:
            # eval: resize short side to s * 256/224 then center crop
            # (``datasets.py:60-81``)
            short = int(s * 256 / 224)
            w, h = img.size
            scale = short / min(w, h)
            img = img.resize((round(w * scale), round(h * scale)),
                             Image.BICUBIC)
            w, h = img.size
            x0, y0 = (w - s) // 2, (h - s) // 2
            img = img.crop((x0, y0, x0 + s, y0 + s))
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - IMAGENET_DEFAULT_MEAN) / IMAGENET_DEFAULT_STD
        return arr, label


class SyntheticImageDataset:
    """Deterministic random images (fairseq ``benchmark/dummy_*`` analogue)."""

    def __init__(self, num_samples: int = 1280, img_size: int = 224,
                 num_classes: int = 1000, train: bool = True):
        self.num_samples = num_samples
        self.img_size = img_size
        self.num_classes = num_classes
        self.classes = [str(i) for i in range(num_classes)]

    def __len__(self):
        return self.num_samples

    def load(self, idx: int, rng: np.random.Generator):
        r = np.random.default_rng(idx)
        img = r.standard_normal(
            (self.img_size, self.img_size, 3)).astype(np.float32)
        return img, int(idx % self.num_classes)


def ra_sampler_indices(
    n: int, epoch: int, seed: int = 0, num_replicas: int = 1, rank: int = 0,
    repetitions: int = 3,
) -> np.ndarray:
    """Repeated-augmentation sampler (DeiT ``RASampler``,
    ``vit/samplers.py:13-64``): each image appears ``repetitions`` times per
    epoch, interleaved across replicas, truncated to
    ``floor(n / 256) * 256 / num_replicas`` selected samples."""
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(n)
    repeated = np.repeat(order, repetitions)
    total = int(math.ceil(len(repeated) / num_replicas)) * num_replicas
    repeated = np.concatenate([repeated, repeated[: total - len(repeated)]])
    shard = repeated[rank::num_replicas]
    num_selected = (n // 256) * 256 // num_replicas
    if num_selected > 0:
        shard = shard[:num_selected]
    return shard


def shard_indices(n: int, epoch: int, seed: int = 0, num_replicas: int = 1,
                  rank: int = 0, shuffle: bool = True) -> np.ndarray:
    """Plain distributed sampler (torch ``DistributedSampler`` equivalent)."""
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(n) if shuffle else np.arange(n)
    total = int(math.ceil(n / num_replicas)) * num_replicas
    order = np.concatenate([order, order[: total - n]])
    return order[rank::num_replicas]


class PrefetchLoader:
    """Multi-threaded host loader with a bounded prefetch queue.

    Replaces the torch DataLoader workers (``vit/main.py:236-257``): decode
    threads fill batches ahead of the device so JPEG decode overlaps the
    train step (SURVEY §7 hard-part 6).
    """

    def __init__(self, dataset, batch_size: int, indices: Sequence[int],
                 num_threads: int = 8, prefetch: int = 4, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = np.asarray(indices)
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self):
        if self.drop_last:
            return len(self.indices) // self.batch_size
        return math.ceil(len(self.indices) / self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = [
            self.indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(n_batches)]
        lock = threading.Lock()
        cursor = {"i": 0}
        results: dict = {}
        done = threading.Event()

        def worker(tid: int):
            rng = np.random.default_rng(self.seed * 1000 + tid)
            while not done.is_set():
                with lock:
                    i = cursor["i"]
                    if i >= n_batches:
                        return
                    cursor["i"] = i + 1
                idx = batches[i]
                imgs = np.empty(
                    (len(idx), self.dataset.img_size, self.dataset.img_size, 3),
                    np.float32)
                labels = np.empty((len(idx),), np.int32)
                for j, k in enumerate(idx):
                    imgs[j], labels[j] = self.dataset.load(int(k), rng)
                q.put((i, imgs, labels))

        threads = [threading.Thread(target=worker, args=(t,), daemon=True)
                   for t in range(self.num_threads)]
        for t in threads:
            t.start()
        try:
            next_emit = 0
            received = 0
            while next_emit < n_batches:
                i, imgs, labels = q.get()
                results[i] = (imgs, labels)
                received += 1
                while next_emit in results:
                    yield results.pop(next_emit)
                    next_emit += 1
        finally:
            done.set()
