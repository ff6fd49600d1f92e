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


def _train_transform(img, s: int, rng: np.random.Generator, interp,
                     augment) -> np.ndarray:
    """DeiT train transform: RandomResizedCrop(scale 0.08-1.0) + hflip
    (+ optional RandAugment/jitter), then normalize."""
    from PIL import Image

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
    img = img.resize((s, s), interp)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if augment is not None:
        img = augment(img, rng)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_DEFAULT_MEAN) / IMAGENET_DEFAULT_STD


def _eval_transform(img, s: int) -> np.ndarray:
    """Eval: resize short side to s * 256/224 then center crop
    (``datasets.py:60-81``)."""
    from PIL import Image

    short = int(s * 256 / 224)
    w, h = img.size
    scale = short / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    x0, y0 = (w - s) // 2, (h - s) // 2
    img = img.crop((x0, y0, x0 + s, y0 + s))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_DEFAULT_MEAN) / IMAGENET_DEFAULT_STD


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
        if self.train:
            arr = _train_transform(img, self.img_size, rng,
                                   self._interp(rng), self.augment)
        else:
            arr = _eval_transform(img, self.img_size)
        return arr, label


class CachedUint8Dataset:
    """Pre-decoded uint8 image cache: the decode-bound escape hatch.

    When per-core JPEG decode cannot feed the device rate (round-4
    input-pipeline bench: ~100 img/s/core at the DeiT transform vs a
    4,700 img/s device), decode the ImageFolder ONCE at ``cache_side``
    resolution into a uint8 memmap pair (``<path>.imgs.npy`` /
    ``<path>.labels.npy``); the training path then costs only an
    array-crop + resize (no entropy decode), an order of magnitude
    cheaper per image.  The transform semantics are the same
    RandomResizedCrop+flip(+augment) as :class:`ImageFolderDataset`
    applied to the cached image (equivalent to training on 256px-resized
    source images — the standard pre-resized-ImageNet trade).
    """

    def __init__(self, cache_path: str, img_size: int = 224,
                 train: bool = True, augment=None,
                 interpolation: str = "bicubic"):
        self.cache_path = cache_path
        self.img_size = img_size
        self.train = train
        self.augment = augment
        self.interpolation = interpolation
        self.images = np.load(cache_path + ".imgs.npy", mmap_mode="r")
        self.labels = np.load(cache_path + ".labels.npy")

    # share ImageFolderDataset's per-sample interpolation choice
    _interp = ImageFolderDataset._interp

    @staticmethod
    def build(root: str, cache_path: str, cache_side: int = 256,
              log_every: int = 0) -> None:
        """One-time decode of an ImageFolder tree into the uint8 cache
        (short side resized to ``cache_side``, center-cropped square)."""
        from PIL import Image

        ds = ImageFolderDataset(root, img_size=cache_side, train=False)
        n = len(ds)
        imgs = np.lib.format.open_memmap(
            cache_path + ".imgs.npy", mode="w+", dtype=np.uint8,
            shape=(n, cache_side, cache_side, 3))
        labels = np.empty((n,), np.int32)
        for i, (path, label) in enumerate(ds.samples):
            img = Image.open(path).convert("RGB")
            w, h = img.size
            scale = cache_side / min(w, h)
            img = img.resize((max(cache_side, round(w * scale)),
                              max(cache_side, round(h * scale))),
                             Image.BICUBIC)
            w, h = img.size
            x0, y0 = (w - cache_side) // 2, (h - cache_side) // 2
            img = img.crop((x0, y0, x0 + cache_side, y0 + cache_side))
            imgs[i] = np.asarray(img, np.uint8)
            labels[i] = label
            if log_every and (i + 1) % log_every == 0:
                print(f"| cached {i + 1}/{n}", flush=True)
        imgs.flush()
        np.save(cache_path + ".labels.npy", labels)

    def __len__(self):
        return len(self.labels)

    def load(self, idx: int, rng: np.random.Generator):
        from PIL import Image

        img = Image.fromarray(np.asarray(self.images[idx]))
        if self.train:
            arr = _train_transform(img, self.img_size, rng,
                                   self._interp(rng), self.augment)
        else:
            arr = _eval_transform(img, self.img_size)
        return arr, int(self.labels[idx])


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


def _pool_init(dataset, seed):
    """Process-pool worker initializer: the dataset is pickled ONCE per
    worker instead of per batch."""
    global _POOL_DS, _POOL_RNG
    _POOL_DS = dataset
    _POOL_RNG = np.random.default_rng(seed * 1000 + os.getpid())


def _pool_load(args):
    i, idx = args
    ds = _POOL_DS
    imgs = np.empty((len(idx), ds.img_size, ds.img_size, 3), np.float32)
    labels = np.empty((len(idx),), np.int32)
    for j, k in enumerate(idx):
        imgs[j], labels[j] = ds.load(int(k), _POOL_RNG)
    return i, imgs, labels


class PrefetchLoader:
    """Multi-worker host loader with a bounded prefetch window.

    Replaces the torch DataLoader workers (``vit/main.py:236-257``): decode
    workers fill batches ahead of the device so JPEG decode overlaps the
    train step (SURVEY §7 hard-part 6).

    ``backend='thread'`` shares the GIL — fine for the synthetic/dummy
    datasets and PIL paths that release the GIL, but measured unable to
    feed the DeiT-tiny device rate on real JPEG decode (round-4 input-
    pipeline bench).  ``backend='process'`` forks a spawn-context pool
    (safe next to an initialized JAX runtime) and sidesteps the GIL; the
    dataset must be picklable (ImageFolderDataset and the timm-policy
    RandAugment both are).

    Scheduling is a bounded in-order window either way: no worker runs
    more than ``prefetch + workers`` batches ahead of the consumer, so
    the reorder buffer cannot grow unboundedly when one batch is slow
    (round-3 VERDICT weak #3).
    """

    def __init__(self, dataset, batch_size: int, indices: Sequence[int],
                 num_threads: int = 8, prefetch: int = 4, seed: int = 0,
                 drop_last: bool = True, backend: str = "thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = np.asarray(indices)
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        if backend not in ("thread", "process"):
            raise ValueError(f"backend={backend}")
        self.backend = backend

    def __len__(self):
        if self.drop_last:
            return len(self.indices) // self.batch_size
        return math.ceil(len(self.indices) / self.batch_size)

    def _batches(self):
        return [
            self.indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(len(self))]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self.backend == "process":
            yield from self._iter_processes()
        else:
            yield from self._iter_threads()

    def _iter_threads(self):
        n_batches = len(self)
        window = self.prefetch + self.num_threads
        q: "queue.Queue" = queue.Queue()
        batches = self._batches()
        cond = threading.Condition()
        state = {"next": 0, "emit": 0}
        done = threading.Event()

        def worker(tid: int):
            rng = np.random.default_rng(self.seed * 1000 + tid)
            while not done.is_set():
                with cond:
                    while (state["next"] < n_batches
                           and state["next"] - state["emit"] >= window
                           and not done.is_set()):
                        cond.wait(0.1)
                    i = state["next"]
                    if i >= n_batches or done.is_set():
                        return
                    state["next"] = i + 1
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
            results: dict = {}
            while next_emit < n_batches:
                i, imgs, labels = q.get()
                results[i] = (imgs, labels)
                while next_emit in results:
                    yield results.pop(next_emit)
                    next_emit += 1
                    with cond:
                        state["emit"] = next_emit
                        cond.notify_all()
        finally:
            done.set()
            with cond:
                cond.notify_all()

    def _iter_processes(self):
        import multiprocessing as mp

        n_batches = len(self)
        batches = self._batches()
        window = self.prefetch + self.num_threads
        ctx = mp.get_context("spawn")  # fork is unsafe beside JAX threads
        with ctx.Pool(self.num_threads, initializer=_pool_init,
                      initargs=(self.dataset, self.seed)) as pool:
            pending: dict = {}
            submitted = 0
            next_emit = 0
            while next_emit < n_batches:
                while submitted < n_batches and submitted - next_emit < window:
                    pending[submitted] = pool.apply_async(
                        _pool_load, ((submitted, batches[submitted]),))
                    submitted += 1
                i, imgs, labels = pending.pop(next_emit).get()
                assert i == next_emit
                yield imgs, labels
                next_emit += 1
