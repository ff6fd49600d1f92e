"""RandAugment + color jitter (host-side PIL, timm-policy semantics).

The DeiT recipe trains with ``--aa rand-m9-mstd0.5-inc1 --color-jitter 0.4``
(``vit/main.py:105-118``), realized by timm's ``create_transform``
(``vit/datasets.py:46-66``).  This module implements the same *policy* from
the published RandAugment/AutoAugment semantics:

  * config string ``rand-m{M}-mstd{S}[-inc1][-n{N}][-p{P}]``
  * ``N`` ops per image (default 2), each drawn uniformly from the pool and
    applied with probability ``P`` (default 0.5)
  * per-application magnitude ``~ N(M, S)`` clamped to [0, 10]
  * the ``inc1`` pool, where enhancement strength *increases* with M
    (posterize removes more bits, solarize lowers the threshold, etc.)
  * geometric ops fill exposed pixels with the ImageNet mean color

timm additionally disables color jitter whenever auto-augment is active;
``build_train_augment`` mirrors that dispatch rule.

Runs on the host decode pool (PIL ops are not shape-preserving or are
byte-domain, so the device is the wrong place for them); the
shape-preserving randomized augs (erasing/mixup) run on device instead.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

FILL = (124, 116, 104)  # ImageNet mean color
LEVEL_DENOM = 10.0


def _randsign(rng) -> float:
    return 1.0 if rng.random() < 0.5 else -1.0


# ---- op implementations -------------------------------------------------
def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         Image.BICUBIC, fillcolor=FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         Image.BICUBIC, fillcolor=FILL)


def _translate_x(img, frac):
    v = int(frac * img.size[0])
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0),
                         Image.BICUBIC, fillcolor=FILL)


def _translate_y(img, frac):
    v = int(frac * img.size[1])
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v),
                         Image.BICUBIC, fillcolor=FILL)


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img, np.int32)
    arr = np.where(arr < thresh, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


# name -> (needs_magnitude, fn(img, magnitude, rng))
def _build_ops() -> List[Tuple[str, Callable]]:
    def enhance(cls):
        def fn(img, m, rng):
            # "increasing": strength grows with m, direction random
            f = 1.0 + _randsign(rng) * (m / LEVEL_DENOM) * 0.9
            return cls(img).enhance(max(f, 0.1))

        return fn

    return [
        ("AutoContrast", lambda img, m, rng: ImageOps.autocontrast(img)),
        ("Equalize", lambda img, m, rng: ImageOps.equalize(img)),
        ("Invert", lambda img, m, rng: ImageOps.invert(img)),
        ("Rotate", lambda img, m, rng: img.rotate(
            _randsign(rng) * (m / LEVEL_DENOM) * 30.0,
            resample=Image.BICUBIC, fillcolor=FILL)),
        ("PosterizeIncreasing", lambda img, m, rng: ImageOps.posterize(
            img, max(4 - int((m / LEVEL_DENOM) * 4), 1))),
        ("SolarizeIncreasing", lambda img, m, rng: ImageOps.solarize(
            img, 256 - int((m / LEVEL_DENOM) * 256))),
        ("SolarizeAdd", lambda img, m, rng: _solarize_add(
            img, int((m / LEVEL_DENOM) * 110))),
        ("ColorIncreasing", enhance(ImageEnhance.Color)),
        ("ContrastIncreasing", enhance(ImageEnhance.Contrast)),
        ("BrightnessIncreasing", enhance(ImageEnhance.Brightness)),
        ("SharpnessIncreasing", enhance(ImageEnhance.Sharpness)),
        ("ShearX", lambda img, m, rng: _shear_x(
            img, _randsign(rng) * (m / LEVEL_DENOM) * 0.3)),
        ("ShearY", lambda img, m, rng: _shear_y(
            img, _randsign(rng) * (m / LEVEL_DENOM) * 0.3)),
        ("TranslateXRel", lambda img, m, rng: _translate_x(
            img, _randsign(rng) * (m / LEVEL_DENOM) * 0.45)),
        ("TranslateYRel", lambda img, m, rng: _translate_y(
            img, _randsign(rng) * (m / LEVEL_DENOM) * 0.45)),
    ]


class RandAugment:
    """``rand-m{M}-mstd{S}[-inc1][-n{N}][-p{P}]`` policy."""

    def __init__(self, magnitude: float = 9.0, mstd: float = 0.5,
                 num_layers: int = 2, prob: float = 0.5):
        self.magnitude = magnitude
        self.mstd = mstd
        self.num_layers = num_layers
        self.prob = prob
        self.ops = _build_ops()

    @classmethod
    def from_config(cls, config: str) -> "RandAugment":
        parts = config.split("-")
        assert parts[0] == "rand", f"unsupported auto-augment '{config}'"
        kw = dict(magnitude=9.0, mstd=0.5, num_layers=2, prob=0.5)
        for p in parts[1:]:
            if p.startswith("mstd"):
                kw["mstd"] = float(p[4:])
            elif p.startswith("inc"):
                pass  # the pool above IS the increasing pool
            elif p.startswith("m"):
                kw["magnitude"] = float(p[1:])
            elif p.startswith("n"):
                kw["num_layers"] = int(p[1:])
            elif p.startswith("p"):
                kw["prob"] = float(p[1:])
        return cls(**kw)

    def __call__(self, img: Image.Image, rng: np.random.Generator):
        for _ in range(self.num_layers):
            if rng.random() > self.prob:
                continue
            name, fn = self.ops[int(rng.integers(len(self.ops)))]
            m = self.magnitude
            if self.mstd > 0:
                m = float(np.clip(rng.normal(m, self.mstd), 0, LEVEL_DENOM))
            img = fn(img, m, rng)
        return img


def color_jitter(img: Image.Image, rng: np.random.Generator,
                 strength: float = 0.4) -> Image.Image:
    """Brightness/contrast/saturation jitter with factor U[1-s, 1+s] each,
    applied in random order (``transforms.ColorJitter(s, s, s)``)."""
    ops = [ImageEnhance.Brightness, ImageEnhance.Contrast,
           ImageEnhance.Color]
    order = rng.permutation(len(ops))
    for i in order:
        f = float(rng.uniform(max(0.0, 1 - strength), 1 + strength))
        img = ops[i](img).enhance(f)
    return img


def build_train_augment(
    auto_augment: Optional[str],
    color_jitter_strength: Optional[float],
) -> Optional[Callable]:
    """timm ``transforms_imagenet_train`` dispatch: auto-augment wins and
    disables color jitter; with no aa, color jitter applies."""
    if auto_augment:
        ra = RandAugment.from_config(auto_augment)
        return lambda img, rng: ra(img, rng)
    if color_jitter_strength:
        return lambda img, rng: color_jitter(img, rng, color_jitter_strength)
    return None
