"""Shim transforms (see package docstring). Each transform performs the
same underlying PIL / tensor operation real torchvision dispatches to
for PIL inputs, so per-item pipeline cost is faithful:

- ``ToTensor``: PIL L-mode -> float32 (1, 28, 28) tensor / 255.
- ``Normalize``: (x - mean) / std, per channel.
- ``RandomRotation(d)``: uniform angle in [-d, d], PIL ``rotate`` with
  NEAREST resampling (torchvision's default interpolation).
- ``RandomHorizontalFlip``: p=0.5 PIL left-right transpose.
"""

import random

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(arr.astype(np.float32) / 255.0)


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class RandomRotation:
    def __init__(self, degrees):
        self.degrees = (-degrees, degrees) if isinstance(
            degrees, (int, float)) else tuple(degrees)

    def __call__(self, img):
        angle = random.uniform(*self.degrees)
        return img.rotate(angle, resample=Image.NEAREST)


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img
