"""Shim MNIST/FashionMNIST datasets (see package docstring).

Matches the torchvision constructor surface the reference uses
(`root`, `train`, `download`, `transform` — reference
data/datasets.py:30-35) and the item protocol (PIL image, int label).
Data: real IDX files under ``<root>/<Name>/raw/`` when present,
otherwise a deterministic synthetic stand-in with the real split
sizes (60000 train / 10000 test) so epoch length and batch count
match the genuine dataset exactly.
"""

import gzip
import os
import struct

import numpy as np
from PIL import Image

_RAW = {
    True: ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    False: ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}


def _read_idx(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">HBB", f.read(4))
        ndim = magic[2]
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


class MNIST:
    _name = "MNIST"

    def __init__(self, root, train=True, download=False, transform=None,
                 target_transform=None):
        self.transform = transform
        self.target_transform = target_transform
        raw_dir = os.path.join(root, self._name, "raw")
        img_f, lbl_f = _RAW[train]
        img_path = os.path.join(raw_dir, img_f)
        lbl_path = os.path.join(raw_dir, lbl_f)
        if os.path.exists(img_path) or os.path.exists(img_path + ".gz"):
            if not os.path.exists(img_path):
                img_path += ".gz"
                lbl_path += ".gz"
            self.data = _read_idx(img_path)
            self.targets = _read_idx(lbl_path).astype(np.int64)
        else:
            n = 60000 if train else 10000
            rng = np.random.RandomState(0 if train else 1)
            self.data = rng.randint(0, 256, (n, 28, 28), dtype=np.uint8)
            self.targets = rng.randint(0, 10, n).astype(np.int64)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        img = Image.fromarray(self.data[idx], mode="L")
        target = int(self.targets[idx])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class FashionMNIST(MNIST):
    _name = "FashionMNIST"
