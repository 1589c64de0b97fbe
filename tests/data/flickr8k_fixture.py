"""Synthesize a Flickr8k-format dataset tree (layout-real, content-synthetic).

The real archives can never reach this zero-egress box, so the staged
accuracy-parity script (parity_when_data.sh) was untestable end-to-end.
This fixture reproduces the EXACT on-disk layout the loader's real-data
path expects (atq_tpu/data/flickr8k.py:_check_exists/_load_real — the same
layout the reference's multimodal_data.py:100-134 extracts from the
jbrownlee archives):

    <root>/Flicker8k_Dataset/<name>.jpg        (note the 'Flicker' typo —
                                                it is real; the archive
                                                spells it that way)
    <root>/Flickr8k.token.txt                  name.jpg#i<TAB>caption
    <root>/Flickr_8k.trainImages.txt
    <root>/Flickr_8k.devImages.txt
    <root>/Flickr_8k.testImages.txt

Images are tiny deterministic JPEGs; captions come from the same
subject/verb/place grammar as the synthetic corpus, with punctuation and
casing so clean_caption/tokenize have real work to do.
"""

from __future__ import annotations

import os

_SUBJECTS = ["A dog", "The child", "Two men", "A woman", "A group of kids",
             "A cyclist", "The bird", "A surfer"]
_VERBS = ["runs", "jumps", "plays", "walks", "rides", "stands", "swims",
          "climbs"]
_PLACES = ["on the beach", "in the park", "near the water, smiling",
           "on a mountain", "in the snow!", "on the street",
           "in the tall grass", "at the crowded market"]


def make_fixture(root: str, n_images: int = 30, size: int = 48,
                 seed: int = 0) -> str:
    """Create the fixture tree under ``root``; returns ``root``.
    Deterministic for a given (n_images, size, seed)."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "Flicker8k_Dataset")
    os.makedirs(img_dir, exist_ok=True)

    names = [f"{1000000000 + i}_{i:04x}.jpg" for i in range(n_images)]
    token_lines = []
    for i, name in enumerate(names):
        arr = rng.randint(0, 256, (size, size, 3), dtype="uint8")
        Image.fromarray(arr, "RGB").save(os.path.join(img_dir, name),
                                         quality=85)
        for j in range(5):
            s = _SUBJECTS[(i + j) % len(_SUBJECTS)]
            v = _VERBS[(i * 2 + j) % len(_VERBS)]
            p = _PLACES[(i + 3 * j) % len(_PLACES)]
            token_lines.append(f"{name}#{j}\t{s} {v} {p} .")

    with open(os.path.join(root, "Flickr8k.token.txt"), "w") as f:
        f.write("\n".join(token_lines) + "\n")

    n_train = int(0.8 * n_images)
    n_val = max(1, int(0.1 * n_images))
    splits = {
        "Flickr_8k.trainImages.txt": names[:n_train],
        "Flickr_8k.devImages.txt": names[n_train:n_train + n_val],
        "Flickr_8k.testImages.txt": names[n_train + n_val:],
    }
    for fname, members in splits.items():
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(members) + "\n")
    return root


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--n-images", type=int, default=30)
    ap.add_argument("--size", type=int, default=48)
    args = ap.parse_args()
    make_fixture(args.root, n_images=args.n_images, size=args.size)
    print(f"flickr8k fixture written to {args.root}")
