"""Flickr8k image-caption pipeline.

Reference: /root/reference/data/multimodal_data.py:58-451.

Behavior reproduced:
- caption file parsing (``name#i<TAB>caption``), lowercasing, stripping of
  non-word characters (multimodal_data.py:139-163);
- official train/dev/test split files, or a created 80/10/10 split persisted
  next to the data (:166-224);
- one dataset item per (image, caption) pair — 5 captions/image (:227-233);
- vocabulary from train captions with MIN FREQUENCY 5 and specials
  PAD=0 / UNK=1 / START=2 / END=3 (:235-265);
- NLTK punkt tokenization when available (:244-251, :283-289); offline
  environments use the vendored PTB tokenizer (treebank.py) which is
  token-identical to word_tokenize on cleaned captions, so vocab ids match
  a punkt-EQUIPPED reference run; ``ATQ_SPLIT_TOKENIZER=1`` reproduces the
  reference's punkt-less ``.split()`` fallback instead;
- items capped/padded to max_length with START/END, length = min(tokens+2,
  max_length) (:270-308);
- train transform: resize + random horizontal flip + ImageNet
  normalization; eval without flip (:326-337).

Offline fallback: when the dataset directory is missing and download is
impossible, a deterministic synthetic dataset (structured color images +
template-grammar captions) keeps the full pipeline, training loop, and
benchmarks runnable.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

PAD, UNK, START, END = 0, 1, 2, 3
SPECIALS = {"<PAD>": PAD, "<UNK>": UNK, "<START>": START, "<END>": END}

_DOWNLOAD_ATTEMPTED = False


def _nltk_available() -> bool:
    try:
        import nltk

        nltk.data.find("tokenizers/punkt")
        return True
    except Exception:
        return False


_USE_NLTK = None


def tokenize(caption: str) -> List[str]:
    """The reference's punkt path, without needing NLTK data.

    Chain: real ``nltk.word_tokenize`` when punkt data is installed (the
    reference's primary path, multimodal_data.py:244-251) -> the vendored
    PTB tokenizer (atq_tpu/data/treebank.py — token-identical to
    word_tokenize on the cleaned-caption domain, so offline boxes build
    the same vocab ids as a punkt-equipped reference run) ->
    ``ATQ_SPLIT_TOKENIZER=1`` forces the reference's ``.split()`` fallback
    for reproducing a punkt-LESS reference run."""
    global _USE_NLTK
    if os.environ.get("ATQ_SPLIT_TOKENIZER", "0") == "1":
        return caption.lower().split()
    if _USE_NLTK is None:
        _USE_NLTK = _nltk_available()
    if _USE_NLTK:
        try:
            import nltk

            return nltk.tokenize.word_tokenize(caption.lower())
        except Exception:
            pass
    from atq_tpu.data.treebank import word_tokenize

    return word_tokenize(caption.lower())


def clean_caption(caption: str) -> str:
    """Lowercase + strip non-word chars (multimodal_data.py:158-161)."""
    caption = caption.lower()
    return re.sub(r"[^\w\s]", "", caption)


# ---------------------------------------------------------------------------
# Synthetic fallback corpus
# ---------------------------------------------------------------------------

_SYN_SUBJECTS = ["a dog", "a child", "two men", "a woman", "a group",
                 "a cyclist", "a bird", "a surfer"]
_SYN_VERBS = ["runs", "jumps", "plays", "walks", "rides", "stands", "swims",
              "climbs"]
_SYN_PLACES = ["on the beach", "in the park", "near the water",
               "on a mountain", "in the snow", "on the street",
               "in the grass", "at the market"]


def _synthetic_corpus(n_images: int, seed: int = 0):
    """Deterministic (image, 5 captions) pairs; the image encodes its
    caption's (subject, verb, place) indices as color patterns so retrieval
    is learnable."""
    rng = np.random.RandomState(seed)
    names, captions, latents = [], {}, {}
    for i in range(n_images):
        s = rng.randint(len(_SYN_SUBJECTS))
        v = rng.randint(len(_SYN_VERBS))
        p = rng.randint(len(_SYN_PLACES))
        name = f"synthetic_{i:05d}.jpg"
        names.append(name)
        latents[name] = (s, v, p)
        caps = []
        for _ in range(5):
            extra = rng.choice(["happily", "quickly", "slowly", "outside",
                                "today", ""])
            cap = f"{_SYN_SUBJECTS[s]} {_SYN_VERBS[v]} {_SYN_PLACES[p]} " \
                  f"{extra}".strip()
            caps.append(clean_caption(cap))
        captions[name] = caps
    return names, captions, latents


def _synthetic_image(latent, image_size: int, seed: int) -> np.ndarray:
    s, v, p = latent
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    yy /= image_size
    xx /= image_size
    r = 0.5 + 0.5 * np.sin(2 * np.pi * (s + 1) * xx)
    g = 0.5 + 0.5 * np.cos(2 * np.pi * (v + 1) * yy)
    b = 0.5 + 0.5 * np.sin(2 * np.pi * (p + 1) * (xx + yy))
    img = np.stack([r, g, b], axis=-1)
    img += rng.randn(image_size, image_size, 3).astype(np.float32) * 0.05
    return np.clip(img, 0, 1).astype(np.float32)


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


class Flickr8kDataset:
    """(image, caption) pair dataset with reference-compatible vocab."""

    def __init__(self, root_dir: str = "./data/flickr8k",
                 split: str = "train", image_size: int = 224,
                 max_length: int = 50, tokenize_captions: bool = True,
                 train_transform: bool = False,
                 vocab: Optional[Dict[str, int]] = None,
                 synthetic_images: int = 400, seed: int = 0,
                 cache_images: bool = True, raw_uint8: bool = False):
        # raw_uint8: yield resized uint8 images and let the device do
        # ImageNet normalization + flips (4x smaller host->device transfer,
        # which dominates when the chip sits behind a network tunnel).
        self.raw_uint8 = raw_uint8
        self._image_cache: Optional[dict] = {} if cache_images else None
        self.root_dir = root_dir
        self.split = split
        self.image_size = image_size
        self.max_length = max_length
        self.tokenize_captions = tokenize_captions
        self.train_transform = train_transform
        self.seed = seed
        if not self._check_exists():
            self._download_and_extract()
        self.synthetic = not self._check_exists()

        if self.synthetic:
            self._load_synthetic(synthetic_images)
        else:
            self._load_real()

        if tokenize_captions:
            if vocab is not None:
                self.word_to_idx = vocab
            else:
                self._build_vocabulary()
            self.idx_to_word = {i: w for w, i in self.word_to_idx.items()}
            self.vocab_size = len(self.word_to_idx)

    # -- loading ----------------------------------------------------------

    def _check_exists(self) -> bool:
        return (os.path.exists(os.path.join(self.root_dir,
                                            "Flicker8k_Dataset"))
                and os.path.exists(os.path.join(self.root_dir,
                                                "Flickr8k.token.txt")))

    # jbrownlee GitHub release archives, as in the reference
    # (multimodal_data.py:110-111).
    DOWNLOAD_URLS = (
        "https://github.com/jbrownlee/Datasets/releases/download/"
        "Flickr8k/Flickr8k_Dataset.zip",
        "https://github.com/jbrownlee/Datasets/releases/download/"
        "Flickr8k/Flickr8k_text.zip",
    )

    def _download_and_extract(self):
        """Attempt the reference's dataset download
        (multimodal_data.py:100-134); unlike the reference (which raises),
        failure falls through to the synthetic corpus so offline
        environments stay runnable. Disable with ATQ_NO_DOWNLOAD=1."""
        if os.environ.get("ATQ_NO_DOWNLOAD", "0") == "1":
            return
        global _DOWNLOAD_ATTEMPTED
        if _DOWNLOAD_ATTEMPTED:  # one attempt per process, not per split
            return
        _DOWNLOAD_ATTEMPTED = True
        import io
        import urllib.request
        import zipfile

        try:
            os.makedirs(self.root_dir, exist_ok=True)
            for url in self.DOWNLOAD_URLS:
                print(f"Downloading {url} ...")
                with urllib.request.urlopen(url, timeout=30) as resp:
                    payload = resp.read()
                with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                    zf.extractall(self.root_dir)
            print("Dataset downloaded and extracted successfully.")
        except Exception as e:  # zero-egress / transient network failures
            print(f"Error downloading dataset: {e}")
            print("Falling back to the synthetic corpus; to use real data, "
                  "extract Flickr8k_Dataset.zip and Flickr8k_text.zip into "
                  f"{self.root_dir}")

    def _load_real(self):
        captions: Dict[str, List[str]] = {}
        with open(os.path.join(self.root_dir, "Flickr8k.token.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or "\t" not in line:
                    continue
                image_caption_id, caption = line.split("\t", 1)
                image_name = image_caption_id.split("#")[0]
                captions.setdefault(image_name, []).append(
                    clean_caption(caption)
                )
        self.captions = captions
        split_files = {
            "train": "Flickr_8k.trainImages.txt",
            "val": "Flickr_8k.devImages.txt",
            "test": "Flickr_8k.testImages.txt",
        }
        paths = {k: os.path.join(self.root_dir, v)
                 for k, v in split_files.items()}
        if not all(os.path.exists(p) for p in paths.values()):
            all_images = sorted(captions.keys())
            rng = np.random.RandomState(self.seed)
            rng.shuffle(all_images)
            n_train = int(0.8 * len(all_images))
            n_val = int(0.1 * len(all_images))
            splits = {
                "train": all_images[:n_train],
                "val": all_images[n_train:n_train + n_val],
                "test": all_images[n_train + n_val:],
            }
            for k, p in paths.items():
                try:
                    with open(p, "w") as f:
                        f.write("\n".join(splits[k]))
                except OSError:
                    pass
            self.image_names = splits[self.split]
        else:
            with open(paths[self.split]) as f:
                self.image_names = [l.strip() for l in f if l.strip()]
        self._make_items()
        self._latents = None

    def _load_synthetic(self, n_images: int):
        names, captions, latents = _synthetic_corpus(n_images, seed=0)
        n_train = int(0.8 * len(names))
        n_val = int(0.1 * len(names))
        splits = {
            "train": names[:n_train],
            "val": names[n_train:n_train + n_val],
            "test": names[n_train + n_val:],
        }
        self.captions = captions
        self.image_names = splits[self.split]
        self._latents = latents
        self._make_items()

    def _make_items(self):
        self.items = [
            (name, caption)
            for name in self.image_names
            for caption in self.captions.get(name, [])
        ]
        # Unique-image ids per item: lets multi-positive losses identify the
        # 5 captions sharing an image within a batch.
        name_to_id = {n: i for i, n in enumerate(self.image_names)}
        self.item_image_ids = np.asarray(
            [name_to_id[name] for name, _ in self.items], np.int32
        )
        print(f"Loaded {len(self.items)} image-caption pairs for "
              f"{self.split} split")

    def _build_vocabulary(self):
        word_counts: Counter = Counter()
        for _, caption in self.items:
            word_counts.update(tokenize(caption))
        self.word_to_idx = dict(SPECIALS)
        idx = len(SPECIALS)
        for word, count in word_counts.items():
            if count >= 5:  # reference's frequency threshold (:258)
                self.word_to_idx[word] = idx
                idx += 1
        print(f"Vocabulary size: {len(self.word_to_idx)}")

    # -- item access ------------------------------------------------------

    def __len__(self):
        return len(self.items)

    def _load_image(self, name: str, rng) -> np.ndarray:
        # Decoded + resized + normalized images are cached in host RAM
        # (8k Flickr images at 160px ~= 2.5 GB) — PIL decode on every epoch
        # would bottleneck the input pipeline; the random flip stays
        # per-epoch on top of the cached image.
        img = self._image_cache.get(name) if self._image_cache is not None \
            else None
        if img is None:
            if self.synthetic:
                # zlib.crc32, NOT hash(): Python string hashing is
                # randomized per process (PYTHONHASHSEED), which made every
                # process generate DIFFERENT synthetic images — eval
                # metrics on the same checkpoint jittered by several R@K
                # points across runs, which round 3 misread as packed-path
                # drift (benchmarks/BENCHMARKS.md round-4 note).
                import zlib

                raw = _synthetic_image(self._latents[name], self.image_size,
                                       seed=zlib.crc32(name.encode())
                                       % 2**31)
            else:
                from PIL import Image

                path = os.path.join(self.root_dir, "Flicker8k_Dataset", name)
                with Image.open(path) as im:
                    im = im.convert("RGB").resize(
                        (self.image_size, self.image_size)
                    )
                    raw = np.asarray(im, np.float32) / 255.0
            if self.raw_uint8:
                img = np.round(raw * 255.0).astype(np.uint8)
            else:
                img = (raw - IMAGENET_MEAN) / IMAGENET_STD
            if self._image_cache is not None:
                self._image_cache[name] = img
        if self.raw_uint8:
            # Flip + normalization happen on-device (train/retrieval.py).
            return img
        if self.train_transform and rng.rand() < 0.5:
            img = img[:, ::-1]
        return img

    def encode_caption(self, caption: str) -> Tuple[np.ndarray, int]:
        tokens = tokenize(caption)
        ids = [self.word_to_idx.get(t, UNK) for t in tokens]
        ids = [START] + ids + [END]
        if len(ids) > self.max_length:
            ids = ids[:self.max_length]
        length = min(len(tokens) + 2, self.max_length)
        ids = ids + [PAD] * (self.max_length - len(ids))
        return np.asarray(ids, np.int32), length

    def __getitem__(self, idx: int):
        name, caption = self.items[idx]
        rng = np.random.RandomState((self.seed + idx) % 2**31)
        image = self._load_image(name, rng)
        if self.tokenize_captions:
            ids, length = self.encode_caption(caption)
            return image, ids, length
        return image, caption, len(caption.split())


class Flickr8kLoader:
    """Batch iterator yielding (images NHWC f32, caption ids (B, L) i32,
    lengths (B,) i32) numpy batches."""

    def __init__(self, dataset: Flickr8kDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 drop_remainder: bool = False,
                 with_image_ids: bool = False):
        self.with_image_ids = with_image_ids
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.batch_size * self.batch_size
                if self.drop_remainder else n)
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            images, ids, lengths = zip(*(self.dataset[i] for i in idx))
            batch = (np.stack(images), np.stack(ids),
                     np.asarray(lengths, np.int32))
            if self.with_image_ids:
                batch = batch + (self.dataset.item_image_ids[idx],)
            yield batch


def active_tokenizer_variant() -> str:
    """Which tokenizer :func:`tokenize` would use right now:
    ``'split'`` / ``'nltk-punkt'`` / ``'vendored-ptb'``. Stamped into saved
    vocab files so a re-eval can detect a tokenization-environment change
    (a vocabulary rebuilt under a different tokenizer silently yields
    different token ids and wrong metrics)."""
    global _USE_NLTK
    if os.environ.get("ATQ_SPLIT_TOKENIZER", "0") == "1":
        return "split"
    if _USE_NLTK is None:
        _USE_NLTK = _nltk_available()
    return "nltk-punkt" if _USE_NLTK else "vendored-ptb"


# Reserved metadata key inside saved vocab JSON (not a token; stripped on
# load). nltk-punkt and vendored-ptb are token-identical on the cleaned
# caption domain (tests/test_tokenizer_parity.py), so only 'split' vs the
# other two is a REAL mismatch.
VOCAB_TOKENIZER_KEY = "__tokenizer__"
_PTB_COMPATIBLE = {"nltk-punkt", "vendored-ptb"}


def tokenizer_variants_compatible(a: str, b: str) -> bool:
    return a == b or (a in _PTB_COMPATIBLE and b in _PTB_COMPATIBLE)


def read_vocab_tokenizer(path: str) -> Optional[str]:
    """The tokenizer variant stamped into a saved vocab file, or None for
    pre-round-5 files saved before stamping existed."""
    import json

    try:
        with open(path) as f:
            return json.load(f).get(VOCAB_TOKENIZER_KEY)
    except Exception:
        return None


def load_vocab_file(path: str) -> Dict[str, int]:
    """Load a recorded word_to_idx vocabulary (JSON) — the escape hatch for
    exact vocab/checkpoint parity with a reference-trained run whose
    tokenization environment (e.g. NLTK punkt availability) differs.
    Metadata keys (``__tokenizer__``) are stripped; use
    :func:`read_vocab_tokenizer` to inspect them."""
    import json

    with open(path) as f:
        return {k: int(v) for k, v in json.load(f).items()
                if not k.startswith("__")}


def save_vocab_file(word_to_idx: Dict[str, int], path: str):
    import json

    record = dict(word_to_idx)
    record[VOCAB_TOKENIZER_KEY] = active_tokenizer_variant()
    with open(path, "w") as f:
        json.dump(record, f)


def prepare_flickr8k_dataloaders(batch_size: int = 32, image_size: int = 224,
                                 max_length: int = 50,
                                 tokenize_captions: bool = True,
                                 num_workers: int = 2,
                                 root_dir: str = "./data/flickr8k",
                                 synthetic_images: int = 400,
                                 vocab_file: Optional[str] = None,
                                 raw_uint8: bool = False,
                                 with_image_ids: bool = False):
    """Returns (train, val, test, vocab_size, word_to_idx) — the reference's
    exact signature (multimodal_data.py:311-390). num_workers accepted for
    API compatibility (loading is in-process here). ``vocab_file`` forces a
    recorded vocabulary instead of rebuilding one from the train captions."""
    del num_workers
    forced_vocab = (load_vocab_file(vocab_file)
                    if vocab_file and tokenize_captions else None)
    train_ds = Flickr8kDataset(root_dir, "train", image_size, max_length,
                               tokenize_captions, train_transform=True,
                               synthetic_images=synthetic_images,
                               vocab=forced_vocab, raw_uint8=raw_uint8)
    vocab = train_ds.word_to_idx if tokenize_captions else None
    val_ds = Flickr8kDataset(root_dir, "val", image_size, max_length,
                             tokenize_captions, vocab=vocab,
                             synthetic_images=synthetic_images,
                             raw_uint8=raw_uint8)
    test_ds = Flickr8kDataset(root_dir, "test", image_size, max_length,
                              tokenize_captions, vocab=vocab,
                              synthetic_images=synthetic_images,
                              raw_uint8=raw_uint8)
    train_loader = Flickr8kLoader(train_ds, batch_size, shuffle=True,
                                  drop_remainder=True,
                                  with_image_ids=with_image_ids)
    val_loader = Flickr8kLoader(val_ds, batch_size)
    test_loader = Flickr8kLoader(test_ds, batch_size)
    if tokenize_captions:
        return (train_loader, val_loader, test_loader, train_ds.vocab_size,
                train_ds.word_to_idx)
    return train_loader, val_loader, test_loader, None, None


def visualize_flickr8k_samples(dataloader: Flickr8kLoader,
                               num_samples: int = 5,
                               idx_to_word: Optional[Dict[int, str]] = None,
                               out_path: str = "flickr8k_samples.png"):
    """Save a grid of denormalized images with decoded captions
    (reference multimodal_data.py:393-451)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images, captions, _lengths = next(iter(dataloader))
    num_samples = min(num_samples, len(images))
    plt.figure(figsize=(15, 5 * num_samples))
    for i in range(num_samples):
        img = images[i] * IMAGENET_STD + IMAGENET_MEAN
        img = np.clip(img, 0, 1)
        if idx_to_word is not None:
            words = []
            for idx in captions[i].tolist():
                if idx == PAD:
                    continue
                if idx == END:
                    break
                if idx >= len(SPECIALS) and idx in idx_to_word:
                    words.append(idx_to_word[idx])
            caption = " ".join(words)
        else:
            caption = "No caption available"
        plt.subplot(num_samples, 1, i + 1)
        plt.imshow(img)
        plt.title(f"Caption: {caption}")
        plt.axis("off")
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close()
    print(f"Visualization saved to '{out_path}'")
