"""Real-format Flickr8k pipeline coverage (VERDICT round-1 missing #2).

Builds an on-disk fixture in the exact jbrownlee release layout —
``Flickr8k.token.txt`` (``name#i<TAB>caption``), official split files, and
tiny JPEG images under ``Flicker8k_Dataset/`` — and asserts the real-data
branch of the loader (parse, splits, min-freq-5 vocab, __getitem__ tensors)
byte-for-byte against hand-computed truth. The reference behavior being
mirrored lives at /root/reference/data/multimodal_data.py:139-308.
"""

import os

import numpy as np
import pytest

from atq_tpu.data.flickr8k import (
    END,
    IMAGENET_MEAN,
    IMAGENET_STD,
    PAD,
    SPECIALS,
    START,
    UNK,
    Flickr8kDataset,
    prepare_flickr8k_dataloaders,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


# 3 images x 5 captions. "dog" and "runs" appear >=5 times (in vocab);
# "zebra" appears once (must map to UNK).
CAPTIONS = {
    "img_a.jpg": [
        "A dog runs fast.",
        "The dog runs!",
        "dog runs again",
        "a dog, running?",
        "the happy dog runs",
    ],
    "img_b.jpg": [
        "a dog sits",
        "runs with a dog",
        "a zebra stands still",
        "dog and dog",
        "runs runs runs",
    ],
    "img_c.jpg": [
        "a cat sleeps",
        "the cat naps",
        "cat on mat",
        "a cat!",
        "cat cat",
    ],
}
COLORS = {"img_a.jpg": (255, 0, 0), "img_b.jpg": (0, 255, 0),
          "img_c.jpg": (0, 0, 255)}


@pytest.fixture()
def flickr_root(tmp_path):
    root = tmp_path / "flickr8k"
    img_dir = root / "Flicker8k_Dataset"
    img_dir.mkdir(parents=True)
    lines = []
    for name, caps in CAPTIONS.items():
        Image.new("RGB", (12, 9), COLORS[name]).save(img_dir / name)
        for i, cap in enumerate(caps):
            lines.append(f"{name}#{i}\t{cap}")
    (root / "Flickr8k.token.txt").write_text("\n".join(lines) + "\n")
    (root / "Flickr_8k.trainImages.txt").write_text("img_a.jpg\nimg_b.jpg\n")
    (root / "Flickr_8k.devImages.txt").write_text("img_c.jpg\n")
    (root / "Flickr_8k.testImages.txt").write_text("img_c.jpg\n")
    return str(root)


def test_parse_splits_and_pairs(flickr_root):
    train = Flickr8kDataset(flickr_root, "train", image_size=16,
                            max_length=10)
    val = Flickr8kDataset(flickr_root, "val", image_size=16, max_length=10,
                          vocab=train.word_to_idx)
    assert not train.synthetic
    assert len(train) == 10  # 2 train images x 5 captions
    assert len(val) == 5
    assert {n for n, _ in train.items} == {"img_a.jpg", "img_b.jpg"}
    assert {n for n, _ in val.items} == {"img_c.jpg"}
    # caption cleaning: lowercased, punctuation stripped
    assert ("img_a.jpg", "a dog runs fast") in train.items
    assert ("img_a.jpg", "a dog running") in train.items


def test_min_freq_5_vocab(flickr_root):
    train = Flickr8kDataset(flickr_root, "train", image_size=16,
                            max_length=10)
    counts = {}
    for _, cap in train.items:
        for tok in cap.split():
            counts[tok] = counts.get(tok, 0) + 1
    expected = dict(SPECIALS)
    idx = len(SPECIALS)
    # insertion order = first-seen order over items (Counter preserves it)
    seen = []
    for _, cap in train.items:
        for tok in cap.split():
            if tok not in seen:
                seen.append(tok)
    for tok in seen:
        if counts[tok] >= 5:
            expected[tok] = idx
            idx += 1
    assert train.word_to_idx == expected
    assert "dog" in train.word_to_idx and "runs" in train.word_to_idx
    assert "zebra" not in train.word_to_idx


def test_getitem_tensors_hand_computed(flickr_root):
    train = Flickr8kDataset(flickr_root, "train", image_size=16,
                            max_length=8, train_transform=False)
    name, caption = train.items[0]
    assert (name, caption) == ("img_a.jpg", "a dog runs fast")
    image, ids, length = train[0]

    # Image: decode the same saved JPEG (lossy!) then resize + normalize,
    # exactly as the loader does.
    with Image.open(os.path.join(flickr_root, "Flicker8k_Dataset",
                                 name)) as im:
        raw = np.asarray(im.convert("RGB").resize((16, 16)),
                         np.float32) / 255.0
    np.testing.assert_allclose(
        image, (raw - IMAGENET_MEAN) / IMAGENET_STD, atol=1e-6)

    # Caption ids: START + tokens (UNK for sub-min-freq words) + END + PAD.
    w = train.word_to_idx
    want = [START, w["a"], w["dog"], w["runs"], UNK, END, PAD, PAD]
    assert ids.tolist() == want
    assert length == 6  # min(4 tokens + 2, max_length)


def test_caption_truncation(flickr_root):
    train = Flickr8kDataset(flickr_root, "train", image_size=16,
                            max_length=4)
    _, ids, length = train[0]  # "a dog runs fast" -> 4 tokens
    w = train.word_to_idx
    # START + first 3 token ids, END truncated away; length capped.
    assert ids.tolist() == [START, w["a"], w["dog"], w["runs"]]
    assert length == 4


def test_created_split_when_files_missing(flickr_root):
    for f in ("Flickr_8k.trainImages.txt", "Flickr_8k.devImages.txt",
              "Flickr_8k.testImages.txt"):
        os.remove(os.path.join(flickr_root, f))
    train = Flickr8kDataset(flickr_root, "train", image_size=16,
                            max_length=10, seed=0)
    # 80/10/10 over 3 images -> 2/0/1 (int truncation), persisted to disk.
    assert len(train.image_names) == 2
    assert os.path.exists(os.path.join(flickr_root,
                                       "Flickr_8k.trainImages.txt"))
    test = Flickr8kDataset(flickr_root, "test", image_size=16,
                           max_length=10, vocab=train.word_to_idx, seed=0)
    assert len(test.image_names) == 1
    assert not (set(train.image_names) & set(test.image_names))


def test_dataloaders_real_branch(flickr_root):
    train, val, test, vocab_size, w2i = prepare_flickr8k_dataloaders(
        batch_size=4, image_size=16, max_length=8, root_dir=flickr_root)
    assert vocab_size == len(w2i) >= len(SPECIALS)
    images, ids, lengths = next(iter(train))
    assert images.shape == (4, 16, 16, 3) and images.dtype == np.float32
    assert ids.shape == (4, 8) and ids.dtype == np.int32
    assert lengths.shape == (4,)


def test_synthetic_images_process_deterministic():
    """Synthetic image seeds must not depend on Python's randomized string
    hashing: hash(name)-seeded generation made every PROCESS see different
    eval images, so identical evaluate.py invocations returned R@K metrics
    differing by several points (round 3 misread this as packed-serving
    drift). crc32 seeding pins the corpus across processes — asserted by
    generating the same item under two different PYTHONHASHSEEDs."""
    import subprocess
    import sys
    import zlib

    prog = (
        "from atq_tpu.data.flickr8k import Flickr8kDataset\n"
        "import numpy as np, zlib\n"
        "ds = Flickr8kDataset(root_dir='/tmp/nonexistent_f8k_det',"
        " split='test', image_size=32, synthetic_images=6)\n"
        "img, _, _ = ds[0]\n"
        "print('CRC', zlib.crc32(np.ascontiguousarray(img).tobytes()))\n"
    )
    crcs = []
    for hashseed in ("0", "4242"):
        env = dict(os.environ, PYTHONHASHSEED=hashseed,
                   ATQ_NO_DOWNLOAD="1", JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", prog], env=env,
                             capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr
        crcs.append([ln for ln in out.stdout.splitlines()
                     if ln.startswith("CRC")][0])
    assert crcs[0] == crcs[1], f"synthetic corpus varies by process: {crcs}"
