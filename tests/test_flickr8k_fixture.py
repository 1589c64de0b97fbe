"""The Flickr8k-format fixture drives the loader's REAL-data path.

tests/test_flickr8k_real.py covers parsing pieces; this test proves the
whole real-layout path end to end on a synthesized archive tree (the
exact layout parity_when_data.sh stages for the day real data lands):
images decoded from JPEG, captions tokenized from Flickr8k.token.txt,
split files honored, min-freq-5 vocab built from train only.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from data.flickr8k_fixture import make_fixture  # noqa: E402


def test_fixture_tree_feeds_real_loader(tmp_path):
    root = make_fixture(str(tmp_path / "flickr8k"), n_images=20, size=40)

    from atq_tpu.data.flickr8k import Flickr8kDataset, prepare_flickr8k_dataloaders

    train = Flickr8kDataset(root, "train", image_size=32, max_length=12,
                            synthetic_images=0)
    assert train.is_real_data if hasattr(train, "is_real_data") else True
    # 16 train images (0.8 * 20), 5 captions each
    assert len(train.image_names) == 16
    img, ids, length = train[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert ids.shape == (12,) and 2 <= length <= 12

    tr, va, te, vocab_size, w2i = prepare_flickr8k_dataloaders(
        batch_size=4, image_size=32, max_length=12, root_dir=root,
        synthetic_images=0)
    assert vocab_size > 4  # specials + frequent caption words
    images, ids, lengths = next(iter(tr))
    assert images.shape == (4, 32, 32, 3)
    assert ids.shape == (4, 12)
    # val/test must reuse the train vocabulary
    val_ds = va.dataset
    assert val_ds.word_to_idx == w2i
    assert len(val_ds.image_names) == 2
