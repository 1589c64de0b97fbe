from atq_tpu.data.mnist import get_mnist_data, get_fashion_mnist_data
from atq_tpu.data.flickr8k import (
    prepare_flickr8k_dataloaders,
    visualize_flickr8k_samples,
)

__all__ = [
    "get_mnist_data",
    "get_fashion_mnist_data",
    "prepare_flickr8k_dataloaders",
    "visualize_flickr8k_samples",
]
