"""Minimal torchvision shim — JUST enough surface for the reference
scripts (`/root/reference/train.py` via `data/datasets.py`) to execute
their real code path on this box, where torchvision is not installed
and cannot be (zero egress).

Only the symbols the reference imports exist: ``datasets.MNIST`` /
``datasets.FashionMNIST`` (reference data/datasets.py:31,52,115,136)
and the five transforms its pipelines use (``Compose``, ``ToTensor``,
``Normalize``, ``RandomRotation``, ``RandomHorizontalFlip``,
data/datasets.py:18-27,101-112). The transforms call the same PIL
operations real torchvision dispatches to for PIL inputs, so the
per-item data-pipeline cost is faithful; dataset bytes are a
deterministic synthetic stand-in (timing is content-independent).

This package lives on PYTHONPATH only while
benchmarks/ref_timing/run_ref_timing.py executes the reference script;
it is NOT part of atq_tpu.
"""

from . import datasets, models, transforms  # noqa: F401

__version__ = "0.0-atq-ref-timing-shim"
