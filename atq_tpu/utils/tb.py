"""Optional TensorBoard metric writer.

The reference logs via ``print``/tqdm and matplotlib plots only (SURVEY.md
§5: no TensorBoard/W&B anywhere); the framework keeps its JSON artifacts
byte-compatible in schema and adds TensorBoard as an opt-in extension.
The writer degrades to a no-op when no TensorBoard backend is importable,
so trainers can call it unconditionally.
"""

from __future__ import annotations

from typing import Dict, Optional


class MetricsWriter:
    """Per-epoch scalar writer; ``None``/missing logdir or a missing
    tensorboard backend make every call a no-op."""

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if not logdir:
            return
        # Broad except: a present-but-broken backend (e.g. a protobuf
        # version mismatch raising TypeError at import, or a constructor
        # failure) must degrade to the next backend / the no-op rather
        # than abort training at startup.
        for importer in (
            lambda: __import__("tensorboardX").SummaryWriter,
            lambda: __import__(
                "torch.utils.tensorboard", fromlist=["SummaryWriter"]
            ).SummaryWriter,
        ):
            try:
                self._writer = importer()(logdir)
                return
            except Exception:
                continue
        import warnings

        warnings.warn(
            "tensorboard logdir given but no working tensorboardX / "
            "torch SummaryWriter; metrics go to the JSON artifacts only")

    @property
    def active(self) -> bool:
        return self._writer is not None

    def scalars(self, step: int, metrics: Dict[str, float],
                prefix: str = "") -> None:
        if self._writer is None:
            return
        for key, value in metrics.items():
            try:
                value = float(value)
            except (TypeError, ValueError):
                continue
            self._writer.add_scalar(f"{prefix}{key}", value, int(step))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
