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
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            try:
                from torch.utils.tensorboard import SummaryWriter
            except ImportError:
                import warnings

                warnings.warn(
                    "tensorboard logdir given but no tensorboardX / torch "
                    "SummaryWriter importable; metrics go to the JSON "
                    "artifacts only")
                return
        self._writer = SummaryWriter(logdir)

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
