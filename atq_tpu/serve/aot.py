"""Ahead-of-time serving exports via ``jax.export``.

The reference deploys by unpickling an ``nn.Module`` and re-running Python
(`/root/reference/train_multimodal.py:645-669` checkpoints, README "edge
deployment" pitch). On TPU the deployable artifact is the *compiled
program*, not the Python: ``jax.export`` serializes the traced StableHLO of
a jitted forward (weights baked in as constants) to bytes that reload and
run with **no model code, no Flax, no retracing** — a serving binary.

Two export shapes:

- **Batch-polymorphic** (default): the leading axis is exported as a
  symbolic dimension ``b``, so ONE artifact serves every batch size the
  micro-batching engine forms. XLA still specializes per concrete batch at
  first call, but tracing/lowering happened at export time.
- **Bucketed**: a fixed-shape export per batch bucket, for functions whose
  internals reject symbolic dims (dynamic reshape mixes, some Pallas
  kernels). ``export_serving`` falls back to this automatically.

Artifacts are a directory: ``manifest.json`` (signature, platforms,
buckets) + one ``.bin`` of serialized StableHLO per export. Loading gives
an :class:`AOTServing` whose ``__call__`` matches the BatchServer
``apply_fn`` contract, so an exported program drops straight in front of
the micro-batching engine (serve/engine.py).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

_MANIFEST = "manifest.json"


def _arg_specs(example_args) -> List[Dict]:
    """JSON-able shape/dtype signature of the example args."""
    return [{"shape": list(np.shape(a)),
             "dtype": str(np.asarray(a).dtype)} for a in example_args]


def _poly_specs(example_args):
    """ShapeDtypeStructs with the leading axis symbolic (``b``)."""
    specs = []
    for a in example_args:
        a = np.asarray(a)
        if a.ndim == 0:
            raise ValueError("batch-polymorphic export needs a leading "
                             "batch axis on every argument; got a scalar "
                             "(stack requests first)")
        specs.append("b" + ", _" * (a.ndim - 1))
    return jax_export.symbolic_args_specs(
        tuple(jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
              for a in example_args),
        tuple(specs))


def export_serving(fn: Callable, example_args: Sequence,
                   batch_polymorphic: bool = True,
                   buckets: Sequence[int] = (),
                   platforms: Optional[Sequence[str]] = None
                   ) -> "AOTServing":
    """Trace + lower ``fn`` once and wrap the export(s) for serving.

    Args:
        fn: per-batch function (leading batch axis on every arg), weights
            already closed over — e.g. the jitted lambdas serve.py builds.
        example_args: one example batch (used for dtypes/trailing shapes).
        batch_polymorphic: export once with symbolic batch. On failure
            (some programs reject symbolic dims) falls back to bucketed.
        buckets: batch sizes for the bucketed form. Defaults to the
            example batch size only.
        platforms: lowering platforms (e.g. ``("tpu", "cpu")``). Default:
            the current default backend. A loaded artifact only runs on a
            platform it was lowered for.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exports: Dict[str, jax_export.Exported] = {}
    poly = False
    if batch_polymorphic:
        try:
            exports["poly"] = jax_export.export(jitted, **kwargs)(
                *_poly_specs(example_args))
            poly = True
        except Exception:
            poly = False
    if not poly:
        sizes = tuple(sorted(set(buckets))) or (int(np.shape(
            example_args[0])[0]),)
        for b in sizes:
            args_b = tuple(
                jax.ShapeDtypeStruct((b,) + tuple(np.shape(a)[1:]),
                                     np.asarray(a).dtype)
                for a in example_args)
            exports[f"b{b}"] = jax_export.export(jitted, **kwargs)(*args_b)
    return AOTServing(exports, _arg_specs(example_args), poly=poly)


class AOTServing:
    """A (re)loaded AOT export, callable like the original batch fn.

    Polymorphic artifacts accept any batch size. Bucketed artifacts pad
    the batch up to the smallest export that fits and slice the outputs
    back — the same static-shape discipline as the serving engine.
    """

    def __init__(self, exports: Dict[str, jax_export.Exported],
                 arg_specs: List[Dict], poly: bool):
        self._exports = exports
        self._arg_specs = arg_specs
        self._poly = poly
        if not poly:
            self._sizes = sorted(int(k[1:]) for k in exports)

    @property
    def batch_polymorphic(self) -> bool:
        return self._poly

    @property
    def platforms(self) -> Tuple[str, ...]:
        return next(iter(self._exports.values())).platforms

    def _pick(self, n: int) -> Tuple[int, jax_export.Exported]:
        for s in self._sizes:
            if n <= s:
                return s, self._exports[f"b{s}"]
        raise ValueError(f"batch {n} exceeds largest exported bucket "
                         f"{self._sizes[-1]}")

    def __call__(self, *args):
        n = int(np.shape(args[0])[0])
        if self._poly:
            return self._exports["poly"].call(*args)
        size, exp = self._pick(n)
        if size != n:
            args = tuple(
                np.concatenate(
                    [a, np.zeros((size - n,) + tuple(np.shape(a)[1:]),
                                 np.asarray(a).dtype)], axis=0)
                for a in args)
        out = exp.call(*args)
        if size == n:
            return out
        if isinstance(out, tuple):
            return tuple(o[:n] for o in out)
        return out[:n]

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> str:
        """Write the artifact directory (manifest + serialized exports)."""
        os.makedirs(path, exist_ok=True)
        names = {}
        for key, exp in self._exports.items():
            fname = f"{key}.bin"
            with open(os.path.join(path, fname), "wb") as f:
                f.write(exp.serialize())
            names[key] = fname
        manifest = {
            "format": "atq_tpu.aot.v1",
            "poly": self._poly,
            "exports": names,
            "arg_specs": self._arg_specs,
            "platforms": list(self.platforms),
            "jax_version": jax.__version__,
        }
        with open(os.path.join(path, _MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        return path

    @classmethod
    def load(cls, path: str) -> "AOTServing":
        """Reload a saved artifact — no model code, no Flax, no retrace."""
        with open(os.path.join(path, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format") != "atq_tpu.aot.v1":
            raise ValueError(f"{path}: not an atq_tpu AOT artifact")
        exports = {}
        for key, fname in manifest["exports"].items():
            with open(os.path.join(path, fname), "rb") as f:
                exports[key] = jax_export.deserialize(f.read())
        return cls(exports, manifest["arg_specs"], poly=manifest["poly"])


def load_serving(path: str) -> AOTServing:
    """Module-level alias for :meth:`AOTServing.load`."""
    return AOTServing.load(path)
