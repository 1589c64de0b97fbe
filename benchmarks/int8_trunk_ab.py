#!/usr/bin/env python
"""A/B: dense vs int8-trunk (vs +packed) retrieval image encoding on-chip.

Measures the serving-path image tower (ATQMultimodalRetrieval.encode_image,
the reference's published latency surface, readme.md:31) in three forms —
dense f32, int8 trunk (serve/int8_trunk.py), and int8 trunk + packed 2-bit
projector — across serving batch sizes, with the honest slope timer.

Also probes whether this runtime's TPU supports int8 convolutions at all
(the axon runtime is experimental); on failure the int8 rows record the
error and the ATQ_INT8_DEQUANT=1 fallback row is measured instead.

Run: ``python benchmarks/int8_trunk_ab.py [--out f.json] [--batches 1 32 128]``
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def probe_int8_conv():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        x = jnp.ones((1, 8, 8, 4), jnp.int8)
        w = jnp.ones((3, 3, 4, 8), jnp.int8)
        y = jax.jit(lambda a, b: lax.conv_general_dilated(
            a, b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32))(x, w)
        jax.device_get(y)
        return True, None
    except Exception as e:  # record why and fall back
        return False, str(e)[:300]


def build_encoders(image_size=160, embed_dim=192, hidden_dim=384):
    import jax
    import jax.numpy as jnp

    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.serve.int8_trunk import export_int8_collection
    from atq_tpu.serve.packed_model import export_packed_collection

    model = ATQMultimodalRetrieval(vocab_size=3000, embed_dim=embed_dim,
                                   hidden_dim=hidden_dim, use_residual=True,
                                   max_seq_length=50)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((2, image_size, image_size, 3)),
                   jnp.zeros((2, 50), jnp.int32), jnp.asarray([5, 5]))
    int8 = export_int8_collection(v["params"], v.get("batch_stats", {}))
    packed = export_packed_collection(v["params"], v.get("quant"))

    def enc(variables):
        return jax.jit(lambda im: model.apply(
            variables, im, method=ATQMultimodalRetrieval.encode_image))

    return {
        "dense": enc(v),
        "int8": enc({**v, "int8": int8}),
        "int8+packed": enc({**v, "int8": int8, "packed": packed}),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="benchmarks/int8_trunk_ab.json")
    parser.add_argument("--batches", type=int, nargs="*",
                        default=[1, 32, 128])
    parser.add_argument("--image-size", type=int, default=160)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from atq_tpu.utils.timing import sec_per_call

    ok, err = probe_int8_conv()
    results = {"int8_conv_supported": ok, "probe_error": err,
               "dequant_fallback": not ok}
    if not ok:
        os.environ["ATQ_INT8_DEQUANT"] = "1"
    print(f"int8 conv supported: {ok} {err or ''}", flush=True)

    encoders = build_encoders(image_size=args.image_size)
    rng = np.random.RandomState(0)
    rows = []

    def flush():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    for batch in args.batches:
        im = jnp.asarray(rng.randn(batch, args.image_size, args.image_size,
                                   3), jnp.float32)
        ref = None
        for name, fn in encoders.items():
            try:
                out = jax.device_get(fn(im))
                if ref is None:
                    ref = out
                    drift = 0.0
                else:
                    # L2-normalized embeddings: mean cosine vs dense
                    drift = 1.0 - float(np.mean(np.sum(ref * out, axis=1)))
                dt = sec_per_call(fn, im, warmup=2, iters=10)
                row = {"variant": name, "batch": batch,
                       "ms_per_call": dt * 1000,
                       "ms_per_sample": dt * 1000 / batch,
                       "imgs_per_sec": batch / dt,
                       "cos_drift_vs_dense": drift}
            except Exception as e:
                row = {"variant": name, "batch": batch,
                       "error": str(e)[:300]}
            print(row, flush=True)
            rows.append(row)
            results["rows"] = rows
            flush()
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
