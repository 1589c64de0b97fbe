#!/usr/bin/env python
"""Model-serving CLI: checkpoint -> micro-batched HTTP endpoint.

Completes the deployment story the reference only motivates (its
bit-packing README pitch ends at a latency harness,
/root/reference/utils/metrics.py:21-57). Loads a trained checkpoint,
optionally exports every quantized layer to 2-bit planes
(``--packed``), fronts the jitted forward with the micro-batching
:class:`BatchServer` (concurrent HTTP requests batch onto the TPU
automatically), and serves JSON over stdlib HTTP.

The default retrieval configuration serves the ResNet backbone from
per-channel int8 weights with BatchNorm folded (``--int8_trunk``, on by
default): the safe-and-faster config on this runtime — 1.22-1.28x over
dense at serving batches, ~1.1e-4 embedding drift, and it has never
crashed the TPU worker, unlike the 2-bit packed program
(BENCHMARKS.md config-4 chase). The 2-bit ``--packed`` path stays
opt-in for memory-bound deployments. With either quantized primary the
dense forward is installed as the engine's ``fallback_fn``: a batch
whose quantized dispatch fails (e.g. a crashed TPU worker) is re-served
dense, and a repeatedly-failing primary is latched off — see
atq_tpu/serve/engine.py.

Endpoints:
  classification: POST /predict {"image": 28x28[x1], "normalize": bool}
  retrieval:      POST /embed_image {"image": HxWx3, "normalize": bool}
                  POST /embed_text  {"text": "..."} | {"tokens": [...]}
                  POST /index/add {"id": ..., "image"|"text"|"tokens": ...}
                  POST /search    {"image"|"text"|"tokens": ..., "k": 5}
                  (device-resident corpus index, atq_tpu/serve/index.py;
                  preload with --index_file)
  both:           GET /healthz  (engine stats)

Examples:
  python serve.py --task classification \
      --checkpoint checkpoints/atq_model_fashion_mnist.npz --use-rpb \
      --packed --port 8712
  python serve.py --task retrieval --checkpoint outputs/run/best_model.npz \
      --use_residual --port 8712
"""

import argparse
import json
import os

from atq_tpu.utils.platform import apply_platform_env

apply_platform_env()


def build_parser():
    p = argparse.ArgumentParser(description="Serve an ATQ checkpoint")
    p.add_argument("--task", type=str, required=True,
                   choices=["classification", "retrieval"])
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset", type=str, default="fashion_mnist",
                   choices=["mnist", "fashion_mnist"],
                   help="normalization stats for /predict")
    p.add_argument("--image_size", type=int, default=160)
    p.add_argument("--max_seq_length", type=int, default=50)
    p.add_argument("--embed_dim", type=int, default=192)
    p.add_argument("--hidden_dim", type=int, default=384)
    p.add_argument("--use_residual", action="store_true")
    p.add_argument("--use-rpb", dest="use_rpb", action="store_true")
    p.add_argument("--wider-layers", dest="wider_layers",
                   action="store_true")
    p.add_argument("--moe_experts", type=int, default=0)
    p.add_argument("--grad-mode", "--grad_mode", dest="grad_mode",
                   type=str, default="auto",
                   choices=["auto", "parity", "ste", "ttq"])
    p.add_argument("--aot", type=str, default=None, metavar="DIR",
                   help="serve from ahead-of-time exported programs "
                        "(atq_tpu/serve/aot.py). If DIR holds artifacts "
                        "they are loaded (no model tracing at startup); "
                        "otherwise the serving programs are exported "
                        "there first, then served")
    p.add_argument("--packed", action="store_true",
                   help="serve from exported 2-bit planes with the dense "
                        "forward as the engine fallback")
    p.add_argument("--int8_trunk", action="store_true", default=True,
                   help="(retrieval) serve the ResNet backbone from "
                        "per-channel int8 weights with BatchNorm folded; "
                        "composes with --packed (fully quantized image "
                        "tower), dense forward stays the fallback. ON by "
                        "default: it is the safe-and-faster serving "
                        "config on this runtime (1.22-1.28x over dense "
                        "at batch >=32, ~1.1e-4 embedding drift, never "
                        "crashed the worker - BENCHMARKS.md config-4 "
                        "chase); batch-1 latency is ~0.75x dense, so "
                        "latency-critical single-request deployments "
                        "may prefer --no_int8_trunk")
    p.add_argument("--no_int8_trunk", dest="int8_trunk",
                   action="store_false",
                   help="serve the ResNet backbone dense (fp32/bf16)")
    p.add_argument("--vocab_file", type=str, default=None,
                   help="vocab.json (retrieval); defaults to the one "
                        "next to the checkpoint")
    p.add_argument("--index_file", type=str, default=None,
                   help="pre-built embedding-index .npz to preload into "
                        "the /search corpus (retrieval)")
    p.add_argument("--index_int8", action="store_true",
                   help="hold the device-side search corpus as per-row "
                        "symmetric int8 (4x less HBM; scores via "
                        "bf16-input f32-accumulate matmul)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8712)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=2.0)
    return p


def _aot_front(args, name, primary, fallback, example_args):
    """Honor ``--aot``: serve ``name`` from a saved compiled program.

    If the artifact exists it is loaded and ``primary`` is never traced
    (cold start skips compilation of the Python model entirely); if not,
    ``primary`` is exported to ``<aot>/<name>`` first. The live
    ``fallback`` is kept when available — an AOT program that fails a
    batch re-serves it through the engine's fallback path like any other
    primary."""
    if not args.aot:
        return primary, fallback
    from atq_tpu.serve.aot import AOTServing, export_serving

    path = os.path.join(args.aot, name)
    if os.path.exists(os.path.join(path, "manifest.json")):
        print(json.dumps({"aot": "loaded", "path": path}), flush=True)
        return AOTServing.load(path), fallback
    aot = export_serving(primary, example_args)
    aot.save(path)
    print(json.dumps({"aot": "exported", "path": path,
                      "batch_polymorphic": aot.batch_polymorphic}),
          flush=True)
    return aot, fallback


def build_classifier_routes(args, ckpt, grad_mode):
    import jax

    from atq_tpu.models.image_classifier import ATQImageClassifier
    from atq_tpu.serve.engine import BatchServer
    from atq_tpu.serve.http import make_classifier_routes

    model = ATQImageClassifier(
        use_rpb=args.use_rpb,
        hidden_size=256 if args.wider_layers else 128,
        grad_mode=grad_mode,
    )
    # Weights ride as jit ARGUMENTS (device-committed once), never as
    # closure constants embedded in the executable — see
    # serve/packed_model.py StaticShape for why.
    variables = jax.device_put(
        {"params": ckpt["params"], "quant": ckpt.get("quant", {}),
         "batch_stats": ckpt.get("batch_stats", {})})
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def dense(x, _v=variables):
        return fwd(_v, x)

    primary, fallback = dense, None
    if args.packed:
        from atq_tpu.serve.packed_model import export_packed_collection

        packed_vars = jax.device_put(dict(
            variables,
            packed=export_packed_collection(ckpt["params"],
                                            ckpt.get("quant"))))

        def primary(x, _v=packed_vars):
            return fwd(_v, x)

        fallback = dense
    import numpy as np

    primary, fallback = _aot_front(
        args, "predict", primary, fallback,
        (np.zeros((2, 28, 28, 1), np.float32),))
    server = BatchServer(primary, max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms,
                         fallback_fn=fallback).start()
    return (make_classifier_routes(server, dataset=args.dataset),
            [server])


def build_retrieval_routes(args, ckpt, grad_mode):
    import jax
    import jax.numpy as jnp

    from atq_tpu.data.flickr8k import load_vocab_file
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.serve.engine import BatchServer
    from atq_tpu.serve.http import make_retrieval_routes

    vocab_file = args.vocab_file
    if vocab_file is None:
        candidate = os.path.join(os.path.dirname(args.checkpoint),
                                 "vocab.json")
        if not os.path.exists(candidate):
            raise SystemExit("retrieval serving needs a vocab.json "
                             "(--vocab_file, or next to the checkpoint)")
        vocab_file = candidate
    word_to_idx = load_vocab_file(vocab_file)

    model = ATQMultimodalRetrieval(
        vocab_size=len(word_to_idx), embed_dim=args.embed_dim,
        hidden_dim=args.hidden_dim, use_residual=args.use_residual,
        max_seq_length=args.max_seq_length,
        text_moe_experts=args.moe_experts, grad_mode=grad_mode,
    )
    constants = ckpt.get("constants")
    if not constants:
        fresh = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
            jnp.zeros((1, args.max_seq_length), jnp.int32),
            jnp.asarray([5], jnp.int32),
        )
        constants = fresh.get("constants", {})
    dense_vars = {"params": ckpt["params"], "quant": ckpt.get("quant", {}),
                  "constants": constants,
                  "batch_stats": ckpt.get("batch_stats", {})}

    # Weights as jit arguments, not closure constants (see
    # serve/packed_model.py StaticShape). One jitted callable serves both
    # the dense and quantized variable trees (separate treedefs -> two
    # compiled programs, zero constant bytes in either).
    _img_jit = jax.jit(lambda v, im: model.apply(
        v, im, method=ATQMultimodalRetrieval.encode_image))
    _txt_jit = jax.jit(lambda v, tok, ln: model.apply(
        v, tok, ln, method=ATQMultimodalRetrieval.encode_text))

    def encoders(variables):
        variables = jax.device_put(variables)

        def img(im, _v=variables):
            return _img_jit(_v, im)

        def txt(tok, ln, _v=variables):
            return _txt_jit(_v, tok, ln)

        return img, txt

    img_fwd, txt_fwd = encoders(dense_vars)
    img_fallback = txt_fallback = None
    if args.packed or args.int8_trunk:
        quant_vars = dict(dense_vars)
        if args.packed:
            from atq_tpu.serve.packed_model import export_packed_collection

            quant_vars["packed"] = export_packed_collection(
                ckpt["params"], ckpt.get("quant"))
        if args.int8_trunk:
            from atq_tpu.serve.int8_trunk import export_int8_collection

            quant_vars["int8"] = export_int8_collection(
                ckpt["params"], ckpt.get("batch_stats", {}))
        # Dense forward becomes the fallback (module docstring contract):
        # a quantized-program crash re-serves the batch dense, and a
        # repeatedly-crashing primary is latched off.
        img_fallback, txt_fallback = img_fwd, txt_fwd
        img_fwd, txt_fwd = encoders(quant_vars)
    import numpy as np

    img_fwd, img_fallback = _aot_front(
        args, "embed_image", img_fwd, img_fallback,
        (np.zeros((2, args.image_size, args.image_size, 3), np.float32),))
    txt_fwd, txt_fallback = _aot_front(
        args, "embed_text", txt_fwd, txt_fallback,
        (np.zeros((2, args.max_seq_length), np.int32),
         np.asarray([5, 5], np.int32)))
    img_server = BatchServer(img_fwd, max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms,
                             fallback_fn=img_fallback).start()
    txt_server = BatchServer(txt_fwd, max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms,
                             fallback_fn=txt_fallback).start()
    routes = make_retrieval_routes(img_server, txt_server,
                                   word_to_idx=word_to_idx,
                                   max_length=args.max_seq_length)
    # Corpus-side retrieval: /index/add + /search over a device-resident
    # embedding index (atq_tpu/serve/index.py).
    from atq_tpu.serve.http import make_search_routes
    from atq_tpu.serve.index import EmbeddingIndex

    quantize = "int8" if args.index_int8 else "none"
    if args.index_file:
        index = EmbeddingIndex.load(args.index_file, quantize=quantize)
        if index.dim != args.embed_dim:
            raise SystemExit(f"--index_file has dim {index.dim}, model "
                             f"has embed_dim {args.embed_dim}")
    else:
        index = EmbeddingIndex(dim=args.embed_dim, quantize=quantize)
    routes = {**routes, **make_search_routes(index, routes)}
    return routes, [img_server, txt_server]


def main(argv=None):
    args = build_parser().parse_args(argv)

    from atq_tpu.serve.http import make_http_server
    from atq_tpu.train.classifier import load_checkpoint
    from evaluate import resolve_grad_mode

    ckpt = load_checkpoint(args.checkpoint)
    grad_mode = resolve_grad_mode(args.grad_mode, ckpt.get("params", {}))

    # Scanned (--scan_layers) checkpoints serve on the unrolled layout,
    # same as evaluate.py.
    from atq_tpu.nn.transformer import normalize_checkpoint

    ckpt, _ = normalize_checkpoint(ckpt)

    if args.task == "classification":
        routes, servers = build_classifier_routes(args, ckpt, grad_mode)
    else:
        routes, servers = build_retrieval_routes(args, ckpt, grad_mode)

    def stats():
        return {f"server_{i}": s.stats for i, s in enumerate(servers)}

    httpd = make_http_server(routes, host=args.host, port=args.port,
                             stats_fn=stats)
    host, port = httpd.server_address[:2]
    print(json.dumps({"serving": args.task, "host": host, "port": port,
                      "routes": sorted(routes), "packed": args.packed,
                      "grad_mode": grad_mode}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        for s in servers:
            s.stop()


if __name__ == "__main__":
    main()
