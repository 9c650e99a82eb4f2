"""Model zoo registry.

Replaces the reference's `eval("audio_nets."+args.model)` dispatch
(/root/reference/train_audio.py:32, factory/audio_nets.py:19-32) with an
explicit registry. Every builder takes (ModelConfig, feature_shape) and
returns a flax Module whose __call__(x[B,H,W,1], training) -> logits.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from tcresnet_tpu.config import ModelConfig
from tcresnet_tpu.registry import Registry
from tcresnet_tpu.models import ds_cnn, kws, res, tc_resnet

MODELS: Registry = Registry("model")


def _dtype_of(name: str):
    return {"float32": None, "bfloat16": jnp.bfloat16}[name]


def build_model(
    cfg: ModelConfig, feature_shape: Tuple[int, int, int], compute_dtype: str = "float32"
) -> nn.Module:
    """Instantiate the configured model for a given front-end geometry."""
    return MODELS.get(cfg.name)(cfg, feature_shape, _dtype_of(compute_dtype))


@MODELS.register("TCResNet8")
def _tcresnet8(cfg, shape, dtype):
    return tc_resnet.tc_resnet8(
        cfg.num_classes, cfg.width_multiplier,
        dropout_keep_prob=cfg.dropout_keep_prob, bn_momentum=cfg.bn_momentum,
        dtype=dtype, conv_backend=cfg.conv_backend,
    )


@MODELS.register("TCResNet14")
def _tcresnet14(cfg, shape, dtype):
    return tc_resnet.tc_resnet14(
        cfg.num_classes, cfg.width_multiplier,
        dropout_keep_prob=cfg.dropout_keep_prob, bn_momentum=cfg.bn_momentum,
        dtype=dtype, conv_backend=cfg.conv_backend,
    )


@MODELS.register("ResNet2D8")
def _resnet2d8(cfg, shape, dtype):
    return tc_resnet.resnet2d8(
        cfg.num_classes, cfg.width_multiplier, num_coeffs=shape[1],
        dropout_keep_prob=cfg.dropout_keep_prob, bn_momentum=cfg.bn_momentum,
        dtype=dtype,
    )


@MODELS.register("ResNet2D8Pool")
def _resnet2d8_pool(cfg, shape, dtype):
    return tc_resnet.resnet2d8_pool(
        cfg.num_classes, cfg.width_multiplier, num_coeffs=shape[1],
        dropout_keep_prob=cfg.dropout_keep_prob, bn_momentum=cfg.bn_momentum,
        dtype=dtype,
    )


@MODELS.register("Res8")
def _res8(cfg, shape, dtype):
    return res.res8(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype,
                    conv_backend=cfg.conv_backend)


@MODELS.register("Res8Narrow")
def _res8n(cfg, shape, dtype):
    return res.res8_narrow(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype,
                    conv_backend=cfg.conv_backend)


@MODELS.register("Res15")
def _res15(cfg, shape, dtype):
    return res.res15(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype,
                    conv_backend=cfg.conv_backend)


@MODELS.register("Res15Narrow")
def _res15n(cfg, shape, dtype):
    return res.res15_narrow(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype,
                    conv_backend=cfg.conv_backend)


@MODELS.register("DSCNNS")
def _dscnns(cfg, shape, dtype):
    return ds_cnn.dscnn_s(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype)


@MODELS.register("DSCNNM")
def _dscnnm(cfg, shape, dtype):
    return ds_cnn.dscnn_m(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype)


@MODELS.register("DSCNNL")
def _dscnnl(cfg, shape, dtype):
    return ds_cnn.dscnn_l(cfg.num_classes, bn_momentum=cfg.bn_momentum, dtype=dtype)


@MODELS.register("KWS")
def _kws(cfg, shape, dtype):
    return kws.KWSNet(
        num_classes=cfg.num_classes, architecture=cfg.kws_architecture, dtype=dtype
    )


def param_count(params) -> int:
    """Total trainable parameter count (reference: common/tf_utils.py:40-62
    `show_models`)."""
    import jax

    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def describe_params(params) -> str:
    """Human-readable per-variable shape dump, like `show_models`."""
    import jax

    lines = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        lines.append(f"{name:60s} {str(leaf.shape):20s} {leaf.size}")
    lines.append(f"total: {param_count(params)}")
    return "\n".join(lines)
