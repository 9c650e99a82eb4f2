"""DS-CNN family (ARM "Hello Edge" depthwise-separable KWS CNNs).

Reference: /root/reference/audio_nets/ds_cnn.py. Semantics:
  - block DSL: one standard 10x4 conv (stride 2x2 for S, 2x1 for M/L),
    then 4-5 depthwise-separable blocks (ds_cnn.py:20-43);
  - conv layers: xavier init, bias ZEROS (kept), activation None
    (DSCNN_arg_scope, ds_cnn.py:104-118); each conv followed by BN with
    decay 0.96 and ReLU as the BN activation; slim.batch_norm default
    center=True scale=False;
  - separable block = depthwise(3x3, mult 1) -> BN+ReLU -> pointwise 1x1
    -> BN+ReLU (ds_cnn.py:46-62);
  - head: global avg pool -> squeeze -> fully_connected (with bias,
    activation None) (ds_cnn.py:97-99).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tcresnet_tpu.models import layers


class Block(NamedTuple):
    type: str  # "conv" | "separable"
    depth: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    name: str


S_NET_DEF = (
    Block("conv", 64, (10, 4), (2, 2), "conv_1"),
    Block("separable", 64, (3, 3), (1, 1), "conv_ds_1"),
    Block("separable", 64, (3, 3), (1, 1), "conv_ds_2"),
    Block("separable", 64, (3, 3), (1, 1), "conv_ds_3"),
    Block("separable", 64, (3, 3), (1, 1), "conv_ds_4"),
)

M_NET_DEF = (
    Block("conv", 172, (10, 4), (2, 1), "conv_1"),
    Block("separable", 172, (3, 3), (2, 2), "conv_ds_1"),
    Block("separable", 172, (3, 3), (1, 1), "conv_ds_2"),
    Block("separable", 172, (3, 3), (1, 1), "conv_ds_3"),
    Block("separable", 172, (3, 3), (1, 1), "conv_ds_4"),
)

L_NET_DEF = (
    Block("conv", 276, (10, 4), (2, 1), "conv_1"),
    Block("separable", 276, (3, 3), (2, 2), "conv_ds_1"),
    Block("separable", 276, (3, 3), (1, 1), "conv_ds_2"),
    Block("separable", 276, (3, 3), (1, 1), "conv_ds_3"),
    Block("separable", 276, (3, 3), (1, 1), "conv_ds_4"),
    Block("separable", 276, (3, 3), (1, 1), "conv_ds_5"),
)


class DSCNN(nn.Module):
    num_classes: int
    net_def: Tuple[Block, ...]
    bn_momentum: Optional[float] = None  # None -> reference decay 0.96
    dtype: Optional[Any] = None

    def _bn_relu(self, x, name: str, training: bool):
        x = layers.slim_batch_norm(
            x, training=training, name=name,
            momentum=0.96 if self.bn_momentum is None else self.bn_momentum,
            center=True, scale=False, dtype=self.dtype,
        )
        return nn.relu(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        for block in self.net_def:
            if block.type == "conv":
                x = layers.slim_conv(
                    x, block.depth, block.kernel, block.stride,
                    use_bias=True, name=block.name, dtype=self.dtype,
                )
                x = self._bn_relu(x, f"{block.name}_bn", training)
            elif block.type == "separable":
                channels = x.shape[-1]
                x = layers.slim_conv(
                    x, channels, block.kernel, block.stride,
                    use_bias=True, feature_group_count=channels,
                    name=f"{block.name}_dw", dtype=self.dtype,
                )
                x = self._bn_relu(x, f"{block.name}_dw_bn", training)
                x = layers.slim_conv(
                    x, block.depth, (1, 1), (1, 1),
                    use_bias=True, name=f"{block.name}_pw", dtype=self.dtype,
                )
                x = self._bn_relu(x, f"{block.name}_pw_bn", training)
            else:
                raise ValueError(f"Block type {block.type!r} is not supported")

        x = layers.global_avg_pool(x)
        logits = nn.Dense(
            self.num_classes,
            use_bias=True,
            kernel_init=layers.glorot_uniform(),
            dtype=self.dtype,
            name="fc1",
        )(x)
        return logits.astype(jnp.float32)


def dscnn_s(num_classes: int, **kw) -> DSCNN:
    return DSCNN(num_classes=num_classes, net_def=S_NET_DEF, **kw)


def dscnn_m(num_classes: int, **kw) -> DSCNN:
    return DSCNN(num_classes=num_classes, net_def=M_NET_DEF, **kw)


def dscnn_l(num_classes: int, **kw) -> DSCNN:
    return DSCNN(num_classes=num_classes, net_def=L_NET_DEF, **kw)
