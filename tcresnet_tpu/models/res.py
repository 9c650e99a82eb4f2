"""Res family (Tang & Lin "honk" deep residual KWS nets).

Reference: /root/reference/audio_nets/res.py. Semantics:
  - all convs 3x3 stride 1, `num_channels` wide (45, narrow 19), SAME,
    xavier init, NO bias, activation ReLU, NO inline normalizer
    (Res_arg_scope, res.py:105-123);
  - batch norms are separate layers with center=False scale=False
    (stats only, no learnable params), decay 0.997;
  - block = [conv->relu->BN, conv->relu] + residual add, then BN
    (res.py:42-54);
  - Res8: 6 layers + front 4x3/1 VALID avg-pool; Res15: 13 layers
    (6 blocks + trailing conv) with dilation rate 2^(layer_idx//3)
    (res.py:9-16);
  - head: global avg pool -> 1x1 conv fc (no bias) (res.py:61-64).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tcresnet_tpu.models import layers


class ResKWS(nn.Module):
    num_classes: int
    num_layers: int
    num_channels: int
    pool_size: Optional[tuple] = None  # e.g. (4, 3)
    use_dilation: bool = False
    bn_momentum: Optional[float] = None  # None -> reference decay 0.997
    dtype: Optional[Any] = None
    # "xla" (lax.conv, the measured winner by 15-30x) or "im2col"
    # (layers.Im2ColConv, a tested alternative — see its docstring for
    # the measured negative). Identical math + params either way.
    conv_backend: str = "xla"

    def _conv_relu(self, x, idx: int, training: bool):
        rate = 2 ** (idx // 3) if self.use_dilation else 1
        x = layers.slim_conv(
            x,
            self.num_channels,
            (3, 3),
            (1, 1),
            kernel_dilation=(rate, rate),
            name=f"conv{idx}",
            dtype=self.dtype,
            conv_backend=self.conv_backend,
        )
        return nn.relu(x)

    def _bn(self, x, name: str, training: bool):
        # center=False scale=False: running stats only (res.py:106-112).
        return layers.slim_batch_norm(
            x,
            training=training,
            name=name,
            momentum=0.997 if self.bn_momentum is None else self.bn_momentum,
            center=False,
            scale=False,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = nn.relu(
            layers.slim_conv(
                x, self.num_channels, (3, 3), (1, 1), name="f_conv",
                dtype=self.dtype, conv_backend=self.conv_backend,
            )
        )

        if self.pool_size is not None:
            x = layers.avg_pool_valid(x, self.pool_size, (1, 1))

        num_blocks = self.num_layers // 2
        idx = 0
        for i in range(num_blocks):
            shortcut = x
            y = self._conv_relu(x, idx, training)
            y = self._bn(y, f"conv{idx}_bn", training)
            idx += 1
            y = self._conv_relu(y, idx, training)
            idx += 1
            x = self._bn(y + shortcut, f"conv{2 * i + 1}_bn", training)

        if self.num_layers % 2 != 0:
            x = self._conv_relu(x, idx, training)
            x = self._bn(x, f"conv{idx}_bn", training)

        x = layers.global_avg_pool(x)
        logits = nn.Dense(
            self.num_classes,
            use_bias=False,
            kernel_init=layers.glorot_uniform(),
            dtype=self.dtype,
            name="fc",
        )(x)
        return logits.astype(jnp.float32)


def res8(num_classes: int, **kw) -> ResKWS:
    return ResKWS(num_classes=num_classes, num_layers=6, num_channels=45,
                  pool_size=(4, 3), use_dilation=False, **kw)


def res8_narrow(num_classes: int, **kw) -> ResKWS:
    return ResKWS(num_classes=num_classes, num_layers=6, num_channels=19,
                  pool_size=(4, 3), use_dilation=False, **kw)


def res15(num_classes: int, **kw) -> ResKWS:
    return ResKWS(num_classes=num_classes, num_layers=13, num_channels=45,
                  pool_size=None, use_dilation=True, **kw)


def res15_narrow(num_classes: int, **kw) -> ResKWS:
    return ResKWS(num_classes=num_classes, num_layers=13, num_channels=19,
                  pool_size=None, use_dilation=True, **kw)
