"""TC-ResNet family: temporal convolutions with frequency-as-channels.

Reference: /root/reference/audio_nets/tc_resnet.py. Core idea (tc_resnet.py:17):
the [B, L, C, 1] feature map is viewed as [B, L, 1, C] so the MFCC axis
becomes channels and all convs are k x 1 *temporal* convolutions — on TPU
these lower to MXU matmuls over (time x channels) panels.

Architecture parity (tc_resnet.py:6-54):
  conv0 3x1 -> n_blocks residual blocks (9x1 conv stride s + 9x1 conv,
  1x1 stride-2 downsample shortcut when channels change, ReLU after add)
  -> global avg pool -> dropout -> linear classifier (no bias).
All convs are conv-BN-ReLU (fused BN semantics, decay 0.997, center+scale,
xavier init, no conv bias) via the arg_scope at tc_resnet.py:102-123.

Documented deviation (SURVEY.md 7.5): the dead `fc2`/"ranges" head
(tc_resnet.py:50-52, unused by any loss) is omitted — param counts are
reference minus 2*C_last (96 for TCResNet8-1.0).

Variants:
  TCResNet8  — blocks=3, channels [16,24,32,48]*wm        (tc_resnet.py:57-62)
  TCResNet14 — blocks=6, channels [16,24,24,32,32,48,48]*wm (:65-70)
  ResNet2D8[Pool] — 2D 3x3 debug variants, first-layer channels chosen to
  equalize FLOPs (:73-99).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tcresnet_tpu.models import layers


class TCResNet(nn.Module):
    num_classes: int
    n_blocks: int
    n_channels: Tuple[int, ...]  # width multiplier already applied
    debug_2d: bool = False
    pool: Optional[Tuple[Tuple[int, int], int]] = None  # (window, stride)
    dropout_keep_prob: float = 0.5
    bn_momentum: Optional[float] = None  # None -> reference decay 0.997
    dtype: Optional[Any] = None
    # "xla" | "pallas" | "pallas-interpret": temporal-conv implementation
    # (ops/pallas/tconv.py custom fwd+bwd kernels when "pallas*")
    conv_backend: str = "xla"

    def _conv_bn(self, x, features, kernel, stride, name, training, relu=True):
        x = layers.slim_conv(
            x, features, kernel, stride, name=f"{name}_conv", dtype=self.dtype,
            conv_backend=self.conv_backend,
        )
        x = layers.slim_batch_norm(
            x, training=training, name=f"{name}_bn",
            momentum=0.997 if self.bn_momentum is None else self.bn_momentum,
            dtype=self.dtype,
        )
        return nn.relu(x) if relu else x

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        assert self.n_blocks == len(self.n_channels) - 1
        if self.debug_2d:
            first_kernel = kernel = (3, 3)
        else:
            b, length, coeffs, ch = x.shape
            assert ch == 1, "temporal variant expects [B, L, C, 1] features"
            # [B, L, C, 1] -> [B, L, 1, C]: frequency becomes channels
            # (reference tc_resnet.py:17 reshape — identical element order).
            x = x.reshape(b, length, 1, coeffs)
            first_kernel, kernel = (3, 1), (9, 1)

        x = self._conv_bn(x, self.n_channels[0], first_kernel, (1, 1), "conv0", training)

        if self.pool is not None:
            window, stride = self.pool
            x = layers.avg_pool_valid(x, window, (stride, stride))

        for i, n in enumerate(self.n_channels[1:]):
            if n != x.shape[-1]:
                stride = (2, 2) if self.debug_2d else (2, 1)
                shortcut = self._conv_bn(
                    x, n, (1, 1), stride, f"block{i}_down", training
                )
            else:
                stride = (1, 1)
                shortcut = x
            y = self._conv_bn(x, n, kernel, stride, f"block{i}_conv0", training)
            y = self._conv_bn(y, n, kernel, (1, 1), f"block{i}_conv1", training, relu=False)
            x = nn.relu(y + shortcut)

        x = layers.global_avg_pool(x)
        x = layers.dropout(x, keep_prob=self.dropout_keep_prob, training=training)
        # 1x1 conv "fc" on the pooled map == Dense; no bias (arg_scope sets
        # biases_initializer=None, tc_resnet.py:47,116).
        logits = nn.Dense(
            self.num_classes,
            use_bias=False,
            kernel_init=layers.glorot_uniform(),
            dtype=self.dtype,
            name="fc",
        )(x)
        return logits.astype(jnp.float32)


def _scaled(channels, wm: float) -> Tuple[int, ...]:
    return tuple(int(c * wm) for c in channels)


def tc_resnet8(num_classes: int, width_multiplier: float = 1.0, **kw) -> TCResNet:
    return TCResNet(
        num_classes=num_classes,
        n_blocks=3,
        n_channels=_scaled((16, 24, 32, 48), width_multiplier),
        **kw,
    )


def tc_resnet14(num_classes: int, width_multiplier: float = 1.0, **kw) -> TCResNet:
    return TCResNet(
        num_classes=num_classes,
        n_blocks=6,
        n_channels=_scaled((16, 24, 24, 32, 32, 48, 48), width_multiplier),
        **kw,
    )


def _first_c_2d(num_coeffs: int, c1: int, c2: int) -> int:
    """FLOPs-equalizing first-layer width (reference tc_resnet.py:79-82)."""
    return int((3 * num_coeffs * c1 + 10 * c1 * c2) / (9 + 10 * c2))


def resnet2d8(
    num_classes: int, width_multiplier: float = 1.0, *, num_coeffs: int = 40, **kw
) -> TCResNet:
    ch = list(_scaled((16, 24, 32, 48), width_multiplier))
    ch[0] = _first_c_2d(num_coeffs, ch[0], ch[1])
    return TCResNet(
        num_classes=num_classes, n_blocks=3, n_channels=tuple(ch), debug_2d=True, **kw
    )


def resnet2d8_pool(
    num_classes: int, width_multiplier: float = 1.0, *, num_coeffs: int = 40, **kw
) -> TCResNet:
    ch = list(_scaled((16, 24, 32, 48), width_multiplier))
    ch[0] = _first_c_2d(num_coeffs, ch[0], ch[1])
    return TCResNet(
        num_classes=num_classes,
        n_blocks=3,
        n_channels=tuple(ch),
        debug_2d=True,
        pool=((4, 4), 4),
        **kw,
    )
