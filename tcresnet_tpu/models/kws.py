"""Google KWS baselines (Sainath & Parada 2015 + TF speech_commands).

Reference: /root/reference/audio_nets/kws.py (raw tf.nn implementations).
All weights use truncated-normal init (stddev 0.01, except single_fc's
0.001), biases zeros where present; dropout 0.5 after each ReLU/FC as in
the reference, gated on `training`.

Architectures (kws.py create_model dispatch, :15-63):
  single_fc        — flatten -> dense (kws.py:66-95)
  conv             — "cnn-trad-fpool3-ish": 20x8/64 SAME conv + 2x2
                     maxpool + 10x4/64 SAME conv + fc (:98-201)
  trad_fpool3      — exact paper net: VALID convs, 1x3 freq maxpool,
                     low-rank lin(32) -> fc(128) -> fc, all bias-free
                     (:204-290)
  low_latency_conv — time-spanning Tx8/186 VALID conv + 3 biased FCs
                     (:293-405)
  one_fstride4     — exact paper net: Tx8/186 conv stride 4 in freq,
                     bias-free lin(32)+fc(128)x2 (:408-487)
  low_latency_svdf — rank-2 SVDF (1280 units): per-frame frequency
                     filters then per-filter time filters; training path
                     here, streaming runtime state in serve/streaming
                     (:490-678)
  tiny_conv        — 10x8/8 stride-2 conv + fc (:681-757)

Input is the [B, T, F, 1] feature map from the shared front end; each
architecture reshapes/flattens as the reference does from its
"fingerprint".
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tcresnet_tpu.models import layers

KWS_ARCHITECTURES = (
    "single_fc",
    "conv",
    "low_latency_conv",
    "one_fstride4",
    "trad_fpool3",
    "low_latency_svdf",
    "tiny_conv",
)

_init = layers.truncated_normal(stddev=0.01)
_init_fc = layers.truncated_normal(stddev=0.001)


class KWSNet(nn.Module):
    num_classes: int
    architecture: str = "conv"
    dtype: Optional[Any] = None

    def _drop(self, x, training):
        return layers.dropout(x, keep_prob=0.5, training=training)

    def _dense(self, x, features, name, use_bias=True, init=_init):
        return nn.Dense(
            features, use_bias=use_bias, kernel_init=init, dtype=self.dtype, name=name
        )(x)

    def _conv(self, x, features, kernel, stride, padding, name, use_bias=True):
        return nn.Conv(
            features,
            kernel_size=kernel,
            strides=stride,
            padding=padding,
            use_bias=use_bias,
            kernel_init=_init,
            dtype=self.dtype,
            name=name,
        )(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        arch = self.architecture
        if arch not in KWS_ARCHITECTURES:
            raise ValueError(
                f"Unknown KWS architecture {arch!r}; choose from {KWS_ARCHITECTURES}"
            )
        b, t, f, c = x.shape
        assert c == 1
        dispatch = {
            "single_fc": self._single_fc,
            "conv": self._conv_model,
            "low_latency_conv": self._low_latency_conv,
            "one_fstride4": self._one_fstride4,
            "trad_fpool3": self._trad_fpool3,
            "low_latency_svdf": self._low_latency_svdf,
            "tiny_conv": self._tiny_conv,
        }
        logits = dispatch[arch](x, training)
        return logits.astype(jnp.float32)

    # -- single_fc (kws.py:66-95) --------------------------------------
    def _single_fc(self, x, training):
        flat = x.reshape(x.shape[0], -1)
        return self._dense(flat, self.num_classes, "fc", init=_init_fc)

    # -- conv (kws.py:98-201) ------------------------------------------
    def _conv_model(self, x, training):
        x = nn.relu(self._conv(x, 64, (20, 8), (1, 1), "SAME", "conv1"))
        x = self._drop(x, training)
        x = layers.max_pool(x, (2, 2), (2, 2), "SAME")
        x = nn.relu(self._conv(x, 64, (10, 4), (1, 1), "SAME", "conv2"))
        x = self._drop(x, training)
        flat = x.reshape(x.shape[0], -1)
        return self._dense(flat, self.num_classes, "fc")

    # -- trad_fpool3 (kws.py:204-290) ------------------------------------
    def _trad_fpool3(self, x, training):
        x = nn.relu(self._conv(x, 64, (20, 8), (1, 1), "VALID", "conv1", use_bias=False))
        x = self._drop(x, training)
        x = layers.max_pool(x, (1, 3), (1, 3), "VALID")
        x = nn.relu(self._conv(x, 64, (10, 4), (1, 1), "VALID", "conv2", use_bias=False))
        x = self._drop(x, training)
        flat = x.reshape(x.shape[0], -1)
        lin = self._dense(flat, 32, "lin", use_bias=False)
        fc1 = self._dense(lin, 128, "fc1", use_bias=False)
        return self._dense(fc1, self.num_classes, "fc2", use_bias=False)

    # -- low_latency_conv (kws.py:293-405) -------------------------------
    def _low_latency_conv(self, x, training):
        t = x.shape[1]
        x = nn.relu(self._conv(x, 186, (t, 8), (1, 1), "VALID", "conv1"))
        x = self._drop(x, training)
        flat = x.reshape(x.shape[0], -1)
        x = self._dense(flat, 128, "fc1")
        x = self._drop(x, training)
        x = self._dense(x, 128, "fc2")
        x = self._drop(x, training)
        return self._dense(x, self.num_classes, "fc3")

    # -- one_fstride4 (kws.py:408-487) -----------------------------------
    def _one_fstride4(self, x, training):
        t = x.shape[1]
        x = nn.relu(
            self._conv(x, 186, (t, 8), (1, 4), "VALID", "conv1", use_bias=False)
        )
        x = self._drop(x, training)
        flat = x.reshape(x.shape[0], -1)
        lin = self._dense(flat, 32, "lin", use_bias=False)
        fc1 = self._dense(lin, 128, "fc1", use_bias=False)
        fc1 = self._drop(fc1, training)
        fc2 = self._dense(fc1, 128, "fc2", use_bias=False)
        fc2 = self._drop(fc2, training)
        return self._dense(fc2, self.num_classes, "fc3", use_bias=False)

    # -- low_latency_svdf (kws.py:490-678), training path ----------------
    def _low_latency_svdf(self, x, training):
        b, t, f, _ = x.shape
        rank, num_units = 2, 1280
        num_filters = rank * num_units
        frames = x[..., 0]  # [B, T, F]

        # Frequency filters: per-frame projection F -> num_filters
        # (reference conv1d with stride F == frame-wise matmul, kws.py:583-596).
        w_freq = self.param("weights_frequency", _init, (f, num_filters))
        acts = jnp.einsum(
            "btf,fk->btk", frames, w_freq, preferred_element_type=jnp.float32
        )  # [B, T, num_filters]

        # Time filters: per-filter dot over time (kws.py:607-616).
        w_time = self.param("weights_time", _init, (num_filters, t))
        out = jnp.einsum(
            "btk,kt->bk", acts, w_time, preferred_element_type=jnp.float32
        )  # [B, num_filters]

        # Sum the `rank` outputs per unit (kws.py:617-625: filter index is
        # unit-major, i.e. k = u * rank + r).
        units = out.reshape(b, num_units, rank).sum(axis=-1)

        bias = self.param("bias", nn.initializers.zeros, (num_units,))
        x = nn.relu(units + bias)
        x = self._drop(x, training)
        x = self._dense(x, 256, "fc1")
        x = self._drop(x, training)
        x = self._dense(x, 256, "fc2")
        x = self._drop(x, training)
        return self._dense(x, self.num_classes, "fc3")

    # -- tiny_conv (kws.py:681-757) --------------------------------------
    def _tiny_conv(self, x, training):
        x = nn.relu(self._conv(x, 8, (10, 8), (2, 2), "SAME", "conv1"))
        x = self._drop(x, training)
        flat = x.reshape(x.shape[0], -1)
        return self._dense(flat, self.num_classes, "fc")
