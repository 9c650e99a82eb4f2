#!/usr/bin/env python
"""Probe which frame-assembly patterns Mosaic accepts on real TPU.

The radix-4 kernel tail needs [tb, frames, fft=512] windowed frames
assembled from overlapping [tb, n_hops, hop=160] rows (boundaries at
160/320/480 — not lane-aligned). The naive minor-dim concat of
middle-sliced parts died with "result/input offset mismatch on
non-concat dimension". Each probe is one candidate assembly, checked
for compile + value correctness vs numpy.
"""
from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcresnet_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, NH, HOP, FRAMES, K, FFT = 4, 12, 160, 10, 3, 512


def want(h):
    """numpy oracle: [tb, nh, hop] -> [tb, frames, fft] frames."""
    out = np.zeros((TB, FRAMES, FFT), np.float32)
    for f in range(FRAMES):
        for j in range(K):
            out[:, f, j * HOP : (j + 1) * HOP] = h[:, f + j, :]
    return out


def k_concat_roll0(h_ref, o_ref):
    # sublane-offset-0 parts via roll on axis=1, then minor concat
    h = h_ref[:]
    parts = [
        pltpu.roll(h, (NH - j) % NH, 1)[:, :FRAMES, :] for j in range(K)
    ]
    parts.append(jnp.zeros((TB, FRAMES, FFT - K * HOP), jnp.float32))
    o_ref[:] = jnp.concatenate(parts, axis=-1)


def k_dus(h_ref, o_ref):
    # dynamic_update_slice into a zeros frame buffer
    h = h_ref[:]
    acc = jnp.zeros((TB, FRAMES, FFT), jnp.float32)
    for j in range(K):
        acc = jax.lax.dynamic_update_slice(
            acc, h[:, j : j + FRAMES, :], (0, 0, j * HOP)
        )
    o_ref[:] = acc


def k_sublane(h_ref, o_ref):
    # positions on SUBLANES: build [FFT, TB*FRAMES] then transpose out.
    # sublane-dim concat at arbitrary offsets may be implemented where
    # the lane-dim one is not.
    h = h_ref[:]  # [TB, NH, HOP]
    ht = jnp.transpose(h, (2, 1, 0))  # [HOP, NH, TB] (minor transpose? no:
    # this moves the minor dim — may itself be illegal; probe tells us)
    parts = [
        ht[:, j : j + FRAMES, :].reshape(HOP, FRAMES * TB)
        for j in range(K)
    ]
    parts.append(jnp.zeros((FFT - K * HOP, FRAMES * TB), jnp.float32))
    fr = jnp.concatenate(parts, axis=0)  # [FFT, FRAMES*TB]
    o_ref[:] = jnp.transpose(fr.reshape(FFT, FRAMES, TB), (2, 1, 0))


def k_concat_copy(h_ref, o_ref):
    # force a fresh layout via an elementwise op Mosaic won't elide
    h = h_ref[:]
    parts = [
        jnp.where(True, h[:, j : j + FRAMES, :], 0.0) for j in range(K)
    ]
    parts.append(jnp.zeros((TB, FRAMES, FFT - K * HOP), jnp.float32))
    o_ref[:] = jnp.concatenate(parts, axis=-1)


def k_pad_roll(h_ref, o_ref):
    # zero-pad each part to FFT lanes at offset 0, lane-roll into place
    h = h_ref[:]
    acc = None
    for j in range(K):
        part = h[:, j : j + FRAMES, :]
        p = jnp.pad(part, ((0, 0), (0, 0), (0, FFT - HOP)))
        p = pltpu.roll(p, j * HOP, 2) if j else p
        acc = p if acc is None else acc + p
    o_ref[:] = acc


def k_naive(h_ref, o_ref):
    # the shipped (failing) pattern, for reference
    h = h_ref[:]
    parts = [h[:, j : j + FRAMES, :] for j in range(K)]
    parts.append(jnp.zeros((TB, FRAMES, FFT - K * HOP), jnp.float32))
    o_ref[:] = jnp.concatenate(parts, axis=-1)


def k_concat_aligned(h_ref, o_ref):
    # the radix-4 butterfly pattern on a [R, FFT] value: vreg-aligned
    # lane-block slices (offsets 0/128/256/384), adds, then minor concat
    # at 128-aligned boundaries — ALL operands sublane-offset 0
    h = h_ref[:]  # [TB, NH, HOP]
    fr = h[:, :FRAMES, :].astype(jnp.float32)
    fr = jnp.dot(
        fr.reshape(TB * FRAMES, HOP),
        jnp.ones((HOP, FFT), jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [TB*FRAMES, FFT] canonical layout from the MXU
    b0 = fr[:, 0:128]
    b1 = fr[:, 128:256]
    b2 = fr[:, 256:384]
    b3 = fr[:, 384:512]
    u0 = b0 + b1 + b2 + b3
    u1 = jnp.concatenate([b0 - b2, b3 - b1], axis=-1)  # [R, 256]
    u2 = b0 - b1 + b2 - b3
    out = jnp.concatenate([u0, u1, u2], axis=-1)  # [R, 512] at 128/384
    o_ref[:] = out.reshape(TB, FRAMES, FFT)


def want_concat_aligned(h):
    fr = h[:, :FRAMES, :].astype(np.float32).reshape(TB * FRAMES, HOP)
    fr = fr @ np.ones((HOP, FFT), np.float32)
    b0, b1, b2, b3 = (fr[:, 128 * i : 128 * (i + 1)] for i in range(4))
    out = np.concatenate(
        [b0 + b1 + b2 + b3, b0 - b2, b3 - b1, b0 - b1 + b2 - b3], axis=-1
    )
    return out.reshape(TB, FRAMES, FFT)


def k_frame_rows(a_ref, o_ref):
    # [1, N] flat audio ref -> [FRAMES, FFT] frame rows via axis-0
    # concat of overlapping FFT-lane slices (hops-kernel assembly
    # pattern), tail masked to the true window length
    rows = [a_ref[0:1, f * HOP : f * HOP + FFT] for f in range(FRAMES)]
    fr = jnp.concatenate(rows, axis=0)  # [FRAMES, FFT]
    mask = jax.lax.broadcasted_iota(jnp.int32, (FRAMES, FFT), 1) < K * HOP
    o_ref[:] = jnp.where(mask, fr, 0.0)


def want_frame_rows(a):
    flat = a.reshape(-1)
    out = np.zeros((FRAMES, FFT), np.float32)
    for f in range(FRAMES):
        out[f, : K * HOP] = flat[f * HOP : f * HOP + K * HOP]
    return out


def k_frame_rows2(a_ref, o_ref):
    # _hops_from_lanes op sequence, generalized to OVERLAPPING frames:
    # [nb, R, 128] lane-major audio -> [nb, FRAMES, FFT] frame rows.
    # Per frame: 3D slice -> 2D reshape -> minor concat; frames stacked
    # on axis 1. Tail positions beyond the audio come from a zeros seg.
    blocks = a_ref[:]  # [TB, R, 128]
    nb, rows, lanes = blocks.shape
    valid = rows * lanes
    frames_out = []
    for f in range(FRAMES):
        segs = []
        pos = f * HOP
        end = pos + FFT
        while pos < end:
            if pos >= valid:
                segs.append(jnp.zeros((nb, end - pos), jnp.float32))
                break
            ir, lane = pos // lanes, pos % lanes
            width = min(lanes - lane, end - pos, valid - pos)
            seg = blocks[:, ir : ir + 1, lane : lane + width]
            segs.append(seg.reshape(nb, width))
            pos += width
        fr = jnp.concatenate(segs, axis=-1) if len(segs) > 1 else segs[0]
        frames_out.append(fr.reshape(nb, 1, FFT))
    o_ref[:] = jnp.concatenate(frames_out, axis=1)


def want_frame_rows2(a):
    nb = a.shape[0]
    flat = a.reshape(nb, -1)
    valid = flat.shape[1]
    out = np.zeros((nb, FRAMES, FFT), np.float32)
    for f in range(FRAMES):
        end = min(f * HOP + FFT, valid)
        out[:, f, : end - f * HOP] = flat[:, f * HOP : end]
    return out


def _asm(blocks, width_out, stride, n_frames, allow_tail=True):
    nb, rows, lanes = blocks.shape
    valid = rows * lanes
    frames_out = []
    for f in range(n_frames):
        segs = []
        pos = f * stride
        end = pos + width_out
        while pos < end:
            if pos >= valid:
                assert allow_tail
                segs.append(jnp.zeros((nb, end - pos), jnp.float32))
                break
            ir, lane = pos // lanes, pos % lanes
            width = min(lanes - lane, end - pos, valid - pos)
            seg = blocks[:, ir : ir + 1, lane : lane + width]
            segs.append(seg.reshape(nb, width))
            pos += width
        fr = jnp.concatenate(segs, axis=-1) if len(segs) > 1 else segs[0]
        frames_out.append(fr.reshape(nb, 1, width_out))
    return jnp.concatenate(frames_out, axis=1)


def _want_asm(a, width_out, stride, n_frames):
    nb = a.shape[0]
    flat = a.reshape(nb, -1)
    valid = flat.shape[1]
    out = np.zeros((nb, n_frames, width_out), np.float32)
    for f in range(n_frames):
        end = min(f * stride + width_out, valid)
        out[:, f, : end - f * stride] = flat[:, f * stride : end]
    return out


def make_width_probe(width_out, n_frames, matmul=False):
    def kern(a_ref, o_ref):
        fr = _asm(a_ref[:], width_out, HOP, n_frames)
        if matmul:
            nb = fr.shape[0]
            eye = jax.lax.broadcasted_iota(
                jnp.int32, (width_out, width_out), 0
            ) == jax.lax.broadcasted_iota(
                jnp.int32, (width_out, width_out), 1
            )
            o_ref[:] = jnp.dot(
                fr.reshape(nb * n_frames, width_out),
                eye.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).reshape(nb, n_frames, width_out)
        else:
            o_ref[:] = fr

    def oracle(a):
        return _want_asm(a, width_out, HOP, n_frames)

    return kern, oracle


def _strided_block(x2, stride, offset, lanes=128):
    """[R, 128] lane-major samples -> [n_out, 128] rows at positions
    offset + stride*f, via superblock (lcm(stride, lanes)) slicing.
    Cross-superblock segs read a leading-SHIFTED blocks view (leading
    slices keep tile offsets at 0). Returns as many full rows as the
    superblock structure covers: orp * (nb - 1).
    """
    import math as _math

    rows, ln = x2.shape
    per = stride * ln // _math.gcd(stride, ln)  # lcm
    rpp = per // ln
    orp = per // stride
    nb = rows // rpp
    blocks = x2[: nb * rpp].reshape(nb, rpp, ln)
    cur = blocks[:-1]  # [nb-1, rpp, ln]
    nxt = blocks[1:]  # rows rpp..2rpp-1 of each superblock window
    out_res = []
    for r in range(orp):
        segs = []
        pos = offset + stride * r
        end = pos + ln
        while pos < end:
            ir, lane = pos // ln, pos % ln
            width = min(ln - lane, end - pos)
            src = cur if ir < rpp else nxt
            ir2 = ir if ir < rpp else ir - rpp
            seg = src[:, ir2 : ir2 + 1, lane : lane + width]
            segs.append(seg.reshape(nb - 1, width))
            pos += width
        row = jnp.concatenate(segs, axis=-1) if len(segs) > 1 else segs[0]
        out_res.append(row.reshape(nb - 1, 1, ln))
    return jnp.concatenate(out_res, axis=1).reshape((nb - 1) * orp, ln)


def k_butterfly_blocks(a_ref, o_ref):
    # full radix-4 front: four strided block assemblies + window +
    # butterfly; output [nf, 512] = [u0 | u1re | u1im | u2]
    x2 = a_ref[:]  # [R, 128]
    nf = o_ref.shape[0]
    bs = [_strided_block(x2, HOP, 128 * i)[:nf] for i in range(4)]
    b0, b1, b2, b3 = bs
    u0 = b0 + b1 + b2 + b3
    u1 = jnp.concatenate([b0 - b2, b3 - b1], axis=-1)
    u2 = b0 - b1 + b2 - b3
    o_ref[:] = jnp.concatenate([u0, u1, u2], axis=-1)


def want_butterfly_blocks(a):
    flat = a.reshape(-1)
    nf = (flat.shape[0] // (HOP * 4) - 1) * 4
    fr = np.zeros((nf, FFT), np.float32)
    for f in range(nf):
        fr[f] = flat[f * HOP : f * HOP + FFT]
    b0, b1, b2, b3 = (fr[:, 128 * i : 128 * (i + 1)] for i in range(4))
    return np.concatenate(
        [b0 + b1 + b2 + b3, b0 - b2, b3 - b1, b0 - b1 + b2 - b3], axis=-1
    )


def run(name, kern, oracle=want):
    if name == "frame_rows":
        n = (FRAMES - 1) * HOP + FFT
        h = np.random.RandomState(0).randn(1, n).astype(np.float32)
        out_shape = jax.ShapeDtypeStruct((FRAMES, FFT), jnp.float32)
    elif name == "frame_rows2":
        h = np.random.RandomState(0).randn(TB, NH * HOP // 128, 128)
        h = h.astype(np.float32)
        out_shape = jax.ShapeDtypeStruct((TB, FRAMES, FFT), jnp.float32)
    elif name == "butterfly_blocks":
        h = np.random.RandomState(0).randn(20, 128).astype(np.float32)
        out_shape = jax.ShapeDtypeStruct((12, FFT), jnp.float32)
    elif name.startswith("w"):
        width = int(name[1:].rstrip("m"))
        n_frames = (NH * HOP - width) // HOP  # no zeros tail needed
        kern, oracle = make_width_probe(
            width, n_frames, matmul=name.endswith("m"))
        h = np.random.RandomState(0).randn(TB, NH * HOP // 128, 128)
        h = h.astype(np.float32)
        out_shape = jax.ShapeDtypeStruct(
            (TB, n_frames, width), jnp.float32)
    else:
        h = np.random.RandomState(0).randn(TB, NH, HOP).astype(np.float32)
        out_shape = jax.ShapeDtypeStruct((TB, FRAMES, FFT), jnp.float32)
    try:
        out = pl.pallas_call(kern, out_shape=out_shape)(jnp.asarray(h))
        out = np.asarray(out)
        err = np.abs(out - oracle(h)).max()
        print(f"{name}: OK max|err|={err:.2e}", flush=True)
    except Exception as e:
        lines = [
            ln for ln in str(e).split("\n")
            if "Not implemented" in ln or "not supported" in ln
            or "Mosaic failed" in ln or "Internal:" in ln
        ]
        msg = " | ".join(ln.strip()[:200] for ln in lines[:2]) or str(e)[:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    table = {
        "naive": (k_naive, want),
        "concat_roll0": (k_concat_roll0, want),
        "concat_copy": (k_concat_copy, want),
        "pad_roll": (k_pad_roll, want),
        "dus": (k_dus, want),
        "sublane": (k_sublane, want),
        "concat_aligned": (k_concat_aligned, want_concat_aligned),
        "frame_rows": (k_frame_rows, want_frame_rows),
        "frame_rows2": (k_frame_rows2, want_frame_rows2),
        "butterfly_blocks": (k_butterfly_blocks, want_butterfly_blocks),
    }
    names = sys.argv[1:] or list(table)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        kern, oracle = table.get(n, (None, None))
        run(n, kern, oracle)
