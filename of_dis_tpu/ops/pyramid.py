"""Image pyramid + gradient construction, OpenCV-numerics-compatible, in pure JAX.

Reproduces `ConstructImgPyramide` (reference: run_dense.cpp:131-179):
  - per level: x0.5 downscale with cv::INTER_LINEAR semantics (run_dense.cpp:151)
    which at an exact half scale is the 2x2 box mean,
  - 3x3 Sobel dx/dy scaled by 1/8 with BORDER_DEFAULT = reflect-101
    (run_dense.cpp:157-158),
  - border padding by the patch size: replicate for images, zero for gradients
    (run_dense.cpp:167-173),
and the original divisibility padding (run_dense.cpp:299-311).

Layout: images are channel-first (C, H, W); batching is done with vmap at the
model level. All ops are jit-friendly (static shapes).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def _lerp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, cv::INTER_LINEAR
    convention: half-pixel centers, edge clamp. Exact box mean at integer
    downscale factors (e.g. x0.5 -> rows [.., 0.5, 0.5, ..])."""
    m = np.zeros((n_out, n_in), np.float32)
    x = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    x0 = np.floor(x).astype(np.int64)
    f = (x - x0).astype(np.float32)
    i0 = np.clip(x0, 0, n_in - 1)
    i1 = np.clip(x0 + 1, 0, n_in - 1)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), 1.0 - f)
    np.add.at(m, (rows, i1), f)
    return m


def _box_matrix(n_in: int, k: int) -> np.ndarray:
    """(n_in/k, n_in) k-tap box-mean matrix (the product of log2(k)
    successive x0.5 INTER_LINEAR halvings; entries 1/k are exact in bf16
    for power-of-two k)."""
    n_out = n_in // k
    m = np.zeros((n_out, n_in), np.float32)
    for j in range(k):
        m[np.arange(n_out), np.arange(n_out) * k + j] = 1.0 / k
    return m


def _bf16_exact(m: np.ndarray) -> bool:
    import ml_dtypes
    return bool(np.all(m.astype(ml_dtypes.bfloat16).astype(np.float32) == m))


def _contract(eq: str, img: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """einsum(eq, img, m) with m a constant interpolation matrix. When m is
    exactly bf16-representable, run as two bf16 MXU dots on a hi/lo split
    of the image (f32 values reconstruct through the f32 accumulator);
    ~8x the f32 matmul rate, which dominates the full-res pyramid
    contraction.

    uint8/bfloat16 images (the native format of the reference's PNG inputs,
    run_dense.cpp:209-210 — cv::imread yields CV_8U) are bf16-exact, so the
    `lo` correction dot is skipped entirely: its full-resolution stream was
    the single largest HBM read of the whole op-2 pipeline, and a u8 input
    array is 4x smaller in HBM than the f32 it replaces. Bit-identical to
    the f32 path for integer-valued inputs (the lo dot contributes exact
    +0.0s there)."""
    if _bf16_exact(m):
        mb = jnp.asarray(m).astype(jnp.bfloat16)
        hi = img.astype(jnp.bfloat16)
        if img.dtype in (jnp.uint8, jnp.bfloat16):
            return jnp.einsum(eq, hi, mb,
                              preferred_element_type=jnp.float32)
        lo = (img - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.einsum(eq, hi, mb,
                           preferred_element_type=jnp.float32)
                + jnp.einsum(eq, lo, mb,
                             preferred_element_type=jnp.float32))
    return jnp.einsum(eq, img.astype(jnp.float32), jnp.asarray(m),
                      precision="highest")


def _resize_mm(img: jnp.ndarray, out_h: int, out_w: int,
               box: int = 0) -> jnp.ndarray:
    """Resize (C, H, W) as two constant-matrix contractions.

    box=k uses the k-tap box-mean matrices (== a chain of x0.5
    INTER_LINEAR halvings); box=0 uses the bilinear cv::INTER_LINEAR
    matrix. out[c,i,j] = sum_{h,w} Mh[i,h] img[c,h,w] Mw[j,w], horizontal
    first — cv::resize's evaluation order. Matmuls keep canonical layouts;
    the strided-slice / 5-D-reshape formulations force XLA into full
    relayout copies of every level (measured ~9ms per full-res Sintel
    batch)."""
    c, h, w = img.shape
    if box:
        mh, mw = _box_matrix(h, box), _box_matrix(w, box)
    else:
        mh, mw = _lerp_matrix(out_h, h), _lerp_matrix(out_w, w)
    t = _contract("chw,jw->chj", img, mw)
    return _contract("chj,ih->cij", t, mh)


def pad_to_divisible(img: jnp.ndarray, lv_f: int) -> jnp.ndarray:
    """Replicate-pad (C,H,W) so H and W divide 2^lv_f (run_dense.cpp:299-311).

    Padding split: floor(pad/2) before, ceil(pad/2) after, per axis.
    """
    c, h, w = img.shape
    scfct = 2 ** lv_f
    padw = (scfct - w % scfct) % scfct
    padh = (scfct - h % scfct) % scfct
    if padw == 0 and padh == 0:
        return img
    return jnp.pad(
        img,
        ((0, 0), (padh // 2, padh - padh // 2), (padw // 2, padw - padw // 2)),
        mode="edge",
    )


def halve(img: jnp.ndarray) -> jnp.ndarray:
    """x0.5 downscale, cv::INTER_LINEAR-exact for even sizes: 2x2 box mean.

    cv::resize with fx=fy=0.5 maps dst(i,j) to src(2i+0.5, 2j+0.5): the mean of
    the 2x2 source block (run_dense.cpp:151).
    """
    c, h, w = img.shape
    x = img[:, : (h // 2) * 2, : (w // 2) * 2]
    return _resize_mm(x, h // 2, w // 2)


def _sep_filter_reflect101(img: jnp.ndarray, kh: Tuple[float, float, float],
                           kv: Tuple[float, float, float]) -> jnp.ndarray:
    """Separable 3-tap filter with reflect-101 border on a (C,H,W) image.

    kh applies along W, kv along H. reflect-101 == numpy/jnp 'reflect' mode
    (edge pixel not repeated), matching cv::BORDER_DEFAULT.
    """
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    # vertical (H axis)
    v = kv[0] * p[:, :-2, :] + kv[1] * p[:, 1:-1, :] + kv[2] * p[:, 2:, :]
    # horizontal (W axis)
    out = kh[0] * v[:, :, :-2] + kh[1] * v[:, :, 1:-1] + kh[2] * v[:, :, 2:]
    return out


def sobel_dx(img: jnp.ndarray) -> jnp.ndarray:
    """cv::Sobel(dx=1, ksize=3, scale=1/8, BORDER_DEFAULT): [-1,0,1] x [1,2,1]^T / 8."""
    return _sep_filter_reflect101(img, (-1.0 / 8.0, 0.0, 1.0 / 8.0), (1.0, 2.0, 1.0))


def sobel_dy(img: jnp.ndarray) -> jnp.ndarray:
    """cv::Sobel(dy=1, ksize=3, scale=1/8, BORDER_DEFAULT): [1,2,1] x [-1,0,1]^T / 8."""
    return _sep_filter_reflect101(img, (1.0, 2.0, 1.0), (-1.0 / 8.0, 0.0, 1.0 / 8.0))


def pad_border(img: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Pad (C,H,W) by `pad` on all sides; mode 'edge' (images) or zero (gradients)."""
    if mode == "edge":
        return jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="constant")


def build_pyramid(img: jnp.ndarray, lv_f: int, pad: int, getgrad: bool = True,
                  lv_l: int = 0
                  ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
    """Construct padded image + gradient pyramids (run_dense.cpp:131-179).

    `img` is the divisibility-padded full-resolution (C,H,W) float32 image.
    Returns (imgs, dxs, dys) lists indexed by level 0..lv_f, each entry padded
    by `pad` on all sides (replicate for img, zeros for gradients).

    Levels below `lv_l` (never visited by the coarse-to-fine loop when the
    finest computed scale is lv_l > 0) get None entries: at op-point 2 the
    unused full-resolution Sobel + border pads would otherwise dominate the
    pyramid's memory and bandwidth.
    """
    c, h, w = img.shape
    k = 2 ** lv_l
    if lv_l > 0 and h % k == 0 and w % k == 0:
        # jump straight to the first used level: a chain of x0.5 halvings
        # is the 2^lv_l-tap box mean (identical up to f32 rounding), and
        # the one-shot contraction skips the unused full-res intermediate
        # levels entirely (the L0->L1 halve alone is ~40% of pyramid time).
        # A u8/bf16 img feeds the contraction directly (see _contract);
        # level 0 itself is never consumed here (lv < lv_l -> None).
        levels = [img] + [None] * lv_l
        levels[lv_l] = _resize_mm(img, h // k, w // k, box=k)
        for _ in range(lv_f - lv_l):
            levels.append(halve(levels[-1]))
    else:
        # level 0 is a consumed pyramid entry: downstream stages expect f32
        levels = [img.astype(jnp.float32)]
        for _ in range(lv_f):
            levels.append(halve(levels[-1]))
    imgs, dxs, dys = [], [], []
    for lv in range(lv_f + 1):
        if lv < lv_l:
            imgs.append(None)
            dxs.append(None)
            dys.append(None)
            continue
        base = levels[lv]
        imgs.append(pad_border(base, pad, "edge"))
        if getgrad:
            dxs.append(pad_border(sobel_dx(base), pad, "zero"))
            dys.append(pad_border(sobel_dy(base), pad, "zero"))
        else:
            dxs.append(None)
            dys.append(None)
    return imgs, dxs, dys


def gradient_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Gradient-magnitude input mode (reference: run_dense.cpp:139-148,
    SELECTCHANNEL==2): sqrt(sobel_dx^2 + sobel_dy^2) of the raw image."""
    dx = sobel_dx(img)
    dy = sobel_dy(img)
    return jnp.sqrt(dx * dx + dy * dy)


def resize_linear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv::INTER_LINEAR-compatible resize of a (C,H,W) image.

    Half-pixel-center bilinear with edge clamping — matches OpenCV for
    upscaling and for the final flow rescale (run_dense.cpp:408-412).
    """
    return _resize_mm(img, out_h, out_w)
