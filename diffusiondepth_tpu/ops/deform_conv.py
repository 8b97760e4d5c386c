"""Deformable convolution family (DCN v1/v2), TPU-native.

Replaces the reference's vendored CUDA extension
(src/model/deformconv/src/cuda/modulated_deform_conv_cuda.cu:100-121 forward;
bilinear sampler modulated_deform_im2col_cuda.cuh:24-54) with a JAX
composition: per-tap bilinear gathers build the deformable im2col columns,
then one grouped einsum on the MXU performs the GEMM. Because the bilinear
sampling is written in differentiable ops, jax.grad yields ALL the hand-coded
CUDA backward kernels for free — input grads, weight grads, and the offset
coordinate grads (the reference needed ~1,450 LoC of CUDA for these,
modulated_deform_im2col_cuda.cuh:57-120).

Offset/mask channel conventions match torch DCNv2 exactly (per deformable
group, per tap k: offset[..., 2k] = dy, offset[..., 2k+1] = dx), so reference
checkpoints convert without reshuffling. Everything is NHWC with static
shapes; the K×C column tensor is XLA-fusable (for NLSPN, C == 1, so columns
are tiny).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .msda import bilinear_sample_nhwc


def _out_size(size: int, k: int, stride: int, pad: int, dil: int) -> int:
    return (size + 2 * pad - (dil * (k - 1) + 1)) // stride + 1


def deform_im2col(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    kernel: Tuple[int, int],
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Deformable im2col: returns columns (B, Ho, Wo, K, C).

    x:      (B, H, W, C)
    offset: (B, Ho, Wo, dg*K*2)   (dy, dx) pairs per tap, per deform group
    mask:   (B, Ho, Wo, dg*K) modulation, or None (DCN v1)
    """
    b, h, w, c = x.shape
    kh, kw = kernel
    K = kh * kw
    dg = deformable_groups
    ho = _out_size(h, kh, stride, padding, dilation)
    wo = _out_size(w, kw, stride, padding, dilation)
    assert offset.shape == (b, ho, wo, dg * K * 2), (
        offset.shape, (b, ho, wo, dg * K * 2))
    assert c % dg == 0

    # base sampling grid: (Ho, Wo, K)
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,kh,1)
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo, K)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo, K)

    off = offset.reshape(b, ho, wo, dg, K, 2).astype(jnp.float32)
    ys = base_y[None, :, :, None, :] + off[..., 0]  # (B, Ho, Wo, dg, K)
    xs = base_x[None, :, :, None, :] + off[..., 1]

    cols = []
    cpg = c // dg
    for g in range(dg):
        img = x[..., g * cpg : (g + 1) * cpg]
        q_y = ys[:, :, :, g].reshape(b, ho * wo * K)
        q_x = xs[:, :, :, g].reshape(b, ho * wo * K)
        sampled = bilinear_sample_nhwc(img, q_x, q_y)  # (B, Ho*Wo*K, cpg)
        cols.append(sampled.reshape(b, ho, wo, K, cpg))
    col = jnp.concatenate(cols, axis=-1) if dg > 1 else cols[0]

    if mask is not None:
        # modulation applies to the deform group's channel slice
        m = mask.reshape(b, ho, wo, dg, K).transpose(0, 1, 2, 4, 3)  # (...,K,dg)
        col = col.reshape(b, ho, wo, K, dg, cpg) * m[..., None]
        col = col.reshape(b, ho, wo, K, dg * cpg)
    return col


def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """DCNv2 forward (reference ModulatedDeformConvFunction.apply,
    src/model/modulated_deform_conv_func.py:15-36).

    weight: (kh, kw, Cin // groups, Cout) HWIO.
    Returns (B, Ho, Wo, Cout).
    """
    kh, kw, cin_g, cout = weight.shape
    col = deform_im2col(
        x, offset, mask, (kh, kw), stride, padding, dilation, deformable_groups
    )  # (B, Ho, Wo, K, Cin)
    b, ho, wo, K, cin = col.shape
    assert cin == cin_g * groups

    w = weight.reshape(kh * kw, cin_g, cout)
    if groups == 1:
        out = jnp.einsum("bhwkc,kcf->bhwf", col, w)
    else:
        col_g = col.reshape(b, ho, wo, K, groups, cin_g)
        w_g = w.reshape(K, cin_g, groups, cout // groups)
        out = jnp.einsum("bhwkgc,kcgf->bhwgf", col_g, w_g)
        out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """DCN v1 (no modulation; reference deform_conv_cuda.cu)."""
    kh, kw = weight.shape[0], weight.shape[1]
    col = deform_im2col(
        x, offset, None, (kh, kw), stride, padding, dilation, deformable_groups
    )
    b, ho, wo, K, cin = col.shape
    cin_g, cout = weight.shape[2], weight.shape[3]
    w = weight.reshape(kh * kw, cin_g, cout)
    if groups == 1:
        out = jnp.einsum("bhwkc,kcf->bhwf", col, w)
    else:
        col_g = col.reshape(b, ho, wo, K, groups, cin_g)
        w_g = w.reshape(K, cin_g, groups, cout // groups)
        out = jnp.einsum("bhwkgc,kcgf->bhwgf", col_g, w_g).reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def deform_psroi_pooling(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    offset: Optional[jnp.ndarray],
    out_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    gamma: float = 0.1,
) -> jnp.ndarray:
    """Deformable position-sensitive RoI pooling
    (reference deform_psroi_pooling_cuda.cu; unused by both reference models
    but part of the native-op surface).

    x:      (B, H, W, C) with C = out_size^2 * c_out (position-sensitive maps)
    rois:   (R, 5) [batch_idx, x1, y1, x2, y2]
    offset: (R, out_size, out_size, 2) normalized part offsets or None
    Returns (R, out_size, out_size, c_out).
    """
    b, h, w, c = x.shape
    p = out_size
    c_out = c // (p * p)
    r = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - 0.5
    y1 = rois[:, 2] * spatial_scale - 0.5
    x2 = rois[:, 3] * spatial_scale - 0.5
    y2 = rois[:, 4] * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    bin_w = roi_w / p  # (R,)
    bin_h = roi_h / p
    s = sampling_ratio

    # sample grid inside each bin: (p, p, s, s)
    iy = (jnp.arange(p)[:, None, None, None]
          + (jnp.arange(s)[None, None, :, None] + 0.5) / s)
    ix = (jnp.arange(p)[None, :, None, None]
          + (jnp.arange(s)[None, None, None, :] + 0.5) / s)
    iy = jnp.broadcast_to(iy, (p, p, s, s))
    ix = jnp.broadcast_to(ix, (p, p, s, s))

    ys = y1[:, None, None, None, None] + iy[None] * bin_h[:, None, None, None, None]
    xs = x1[:, None, None, None, None] + ix[None] * bin_w[:, None, None, None, None]
    if offset is not None:
        ys = ys + gamma * roi_h[:, None, None, None, None] * offset[..., 1][..., None, None]
        xs = xs + gamma * roi_w[:, None, None, None, None] * offset[..., 0][..., None, None]

    # gather per-roi from its batch image; position-sensitive channel select
    x_ps = x.reshape(b, h, w, p * p, c_out)
    out = []
    for pi in range(p):
        for pj in range(p):
            img = x_ps[:, :, :, pi * p + pj]  # (B, H, W, c_out)
            img_r = img[batch_idx]  # (R, H, W, c_out)
            q_y = ys[:, pi, pj].reshape(r, s * s)
            q_x = xs[:, pi, pj].reshape(r, s * s)
            sampled = bilinear_sample_nhwc(img_r, q_x, q_y)  # (R, s*s, c_out)
            out.append(jnp.mean(sampled, axis=1))
    return jnp.stack(out, axis=1).reshape(r, p, p, c_out)
