"""Functional NN primitives on pytree parameters.

TPU-first design notes:
  * activations are kept in channels-last [B, T, C] so every conv lowers
    to an MXU-tiled `lax.conv_general_dilated` with ('NWC','WIO','NWC')
    dimension numbers -- no transposes in the hot path (the reference
    shuttles between [B,C,T] and [B,T,C] constantly, e.g.
    `efficient_tts.py:144-148`).
  * weight normalization (torch `weight_norm` with dim=0,
    `efts_modules.py:74-75`) is carried as an explicit {v, g}
    reparametrization; `fold_weight_norm` collapses it for inference.
  * params are plain nested dicts -- transparent to jax.tree_util,
    orbax checkpointing, and sharding-rule pattern matching.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# initializers


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """He/kaiming uniform with a=sqrt(5), matching torch's default conv/linear
    init (gain for leaky_relu(a=sqrt(5)) => bound = 1/sqrt(fan_in) * sqrt(3) * gain)."""
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def normal_init(key, shape, std=0.01, dtype=jnp.float32):
    """N(0, std) used by HiFi-GAN (`vocoders/utils.py:22`)."""
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# linear


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    return {
        "w": kaiming_uniform(kw, (in_dim, out_dim), in_dim, dtype),
        "b": _bias_uniform(kb, (out_dim,), in_dim, dtype),
    }


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(
        x, params["w"].astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return y + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# embedding


def embedding_init(key, num_embeddings: int, dim: int, dtype=jnp.float32) -> dict:
    return {"table": jax.random.normal(key, (num_embeddings, dim), dtype)}


def embedding(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


# ---------------------------------------------------------------------------
# conv1d (channels-last)


def conv1d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int,
    dtype=jnp.float32,
    init: str = "torch",
    init_std: float = 0.01,
) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_size
    shape = (kernel_size, in_ch, out_ch)  # WIO
    if init == "torch":
        w = kaiming_uniform(kw, shape, fan_in, dtype)
    elif init == "normal":
        w = normal_init(kw, shape, init_std, dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": _bias_uniform(kb, (out_ch,), fan_in, dtype)}


def conv1d(
    params: dict,
    x: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    padding="SAME",
    groups: int = 1,
) -> jnp.ndarray:
    """[B, T, Cin] -> [B, T', Cout]; padding 'SAME' == torch (k-1)//2*dilation
    for odd kernels."""
    w = params["w"]
    if isinstance(padding, str) and padding == "SAME":
        k = w.shape[0]
        pad = (k - 1) // 2 * dilation
        padding = [(pad, pad)]
    elif isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        # MXU accumulates f32 internally regardless of output dtype; a
        # f32 preferred_element_type breaks the conv transpose (autodiff)
        # rule for bf16 operands, so outputs stay in the compute dtype.
        preferred_element_type=x.dtype,
    )
    return y + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# conv2d (channels-last, NHWC) — used by the multi-period discriminators


def conv2d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: tuple,
    dtype=jnp.float32,
    init: str = "torch",
) -> dict:
    kw, kb = jax.random.split(key)
    kh, kww = kernel_size
    fan_in = in_ch * kh * kww
    shape = (kh, kww, in_ch, out_ch)  # HWIO
    if init == "torch":
        w = kaiming_uniform(kw, shape, fan_in, dtype)
    else:
        w = normal_init(kw, shape, 0.01, dtype)
    return {"w": w, "b": _bias_uniform(kb, (out_ch,), fan_in, dtype)}


def conv2d(
    params: dict,
    x: jnp.ndarray,
    stride: tuple = (1, 1),
    padding: tuple = (0, 0),
) -> jnp.ndarray:
    """[B, H, W, Cin] -> [B, H', W', Cout] with symmetric torch-style padding."""
    w = params["w"]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y + params["b"].astype(x.dtype)


def avg_pool1d(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """torch AvgPool1d(count_include_pad=True) on [B, T, C]."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    return s / float(window)


# ---------------------------------------------------------------------------
# transposed conv1d (channels-last)


def conv_transpose1d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int,
    dtype=jnp.float32,
    init: str = "torch",
    init_std: float = 0.01,
) -> dict:
    kw, kb = jax.random.split(key)
    # torch ConvTranspose1d fan_in = out_ch * kernel_size (weight [in, out, k])
    fan_in = out_ch * kernel_size
    shape = (kernel_size, in_ch, out_ch)  # WIO for lax.conv_transpose
    if init == "torch":
        w = kaiming_uniform(kw, shape, fan_in, dtype)
    elif init == "normal":
        w = normal_init(kw, shape, init_std, dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": _bias_uniform(kb, (out_ch,), fan_in, dtype)}


def conv_transpose1d(
    params: dict, x: jnp.ndarray, stride: int, padding: int
) -> jnp.ndarray:
    """[B, T, Cin] -> [B, T*stride(+...), Cout], matching torch semantics:
    out_len = (T-1)*stride - 2*padding + kernel_size.

    Lowered as input dilation (`lhs_dilation=stride`) so XLA maps it onto
    the same conv path as the forward convs -- the canonical TPU lowering
    for HiFi-GAN's upsampling stack (`hifigan_model.py:104-131`).
    """
    w = params["w"]
    k = w.shape[0]
    # conv with lhs dilation: effective torch padding -> lax low/high padding
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, 0).astype(x.dtype),  # transpose conv = flipped-kernel corr
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    return y + params["b"].astype(x.dtype)


def subpixel_transpose_weight(w: jnp.ndarray, stride: int, padding: int):
    """Sub-pixel reformulation of a transposed-conv weight — exact.

    For output position o with phase f = o mod s and row j = o // s,
    torch's ConvTranspose1d is

        y[j*s + f] = sum_m x[j + (f+p)//s - m] . w[(f+p) mod s + m*s]
                   = sum_t x[j + t - (k_eff-1)] . Wt[t, :, f*Cout:]

    with Wt[t, ci, f*Cout+co] = w[f + p + (k_eff-1-t)*s, ci, co] (zero
    outside [0, k)), k_eff = ceil(k/s), window k_eff+1. I.e. the whole
    op is ONE dense (k_eff+1)-tap correlation producing s*Cout channels
    whose depth-to-space reshape is *contiguous* (no relayout, no slice)
    whenever k - 2*padding == s, which holds for every HiFi-GAN V1
    upsample (k=16,s=8,p=4 and k=4,s=2,p=1).

    Returns (Wt [k_eff+1, Cin, s*Cout], pad (k_eff-1, 1)).
    """
    k, cin, cout = w.shape
    s = stride
    if k - 2 * padding != s:
        raise ValueError(
            f"aligned sub-pixel form needs k - 2p == s, got k={k} s={s} p={padding}"
        )
    k_eff = -(-k // s)
    tap = (
        np.arange(s)[None, :]
        + padding
        + (k_eff - 1 - np.arange(k_eff + 1))[:, None] * s
    )  # [k_eff+1, s]
    valid = (tap >= 0) & (tap < k)
    wt = jnp.where(
        jnp.asarray(valid)[:, :, None, None], w[np.clip(tap, 0, k - 1)], 0
    )  # [k_eff+1, s, Cin, Cout]
    wt = wt.transpose(0, 2, 1, 3).reshape(k_eff + 1, cin, s * cout)
    return wt, (k_eff - 1, 1)


def conv_transpose1d_subpixel(
    params: dict, x: jnp.ndarray, stride: int, padding: int
) -> jnp.ndarray:
    """`conv_transpose1d` evaluated in sub-pixel form (see
    `subpixel_transpose_weight`) — exact, and dense on the MXU where the
    input-dilated lowering contracts s-1 zeros per input sample (XLA does
    not skip them: measured at the 16-tap FLOP count for k=16, s=8).
    Pure jnp ops, so autodiff works."""
    w = params["w"]  # [k, Cin, Cout]
    s = stride
    cout = w.shape[-1]
    wt, (lo, hi) = subpixel_transpose_weight(w, s, padding)
    z = jax.lax.conv_general_dilated(
        x,
        wt.astype(x.dtype),
        window_strides=(1,),
        padding=[(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )  # [B, T, s*Cout]
    b, n, _ = z.shape
    y = z.reshape(b, n * s, cout)
    return y + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# weight norm


def weight_norm_init(params: dict, preserved_axis: int = -1) -> dict:
    """Wrap a conv/linear param dict into weight-norm form {v, g, b}.

    torch `weight_norm(dim=0)` normalizes per slice of weight dim 0:
    per *output* channel for Conv1d/Linear ([out, ...] layouts), but per
    *input* channel for ConvTranspose1d ([in, out, k]). In our WIO/[in,out]
    layouts that is `preserved_axis=-1` for conv/linear and
    `preserved_axis=1` for transposed convs. The reduction axes are
    recorded structurally: `g` keeps a broadcastable shape with size 1 on
    every reduced axis, so `weight_norm_kernel` needs no side metadata.
    """
    w = params["w"]
    preserved_axis = preserved_axis % w.ndim
    axes = tuple(i for i in range(w.ndim) if i != preserved_axis)
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    return {"v": w, "g": g, "b": params["b"]}


def weight_norm_kernel(params: dict, eps: float = 0.0) -> jnp.ndarray:
    """Materialize w = g * v / ||v||, reducing over the axes where g has
    size 1 (see `weight_norm_init`)."""
    v = params["v"]
    g = params["g"]
    axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + eps)
    return g * v / norm


def fold_weight_norm(params):
    """Recursively collapse every {v, g, b} into a plain {w, b} pytree.

    Counterpart of the reference `remove_weight_norm`
    (`efficient_tts.py:400-409`) used before inference."""
    if isinstance(params, dict):
        if "v" in params and "g" in params:
            return {"w": weight_norm_kernel(params), "b": params["b"]}
        return {k: fold_weight_norm(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fold_weight_norm(v) for v in params)
    return params


def maybe_wn_kernel(params: dict) -> dict:
    """Return {'w','b'} whether params are weight-normed or plain."""
    if "v" in params and "g" in params:
        return {"w": weight_norm_kernel(params), "b": params["b"]}
    return params


# ---------------------------------------------------------------------------
# normalization & activations


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """LayerNorm over the last (channel) axis; eps matches the reference
    `LayerNorm(nout, eps=1e-12)` (`layer_norm.py:17`)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
