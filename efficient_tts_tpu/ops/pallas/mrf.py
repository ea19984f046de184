"""Pallas TPU kernel: fused HiFi-GAN MRF stage (3 parallel ResBlock1s).

STATUS: correct (interpret + TPU, bf16-exact vs the XLA path) but NOT the
production path. Measured on v5e: 36 ms vs 7.4 ms for the XLA
space-to-depth packed lowering (`models/hifigan.py:_resblock1_packed`) on
the 32-channel stage -- Mosaic cannot concatenate misaligned row slices
nor store them to sub-128-lane offsets efficiently, so the im2col here
degrades to per-tap K=C matmuls (1/16 MXU utilization). FROZEN as of
round 2: the Mosaic-friendly successor exists (`mrf_packed.py` -- packed
space-to-depth layout inside the kernel; wins stage 3 standalone and is
in the measured serving table), so this layout will not be iterated
further. The file stays only as the exactness-tested record of WHY the
naive im2col layout loses on Mosaic; `generator()` defaults to the
packed XLA path.

The late HiFi-GAN stages (64/32 channels over 10^5-sample sequences,
`hifigan_model.py:110-131`) are the synthesis hot spot: 18 dilated convs
per stage, each an HBM read+write of the full activation when lowered
individually. This kernel runs an entire MRF stage -- all three
ResBlock1 branches (6 convs each, `hifigan_model.py:31-62`) plus the
1/3-average -- over one VMEM-resident tile:

  * the input tile (plus a static halo covering the receptive field of
    the deepest branch) is DMA'd HBM->VMEM once per grid step;
  * each conv is an im2col matmul: tap slices are materialized into a
    VMEM scratch (Mosaic cannot concatenate row slices with misaligned
    vector layouts, but masked scratch stores are fine), then one
    [L, k*C] x [k*C, C] MXU matmul with f32 accumulation;
  * leaky-ReLU, residual adds and the branch average are fused between
    matmuls; only the center tile is written back.

Activations are channel-padded to 128 lanes at the HBM boundary (DMA
and block shapes require 128-aligned minor dims); weights stay unpadded.
The unfused pipeline zero-pads at every conv, so out-of-sequence
positions are re-zeroed after each bias add ("mask_valid") -- without
this, bias terms leak through the halo and edge outputs drift.

HBM traffic drops from ~38 tensor passes per stage to 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _branch_halo(kernel_size: int, dilations) -> int:
    """One-side receptive-field growth of a ResBlock1 branch: each unit is
    a dilated conv (pad (k-1)/2*d) followed by a d=1 conv (pad (k-1)/2)."""
    half = (kernel_size - 1) // 2
    return sum(half * d + half for d in dilations)


def _leaky(x, slope=0.1):
    # max/min formulation: v5e VPU has no bf16 compare-select
    return jnp.maximum(x, 0) + slope * jnp.minimum(x, 0)


def _mrf_kernel(
    x_hbm,
    *refs,
    kernel_sizes,
    dilation_sizes,
    t_tile: int,
    halo: int,
    channels: int,
    t_total: int,
    dtype,
):
    # refs: per-branch (w_ref [6, k*C, C], b_ref [6, C]) x n_branches,
    # then out_ref, x_scratch, im2col_scratch, dma_sem
    n_branches = len(kernel_sizes)
    w_refs = refs[0 : 2 * n_branches : 2]
    b_refs = refs[1 : 2 * n_branches : 2]
    out_ref = refs[2 * n_branches]
    scratch = refs[2 * n_branches + 1]
    im2col = refs[2 * n_branches + 2]
    sem = refs[2 * n_branches + 3]

    c = channels
    b = pl.program_id(0)
    i = pl.program_id(1)

    t_ext = t_tile + 2 * halo
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * t_tile, t_ext), :], scratch, sem
    )
    dma.start()
    dma.wait()

    tile_start = i * t_tile - halo  # global position of scratch[0]

    def mask_valid(arr, offset_in_ext):
        l = arr.shape[0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) + (
            tile_start + offset_in_ext
        )
        ok = (pos >= 0) & (pos < t_total)
        return arr * ok.astype(arr.dtype)

    def conv(x, w_flat, kernel_size, dilation):
        """x [L, C] -> [L - (k-1)*d, C] via scratch-materialized im2col."""
        l = x.shape[0]
        span = (kernel_size - 1) * dilation
        out_len = l - span
        for tap in range(kernel_size):
            im2col[0:out_len, tap * c : (tap + 1) * c] = x[
                tap * dilation : tap * dilation + out_len, :
            ]
        y = jnp.dot(
            im2col[0:out_len, 0 : kernel_size * c],
            w_flat,
            preferred_element_type=jnp.float32,
        )
        return y.astype(dtype)

    x_full = scratch[:, 0:c]  # [t_ext, C] (drop lane padding)
    acc = None
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        half = (k - 1) // 2
        x_b = x_full
        offset = 0  # left coordinate of x_b within x_full
        for u, d in enumerate(dils):
            w_d = w_refs[j][2 * u]  # [k*C, C]
            w_1 = w_refs[j][2 * u + 1]
            bias_d = b_refs[j][2 * u]
            bias_1 = b_refs[j][2 * u + 1]
            xt = _leaky(x_b)
            xt = conv(xt, w_d, k, d) + bias_d.astype(dtype)
            xt = mask_valid(xt, offset + half * d)
            xt = _leaky(xt)
            xt = conv(xt, w_1, k, 1) + bias_1.astype(dtype)
            shrink = half * d + half
            xt = mask_valid(xt, offset + shrink)
            x_b = (
                jax.lax.slice_in_dim(x_b, shrink, x_b.shape[0] - shrink, axis=0)
                + xt
            )
            offset += shrink
        # center slice [halo, halo + t_tile] in x_full coords
        start = halo - offset
        y = jax.lax.slice_in_dim(x_b, start, start + t_tile, axis=0)
        acc = y if acc is None else acc + y
    out = (acc / n_branches).astype(dtype)
    out_ref[0, :, 0:c] = out
    out_ref[0, :, c:] = jnp.zeros(
        (t_tile, LANES - c), dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilation_sizes", "t_tile", "interpret"),
)
def mrf_stage(
    x: jnp.ndarray,
    weights: tuple,
    biases: tuple,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    t_tile: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MRF stage. x [B, T, C]; weights[j] [6, k_j*C, C] (conv order:
    d-conv, 1-conv per unit); biases[j] [6, C]. Returns [B, T, C]."""
    b, t, c = x.shape
    halo = max(
        _branch_halo(k, d) for k, d in zip(kernel_sizes, dilation_sizes)
    )
    if t % t_tile != 0:
        raise ValueError(f"T={t} not divisible by t_tile={t_tile}")
    # halo-pad T, zero-pad channels to the 128-lane DMA granularity
    x_padded = jnp.pad(x, ((0, 0), (halo, halo), (0, max(0, LANES - c))))

    n_branches = len(kernel_sizes)
    max_kc = max(kernel_sizes) * c
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for _ in range(n_branches):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _mrf_kernel,
        kernel_sizes=kernel_sizes,
        dilation_sizes=dilation_sizes,
        t_tile=t_tile,
        halo=halo,
        channels=c,
        t_total=t,
        dtype=x.dtype,
    )
    args = [x_padded]
    for w, bia in zip(weights, biases):
        args.append(w.astype(x.dtype))
        args.append(bia)

    out = pl.pallas_call(
        kernel,
        grid=(b, t // t_tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, LANES),
            lambda bb, ii: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * halo, LANES), x.dtype),
            pltpu.VMEM((t_tile + 2 * halo, max_kc), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out[:, :, :c]


def pack_resblock_weights(block_params: dict, kernel_size: int, c: int):
    """ResBlock1 param dict -> ([6, k*C, C] weights, [6, C] biases) in the
    kernel's conv order (d-conv, 1-conv per unit)."""
    from efficient_tts_tpu.nn.layers import maybe_wn_kernel

    ws, bs = [], []
    for c1, c2 in zip(block_params["convs1"], block_params["convs2"]):
        for conv_p in (c1, c2):
            kern = maybe_wn_kernel(conv_p)
            ws.append(kern["w"].reshape(kernel_size * c, c))
            bs.append(kern["b"])
    return jnp.stack(ws), jnp.stack(bs)
