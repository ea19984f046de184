"""Reference (PyTorch) checkpoint -> pytree parameter conversion.

Maps the reference `EfficientTTSCNN` state_dict layout
(`/root/reference/nntts/models/efficient_tts.py:26-118`, checkpoints saved
as {"model": state_dict, ...} by `trainers/efficient_tts_trainer.py:78-99`)
onto this framework's pytree layout:

  torch conv1d weight  [out, in, k]  -> WIO [k, in, out]
  torch linear weight  [out, in]     -> [in, out]
  weight-norm (g [out,1,1], v [out,in,k]) -> {g: [out], v: [k,in,out]}
  LayerNorm weight/bias -> {scale, bias}

Also converts HiFi-GAN generator checkpoints
(`/root/reference/nntts/vocoders/hifigan_model.py:95-145`).
"""

from __future__ import annotations

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """[out, in, k] -> [k, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d weight [in, out, k] -> [k, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


def _linear(sd: dict, prefix: str) -> dict:
    return {
        "w": np.ascontiguousarray(sd[prefix + ".weight"].T),
        "b": sd[prefix + ".bias"],
    }


def _wn_conv(sd: dict, prefix: str) -> dict:
    """Weight-normed conv -> {v, g, b}; g broadcast-shaped [1, 1, out]."""
    return {
        "v": _conv_w(sd[prefix + ".weight_v"]),
        "g": sd[prefix + ".weight_g"].reshape(1, 1, -1),
        "b": sd[prefix + ".bias"],
    }


def _plain_conv(sd: dict, prefix: str) -> dict:
    return {"w": _conv_w(sd[prefix + ".weight"]), "b": sd[prefix + ".bias"]}


def _res_block(sd: dict, prefix: str, n_layers: int) -> dict:
    layers = []
    for i in range(n_layers):
        conv_prefix = f"{prefix}.layers.{i}.conv.0"
        if conv_prefix + ".weight_v" in sd:
            layers.append(_wn_conv(sd, conv_prefix))
        else:
            layers.append(_plain_conv(sd, conv_prefix))
    return {"layers": layers}


def efts_cnn_from_state_dict(sd: dict, cfg) -> dict:
    """Reference EfficientTTSCNN state_dict (numpy values) -> pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "text_embedding": {"table": sd["text_embedding_table.weight"]},
        "text_encoder": _res_block(sd, "text_encoder", cfg.n_text_encoder_layer),
        "text_key": _linear(sd, "text_encoder_key"),
        "mel_prenet": _linear(sd, "mel_prenet.0"),
        "mel_encoder": _res_block(sd, "mel_encoder", cfg.n_mel_encoder_layer),
        "decoder": _res_block(sd, "decoder", cfg.n_decoder_layer),
        "mel_out": _linear(sd, "mel_output_layer"),
        "duration_predictor": _duration_predictor(sd, "duration_predictor", cfg.n_duration_layer),
    }
    if not cfg.share_text_encoder_key_value:
        params["text_value"] = _linear(sd, "text_encoder_value")
    if cfg.use_mel_query_fc:
        params["mel_query_fc"] = _linear(sd, "mel_query_fc")
    return params


def _duration_predictor(sd: dict, prefix: str, n_layers: int) -> dict:
    convs, norms = [], []
    for i in range(n_layers):
        convs.append(_plain_conv(sd, f"{prefix}.conv.{i}.0"))
        norms.append(
            {
                "scale": sd[f"{prefix}.conv.{i}.2.weight"],
                "bias": sd[f"{prefix}.conv.{i}.2.bias"],
            }
        )
    return {"convs": convs, "norms": norms, "out": _linear(sd, f"{prefix}.linear")}


# ---------------------------------------------------------------------------
# HiFi-GAN generator (`hifigan_model.py:95-145`)


def hifigan_generator_from_state_dict(sd: dict, cfg) -> dict:
    """Reference HiFi-GAN generator state_dict -> pytree.

    Handles both weight-normed ('.weight_v/.weight_g') and folded
    ('.weight') checkpoints.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv(prefix, transposed=False):
        conv_fn = _convT_w if transposed else _conv_w
        if prefix + ".weight_v" in sd:
            # torch weight_norm(dim=0): per-out for Conv1d ([out,in,k]),
            # per-IN for ConvTranspose1d ([in,out,k]); in WIO layout the
            # preserved axis is -1 (out) resp. 1 (in), recorded in g's shape.
            g = sd[prefix + ".weight_g"]
            g = g.reshape(1, g.size, 1) if transposed else g.reshape(1, 1, g.size)
            return {
                "v": conv_fn(sd[prefix + ".weight_v"]),
                "g": g,
                "b": sd[prefix + ".bias"],
            }
        return {"w": conv_fn(sd[prefix + ".weight"]), "b": sd[prefix + ".bias"]}

    n_ups = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    params = {
        "conv_pre": conv("conv_pre"),
        "ups": [conv(f"ups.{i}", transposed=True) for i in range(n_ups)],
        "resblocks": [],
        "conv_post": conv("conv_post"),
    }
    for i in range(n_ups * n_kernels):
        n_dil = len(cfg.resblock_dilation_sizes[i % n_kernels])
        if cfg.resblock == "1":
            block = {
                "convs1": [conv(f"resblocks.{i}.convs1.{j}") for j in range(n_dil)],
                "convs2": [conv(f"resblocks.{i}.convs2.{j}") for j in range(n_dil)],
            }
        else:
            block = {"convs": [conv(f"resblocks.{i}.convs.{j}") for j in range(n_dil)]}
        params["resblocks"].append(block)
    return params


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference trainer checkpoint (`torch.save` .pkl) on host.

    Returns {"model": {name: np.ndarray}, "steps": int, "epochs": int}.
    Optimizer/scheduler state is torch-specific and not convertible.
    """
    import torch  # host-only dependency, never in the device path

    state = torch.load(path, map_location="cpu", weights_only=False)
    # trainer checkpoints use {"model": sd}; HiFi-GAN generator files use
    # {"generator": sd} (`hifigan_model.py:25`)
    model_sd = state
    for key in ("model", "generator"):
        if isinstance(state, dict) and key in state:
            model_sd = state[key]
            break
    out = {k: v.detach().cpu().numpy() for k, v in model_sd.items()}
    return {
        "model": out,
        "steps": int(state.get("steps", 0)) if isinstance(state, dict) else 0,
        "epochs": int(state.get("epochs", 0)) if isinstance(state, dict) else 0,
    }


# ---------------------------------------------------------------------------
# HiFi-GAN discriminators (MPD/MSD): torch state_dict -> pytrees, enabling
# warm-starting the GAN trainer from discriminators trained with the
# official torch recipe (`hifigan_model.py:148-268`; the reference ships
# the modules but no trainer)


def _wn_conv2d(sd: dict, prefix: str) -> dict:
    """torch weight-normed Conv2d [out, in, kh, kw] -> HWIO {v, g, b}."""
    return {
        "v": np.ascontiguousarray(
            np.transpose(sd[prefix + ".weight_v"], (2, 3, 1, 0))
        ),
        "g": np.asarray(sd[prefix + ".weight_g"]).reshape(1, 1, 1, -1),
        "b": np.asarray(sd[prefix + ".bias"]),
    }


def _sn_conv1d(sd: dict, prefix: str) -> dict:
    """torch spectral-normed Conv1d -> {w_orig, u, v, b}.

    torch's power-iteration matrix is weight.view(out, in*k) (in-major
    flattening); ours is the WIO reshape [k*in] (k-major), so the stored
    right-singular vector is permuted accordingly — sigma and the
    normalized kernel are invariant to the consistent reordering."""
    w = np.asarray(sd[prefix + ".weight_orig"])  # [out, in, k]
    out_ch, in_ch, k = w.shape
    v_t = np.asarray(sd[prefix + ".weight_v"])  # [in*k], in-major
    return {
        "w_orig": np.ascontiguousarray(np.transpose(w, (2, 1, 0))),
        "u": np.asarray(sd[prefix + ".weight_u"]),
        "v": np.ascontiguousarray(v_t.reshape(in_ch, k).T.ravel()),
        "b": np.asarray(sd[prefix + ".bias"]),
    }


def hifigan_mpd_from_state_dict(sd: dict, n_convs: int = 5) -> dict:
    """`MultiPeriodDiscriminator.state_dict()` -> `init_mpd`-shaped pytree
    (5 period discriminators x (5 convs + conv_post), all weight-normed)."""
    discs = []
    for i in range(5):
        discs.append(
            {
                "convs": [
                    _wn_conv2d(sd, f"discriminators.{i}.convs.{j}")
                    for j in range(n_convs)
                ],
                "conv_post": _wn_conv2d(sd, f"discriminators.{i}.conv_post"),
            }
        )
    return {"discriminators": discs}


def hifigan_msd_from_state_dict(sd: dict, n_convs: int = 7) -> dict:
    """`MultiScaleDiscriminator.state_dict()` -> `init_msd`-shaped pytree
    (3 scale discriminators x (7 convs + conv_post); the first is
    spectral-normed, `hifigan_model.py:243`)."""
    discs = []
    for i in range(3):
        conv = _sn_conv1d if i == 0 else _wn_conv
        discs.append(
            {
                "convs": [
                    conv(sd, f"discriminators.{i}.convs.{j}")
                    for j in range(n_convs)
                ],
                "conv_post": conv(sd, f"discriminators.{i}.conv_post"),
            }
        )
    return {"discriminators": discs}
