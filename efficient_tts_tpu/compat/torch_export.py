"""Pytree parameters -> reference PyTorch state_dict (inverse of
`torch_import.py`), for interoperability with the reference tooling
(e.g. synthesizing through the reference inference script with weights
trained here). Produces numpy arrays keyed by the reference's names;
wrap with `torch.from_numpy` to load into the torch modules.
"""

from __future__ import annotations

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """WIO [k, in, out] -> torch [out, in, k]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _linear(sd: dict, prefix: str, p: dict) -> None:
    sd[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    sd[prefix + ".bias"] = np.asarray(p["b"])


def _conv(sd: dict, prefix: str, p: dict) -> None:
    if "v" in p:
        sd[prefix + ".weight_v"] = _conv_w(p["v"])
        sd[prefix + ".weight_g"] = np.asarray(p["g"]).reshape(-1, 1, 1)
        sd[prefix + ".bias"] = np.asarray(p["b"])
    else:
        sd[prefix + ".weight"] = _conv_w(p["w"])
        sd[prefix + ".bias"] = np.asarray(p["b"])


def efts_cnn_to_state_dict(params: dict, cfg) -> dict:
    """Inverse of `torch_import.efts_cnn_from_state_dict`."""
    sd: dict = {}
    sd["text_embedding_table.weight"] = np.asarray(params["text_embedding"]["table"])
    for name, n_layers in [
        ("text_encoder", cfg.n_text_encoder_layer),
        ("mel_encoder", cfg.n_mel_encoder_layer),
        ("decoder", cfg.n_decoder_layer),
    ]:
        for i in range(n_layers):
            _conv(sd, f"{name}.layers.{i}.conv.0", params[name]["layers"][i])
    _linear(sd, "text_encoder_key", params["text_key"])
    if "text_value" in params:
        _linear(sd, "text_encoder_value", params["text_value"])
    _linear(sd, "mel_prenet.0", params["mel_prenet"])
    if "mel_query_fc" in params:
        _linear(sd, "mel_query_fc", params["mel_query_fc"])
    _linear(sd, "mel_output_layer", params["mel_out"])
    dp = params["duration_predictor"]
    for i, (conv_p, norm_p) in enumerate(zip(dp["convs"], dp["norms"])):
        _conv(sd, f"duration_predictor.conv.{i}.0", conv_p)
        sd[f"duration_predictor.conv.{i}.2.weight"] = np.asarray(norm_p["scale"])
        sd[f"duration_predictor.conv.{i}.2.bias"] = np.asarray(norm_p["bias"])
    _linear(sd, "duration_predictor.linear", dp["out"])
    return sd


def _convT_w(w: np.ndarray) -> np.ndarray:
    """WIO [k, in, out] -> torch ConvTranspose1d [in, out, k]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 2, 0)))


def hifigan_generator_to_state_dict(params: dict, cfg) -> dict:
    """Inverse of `torch_import.hifigan_generator_from_state_dict`: export
    a generator trained here (the reference ships no vocoder trainer) to
    the official HiFi-GAN `generator_v1` state_dict layout
    (`/root/reference/nntts/vocoders/hifigan_model.py:95-145`), weight-
    normed ('.weight_v/.weight_g') or folded ('.weight') per the pytree.
    Wrap values with `torch.from_numpy` and save as {"generator": sd} for
    `load_hifigan_generator` (`hifigan_model.py:18-28`)."""
    sd: dict = {}

    def put_transposed(prefix, p):
        # torch weight_norm(dim=0) on ConvTranspose1d: g is [in,1,1],
        # i.e. g flattened to axis 0, same reshape as the Conv1d case
        if "v" in p:
            sd[prefix + ".weight_v"] = _convT_w(p["v"])
            sd[prefix + ".weight_g"] = np.asarray(p["g"]).reshape(-1, 1, 1)
            sd[prefix + ".bias"] = np.asarray(p["b"])
        else:
            sd[prefix + ".weight"] = _convT_w(p["w"])
            sd[prefix + ".bias"] = np.asarray(p["b"])

    _conv(sd, "conv_pre", params["conv_pre"])
    for i, p in enumerate(params["ups"]):
        put_transposed(f"ups.{i}", p)
    for i, block in enumerate(params["resblocks"]):
        if cfg.resblock == "1":
            for j, p in enumerate(block["convs1"]):
                _conv(sd, f"resblocks.{i}.convs1.{j}", p)
            for j, p in enumerate(block["convs2"]):
                _conv(sd, f"resblocks.{i}.convs2.{j}", p)
        else:
            for j, p in enumerate(block["convs"]):
                _conv(sd, f"resblocks.{i}.convs.{j}", p)
    _conv(sd, "conv_post", params["conv_post"])
    return sd


# ---------------------------------------------------------------------------
# HiFi-GAN discriminators (MPD/MSD): pytrees -> torch state_dicts, so a
# GAN run trained here can continue fine-tuning under the official torch
# recipe (the `do_*` checkpoint carries mpd/msd; optimizer state is not
# exported — resume with fresh torch optimizers)


def _conv2d_out(sd: dict, prefix: str, p: dict) -> None:
    """HWIO weight-normed conv2d -> torch [out, in, kh, kw] keys."""
    sd[prefix + ".weight_v"] = np.ascontiguousarray(
        np.transpose(np.asarray(p["v"]), (3, 2, 0, 1))
    )
    sd[prefix + ".weight_g"] = np.asarray(p["g"]).reshape(-1, 1, 1, 1)
    sd[prefix + ".bias"] = np.asarray(p["b"])


def _sn_conv1d_out(sd: dict, prefix: str, p: dict) -> None:
    """{w_orig, u, v, b} -> torch spectral-norm keys (see
    `torch_import._sn_conv1d` for the v-flattening permutation)."""
    w = np.asarray(p["w_orig"])  # [k, in, out]
    k, in_ch, _ = w.shape
    sd[prefix + ".weight_orig"] = np.ascontiguousarray(
        np.transpose(w, (2, 1, 0))
    )
    sd[prefix + ".weight_u"] = np.asarray(p["u"])
    sd[prefix + ".weight_v"] = np.ascontiguousarray(
        np.asarray(p["v"]).reshape(k, in_ch).T.ravel()
    )
    sd[prefix + ".bias"] = np.asarray(p["b"])


def hifigan_mpd_to_state_dict(params: dict) -> dict:
    """Inverse of `torch_import.hifigan_mpd_from_state_dict`."""
    sd: dict = {}
    for i, d in enumerate(params["discriminators"]):
        for j, p in enumerate(d["convs"]):
            _conv2d_out(sd, f"discriminators.{i}.convs.{j}", p)
        _conv2d_out(sd, f"discriminators.{i}.conv_post", d["conv_post"])
    return sd


def hifigan_msd_to_state_dict(params: dict) -> dict:
    """Inverse of `torch_import.hifigan_msd_from_state_dict`."""
    sd: dict = {}
    for i, d in enumerate(params["discriminators"]):
        out = _sn_conv1d_out if i == 0 else _conv
        for j, p in enumerate(d["convs"]):
            out(sd, f"discriminators.{i}.convs.{j}", p)
        out(sd, f"discriminators.{i}.conv_post", d["conv_post"])
    return sd


def gan_state_to_torch_checkpoints(state: dict, voc_cfg) -> tuple:
    """Full GAN train state -> (g_dict, do_dict) matching the official
    HiFi-GAN repo's `g_<steps>` / `do_<steps>` checkpoint contents
    (weights only; torch-side optimizers start fresh). Save with
    `torch.save({k: torch.from_numpy(v) for ...})` per sub-dict."""
    g = {"generator": hifigan_generator_to_state_dict(state["gen"]["params"], voc_cfg)}
    do = {
        "mpd": hifigan_mpd_to_state_dict(state["disc"]["params"]["mpd"]),
        "msd": hifigan_msd_to_state_dict(state["disc"]["params"]["msd"]),
        "steps": int(state["step"]),
        "epoch": 0,
    }
    return g, do
