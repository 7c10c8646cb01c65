"""favae_tpu checkpoint -> reference-format PyTorch state_dict (the inverse
of `utils/torch_convert.convert_favae`).

Lets a user train in this framework and take the weights back into the
reference ecosystem (or any torch tooling that consumes the reference's
checkpoint format: {"model": state_dict, "epoch", "step"} —
favae_scripts/train_favae.py:367-375). Layout transforms are the exact
inverses of the converter's: conv HWIO -> OIHW, linear (in, out) ->
(out, in), q/k/v Dense kernels re-packed into torch MultiheadAttention's
in_proj, codebook state re-gaining the leading num_codebooks=1 axis
(models/l2_quantize.py:215-222).

Round-trip (export -> convert) equality and load-into-the-reference recon
parity are pinned by tests/test_torch_parity.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from favae_tpu.config import DSL_NONPAIR, DSL_PAIR, FCM_NONE, VQGANConfig


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _inv_conv(sd, prefix, p) -> None:
    sd[prefix + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def _inv_norm(sd, prefix, p) -> None:
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])


def _inv_linear(sd, prefix, p) -> None:
    sd[prefix + ".weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def _inv_resnet(sd, prefix, p) -> None:
    """Inverse of _resnet_block: torch Sequential indices block.0/2/3/6
    (reference: models/codec.py:34-84)."""
    _inv_norm(sd, prefix + ".block.0", p["norm1"])
    _inv_conv(sd, prefix + ".block.2", p["conv1"])
    _inv_norm(sd, prefix + ".block.3", p["norm2"])
    _inv_conv(sd, prefix + ".block.6", p["conv2"])
    if "shortcut" in p:
        _inv_conv(sd, prefix + ".shortcut", p["shortcut"])


def _inv_attn(sd, prefix, p) -> None:
    """Inverse of _attn_block: repack q/k/v into MHA's in_proj
    (reference: models/codec.py:87-102)."""
    _inv_norm(sd, prefix + ".norm", p["norm"])
    w = np.concatenate([_np(p["q"]["kernel"]).T, _np(p["k"]["kernel"]).T,
                        _np(p["v"]["kernel"]).T], axis=0)
    b = np.concatenate([_np(p["q"]["bias"]), _np(p["k"]["bias"]),
                        _np(p["v"]["bias"])], axis=0)
    sd[prefix + ".attn.in_proj_weight"] = w
    sd[prefix + ".attn.in_proj_bias"] = b
    _inv_linear(sd, prefix + ".attn.out_proj", p["out"])


def _inv_trans(sd, prefix, p) -> None:
    """Inverse of _trans_encoder_block (reference: models/codec.py:108-122)."""
    _inv_norm(sd, prefix + ".norm", p["norm"])
    w = np.concatenate([_np(p["q"]["kernel"]).T, _np(p["k"]["kernel"]).T,
                        _np(p["v"]["kernel"]).T], axis=0)
    b = np.concatenate([_np(p["q"]["bias"]), _np(p["k"]["bias"]),
                        _np(p["v"]["bias"])], axis=0)
    sd[prefix + ".attn.self_attn.in_proj_weight"] = w
    sd[prefix + ".attn.self_attn.in_proj_bias"] = b
    _inv_linear(sd, prefix + ".attn.self_attn.out_proj", p["attn_out"])
    _inv_norm(sd, prefix + ".attn.norm1", p["ln1"])
    _inv_linear(sd, prefix + ".attn.linear1", p["ff1"])
    _inv_linear(sd, prefix + ".attn.linear2", p["ff2"])
    _inv_norm(sd, prefix + ".attn.norm2", p["ln2"])


def _inv_block(sd, prefix, p) -> None:
    if "norm1" in p:
        _inv_resnet(sd, prefix, p)
    elif "ln1" in p:
        _inv_trans(sd, prefix, p)
    elif "conv" in p:  # Up/Downsample
        _inv_conv(sd, prefix + ".conv", p["conv"])
    else:
        _inv_attn(sd, prefix, p)


def _inv_seq(sd, tree, prefix, name) -> None:
    i = 0
    while f"{name}_{i}" in tree:
        _inv_block(sd, f"{prefix}.{i}", tree[f"{name}_{i}"])
        i += 1


def export_favae(params: Dict[str, Any], batch_stats: Dict[str, Any],
                 cb_state, cfg: VQGANConfig) -> Dict[str, np.ndarray]:
    """favae_tpu (params, batch_stats, CodebookState) -> reference torch
    state_dict (plain numpy values; torch.save-able via save_favae_pt)."""
    sd: Dict[str, np.ndarray] = {}

    # --- encoder -----------------------------------------------------------
    enc = params["encoder"]
    _inv_conv(sd, "encoder.conv_in", enc["conv_in"])
    _inv_seq(sd, enc, "encoder.down", "down")
    _inv_resnet(sd, "encoder.mid.0", enc["mid_0"])
    _inv_attn(sd, "encoder.mid.1", enc["mid_1"])
    _inv_resnet(sd, "encoder.mid.2", enc["mid_2"])
    _inv_norm(sd, "encoder.final.0", enc["final_norm"])
    _inv_conv(sd, "encoder.final.2", enc["final_conv"])
    _inv_conv(sd, "encoder.final.3", enc["final_proj"])
    if "sigmas" in enc:
        sd["encoder.sigmas"] = _np(enc["sigmas"])

    # --- decoder -----------------------------------------------------------
    dec = params["decoder"]
    if cfg.fcm_kind == FCM_NONE:
        _inv_conv(sd, "decoder.quant_conv_in", dec["quant_conv_in"])
    else:
        for i in (1, 2, 3, 4):
            _inv_block(sd, f"decoder.fcm_{i}", dec[f"fcm_{i}"])
    _inv_conv(sd, "decoder.conv_in", dec["conv_in"])
    _inv_resnet(sd, "decoder.mid.0", dec["mid_0"])
    _inv_attn(sd, "decoder.mid.1", dec["mid_1"])
    _inv_resnet(sd, "decoder.mid.2", dec["mid_2"])
    _inv_seq(sd, dec, "decoder.up", "up")
    _inv_norm(sd, "decoder.final.0", dec["final_norm"])
    _inv_conv(sd, "decoder.final.2", dec["final_conv"])
    if "sigmas" in dec:
        sd["decoder.sigmas"] = _np(dec["sigmas"])
    if cfg.dsl_mode == DSL_PAIR and "sigmas" in params:
        sd["sigmas"] = _np(params["sigmas"])

    # --- quantizer + codebook ---------------------------------------------
    q = params.get("quantizer", {})
    if "project_in" in q:
        _inv_linear(sd, "quantizer.project_in", q["project_in"])
        _inv_linear(sd, "quantizer.project_out", q["project_out"])
    # reference buffers carry a leading num_codebooks=1 axis
    # (models/l2_quantize.py:215-222)
    sd["quantizer._codebook.embed"] = _np(cb_state.embed)[None]
    if not cfg.quantizer.use_cosine_sim:
        # euclidean-only buffer; CosineSimCodebook has none (l2_quantize.py:342+)
        sd["quantizer._codebook.embed_avg"] = _np(cb_state.embed_avg)[None]
    sd["quantizer._codebook.cluster_size"] = _np(cb_state.cluster_size)[None]
    sd["quantizer._codebook.initted"] = np.asarray([1.0], np.float32)

    # --- discriminator -----------------------------------------------------
    disc = params["discriminator"]
    dstats = (batch_stats or {}).get("discriminator", {})
    dc = cfg.discriminator

    def bn(prefix, pname):
        _inv_norm(sd, prefix, disc[pname])
        sd[prefix + ".running_mean"] = _np(dstats[pname]["mean"])
        sd[prefix + ".running_var"] = _np(dstats[pname]["var"])
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    if dc.kind == "conv":
        _inv_conv(sd, "discriminator.features.0", disc["conv_in"])
        for i in range(1, dc.num_layers + 1):
            conv_idx = 2 + 3 * (i - 1)
            _inv_conv(sd, f"discriminator.features.{conv_idx}",
                      disc[f"conv_{i}"])
            bn(f"discriminator.features.{conv_idx + 1}", f"bn_{i}")
        _inv_conv(sd, "discriminator.head", disc["head"])
    else:
        _inv_conv(sd, "discriminator.main.0", disc["conv_in"])
        idx = 2
        for n in range(1, dc.num_layers + 1):
            _inv_conv(sd, f"discriminator.main.{idx}", disc[f"conv_{n}"])
            normp = f"discriminator.main.{idx + 1}"
            layer = disc[f"norm_{n}"]
            if "loc" in layer:  # ActNorm: torch stores (1, C, 1, 1)
                sd[normp + ".loc"] = _np(layer["loc"]).reshape(1, -1, 1, 1)
                sd[normp + ".scale"] = _np(layer["scale"]).reshape(1, -1, 1, 1)
            else:
                bn(normp, f"norm_{n}")
            idx += 3
        _inv_conv(sd, f"discriminator.main.{idx}", disc["head"])

    return sd


def save_favae_pt(path: str, params, batch_stats, cb_state,
                  cfg: VQGANConfig, epoch: int = 0, step: int = 0) -> None:
    """Write a reference-format .pt ({"model": sd, "epoch", "step"} —
    favae_scripts/train_favae.py:367-375). Torch imported lazily (host-side
    tooling only)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_favae(params, batch_stats, cb_state, cfg).items()}
    torch.save({"model": sd, "epoch": epoch, "step": step}, path)


# ---------------------------------------------------------------------------
# CAT GPT -> reference state_dict (inverse of torch_convert.convert_cat_gpt)
# ---------------------------------------------------------------------------

def _rel_pos_indices_np(size: int) -> np.ndarray:
    """(size^2, size^2) relative-position index buffer the reference
    registers (models/gpt_ca.py:116-127); strict load_state_dict needs it.
    Reuses the model's own construction so the exported buffer can never
    drift from the layout the pos_bias table was trained against."""
    from favae_tpu.models.gpt import _rel_pos_indices
    return _rel_pos_indices(size)


def export_cat_gpt(params, *, image_encoded_dim: int = 16,
                   n_cond_embed: int = 768) -> Dict[str, np.ndarray]:
    """GPT params -> reference GPT state_dict (models/gpt_ca.py:250-282),
    complete for a STRICT torch load: fixed-beta LayerNorm buffers, the
    rel-pos index buffer, the tied `to_logits.weight` entry, and the dead
    `cond_proj` weights (defined upstream at gpt_ca.py:259, never called —
    exported as zeros)."""

    def ln(prefix, p):
        g = _np(p["ln"]["scale"])
        return {prefix + ".gamma": g,
                prefix + ".beta": np.zeros_like(g)}

    sd: Dict[str, np.ndarray] = {}
    tok = _np(params["tok_emb"]["embedding"])
    sd["tok_emb.weight"] = tok
    sd["to_logits.weight"] = tok  # tied head (gpt_ca.py:278-279)
    sd["axial_height_pos"] = _np(params["axial_height_pos"])
    sd["axial_width_pos"] = _np(params["axial_width_pos"])
    sd["start_token"] = _np(params["start_token"])
    n_embed = tok.shape[1]
    sd["cond_proj.weight"] = np.zeros((n_embed, n_cond_embed), np.float32)
    sd["cond_proj.bias"] = np.zeros((n_embed,), np.float32)
    sd.update(ln("init_norm", params["init_norm"]))
    sd.update(ln("final_norm", params["final_norm"]))

    import jax

    pos_idx = _rel_pos_indices_np(image_encoded_dim)
    blocks = params["blocks"]
    n_layer = _np(blocks["self_attn"]["null_kv"]).shape[0]

    def layer(tree, i):
        return jax.tree_util.tree_map(lambda a: _np(a)[i], tree)

    for i in range(n_layer):
        for j, branch in ((0, layer(blocks["self_attn"], i)),
                          (1, layer(blocks["cross_attn"], i))):
            pre = f"blocks.{i}.{j}"
            sd.update(ln(pre + ".norm", branch["norm"]))
            sd[pre + ".to_q.1.weight"] = branch["to_q"]["kernel"].T
            sd[pre + ".to_kv.1.weight"] = branch["to_kv"]["kernel"].T
            sd[pre + ".null_kv"] = branch["null_kv"]
            sd[pre + ".to_out.1.weight"] = branch["to_out"]["kernel"].T
            sd.update(ln(pre + ".to_out.2", branch["out_norm"]))
            if j == 0:
                sd[pre + ".rel_pos_bias.pos_bias.weight"] = \
                    branch["rel_pos_bias"]["pos_bias"]["embedding"]
                sd[pre + ".rel_pos_bias.pos_indices"] = pos_idx
        ff = layer(blocks["ff"], i)
        pre = f"blocks.{i}.2"
        sd.update(ln(pre + ".0", ff["norm_in"]))
        sd[pre + ".1.weight"] = ff["fc1"]["kernel"].T
        sd.update(ln(pre + ".3", ff["norm_mid"]))
        sd[pre + ".4.weight"] = ff["fc2"]["kernel"].T
    return sd


def save_cat_pt(path: str, params, *, image_encoded_dim: int = 16,
                n_cond_embed: int = 768, epoch: int = 0,
                best_score: float = float("inf"), step: int = 0) -> None:
    """Write a reference-format CAT checkpoint
    ({"transformer_model": sd, "epoch", "best_score", "step"} —
    cat_scripts/train_cat.py:219-226)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_cat_gpt(
              params, image_encoded_dim=image_encoded_dim,
              n_cond_embed=n_cond_embed).items()}
    torch.save({"transformer_model": sd, "epoch": epoch,
                "best_score": best_score, "step": step}, path)
