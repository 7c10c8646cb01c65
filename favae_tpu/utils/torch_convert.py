"""PyTorch checkpoint -> favae_tpu parameter conversion.

Maps the reference's torch state_dicts onto this package's flax trees:

* `convert_favae` — a full VQGANFCM checkpoint (reference format:
  {"model": state_dict, "epoch", "step", ...}, favae_scripts/
  train_favae.py:367-375) -> (params, batch_stats, CodebookState).
* `convert_lpips` — the combined vgg16_lpips.pt (reference:
  losses/lpips.py:14,33-37) -> LPIPS params.

Layout transforms: conv OIHW -> HWIO; linear (out, in) -> (in, out);
GroupNorm/LayerNorm weight/bias -> scale/bias; torch MultiheadAttention's
packed in_proj_weight splits into q/k/v Dense kernels.

Torch is imported lazily — the converter is host-side tooling, never on the
TPU compute path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from favae_tpu.config import DSL_NONE, DSL_NONPAIR, DSL_PAIR, FCM_NONE, VQGANConfig
from favae_tpu.models.quantizer import CodebookState


def _load_torch(path: str) -> Dict[str, np.ndarray]:
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in state.items()}


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _norm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": sd[prefix + ".weight"].T}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _resnet_block(sd, prefix) -> Dict[str, Any]:
    """torch ResnetBlock/NonResnetBlock: block.0 GN, block.2 conv, block.3 GN,
    block.6 conv, optional shortcut (reference: models/codec.py:34-84)."""
    out = {
        "norm1": _norm(sd, prefix + ".block.0"),
        "conv1": _conv(sd, prefix + ".block.2"),
        "norm2": _norm(sd, prefix + ".block.3"),
        "conv2": _conv(sd, prefix + ".block.6"),
    }
    if prefix + ".shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, prefix + ".shortcut")
    return out


def _attn_block(sd, prefix) -> Dict[str, Any]:
    """torch AttnBlock: GroupNorm + 1-head MHA with packed in_proj
    (reference: models/codec.py:87-102)."""
    w = sd[prefix + ".attn.in_proj_weight"]
    b = sd[prefix + ".attn.in_proj_bias"]
    c = w.shape[0] // 3
    return {
        "norm": _norm(sd, prefix + ".norm"),
        "q": {"kernel": w[:c].T, "bias": b[:c]},
        "k": {"kernel": w[c:2 * c].T, "bias": b[c:2 * c]},
        "v": {"kernel": w[2 * c:].T, "bias": b[2 * c:]},
        "out": _linear(sd, prefix + ".attn.out_proj"),
    }


def _trans_encoder_block(sd, prefix) -> Dict[str, Any]:
    """torch TransEncoderBlock: GN + nn.TransformerEncoderLayer
    (reference: models/codec.py:108-122)."""
    w = sd[prefix + ".attn.self_attn.in_proj_weight"]
    b = sd[prefix + ".attn.self_attn.in_proj_bias"]
    c = w.shape[0] // 3
    return {
        "norm": _norm(sd, prefix + ".norm"),
        "q": {"kernel": w[:c].T, "bias": b[:c]},
        "k": {"kernel": w[c:2 * c].T, "bias": b[c:2 * c]},
        "v": {"kernel": w[2 * c:].T, "bias": b[2 * c:]},
        "attn_out": _linear(sd, prefix + ".attn.self_attn.out_proj"),
        "ln1": _norm(sd, prefix + ".attn.norm1"),
        "ff1": _linear(sd, prefix + ".attn.linear1"),
        "ff2": _linear(sd, prefix + ".attn.linear2"),
        "ln2": _norm(sd, prefix + ".attn.norm2"),
    }


def _seq_blocks(sd, prefix, out_name) -> Dict[str, Any]:
    """Convert a torch nn.Sequential of codec blocks (down/up stacks): the
    index order is identical between reference and rebuild, so block i maps to
    {out_name}_{i}. Block type detected from its keys."""
    out = {}
    i = 0
    while True:
        p = f"{prefix}.{i}"
        if p + ".block.0.weight" in sd:
            out[f"{out_name}_{i}"] = _resnet_block(sd, p)
        elif p + ".attn.in_proj_weight" in sd:
            out[f"{out_name}_{i}"] = _attn_block(sd, p)
        elif p + ".conv.weight" in sd:
            out[f"{out_name}_{i}"] = {"conv": _conv(sd, p + ".conv")}
        else:
            break
        i += 1
    return out


def _encoder(sd, prefix, dsl_nonpair: bool) -> Dict[str, Any]:
    out = {"conv_in": _conv(sd, prefix + ".conv_in")}
    out.update(_seq_blocks(sd, prefix + ".down", "down"))
    out["mid_0"] = _resnet_block(sd, prefix + ".mid.0")
    out["mid_1"] = _attn_block(sd, prefix + ".mid.1")
    out["mid_2"] = _resnet_block(sd, prefix + ".mid.2")
    out["final_norm"] = _norm(sd, prefix + ".final.0")
    out["final_conv"] = _conv(sd, prefix + ".final.2")
    out["final_proj"] = _conv(sd, prefix + ".final.3")
    if dsl_nonpair:
        out["sigmas"] = sd[prefix + ".sigmas"]
    return out


def _fcm(sd, prefix):
    if prefix + ".block.0.weight" in sd:
        return _resnet_block(sd, prefix)          # conv or res FCM
    return _trans_encoder_block(sd, prefix)       # attn FCM


def _decoder(sd, prefix, cfg: VQGANConfig) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if cfg.fcm_kind == FCM_NONE:
        out["quant_conv_in"] = _conv(sd, prefix + ".quant_conv_in")
    else:
        for i in (1, 2, 3, 4):
            out[f"fcm_{i}"] = _fcm(sd, f"{prefix}.fcm_{i}")
    out["conv_in"] = _conv(sd, prefix + ".conv_in")
    out["mid_0"] = _resnet_block(sd, prefix + ".mid.0")
    out["mid_1"] = _attn_block(sd, prefix + ".mid.1")
    out["mid_2"] = _resnet_block(sd, prefix + ".mid.2")
    out.update(_seq_blocks(sd, prefix + ".up", "up"))
    out["final_norm"] = _norm(sd, prefix + ".final.0")
    out["final_conv"] = _conv(sd, prefix + ".final.2")
    if cfg.dsl_mode == DSL_NONPAIR and prefix + ".sigmas" in sd:
        out["sigmas"] = sd[prefix + ".sigmas"]
    return out


def _discriminator(sd, cfg: VQGANConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    dc = cfg.discriminator
    if dc.kind == "conv":
        # torch: features.0 conv_in; per layer i: conv at 3i-1, BN at 3i
        params["conv_in"] = _conv(sd, "discriminator.features.0")
        for i in range(1, dc.num_layers + 1):
            conv_idx = 2 + 3 * (i - 1)
            params[f"conv_{i}"] = _conv(sd, f"discriminator.features.{conv_idx}")
            bn = f"discriminator.features.{conv_idx + 1}"
            params[f"bn_{i}"] = _norm(sd, bn)
            stats[f"bn_{i}"] = {"mean": sd[bn + ".running_mean"],
                                "var": sd[bn + ".running_var"]}
        params["head"] = _conv(sd, "discriminator.head")
    else:
        # patch: main.0 conv_in; per n: conv at 3n-1, norm at 3n; head last
        params["conv_in"] = _conv(sd, "discriminator.main.0")
        idx = 2
        for n in range(1, dc.num_layers + 1):
            params[f"conv_{n}"] = _conv(sd, f"discriminator.main.{idx}")
            normp = f"discriminator.main.{idx + 1}"
            if normp + ".running_mean" in sd:
                params[f"norm_{n}"] = _norm(sd, normp)
                stats[f"norm_{n}"] = {"mean": sd[normp + ".running_mean"],
                                      "var": sd[normp + ".running_var"]}
            else:  # ActNorm
                params[f"norm_{n}"] = {"loc": sd[normp + ".loc"].reshape(-1),
                                       "scale": sd[normp + ".scale"].reshape(-1)}
            idx += 3
        params["head"] = _conv(sd, f"discriminator.main.{idx}")
    return params, stats


def convert_favae(path_or_sd, cfg: VQGANConfig):
    """Reference VQGANFCM checkpoint -> (params, batch_stats, CodebookState).

    `params` matches VQGANFCM.init()['params']; batch_stats covers the
    discriminator BN; the quantizer EMA buffers land in CodebookState.
    """
    sd = _load_torch(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd

    params: Dict[str, Any] = {
        "encoder": _encoder(sd, "encoder", cfg.dsl_mode == DSL_NONPAIR),
        "decoder": _decoder(sd, "decoder", cfg),
    }
    if cfg.dsl_mode == DSL_PAIR and "sigmas" in sd:
        params["sigmas"] = sd["sigmas"]

    q: Dict[str, Any] = {}
    if "quantizer.project_in.weight" in sd:
        q["project_in"] = _linear(sd, "quantizer.project_in")
        q["project_out"] = _linear(sd, "quantizer.project_out")
    if q:
        params["quantizer"] = q

    disc_params, disc_stats = _discriminator(sd, cfg)
    params["discriminator"] = disc_params
    batch_stats = {"discriminator": disc_stats} if disc_stats else {}

    embed = sd["quantizer._codebook.embed"]
    if embed.ndim == 3:
        embed = embed[0]
    cluster = sd["quantizer._codebook.cluster_size"]
    if cluster.ndim == 2:
        cluster = cluster[0]
    if "quantizer._codebook.embed_avg" in sd:
        avg = sd["quantizer._codebook.embed_avg"]
        if avg.ndim == 3:
            avg = avg[0]
    else:
        avg = embed.copy()
    cb_state = CodebookState(
        embed=np.asarray(embed, np.float32),
        cluster_size=np.asarray(cluster, np.float32),
        embed_avg=np.asarray(avg, np.float32))

    params = _to_f32(params)
    return params, _to_f32(batch_stats), cb_state


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)


# ---------------------------------------------------------------------------
# LPIPS (vgg16_lpips.pt)
# ---------------------------------------------------------------------------

# torchvision vgg16.features conv indices grouped by LPIPS slice
_VGG_SLICE_CONV_IDX = [(1, (0, 2)), (2, (5, 7)), (3, (10, 12, 14)),
                       (4, (17, 19, 21)), (5, (24, 26, 28))]


def convert_lpips(path_or_sd) -> Dict[str, Any]:
    """vgg16_lpips.pt (reference: losses/lpips.py) -> LPIPS module params."""
    sd = _load_torch(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    vgg: Dict[str, Any] = {}
    ci = 0
    for s, conv_idxs in _VGG_SLICE_CONV_IDX:
        for idx in conv_idxs:
            vgg[f"conv_{ci}"] = _conv(sd, f"net.slice{s}.{idx}")
            ci += 1
    params: Dict[str, Any] = {"vgg": vgg}
    for k in range(5):
        # NetLinLayer: Dropout at .0, 1x1 conv at .1 (reference: lpips.py:65-71)
        w = sd[f"lin{k}.model.1.weight"]
        params[f"lin{k}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return _to_f32(params)


# ---------------------------------------------------------------------------
# CLIP text tower (OpenAI checkpoint / state_dict)
# ---------------------------------------------------------------------------

def convert_clip_text(path_or_sd, layers: int = 12) -> Dict[str, Any]:
    """OpenAI CLIP state_dict (text branch) -> CLIPTextEncoder params
    (reference text tower: CLIP/clip/model.py:280-360). Accepts either the
    full CLIP state_dict or one already stripped to text keys."""
    sd = _load_torch(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    p: Dict[str, Any] = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _norm(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        pre = f"transformer.resblocks.{i}"
        w = sd[pre + ".attn.in_proj_weight"]
        b = sd[pre + ".attn.in_proj_bias"]
        c = w.shape[0] // 3
        p[f"resblock_{i}"] = {
            "ln_1": _norm(sd, pre + ".ln_1"),
            "q": {"kernel": w[:c].T, "bias": b[:c]},
            "k": {"kernel": w[c:2 * c].T, "bias": b[c:2 * c]},
            "v": {"kernel": w[2 * c:].T, "bias": b[2 * c:]},
            "attn_out": _linear(sd, pre + ".attn.out_proj"),
            "ln_2": _norm(sd, pre + ".ln_2"),
            "c_fc": _linear(sd, pre + ".mlp.c_fc"),
            "c_proj": _linear(sd, pre + ".mlp.c_proj"),
        }
        i += 1
    return _to_f32(p)


def _strip_prefix(sd, prefix: str):
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return sd


def convert_clip_vision(path_or_sd) -> Dict[str, Any]:
    """OpenAI CLIP ViT vision tower -> CLIPVisionTransformer params
    (reference: CLIP/clip/model.py:208-243). Accepts the full CLIP state_dict
    (keys prefixed 'visual.') or one already stripped."""
    sd = _load_torch(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    sd = _strip_prefix(sd, "visual.")
    p: Dict[str, Any] = {
        # torch patchify conv: (width, 3, P, P) OIHW -> HWIO
        "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["class_embedding"],
        "positional_embedding": sd["positional_embedding"],
        "ln_pre": _norm(sd, "ln_pre"),
        "ln_post": _norm(sd, "ln_post"),
        "proj": sd["proj"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        pre = f"transformer.resblocks.{i}"
        w = sd[pre + ".attn.in_proj_weight"]
        b = sd[pre + ".attn.in_proj_bias"]
        c = w.shape[0] // 3
        p[f"resblock_{i}"] = {
            "ln_1": _norm(sd, pre + ".ln_1"),
            "q": {"kernel": w[:c].T, "bias": b[:c]},
            "k": {"kernel": w[c:2 * c].T, "bias": b[c:2 * c]},
            "v": {"kernel": w[2 * c:].T, "bias": b[2 * c:]},
            "attn_out": _linear(sd, pre + ".attn.out_proj"),
            "ln_2": _norm(sd, pre + ".ln_2"),
            "c_fc": _linear(sd, pre + ".mlp.c_fc"),
            "c_proj": _linear(sd, pre + ".mlp.c_proj"),
        }
        i += 1
    return _to_f32(p)


def convert_clip_resnet(path_or_sd, layers=(3, 4, 6, 3)):
    """OpenAI CLIP ModifiedResNet -> (params, batch_stats) for
    CLIPModifiedResNet (reference: CLIP/clip/model.py:96-158)."""
    sd = _load_torch(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    sd = _strip_prefix(sd, "visual.")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst, src):
        params[dst] = {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}
        stats[dst] = {"mean": sd[src + ".running_mean"],
                      "var": sd[src + ".running_var"]}

    def bn_into(pdict, sdict, dst, src):
        pdict[dst] = {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}
        sdict[dst] = {"mean": sd[src + ".running_mean"],
                      "var": sd[src + ".running_var"]}

    for n in (1, 2, 3):  # stem
        params[f"conv{n}"] = {
            "kernel": sd[f"conv{n}.weight"].transpose(2, 3, 1, 0)}
        bn(f"bn{n}", f"bn{n}")

    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            src = f"layer{li}.{bi}"
            name = f"layer{li}_{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for n in (1, 2, 3):
                bp[f"conv{n}"] = {
                    "kernel": sd[f"{src}.conv{n}.weight"].transpose(2, 3, 1, 0)}
                bn_into(bp, bs, f"bn{n}", f"{src}.bn{n}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": sd[f"{src}.downsample.0.weight"]
                    .transpose(2, 3, 1, 0)}
                bn_into(bp, bs, "downsample_bn", f"{src}.downsample.1")
            params[name] = bp
            stats[name] = bs

    params["attnpool"] = {
        "positional_embedding": sd["attnpool.positional_embedding"],
        "q_proj": _linear(sd, "attnpool.q_proj"),
        "k_proj": _linear(sd, "attnpool.k_proj"),
        "v_proj": _linear(sd, "attnpool.v_proj"),
        "c_proj": _linear(sd, "attnpool.c_proj"),
    }
    return _to_f32(params), _to_f32(stats)


# ---------------------------------------------------------------------------
# CAT GPT (released CelebA_CAT.pt: {"transformer_model": state_dict, ...})
# ---------------------------------------------------------------------------

def _fixed_ln(sd, key) -> Dict[str, Any]:
    """reference custom LayerNorm: learned gamma, fixed beta buffer
    (models/gpt_ca.py:102-109)."""
    return {"ln": {"scale": sd[key + ".gamma"]}}


def convert_cat_gpt(path_or_sd, n_layer: int = 24) -> Dict[str, Any]:
    """reference GPT state_dict (models/gpt_ca.py:250-282) -> GPT params.

    torch blocks.{i}.{0,1,2} = (causal self-attn, cross-attn, feed-forward);
    to_q/to_kv/to_out are Sequentials with the Linear at index 1
    (gpt_ca.py:175-197); to_out's trailing LayerNorm at index 2. The rebuild
    scans one block over the layer axis, so every per-layer leaf is stacked
    along a leading (n_layer,) dim.
    """
    import torch
    if isinstance(path_or_sd, str):
        state = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "transformer_model" in state:
            state = state["transformer_model"]
        sd = {k: v.detach().numpy() for k, v in state.items()}
    else:
        sd = path_or_sd

    def attn_layer(pre, with_rel_pos):
        out = {
            "norm": {"ln": {"scale": sd[pre + ".norm.gamma"]}},
            "to_q": {"kernel": sd[pre + ".to_q.1.weight"].T},
            "to_kv": {"kernel": sd[pre + ".to_kv.1.weight"].T},
            "null_kv": sd[pre + ".null_kv"],
            "to_out": {"kernel": sd[pre + ".to_out.1.weight"].T},
            "out_norm": {"ln": {"scale": sd[pre + ".to_out.2.gamma"]}},
        }
        if with_rel_pos:
            out["rel_pos_bias"] = {"pos_bias": {
                "embedding": sd[pre + ".rel_pos_bias.pos_bias.weight"]}}
        return out

    def ff_layer(pre):
        return {
            "norm_in": {"ln": {"scale": sd[pre + ".0.gamma"]}},
            "fc1": {"kernel": sd[pre + ".1.weight"].T},
            "norm_mid": {"ln": {"scale": sd[pre + ".3.gamma"]}},
            "fc2": {"kernel": sd[pre + ".4.weight"].T},
        }

    layers = []
    i = 0
    while f"blocks.{i}.0.norm.gamma" in sd:
        layers.append({
            "self_attn": attn_layer(f"blocks.{i}.0", True),
            "cross_attn": attn_layer(f"blocks.{i}.1", False),
            "ff": ff_layer(f"blocks.{i}.2"),
        })
        i += 1
    stacked = jax_tree_stack(layers)

    p: Dict[str, Any] = {
        "tok_emb": {"embedding": sd["tok_emb.weight"]},
        "axial_height_pos": sd["axial_height_pos"],
        "axial_width_pos": sd["axial_width_pos"],
        "start_token": sd["start_token"],
        # reference cond_proj (gpt_ca.py:259) is dead weight — skipped
        "init_norm": {"ln": {"scale": sd["init_norm.gamma"]}},
        "final_norm": {"ln": {"scale": sd["final_norm.gamma"]}},
        "blocks": stacked,
    }
    return _to_f32(p)


def jax_tree_stack(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


# ---------------------------------------------------------------------------
# FID InceptionV3 (pytorch-fid pt_inception-2015-12-05 checkpoint)
# ---------------------------------------------------------------------------

def convert_inception(path_or_sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """pytorch-fid InceptionV3 state_dict -> (params, batch_stats) for
    favae_tpu.models.inception.InceptionV3FID (reference architecture:
    losses/inception.py:94-230). The fc layer is dropped (pool3 features)."""
    sd = _load_torch(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def convbn(torch_prefix, tree_path):
        node_p = params
        node_s = stats
        for k in tree_path[:-1]:
            node_p = node_p.setdefault(k, {})
            node_s = node_s.setdefault(k, {})
        leaf = tree_path[-1]
        node_p[leaf] = {
            "conv": {"kernel": sd[torch_prefix + ".conv.weight"]
                     .transpose(2, 3, 1, 0)},
            "bn": {"scale": sd[torch_prefix + ".bn.weight"],
                   "bias": sd[torch_prefix + ".bn.bias"]},
        }
        node_s[leaf] = {"bn": {"mean": sd[torch_prefix + ".bn.running_mean"],
                               "var": sd[torch_prefix + ".bn.running_var"]}}

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        convbn(stem, (stem,))

    a_branches = ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                  "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        for br in a_branches:
            convbn(f"{blk}.{br}", (blk, br))
    for br in ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
               "branch3x3dbl_3"):
        convbn(f"Mixed_6a.{br}", ("Mixed_6a", br))
    c_branches = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        for br in c_branches:
            convbn(f"{blk}.{br}", (blk, br))
    for br in ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
               "branch7x7x3_3", "branch7x7x3_4"):
        convbn(f"Mixed_7a.{br}", ("Mixed_7a", br))
    e_branches = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool")
    for blk in ("Mixed_7b", "Mixed_7c"):
        for br in e_branches:
            convbn(f"{blk}.{br}", (blk, br))

    return _to_f32(params), _to_f32(stats)
