"""Weights-level CAT GPT parity against a torch re-enactment of the
reference model (reference: models/gpt_ca.py:102-331 and
models/txt_cond_transformer.py:112-125,238-265).

The re-enactment uses the REFERENCE state_dict key layout
(blocks.{i}.{0,1,2}, to_q.1.weight, ...), so these tests pin three things
at once: the `convert_cat_gpt` checkpoint converter's key routing, the JAX
GPT's forward math, and (via two AdamW steps with the reference's minGPT
decay groups) the CAT training dynamics. torchvision-free; everything is
random-init — the same oracle pattern as tests/test_train_parity.py.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from favae_tpu.config import GPTConfig
from favae_tpu.models.gpt import GPT

CFG = dict(vocab_size=32, n_layer=2, n_embed=64, n_head=4, dim_head=16,
           image_encoded_dim=4, n_cond_embed=24, max_text_len=8)


class _LN(torch.nn.Module):
    """Reference custom LayerNorm: learned gamma, fixed zero beta
    (gpt_ca.py:102-109). Deliberately NOT torch.nn.LayerNorm so the minGPT
    decay split treats gamma as a decayed weight (txt_cond_transformer.py:
    249-262)."""

    def __init__(self, d):
        super().__init__()
        self.gamma = torch.nn.Parameter(torch.ones(d))
        self.register_buffer("beta", torch.zeros(d))

    def forward(self, x):
        return F.layer_norm(x, x.shape[-1:], self.gamma, self.beta)


class _Attn(torch.nn.Module):
    """Multi-query attention with learned null kv (gpt_ca.py:152-248),
    dropout-free (parity runs deterministic). Sequential indices mirror the
    reference so state_dict keys line up (to_q.1 / to_kv.1 / to_out.1/.2)."""

    def __init__(self, dim, heads, dim_head, ctx_dim=None, causal=False,
                 rel_pos_size=None):
        super().__init__()
        inner = heads * dim_head
        ctx_dim = dim if ctx_dim is None else ctx_dim
        self.heads, self.dim_head, self.causal = heads, dim_head, causal
        self.norm = _LN(dim)
        self.to_q = torch.nn.Sequential(
            torch.nn.Identity(), torch.nn.Linear(dim, inner, bias=False))
        self.to_kv = torch.nn.Sequential(
            torch.nn.Identity(), torch.nn.Linear(ctx_dim, dim_head, bias=False))
        self.null_kv = torch.nn.Parameter(torch.randn(dim_head))
        self.to_out = torch.nn.Sequential(
            torch.nn.Identity(), torch.nn.Linear(inner, dim, bias=False),
            _LN(dim))
        self.rel_pos_bias = None
        if rel_pos_size is not None:
            self.rel_pos_bias = _RelPos(rel_pos_size, heads)

    def forward(self, x, context=None, context_mask=None):
        b, n, _ = x.shape
        x_n = self.norm(x)
        q = self.to_q(x_n) * self.dim_head ** -0.5
        q = q.view(b, n, self.heads, self.dim_head).permute(0, 2, 1, 3)
        ctx = x_n if context is None else context  # norm_context=Identity
        kv = self.to_kv(ctx)
        kv = torch.cat([self.null_kv.expand(b, 1, -1), kv], dim=1)
        sim = torch.einsum("bhid,bjd->bhij", q, kv)
        if self.rel_pos_bias is not None:
            sim = sim + self.rel_pos_bias(sim.shape[-2], sim.shape[-1])
        neg = -torch.finfo(sim.dtype).max
        if context_mask is not None:
            cm = F.pad(context_mask, (1, 0), value=True)  # null kv always on
            sim = sim.masked_fill(~cm[:, None, None, :], neg)
        if self.causal:
            i, j = sim.shape[-2:]
            keep = torch.ones(i, j, dtype=torch.bool).triu(j - i + 1)
            sim = sim.masked_fill(keep, neg)
        attn = sim.softmax(dim=-1, dtype=torch.float32)
        out = torch.einsum("bhij,bjd->bhid", attn, kv)
        out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out[2](self.to_out[1](out))


class _RelPos(torch.nn.Module):
    """2-D relative position bias, null-kv column zero-padded
    (gpt_ca.py:113-136)."""

    def __init__(self, size, heads):
        super().__init__()
        self.pos_bias = torch.nn.Embedding((2 * size - 1) ** 2, heads)
        ar = torch.arange(size)
        pos = torch.stack(torch.meshgrid(ar, ar, indexing="ij"), -1)
        pos = pos.reshape(-1, 2)
        rel = pos[:, None] - pos[None, :] + size - 1
        self.register_buffer(
            "pos_indices", rel[..., 0] * (2 * size - 1) + rel[..., 1])

    def forward(self, i, j):
        bias = self.pos_bias(self.pos_indices[:i, : (j - 1)])
        return F.pad(bias.permute(2, 0, 1), (1, 0))


def _ff(dim):
    """LN -> Linear 4x (no bias) -> exact GELU -> LN -> Linear (no bias)
    (gpt_ca.py:140-148; its dropout arg is unused upstream)."""
    return torch.nn.Sequential(
        _LN(dim), torch.nn.Linear(dim, 4 * dim, bias=False),
        torch.nn.GELU(), _LN(4 * dim),
        torch.nn.Linear(4 * dim, dim, bias=False))


class _RefGPT(torch.nn.Module):
    """Reference GPT re-enactment (gpt_ca.py:250-331), deterministic
    (dropout/cond-drop off — parity is weights-level, not stream-level)."""

    def __init__(self, vocab_size, n_layer, n_embed, n_head, dim_head,
                 image_encoded_dim, n_cond_embed, max_text_len):
        super().__init__()
        self.tok_emb = torch.nn.Embedding(vocab_size, n_embed)
        self.image_encoded_dim = image_encoded_dim
        self.max_text_len = max_text_len
        self.axial_height_pos = torch.nn.Parameter(
            torch.randn(image_encoded_dim, n_embed))
        self.axial_width_pos = torch.nn.Parameter(
            torch.randn(image_encoded_dim, n_embed))
        # dead upstream weight (defined gpt_ca.py:259, never called :322);
        # present here to prove the converter skips it
        self.cond_proj = torch.nn.Linear(n_cond_embed, n_embed)
        self.start_token = torch.nn.Parameter(torch.randn(n_embed))
        self.init_norm = _LN(n_embed)
        self.blocks = torch.nn.ModuleList([
            torch.nn.ModuleList([
                _Attn(n_embed, n_head, dim_head, causal=True,
                      rel_pos_size=image_encoded_dim),
                _Attn(n_embed, n_head, dim_head, ctx_dim=n_cond_embed),
                _ff(n_embed),
            ]) for _ in range(n_layer)])
        self.final_norm = _LN(n_embed)
        self.to_logits = torch.nn.Linear(n_embed, vocab_size, bias=False)
        self.to_logits.weight = self.tok_emb.weight  # tied (gpt_ca.py:278-279)

    def forward(self, ids, text, mask):
        b, n = ids.shape
        emb = self.tok_emb(ids)
        axial = (self.axial_width_pos[None] + self.axial_height_pos[:, None])
        emb = emb + axial.reshape(-1, emb.shape[-1])[:n]
        x = torch.cat([self.start_token.expand(b, 1, -1), emb], dim=1)
        text = text[:, : self.max_text_len]
        mask = mask[:, : self.max_text_len]
        x = self.init_norm(x)
        for sa, ca, ff in self.blocks:
            x = sa(x) + x
            x = ca(x, context=text, context_mask=mask) + x
            x = ff(x) + x
        x = self.final_norm(x)
        return self.to_logits(x)


def _convert(sd):
    """convert_cat_gpt + materialize: unstacked leaves pass through the
    converter without a copy, so they would otherwise alias the live torch
    parameter storage (.detach().numpy() shares memory) and be mutated by
    optimizer.step() on the torch side."""
    from favae_tpu.utils.torch_convert import convert_cat_gpt
    return jax.tree_util.tree_map(
        jnp.array, convert_cat_gpt(sd, n_layer=CFG["n_layer"]))


def _build_pair(seed=0):
    torch.manual_seed(seed)
    ref = _RefGPT(**CFG)
    params = _convert({k: v.detach().numpy()
                       for k, v in ref.state_dict().items()})
    cfg = GPTConfig(dropout=0.0, cond_drop_prob=0.0, remat="none", **CFG)
    model = GPT(cfg, dtype=jnp.float32)
    return ref, model, params, cfg


def _inputs(cfg, b=2, seed=1):
    rng = np.random.RandomState(seed)
    n = cfg.image_encoded_dim ** 2
    z = rng.randint(0, cfg.vocab_size, (b, n)).astype(np.int64)
    text = rng.randn(b, 6, cfg.n_cond_embed).astype(np.float32)
    mask = np.ones((b, 6), bool)
    mask[1, 4:] = False
    return z, text, mask


def test_gpt_forward_matches_reference_reenactment():
    ref, model, params, cfg = _build_pair()
    z, text, mask = _inputs(cfg)
    inp = z[:, :-1]

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(inp), torch.from_numpy(text),
                         torch.from_numpy(mask)).numpy()
    logits = model.apply({"params": params}, jnp.asarray(inp, jnp.int32),
                         jnp.asarray(text), jnp.asarray(mask),
                         cond_drop_prob=0.0)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=2e-4, rtol=1e-4)


def _tree_pairs(tree_a, tree_b):
    flat_a = jax.tree_util.tree_flatten_with_path(tree_a)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(tree_b)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        yield jax.tree_util.keystr(path), np.asarray(leaf), \
            np.asarray(flat_b[path])


def test_gpt_ce_loss_and_full_grad_tree_match_reference():
    """One CE forward/backward against the torch re-enactment: the loss
    (reference CE over all positions, txt_cond_transformer.py:112-125) and
    EVERY parameter gradient must match. The torch grads are mapped into
    the JAX layout by running `convert_cat_gpt` on the grad dict — valid
    because the converter is a linear re-layout (transpose/stack).

    Grad-level comparison is deliberately used instead of evolving both
    models through Adam steps: Adam's first update is sign-like
    (m_hat/sqrt(v_hat) ~ +-1), so float32 noise on near-zero gradient
    elements flips update signs and the trajectories diverge by O(lr)
    without any real defect. Optimizer semantics are pinned separately on
    bit-identical gradients below."""
    ref, model, params, cfg = _build_pair()
    z, text, mask = _inputs(cfg)
    inp = z[:, :-1]

    loss_t = F.cross_entropy(
        ref(torch.from_numpy(inp), torch.from_numpy(text),
            torch.from_numpy(mask)).reshape(-1, CFG["vocab_size"]),
        torch.from_numpy(z.reshape(-1)))
    loss_t.backward()
    grad_sd = {n: p.grad.detach().numpy() for n, p in ref.named_parameters()
               if p.grad is not None}
    grads_t = _convert(grad_sd)

    def loss_fn(p):
        logits = model.apply({"params": p}, jnp.asarray(inp, jnp.int32),
                             jnp.asarray(text), jnp.asarray(mask),
                             cond_drop_prob=0.0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.asarray(z, jnp.int32)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))

    loss_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=2e-6)
    for name, gj, gt in _tree_pairs(grads_j, grads_t):
        scale = np.max(np.abs(gt)) + 1e-12
        np.testing.assert_allclose(gj / scale, gt / scale, atol=2e-5,
                                   err_msg=name)


def test_cat_adamw_and_decay_groups_match_torch_on_identical_grads():
    """Two AdamW steps with the reference's minGPT decay split (decay 0.01
    on everything except nn.Embedding weights and biases — custom-LN
    gammas, axial pos, start token and null_kv DO decay;
    txt_cond_transformer.py:238-265) and betas (0.9, 0.95), driven by
    BIT-IDENTICAL synthetic gradients on both sides. Pins the optimizer
    formula and `decay_mask`'s grouping exactly (a wrongly-grouped leaf
    diverges by lr*wd*|p| per step, far above the 1e-6 tolerance)."""
    import optax
    from favae_tpu.train.cat_step import decay_mask

    ref, model, params, cfg = _build_pair()
    lr, wd, betas = 1e-2, 0.01, (0.9, 0.95)

    rng = np.random.RandomState(3)
    grad_sd = {n: rng.randn(*p.shape).astype(np.float32)
               for n, p in ref.named_parameters()
               if not n.startswith("cond_proj")}
    grads = _convert(grad_sd)

    no_decay_names = {"tok_emb.weight"} | {
        f"blocks.{i}.0.rel_pos_bias.pos_bias.weight"
        for i in range(CFG["n_layer"])}
    named = [(n, p) for n, p in ref.named_parameters()
             if not n.startswith("cond_proj")]
    opt_t = torch.optim.AdamW(
        [{"params": [p for n, p in named if n not in no_decay_names],
          "weight_decay": wd},
         {"params": [p for n, p in named if n in no_decay_names],
          "weight_decay": 0.0}], lr=lr, betas=betas)

    # the exact transformation make_cat_optimizer builds (cat_step.py)
    tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd,
                     mask=decay_mask)
    opt_state = tx.init(params)

    for _ in range(2):
        for n, p in named:
            p.grad = torch.from_numpy(grad_sd[n].copy())
        opt_t.step()
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    ref_params = _convert({k: v.detach().numpy()
                           for k, v in ref.state_dict().items()})
    for name, pj, pt in _tree_pairs(params, ref_params):
        np.testing.assert_allclose(pj, pt, atol=1e-6, err_msg=name)


def test_export_cat_gpt_roundtrip_and_strict_reference_load():
    """export_cat_gpt must (1) invert convert_cat_gpt exactly and (2) emit a
    state_dict a STRICT reference-load accepts (fixed-beta buffers, rel-pos
    index buffer, tied to_logits.weight, dead cond_proj — gpt_ca.py:250-282)
    whose forward matches the JAX model."""
    from favae_tpu.utils.torch_export import export_cat_gpt

    _, model, _, cfg = _build_pair()
    z, text, mask = _inputs(cfg)
    inp = z[:, :-1]
    params = model.init(
        jax.random.PRNGKey(9), jnp.asarray(inp, jnp.int32),
        jnp.asarray(text), jnp.asarray(mask), cond_drop_prob=0.0)["params"]

    sd = export_cat_gpt(params, image_encoded_dim=CFG["image_encoded_dim"],
                        n_cond_embed=CFG["n_cond_embed"])
    back = _convert(sd)
    for name, a, b in _tree_pairs(params, back):
        np.testing.assert_array_equal(a, b, err_msg=name)

    ref = _RefGPT(**CFG)
    missing_unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    assert not missing_unexpected.missing_keys
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(inp), torch.from_numpy(text),
                         torch.from_numpy(mask)).numpy()
    logits = model.apply({"params": params}, jnp.asarray(inp, jnp.int32),
                         jnp.asarray(text), jnp.asarray(mask),
                         cond_drop_prob=0.0)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=2e-4, rtol=1e-4)
