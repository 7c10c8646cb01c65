"""CLIP text tower in flax + byte-level BPE tokenizer.

reference: CLIP/clip/model.py:246-376 (text branch) with the repo's
modification that `encode_text` returns BOTH the full projected token sequence
and the EOT-pooled embedding (model.py:346-360) — CAT consumes the 77-token
sequence as cross-attention memory. Vision tower is not needed by CAT and is
not ported.

Architecture (ViT-L/14 text tower): token embedding + learned positional
embedding, pre-norm transformer with causal mask and QuickGELU MLPs, ln_final,
linear text projection. Weights load from the OpenAI checkpoint via
`favae_tpu.utils.torch_convert.convert_clip_text`.

Tokenizer: byte-level BPE equivalent to CLIP's SimpleTokenizer
(reference: CLIP/clip/simple_tokenizer.py) — lowercasing, whitespace cleanup,
<|startoftext|>/<|endoftext|> wrapping, 77-token zero-padded context
(reference: CLIP/clip/clip_custom.py:204-244). Supply the standard
`bpe_simple_vocab_16e6.txt.gz` merges file.
"""

from __future__ import annotations

import gzip
import html
import re

import regex
from functools import lru_cache
from typing import Any, Iterable, List, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from favae_tpu.config import CLIPTextConfig


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # pre-norm MHA; attn_mask is the causal mask for the text tower, None
        # for the vision tower (full attention)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        h = h.astype(self.dtype)
        d = self.width
        dh = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v")(h)
        b, n, _ = q.shape
        q = q.reshape(b, n, self.heads, dh)
        k = k.reshape(b, n, self.heads, dh)
        v = v.reshape(b, n, self.heads, dh)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        sim = sim * (dh ** -0.5)
        if attn_mask is not None:
            sim = sim + attn_mask[None, None]
        att = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, d)
        out = nn.Dense(d, dtype=self.dtype, name="attn_out")(out)
        x = x + out.astype(x.dtype)

        # pre-norm MLP with QuickGELU
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(d * 4, dtype=self.dtype, name="c_fc")(h.astype(self.dtype))
        h = quick_gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="c_proj")(h)
        return x + h.astype(x.dtype)


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_ids):
        """text_ids (B, 77) int32 -> (token_embeds (B, 77, embed_dim),
        pooled (B, embed_dim)) — both projected, matching the reference's
        modified encode_text (CLIP/clip/model.py:346-360)."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.width,
                       embedding_init=nn.initializers.normal(0.02),
                       name="token_embedding")(text_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (c.context_length, c.width))
        x = tok + pos[None]

        # causal additive mask (reference: model.py:332-338)
        n = c.context_length
        mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)

        for i in range(c.layers):
            x = ResidualAttentionBlock(c.width, c.heads, dtype=self.dtype,
                                       name=f"resblock_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)

        proj = self.param("text_projection",
                          nn.initializers.normal(c.width ** -0.5),
                          (c.width, c.embed_dim))
        x = x.astype(jnp.float32) @ proj
        pooled = x[jnp.arange(x.shape[0]), jnp.argmax(text_ids, axis=-1)]
        return x, pooled


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

@lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode map (GPT-2/CLIP convention)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class BPETokenizer:
    """Byte-level BPE with the CLIP merges file
    (semantics of reference: CLIP/clip/simple_tokenizer.py:62-132)."""

    PAT = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
        r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        regex.IGNORECASE)

    def __init__(self, bpe_path: Optional[str] = None,
                 merges: Optional[List[str]] = None):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        if merges is None:
            if bpe_path is None:
                raise ValueError("provide bpe_path or merges")
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")
            merges = merges[1: 49152 - 256 - 2 + 1]
        merge_pairs = [tuple(m.split()) for m in merges if m]

        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merge_pairs:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = {p: i for i, p in enumerate(merge_pairs)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in regex.findall(self.PAT, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            out.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


def tokenize(tokenizer: BPETokenizer, texts: Union[str, List[str]],
             context_length: int = 77, truncate: bool = True) -> np.ndarray:
    """SOT/EOT wrapping, fixed 77-token zero-padded context
    (reference: CLIP/clip/clip_custom.py:204-244)."""
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [tokenizer.sot] + tokenizer.encode(t) + [tokenizer.eot]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(f"input too long: {t!r}")
            ids = ids[:context_length]
            ids[-1] = tokenizer.eot
        result[i, : len(ids)] = ids
    return result
