"""TrOCR-class transformer recognizer (ViT encoder + causal decoder).

TPU-native replacement for the reference's HuggingFace
``VisionEncoderDecoderModel`` TrOCR path (reference
``app/ml/models/text_recognizer.py:39-69``), re-designed for batched
inference: the reference calls ``generate(max_length=50)`` one crop at a
time; here greedy decode runs over the whole crop batch as a single
``lax.scan`` with explicit per-layer KV caches (static shapes, one XLA
program for all 50 steps).

Architecture (configurable; defaults sized like trocr-base):
  * Encoder: ViT — patch-embed conv, learned position embeddings,
    pre-LN transformer blocks.
  * Decoder: causal transformer with cross-attention to encoder states,
    learned positions, weight-tied output head.

Tokenization is pluggable. The default standalone tokenizer is
character-level over the same 95-printable-char set as the CRNN vocab
(models/crnn.py), plus <pad>/<bos>/<eos>, so the transformer path works
end-to-end (trainable + decodable) without any downloaded vocab files —
the environment has no network egress. An imported HF checkpoint can
supply its own vocab via ``Tokenizer`` protocol.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .crnn import VOCAB_CHARS

Dtype = Any


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------
class CharTokenizer:
    """Self-contained char-level tokenizer: 0=<pad>, 1=<bos>, 2=<eos>."""

    PAD, BOS, EOS = 0, 1, 2

    def __init__(self):
        self.char_to_id = {c: i + 3 for i, c in enumerate(VOCAB_CHARS)}
        self.id_to_char = {i: c for c, i in self.char_to_id.items()}
        self.vocab_size = len(self.char_to_id) + 3

    def encode(self, text: str) -> list:
        return (
            [self.BOS]
            + [self.char_to_id.get(c, self.PAD) for c in text]
            + [self.EOS]
        )

    def decode(self, ids) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.EOS:
                break
            if i in (self.PAD, self.BOS):
                continue
            out.append(self.id_to_char.get(i, ""))
        return "".join(out)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TrOCRConfig:
    image_size: int = 384
    # 0 -> square (image_size wide): the HF ViT layout. Text lines are
    # wide, not square — squashing an 8-char line into a square leaves
    # ~8 px/char and measurably drops/garbles characters (heldout
    # random-8 exact match 21/32 at 64x64); a text-shaped rectangle
    # (e.g. 48x192) keeps ~24 px/char. The encoder is fully
    # shape-agnostic; only the position-embedding count depends on it.
    image_width: int = 0
    patch_size: int = 16
    enc_dim: int = 768
    enc_layers: int = 12
    enc_heads: int = 12
    enc_mlp: int = 3072
    dec_dim: int = 1024
    dec_layers: int = 12
    dec_heads: int = 16
    dec_mlp: int = 4096
    # CharTokenizer.vocab_size == 98 (95 printable chars + pad/bos/eos
    # ALREADY included) — the old "98 + 3" default double-counted the
    # specials and left 3 dead logit rows whose untrained argmax could
    # surface as silently-dropped ids. Trained checkpoints are
    # unaffected: they pin vocab_size via their config.json sidecar.
    vocab_size: int = 98
    max_len: int = 50  # reference decode cap (text_recognizer.py:58)
    dtype: Any = jnp.bfloat16
    # --- HF-compatibility knobs (microsoft/trocr-* checkpoint layout) ---
    # The native design is pre-LN (better large-scale training
    # stability); HF TrOCR's decoder is post-norm BART-style with an
    # embedding LayerNorm, a +2 learned-position offset, and exact-erf
    # gelu. These switches make the module numerically identical to the
    # HF graph so its weights import verbatim (models/import_torch.py).
    post_norm_decoder: bool = False
    layernorm_embedding: bool = False
    pos_offset: int = 0
    scale_embedding: bool = False
    head_bias: bool = True
    enc_ln_eps: float = 1e-6
    dec_ln_eps: float = 1e-6
    gelu_exact: bool = False

    @property
    def width(self) -> int:
        return self.image_width or self.image_size

    @property
    def num_patches(self) -> int:
        return (
            (self.image_size // self.patch_size)
            * (self.width // self.patch_size)
            + 1  # + CLS
        )


def small_config(**kw) -> TrOCRConfig:
    """A compact config for tests / CPU."""
    base = dict(
        image_size=64, patch_size=16, enc_dim=64, enc_layers=2, enc_heads=4,
        enc_mlp=128, dec_dim=64, dec_layers=2, dec_heads=4, dec_mlp=128,
        max_len=12, dtype=jnp.float32,
    )
    base.update(kw)
    return TrOCRConfig(**base)


def hf_config(
    vocab_size: int,
    image_size: int = 384,
    patch_size: int = 16,
    enc_dim: int = 768,
    enc_layers: int = 12,
    enc_heads: int = 12,
    enc_mlp: int = 3072,
    dec_dim: int = 1024,
    dec_layers: int = 12,
    dec_heads: int = 16,
    dec_mlp: int = 4096,
    max_len: int = 50,
    scale_embedding: bool = False,
    dtype: Any = jnp.float32,
) -> TrOCRConfig:
    """Config matching an HF VisionEncoderDecoder TrOCR graph (defaults
    sized like microsoft/trocr-base-*)."""
    return TrOCRConfig(
        image_size=image_size, patch_size=patch_size,
        enc_dim=enc_dim, enc_layers=enc_layers, enc_heads=enc_heads,
        enc_mlp=enc_mlp, dec_dim=dec_dim, dec_layers=dec_layers,
        dec_heads=dec_heads, dec_mlp=dec_mlp, vocab_size=vocab_size,
        max_len=max_len, dtype=dtype,
        post_norm_decoder=True, layernorm_embedding=True, pos_offset=2,
        scale_embedding=scale_embedding, head_bias=False,
        enc_ln_eps=1e-12, dec_ln_eps=1e-5, gelu_exact=True,
    )


# ---------------------------------------------------------------------------
# Attention with explicit (externally managed) KV cache
# ---------------------------------------------------------------------------
class Attention(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    kv_dim: Optional[int] = None  # for cross-attn from encoder width

    def setup(self):
        d, h = self.dim, self.heads
        kv = self.kv_dim or d
        self.q_proj = nn.Dense(d, dtype=self.dtype, name="q")
        self.k_proj = nn.Dense(d, dtype=self.dtype, name="k")
        self.v_proj = nn.Dense(d, dtype=self.dtype, name="v")
        self.o_proj = nn.Dense(d, dtype=self.dtype, name="o")
        self.head_dim = d // h

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.heads, self.head_dim)

    def __call__(self, xq, xkv, mask=None, kv_cache=None):
        """xq [B,Tq,D]; xkv [B,Tk,Dkv] (ignored if kv_cache given).

        kv_cache: optional precomputed (k, v) [B,Tk,H,hd] — used for
        cross-attention (encoder K/V computed once per sequence) and for
        autoregressive self-attention (caller appends new k/v).
        Returns (out [B,Tq,D], (k, v)).
        """
        q = self._split(self.q_proj(xq))
        if kv_cache is not None:
            k, v = kv_cache
        else:
            k = self._split(self.k_proj(xkv))
            v = self._split(self.v_proj(xkv))
        scale = self.head_dim ** -0.5
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            attn = jnp.where(mask, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        b, t = xq.shape[:2]
        return self.o_proj(out.reshape(b, t, self.dim)), (k, v)

    def project_kv(self, xkv):
        return self._split(self.k_proj(xkv)), self._split(self.v_proj(xkv))


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.bfloat16
    gelu_exact: bool = False  # HF uses erf-gelu; tanh approx is TPU-cheaper

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=not self.gelu_exact)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
class EncoderBlock(nn.Module):
    cfg: TrOCRConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.LayerNorm(dtype=jnp.float32, epsilon=c.enc_ln_eps, name="ln1")(x)
        y, _ = Attention(c.enc_dim, c.enc_heads, c.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, epsilon=c.enc_ln_eps, name="ln2")(x)
        y = Mlp(c.enc_dim, c.enc_mlp, c.dtype, c.gelu_exact, name="mlp")(y)
        return x + y


class ViTEncoder(nn.Module):
    cfg: TrOCRConfig

    @nn.compact
    def __call__(self, images):
        """images [B, H, W, 3] float (normalized) -> [B, N, D]."""
        c = self.cfg
        x = nn.Conv(
            c.enc_dim, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), dtype=c.dtype,
            name="patch_embed",
        )(images.astype(c.dtype))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.enc_dim), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.enc_dim)).astype(c.dtype), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.num_patches, c.enc_dim), jnp.float32,
        )
        x = x + pos.astype(c.dtype)
        for i in range(c.enc_layers):
            x = EncoderBlock(c, name=f"block{i}")(x)
        return nn.LayerNorm(
            dtype=jnp.float32, epsilon=c.enc_ln_eps, name="ln_f"
        )(x).astype(c.dtype)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
class DecoderBlock(nn.Module):
    cfg: TrOCRConfig

    def setup(self):
        c = self.cfg
        self.ln1 = nn.LayerNorm(dtype=jnp.float32, epsilon=c.dec_ln_eps)
        self.self_attn = Attention(c.dec_dim, c.dec_heads, c.dtype)
        self.ln2 = nn.LayerNorm(dtype=jnp.float32, epsilon=c.dec_ln_eps)
        self.cross_attn = Attention(
            c.dec_dim, c.dec_heads, c.dtype, kv_dim=c.enc_dim
        )
        self.ln3 = nn.LayerNorm(dtype=jnp.float32, epsilon=c.dec_ln_eps)
        self.mlp = Mlp(c.dec_dim, c.dec_mlp, c.dtype, c.gelu_exact)

    def __call__(self, x, enc_kv, causal_mask):
        """Full-sequence (training) forward.

        Pre-LN natively; post-norm (attn -> add -> LN, BART order) when
        ``cfg.post_norm_decoder`` for HF TrOCR weight parity — the same
        ln1/ln2/ln3 parameters serve both orders.
        """
        c = self.cfg
        if c.post_norm_decoder:
            y, _ = self.self_attn(
                x.astype(c.dtype), x.astype(c.dtype), mask=causal_mask
            )
            x = self.ln1(x + y)
            y, _ = self.cross_attn(x.astype(c.dtype), None, kv_cache=enc_kv)
            x = self.ln2(x + y)
            y = self.mlp(x.astype(c.dtype))
            return self.ln3(x + y)
        y = self.ln1(x).astype(c.dtype)
        y, _ = self.self_attn(y, y, mask=causal_mask)
        x = x + y
        y = self.ln2(x).astype(c.dtype)
        y, _ = self.cross_attn(y, None, kv_cache=enc_kv)
        x = x + y
        y = self.ln3(x).astype(c.dtype)
        return x + self.mlp(y)

    def _self_attn_cached(self, y, self_kv, step_idx):
        """Append this step's K/V to the ring buffers and attend."""
        k_new, v_new = self.self_attn.project_kv(y)
        k_cache, v_cache = self_kv
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new.astype(k_cache.dtype), step_idx, axis=1
        )
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new.astype(v_cache.dtype), step_idx, axis=1
        )
        tmax = k_cache.shape[1]
        pos = jnp.arange(tmax)[None, None, None, :]  # [1,1,1,Tk]
        mask = pos <= step_idx
        out, _ = self.self_attn(
            y, None, mask=mask, kv_cache=(k_cache, v_cache)
        )
        return out, (k_cache, v_cache)

    def step(self, x, self_kv, enc_kv, step_idx):
        """One-token decode step with cache.

        x [B,1,D]; self_kv (k,v) [B,Tmax,H,hd] ring buffers; returns
        (x, updated self_kv).
        """
        c = self.cfg
        if c.post_norm_decoder:
            y, self_kv = self._self_attn_cached(
                x.astype(c.dtype), self_kv, step_idx
            )
            x = self.ln1(x + y)
            y, _ = self.cross_attn(x.astype(c.dtype), None, kv_cache=enc_kv)
            x = self.ln2(x + y)
            y = self.mlp(x.astype(c.dtype))
            return self.ln3(x + y), self_kv
        y = self.ln1(x).astype(c.dtype)
        y, self_kv = self._self_attn_cached(y, self_kv, step_idx)
        x = x + y
        y = self.ln2(x).astype(c.dtype)
        y, _ = self.cross_attn(y, None, kv_cache=enc_kv)
        x = x + y
        y = self.ln3(x).astype(c.dtype)
        return x + self.mlp(y), self_kv


class TrOCRDecoder(nn.Module):
    cfg: TrOCRConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(
            c.vocab_size, c.dec_dim, dtype=jnp.float32, name="tok_embed"
        )
        # pos_offset: HF TrOCR's learned positions are stored with a +2
        # row offset (BART lineage); native mode uses offset 0.
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.max_len + c.pos_offset, c.dec_dim), jnp.float32,
        )
        if c.layernorm_embedding:
            self.ln_emb = nn.LayerNorm(dtype=jnp.float32, epsilon=c.dec_ln_eps)
        self.blocks = [
            DecoderBlock(c, name=f"block{i}") for i in range(c.dec_layers)
        ]
        self.ln_f = nn.LayerNorm(dtype=jnp.float32, epsilon=c.dec_ln_eps)
        self.head = nn.Dense(
            c.vocab_size, dtype=jnp.float32, use_bias=c.head_bias,
            name="lm_head",
        )

    def project_enc_kv(self, enc):
        return [blk.cross_attn.project_kv(enc) for blk in self.blocks]

    def _embed_at(self, tokens, pos_slice):
        c = self.cfg
        x = self.embed(tokens)
        if c.scale_embedding:
            x = x * (c.dec_dim ** 0.5)
        x = x + pos_slice
        if c.layernorm_embedding:
            x = self.ln_emb(x)
        return x

    def __call__(self, tokens, enc):
        """Training forward: tokens [B,T] -> logits [B,T,V]."""
        c = self.cfg
        t = tokens.shape[1]
        x = self._embed_at(
            tokens, self.pos_embed[:, c.pos_offset:c.pos_offset + t]
        ).astype(c.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        enc_kvs = self.project_enc_kv(enc)
        for blk, ekv in zip(self.blocks, enc_kvs):
            x = blk(x, ekv, causal)
        # post-norm graphs (HF) end with the last block's LN; pre-LN
        # needs the final norm before the head.
        if not c.post_norm_decoder:
            x = self.ln_f(x)
        return self.head(x)

    def step(self, token, enc_kvs, caches, step_idx):
        """token [B] -> (logits [B,V], new caches)."""
        c = self.cfg
        pos = jax.lax.dynamic_slice_in_dim(
            self.pos_embed, step_idx + c.pos_offset, 1, axis=1
        )
        x = self._embed_at(token[:, None], pos).astype(c.dtype)
        new_caches = []
        for blk, ekv, kv in zip(self.blocks, enc_kvs, caches):
            x, kv = blk.step(x, kv, ekv, step_idx)
            new_caches.append(kv)
        if not c.post_norm_decoder:
            x = self.ln_f(x)
        logits = self.head(x)[:, 0]
        return logits, new_caches


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------
class TrOCR(nn.Module):
    cfg: TrOCRConfig

    def setup(self):
        self.encoder = ViTEncoder(self.cfg, name="encoder")
        self.decoder = TrOCRDecoder(self.cfg, name="decoder")

    def __call__(self, images, tokens):
        """Training forward: (images, teacher-forced tokens) -> logits."""
        enc = self.encoder(images)
        return self.decoder(tokens, enc)

    def encode(self, images):
        return self.encoder(images)

    def encode_kv(self, images):
        """images -> per-layer cross-attention (k, v) for decoding."""
        enc = self.encoder(images)
        return self.decoder.project_enc_kv(enc)

    def decode_step(self, token, enc_kvs, caches, step_idx):
        return self.decoder.step(token, enc_kvs, caches, step_idx)


def init_decoder_cache(cfg: TrOCRConfig, batch: int):
    hd = cfg.dec_dim // cfg.dec_heads
    return [
        (
            jnp.zeros((batch, cfg.max_len, cfg.dec_heads, hd), cfg.dtype),
            jnp.zeros((batch, cfg.max_len, cfg.dec_heads, hd), cfg.dtype),
        )
        for _ in range(cfg.dec_layers)
    ]


@partial(jax.jit, static_argnames=("model", "bos_id", "eos_id"))
def greedy_generate(
    model: TrOCR,
    variables,
    images: jnp.ndarray,
    bos_id: int = 1,
    eos_id: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy decode with explicit KV caches.

    images [B, S, S, 3] -> (tokens [B, max_len] i32, mean token prob [B]).
    The whole decode — encoder, cross-KV projection, and all ``max_len``
    decoder steps — compiles to one XLA program; ``model.apply`` inside
    the scan body is pure, so flax and lax.scan compose cleanly.
    Finished rows emit <pad> and stop accumulating confidence.
    """
    cfg = model.cfg
    b = images.shape[0]
    enc_kvs = model.apply(variables, images, method=TrOCR.encode_kv)
    caches = init_decoder_cache(cfg, b)

    def body(carry, step):
        token, done, caches, psum, pcnt = carry
        logits, caches = model.apply(
            variables, token, enc_kvs, caches, step, method=TrOCR.decode_step
        )
        probs = jax.nn.softmax(logits, axis=-1)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pmax = jnp.max(probs, axis=-1)
        nxt = jnp.where(done, 0, nxt)
        psum = psum + jnp.where(done, 0.0, pmax)
        pcnt = pcnt + jnp.where(done, 0, 1)
        done = done | (nxt == eos_id)
        return (nxt, done, caches, psum, pcnt), nxt

    init = (
        jnp.full((b,), bos_id, jnp.int32),
        jnp.zeros((b,), bool),
        caches,
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
    )
    (_, _, _, psum, pcnt), toks = jax.lax.scan(
        body, init, jnp.arange(cfg.max_len)
    )
    conf = psum / jnp.maximum(pcnt, 1)
    return jnp.swapaxes(toks, 0, 1), conf
