"""Decoder-only transformer (GPT-style) — the serving-path model family.

BASELINE config 5 targets a "6.7B-class decoder with outlier-column
decomposition, tensor-sharded, with continuous batching"; the reference has
no decoder-only model at all (its demo is a random-weight encoder-decoder).
This module + serving/engine.py provide that family: causal LM with pre-LN
blocks, KV-cache decoding with per-slot positions (continuous batching), and
offline int8 quantization of every GEMM.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from qgemm_tpu.models.attention import MultiHeadAttention
from qgemm_tpu.models.embedding import Embedding
from qgemm_tpu.models.linear import Linear
from qgemm_tpu.models.transformer import FeedForward, LayerNorm


@dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 32000
    d_model: int = 512
    n_heads: int = 8
    # n_kv_heads < n_heads = grouped-query attention: the KV cache (and
    # its decode read bandwidth) shrinks by n_heads/n_kv_heads; 0 = MHA
    n_kv_heads: int = 0
    d_ff: int = 2048
    n_layers: int = 6
    max_seq_len: int = 1024
    dtype: str = "float32"
    # n_experts > 0 replaces each block's dense FFN with a top-k routed
    # MoE (models/moe.py) — the expert-parallel model family
    n_experts: int = 0
    moe_top_k: int = 2

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


# the LLM.int8() regime: models >6.7B params benefit (README.md:26)
GPT_6_7B = GPTConfig(vocab_size=50272, d_model=4096, n_heads=32, d_ff=16384,
                     n_layers=32, max_seq_len=2048, dtype="bfloat16")


@partial(jax.tree_util.register_dataclass,
         data_fields=("attn", "ffn", "ln1", "ln2"), meta_fields=())
@dataclass
class GPTBlock:
    attn: MultiHeadAttention
    ffn: FeedForward
    ln1: LayerNorm
    ln2: LayerNorm

    @classmethod
    def init(cls, key, cfg: GPTConfig) -> "GPTBlock":
        k1, k2 = jax.random.split(key)
        d = cfg.jdtype
        if cfg.n_experts > 0:
            from qgemm_tpu.models.moe import MoEFeedForward
            ffn = MoEFeedForward.init(k2, cfg.d_model, cfg.d_ff,
                                      cfg.n_experts, top_k=cfg.moe_top_k,
                                      dtype=d)
        else:
            ffn = FeedForward.init(k2, cfg.d_model, cfg.d_ff, dtype=d)
        return cls(attn=MultiHeadAttention.init(k1, cfg.d_model, cfg.n_heads,
                                                dtype=d,
                                                n_kv_heads=cfg.n_kv_heads),
                   ffn=ffn,
                   ln1=LayerNorm.init(cfg.d_model, d),
                   ln2=LayerNorm.init(cfg.d_model, d))

    def quantize(self, **qkw) -> "GPTBlock":
        return GPTBlock(attn=self.attn.quantize(**qkw),
                        ffn=self.ffn.quantize(**qkw),
                        ln1=self.ln1, ln2=self.ln2)

    def with_tp(self, mesh, axis: str = "model") -> "GPTBlock":
        ffn = self.ffn
        if hasattr(ffn, "with_tp"):  # dense FFN; MoE shards via expert axis
            ffn = ffn.with_tp(mesh, axis)
        return GPTBlock(attn=self.attn.with_tp(mesh, axis), ffn=ffn,
                        ln1=self.ln1, ln2=self.ln2)

    def __call__(self, x, cache=None, cache_index=None):
        if cache is None:
            x = x + self.attn(self.ln1(x), causal=True)
        else:
            a, cache = self.attn(self.ln1(x), causal=True, kv_cache=cache,
                                 cache_index=cache_index)
            x = x + a
        x = x + self.ffn(self.ln2(x))
        return (x, cache) if cache is not None else x


@partial(jax.tree_util.register_dataclass,
         data_fields=("embed", "blocks", "ln_f", "lm_head"),
         meta_fields=("cfg",))
@dataclass
class GPT:
    embed: Embedding
    blocks: List[GPTBlock]
    ln_f: LayerNorm
    lm_head: object
    cfg: GPTConfig

    @classmethod
    def init(cls, cfg: GPTConfig, key: Optional[jax.Array] = None) -> "GPT":
        keys = iter(jax.random.split(key if key is not None
                                     else jax.random.PRNGKey(0),
                                     cfg.n_layers + 2))
        d = cfg.jdtype
        return cls(embed=Embedding.init(next(keys), cfg.vocab_size,
                                        cfg.d_model, cfg.max_seq_len, d),
                   blocks=[GPTBlock.init(next(keys), cfg)
                           for _ in range(cfg.n_layers)],
                   ln_f=LayerNorm.init(cfg.d_model, d),
                   lm_head=Linear.init(next(keys), cfg.d_model,
                                       cfg.vocab_size, bias=False, dtype=d),
                   cfg=cfg)

    def quantize(self, **qkw) -> "GPT":
        """Pass outlier_threshold=6.0 for LLM.int8() mixed-precision
        decomposition (the >6.7B-param regime, README.md:26)."""
        return replace(self, blocks=[b.quantize(**qkw) for b in self.blocks],
                       lm_head=self.lm_head.quantize(**qkw))

    def with_tp(self, mesh, axis: str = "model") -> "GPT":
        """Mark every quantized GEMM for explicit-collective tensor
        parallelism (parallel/tp_ops.py). Call on a quantized model; use
        ``parallel.sharding.shard_quantized_model`` to also place the
        weight shards. lm_head is column-sharded over vocab with its output
        gathered (sampling wants full logits)."""
        return replace(self, blocks=[b.with_tp(mesh, axis) for b in self.blocks],
                       lm_head=self.lm_head.with_tp("column", mesh, axis,
                                                    gather_output=True))

    @classmethod
    def init_quantized(cls, cfg: GPTConfig, key: Optional[jax.Array] = None,
                       **qkw) -> "GPT":
        """Initialize directly into int8: each block is built, quantized and
        its float weights freed before the next is built, so peak HBM is the
        int8 model + ONE float block — required to stand up a 6.7B-class
        model on a 16 GB chip (float init would need ~13.4 GB bf16 + 6.7 GB
        int8 simultaneously)."""
        keys = iter(jax.random.split(key if key is not None
                                     else jax.random.PRNGKey(0),
                                     cfg.n_layers + 2))
        d = cfg.jdtype
        embed = Embedding.init(next(keys), cfg.vocab_size, cfg.d_model,
                               cfg.max_seq_len, d)
        blocks = []
        for _ in range(cfg.n_layers):
            blk = GPTBlock.init(next(keys), cfg)
            qblk = blk.quantize(**qkw)
            jax.block_until_ready(jax.tree_util.tree_leaves(qblk))
            del blk  # drop the float block's device buffers now
            blocks.append(qblk)
        lm_head = Linear.init(next(keys), cfg.d_model, cfg.vocab_size,
                              bias=False, dtype=d).quantize(**qkw)
        return cls(embed=embed, blocks=blocks, ln_f=LayerNorm.init(
            cfg.d_model, d), lm_head=lm_head, cfg=cfg)

    def num_params(self) -> int:
        return sum(int(l.size) for l in jax.tree_util.tree_leaves(self)
                   if hasattr(l, "size"))

    # ------------------------------------------------------------------ fwd
    def forward(self, tokens):
        """tokens [B, S] -> logits [B, S, vocab] (causal, teacher forcing)."""
        x = self.embed(tokens)
        for blk in self.blocks:
            x = blk(x)
        return self.lm_head(self.ln_f(x))

    __call__ = forward

    # ------------------------------------------------------------- decoding
    def init_cache(self, batch: int, max_len: Optional[int] = None,
                   quantized: bool = False):
        """``quantized=True``: int8 KV cache (absmax per-position vectors,
        ops/kv_cache.py) — halves cache HBM footprint and decode read
        bandwidth; beyond-reference capability (SURVEY.md §2 C12)."""
        cfg = self.cfg
        s = max_len or cfg.max_seq_len
        if jax.default_backend() != "cpu":
            # align the cache extent to the decode kernel's 128-row blocks:
            # an unaligned cache forced decode_attention to jnp.pad (COPY)
            # the whole cache every step per layer — measured as int8kv
            # losing to plain int8 at short contexts (r2 serving bench).
            # Cost: <=127 junk rows, always masked by per-slot position.
            s = -(-s // 128) * 128
        dh = cfg.d_model // cfg.n_heads
        hkv = cfg.n_kv_heads or cfg.n_heads   # GQA: 1/g the cache HBM
        if quantized:
            from qgemm_tpu.ops.kv_cache import init_quantized_kv_cache
            return [init_quantized_kv_cache(batch, hkv, s, dh)
                    for _ in self.blocks]
        z = lambda: jnp.zeros((batch, hkv, s, dh), cfg.jdtype)
        return [(z(), z()) for _ in self.blocks]

    def decode_step(self, tok, pos, caches):
        """tok [B, 1]; pos scalar or [B] (per-slot, continuous batching).
        Returns (logits [B, vocab], new caches)."""
        if getattr(pos, "ndim", 0) == 1:
            # per-slot positions: gather each slot's own positional encoding
            emb = jnp.take(self.embed.table, tok, axis=0, mode="clip")
            x = emb + jnp.take(self.embed.pos, pos, axis=0,
                               mode="clip")[:, None, :]
        else:
            x = self.embed(tok, offset=pos)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk(x, cache=cache, cache_index=pos)
            new_caches.append(cache)
        logits = self.lm_head(self.ln_f(x))[:, -1, :]
        return logits, new_caches

    def prefill(self, tokens, caches):
        """Write a whole prompt's K/V in one pass and return the logits at
        each position. tokens [B, S_prompt], left-aligned (callers index the
        logits at the true prompt length; padded positions' K/V are never
        attended — decode masks strictly by per-slot position). Scalar-
        position path (all slots aligned at 0)."""
        return self.prefill_chunk(tokens, 0, caches)

    def prefill_chunk(self, tokens, offset, caches):
        """Prefill a CHUNK of the prompt at position ``offset`` (traced
        scalar — one compiled program serves every chunk position): writes
        the chunk's K/V at offset and returns logits for the chunk's
        positions. The chunk attends the cache's 0..offset-1 rows plus
        causally within itself, so feeding consecutive chunks reproduces
        full-prompt prefill exactly (the engine's bounded-compile admission
        path for long prompts). ``offset`` may also be a [B] vector of
        PER-SLOT positions (continuous-batching speculative verification:
        every slot's candidate block verifies at its own offset in one
        batched chunk forward — the dense cache path broadcasts the
        per-slot causal masks)."""
        if getattr(offset, "ndim", 0) == 1:
            c = tokens.shape[1]
            posi = offset[:, None] + jnp.arange(c)[None, :]
            x = jnp.take(self.embed.table, tokens, axis=0, mode="clip") \
                + jnp.take(self.embed.pos, posi, axis=0, mode="clip")
        else:
            x = self.embed(tokens, offset=offset)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk(x, cache=cache, cache_index=offset)
            new_caches.append(cache)
        return self.lm_head(self.ln_f(x)), new_caches

    def generate(self, prompt, max_new_tokens: int,
                 quantized_cache: bool = False):
        """Greedy LM generation: prefill the prompt, then scan decode steps.
        prompt [B, S_p] -> [B, max_new_tokens]."""
        b, s_p = prompt.shape
        caches = self.init_cache(b, s_p + max_new_tokens,
                                 quantized=quantized_cache)
        logits, caches = self.prefill(prompt, caches)
        tok0 = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]

        def step(carry, t):
            tok, caches = carry
            logits, caches = self.decode_step(tok, s_p + t, caches)
            nxt = jnp.argmax(logits, axis=-1)[:, None]
            return (nxt, caches), tok[:, 0]

        (_, _), toks = jax.lax.scan(step, (tok0, caches),
                                    jnp.arange(max_new_tokens))
        return toks.T

    def beam_search(self, prompt, max_new_tokens: int, beam_size: int = 4,
                    eos_token: int | None = None,
                    length_penalty: float = 0.6,
                    quantized_cache: bool = False):
        """Beam-search continuation of ``prompt`` [B, S_p] — decoder-only
        twin of ``Transformer.beam_search`` (same TPU-first shape: beams
        fold into the batch axis, one slot-axis gather per step for beam
        reindexing, finished beams pinned, GNMT length normalization).
        The prompt prefills ONCE at batch B; its K/V rows replicate into
        the B*K beam slots with a repeat, not K prefills. Returns
        (tokens [B, max_new_tokens], scores [B])."""
        b, s_p = prompt.shape
        k = beam_size
        v = self.cfg.vocab_size
        neg = jnp.float32(-1e30)

        caches = self.init_cache(b, s_p + max_new_tokens,
                                 quantized=quantized_cache)
        logits, caches = self.prefill(prompt, caches)
        caches = jax.tree.map(lambda c: jnp.repeat(c, k, axis=0), caches)
        lp0 = jax.nn.log_softmax(
            logits[:, s_p - 1, :].astype(jnp.float32), axis=-1)  # [B, V]

        scores, nxt0 = jax.lax.top_k(lp0, k)               # [B, K]
        toks0 = jnp.zeros((b, k, max_new_tokens), jnp.int32)
        toks0 = toks0.at[:, :, 0].set(nxt0)
        done0 = (nxt0 == eos_token) if eos_token is not None \
            else jnp.zeros((b, k), bool)

        def step(carry, t):
            tok, caches, scores, toks, done = carry
            lg, caches = self.decode_step(tok, s_p + t, caches)
            lp = jax.nn.log_softmax(lg.astype(jnp.float32),
                                    axis=-1).reshape(b, k, v)
            if eos_token is not None:
                pin = jnp.where(jnp.arange(v)[None, None, :] == eos_token,
                                0.0, neg)
                lp = jnp.where(done[..., None], pin, lp)
            cand = scores[..., None] + lp
            top_s, top_i = jax.lax.top_k(cand.reshape(b, k * v), k)
            src_beam = top_i // v
            nxt = (top_i % v).astype(jnp.int32)
            rows = (src_beam + (jnp.arange(b) * k)[:, None]).reshape(-1)
            caches = jax.tree.map(lambda c: c[rows], caches)
            toks = jnp.take_along_axis(toks, src_beam[..., None], axis=1)
            toks = toks.at[:, :, t + 1].set(nxt)
            done = jnp.take_along_axis(done, src_beam, axis=1)
            if eos_token is not None:
                done = jnp.logical_or(done, nxt == eos_token)
            return (nxt.reshape(-1, 1), caches, top_s, toks, done), None

        tok0 = nxt0.reshape(-1, 1)
        (_, _, scores, toks, done), _ = jax.lax.scan(
            step, (tok0, caches, scores, toks0, done0),
            jnp.arange(max_new_tokens - 1))

        if eos_token is not None:
            is_eos = toks == eos_token
            any_eos = jnp.any(is_eos, axis=-1)
            lens = jnp.where(any_eos, jnp.argmax(is_eos, axis=-1) + 1,
                             max_new_tokens)
        else:
            lens = jnp.full((b, k), max_new_tokens)
        final = scores / (((5.0 + lens.astype(jnp.float32)) / 6.0)
                          ** length_penalty)
        best = jnp.argmax(final, axis=-1)
        out = jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0]
        return out, jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
