"""Encoder-decoder transformer with int8-quantizable GEMMs and KV-cache
greedy decoding.

Capability parity with src/transformer.cu (Encoder :14-77, Decoder :79-167,
main :170-185) plus everything the demo lacks but BASELINE requires:
embedding + positional encoding (transformer.cu:182 TODO), causal decoder
masking (the reference decoder has none), a logits head, KV-cache greedy
decoding under jit, and offline int8 weight quantization for every GEMM.

Documented deviations (all bug-fixes over the reference wiring):
  * residual connections are standard pre-LN blocks (the reference adds
    ``multiHeadOut`` into BOTH residuals, including the FFN's,
    transformer.cu:58-75 — nonstandard and numerically worse);
  * heads are a batched tensor axis (the reference round-trips each head
    through the host, transformer.cu:43-50);
  * LayerNorm uses sqrt(var+eps) with learnable affine (see ops/layernorm).
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
from qgemm_tpu.ops.layernorm import layernorm


@dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32000
    d_model: int = 512
    n_heads: int = 8
    # n_kv_heads < n_heads = grouped-query attention for BOTH the decoder
    # self-attention cache and the cross-attention K/V; 0 = MHA
    n_kv_heads: int = 0
    d_ff: int = 2048
    n_layers: int = 2
    max_seq_len: int = 512
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=("gamma", "beta"), meta_fields=())
@dataclass
class LayerNorm:
    gamma: jax.Array
    beta: jax.Array

    @classmethod
    def init(cls, d: int, dtype=jnp.float32) -> "LayerNorm":
        return cls(gamma=jnp.ones((d,), dtype), beta=jnp.zeros((d,), dtype))

    def __call__(self, x):
        return layernorm(x, self.gamma, self.beta)


@partial(jax.tree_util.register_dataclass,
         data_fields=("up", "down"), meta_fields=())
@dataclass
class FeedForward:
    """FFN: Linear(d, d_ff) + ReLU + Linear(d_ff, d) (transformer.cu:62-71)."""

    up: object    # Linear | QuantizedLinear
    down: object

    @classmethod
    def init(cls, key, d_model: int, d_ff: int, dtype=jnp.float32) -> "FeedForward":
        k1, k2 = jax.random.split(key)
        return cls(up=Linear.init(k1, d_model, d_ff, dtype=dtype),
                   down=Linear.init(k2, d_ff, d_model, dtype=dtype))

    def quantize(self, **qkw) -> "FeedForward":
        return FeedForward(up=self.up.quantize(**qkw), down=self.down.quantize(**qkw))

    def with_tp(self, mesh, axis: str = "model") -> "FeedForward":
        """Megatron pairing: up column-sharded (output stays d_ff-sharded,
        the ReLU is elementwise so GSPMD keeps it local), down row-sharded —
        ONE psum per FFN."""
        return FeedForward(
            up=self.up.with_tp("column", mesh, axis, gather_output=False),
            down=self.down.with_tp("row", mesh, axis))

    def __call__(self, x):
        return self.down(jnp.maximum(self.up(x), 0))


@partial(jax.tree_util.register_dataclass,
         data_fields=("attn", "ffn", "ln1", "ln2"), meta_fields=())
@dataclass
class EncoderBlock:
    attn: MultiHeadAttention
    ffn: FeedForward
    ln1: LayerNorm
    ln2: LayerNorm

    @classmethod
    def init(cls, key, cfg: TransformerConfig) -> "EncoderBlock":
        k1, k2 = jax.random.split(key)
        d = cfg.jdtype
        return cls(attn=MultiHeadAttention.init(k1, cfg.d_model, cfg.n_heads,
                                                dtype=d,
                                                n_kv_heads=cfg.n_kv_heads),
                   ffn=FeedForward.init(k2, cfg.d_model, cfg.d_ff, dtype=d),
                   ln1=LayerNorm.init(cfg.d_model, d),
                   ln2=LayerNorm.init(cfg.d_model, d))

    def quantize(self, **qkw) -> "EncoderBlock":
        return EncoderBlock(attn=self.attn.quantize(**qkw),
                            ffn=self.ffn.quantize(**qkw),
                            ln1=self.ln1, ln2=self.ln2)

    def with_tp(self, mesh, axis: str = "model") -> "EncoderBlock":
        return EncoderBlock(attn=self.attn.with_tp(mesh, axis),
                            ffn=self.ffn.with_tp(mesh, axis),
                            ln1=self.ln1, ln2=self.ln2)

    def __call__(self, x, mask=None):
        """``mask`` [B, S] bool: padded source positions (ragged batches) —
        the encoder is bidirectional, so unmasked padding would pollute
        every real position's encoding."""
        x = x + self.attn(self.ln1(x), mask=mask)
        x = x + self.ffn(self.ln2(x))
        return x


@partial(jax.tree_util.register_dataclass,
         data_fields=("self_attn", "cross_attn", "ffn", "ln1", "ln2", "ln3"),
         meta_fields=())
@dataclass
class DecoderBlock:
    self_attn: MultiHeadAttention
    cross_attn: MultiHeadAttention
    ffn: FeedForward
    ln1: LayerNorm
    ln2: LayerNorm
    ln3: LayerNorm

    @classmethod
    def init(cls, key, cfg: TransformerConfig) -> "DecoderBlock":
        k1, k2, k3 = jax.random.split(key, 3)
        d = cfg.jdtype
        mha = lambda k: MultiHeadAttention.init(
            k, cfg.d_model, cfg.n_heads, dtype=d, n_kv_heads=cfg.n_kv_heads)
        return cls(
            self_attn=mha(k1),
            cross_attn=mha(k2),
            ffn=FeedForward.init(k3, cfg.d_model, cfg.d_ff, dtype=d),
            ln1=LayerNorm.init(cfg.d_model, d),
            ln2=LayerNorm.init(cfg.d_model, d),
            ln3=LayerNorm.init(cfg.d_model, d))

    def with_tp(self, mesh, axis: str = "model") -> "DecoderBlock":
        return DecoderBlock(self_attn=self.self_attn.with_tp(mesh, axis),
                            cross_attn=self.cross_attn.with_tp(mesh, axis),
                            ffn=self.ffn.with_tp(mesh, axis),
                            ln1=self.ln1, ln2=self.ln2, ln3=self.ln3)

    def quantize(self, **qkw) -> "DecoderBlock":
        return DecoderBlock(self_attn=self.self_attn.quantize(**qkw),
                            cross_attn=self.cross_attn.quantize(**qkw),
                            ffn=self.ffn.quantize(**qkw),
                            ln1=self.ln1, ln2=self.ln2, ln3=self.ln3)

    def __call__(self, x, enc_kv, self_cache=None, cache_index=None,
                 src_mask=None):
        """enc_kv: precomputed cross-attention (k, v) from the encoder output.
        Full-sequence mode when self_cache is None; single-step decode
        otherwise (returns (x, new_cache)). ``src_mask`` [B, S_src] bool
        masks padded encoder positions (ragged source batches)."""
        if self_cache is None:
            x = x + self.self_attn(self.ln1(x), causal=True)
        else:
            attn_out, self_cache = self.self_attn(
                self.ln1(x), causal=True, kv_cache=self_cache,
                cache_index=cache_index)
            x = x + attn_out
        x = x + self.cross_attn(self.ln2(x), precomputed_kv=enc_kv,
                                mask=src_mask)
        x = x + self.ffn(self.ln3(x))
        return (x, self_cache) if self_cache is not None else x


@partial(jax.tree_util.register_dataclass,
         data_fields=("embed", "enc_blocks", "dec_blocks", "ln_enc", "ln_dec",
                      "lm_head"),
         meta_fields=("cfg",))
@dataclass
class Transformer:
    embed: Embedding
    enc_blocks: List[EncoderBlock]
    dec_blocks: List[DecoderBlock]
    ln_enc: LayerNorm
    ln_dec: LayerNorm
    lm_head: object  # Linear | QuantizedLinear [d_model, vocab]
    cfg: TransformerConfig

    @classmethod
    def init(cls, cfg: TransformerConfig, next_key=None,
             key: Optional[jax.Array] = None) -> "Transformer":
        if next_key is None:
            base = key if key is not None else jax.random.PRNGKey(0)
            keys = iter(jax.random.split(base, 4 * cfg.n_layers + 8))
            next_key = lambda: next(keys)
        d = cfg.jdtype
        return cls(
            embed=Embedding.init(next_key(), cfg.vocab_size, cfg.d_model,
                                 cfg.max_seq_len, d),
            enc_blocks=[EncoderBlock.init(next_key(), cfg)
                        for _ in range(cfg.n_layers)],
            dec_blocks=[DecoderBlock.init(next_key(), cfg)
                        for _ in range(cfg.n_layers)],
            ln_enc=LayerNorm.init(cfg.d_model, d),
            ln_dec=LayerNorm.init(cfg.d_model, d),
            lm_head=Linear.init(next_key(), cfg.d_model, cfg.vocab_size,
                                bias=False, dtype=d),
            cfg=cfg)

    def quantize(self, **qkw) -> "Transformer":
        """Offline int8 quantization of every GEMM weight (serving mode).
        Pass outlier_threshold=6.0 for LLM.int8() mixed-precision
        decomposition on large models."""
        return replace(
            self,
            enc_blocks=[b.quantize(**qkw) for b in self.enc_blocks],
            dec_blocks=[b.quantize(**qkw) for b in self.dec_blocks],
            lm_head=self.lm_head.quantize(**qkw))

    def with_tp(self, mesh, axis: str = "model") -> "Transformer":
        """Mark every quantized GEMM of the encoder-decoder for
        explicit-collective tensor parallelism (same Megatron pairing as
        GPT.with_tp); use parallel.sharding.shard_quantized_model."""
        return replace(
            self,
            enc_blocks=[b.with_tp(mesh, axis) for b in self.enc_blocks],
            dec_blocks=[b.with_tp(mesh, axis) for b in self.dec_blocks],
            lm_head=self.lm_head.with_tp("column", mesh, axis,
                                         gather_output=True))

    # ------------------------------------------------------------------ fwd
    def encode(self, src_tokens, mask=None):
        """``mask`` [B, S_src] bool marks REAL (non-padding) positions."""
        x = self.embed(src_tokens)
        for blk in self.enc_blocks:
            x = blk(x, mask=mask)
        return self.ln_enc(x)

    def decode_full(self, tgt_tokens, enc_out):
        """Teacher-forcing decode over the whole target (training path)."""
        enc_kvs = [blk.cross_attn.precompute_kv(enc_out)
                   for blk in self.dec_blocks]
        x = self.embed(tgt_tokens)
        for blk, kv in zip(self.dec_blocks, enc_kvs):
            x = blk(x, kv)
        return self.lm_head(self.ln_dec(x))

    def forward(self, src_tokens, tgt_tokens):
        """Full encoder-decoder forward -> logits [B, S_tgt, vocab]."""
        return self.decode_full(tgt_tokens, self.encode(src_tokens))

    __call__ = forward

    # ------------------------------------------------------------- decoding
    def init_cache(self, batch: int, max_len: int, quantized: bool = False):
        """Self-attention KV caches for the decoder stack.

        ``quantized=True``: int8 cache (ops/kv_cache.py) — decode routes
        through the fused Pallas decode-attention kernel exactly like the
        GPT family (r2 served the enc-dec family float-cache only; this
        closes config 4 to GPT parity). On TPU the extent is aligned to the
        kernel's 128-row blocks (junk rows never attended — masking is
        strictly by position)."""
        cfg = self.cfg
        s = max_len
        if jax.default_backend() != "cpu":
            s = -(-s // 128) * 128
        dh = cfg.d_model // cfg.n_heads
        hkv = cfg.n_kv_heads or cfg.n_heads
        if quantized:
            from qgemm_tpu.ops.kv_cache import init_quantized_kv_cache
            return [init_quantized_kv_cache(batch, hkv, s, dh)
                    for _ in self.dec_blocks]
        z = lambda: jnp.zeros((batch, hkv, s, dh), cfg.jdtype)
        return [(z(), z()) for _ in self.dec_blocks]

    def decode_chunk(self, tok, pos, enc_kvs, caches, src_mask=None):
        """Multi-token decoder forward at per-slot offsets: tok [B, C]
        verifies/extends at positions pos..pos+C-1 (pos scalar or [B]) —
        the chunk's self-attention K/V are written into the caches and
        each row attends every cached position <= its own plus the full
        (masked) encoder output. Returns (logits [B, C, vocab], caches).
        The speculative-verification primitive for the enc-dec engine
        (GPT-family ``prefill_chunk`` parity)."""
        c = tok.shape[1]
        if getattr(pos, "ndim", 0) == 1:
            posi = pos[:, None] + jnp.arange(c)[None, :]
            x = jnp.take(self.embed.table, tok, axis=0, mode="clip") \
                + jnp.take(self.embed.pos, posi, axis=0, mode="clip")
        else:
            x = self.embed(tok, offset=pos)
        new_caches = []
        for blk, kv, cache in zip(self.dec_blocks, enc_kvs, caches):
            x, cache = blk(x, kv, self_cache=cache, cache_index=pos,
                           src_mask=src_mask)
            new_caches.append(cache)
        return self.lm_head(self.ln_dec(x)), new_caches

    def decode_logits(self, tok, pos, enc_kvs, caches, src_mask=None):
        """One decode step returning raw logits [B, vocab] (sampling is the
        caller's business — the serving engine passes per-request sampling
        params). tok [B,1] int; pos scalar or [B] per-slot positions
        (continuous batching); ``src_mask`` [B, S_src] bool masks padded
        encoder positions for ragged source batches."""
        logits, new_caches = self.decode_chunk(tok, pos, enc_kvs, caches,
                                               src_mask=src_mask)
        return logits[:, -1, :], new_caches

    def decode_step(self, tok, pos, enc_kvs, caches, src_mask=None):
        """Greedy decode step. Returns (next_tok [B,1], new caches)."""
        logits, new_caches = self.decode_logits(tok, pos, enc_kvs, caches,
                                                src_mask=src_mask)
        return jnp.argmax(logits, axis=-1)[:, None], new_caches

    def generate(self, src_tokens, max_new_tokens: int, bos_token: int = 1,
                 eos_token: int | None = None, quantized_cache: bool = False):
        """Greedy KV-cache generation under one jit-able scan.

        src_tokens [B, S_src] -> tokens [B, max_new_tokens].

        ``eos_token``: once a sequence emits it, every later position is
        pinned to eos (jit-friendly: the scan shape is static, finished
        rows just stop changing — the standard padded-decode contract).
        ``quantized_cache``: int8 self-attention cache + fused Pallas
        decode kernel (GPT-family parity).
        """
        batch = src_tokens.shape[0]
        enc_out = self.encode(src_tokens)
        enc_kvs = [blk.cross_attn.precompute_kv(enc_out)
                   for blk in self.dec_blocks]
        caches = self.init_cache(batch, max_new_tokens,
                                 quantized=quantized_cache)
        tok0 = jnp.full((batch, 1), bos_token, jnp.int32)
        done0 = jnp.zeros((batch,), bool)

        def step(carry, t):
            tok, caches, done = carry
            nxt, caches = self.decode_step(tok, t, enc_kvs, caches)
            if eos_token is not None:
                nxt = jnp.where(done[:, None], jnp.int32(eos_token), nxt)
                done = jnp.logical_or(done, nxt[:, 0] == eos_token)
            return (nxt, caches, done), nxt[:, 0]

        (_, _, _), toks = jax.lax.scan(step, (tok0, caches, done0),
                                       jnp.arange(max_new_tokens))
        return toks.T  # [B, max_new_tokens]

    def beam_search(self, src_tokens, max_new_tokens: int, beam_size: int = 4,
                    bos_token: int = 1, eos_token: int | None = None,
                    length_penalty: float = 0.6,
                    quantized_cache: bool = False):
        """Beam-search generation under one jit-able scan — the standard
        seq2seq decoding mode the reference's greedy demo lacks
        (src/transformer.cu is argmax-only; SURVEY §3.3). TPU-first
        design: beams fold into the batch axis (B*K cache slots, every
        shape static), per-step beam reindexing is ONE gather of the
        K/V slot axis, and finished beams are pinned (score frozen, EOS
        emitted) instead of removed — the scan shape never changes.

        src_tokens [B, S_src] -> (tokens [B, max_new_tokens],
        scores [B]): each row the best finished beam by GNMT length-
        normalized log-prob sum(logp) / ((5+len)/6)**length_penalty
        (beams that never finish compete at full length).
        ``beam_size=1`` degenerates to greedy (tested)."""
        b, _ = src_tokens.shape
        k = beam_size
        v = self.cfg.vocab_size
        neg = jnp.float32(-1e30)

        enc_out = self.encode(src_tokens)                  # [B, S, d]
        rep = lambda x: jnp.repeat(x, k, axis=0)           # beam-major fold
        enc_kvs = [tuple(rep(t) for t in blk.cross_attn.precompute_kv(
            enc_out)) for blk in self.dec_blocks]
        caches = self.init_cache(b * k, max_new_tokens,
                                 quantized=quantized_cache)

        tok0 = jnp.full((b * k, 1), bos_token, jnp.int32)
        # only beam 0 of each row is live at t=0 (identical beams would
        # waste the whole width on one continuation)
        scores0 = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, neg)[None],
                           (b, 1))                         # [B, K]
        toks0 = jnp.zeros((b, k, max_new_tokens), jnp.int32)
        done0 = jnp.zeros((b, k), bool)

        def norm(score, length):
            return score / (((5.0 + length) / 6.0) ** length_penalty)

        def step(carry, t):
            tok, caches, scores, toks, done = carry
            logits, caches = self.decode_logits(tok, t, enc_kvs, caches)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp = lp.reshape(b, k, v)
            if eos_token is not None:
                # a finished beam only "continues" with EOS at no cost —
                # its score is frozen and it keeps competing in top-k
                pin = jnp.where(jnp.arange(v)[None, None, :] == eos_token,
                                0.0, neg)
                lp = jnp.where(done[..., None], pin, lp)
            cand = scores[..., None] + lp                  # [B, K, V]
            flat = cand.reshape(b, k * v)
            top_s, top_i = jax.lax.top_k(flat, k)          # [B, K]
            src_beam = top_i // v                          # [B, K]
            nxt = (top_i % v).astype(jnp.int32)            # [B, K]

            # reindex beam state through the winners: one gather each
            gather_rows = (src_beam
                           + (jnp.arange(b) * k)[:, None]).reshape(-1)
            caches = jax.tree.map(lambda c: c[gather_rows], caches)
            toks = jnp.take_along_axis(toks, src_beam[..., None], axis=1)
            toks = toks.at[:, :, t].set(nxt)
            done = jnp.take_along_axis(done, src_beam, axis=1)
            if eos_token is not None:
                done = jnp.logical_or(done, nxt == eos_token)
            return (nxt.reshape(-1, 1), caches, top_s, toks, done), None

        (_, _, scores, toks, done), _ = jax.lax.scan(
            step, (tok0, caches, scores0, toks0, done0),
            jnp.arange(max_new_tokens))

        # finished beams' transcripts end at their EOS; length for the
        # normalizer = position of first EOS + 1 (full length if none)
        if eos_token is not None:
            is_eos = toks == eos_token
            any_eos = jnp.any(is_eos, axis=-1)
            lens = jnp.where(any_eos, jnp.argmax(is_eos, axis=-1) + 1,
                             max_new_tokens)
        else:
            lens = jnp.full((b, k), max_new_tokens)
        final = norm(scores, lens.astype(jnp.float32))
        best = jnp.argmax(final, axis=-1)                  # [B]
        out = jnp.take_along_axis(
            toks, best[:, None, None], axis=1)[:, 0]       # [B, T]
        return out, jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
