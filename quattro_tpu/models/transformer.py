"""Decoder-only gain-sequence transformer in flax.

Architecture contract (reference: quattro_ilqr_tf/transformer_model.py:85-138):
  context = [state-trajectory embeddings | prompt gain-token embeddings]
  input   = context ++ learnable target-token queries (init N(0, 0.02))
  + sinusoidal positional encoding, causal (upper-triangular) mask,
  N post-norm encoder layers (ReLU FFN), linear head on the last
  ``target_len`` positions.

The layer math matches ``torch.nn.TransformerEncoderLayer`` with
``norm_first=False`` exactly (post-LN residual blocks, eps=1e-5, ReLU) so the
reference's shipped fp16 checkpoints port weight-for-weight
(see models/torch_port.py and tests/test_checkpoint_port.py).

On TPU the whole forward is a handful of MXU matmuls over <=110 tokens; it is
designed to be *inlined into the jitted iLQR iteration* rather than called
across a host boundary per iteration like the reference
(transformer_ilqr.py:315-323).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_positional_encoding(max_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard sin/cos table, shape (max_len, d_model).

    Matches transformer_model.py:60-72 (even columns sin, odd columns cos).
    Computed with numpy at trace time — it is a constant.
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    table = np.zeros((max_len, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(position * div_term)
    # Odd d_model: the cos half has floor(d/2) columns but div_term has
    # ceil(d/2) entries — slice it (torch's own implementation does the same).
    table[:, 1::2] = np.cos(position * div_term[: d_model // 2])
    return jnp.asarray(table, dtype=dtype)


class MultiHeadSelfAttention(nn.Module):
    """Causal multi-head self-attention, torch-MHA weight layout compatible.

    Single fused qkv projection (torch's ``in_proj_weight``) + output
    projection, scaled dot-product with additive mask.
    """

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        batch, seq_len, _ = x.shape
        head_dim = self.d_model // self.nhead

        qkv = nn.Dense(3 * self.d_model, name="in_proj")(x)  # (B, L, 3d)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(batch, seq_len, self.nhead, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, dtype=x.dtype)
        )
        scores = jnp.where(mask, jnp.finfo(x.dtype).min, scores)
        weights = nn.softmax(scores, axis=-1)
        context = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        context = context.transpose(0, 2, 1, 3).reshape(batch, seq_len, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(context)


class EncoderLayer(nn.Module):
    """Post-norm transformer block == torch.nn.TransformerEncoderLayer defaults.

    x = LayerNorm(x + Attn(x)); x = LayerNorm(x + FFN(x)), FFN = ReLU MLP.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = MultiHeadSelfAttention(self.d_model, self.nhead, name="self_attn")(x, mask)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)

        hidden = nn.Dense(self.dim_feedforward, name="linear1")(x)
        hidden = nn.relu(hidden)
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        hidden = nn.Dense(self.d_model, name="linear2")(hidden)
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + hidden)


class TransformerPredictor(nn.Module):
    """Predict ``target_len`` gain tokens from state trajectory + prompt gains.

    Token budget: T_states + prompt_len + target_len <= max_seq_len
    (cart-pole 31+5+25=61<=100; quadrotor 51+1+49=101<=110 — SURVEY.md C9).
    """

    state_dim: int
    control_dim: int  # gain-token dim = m * (1 + n)
    d_model: int = 64
    nhead: int = 8
    num_decoder_layers: int = 3
    dim_feedforward: int = 128
    dropout: float = 0.1
    max_seq_len: int = 100
    target_len: int = 20
    prompt_len: int = 10

    @nn.compact
    def __call__(
        self,
        x_seq: jnp.ndarray,  # (B, T, state_dim) state-error trajectory
        u_prompt: jnp.ndarray,  # (B, prompt_len, control_dim) tail gain tokens
        deterministic: bool = True,
    ) -> jnp.ndarray:  # (B, target_len, control_dim)
        batch = x_seq.shape[0]

        x_emb = nn.Dense(self.d_model, name="state_embed")(x_seq)
        u_emb = nn.Dense(self.d_model, name="control_embed")(u_prompt)

        target_tokens = self.param(
            "target_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.target_len, self.d_model),
        )
        target = jnp.broadcast_to(target_tokens[None], (batch, self.target_len, self.d_model))

        full = jnp.concatenate([x_emb, u_emb, target], axis=1)
        seq_len = full.shape[1]

        pe = sinusoidal_positional_encoding(self.max_seq_len, self.d_model, dtype=full.dtype)
        full = full + pe[None, :seq_len]
        full = nn.Dropout(self.dropout)(full, deterministic=deterministic)

        # True above the diagonal => future positions masked (causal).
        causal = jnp.triu(jnp.ones((seq_len, seq_len), dtype=bool), k=1)[None, None]

        for i in range(self.num_decoder_layers):
            full = EncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                name=f"layer_{i}",
            )(full, causal, deterministic=deterministic)

        out = nn.Dense(self.control_dim, name="output_linear")(full[:, -self.target_len :])
        return out
