"""Transformer model tests: shape contracts, torch-layer parity, checkpoint port."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.models import DataNormalizer, GainPredictor, TransformerPredictor
from quattro_tpu.models.transformer import sinusoidal_positional_encoding

torch = pytest.importorskip("torch")


def test_positional_encoding_matches_torch_reference():
    """Our PE table vs the reference's torch implementation
    (transformer_model.py:60-72)."""
    d_model, max_len = 32, 50
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len, dtype=torch.float32).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float32)
        * (-torch.log(torch.tensor(10000.0)) / d_model)
    )
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    ours = np.asarray(sinusoidal_positional_encoding(max_len, d_model))
    np.testing.assert_allclose(ours, pe.numpy(), atol=5e-6)


def test_predictor_output_shape():
    model = TransformerPredictor(
        state_dim=4, control_dim=5, d_model=32, nhead=4, num_decoder_layers=2,
        dim_feedforward=64, max_seq_len=100, target_len=25, prompt_len=5,
    )
    x = jnp.zeros((2, 31, 4))
    prompt = jnp.zeros((2, 5, 5))
    params = model.init(jax.random.PRNGKey(0), x, prompt)["params"]
    out = model.apply({"params": params}, x, prompt)
    assert out.shape == (2, 25, 5)


def test_encoder_layer_matches_torch():
    """Bitwise-level architecture parity: one randomly-initialized torch
    TransformerEncoderLayer vs our EncoderLayer with ported weights."""
    from quattro_tpu.models.transformer import EncoderLayer

    torch.manual_seed(0)
    d, h, ff, length = 16, 4, 32, 9
    t_layer = torch.nn.TransformerEncoderLayer(d, h, ff, dropout=0.0, batch_first=True)
    t_layer.eval()

    x = torch.randn(2, length, d)
    mask = torch.triu(torch.ones(length, length), diagonal=1).bool()
    with torch.no_grad():
        t_out = t_layer(x, src_mask=mask).numpy()

    sd = t_layer.state_dict()
    params = {
        "self_attn": {
            "in_proj": {
                "kernel": jnp.asarray(sd["self_attn.in_proj_weight"].numpy().T),
                "bias": jnp.asarray(sd["self_attn.in_proj_bias"].numpy()),
            },
            "out_proj": {
                "kernel": jnp.asarray(sd["self_attn.out_proj.weight"].numpy().T),
                "bias": jnp.asarray(sd["self_attn.out_proj.bias"].numpy()),
            },
        },
        "norm1": {
            "scale": jnp.asarray(sd["norm1.weight"].numpy()),
            "bias": jnp.asarray(sd["norm1.bias"].numpy()),
        },
        "norm2": {
            "scale": jnp.asarray(sd["norm2.weight"].numpy()),
            "bias": jnp.asarray(sd["norm2.bias"].numpy()),
        },
        "linear1": {
            "kernel": jnp.asarray(sd["linear1.weight"].numpy().T),
            "bias": jnp.asarray(sd["linear1.bias"].numpy()),
        },
        "linear2": {
            "kernel": jnp.asarray(sd["linear2.weight"].numpy().T),
            "bias": jnp.asarray(sd["linear2.bias"].numpy()),
        },
    }
    layer = EncoderLayer(d, h, ff, dropout=0.0)
    causal = jnp.triu(jnp.ones((length, length), dtype=bool), k=1)[None, None]
    ours = layer.apply({"params": params}, jnp.asarray(x.numpy()), causal)
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=2e-5)


@pytest.mark.parametrize(
    "ckpt",
    [
        "/root/reference/examples/cartpole/dec3_dmodel128_nhead4_ff256_drop0.1_epoch200_promptlen5_402.7k",
        "/root/reference/examples/quadrotor/dec3_dmodel128_nhead4_ff512_drop0.1_epoch200_promptlen1_616.2k",
    ],
    ids=["cartpole", "quadrotor"],
)
def test_shipped_checkpoint_port_parity(ckpt):
    """Forward-pass parity on fixed inputs: our ported flax model vs the
    reference's torch model loaded from the SAME shipped checkpoint
    (SURVEY.md §4 checkpoint-compat test). fp16 storage -> fp32 compute on
    both sides; tolerance covers the fp16 quantization noise amplified by
    LayerNorm."""
    import sys

    sys.path.insert(0, "/root/reference")
    from quattro_ilqr_tf.transformer_ilqr import TransformerILQR

    from quattro_tpu.models.torch_port import load_torch_checkpoint

    if not os.path.isdir(ckpt):
        pytest.skip("reference checkpoint unavailable")

    ours = load_torch_checkpoint(ckpt)
    n = ours.module.state_dim
    c = ours.module.control_dim
    p = ours.module.prompt_len
    t_states = ours.module.target_len + p + 1

    ref = TransformerILQR(state_dim=n, control_dim=c)
    ref.load(ckpt)
    ref.model.float()  # fp32 compute for a clean numerical comparison
    ref.quant_mode = "none"

    rng = np.random.default_rng(0)
    x_seq = rng.normal(size=(t_states, n)).astype(np.float32) * 0.2
    kk_seq = rng.normal(size=(p, c)).astype(np.float32) * 0.5

    theirs = ref.predict(x_seq, kk_seq)
    mine = ours.predict(x_seq, kk_seq)
    assert mine.shape == theirs.shape
    scale = np.maximum(np.abs(theirs), 1.0)
    assert np.max(np.abs(mine - theirs) / scale) < 5e-3


def test_gain_predictor_save_load_roundtrip(tmp_path):
    pred = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=5, target_len=25,
        d_model=32, nhead=4, num_decoder_layers=2, dim_feedforward=64,
    )
    path = str(tmp_path / "ckpt.npz")
    pred.save(path)
    loaded = GainPredictor.load(path)
    assert loaded.module == pred.module

    x = jnp.ones((31, 4)) * 0.1
    kk = jnp.ones((5, 5)) * 0.2
    np.testing.assert_allclose(
        np.asarray(pred.predict_fn()(x, kk)),
        np.asarray(loaded.predict_fn()(x, kk)),
        rtol=1e-6,
    )


def test_normalizer_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(10, 7, 4)) * 3 + 1)
    u = jnp.asarray(rng.normal(size=(10, 7, 5)) * 0.5 - 2)
    norm = DataNormalizer.fit(x, u)
    np.testing.assert_allclose(
        np.asarray(norm.inverse_transform_u(norm.transform_u(u))), np.asarray(u), rtol=1e-10
    )
    xn = norm.transform_x(x)
    np.testing.assert_allclose(np.asarray(xn.mean(axis=(0, 1))), np.zeros(4), atol=1e-10)


def test_bf16_predict_close_to_f32():
    """bf16 compute path (MXU-native analog of the reference's fp16 cast)
    stays within bf16 tolerance of the f32 forward."""
    pred = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=5, target_len=25,
        d_model=64, nhead=4, num_decoder_layers=2, dim_feedforward=128,
        max_seq_len=100, seq_len_states=31,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(31, 4)) * 0.3, jnp.float32)
    kk = jnp.asarray(np.random.default_rng(1).normal(size=(5, 5)), jnp.float32)
    f32 = np.asarray(pred.predict_fn()(x, kk))
    bf16 = np.asarray(pred.predict_fn(compute_dtype=jnp.bfloat16)(x, kk))
    assert bf16.dtype == np.float32  # outputs stay f32
    scale = np.maximum(np.abs(f32), 1.0)
    assert np.max(np.abs(bf16 - f32) / scale) < 0.05
