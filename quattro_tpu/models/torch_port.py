"""Port the reference's shipped PyTorch checkpoints into GainPredictor params.

The reference ships two fp16 checkpoints (SURVEY.md C25):
- cart-pole: dec3 d128 h4 ff256 prompt5 target25 (402.7k params)
- quadrotor: dec3 d128 h4 ff512 prompt1 target49 (616.2k params)

``load_torch_checkpoint`` reads the ``tf_model.pt`` state dict +
``tf_model_normalizer.npz`` hyperparams (transformer_ilqr.py:231-253 layout)
and maps weights into our flax module, whose layer math was built to match
``torch.nn.TransformerEncoderLayer`` exactly. This gives checkpoint-compat
(SURVEY.md §4) and lets the hybrid solver run the reference's actual learned
models on TPU.

torch (CPU build) is an optional host-side dependency used only here.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from quattro_tpu.models.gain_predictor import GainPredictor
from quattro_tpu.models.normalizer import DataNormalizer
from quattro_tpu.models.transformer import TransformerPredictor


def _to_np(tensor) -> np.ndarray:
    # torch is already imported by load_torch_checkpoint (the only caller
    # path); .float() avoids re-importing it per weight tensor.
    return np.asarray(tensor.detach().cpu().float().numpy())


def load_torch_checkpoint(checkpoint_dir: str) -> GainPredictor:
    """Build a GainPredictor from a reference checkpoint directory.

    The directory must contain ``tf_model.pt`` and ``tf_model_normalizer.npz``
    (the reference's self-describing pair, transformer_ilqr.py:259-304).
    """
    import torch

    norm_file = os.path.join(checkpoint_dir, "tf_model_normalizer.npz")
    model_file = os.path.join(checkpoint_dir, "tf_model.pt")
    meta = np.load(norm_file, allow_pickle=True)

    module = TransformerPredictor(
        state_dim=int(meta["state_dim"]),
        control_dim=int(meta["control_dim"]),
        d_model=int(meta["d_model"]),
        nhead=int(meta["nhead"]),
        num_decoder_layers=int(meta["num_decoder_layers"]),
        dim_feedforward=int(meta["dim_feedforward"]),
        dropout=float(meta["dropout"]),
        max_seq_len=int(meta["max_seq_len"]),
        target_len=int(meta["target_len"]),
        prompt_len=int(meta["prompt_len"]),
    )

    state = torch.load(model_file, map_location="cpu")

    def linear(prefix: str) -> dict:
        return {
            "kernel": jnp.asarray(_to_np(state[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(_to_np(state[f"{prefix}.bias"])),
        }

    def layer_norm(prefix: str) -> dict:
        return {
            "scale": jnp.asarray(_to_np(state[f"{prefix}.weight"])),
            "bias": jnp.asarray(_to_np(state[f"{prefix}.bias"])),
        }

    params = {
        "state_embed": linear("state_embed"),
        "control_embed": linear("control_embed"),
        "output_linear": linear("output_linear"),
        "target_embedding": jnp.asarray(_to_np(state["target_embedding"])),
    }
    for i in range(module.num_decoder_layers):
        tl = f"transformer_decoder.layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                # torch packs [q; k; v] as rows of in_proj_weight (3d, d);
                # transposed they become the fused Dense kernel's columns.
                "in_proj": {
                    "kernel": jnp.asarray(_to_np(state[f"{tl}.self_attn.in_proj_weight"]).T),
                    "bias": jnp.asarray(_to_np(state[f"{tl}.self_attn.in_proj_bias"])),
                },
                "out_proj": linear(f"{tl}.self_attn.out_proj"),
            },
            "norm1": layer_norm(f"{tl}.norm1"),
            "norm2": layer_norm(f"{tl}.norm2"),
            "linear1": linear(f"{tl}.linear1"),
            "linear2": linear(f"{tl}.linear2"),
        }

    normalizer = DataNormalizer(
        x_mean=jnp.asarray(np.asarray(meta["x_mean"], dtype=np.float32)),
        x_std=jnp.asarray(np.asarray(meta["x_std"], dtype=np.float32)),
        u_mean=jnp.asarray(np.asarray(meta["u_mean"], dtype=np.float32)),
        u_std=jnp.asarray(np.asarray(meta["u_std"], dtype=np.float32)),
    )
    return GainPredictor(module=module, params=params, normalizer=normalizer)


CARTPOLE_CHECKPOINT = (
    "/root/reference/examples/cartpole/dec3_dmodel128_nhead4_ff256_drop0.1_epoch200_promptlen5_402.7k"
)
QUADROTOR_CHECKPOINT = (
    "/root/reference/examples/quadrotor/dec3_dmodel128_nhead4_ff512_drop0.1_epoch200_promptlen1_616.2k"
)
