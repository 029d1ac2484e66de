"""CLIP text encoder: parity against transformers' torch implementation.

This is a real cross-implementation oracle: a tiny torch CLIPTextModel with
random weights is converted to our parameter tree and outputs are compared.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.models.clip_text import (
    CLIPTextConfig,
    CLIPTextModel,
    tiny_clip_config,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _torch_tiny(hidden_act="quick_gelu"):
    cfg = transformers.CLIPTextConfig(
        vocab_size=64,
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=77,
        hidden_act=hidden_act,
    )
    torch.manual_seed(0)
    return transformers.CLIPTextModel(cfg).eval()


def _port_params(tmodel, jcfg: CLIPTextConfig):
    """Torch CLIP state dict -> our flax param tree (hand-rolled here; the
    production converter lives in motionclone_tpu.weights)."""
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    p = {
        "token_embedding": {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]
        },
        "position_embedding": {
            "embedding": sd["text_model.embeddings.position_embedding.weight"]
        },
        "final_layer_norm": {
            "scale": sd["text_model.final_layer_norm.weight"],
            "bias": sd["text_model.final_layer_norm.bias"],
        },
    }
    for i in range(jcfg.num_layers):
        pre = f"text_model.encoder.layers.{i}."
        p[f"layers_{i}"] = {
            "layer_norm1": {
                "scale": sd[pre + "layer_norm1.weight"],
                "bias": sd[pre + "layer_norm1.bias"],
            },
            "layer_norm2": {
                "scale": sd[pre + "layer_norm2.weight"],
                "bias": sd[pre + "layer_norm2.bias"],
            },
            "self_attn": {
                name: {
                    "kernel": sd[pre + f"self_attn.{name}.weight"].T,
                    "bias": sd[pre + f"self_attn.{name}.bias"],
                }
                for name in ["q_proj", "k_proj", "v_proj", "out_proj"]
            },
            "mlp_fc1": {
                "kernel": sd[pre + "mlp.fc1.weight"].T,
                "bias": sd[pre + "mlp.fc1.bias"],
            },
            "mlp_fc2": {
                "kernel": sd[pre + "mlp.fc2.weight"].T,
                "bias": sd[pre + "mlp.fc2.bias"],
            },
        }
    return {"params": p}


@pytest.mark.parametrize("hidden_act", ["quick_gelu", "gelu", "gelu_new"])
def test_parity_with_transformers(hidden_act):
    """SD1.5 towers use quick_gelu; SD2.x-style custom checkpoints declare
    exact gelu — both must match transformers numerics, not just load."""
    import dataclasses

    jcfg = dataclasses.replace(tiny_clip_config(), hidden_act=hidden_act)
    tmodel = _torch_tiny(hidden_act)
    params = _port_params(tmodel, jcfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, size=(2, 77))

    with torch.no_grad():
        ref = tmodel(torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()

    model = CLIPTextModel(cfg=jcfg)
    out = model.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_unsupported_hidden_act_rejected():
    with pytest.raises(ValueError, match="hidden_act"):
        CLIPTextConfig(hidden_act="relu")


def test_shapes_and_determinism():
    jcfg = tiny_clip_config()
    model = CLIPTextModel(cfg=jcfg)
    ids = jnp.zeros((1, 77), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (1, 77, jcfg.hidden_size)
