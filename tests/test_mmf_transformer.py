"""MMFTransformer parity (C34): the huggingface-backend multimodal
embeddings + encoder + pooler/head pipeline vs the in-process reference
(mmf/models/transformers/backends/huggingface.py + mmf_transformer.py)
with shared random weights.
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.models import (  # noqa: E402
    mmf_transformer as jmt,
)
from transformer_mm_explainability_tpu.utils import convert_mmf as C  # noqa: E402
from transformer_mm_explainability_tpu.utils.convert import (  # noqa: E402
    bert_encoder_from_state_dict,
)


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _Cfg(dict):
    """omegaconf-ish: attribute access + .get on a dict."""

    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_hf():
    import torch

    added = []

    def add(name, mod):
        if name in sys.modules:
            return
        sys.modules[name] = mod
        added.append(name)

    for pkg in ("VisualBERT", "VisualBERT.mmf", "VisualBERT.mmf.common",
                "VisualBERT.mmf.models", "VisualBERT.mmf.models.transformers",
                "VisualBERT.mmf.modules", "VisualBERT.mmf.utils"):
        add(pkg, _stub_module(pkg))
    add("VisualBERT.mmf.utils.env",
        _stub_module("VisualBERT.mmf.utils.env",
                     setup_imports=lambda *a, **k: None))
    sys.modules["VisualBERT.mmf.models"].BaseModel = torch.nn.Module

    def _load_real(name, relpath):
        spec = importlib.util.spec_from_file_location(
            name, str(REFERENCE / "VisualBERT" / relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        added.append(name)
        spec.loader.exec_module(mod)
        return mod

    add("omegaconf", _stub_module(
        "omegaconf",
        OmegaConf=types.SimpleNamespace(to_container=lambda c: dict(c))))
    add("VisualBERT.mmf.modules.hf_layers",
        _stub_module("VisualBERT.mmf.modules.hf_layers",
                     replace_with_jit=lambda *a, **k: None))
    try:
        _load_real("VisualBERT.mmf.common.registry",
                   "mmf/common/registry.py")
        _load_real("VisualBERT.mmf.utils.modeling", "mmf/utils/modeling.py")
        _load_real("VisualBERT.mmf.models.transformers.base",
                   "mmf/models/transformers/base.py")
        hf = _load_real(
            "VisualBERT.mmf.models.transformers.backends.huggingface",
            "mmf/models/transformers/backends/huggingface.py")
        yield hf
    finally:
        for name in added:
            sys.modules.pop(name, None)


CFG = jmt.MMFTransformerConfig(
    vocab_size=40, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, num_labels=5,
    modalities=(jmt.Modality("text", "text", 0, position_dim=24),
                jmt.Modality("image", "image", 1, embedding_dim=12,
                             position_dim=24)))


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@requires_reference
def test_mmf_transformer_full_parity(ref_hf):
    import torch
    from transformers import BertConfig, BertModel
    from transformers.models.bert.modeling_bert import (
        BertPooler, BertPredictionHeadTransform)

    torch.manual_seed(20)
    bert_cfg = BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=24, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    transformer = BertModel(bert_cfg).eval()
    model_config = _Cfg(
        modalities=[
            _Cfg(key="text", type="text", segment_id=0),
            _Cfg(key="image", type="image", segment_id=1,
                 embedding_dim=12),
        ],
        token_noise_mean=0.0, token_noise_std=0.0)
    emb = ref_hf.HuggingfaceEmbeddings(model_config, bert_cfg,
                                       transformer).eval()
    pooler = BertPooler(bert_cfg).eval()
    torch.manual_seed(21)
    head = torch.nn.Sequential(BertPredictionHeadTransform(bert_cfg),
                               torch.nn.Linear(32, CFG.num_labels)).eval()

    rs = np.random.RandomState(110)
    B, Tt, Ti = 2, 6, 4
    text = rs.randint(0, CFG.vocab_size, (B, Tt))
    image = rand(B, Ti, 12, seed=111)
    text_mask = np.array([[1] * Tt, [1, 1, 1, 0, 0, 0]], np.float32)
    image_mask = np.ones((B, Ti), np.float32)

    # reference forward == MMFTransformer.forward (mmf_transformer.py:
    # 161-180) with the huggingface backend
    pos_t = torch.arange(Tt).unsqueeze(0).expand(B, Tt)
    pos_i = torch.arange(Ti).unsqueeze(0).expand(B, Ti)
    seg_t = torch.zeros(B, Tt, dtype=torch.long)
    seg_i = torch.ones(B, Ti, dtype=torch.long)
    embedding = emb(
        tokens_ids={"text": torch.tensor(text),
                    "image": torch.tensor(image)},
        position_ids={"text": pos_t, "image": pos_i},
        segment_ids={"text": seg_t, "image": seg_i})
    mask = torch.cat([torch.tensor(text_mask),
                      torch.tensor(image_mask)], dim=-1)
    ext = (1.0 - mask.unsqueeze(1).unsqueeze(2)) * -10000.0
    enc_out = transformer.encoder(
        embedding, ext, [None] * bert_cfg.num_hidden_layers)
    seq = enc_out[0]
    want = head(pooler(seq)).detach().numpy()

    # convert the composed module's weights into our layout
    esd = emb.state_dict()
    tsd = transformer.state_dict()
    hsd = head.state_dict()

    def ln(sd, p):
        return {"scale": jnp.asarray(sd[f"{p}.weight"].detach().numpy()),
                "bias": jnp.asarray(sd[f"{p}.bias"].detach().numpy())}

    params = {
        "modalities": [
            {"token": {"word": jnp.asarray(
                 esd["token_embeddings.0.weight"].detach().numpy())},
             "position": jnp.asarray(
                 esd["pos_embeddings.0.weight"].detach().numpy()),
             "ln": ln(esd, "layer_norms.0")},
            {"token": {"proj": {
                 "w": jnp.asarray(
                     esd["token_embeddings.1.0.weight"].detach().numpy()),
                 "b": jnp.asarray(
                     esd["token_embeddings.1.0.bias"].detach().numpy())},
                 "proj_ln": ln(esd, "token_embeddings.1.1")},
             "position": jnp.asarray(
                 esd["pos_embeddings.1.weight"].detach().numpy()),
             "ln": ln(esd, "layer_norms.1")},
        ],
        "token_type": jnp.asarray(
            esd["token_type_embeddings.weight"].detach().numpy()),
        "encoder": bert_encoder_from_state_dict(tsd, 2, "encoder.layer"),
        # build_heads makes a FRESH pooler (mmf_transformer.py:64-77),
        # not the BertModel's own
        "pooler": {"w": jnp.asarray(
                       pooler.dense.weight.detach().numpy()),
                   "b": jnp.asarray(
                       pooler.dense.bias.detach().numpy())},
        "classifier": {
            "transform": {"w": jnp.asarray(
                              hsd["0.dense.weight"].detach().numpy()),
                          "b": jnp.asarray(
                              hsd["0.dense.bias"].detach().numpy()),
                          "ln": ln(hsd, "0.LayerNorm")},
            "out": {"w": jnp.asarray(hsd["1.weight"].detach().numpy()),
                    "b": jnp.asarray(hsd["1.bias"].detach().numpy())},
        },
    }
    got = jmt.mmf_transformer_forward(
        params, CFG, [jnp.asarray(text), jnp.asarray(image)],
        [jnp.asarray(text_mask), jnp.asarray(image_mask)])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_mmf_transformer_init_runs():
    params = jmt.init_mmf_transformer(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(112)
    scores = jmt.mmf_transformer_forward(
        params, CFG,
        [jnp.asarray(rs.randint(0, CFG.vocab_size, (2, 5))),
         jnp.asarray(rand(2, 3, 12, seed=113))])
    assert scores.shape == (2, CFG.num_labels)
    assert np.isfinite(np.asarray(scores)).all()
